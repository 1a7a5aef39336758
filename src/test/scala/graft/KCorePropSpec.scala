package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.KCore

/** Property: distributed k-core peeling agrees with a driver-side
  * reference peeler on random multigraphs, for several (k, rounds)
  * budgets; enough rounds reach the true k-core fixpoint (peeling is
  * confluent — deletion order cannot change the core). */
class KCorePropSpec extends SparkSpec {
  import spark.implicits._

  private def refPeel(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    for (_ <- 1 to rounds) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    KCore.peel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(4, 40)
    nEdges <- Gen.choose(4, 150)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong)
      b <- Gen.choose(0L, nNodes.toLong)
    } yield (a, b))
  } yield edges

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    LazyList.iterate(Seed(31L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  test("property: 8 random multigraphs match the reference peeler") {
    samples(graphGen, 8).foreach { edges =>
      assert(run(edges, 3, 3) === refPeel(edges, 3, 3), s"k=3 r=3 edges=$edges")
      assert(run(edges, 2, 2) === refPeel(edges, 2, 2), s"k=2 r=2 edges=$edges")
    }
  }

  test("a clique survives any budget; a chain peels to nothing at k=2... k=3") {
    // K5: every node degree 4 — 3-core keeps everything
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(run(k5, 3, 3).values.toSet === Set(4L))
    // chain 0-1-2-...-9: max degree 2 — one round of k=3 erases it
    val chain = (0L to 8L).map(i => (i, i + 1))
    assert(run(chain, 3, 1) === Map.empty[Long, Long])
  }
}
