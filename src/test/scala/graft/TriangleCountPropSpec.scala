package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.TriangleCount

/** Properties of the degree-ordered-orientation triangle counter:
  *   1. per-node counts agree with a driver-side brute-force enumeration
  *      on random graphs (orientation is a lossless work-bounding device,
  *      never a semantics change);
  *   2. duplicate / reversed / self-loop input edges do not change the
  *      answer (canonicalization contract);
  *   3. the oriented out-degree bound that gives the O(m^1.5) wedge cap:
  *      on a star graph the hub generates ZERO wedges (every hub edge
  *      points INTO the hub), the exact pathology the naive neighbor
  *      join dies on.
  */
class TriangleCountPropSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if und((a, b)) && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(3, 30)
    nEdges <- Gen.choose(3, 120)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong)
      b <- Gen.choose(0L, nNodes.toLong)
    } yield (a, b))
  } yield edges

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    LazyList.iterate(Seed(17L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("property: 12 random multigraphs match brute-force per-node counts") {
    samples(graphGen, 12).foreach { edges =>
      val expected = brute(edges).filter(_._2 > 0)
      assert(run(edges) === expected, s"edges=$edges")
    }
  }

  test("duplicates, reversals and self-loops are canonicalized away") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L), (1L, 2L), (3L, 1L))
    assert(run(noisy) === run(base))
    assert(run(base) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph: hub contributes zero wedges (orientation bound)") {
    // hub 0 connected to 1..40, no rim edges: zero triangles, and the
    // orientation must direct every edge rim→? no: hub has max degree so
    // every edge points INTO it — its out-list is empty. We can't observe
    // the internal wedge count from the public API, but the result must
    // be empty and fast even though Σ deg² is ~1600.
    val star = (1L to 40L).map(i => (0L, i))
    assert(run(star) === Map.empty[Long, Long])
  }
}
