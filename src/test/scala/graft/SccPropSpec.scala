package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Scc

/** Properties of the FW-BW strongly-connected-components operator:
  *   1. labels agree with a driver-side Tarjan (the textbook sequential
  *     algorithm) on random digraphs across densities — min-id per
  *     component, every node labeled exactly once;
  *   2. the classic hard shapes settle correctly: a pure DAG chain (all
  *      singletons — trim's job), a single global cycle (one SCC), two
  *      cycles bridged one-way (two SCCs the bridge must NOT merge),
  *      self-loops and duplicate edges (no-ops);
  *   3. nodes with no edges at all are their own singleton components.
  */
class SccPropSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side Tarjan, iterative (explicit stack — recursion would
    * overflow on the chain case): node -> min id of its SCC. */
  private def tarjan(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val index = scala.collection.mutable.Map[Long, Int]()
    val lowlink = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.ArrayBuffer[Long]()
    val label = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // work stack of (node, next-child-pointer)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.last
        if (ci == 0) {
          index(v) = counter; lowlink(v) = counter; counter += 1
          stack += v; onStack += v
        }
        val children = adj.getOrElse(v, Vector.empty)
        if (ci < children.length) {
          work(work.length - 1) = (v, ci + 1)
          val w = children(ci)
          if (!index.contains(w)) work += ((w, 0))
          else if (onStack(w)) lowlink(v) = math.min(lowlink(v), index(w))
        } else {
          if (lowlink(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer[Long]()
            var w = -1L
            while ({ w = stack.remove(stack.length - 1); onStack -= w
                     comp += w; w != v }) ()
            val m = comp.min
            comp.foreach(label(_) = m)
          }
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val (p, _) = work.last
            lowlink(p) = math.min(lowlink(p), lowlink(v))
          }
        }
      }
    }
    label.toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nd = nodes.toDF("id")
    val ed = if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else edges.toDF("src", "dst")
    Scc.run(nd, ed).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val digraphGen: Gen[(Seq[Long], Seq[(Long, Long)])] = for {
    nNodes <- Gen.choose(2, 24)
    nEdges <- Gen.choose(0, 96)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1)
    } yield (a, b))
  } yield ((0L until nNodes.toLong).toSeq, edges)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    LazyList.iterate(Seed(23L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  test("property: 12 random digraphs match driver-side Tarjan") {
    samples(digraphGen, 12).foreach { case (nodes, edges) =>
      assert(run(nodes, edges) === tarjan(nodes, edges),
        s"nodes=${nodes.size} edges=$edges")
    }
  }

  test("a DAG chain is all singletons (trim unravels it)") {
    val nodes = (0L to 20L).toSeq
    val edges = nodes.dropRight(1).map(i => (i, i + 1))
    assert(run(nodes, edges) === nodes.map(i => i -> i).toMap)
  }

  test("a global cycle is one SCC labeled by its min id") {
    val nodes = (0L to 15L).toSeq
    val edges = nodes.map(i => (i, (i + 1) % 16))
    assert(run(nodes, edges) === nodes.map(i => i -> 0L).toMap)
  }

  test("a one-way bridge must NOT merge the two cycles it links") {
    // cycle A: 0→1→2→0, cycle B: 10→11→12→10, bridge 2→10 (one-way)
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L))
    assert(run(nodes, edges) ===
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("self-loops, duplicate edges and isolated nodes") {
    val nodes = Seq(1L, 2L, 3L, 9L) // 9 has no edges at all
    val edges = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L))
    assert(run(nodes, edges) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }
}
