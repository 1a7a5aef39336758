package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.ConnectedComponents

/** Property: the distributed min-label propagation agrees with a
  * driver-side union-find on random graphs (including chains longer than
  * one round of propagation, multiple components, and self-loops).
  */
class ConnectedComponentsPropSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 60)
    nEdges <- Gen.choose(1, 80)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong)
      b <- Gen.choose(0L, nNodes.toLong)
    } yield (a, b))
  } yield edges

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    LazyList.iterate(Seed(9L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  test("property: 15 random graphs match driver-side union-find") {
    for ((edges, i) <- samples(graphGen, 15).zipWithIndex) {
      val df = edges.toDF("id_a", "id_b")
      val got = ConnectedComponents.run(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find roots are min-ids too (we union toward the smaller root)
      val want = unionFind(edges)
      assert(got == want, s"graph #$i: $edges\n got=$got\nwant=$want")
    }
  }

  test("a long chain converges (diameter > a few rounds)") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(chain.toDF("id_a", "id_b")).collect()
    assert(got.forall(_.getLong(1) == 0L), "all chain nodes label to 0")
    assert(got.length == 41)
  }

  test("O(log N) rounds on a path graph (diameter 250, the boilerplate-chain adversary)") {
    // A templated-document chain A~B~C~… has diameter ≈ chain length; min-
    // label propagation alone needs one round per hop (250 here). Pointer
    // jumping must land in ≈ log2(diameter) + small-constant rounds — the
    // 2*log2(N) bound below is the verdict's acceptance line and would
    // fail immediately (250 > 16) without the shortcut step.
    val n = 250L
    val chain = (0L until n).map(i => (i, i + 1))
    val (labels, rounds) =
      ConnectedComponents.runCounted(chain.toDF("id_a", "id_b"))
    val got = labels.collect()
    assert(got.length == n + 1)
    assert(got.forall(_.getLong(1) == 0L), "all chain nodes label to 0")
    val bound = 2 * (math.log(n + 1.0) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound, s"path of ${n + 1} nodes took $rounds rounds (> 2*log2 bound $bound)")
  }

  test("chain labeled from the far end (worst-case min placement) still O(log N)") {
    // min id at one END of the chain (ids descending) — information has to
    // travel the full diameter; also mixes in a second component and a
    // self-loop to guard the isolated/multi-component paths.
    val n = 200L
    val chain = (0L until n).map(i => (n - i, n - i - 1)) // n~n-1, ..., 1~0
    val extra = Seq((1000L, 1001L), (2000L, 2000L))
    val (labels, rounds) =
      ConnectedComponents.runCounted((chain ++ extra).toDF("id_a", "id_b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to n).forall(got(_) == 0L))
    assert(got(1000L) == 1000L && got(1001L) == 1000L && got(2000L) == 2000L)
    val bound = 2 * (math.log(n + 1.0) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound, s"$rounds rounds > bound $bound")
  }

  test("property: incremental merge equals full CC on the union graph (12 random splits)") {
    // the q6k contract: persisted labels + delta edges merged with
    // `incremental` must be indistinguishable from re-running CC from
    // scratch — for ANY split of the edge stream, including deltas that
    // chain several standing components, touch only new nodes, introduce
    // nodes with ids SMALLER than a standing component's min (the merged
    // min must drop), or duplicate standing edges.
    for ((edges, i) <- samples(graphGen, 12).zipWithIndex) {
      val k = i % 4 // vary the split fraction across cases (0%..75% base)
      val (base, delta) = edges.zipWithIndex.partition(_._2 % 4 < k)
      val baseDf = base.map(_._1).toDF("id_a", "id_b")
      val deltaDf = delta.map(_._1).toDF("id_a", "id_b")
      val standing = ConnectedComponents.run(baseDf)
      val got = ConnectedComponents.incremental(standing, deltaDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      assert(got == want, s"split #$i (base=${base.size}, delta=${delta.size}): " +
        s"$edges\n got=$got\nwant=$want")
    }
  }

  test("incremental with an empty delta is the identity") {
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L))
    val standing = ConnectedComponents.run(edges.toDF("id_a", "id_b"))
    val got = ConnectedComponents.incremental(
      standing, Seq.empty[(Long, Long)].toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("incremental: a new node with a smaller id lowers the merged component min") {
    // standing component {10,11,12} (min 10); delta edge 5~12 must
    // relabel the WHOLE standing family to 5, not just the endpoint
    val standing = ConnectedComponents.run(
      Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b"))
    val got = ConnectedComponents.incremental(
      standing, Seq((5L, 12L)).toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 10L -> 5L, 11L -> 5L, 12L -> 5L))
  }
}
