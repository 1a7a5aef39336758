package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Property: the prefix-filtered Jaccard self-join (q6r) is LOSSLESS —
  * its result equals the naive all-pairs join on random token sets. This
  * is the claim that separates it from the DF-capped q61 path (bounded
  * work by dropping hot-shingle evidence) and it must hold on adversarial
  * shapes: near-identical sets (J at/above the 0.7 line), disjoint sets,
  * sets built from a tiny shared vocabulary (every token hot), singleton
  * sets (prefix = whole set), and exact duplicates (J = 1).
  */
class PrefixJaccardPropSpec extends SparkSpec {
  import spark.implicits._

  private def naive(sets: Seq[(Long, Set[String])]): Set[(Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa.size + sb.size - inter) >= 0.7
    } yield (ia, ib)).toSet

  private def prefixed(sets: Seq[(Long, Set[String])]): Set[(Long, Long)] =
    DedupQueries.prefixJaccardPairs(
      sets.map { case (i, s) => (i, s.toSeq.sorted) }.toDF("doc_id", "sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // random sets over a vocabulary small enough that overlaps ≥0.7 occur:
  // base sets plus "mutated copies" (drop/add a couple of tokens) so the
  // threshold region is actually populated
  private val setsGen: Gen[Seq[(Long, Set[String])]] = for {
    vocab <- Gen.choose(8, 25)
    nBase <- Gen.choose(2, 8)
    base <- Gen.listOfN(nBase, Gen.nonEmptyListOf(Gen.choose(0, vocab))
      .map(_.map(i => s"t$i").toSet))
    muts <- Gen.listOfN(nBase, Gen.choose(0, 2))
  } yield {
    val mutated = base.zip(muts).map { case (s, k) => s.drop(k) + "tx" }
    (base ++ mutated).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    LazyList.iterate(Seed(23L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  test("property: 12 random corpora — prefix-filtered equals naive") {
    samples(setsGen, 12).foreach { sets =>
      assert(prefixed(sets) === naive(sets), s"sets=$sets")
    }
  }

  test("exact duplicates and singletons survive the prefix filter") {
    val sets = Seq(
      0L -> Set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"),
      1L -> Set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"), // J=1
      2L -> Set("a"), 3L -> Set("a"), // singleton duplicates, J=1
      4L -> Set("z")) // disjoint
    assert(prefixed(sets) === Set((0L, 1L), (2L, 3L)))
  }

  test("hot-vocabulary corpus (every token in every doc's prefix zone)") {
    // 6 docs over a 4-token vocabulary — the DF-cap approach would have
    // dropped everything here if the cap were small; prefix filtering
    // must still be exact
    val sets = Seq[(Long, Set[String])](
      0L -> Set("a", "b", "c"), 1L -> Set("a", "b", "c"),
      2L -> Set("a", "b", "d"), 3L -> Set("b", "c", "d"),
      4L -> Set("a", "b", "c", "d"), 5L -> Set("a", "b"))
    assert(prefixed(sets) === naive(sets))
  }
}
