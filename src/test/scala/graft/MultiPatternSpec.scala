package graft

import org.apache.spark.sql.functions._
import graft.functions.{AhoCorasick, MultiPattern}

/** Contracts of the Aho–Corasick multi-pattern scan (q93/q8k):
  *   1. occurrence counts equal the naive per-pattern position scan
  *      (every start position where the pattern occurs — overlapping
  *      matches INCLUDED) on randomized small-alphabet corpora, where
  *      nested/overlapping/suffix-of-each-other patterns are common;
  *   2. the documented overlap cases hold exactly ('a a' twice in
  *      'a a a'; nested patterns each count);
  *   3. duplicate and empty patterns are refused loudly (silent
  *      double-count / infinite-class bugs);
  *   4. the Spark expression matches the automaton on a real plan, with
  *      the pattern array flowing in-plan as a broadcast 1-row frame —
  *      and recompiles when the pattern array CONTENT changes (two
  *      different blocklists in one session must not share an automaton).
  */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: count all (overlapping) occurrence positions. */
  private def naiveCount(text: String, p: String): Int =
    (0 to text.length - p.length).count(i => text.startsWith(p, i))

  test("property: automaton counts == naive scan on 200 random corpora") {
    // tiny alphabet on purpose: nested / overlapping / suffix-of-each-
    // other patterns become common, which is exactly where fail-link and
    // dict-link bugs hide
    val rnd = new scala.util.Random(20260814L)
    val alpha = "abc "
    for (trial <- 1 to 200) {
      val pats = Seq.fill(1 + rnd.nextInt(8)) {
        val n = 1 + rnd.nextInt(4)
        Seq.fill(n)(alpha(rnd.nextInt(3))).mkString // patterns: no spaces
      }.distinct
      val text = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(4))).mkString
      val ac = new AhoCorasick(pats.toArray)
      val got = new Array[Int](pats.length)
      ac.countsInto(text, got)
      assert(got.toSeq === pats.map(naiveCount(text, _)),
        s"trial $trial: text='$text' pats=$pats")
    }
  }

  test("documented overlap semantics") {
    def counts(text: String, pats: Seq[String]): Seq[Int] = {
      val out = new Array[Int](pats.length)
      new AhoCorasick(pats.toArray).countsInto(text, out)
      out.toSeq
    }
    assert(counts("a a a", Seq("a a")) === Seq(2)) // overlapping both count
    assert(counts("aaaa", Seq("a", "aa", "aaa")) === Seq(4, 3, 2)) // nested all count
    assert(counts("abab", Seq("ab", "ba", "abab")) === Seq(2, 1, 1))
    assert(counts("xyz", Seq("q")) === Seq(0))
  }

  test("duplicate and empty patterns are refused") {
    intercept[IllegalArgumentException](new AhoCorasick(Array("ab", "ab")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "")))
  }

  test("expression on a real plan: in-plan pattern frame, cache recompiles") {
    val docs = Seq((0L, "a a a b"), (1L, "b c b c"), (2L, "")).toDF("doc_id", "text")
    def scan(pats: Seq[String]) = {
      val pf = pats.toDF("p")
        .agg(sort_array(collect_list(col("p"))).as("patterns"))
      docs.crossJoin(broadcast(pf))
        .select(col("doc_id"), explode(MultiPattern.multi_pattern_counts(
          col("text"), col("patterns"))).as("h"))
        .select(col("doc_id"), col("h.pattern"), col("h.cnt"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    }
    assert(scan(Seq("a a", "b c")) === Set(
      (0L, "a a", 2), (0L, "b c", 0),
      (1L, "a a", 0), (1L, "b c", 2),
      (2L, "a a", 0), (2L, "b c", 0)))
    // same session, different blocklist: the cached automaton must NOT
    // survive the pattern change
    assert(scan(Seq("a", "c b")) === Set(
      (0L, "a", 3), (0L, "c b", 0),
      (1L, "a", 0), (1L, "c b", 1),
      (2L, "a", 0), (2L, "c b", 0)))
  }
}
