package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixRanks

/** Property check: after [[SuffixRanks.Rounds]] doubling rounds, the
  * distributed rank of every position equals the dense rank of its
  * suffix truncated to 2^Rounds chars under plain lexicographic order
  * (the terminator rule — a shorter suffix before any extension — is
  * exactly what string comparison does). Random corpora, driver-side
  * brute force as the reference. */
class SuffixRanksPropSpec extends SparkSpec {
  import spark.implicits._

  private val L = 1 << SuffixRanks.Rounds // 16

  test("prefix-doubling ranks equal brute-force truncated-suffix dense ranks") {
    val rnd = new scala.util.Random(20260815)
    // duplicated substrings on purpose: half the docs share a seeded
    // boilerplate snippet so cross-doc rank groups actually form
    val boiler = rnd.alphanumeric.filter(_.isLower).take(12).mkString
    val texts = (0L until 24L).map { i =>
      val base = (1 to (5 + rnd.nextInt(36)))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val t = if (i % 2 == 0) base + boiler else base
      (i, t)
    }
    val d = texts.toDF("doc_id", "text")
    val got = SuffixRanks.rounds(d).last
      .select(col("doc_id"), col("pos"), col("r"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, pos, r) => (id, pos) -> r }.toMap
    // brute force: dense rank of substr(text, pos, 16) across the corpus
    val suffixes = texts.flatMap { case (id, t) =>
      (1 to t.length).map(p => ((id, p.toLong), t.substring(p - 1)
        .take(L)))
    }
    val rankOf = suffixes.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    assert(got.size == suffixes.size)
    suffixes.foreach { case (key, s) =>
      assert(got(key) == rankOf(s),
        s"position $key: got rank ${got(key)}, want ${rankOf(s)} for '$s'")
    }
  }

  test("equal final ranks mean identical 16-char windows, and groups cross docs") {
    val d = Seq(
      (1L, "xxhello world suffix arrays are neat"),
      (2L, "yyhello world suffix arrays are neat"),
      (3L, "zzunrelated text entirely different!")).toDF("doc_id", "text")
    val fin = SuffixRanks.rounds(d).last
    val crossDoc = fin.groupBy(col("r"))
      .agg(countDistinct(col("doc_id")).as("nd"), count(lit(1)).as("n"))
      .filter(col("nd") >= 2)
    // docs 1 and 2 share a 34-char tail: many cross-doc rank groups
    assert(crossDoc.count() >= 10)
  }
}
