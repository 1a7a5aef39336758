package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Unit semantics of the unigram-LM trainer's pieces (the oracle gate
  * covers the full two-round EM; these pin the DP's local contracts on
  * hand-built frames where the right answer is checkable by eye). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def costsDF(rows: (String, Long)*) =
    rows.toDF("piece", "cost")
  private def wordsDF(rows: (String, Long)*) =
    rows.toDF("word", "wfreq")

  test("viterbi picks the cheapest segmentation and backtrack reconstructs the word") {
    val w = wordsDF("banana" -> 3L)
    // "ban"(10) + "ana"(10) = 20 beats any char path (6x9=54) and
    // "banana"(25)
    val c = costsDF("b" -> 9L, "a" -> 9L, "n" -> 9L,
      "ban" -> 10L, "ana" -> 10L, "nana" -> 30L)
    val segs = UnigramLm.segments(w, UnigramLm.viterbi(w, c))
      .select("piece").as[String].collect().toSeq
    assert(segs.sorted == Seq("ana", "ban"))
  }

  test("equal-cost tie prefers the longest final piece (smallest backpointer)") {
    val w = wordsDF("ab" -> 1L)
    // a+b = 200 ties ab = 200: the tiebreak must choose j=0, i.e. the
    // single piece "ab"
    val c = costsDF("a" -> 100L, "b" -> 100L, "ab" -> 200L)
    val segs = UnigramLm.segments(w, UnigramLm.viterbi(w, c))
      .select("piece").as[String].collect().toSeq
    assert(segs == Seq("ab"))
  }

  test("segmentation always reconstructs every word exactly, in order") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "concatenation of pieces reconstructs"),
      (3L, "zz zz yyy xxxx")).toDF("doc_id", "text")
    val w = UnigramLm.words(docs)
    val vocab = UnigramLm.withCosts(UnigramLm.seedVocab(w))
    val dp = UnigramLm.viterbi(w, vocab)
    // backtrack pieces, re-concatenated right-to-left per word, must
    // equal the word — for EVERY word (single chars guarantee a path)
    val rebuilt = UnigramLm.segments(w, dp)
      .groupBy("word")
      // order by each piece's start offset — collect_list order after a
      // shuffle is not deterministic, the st column is
      .agg(expr("array_join(transform(sort_array(" +
        "collect_list(struct(st, piece))), x -> x.piece), '')").as("re"))
    assert(rebuilt.filter(col("word") =!= col("re")).isEmpty,
      rebuilt.filter(col("word") =!= col("re")).collect().mkString(","))
    val nWords = w.count()
    assert(rebuilt.count() == nWords)
  }

  test("segmentsLocal equals the relational viterbi+segments frame-for-frame") {
    // the fused row-local DP (one broadcast cost map + HOFs) must land on
    // exactly the relational unroll's segmentation — including argmin
    // ties (smallest j), missing-piece candidates (inner-join drop) and
    // multi-word corpora through the real seed/m-step vocabularies
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "the cat sat on the mat and the banana"),
      (3L, "abab abab baba concatenation"),
      (4L, "zz zz yyy xxxx qqqqqqqqqq")).toDF("doc_id", "text")
    val w = UnigramLm.words(docs)
    val round1 = UnigramLm.withCosts(UnigramLm.seedVocab(w))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("word", "wfreq", "piece", "st").count()
        .orderBy("word", "st").collect().toSeq
    assert(canon(UnigramLm.segmentsLocal(w, round1)) ==
      canon(UnigramLm.segments(w, UnigramLm.viterbi(w, round1))))
    // round 2: through the pruned/requantized vocabulary too
    val counts1 = UnigramLm.emCounts(UnigramLm.segmentsLocal(w, round1))
    val round2 = UnigramLm.withCosts(UnigramLm.mStep(counts1, w))
    assert(canon(UnigramLm.segmentsLocal(w, round2)) ==
      canon(UnigramLm.segments(w, UnigramLm.viterbi(w, round2))))
    // the hand-built tie fixture (smallest backpointer wins)
    val wt = wordsDF("ab" -> 1L)
    val ct = costsDF("a" -> 100L, "b" -> 100L, "ab" -> 200L)
    assert(UnigramLm.segmentsLocal(wt, ct)
      .select("piece").as[String].collect().toSeq == Seq("ab"))
  }

  test("m-step prunes unused multi-char pieces but never a character") {
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val w = UnigramLm.words(docs)
    val vocab = UnigramLm.withCosts(UnigramLm.seedVocab(w))
    val counts = UnigramLm.emCounts(UnigramLm.segments(w, UnigramLm.viterbi(w, vocab)))
    val v2 = UnigramLm.mStep(counts, w)
    val pieces = v2.select("piece").as[String].collect().toSet
    assert(pieces.contains("a") && pieces.contains("b"),
      "characters must survive pruning (segmentability floor)")
    assert(v2.filter(length(col("piece")) === 1).count() == 2)
  }
}
