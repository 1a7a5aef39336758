package graft

import org.apache.spark.sql.functions._
import graft.queries.TextAnalysis

/** Contracts of the content-defined chunker (q5y):
  *   1. partition: chunks concatenate back to the original text, for
  *      every length including docs shorter than the 8-char window;
  *   2. the SHIFT-RESISTANCE property that is the whole point of
  *      content-defined (vs fixed-width) chunking: prepending a prefix
  *      to a document changes only the chunks up to the first boundary
  *      after the edit — the chunk sequence re-synchronizes and the
  *      tail chunks are IDENTICAL, so shared passages dedupe across
  *      near-duplicate docs no matter where they sit;
  *   3. boundary decisions are deterministic pure functions of content
  *      (same text twice → same chunks).
  */
class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(texts: Seq[String]): Map[Long, Seq[String]] =
    TextAnalysis.cdcChunks(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .groupBy("doc_id")
      .agg(collect_list(col("chunk")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen green " +
      "bottles stand on the wall and the rain in spain falls mainly on " +
      "the plain as counted by fourty two careful shepherds at dawn"

  test("chunks partition the text (all lengths incl. sub-window docs)") {
    val texts = Seq("", "a", "abcdefg", "abcdefgh", base, base * 3)
    val got = chunksOf(texts.filter(_.nonEmpty))
    got.foreach { case (id, cs) =>
      val original = texts.filter(_.nonEmpty)(id.toInt)
      assert(cs.mkString === original, s"doc $id does not re-assemble")
      assert(cs.forall(_.nonEmpty), s"doc $id has an empty chunk")
    }
  }

  test("shift resistance: a prepended edit leaves the tail chunks intact") {
    val shifted = "EDIT: " + base
    val cs = chunksOf(Seq(base, shifted))
    val (a, b) = (cs(0L), cs(1L))
    // after re-synchronization the suffix chunk lists must coincide:
    // find the longest common chunk suffix — it must cover most of the
    // document (everything after the first post-edit boundary)
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(common >= 1, s"no shared tail chunks at all: $a vs $b")
    val sharedChars = a.takeRight(common).map(_.length).sum
    assert(sharedChars >= base.length / 2,
      s"re-sync covered only $sharedChars of ${base.length} chars")
    // and a fixed-width chunker over the same pair would share NOTHING:
    // every 32-char window shifts by the edit length
    val fixedA = base.grouped(32).toSeq
    val fixedB = shifted.grouped(32).toSeq
    assert(fixedA.toSet.intersect(fixedB.toSet).isEmpty)
  }

  test("determinism: identical texts produce identical chunk sequences") {
    val cs = chunksOf(Seq(base, base))
    assert(cs(0L) === cs(1L))
  }

  test("non-BMP text fails LOUDLY instead of silently diverging from the oracle") {
    // Spark's ascii() returns the UTF-16 code unit, DuckDB's ord() the
    // code point — supplementary-plane characters make the two hash
    // algebras silently disagree. The committed fixtures are BMP-only;
    // if a driver regeneration ever ships emoji-class text, the chunker
    // must raise, not produce oracle-mismatched boundaries.
    val e = intercept[Exception] { chunksOf(Seq(base + "😀 emoji")) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-BMP")), e.getMessage)
    // BMP non-ASCII (accents, CJK) is fine — both engines agree there
    assert(chunksOf(Seq(base + " café 中文"))(0L).mkString ===
      base + " café 中文")
  }
}
