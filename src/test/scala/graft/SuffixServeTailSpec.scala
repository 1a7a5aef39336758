package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

import graft.operators.SuffixRanks

/** The counts-invariant serve tail ([[SuffixRanks.auditServe]]) pinned
  * frame-identical to the shape it replaced — join the corpus-sized pos
  * frame to the dict, THEN groupBy(r) for global group sizes, then
  * sample — on both structures the serve tails read: a freshly STAGED
  * index (q8x's shape, counts derived by one groupBy(key) pass) and a
  * delete-COMPACTED one (qb8/qc5's shape, counts maintained as index
  * state through the debit). Random two-letter corpora make suffix keys
  * collide and vanish by construction, so group sizes > 1 and
  * count-debited keys both actually occur. The equivalence being
  * checked is the bijection argument in auditServe's scaladoc: dict's
  * key↔r is a dense rank over distinct keys, so a rank's global group
  * size IS its key's live-position count. */
class SuffixServeTailSpec extends SparkSpec {

  private def randomDoc(rnd: scala.util.Random): String =
    Seq.fill(5 + rnd.nextInt(26))(if (rnd.nextBoolean()) "a" else "b")
      .mkString

  /** The pre-round-16 serve tail: full pos⋈dict, group sizes by
    * groupBy(r) over the joined corpus frame, then the sample filter —
    * the corpus-sized join runs twice (once under the aggregate, once
    * for the detail rows). Kept verbatim as the semantic reference. */
  private def joinThenGroupBy(pos: DataFrame, dict: DataFrame): DataFrame = {
    val ranked = pos.join(dict, Seq("key"))
      .select(col("doc_id"), col("pos"), col("r"))
    val grp = ranked.groupBy(col("r")).agg(count(lit(1)).as("grp"))
    ranked.filter(col("doc_id") % SuffixRanks.SampleMod === 0)
      .join(grp, Seq("r"))
      .select(col("doc_id"), col("pos"), col("r").as("rank"), col("grp"))
      .orderBy(col("doc_id"), col("pos"))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq // ordered frames — compare as-is

  private def stage(docs: Seq[(Long, String)], p: String): Unit = {
    import spark.implicits._
    SuffixRanks.suffixKeys(docs.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$p/pos")
    spark.read.parquet(s"$p/pos")
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$p/counts")
    SuffixRanks.rankDict(spark.read.parquet(s"$p/counts"))
      .write.mode("overwrite").parquet(s"$p/dict")
  }

  test("auditServe equals join-then-groupBy on a staged structure (q8x shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9034127)
    for (trial <- 0 until 3) {
      // doc_id space wide enough that the SampleMod filter keeps a
      // strict, non-empty subset (multiples of 25 up to 75)
      val docs = (0 until 80).map(i => (i.toLong, randomDoc(rnd)))
      val pos = SuffixRanks.suffixKeys(docs.toDF("doc_id", "text"))
      val dict = SuffixRanks.rankDict(pos)
      // q8x derives counts with one partial-aggregated pass over keys
      val counts = pos.groupBy(col("key")).agg(count(lit(1)).as("n"))
      val got = rows(SuffixRanks.auditServe(pos, dict, counts))
      val want = rows(joinThenGroupBy(pos, dict))
      assert(got.nonEmpty, s"trial $trial: empty sample — widen doc_ids")
      assert(got == want,
        s"trial $trial: serve tails diverge\n got=$got\nwant=$want")
    }
  }

  test("auditServe equals join-then-groupBy on a compacted structure (qb8/qc5 shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5521783)
    val docs = (0 until 80).map(i => (i.toLong, randomDoc(rnd)))
    val root = java.nio.file.Files
      .createTempDirectory("graft_sfx_servetail").toString
    stage(docs, s"$root/v0")
    val tomb = spark.read.parquet(s"$root/v0/pos")
      .select(col("doc_id")).distinct()
      .filter(col("doc_id") % 3 === 0)
    SuffixRanks.compactDelete(spark, tomb, s"$root/v0", s"$root/v1")
    // the serve reads the maintained counts as index state — the debit
    // invariant under test: counts_v1(key) == |live positions of key|
    val pos = spark.read.parquet(s"$root/v1/pos")
    val dict = spark.read.parquet(s"$root/v1/dict")
    val counts = spark.read.parquet(s"$root/v1/counts")
    val got = rows(SuffixRanks.auditServe(pos, dict, counts))
    val want = rows(joinThenGroupBy(pos, dict))
    assert(got.nonEmpty, "empty sample — widen doc_ids")
    assert(got == want, s"serve tails diverge\n got=$got\nwant=$want")
  }
}
