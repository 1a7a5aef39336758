package graft

import org.apache.spark.sql.functions.col

import graft.operators.SuffixRanks

/** qb8's claim checked frame by frame: staging the suffix structure
  * (row-local keys, counted dictionary, dense ranks) and then
  * delete-compacting a tombstone set must equal staging from scratch
  * over the live corpus — on random two-letter corpora where suffix
  * keys collide and VANISH by construction, so the compaction-specific
  * hard case (a vanished key shifts every dense rank above it — the
  * case ingest-only q8x maintenance never faces) actually fires. */
class SuffixCompactionPropSpec extends SparkSpec {

  private def randomDoc(rnd: scala.util.Random): String =
    Seq.fill(5 + rnd.nextInt(26))(if (rnd.nextBoolean()) "a" else "b")
      .mkString

  private def stage(docs: Seq[(Long, String)], p: String): Unit = {
    import spark.implicits._
    SuffixRanks.suffixKeys(docs.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$p/pos")
    spark.read.parquet(s"$p/pos")
      .groupBy(col("key"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$p/counts")
    SuffixRanks.rankDict(spark.read.parquet(s"$p/counts"))
      .write.mode("overwrite").parquet(s"$p/dict")
  }

  private def frames(p: String): Map[String, Seq[String]] = {
    def rows(f: String): Seq[String] =
      spark.read.parquet(s"$p/$f").collect().map(_.toString).sorted.toSeq
    Map("pos" -> rows("pos"), "counts" -> rows("counts"),
      "dict" -> rows("dict"))
  }

  test("compactDelete equals restaging over the live corpus, frame by frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(4250913)
    var vanishFired = false
    var shiftFired = false
    for (trial <- 0 until 4) {
      val n = 12 + rnd.nextInt(8)
      val docs = (0 until n).map(i => (i.toLong, randomDoc(rnd)))
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_sfxcompact_$trial").toString
      stage(docs, s"$root/v0")
      val tomb = spark.read.parquet(s"$root/v0/pos")
        .select(col("doc_id")).distinct()
        .filter(col("doc_id") % 3 === 0)
      SuffixRanks.compactDelete(spark, tomb, s"$root/v0", s"$root/v1")
      stage(docs.filter(_._1 % 3 != 0), s"$root/rebuild")
      val got = frames(s"$root/v1")
      val want = frames(s"$root/rebuild")
      for (f <- Seq("pos", "counts", "dict"))
        assert(got(f) == want(f),
          s"trial $trial: $f diverges from the live restage\n" +
            s" got=${got(f)}\nwant=${want(f)}\ndocs=$docs")
      // hard cases: a key vanished, and a surviving key's rank shifted
      val oldKeys = spark.read.parquet(s"$root/v0/counts")
        .select("key").as[String].collect().toSet
      val newDict = spark.read.parquet(s"$root/v1/dict")
        .as[(String, Long)].collect().toMap
      val oldDict = spark.read.parquet(s"$root/v0/dict")
        .as[(String, Long)].collect().toMap
      if ((oldKeys -- newDict.keySet).nonEmpty) vanishFired = true
      if (newDict.exists { case (k, r) => oldDict(k) != r }) shiftFired = true
    }
    assert(vanishFired,
      "no trial made a key vanish — shrink the alphabet or docs")
    assert(shiftFired,
      "no trial shifted a surviving rank — the renumber went untested")
  }

  test("the compacted audit measure equals the doubling rounds over the live corpus") {
    // end-to-end qb8 semantics: serve (pos ⋈ renumbered dict, global
    // group sizes) from the compacted structure ≡ the rank_4 audit the
    // doubling rounds compute over the live corpus — the q8x
    // rank≡key-dense-rank equivalence carried through a delete.
    import spark.implicits._
    val rnd = new scala.util.Random(7180141)
    val docs = (0 until 18).map(i => (i.toLong, randomDoc(rnd)))
    val root = java.nio.file.Files
      .createTempDirectory("graft_sfxcompact_audit").toString
    stage(docs, s"$root/v0")
    val tomb = Seq(0L, 3L, 6L, 9L, 12L, 15L).toDF("doc_id")
    SuffixRanks.compactDelete(spark, tomb, s"$root/v0", s"$root/v1")
    val ranked = spark.read.parquet(s"$root/v1/pos")
      .join(spark.read.parquet(s"$root/v1/dict"), Seq("key"))
      .select(col("doc_id"), col("pos"), col("r"))
    val grp = ranked.groupBy(col("r"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("grp"))
    val got = ranked.join(grp, Seq("r"))
      .select(col("doc_id"), col("pos"), col("r").as("rank"), col("grp"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val live = docs.filter(_._1 % 3 != 0)
    val finalRanks = SuffixRanks.rounds(live.toDF("doc_id", "text")).last
    val wantGrp = finalRanks.groupBy(col("r"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("grp"))
    val want = finalRanks.join(wantGrp, Seq("r"))
      .select(col("doc_id"), col("pos"), col("r").as("rank"), col("grp"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == want, s"audit diverges:\n got=$got\nwant=$want")
  }
}
