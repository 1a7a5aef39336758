package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IterationCheckpoint, StableIds, SuffixRanks}

/** A/B probe for the round-15 settled-group pruning: time qau's audit
  * through the PRUNED rounds (production path) against an in-place
  * replica of the pre-round-15 unpruned doubling, same session, same
  * corpus — the box-drift-proof comparison a baseline row can't give.
  *
  * Run: sbt "runMain graft.tools.SuffixPruneProbe [sfDir] [passes]"
  */
object SuffixPruneProbe {

  /** The pre-round-15 doubling, replayed verbatim (the
    * SuffixRanksPropSpec reference, audit shape included: per-round
    * corpus-wide keyed join + distinct + map-back + the audit's
    * groupBy(rank) count join). */
  private def unprunedAudit(d: DataFrame): DataFrame = {
    var ranks = IterationCheckpoint.cut(SuffixRanks.positions(d))
    val frames = (1 to SuffixRanks.Rounds).map { k =>
      val gap = 1 << (k - 1)
      val shifted = ranks.select(col("doc_id"),
        (col("pos") - gap).as("pos"), col("r").as("r2"))
      val keyed = ranks.join(shifted, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("r").as("r1"),
          coalesce(col("r2"), lit(0L)).as("r2"))
      val keys = StableIds.assign(
        keyed.select(col("r1"), col("r2")).distinct(),
        Seq(col("r1"), col("r2")), SuffixRanks.Partitions, "nr")
      ranks = IterationCheckpoint.cut(keyed.join(keys, Seq("r1", "r2"))
        .select(col("doc_id"), col("pos"), col("nr").as("r")))
      ranks
    }
    frames.zipWithIndex.map { case (rk, i) =>
      val grp = rk.groupBy(col("r")).agg(count(lit(1)).as("grp"))
      rk.filter(col("doc_id") % SuffixRanks.SampleMod === 0)
        .join(grp, Seq("r"))
        .select(lit(i + 1).as("rnd"), col("doc_id"), col("pos"),
          col("r").as("rank"), col("grp"))
    }.reduce(_ unionByName _)
      .orderBy(col("rnd"), col("doc_id"), col("pos"))
  }

  /** The MOSTLY-UNIQUE corpus the round-15 probe could not stage (the
    * driver's boilerplate corpus keeps 72% of positions in shared
    * 16-char groups, so the adaptive gate folds the pruning away): 80%
    * of docs get pseudo-random hex text of the SAME length (16-char
    * chunks of xxhash64(doc_id, chunk) — no within- or cross-doc
    * repetition, so their groups go singleton after round 1), 20% keep
    * the boilerplate originals (the persistent active set). This is the
    * real-text 100 TB shape: a bounded boilerplate core inside a
    * mostly-unique corpus. */
  private def uniqueText = expr(
    """substring(concat_ws('', transform(
         sequence(0, CAST(length(text) / 16 AS INT)),
         c -> lpad(hex(xxhash64(doc_id * 1000003 + c)), 16, '0'))),
       1, length(text))""")

  /** Shape + 10×-style densify in one pass (the ScaleEvidence recipe,
    * unique-aware): ids strided by max+1 so copies never collide;
    * UNIQUE docs (orig id % 5 ≠ 0) derive hex text from their NEW id,
    * so every copy is unique too; boilerplate docs salt a copy suffix,
    * so cross-copy sharing matches the source's intra-copy sharing. */
  private def shape(d: DataFrame, mode: String, copies: Int): DataFrame = {
    val n = d.agg(coalesce(max(col("doc_id")), lit(-1L))).head.getLong(0) + 1L
    val rep =
      if (copies <= 1) d.withColumn("orig", col("doc_id"))
        .withColumn("copy", lit(0))
      else d.withColumn("orig", col("doc_id"))
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .withColumn("doc_id", col("orig") + col("copy") * lit(n))
    val boiler = pmod(col("orig"), lit(5)) === 0
    val shaped =
      if (mode == "unique")
        rep.select(col("doc_id"), col("copy"), col("orig"),
          when(boiler, col("text")).otherwise(uniqueText).as("text"),
          boiler.as("b"))
      else rep.select(col("doc_id"), col("copy"), col("orig"),
        col("text"), lit(true).as("b"))
    shaped.select(col("doc_id"),
      when(col("b") && col("copy") > 0,
        concat(col("text"), lit(" c"), col("copy")))
        .otherwise(col("text")).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "boiler"
    val copies = if (args.length > 3) args(3).toInt else 1
    val spark: SparkSession = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val d = IterationCheckpoint.cut(shape(d0, mode, copies))
    println(s"[prune] mode=$mode copies=$copies docs=${d.count()}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prune] $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // per-round active-set sizes (the shrink the pruning monetizes)
    val sizes = SuffixRanks.roundsWithGroups(d)
      .map(_.filter(col("grp") > 1).count())
    println(s"[prune] active positions entering each round's successor: " +
      sizes.mkString(", "))
    for (p <- 1 to passes) {
      time(s"pass$p pruned  ")(SuffixRanks.audit(d).count())
      time(s"pass$p unpruned")(unprunedAudit(d).count())
    }
    spark.stop()
  }
}
