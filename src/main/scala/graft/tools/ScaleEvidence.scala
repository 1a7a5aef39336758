package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end scale-up evidence: run the HEAVIEST queries, unmodified,
  * against a corpus replicated Nx, and report per-query wall growth —
  * the measurement that converts "designed for 100x" from argument to
  * number. Unlike ScaleProbe (per-operator modes with controlled
  * deltas), this drives the actual `SparkEntry.queries` entries through
  * synthetic sf directories, so every staged index, stream drain and
  * oracle-side materialization scales together.
  *
  * Replication is DENSE (new_id = id + copy · |original|): the
  * count-based base/delta splits (qb3/qb5/qc2's `id < n - n/16`) and
  * residue rules keep their intended proportions, which sparse
  * stride-1e6 ids would invert. Document text is salted with a
  * per-copy token so the near-dup pair structure stays per-family
  * instead of exploding quadratically across copies (the ScaleProbe
  * bloom-probe discipline); embeddings replicate exactly (ties break
  * by id, the existing probe convention).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleEvidence 10 qau,qb8"
  */
object ScaleEvidence {

  private def densify(df: DataFrame, idCol: String, copies: Int,
      saltText: Boolean): DataFrame = {
    // stride = max(id) + 1, not count(): source ids with gaps or offsets
    // would otherwise collide replicated ids across copies, silently
    // corrupting the scaled corpus and every count-based split over it
    // (coalesce guards the empty-frame null; cast guards non-long ids)
    val n = df.agg(coalesce(max(col(idCol)).cast("long"), lit(-1L)))
      .head.getLong(0) + 1L
    val rep = df
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn(idCol, col(idCol) + col("copy") * lit(n))
    val salted =
      if (saltText) rep.withColumn("text",
        concat(col("text"), lit(" c"), col("copy")))
      else rep
    salted.drop("copy")
  }

  private def stage(s: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    densify(s.read.parquet(s"$src/documents.parquet"), "doc_id", copies,
        saltText = true)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    densify(s.read.parquet(s"$src/embeddings.parquet"), "vec_id", copies,
        saltText = false)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val defaultHeavy = "qb3,qb5,qb8,qau,q8v,q8x,q97,qal,qb2,qat"
    val prefixes = (if (args.length > 1) args(1) else defaultHeavy)
      .split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_scale_evidence"
    stage(spark, src, s"$root/x1", 1)
    stage(spark, src, s"$root/x$copies", copies)

    def run(name: String, fn: (SparkSession, String) => DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite")
        .parquet(s"$root/out/${name}_${dir.split('/').last}")
      (System.nanoTime() - t0) / 1e9
    }

    println(s"[evidence] copies=$copies cpus=$cpus src=$src")
    println("[evidence] query                              w1x      wNx  " +
      "growth_exp")
    for (p <- prefixes) {
      graft.SparkEntry.queries.find(_._1.startsWith(p)) match {
        case None => println(s"[evidence] $p: no such query")
        case Some((name, fn)) =>
          // two attempts per scale, min — the 2nd is the warmed one
          val w1 = Seq(run(name, fn, s"$root/x1"),
            run(name, fn, s"$root/x1")).min
          val wN = Seq(run(name, fn, s"$root/x$copies"),
            run(name, fn, s"$root/x$copies")).min
          val exp = math.log(wN / w1) / math.log(copies.toDouble)
          println(f"[evidence] $name%-34s $w1%7.2fs $wN%7.2fs  $exp%6.2f")
      }
    }
    spark.stop()
  }
}
