package graft.tools

import graft.GraftSession
import graft.functions.{HashExpressions, TextExpressions, VectorFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 corpus Nx (ids offset per copy) and
  * time the dedup/similarity scale paths, to observe how the pipelines
  * behave when data grows 10x while the machine stays fixed — the
  * local-mode proxy for the 100 TB question. Replication multiplies
  * near-dup pairs too (every copy collides with every other), which
  * stresses candidate generation superlinearly — a worst-case probe, not a
  * realistic corpus.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe [copies]"
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCol: String, copies: Int,
      stride: Long): DataFrame =
    df.withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn(idCol, col(idCol) + col("copy") * stride)
      .drop("copy")

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark: SparkSession = GraftSession.local(8)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = replicate(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
      "doc_id", copies, 1000000L)
    val emb = replicate(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", copies, 1000000L)
    println(s"[scale] docs=${docs.count()} vectors=${emb.count()} (copies=$copies)")

    // MinHash-LSH candidate generation (the scale path of q62)
    val d = docs.select(col("doc_id"),
      TextExpressions.word_shingles(col("text"), 3).as("sh"))
    val sig = d.select(col("doc_id"),
      HashExpressions.minhash_signature(col("sh"), k = 128).as("sig"))
    val buckets = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(31)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("bh")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    time(s"minhash-lsh candidates (${copies}x)")(println(s"[scale]   pairs=${cand.count()}"))

    // exact dedup (q60 path): shuffle carries 32-byte hashes only
    time(s"exact dedup (${copies}x)")(
      println(s"[scale]   groups=" + docs
        .groupBy(sha2(col("text"), 256)).agg(count(lit(1))).count()))

    // chunking (q5a path): row-local, scan-bound
    time(s"chunking (${copies}x)")(
      println(s"[scale]   chunks=" + docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(posexplode(sequence(lit(0), size(col("toks")) - 1, lit(40))))
        .count()))

    // graft-doc write + snapshot (q77 path): task-rolled files, MOR window
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_scale_sink")
      .toFile.getAbsolutePath
    time(s"graft-doc write+snapshot (${copies}x)") {
      graft.connector.GraftDoc.write(docs, "doc_id", sinkDir,
        overwrite = true, targetFileRows = Some(200000L))
      println(s"[scale]   snapshot=" +
        graft.connector.GraftDoc.snapshot(spark, sinkDir).count())
    }

    // IVF ANN probe (the scale path of q66): assign all vectors to 64 cells
    val cent = emb.filter(col("vec_id") < 64)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("cc").desc, col("cid"))
    val assign = emb.crossJoin(broadcast(cent))
      .withColumn("cc", VectorFunctions.cosine_sim(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    time(s"ivf assignment (${copies}x)")(
      println(s"[scale]   cells=${assign.groupBy("cid").count().count()}"))

    spark.stop()
  }
}
