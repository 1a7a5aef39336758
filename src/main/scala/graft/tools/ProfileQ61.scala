package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for the shingle-join pipeline stages. */
object ProfileQ61 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t = col("toks")
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .as("sh"))
    time("shingles only")(sh.count())
    time("shingles only again")(sh.count())
    val posting = sh.select(col("doc_id"), explode(col("sh")).as("sh"))
    time("posting explode")(posting.count())
    val lists = posting.groupBy("sh").agg(sort_array(collect_list("doc_id")).as("ids"))
    time("group to lists")(lists.count())
    val pairs = posting.as("a").join(posting.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)).as("inter"))
    time("self-join pairs")(pairs.count())
    spark.stop()
  }
}
