package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Lineage, Tables}

/** Column-level lineage (SURVEY.md §2.1 S5): per-output-column provenance
  * from the resolved plan's expression references — the metadata piece a
  * pipeline platform reports alongside dataset-level lineage. */
class ColumnLineageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q11-style multiway join + aggregate reports per-column provenance") {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val n = Tables.load(spark, dir, "nation")
    val out = c.join(o, col("c_custkey") === col("o_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(
        sum(col("o_totalprice")).as("revenue"),
        countDistinct(col("c_custkey")).as("n_custs"),
        (max(col("o_totalprice")) - min(col("c_acctbal"))).as("spread"))
    val lin = Lineage.columnLineage(out)
    assert(lin("n_name") == Set("nation" -> "n_name"))
    assert(lin("c_mktsegment") == Set("customer" -> "c_mktsegment"))
    assert(lin("revenue") == Set("orders" -> "o_totalprice"))
    assert(lin("n_custs") == Set("customer" -> "c_custkey"))
    assert(lin("spread") ==
      Set("orders" -> "o_totalprice", "customer" -> "c_acctbal"))
  }

  test("renames, expressions, windows and explodes keep provenance") {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("uid")).orderBy(col("ts"))
    val out = e.select(col("user_id").as("uid"), col("ts"), col("props"))
      .withColumn("rn", row_number().over(w))
      .withColumn("tok", explode(split(col("props"), ",")))
      .select(col("uid"), col("rn"), upper(col("tok")).as("tok_uc"))
    val lin = Lineage.columnLineage(out)
    assert(lin("uid") == Set("events" -> "user_id"))
    assert(lin("rn") == Set("events" -> "user_id", "events" -> "ts"))
    assert(lin("tok_uc") == Set("events" -> "props"))
  }

  test("a view registered over a leaf rebrands the source; unions merge provenance") {
    import spark.implicits._
    val c = Tables.load(spark, dir, "customer")
    Lineage.register(c, "crm_customers")
    val v = spark.table("crm_customers")
      .select(col("c_name").as("who"))
    val u = v.unionByName(
      Tables.load(spark, dir, "supplier").select(col("s_name").as("who")))
    val lin = Lineage.columnLineage(u)
    assert(lin("who") ==
      Set("crm_customers" -> "c_name", "supplier" -> "s_name"))
  }

  test("streaming: a CDC drain reports per-column provenance to the graft-doc table's columns") {
    import spark.implicits._
    import graft.connector.GraftDoc
    // the streaming half of S5: every micro-batch notifies the session's
    // QueryExecutionListener bus with its analyzed plan; the capture
    // walks it with the same machinery as the batch path. The DSv2
    // streaming scan relation keeps the table identity (graft-doc:<path>)
    // inside IncrementalExecution, so provenance points at the CDC
    // SOURCE TABLE's columns, through renames and expressions.
    val src = java.nio.file.Files.createTempDirectory("lin_cdc_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lin_cdc_ckpt").toString
    GraftDoc.write(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "name", "score"), "k", src)
    val cap = Lineage.captureColumnLineage(spark)
    try {
      val q = GraftDoc.readStream(spark, src)
        .select(
          col("_id").as("doc_key"),
          upper(col("name")).as("uname"),
          (col("score") * 2).as("dscore"))
        .writeStream.format("memory").queryName("lin_cdc_mem")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener bus is async; other session actions may interleave —
      // poll for the micro-batch map, identified by its output columns
      val deadline = System.nanoTime() + 20000000000L
      var found: Option[Map[String, Set[(String, String)]]] = None
      while (found.isEmpty && System.nanoTime() < deadline) {
        found = cap.results.find(_.contains("doc_key"))
        if (found.isEmpty) Thread.sleep(100)
      }
      val lin = found.getOrElse(
        fail(s"no micro-batch column lineage captured; got: ${cap.results}"))
      val tn = s"graft-doc:$src"
      assert(lin("doc_key") == Set(tn -> "_id"))
      assert(lin("uname") == Set(tn -> "name"))
      assert(lin("dscore") == Set(tn -> "score"))
    } finally spark.listenerManager.unregister(cap)
  }
}
