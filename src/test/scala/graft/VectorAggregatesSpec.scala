package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAggregates

/** Typed Aggregator UDAF spec (SURVEY.md §2.11). */
class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("vector_mean: elementwise mean with partial aggregation across partitions") {
    val df = Seq(
      (1, Array(1.0f, 2.0f, 3.0f)),
      (1, Array(3.0f, 4.0f, 5.0f)),
      (2, Array(10.0f, 20.0f, 30.0f))
    ).toDF("label", "v").repartition(3) // force multi-partition merge path
    val rows = df.groupBy("label")
      .agg(VectorAggregates.vector_mean(col("v")).as("m"))
      .orderBy("label").collect()
    assert(rows(0).getSeq[Double](1) == Seq(2.0, 3.0, 4.0))
    assert(rows(1).getSeq[Double](1) == Seq(10.0, 20.0, 30.0))
  }

  test("vector_mean: empty group-side nulls don't poison the buffer") {
    val df = Seq(
      (1, Option(Array(2.0f, 4.0f))),
      (1, Option.empty[Array[Float]])
    ).toDF("label", "v")
    val m = df.groupBy("label")
      .agg(VectorAggregates.vector_mean(col("v")).as("m"))
      .collect().head.getSeq[Double](1)
    assert(m == Seq(2.0, 4.0))
  }
}
