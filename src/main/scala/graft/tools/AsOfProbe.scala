package graft.tools

import graft.GraftSession
import graft.plans.AsOfJoinOps
import org.apache.spark.sql.functions._

/** Timing probe: shuffle-merge vs broadcast as-of at replicated scale. */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[asof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // left: events replicated 10x (~100k rows); right: orders (dim-sized)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("copy", explode(sequence(lit(0), lit(9))))
      .select(col("user_id"), col("ts").as("ts_l"), col("event_id"), col("copy"))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate"))
    def run(bcast: Boolean): Long =
      AsOfJoinOps.asofJoin(spark, ev, orders,
        "user_id", "o_custkey", "ts_l", "o_orderdate", broadcastRight = bcast)
        .filter(col("o_orderdate").isNotNull).count()
    val n1 = time("shuffle-merge x10")(run(false))
    val n2 = time("broadcast x10 (cold)")(run(true))
    val n3 = time("broadcast x10 (warm)")(run(true))
    println(s"[asof] rows matched: $n1 / $n2 / $n3 (must be equal)")
    spark.stop()
  }
}
