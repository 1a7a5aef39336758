package graft.tools

import graft.{GraftSession, SparkEntry}

/** Replays the driver's smoke check: SparkEntry.entry must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
