package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped AQE partition-coalescing override.
  * `spark.sql.adaptive.coalescePartitions.parallelismFirst` is TRUE by
  * default (coalesce only down to the default parallelism, keeping
  * ~#cores partitions however small the data); Spark's own docs
  * recommend setting it false in production so post-shuffle partitions
  * target `advisoryPartitionSizeInBytes` instead. Measured here
  * (cpus=32, sf0.1), the honest result is NARROW: for a LONE iterative
  * chain the default is right — idle cores want the spread (scoping the
  * flag into ConnectedComponents regressed q6a 3.4→4.4 s, q8f
  * 6.1→8.3 s) — and compute-dense narrow-byte stages lose badly
  * session-wide (qau 16.4→23.9 s). The flag WINS when several
  * independent chains run CONCURRENTLY from driver threads
  * ([[DriverPar]]) and would otherwise fight over per-stage tiny
  * partitions: qb2's five-level CC sweep measured 9.5→6.6 s with it
  * scoped around the parallel block. So: scope it around concurrent
  * chain blocks only, restore after. At 100 TB the same setting keeps
  * full parallelism (frames ≫ advisory size).
  */
object AqeConf {
  val Key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

  def coalesceBySize[T](s: SparkSession)(f: => T): T = {
    val prev = s.conf.getOption(Key)
    s.conf.set(Key, "false")
    try f
    finally prev match {
      case Some(v) => s.conf.set(Key, v)
      case None    => s.conf.unset(Key)
    }
  }
}
