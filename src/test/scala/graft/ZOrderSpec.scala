package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** The z-order layout's contract is about FILES: after
  * `ZOrder.layout(...).write`, every parquet file's min/max bounding box
  * must be tight in BOTH key columns (so a predicate on either dimension
  * prunes most files), while a single-column sort leaves the other
  * dimension full-width in every file. Measured on actually-written
  * parquet via input_file_name(), not on in-memory partitions.
  */
class ZOrderSpec extends SparkSpec {

  /** AVERAGE per-file min/max width per dimension: the expected fraction
    * of files a random point/range predicate cannot prune. Average, not
    * max — a z-range that straddles a high-bit curve transition
    * legitimately spans one dimension fully (the curve jumps across the
    * domain there); skipping economics are driven by the typical file. */
  private def perFileWidths(path: String, a: String, b: String) = {
    val df = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col(a)) - min(col(a))).as("wa"),
        (max(col(b)) - min(col(b))).as("wb"))
    (df.agg(avg(col("wa"))).head.getDouble(0),
      df.agg(avg(col("wb"))).head.getDouble(0))
  }

  test("z-order layout: typical written file is tight in BOTH dims; sort-by-one is not") {
    import java.nio.file.Files
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").cast("double").as("pk"),
        col("l_suppkey").cast("double").as("sk"))
    val (pkW, skW) = (
      li.agg(max(col("pk")) - min(col("pk"))).head.getDouble(0),
      li.agg(max(col("sk")) - min(col("sk"))).head.getDouble(0))

    val zDir = Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath
    ZOrder.layout(li, "pk", "sk", bits = 15, partitions = 8)
      .drop("_z").write.mode("overwrite").parquet(zDir)
    val (zPk, zSk) = perFileWidths(zDir, "pk", "sk")

    val sDir = Files.createTempDirectory("graft_sorted").toFile.getAbsolutePath
    li.repartitionByRange(8, col("pk")).sortWithinPartitions(col("pk"))
      .write.mode("overwrite").parquet(sDir)
    val (sPk, sSk) = perFileWidths(sDir, "pk", "sk")

    // z-order: BOTH dims substantially narrower than the global range in
    // the typical file (8 files over a 2-D domain → each z-range covers
    // a fraction of both axes on average)
    assert(zPk < 0.75 * pkW, s"z-layout avg pk width $zPk not tight vs $pkW")
    assert(zSk < 0.75 * skW, s"z-layout avg sk width $zSk not tight vs $skW")
    // single-column sort: its own column is tight, the OTHER is full-width
    assert(sPk < 0.5 * pkW, s"pk-sorted layout should be tight in pk (got $sPk of $pkW)")
    assert(sSk > 0.9 * skW,
      s"pk-sorted layout should leave sk full-width per file (got $sSk of $skW)")
  }
}
