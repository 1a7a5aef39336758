package graft

import org.apache.spark.sql.functions._
import graft.operators.IterationCheckpoint

/** Contract of the iterative-loop lineage cut: in BOTH modes (default
  * executor-local, durable-dir knob) the returned frame's logical plan is
  * a materialized leaf — rebinding `var df = cut(transform(df))` must not
  * grow the plan, and the durable mode must actually write RDD
  * checkpoint files under the configured directory. */
class IterationCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def planDepth(df: org.apache.spark.sql.DataFrame): Int = {
    def d(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(d).max
    d(df.queryExecution.optimizedPlan)
  }

  test("default mode: lineage is cut to a leaf and loops do not grow the plan") {
    var df = (1L to 100L).toDF("id")
    val depths = (1 to 5).map { _ =>
      df = IterationCheckpoint.cut(
        df.groupBy((col("id") % 10).as("k")).agg(sum(col("id")).as("id"))
          .select((col("k") * 7 + col("id")).as("id")))
      planDepth(df)
    }
    // every round's cut frame is a leaf-rooted scan of materialized
    // blocks: constant depth, not linear in round count
    assert(depths.distinct.size == 1, s"plan depth grew across rounds: $depths")
    assert(depths.head <= 2, s"cut frame is not leaf-rooted: depth ${depths.head}")
    assert(df.count() > 0)
  }

  test("durable mode: checkpoint files land under the configured dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.conf.set(IterationCheckpoint.ConfKey, dir.getAbsolutePath)
    try {
      var df = (1L to 50L).toDF("id")
      (1 to 3).foreach { _ =>
        df = IterationCheckpoint.cut(df.select((col("id") + 1).as("id")))
      }
      assert(planDepth(df) <= 2, "durable cut frame is not leaf-rooted")
      assert(df.agg(sum("id")).head.getLong(0) == (4L to 53L).sum)
      // the reliable checkpoint must have materialized to the durable dir
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(dir).nonEmpty,
        s"no checkpoint files written under ${dir.getAbsolutePath}")
    } finally {
      spark.conf.unset(IterationCheckpoint.ConfKey)
    }
  }

  test("operators converge identically under the durable knob") {
    // the knob must be semantics-invisible: CC labels on a small graph
    // are identical with and without it
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 8L))
      .toDF("id_a", "id_b")
    val plain = graft.operators.ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toFile
    spark.conf.set(IterationCheckpoint.ConfKey, dir.getAbsolutePath)
    try {
      val durable = graft.operators.ConnectedComponents.run(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(durable === plain)
    } finally {
      spark.conf.unset(IterationCheckpoint.ConfKey)
    }
  }

  test("pagerank converges identically under the durable knob") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    def ranks(): Map[Long, Double] =
      graft.operators.PageRank.run(nodes, edges, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = ranks()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt3").toFile
    spark.conf.set(IterationCheckpoint.ConfKey, dir.getAbsolutePath)
    try assert(ranks() === plain)
    finally spark.conf.unset(IterationCheckpoint.ConfKey)
  }

  test("durable-mode frames re-read checkpoint FILES, not executor blocks") {
    // the recovery contract: localCheckpoint blocks die with their
    // executor (lineage was cut — the job fails); reliable checkpoints
    // re-read their durable files on ANY block loss. Witnessed here by
    // consuming the durable frame after wiping every cached/persisted
    // block from the block manager — only a file-backed plan survives
    // that with correct results.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt4").toFile
    spark.conf.set(IterationCheckpoint.ConfKey, dir.getAbsolutePath)
    try {
      val durable = IterationCheckpoint.cut(
        spark.range(1000).toDF("n")
          .selectExpr("n", "n * n AS sq"))
      // simulate total block loss: drop every block the block manager
      // holds (this is what an executor death does to ITS blocks)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      assert(durable.selectExpr("sum(sq)").head().getLong(0) ==
        (0L until 1000L).map(n => n * n).sum,
        "durable frame must recompute from checkpoint files after block loss")
    } finally spark.conf.unset(IterationCheckpoint.ConfKey)
  }
}
