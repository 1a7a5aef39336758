package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cutting for the iterative driver-loop operators (PageRank,
  * TrustRank, CC, k-core, SCC, k-means): round N's plan must not replay
  * rounds 1..N-1, and the driver's plan size must stay bounded.
  *
  * Default is `localCheckpoint` — executor-local blocks, fastest, but the
  * blocks die with an executor, and on a real cluster a lost executor
  * mid-iteration then fails the job with no recompute path (lineage was
  * cut). That trade is right for local/bench runs and WRONG for a
  * 1000-executor job that runs for hours, so cluster runs set
  *
  *   spark.graft.iteration.checkpointDir = <durable path, e.g. HDFS/S3>
  *
  * and every operator loop switches to reliable `checkpoint()` into that
  * directory (recoverable from any executor loss, at the cost of a write
  * to durable storage per round — amortized trivially at 100 TB scale
  * where a round's state is narrow id/label/rank rows).
  *
  * Contract (spec: `IterationCheckpointSpec`): either way the returned
  * frame's logical plan is a leaf over materialized blocks/files — the
  * operator loops may rebind `var df = cut(transform(df))` indefinitely
  * without plan growth.
  */
object IterationCheckpoint {

  /** Session conf key holding the durable checkpoint directory. Unset =
    * executor-local checkpoint (fast, not fault-tolerant). */
  val ConfKey = "spark.graft.iteration.checkpointDir"

  /** The [[ConfKey]] value the context's checkpoint dir was last set
    * from. setCheckpointDir appends a UUID subdir, so re-setting on
    * every call would spray directories — but setting only while
    * `sc.getCheckpointDir.isEmpty` (the previous rule) made the FIRST
    * configured dir sticky for the JVM's lifetime: re-pointing the conf
    * (tests; a session re-targeted at new storage) silently kept
    * writing checkpoints to the old path. Set once per configured
    * VALUE instead. */
  @volatile private var setFrom: Option[String] = None

  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = df.sparkSession.sparkContext
        // reliable checkpoint is eager for DataFrames (materializes
        // now, like localCheckpoint), so loop convergence probes stay
        // cheap
        if (sc.getCheckpointDir.isEmpty || !setFrom.contains(dir)) {
          sc.setCheckpointDir(dir)
          setFrom = Some(dir)
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
}
