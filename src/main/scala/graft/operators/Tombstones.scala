package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two halves of the tombstones-vs-corpus join contract in one
  * place. Every delete path in the engine (suffix/minhash compaction,
  * the IVF/PQ/graph serve-under-tombstones queries, the streaming
  * retraction folds) screens a corpus-sized frame against a tombstone
  * id set with an anti (or semi) join. Two regimes:
  *
  *   - tombstones ≪ corpus (the overwhelmingly common case — a
  *     compliance sweep is parts-per-thousand of a 100 TB corpus): the
  *     id set is a BROADCAST build side — no shuffle of the corpus
  *     frame at all;
  *   - tombstones past [[MaxBroadcast]] (4M ids ≈ 32 MB serialized —
  *     a mass-erasure event, a whole-source takedown): broadcasting
  *     would OOM the driver/executors, so the join degrades to a
  *     SHUFFLE-HASH anti join — both sides hash-sharded by the id, the
  *     tombstone shard (still the small side) builds the per-partition
  *     hash table, the corpus streams. The hint keeps Spark from
  *     picking a sort-merge join: the build side needs no sort, and
  *     the corpus side never needs more than its shuffle.
  *
  * Until round 14 the second regime REFUSED loudly
  * (`require(n <= MaxBroadcastTombstones)`); this replaces the refusal
  * with the degrade path. `TombstoneShardPropSpec` proves the two
  * regimes produce identical frames on random id sets straddling the
  * cap; ScaleProbe's `tombshard` mode measures the crossover. */
object Tombstones {

  /** Past this many ids the build side stops broadcasting (4M ids ≈
    * 32 MB serialized — the classic autoBroadcastJoinThreshold order
    * of magnitude, stated in ids because every caller joins on one
    * long/string key column). */
  val MaxBroadcast = 4L * 1000 * 1000

  private def keyed(tomb: DataFrame, key: String): DataFrame =
    tomb.select(col(tomb.columns.head).as(key))

  // maxBroadcast is a parameter (not a read of the val) so the prop
  // spec can force the shuffle-hash regime on spec-sized id sets and
  // prove the two regimes frame-identical without staging 4M ids
  private[graft] def joinWith(df: DataFrame, key: String, tomb: DataFrame,
      joinType: String, tombCount: Option[Long],
      maxBroadcast: Long = MaxBroadcast): DataFrame = {
    val t = keyed(tomb, key)
    // count() only when the caller doesn't already know the cardinality
    // (the compaction paths count anyway and share one count across all
    // their joins; the serve paths accept one cheap count of a
    // by-contract-small change-log frame)
    val n = tombCount.getOrElse(t.count())
    if (n <= maxBroadcast) df.join(broadcast(t), Seq(key), joinType)
    else df.join(t.hint("shuffle_hash"), Seq(key), joinType)
  }

  /** `df` minus the rows whose `key` appears in `tomb` (first column of
    * `tomb` is taken as the id). Duplicate tombstone ids are harmless —
    * anti-join semantics dedup by construction. */
  def antiJoin(df: DataFrame, key: String, tomb: DataFrame,
      tombCount: Option[Long] = None): DataFrame =
    joinWith(df, key, tomb, "left_anti", tombCount)

  /** The rows of `df` whose `key` appears in `tomb` — the debit-side
    * twin of [[antiJoin]] (compactions read the dead rows to subtract
    * their contributions before dropping them). */
  def semiJoin(df: DataFrame, key: String, tomb: DataFrame,
      tombCount: Option[Long] = None): DataFrame =
    joinWith(df, key, tomb, "left_semi", tombCount)
}
