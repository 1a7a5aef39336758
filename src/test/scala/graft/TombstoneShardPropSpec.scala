package graft

import graft.operators.Tombstones

/** The tombstone-join contract: the shuffle-hash regime (id sets past
  * [[Tombstones.MaxBroadcast]]) must be FRAME-IDENTICAL to the broadcast
  * regime it degrades from — same anti-join survivors, same semi-join
  * dead rows, duplicates and misses included. The spec forces the shard
  * regime with maxBroadcast = 0 on random id sets straddling a small
  * stand-in cap, so both plans execute at spec scale. */
class TombstoneShardPropSpec extends SparkSpec {

  private def randomCase(seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val corpus = (0L until 2000L).filter(_ => rnd.nextDouble() < 0.8)
    // tombstones: some present, some absent (misses), some duplicated
    val tomb0 = (0L until 2500L).filter(_ => rnd.nextDouble() < 0.3)
    val tomb = tomb0 ++ rnd.shuffle(tomb0).take(tomb0.size / 4) // dups
    (corpus, tomb)
  }

  test("sharded anti/semi join ≡ broadcast on random id sets") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val (corpusIds, tombIds) = randomCase(seed)
      val df = corpusIds.map(i => (i, s"p$i")).toDF("doc_id", "payload")
      val tomb = tombIds.toDF("doc_id")
      for (joinType <- Seq("left_anti", "left_semi")) {
        val bcast = Tombstones
          .joinWith(df, "doc_id", tomb, joinType, None,
            maxBroadcast = Long.MaxValue)
        val shard = Tombstones
          .joinWith(df, "doc_id", tomb, joinType, None, maxBroadcast = 0L)
        assert(bcast.exceptAll(shard).isEmpty &&
            shard.exceptAll(bcast).isEmpty,
          s"seed=$seed $joinType: regimes disagree")
        // and the regimes really differ: the forced-shard plan must not
        // contain a broadcast exchange on the tombstone side
        val plan = shard.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin"),
          s"seed=$seed $joinType: forced shard still broadcast:\n$plan")
      }
    }
  }

  test("threshold picks the regime from the (supplied or counted) cardinality") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("doc_id", "v")
    val tomb = (0L until 40L by 2L).toDF("doc_id")
    // supplied count above the cap forces the shard path even though the
    // true set is tiny — the caller's cardinality is trusted
    val forced = Tombstones.antiJoin(df, "doc_id", tomb,
      tombCount = Some(Tombstones.MaxBroadcast + 1))
    assert(!forced.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // and the default path on a tiny set broadcasts
    val bcast = Tombstones.antiJoin(df, "doc_id", tomb)
    assert(bcast.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(forced.count() === bcast.count())
  }
}
