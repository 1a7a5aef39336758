package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling (Manber &
  * Myers 1990; the distributed-memory formulation of Flick & Aluru
  * 2015, SC'15) — the index structure behind exact-substring
  * deduplication at corpus scale (Lee et al. 2021, arXiv:2107.06499 §4
  * builds its dedup on suffix arrays; q6z's rolling-hash spans are the
  * sketch cousin, this is the exact structure).
  *
  * Round k ranks every suffix by its first 2^k characters:
  *   - rank_0(p) = ascii(text[p]) — exact, engine-identical.
  *   - rank_k(p) = dense rank of the pair (rank_{k-1}(p),
  *     rank_{k-1}(p + 2^{k-1})), with 0 for past-the-end — the
  *     standard terminator rule: a shorter suffix orders before any
  *     extension.
  * After [[Rounds]] rounds, equal ranks = identical
  * 2^[[Rounds]]-character prefixes — repeated-substring groups.
  *
  * Scale shape (what makes this the 100 TB formulation):
  *   - Each round is ONE equi self-join on (doc_id, pos + gap) — a
  *     narrow (doc_id, pos, rank) shuffle, never a comparison sort of
  *     suffixes (suffix STRINGS never move; only integer ranks do).
  *   - The dense rank over key pairs is [[StableIds.assign]] on the
  *     DISTINCT key set: range-partition + per-partition counts +
  *     triangular offsets — the scale-safe global numbering, not a
  *     single-task empty-partitioning window (the oracle's
  *     dense_rank() is the semantic spec; StableIds is its
  *     distributed plan).
  *   - O(log L) rounds for suffix order out to length L; each round's
  *     frame is lineage-cut ([[IterationCheckpoint]]).
  *
  * Suffixes are document-local (a suffix never crosses a document —
  * the corpus is a bag of documents, not one tape), which is also what
  * keeps the position space per-doc and the join keys (doc_id, pos). */
object SuffixRanks {

  /** Doubling rounds: final ranks order suffixes by their first
    * 2^[[Rounds]] = 16 characters (q6z's minimum span length). */
  val Rounds = 4
  /** Range partitions for the StableIds dense-rank phase. */
  val Partitions = 32
  /** Detail rows are dumped for documents with doc_id % [[SampleMod]]
    * == 0 — the GROUP SIZES on those rows still count every corpus
    * position sharing the rank, so global structure is certified
    * through the sample. */
  val SampleMod = 25

  /** (doc_id, pos, r): 1-based position, rank_0 = ascii. One linear
    * posexplode — the only corpus-sized expansion. */
  def positions(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("p0", "ch")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        ascii(col("ch")).cast("long").as("r"))

  /** All rounds' rank frames WITH inline group sizes — (doc_id, pos,
    * r, grp), index k = rank_k (k = 1..[[Rounds]]) — built with
    * SETTLED-GROUP PRUNING, the classic prefix-doubling optimization:
    * a position whose rank group is a singleton can never split again
    * (its relative order is final), so it leaves the corpus-sized
    * doubling machinery — the gap-shift join, the key aggregate, the
    * wide map-back join — and rides a NARROW per-round rank
    * translation instead.
    *
    * Identical output by construction, not by luck:
    *   - a settled position's r1 is GLOBALLY unique (group size 1
    *     counts every corpus position sharing the rank), so its pair
    *     key's dense rank is independent of its r2 — the synthetic key
    *     (r1, 0) occupies exactly the position (r1, r2_true) would
    *     have, and settled vs active r1 sets are disjoint (active
    *     ranks are shared by ≥2 positions), so no collision exists;
    *   - settled rows still carry CURRENT ranks each round (the
    *     translation join) because dense ranks inflate as other groups
    *     split, and they still serve as r2 providers to active
    *     positions through the full-frame shift;
    *   - group sizes come free: the old `distinct()` over keys becomes
    *     a `groupBy().count()` — the SAME shuffle — and grp == 1 is
    *     settledness for the next round.
    *
    * Per-round cost shape: the shift source stays corpus-sized (it
    * must — settled positions provide r2 to active ones), but the
    * keyed join, the key aggregate, StableIds' range sort and the wide
    * map-back all shrink to the ACTIVE set. The shrink is
    * corpus-dependent — mostly-unique text collapses by round 1–2,
    * boilerplate-heavy corpora barely collapse at all — so pruning is
    * ADAPTIVE ([[PruneMinSettledFraction]]): below the bar each round
    * carries everything active and the settled machinery folds away to
    * the pre-round-15 plan (plus the inline group sizes, which delete
    * the audit's per-round groupBy+join either way).
    * `SuffixRanksPropSpec` pins pruned ≡ unpruned per round and
    * measures the active-set shrink on a mostly-unique corpus;
    * `tools/SuffixPruneProbe` is the same-box A/B. */
  /** Pruning engages only once at least this fraction of positions has
    * settled: the settled-side machinery (translation join, synthetic
    * keys, the split) is pure overhead on a corpus whose rank groups
    * barely collapse (the driver's boilerplate-heavy documents table:
    * 72% of positions still share a 16-char window, measured by
    * `tools/SuffixPruneProbe`), while a mostly-unique corpus crosses
    * the bar by round 1–2 and rides the shrink. The decision costs one
    * count per round on the already-materialized round frame. */
  val PruneMinSettledFraction = 0.15

  def roundsWithGroups(d: DataFrame): Seq[DataFrame] =
    roundsWithGroups(d, d.sparkSession.conf
      .getOption(IterationCheckpoint.ConfKey).exists(_.nonEmpty))

  /** [[roundsWithGroups]] with the pruning-decision read made explicit
    * (`dictDecision` defaults to the checkpoint regime in the public
    * method; the parameter exists so the spec can pin both decision
    * paths frame-identical without touching the JVM-global checkpoint
    * directory). */
  private[graft] def roundsWithGroups(d: DataFrame,
      dictDecision: Boolean): Seq[DataFrame] = {
    var active = IterationCheckpoint.cut(positions(d))
    var settled = active.filter(lit(false))
    val total = active.count().toDouble
    (1 to Rounds).map { k =>
      val gap = 1 << (k - 1)
      val full = active.unionByName(settled)
      val shifted = full.select(col("doc_id"),
        (col("pos") - gap).as("pos"), col("r").as("r2"))
      // materialized once per round: the corpus-sized gap-shift join
      // feeds BOTH the key aggregate (inside StableIds' eager cut) and
      // the wide map-back join below — uncut, the join executed twice
      // per round (JobProfile on qau: ~0.7 s planning+compute gaps, 2
      // per round); one cut halves the round's corpus-sized work
      val keyedA = IterationCheckpoint.cut(
        active.join(shifted, Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"), col("r").as("r1"),
            coalesce(col("r2"), lit(0L)).as("r2")))
      val keyCnt = keyedA.groupBy(col("r1"), col("r2"))
        .agg(count(lit(1)).as("grp"))
      val keysS = settled.select(col("r").as("r1"), lit(0L).as("r2"),
        lit(1L).as("grp"))
      val allKeys = StableIds.assign(keyCnt.unionByName(keysS),
        Seq(col("r1"), col("r2")), Partitions, "nr")
      val aNew = keyedA.join(allKeys, Seq("r1", "r2"))
        .select(col("doc_id"), col("pos"), col("nr").as("r"), col("grp"))
      val sNew = settled
        .select(col("doc_id"), col("pos"), col("r").as("r1"),
          lit(0L).as("r2"))
        .join(allKeys, Seq("r1", "r2"))
        .select(col("doc_id"), col("pos"), col("nr").as("r"), col("grp"))
      val merged = IterationCheckpoint.cut(aNew.unionByName(sNew))
      // The pruning decision needs |positions in groups > 1|. Two
      // provably-equal reads (SuffixRanksPropSpec pins them equal on
      // random two-regime corpora): a corpus-frame count, or Σ grp
      // over the dict-sized allKeys (every allKeys row matches exactly
      // grp merged positions — keyCnt keys by construction, keysS
      // exactly its one settled position, per the disjointness
      // invariant above). Which is cheaper depends on the CHECKPOINT
      // REGIME: with executor-local blocks (localCheckpoint — the
      // local/bench default) the corpus count is one job over memory
      // blocks and the dict sum costs MORE (3 micro-jobs re-running
      // the StableIds tail: measured 14.8 vs 16.4 s on qau at sf0.1 —
      // the dict-always variant was tried and reverted); with a
      // DURABLE checkpoint dir (the 100 TB cluster conf) the corpus
      // count re-reads the whole round frame from remote storage per
      // round, and the dict sum reads only the key dictionary.
      val nActive =
        if (dictDecision)
          allKeys.filter(col("grp") > 1)
            .agg(coalesce(sum(col("grp")), lit(0L))).head.getLong(0)
        else merged.filter(col("grp") > 1).count()
      if (total - nActive >= total * PruneMinSettledFraction) {
        active = merged.filter(col("grp") > 1)
          .select(col("doc_id"), col("pos"), col("r"))
        settled = merged.filter(col("grp") === 1)
          .select(col("doc_id"), col("pos"), col("r"))
      } else {
        // below the bar: carry everything active (a settled position is
        // harmless there — its key is unique, so it just re-derives the
        // same rank through the general machinery) and keep the settled
        // frame STATICALLY empty so its joins fold away
        active = merged.select(col("doc_id"), col("pos"), col("r"))
        settled = merged.filter(lit(false))
          .select(col("doc_id"), col("pos"), col("r"))
      }
      merged
    }
  }

  /** All rounds' rank frames: index k = rank_k (k = 1..[[Rounds]]). */
  def rounds(d: DataFrame): Seq[DataFrame] =
    roundsWithGroups(d).map(_.select(col("doc_id"), col("pos"), col("r")))

  /** qau: per-round position detail for the sampled documents —
    * (rnd, doc_id, pos, rank, grp) where grp counts EVERY corpus
    * position sharing the rank. Group sizes ride inline from
    * [[roundsWithGroups]] (they fall out of the key aggregate the
    * doubling pays anyway — the pre-round-15 per-round
    * groupBy(rank)+join is gone). A drift in any round's global
    * dense-rank assignment moves the sampled rows' ranks or group
    * sizes. */
  def audit(d: DataFrame): DataFrame = {
    roundsWithGroups(d).zipWithIndex.map { case (ranks, i) =>
      ranks.filter(col("doc_id") % SampleMod === 0)
        .select(lit(i + 1).as("rnd"), col("doc_id"), col("pos"),
          col("r").as("rank"), col("grp"))
    }.reduce(_ unionByName _)
      .orderBy(col("rnd"), col("doc_id"), col("pos"))
  }

  // ------------------------------------------------- incremental (q8x)

  /** Suffix-key width: rank_[[Rounds]] orders by exactly this many
    * characters. */
  val KeyLen: Int = 1 << Rounds

  /** (doc_id, pos, key): each suffix's first-[[KeyLen]]-char prefix —
    * the ROW-LOCAL delta form of the structure. For an ASCII corpus,
    * rank_[[Rounds]] is exactly the dense rank of this string
    * (induction over the doubling: "past-the-end = 0, lowest" IS
    * "shorter prefix sorts before any extension", which IS
    * lexicographic string order), so a NEW document contributes keys
    * from its own text alone — no old position is ever recomputed.
    * That equivalence is what q8x's oracle certifies: the streaming
    * key-merge must land bit-exactly on the doubling rounds' output. */
  def suffixKeys(d: DataFrame): DataFrame =
    // empty-doc guard: Spark's sequence(1, 0) DESCENDS to [1, 0] (two
    // spurious rows) where the oracle's generate_series(1, 0) is empty
    d.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        expr(s"substring(text, p, $KeyLen)").as("key"))

  /** Dense-rank a distinct key set — [[StableIds.assign]], the same
    * scale-safe global numbering the doubling rounds use. Renumbering
    * is O(|distinct keys|) rows, never O(corpus positions): the merge
    * pays for the dictionary, not the corpus. */
  def rankDict(keys: DataFrame): DataFrame =
    StableIds.assign(keys.select(col("key")).distinct(),
      Seq(col("key")), Partitions, "r")

  /** The q8x/qb8/qc5 serve-tail audit measure — sampled (doc_id, pos,
    * rank, grp) rows with GLOBAL group sizes — computed without ever
    * joining the full corpus-sized position frame to the dictionary:
    * `counts` carries |live positions| per key (q8x derives it with one
    * partial-aggregated pass; qb8/qc5 maintain it as index state), and
    * dict's key↔r is a bijection (dense rank over distinct keys), so a
    * rank's global group size IS its key's count. The corpus-sized
    * frame is therefore touched only by the 1/[[SampleMod]] sample
    * filter + two dict-sized joins, replacing the previous full-corpus
    * pos⋈dict join that ran TWICE (once under groupBy(r) for group
    * sizes, once for the sample rows) — guide §2.3 "shuffle keys and
    * metadata instead of payloads" / §8.4 "decide with small rows".
    * `SuffixServeTailSpec` pins this frame-identical to the join-then-
    * groupBy(r) shape, staged and compacted structures both. */
  def auditServe(pos: DataFrame, dict: DataFrame,
      counts: DataFrame): DataFrame =
    pos.filter(col("doc_id") % SampleMod === 0)
      .join(dict, Seq("key"))
      .join(counts.select(col("key"), col("n").as("grp")), Seq("key"))
      .select(col("doc_id"), col("pos"), col("r").as("rank"), col("grp"))
      .orderBy(col("doc_id"), col("pos"))

  // ------------------------------------------------ delete-compact (qb8)

  /** qb8: fold tombstoned documents OUT of the persisted suffix
    * structure (`pos` row-local keys, `counts` per-key position counts,
    * `dict` dense ranks) — the verb that completes the family's
    * lifecycle (build qau, streaming merge q8x, delete-compact here).
    * Deletes are where the dictionary's ranks go STALE in a way the
    * q8x merge never faces: ingest only ADDS keys (existing ranks keep
    * their relative order under the StableIds renumber), but a delete
    * can make a key VANISH from the corpus, and every dense rank above
    * it must shift down. The compaction (1) drops the tombstoned docs'
    * position rows (a row-local anti join — text is never re-read, no
    * key is recomputed), (2) debits the per-key counts by the
    * tombstoned docs' own position rows and drops keys that reach
    * zero, and (3) renumbers the SURVIVING key dictionary — O(|dict|)
    * renumber work, never O(corpus positions), the same asymmetry q8x
    * rides on the insert side. `SuffixCompactionPropSpec` proves the
    * result frame-for-frame equal to staging the structure from
    * scratch over the live corpus, including the rank-shift case. */
  /** Broadcast ceiling for the tombstone id set, re-exported from
    * [[Tombstones.MaxBroadcast]] for existing callers: up to 4M ids the
    * anti/semi joins broadcast; past it they degrade to shuffle-hash
    * joins sharded by id (round 14 refused here instead — the degrade
    * path replaced the refusal). */
  val MaxBroadcastTombstones: Long = Tombstones.MaxBroadcast

  def compactDelete(s: org.apache.spark.sql.SparkSession,
      tombs: DataFrame, oldPath: String, newPath: String): Unit = {
    val tombIds = tombs.select(col(tombs.columns.head).as("doc_id"))
    // one count decides the regime for BOTH joins below (broadcast vs
    // shuffle-hash past MaxBroadcastTombstones — the degrade path that
    // replaced round-14's refusal)
    val nTomb = Some(tombIds.count())
    // ONE scan of the corpus-sized position frame: materialize it once
    // (IterationCheckpoint blocks — durable-checkpoint switchable, the
    // iterative-operator trade), then both consumers (the survivor
    // write and the dead-key count debit) read the same blocks instead
    // of re-scanning the parquet per consumer.
    val pos = IterationCheckpoint.cut(s.read.parquet(s"$oldPath/pos"))
    // the two consumers of the cut blocks — the survivor write and the
    // count-debit → dict renumber chain — are independent job chains;
    // overlap them so each back-fills the other's scheduling gaps
    // (guide §2.6, the DriverPar idiom)
    DriverPar.map(Seq(
      () => Tombstones.antiJoin(pos, "doc_id", tombIds, nTomb)
        .write.mode("overwrite").parquet(s"$newPath/pos"),
      () => {
        val deadCounts = Tombstones.semiJoin(pos, "doc_id", tombIds, nTomb)
          .groupBy(col("key")).agg(count(lit(1)).as("dn"))
        s.read.parquet(s"$oldPath/counts")
          .join(deadCounts, Seq("key"), "left")
          .select(col("key"),
            (col("n") - coalesce(col("dn"), lit(0L))).as("n"))
          .filter(col("n") > 0) // a key no live position carries vanishes
          .write.mode("overwrite").parquet(s"$newPath/counts")
        rankDict(s.read.parquet(s"$newPath/counts"))
          .write.mode("overwrite").parquet(s"$newPath/dict")
      }))(_())
    ()
  }

  // --------------------------------------------------------------- oracle

  /** r0..r[[Rounds]] CTE text, shared by qau's per-round audit oracle,
    * q8x's streaming-merge oracle and qb8's delete-compaction oracle
    * (the shared-oracle equivalence idiom: one spec, three execution
    * paths). `corpus` parameterizes the r0 scan — qb8 replays the
    * rounds over the LIVE corpus only. */
  def roundCtesSql(corpus: String = "documents"): String = {
    val rounds = (1 to Rounds).map { k =>
      val gap = 1 << (k - 1)
      val prev = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT a.doc_id, a.pos,
         |    dense_rank() OVER (ORDER BY a.r, COALESCE(b.r, 0))
         |      AS r
         |  FROM $prev a LEFT JOIN $prev b
         |    ON b.doc_id = a.doc_id AND b.pos = a.pos + $gap)""".stripMargin
    }.mkString(",\n")
    val r0 =
      """r0 AS MATERIALIZED (
        |  SELECT doc_id, i AS pos,
        |    CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS r
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text))) AS i
        |        FROM CORPUS))""".stripMargin.replace("CORPUS", corpus)
    r0 + ",\n" + rounds
  }

  /** The same rounds as DuckDB SQL — dense_rank() IS the semantic spec
    * the StableIds plan implements; the unroll depth comes from the
    * same [[Rounds]] constant. */
  def oracleSql: String = {
    val details = (1 to Rounds).map { k =>
      s"""SELECT $k AS rnd, doc_id, pos, r AS rank,
         |  COUNT(*) OVER (PARTITION BY r) AS grp
         |FROM r$k""".stripMargin
    }.map(s => s"SELECT * FROM ($s) WHERE doc_id % $SampleMod = 0")
      .mkString(" UNION ALL ")
    // shared CTE text concatenated OUTSIDE the stripMargin literal
    "WITH " + roundCtesSql() + "\n" +
      s"""SELECT CAST(rnd AS INT) AS rnd, doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(rank AS BIGINT) AS rank, CAST(grp AS BIGINT) AS grp
         |FROM ($details)
         |ORDER BY rnd, doc_id, pos""".stripMargin
  }

  /** q8x oracle: the FINAL round only, over the full corpus — the spec
    * the streaming key-merge must converge to after draining every
    * batch (rank_[[Rounds]] ≡ dense rank of the [[KeyLen]]-char suffix
    * key; see [[suffixKeys]]). */
  def mergeOracleSql: String =
    "WITH " + roundCtesSql() + "\n" +
      s"""SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(rank AS BIGINT) AS rank, CAST(grp AS BIGINT) AS grp
         |FROM (SELECT doc_id, pos, r AS rank,
         |        COUNT(*) OVER (PARTITION BY r) AS grp
         |      FROM r$Rounds)
         |WHERE doc_id % $SampleMod = 0
         |ORDER BY doc_id, pos""".stripMargin

  /** qb8 oracle: q8x's final-round measure replayed over the LIVE
    * corpus only — the doubling rounds, the dense rank and the global
    * group sizes all recomputed as if the tombstoned documents had
    * never existed. Hash equality certifies the compaction's dictionary
    * renumber landed exactly on the rebuilt dense ranks (rank SHIFTS
    * from vanished keys included — the case ingest-only maintenance
    * never exercises). */
  def compactionOracleSql(livePred: String): String =
    "WITH " +
      roundCtesSql(s"(SELECT * FROM documents WHERE $livePred)") + "\n" +
      s"""SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(rank AS BIGINT) AS rank, CAST(grp AS BIGINT) AS grp
         |FROM (SELECT doc_id, pos, r AS rank,
         |        COUNT(*) OVER (PARTITION BY r) AS grp
         |      FROM r$Rounds)
         |WHERE doc_id % $SampleMod = 0
         |ORDER BY doc_id, pos""".stripMargin
}
