package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training + MaxMatch encoding (Schuster & Nakajima
  * 2012, "Japanese and Korean voice search"; Wu et al. 2016,
  * arXiv:1609.08144 §4.1 — the BERT tokenizer family), completing the
  * production tokenizer triad next to BPE (q90/q91, merge by raw pair
  * count) and unigram-LM (qal/qap, prune under a probabilistic model):
  * WordPiece GROWS a vocabulary like BPE but scores each candidate merge
  * by the LIKELIHOOD gain of a unigram corpus model,
  * score(a,b) = freq(ab) / (freq(a) * freq(b)), and ENCODES with greedy
  * longest-match-first (MaxMatch) against the final vocabulary rather
  * than by replaying merges — the two halves that make it a genuinely
  * distinct family (MaxMatch and merge-replay provably differ; the spec
  * pins a witness case).
  *
  * Determinism contract:
  *   - The likelihood score is exact FIXED-POINT integer arithmetic:
  *     score_fp = (pair_count * 2^40) div (left_freq * right_freq),
  *     computed in DECIMAL(38,0) on Spark and HUGEINT in DuckDB — the
  *     128-bit intermediates give ~10^27 of headroom, so the operator
  *     survives corpus scales where an int64 product would have
  *     overflowed silently (the qab/qad headroom rule, designed out
  *     rather than documented away). Ties: (score DESC, count DESC,
  *     left ASC, right ASC).
  *   - Merges apply through the bracketed-token form '(h)(e)(l)(l)(o)(_)'
  *     shared with q90 — literal replace consumes whole tokens only and
  *     both engines scan left-to-right non-overlapping (see q90's
  *     rationale).
  *   - MaxMatch is a bounded cursor walk: words are capped at
  *     [[MaxWordLen]] chars (spec'd, both engines), each step consumes
  *     >= 1 unit, so [[MaxSteps]] unrolled stages decide every word.
  *     At each cursor position the jump is the longest vocabulary piece
  *     matching there (two distinct pieces of one length cannot both
  *     match, so the argmax is total).
  *
  * Scale shape (the q90/qal argument, shared): the corpus aggregates
  * ONCE into the (word, freq) vocabulary; every merge round runs over
  * the vocab alone — unit counting and pair counting are narrow
  * (token, sum-freq) shuffles, the scoring join touches two vocab-sized
  * frames, and the winner flows back as a broadcast 1-row frame (no
  * driver collect). Encoding collapses to a vocab-sized (word, n_tokens)
  * table broadcast onto the document scan: one explode + broadcast join
  * + per-doc agg — the corpus pass is embarrassingly parallel, which is
  * the train-once / encode-100-TB design.
  */
object WordPiece {

  /** Merge rounds trained (and unrolled in the oracle). */
  val Rounds = 3
  /** Words longer than this are excluded from the trainer's vocabulary
    * (both engines, by spec — bounds the MaxMatch unroll). */
  val MaxWordLen = 10
  /** MaxMatch cursor stages: word + '_' end marker, >= 1 unit/step. */
  val MaxSteps: Int = MaxWordLen + 1
  /** Fixed-point scale for the likelihood score: 2^40. */
  val FpScale = 1099511627776L

  /** (word, wf) vocabulary — the one corpus-sized aggregation. Same
    * tokenizer as q90/qa7 so fertility numbers compare across families,
    * plus the MaxWordLen cap that bounds the encode unroll. */
  private def wordFreqs(d: DataFrame): DataFrame =
    d.select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))

  /** Bracketed unit form of the initial vocabulary: '(h)(i)(_)'. */
  private def initialTokens(w: DataFrame): DataFrame =
    w.select(
      regexp_replace(concat(col("word"), lit("_")), "(.)", "($1)").as("ts"),
      col("wf"))

  /** Token list column from a bracketed ts. */
  private def tokenList(t: DataFrame): DataFrame =
    t.select(col("wf"),
      split(expr("substring(ts, 2, length(ts) - 2)"), "\\)\\(").as("l"))

  /** Unit frequencies of the CURRENT segmentation: token -> sum wf over
    * every occurrence — the score's denominator terms. Vocab-sized. */
  private def unitCounts(t: DataFrame): DataFrame =
    tokenList(t)
      .select(col("wf"), explode(col("l")).as("tok"))
      .groupBy(col("tok")).agg(sum(col("wf")).as("f"))

  /** Adjacent-pair frequencies of the current segmentation (q90's
    * counting, verbatim shape). */
  private def pairCounts(t: DataFrame): DataFrame =
    tokenList(t)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, size(l) - 1), " +
          "i -> struct(element_at(l, i) AS lt, element_at(l, i + 1) AS rt))"))
        .as("p"))
      .groupBy(col("p.lt").as("lt"), col("p.rt").as("rt"))
      .agg(sum(col("wf")).as("c"))

  /** Score every pair against the unit table and keep the argmax:
    * 1-row (lt, rt, c, fl, fr, score). Both joins are vocab-sized. */
  private def best(t: DataFrame): DataFrame = {
    val u = unitCounts(t)
    pairCounts(t)
      .join(broadcast(u.select(col("tok").as("lt"), col("f").as("fl"))),
        Seq("lt"))
      .join(broadcast(u.select(col("tok").as("rt"), col("f").as("fr"))),
        Seq("rt"))
      .withColumn("score", expr(
        s"(CAST(c AS DECIMAL(19,0)) * $FpScale) div " +
          "(CAST(fl AS DECIMAL(19,0)) * CAST(fr AS DECIMAL(19,0)))"))
      .orderBy(col("score").desc, col("c").desc, col("lt"), col("rt"))
      .limit(1)
  }

  private def applyMerge(t: DataFrame, b: DataFrame): DataFrame = t
    .crossJoin(broadcast(
      b.select(col("lt").as("m_lt"), col("rt").as("m_rt"))))
    .select(expr(
      "replace(ts, '(' || m_lt || ')(' || m_rt || ')', " +
        "'(' || m_lt || m_rt || ')')").as("ts"), col("wf"))

  /** [[Rounds]] likelihood-scored merge rounds: per-round 1-row winner
    * frames (lt, rt, c, fl, fr, score), later rounds trained on the
    * earlier rounds' applied segmentations. */
  private[graft] def merges(d: DataFrame): Seq[DataFrame] = {
    var t = IterationCheckpoint.cut(initialTokens(wordFreqs(d)))
    val bs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (_ <- 1 to Rounds) {
      val b = IterationCheckpoint.cut(best(t))
      bs += b
      t = IterationCheckpoint.cut(applyMerge(t, b))
    }
    bs.toSeq
  }

  /** qar: the per-round winners with their full scoring evidence —
    * dumping (pair_count, left_freq, right_freq, score_fp) makes the
    * hash certify the likelihood algebra, not just the chosen pair. */
  def train(d: DataFrame): DataFrame =
    merges(d).zipWithIndex
      .map { case (b, i) => b.select(lit(i + 1).as("rnd"), col("lt"), col("rt"),
        col("c"), col("fl"), col("fr"), col("score")) }
      .reduce(_ unionByName _)
      .select(col("rnd"), col("lt").as("left_tok"), col("rt").as("right_tok"),
        col("c").cast("long").as("pair_count"),
        col("fl").cast("long").as("left_freq"),
        col("fr").cast("long").as("right_freq"),
        col("score").cast("long").as("score_fp"))
      .orderBy(col("rnd"))

  /** The trained pieces pivoted into ONE broadcast-able row
    * (p1, p2, p3) — merged piece strings in training order. */
  private[graft] def pieceFrame(d: DataFrame): DataFrame =
    merges(d).zipWithIndex
      .map { case (b, i) =>
        b.select(concat(col("lt"), col("rt")).as(s"p${i + 1}")) }
      .reduce(_ crossJoin _)

  /** Row-local MaxMatch over a frame carrying (word, wf) and the piece
    * columns: unit string u = word||'_', cursor jumps by the longest
    * matching piece (else one char) for [[MaxSteps]] bounded steps —
    * one aggregate HOF per word, no explode of per-char rows. Returns
    * (word, wf, n_units, n_tokens). */
  private[graft] def maxMatch(withPieces: DataFrame): DataFrame =
    withPieces
      .withColumn("u", concat(col("word"), lit("_")))
      .withColumn("st", expr(
        s"""aggregate(sequence(1, $MaxSteps),
            named_struct('pos', CAST(0 AS INT), 'ntok', CAST(0 AS INT)),
            (a, i) -> IF(a.pos >= length(u), a,
              named_struct(
                'pos', a.pos + greatest(
                  IF(substring(u, a.pos + 1, length(p1)) = p1, length(p1), 1),
                  IF(substring(u, a.pos + 1, length(p2)) = p2, length(p2), 1),
                  IF(substring(u, a.pos + 1, length(p3)) = p3, length(p3), 1)),
                'ntok', a.ntok + 1)))"""))
      .select(col("word"), col("wf"),
        length(col("u")).cast("long").as("n_units"),
        col("st.ntok").cast("long").as("n_tokens"))

  /** qas: MaxMatch corpus encode under the trained vocabulary. The
    * per-word token counts (vocab-sized) broadcast onto the document
    * scan; per-doc accounting mirrors q91/qap so fertility compares
    * across all three families. */
  def encodeCorpus(d: DataFrame): DataFrame = {
    val w = IterationCheckpoint.cut(wordFreqs(d))
    val wp = maxMatch(w.crossJoin(broadcast(pieceFrame(d))))
      .select(col("word"), col("n_units"), col("n_tokens"))
    d.select(col("doc_id"), explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .join(broadcast(wp), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_units")).as("n_units"),
        sum(col("n_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        col("n_units").cast("long").as("n_units"),
        col("n_tokens").cast("long").as("n_tokens"),
        expr("(n_tokens * 1000000) div n_words").as("fertility_ppm"))
      .orderBy(col("doc_id"))
  }

  /** qc4: the trained encode lookup folded to ONE broadcastable row —
    * every trained word's MaxMatch accounting as a word →
    * (n_units, n_tokens) MAP (the qc3/q8p model-row shape). The cursor
    * walk runs ONCE per vocabulary word at training time; arriving
    * documents then encode by pure map lookup, which is the
    * train-once / serve-forever split qas's batch form already rides
    * (its per-word broadcast join, folded row-local). */
  def wpMapFrame(d: DataFrame): DataFrame = {
    val w = IterationCheckpoint.cut(wordFreqs(d))
    maxMatch(w.crossJoin(broadcast(pieceFrame(d))))
      .agg(map_from_entries(collect_list(struct(col("word"),
        struct(col("n_units"), col("n_tokens"))))).as("wp_map"))
  }

  /** The ROW-LOCAL encode against a frame carrying (doc_id, text,
    * wp_map): words outside the trained vocabulary drop out (exactly
    * [[encodeCorpus]]'s inner join — map keys already satisfy the
    * length cap), per-doc accounting is HOFs over the kept words (no
    * explode, no per-token shuffle — stateless append, zero state
    * rows). Documents with no trained word vanish, the inner-join
    * rule. */
  def encodeCols(df: DataFrame): DataFrame =
    df.withColumn("__ws",
        filter(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"),
          w => map_contains_key(col("wp_map"), w)))
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        aggregate(col("__ws"), lit(0L), (a, w) =>
          a + element_at(col("wp_map"), w).getField("n_units"))
          .as("n_units"),
        aggregate(col("__ws"), lit(0L), (a, w) =>
          a + element_at(col("wp_map"), w).getField("n_tokens"))
          .as("n_tokens"))
      .withColumn("fertility_ppm", expr("(n_tokens * 1000000) div n_words"))

  // --------------------------------------------------------------- oracle

  /** Shared training CTE chain: w, t0..t3, and per-round winners
    * b1..b3 (lt, rt, c, fl, fr, score). Generated from the same
    * [[Rounds]] constant as the engine. */
  private def trainCtes: String = trainCtes("TRUE")

  private def trainCtes(trainPred: String): String = {
    def roundCtes(i: Int): String = {
      val t = s"t${i - 1}"
      s"""l$i AS MATERIALIZED (
         |  SELECT string_split(substr(ts, 2, length(ts) - 2), ')(') AS l, wf
         |  FROM $t),
         |u$i AS MATERIALIZED (
         |  SELECT tok, SUM(wf) AS f FROM (
         |    SELECT unnest(l) AS tok, wf FROM l$i) GROUP BY tok),
         |p$i AS MATERIALIZED (
         |  SELECT p.lt, p.rt, SUM(wf) AS c FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(l) - 1),
         |      i -> struct_pack(lt := l[i], rt := l[i + 1]))) AS p, wf
         |    FROM l$i) GROUP BY p.lt, p.rt),
         |b$i AS MATERIALIZED (
         |  SELECT lt, rt, c, fl, fr, score FROM (
         |    SELECT p.lt, p.rt, p.c, ul.f AS fl, ur.f AS fr,
         |      CAST((CAST(p.c AS HUGEINT) * $FpScale)
         |        // (CAST(ul.f AS HUGEINT) * CAST(ur.f AS HUGEINT))
         |        AS BIGINT) AS score
         |    FROM p$i p
         |    JOIN u$i ul ON ul.tok = p.lt
         |    JOIN u$i ur ON ur.tok = p.rt)
         |  ORDER BY score DESC, c DESC, lt, rt LIMIT 1),
         |t$i AS MATERIALIZED (
         |  SELECT replace(ts, '(' || b.lt || ')(' || b.rt || ')',
         |           '(' || b.lt || b.rt || ')') AS ts, wf
         |  FROM t${i - 1}, b$i b)""".stripMargin
    }
    s"""w AS MATERIALIZED (
       |  SELECT word, COUNT(*) AS wf FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |    FROM documents WHERE $trainPred)
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen GROUP BY word),
       |t0 AS MATERIALIZED (
       |  SELECT regexp_replace(word || '_', '(.)', '(\\1)', 'g') AS ts, wf
       |  FROM w),
       |${(1 to Rounds).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  /** qar oracle: the three winners with full scoring evidence. */
  def oracleSql: String =
    s"""WITH $trainCtes
       |SELECT rnd, lt AS left_tok, rt AS right_tok,
       |  CAST(c AS BIGINT) AS pair_count,
       |  CAST(fl AS BIGINT) AS left_freq, CAST(fr AS BIGINT) AS right_freq,
       |  CAST(score AS BIGINT) AS score_fp
       |FROM (${(1 to Rounds)
        .map(i => s"SELECT $i AS rnd, * FROM b$i").mkString(" UNION ALL ")})
       |ORDER BY rnd""".stripMargin

  /** qas oracle: shares the FULL training chain (re-certifying it),
    * pivots the pieces to one row, replays the MaxMatch cursor walk as
    * [[MaxSteps]] unrolled vocab-sized stages, and aggregates per doc
    * exactly like the engine. */
  def encodeOracleSql: String = encodeOracleSqlFor("TRUE", "TRUE")

  /** [[encodeOracleSql]] PARAMETERIZED by a training slice and an
    * encode slice — qc4's streaming twin trains on the historical
    * corpus and encodes only the CDC-arriving documents; at defaults
    * this is qas's whole-corpus oracle (the qc3/qap relationship,
    * WordPiece edition). */
  def encodeOracleSqlFor(trainPred: String, encodePred: String): String = {
    val stages = (1 to MaxSteps).map { k =>
      s"""e$k AS MATERIALIZED (
         |  SELECT word, wf, u, p1, p2, p3,
         |    CASE WHEN pos >= length(u) THEN pos ELSE pos + greatest(
         |      CASE WHEN substr(u, pos + 1, length(p1)) = p1
         |           THEN length(p1) ELSE 1 END,
         |      CASE WHEN substr(u, pos + 1, length(p2)) = p2
         |           THEN length(p2) ELSE 1 END,
         |      CASE WHEN substr(u, pos + 1, length(p3)) = p3
         |           THEN length(p3) ELSE 1 END) END AS pos,
         |    CASE WHEN pos >= length(u) THEN ntok ELSE ntok + 1 END AS ntok
         |  FROM e${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH ${trainCtes(trainPred)},
       |pp AS MATERIALIZED (
       |  SELECT b1.lt || b1.rt AS p1, b2.lt || b2.rt AS p2,
       |         b3.lt || b3.rt AS p3
       |  FROM b1, b2, b3),
       |e0 AS MATERIALIZED (
       |  SELECT word, wf, word || '_' AS u, p1, p2, p3,
       |    0 AS pos, 0 AS ntok FROM w, pp),
       |$stages,
       |wp AS MATERIALIZED (
       |  SELECT word, length(u) AS n_units, ntok AS n_tokens
       |  FROM e$MaxSteps),
       |dw AS (SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |       FROM documents WHERE $encodePred),
       |enc AS (SELECT d.doc_id, COUNT(*) AS n_words,
       |          SUM(wp.n_units) AS n_units, SUM(wp.n_tokens) AS n_tokens
       |        FROM dw d JOIN wp ON wp.word = d.word
       |        WHERE length(d.word) BETWEEN 1 AND $MaxWordLen
       |        GROUP BY d.doc_id)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_units AS BIGINT) AS n_units,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_tokens * 1000000 // n_words AS BIGINT) AS fertility_ppm
       |FROM enc ORDER BY doc_id""".stripMargin
  }
}
