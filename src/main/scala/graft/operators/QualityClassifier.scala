package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering, trained IN the engine — the
  * classifier-selection step of production LLM corpora (GPT-3's
  * Wikipedia-reference classifier, arXiv:2005.14165 Appendix A; reused
  * by LLaMA): fit a linear scorer that separates a curated reference
  * slice from the general crawl, then score every document with it.
  * Here the reference slice is the 'src0' source — the same target
  * convention qa1's DSIR importance weights use, so the two selection
  * families are directly comparable.
  *
  * Deterministic, cross-engine-replayable form — full-batch gradient
  * descent on the linear probability model (squared loss), in exact
  * fixed-point integer arithmetic:
  *   - Features (all exact integer algebra): x0 = 1 (bias),
  *     x1 = min(n_tokens, 100), x2 = 100·distinct/total tokens
  *     (type-token ratio), x3 = 10·mean token length.
  *   - Label y = [source = 'src0'], scaled by [[Scale]] = 2^20.
  *   - Round: grad_j = Σ (w·x − y·S)·x_j over the corpus;
  *     w_j ← w_j − grad_j div (N·[[StepDiv]]). StepDiv = 20000 clears
  *     the GD stability bound (λ_max(E[xxᵀ]) ≈ Σ E[x_j²] ≈ 1.9·10^4
  *     for these bounded features), so the quantized mean squared
  *     loss decreases monotonically — which the per-round loss_fp
  *     column exhibits and the oracle certifies.
  *   - Integer div truncates toward zero on BOTH engines (Spark `div`,
  *     DuckDB `//`) — verified, signed gradients included.
  *   - Sums ride DECIMAL(38,0)/HUGEINT so no corpus scale silently
  *     overflows an int64 accumulation (the qar headroom rule).
  *
  * Scale shape — the canonical distributed-GD pattern: features are
  * computed once (one corpus pass, lineage-cut; at 100 TB this frame
  * persists); each round is ONE narrow aggregation producing 4 gradient
  * sums (map-side partial aggregation does the heavy lifting) with the
  * 1-row weight frame broadcast back — no driver collect, no
  * per-round corpus shuffle. Reporting adds one more aggregation per
  * round under the updated weights (per-class margin sums + loss),
  * which is the corpus-scoring pass itself, certified per round. */
object QualityClassifier {

  /** Fixed-point scale for labels/weights: 2^20. */
  val Scale = 1048576L
  /** GD rounds unrolled on both engines. */
  val Rounds = 3
  /** Step divisor: w -= grad div (N·StepDiv); clears the stability
    * bound for the bounded feature ranges (see scaladoc). */
  val StepDiv = 20000L

  /** (doc_id, x0..x3, y) — one corpus pass, row-local HOFs only. */
  def features(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("source"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("doc_id"),
        lit(1L).as("x0"),
        least(size(col("ws")), lit(100)).cast("long").as("x1"),
        expr("(size(array_distinct(ws)) * 100) div size(ws)").as("x2"),
        expr("(aggregate(ws, 0L, (a, w) -> a + length(w)) * 10) div size(ws)")
          .as("x3"),
        when(col("source") === "src0", 1L).otherwise(0L).as("y"))

  /** qav: per-round training evidence — the updated weights, the
    * quantized mean squared loss under them, and per-class margin sums
    * (the corpus-scoring aggregates). */
  def train(d: DataFrame): DataFrame =
    fit(d)._1.reduce(_ unionByName _).orderBy(col("rnd"))

  /** The trained model as ONE broadcastable row (w0..w3) — the frame a
    * serve site (q8u's stream scoring) joins onto its document scan. */
  def weightsFrame(d: DataFrame): DataFrame = fit(d)._2

  /** Row-local scoring of a frame carrying (doc_id, text) AND the
    * [[weightsFrame]] columns: features are per-row HOFs, the margin is
    * pure column algebra — zero shuffle, which is what lets the same
    * columns serve inside a stateless streaming micro-batch plan. Docs
    * with zero tokens are dropped, like training. */
  def scoreCols(withW: DataFrame): DataFrame =
    withW
      .withColumn("ws", expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
      .filter(size(col("ws")) >= 1)
      .withColumn("x1", least(size(col("ws")), lit(100)).cast("long"))
      .withColumn("x2", expr("(size(array_distinct(ws)) * 100) div size(ws)"))
      .withColumn("x3",
        expr("(aggregate(ws, 0L, (a, w) -> a + length(w)) * 10) div size(ws)"))
      .select(col("doc_id"),
        expr("w0 + w1*x1 + w2*x2 + w3*x3").as("margin_fp"),
        when(expr(s"2 * (w0 + w1*x1 + w2*x2 + w3*x3) >= $Scale"), 1)
          .otherwise(0).cast("int").as("selected"))

  private def fit(d: DataFrame): (Seq[DataFrame], DataFrame) = {
    val f = IterationCheckpoint.cut(features(d))
    val n = f.agg(count(lit(1)).as("n"))
    val s = d.sparkSession
    import s.implicits._
    var w = Seq((0L, 0L, 0L, 0L)).toDF("w0", "w1", "w2", "w3")
    val reports = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (rnd <- 1 to Rounds) {
      val resid = f.crossJoin(broadcast(w))
        .withColumn("r",
          expr(s"w0*x0 + w1*x1 + w2*x2 + w3*x3 - y * $Scale"))
      val g = resid.agg(
        expr("sum(CAST(r AS DECIMAL(38,0)) * x0)").as("g0"),
        expr("sum(CAST(r AS DECIMAL(38,0)) * x1)").as("g1"),
        expr("sum(CAST(r AS DECIMAL(38,0)) * x2)").as("g2"),
        expr("sum(CAST(r AS DECIMAL(38,0)) * x3)").as("g3"))
      w = IterationCheckpoint.cut(
        w.crossJoin(g).crossJoin(broadcast(n))
          .select(
            expr(s"w0 - g0 div (n * $StepDiv)").as("w0"),
            expr(s"w1 - g1 div (n * $StepDiv)").as("w1"),
            expr(s"w2 - g2 div (n * $StepDiv)").as("w2"),
            expr(s"w3 - g3 div (n * $StepDiv)").as("w3")))
      val scored = f.crossJoin(broadcast(w))
        .withColumn("m", expr("w0*x0 + w1*x1 + w2*x2 + w3*x3"))
        .withColumn("r", expr(s"m - y * $Scale"))
      val rep = scored.agg(
          expr("sum(CAST(r AS DECIMAL(38,0)) * r)").as("sl"),
          expr("sum(CASE WHEN y = 1 THEN CAST(m AS DECIMAL(38,0)) END)")
            .as("mp"),
          expr("sum(CASE WHEN y = 0 THEN CAST(m AS DECIMAL(38,0)) END)")
            .as("mn"))
        .crossJoin(broadcast(n)).crossJoin(w)
        .select(lit(rnd).as("rnd"),
          col("w0").cast("long").as("w_bias"),
          col("w1").cast("long").as("w_len"),
          col("w2").cast("long").as("w_ttr"),
          col("w3").cast("long").as("w_awl"),
          expr("sl div n").as("loss_fp"),
          col("mp").cast("long").as("msum_pos"),
          col("mn").cast("long").as("msum_neg"))
      reports += rep
    }
    (reports.toSeq, w)
  }

  // --------------------------------------------------------------- oracle

  /** The same unrolled GD as DuckDB SQL, HUGEINT accumulations. */
  def oracleSql: String = oracleSqlFor("TRUE")

  /** q8u oracle: train on the historical slice (the FULL unrolled GD
    * chain — re-certified), batch-score the streamed slice with the
    * final weights; drained rows must be indistinguishable. */
  def serveOracleSql(trainPred: String, servePred: String): String =
    s"""WITH ${oracleCtes(trainPred)},
       |sv AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |       FROM documents WHERE $servePred),
       |sx AS (SELECT doc_id,
       |         CAST(least(len(ws), 100) AS BIGINT) AS x1,
       |         CAST(len(list_distinct(ws)) * 100 // len(ws) AS BIGINT) AS x2,
       |         CAST(list_sum(list_transform(ws, w -> length(w))) * 10
       |           // len(ws) AS BIGINT) AS x3
       |       FROM sv WHERE len(ws) >= 1)
       |SELECT doc_id,
       |  CAST(w0 + w1*x1 + w2*x2 + w3*x3 AS BIGINT) AS margin_fp,
       |  CAST(CASE WHEN 2 * (w0 + w1*x1 + w2*x2 + w3*x3) >= $Scale
       |       THEN 1 ELSE 0 END AS INT) AS selected
       |FROM sx, w${Rounds}r ORDER BY doc_id""".stripMargin

  private def oracleSqlFor(trainPred: String): String =
    s"""WITH ${oracleCtes(trainPred)}
       |SELECT rnd, w_bias, w_len, w_ttr, w_awl, loss_fp, msum_pos, msum_neg
       |FROM (${(1 to Rounds).map(i => s"SELECT * FROM rep$i")
        .mkString(" UNION ALL ")})
       |ORDER BY rnd""".stripMargin

  /** Training CTE chain (f, nn, w0r, per-round g/w/rep) over documents
    * matching `trainPred`. */
  private def oracleCtes(trainPred: String): String = {
    val rounds = (1 to Rounds).map { i =>
      val pw = s"w${i - 1}r"
      s"""g$i AS MATERIALIZED (
         |  SELECT sum(CAST(r AS HUGEINT) * x0) AS g0,
         |         sum(CAST(r AS HUGEINT) * x1) AS g1,
         |         sum(CAST(r AS HUGEINT) * x2) AS g2,
         |         sum(CAST(r AS HUGEINT) * x3) AS g3
         |  FROM (SELECT w0*x0 + w1*x1 + w2*x2 + w3*x3 - y * $Scale AS r,
         |               x0, x1, x2, x3
         |        FROM f, $pw)),
         |w${i}r AS MATERIALIZED (
         |  SELECT CAST(w0 - g0 // (n * $StepDiv) AS BIGINT) AS w0,
         |         CAST(w1 - g1 // (n * $StepDiv) AS BIGINT) AS w1,
         |         CAST(w2 - g2 // (n * $StepDiv) AS BIGINT) AS w2,
         |         CAST(w3 - g3 // (n * $StepDiv) AS BIGINT) AS w3
         |  FROM $pw, g$i, nn),
         |rep$i AS MATERIALIZED (
         |  SELECT $i AS rnd, w0 AS w_bias, w1 AS w_len, w2 AS w_ttr,
         |    w3 AS w_awl,
         |    CAST(sum(CAST(r AS HUGEINT) * r) // n AS BIGINT) AS loss_fp,
         |    CAST(sum(CASE WHEN y = 1 THEN CAST(m AS HUGEINT) END)
         |      AS BIGINT) AS msum_pos,
         |    CAST(sum(CASE WHEN y = 0 THEN CAST(m AS HUGEINT) END)
         |      AS BIGINT) AS msum_neg
         |  FROM (SELECT w0, w1, w2, w3, y, n,
         |          w0*x0 + w1*x1 + w2*x2 + w3*x3 AS m,
         |          w0*x0 + w1*x1 + w2*x2 + w3*x3 - y * $Scale AS r
         |        FROM f, w${i}r, nn)
         |  GROUP BY w0, w1, w2, w3, n)""".stripMargin
    }.mkString(",\n")
    s"""f AS MATERIALIZED (
       |  SELECT doc_id, CAST(1 AS BIGINT) AS x0,
       |    CAST(least(len(ws), 100) AS BIGINT) AS x1,
       |    CAST(len(list_distinct(ws)) * 100 // len(ws) AS BIGINT) AS x2,
       |    CAST(list_sum(list_transform(ws, w -> length(w))) * 10
       |      // len(ws) AS BIGINT) AS x3,
       |    CAST(CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM (SELECT doc_id, source,
       |          regexp_extract_all(lower(text), '[a-z]+') AS ws
       |        FROM documents WHERE $trainPred)
       |  WHERE len(ws) >= 1),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM f),
       |w0r AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |        CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
       |$rounds""".stripMargin
  }
}
