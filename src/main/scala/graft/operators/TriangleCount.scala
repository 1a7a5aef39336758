package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation —
  * the node-iterator scheme of Schank & Wagner (2005) in the MapReduce
  * formulation of Suri & Vassilvitskii (WWW 2011, "Counting Triangles and
  * the Curse of the Last Reducer").
  *
  * Why orientation matters at 100 TB: the naive wedge join (neighbors ×
  * neighbors per node) explodes as Σ deg² — a single celebrity node in a
  * web/link graph generates 10¹²⁺ wedges. Directing every undirected edge
  * {u,v} from the endpoint with the smaller (degree, id) to the larger
  * caps every node's OUT-degree at O(√m) on any graph (a hub's heavy
  * endpoints all out-rank it, so the hub's out-list stays short), which
  * bounds the wedge join's total fan-out at Σ outdeg² ≤ O(m^1.5)
  * regardless of skew — the worst reducer is cured structurally, not by
  * AQE heroics. Both joins are plain equi-joins (shuffle on integer
  * keys); no state, no iteration.
  *
  * Counting discipline: wedges (u → v, u → w) are generated once per
  * unordered {v, w} (the join predicate orders the two out-edges by the
  * same (degree, id) rank), and a wedge closes iff the oriented edge
  * v → w exists — each triangle materializes exactly once, then credits
  * each of its three corners.
  */
object TriangleCount {

  /** Per-node triangle participation counts over an undirected edge list
    * (any orientation / duplication in `edges`; self-loops dropped).
    * Output: (node, n_tri) for nodes in ≥1 triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient: lower (degree, id) endpoint → higher; carry the head's
    // rank so the wedge join can order its two out-edges without a
    // third degree lookup
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("b")).otherwise(col("a")).as("v"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("db")).otherwise(col("da")).as("dv"))
    // wedges u → {v, w} with (dv, v) < (dw, w); closure via the oriented
    // v → w edge (consistent: v out-ranks-below w exactly when the
    // orientation directed their shared edge v → w)
    val e1 = oriented.select(col("u"), col("v"), col("dv"))
    val e2 = oriented.select(col("u").as("u2"), col("v").as("w"), col("dv").as("dw"))
    val wedges = e1.join(e2,
      col("u") === col("u2") &&
        (col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("u"), col("v"), col("w"))
    val closing = oriented.select(col("v").as("cv"), col("u").as("cu"))
    val tri = wedges.join(closing,
      col("v") === col("cu") && col("w") === col("cv"))
      .select(col("u"), col("v"), col("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
