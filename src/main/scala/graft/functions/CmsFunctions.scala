package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch probe as a native expression — the read side Spark
  * doesn't expose: `count_min_sketch(...)` (SQL) BUILDS the sketch as a
  * distributed `TypedImperativeAggregate` (partial merge — one serialized
  * sketch per partition crosses the exchange, never the items), but Spark
  * only reads it back driver-side (`DataFrameStatFunctions`). This probe
  * keeps the estimate IN-PLAN: carry the sketch as a scalar subquery (the
  * [[BloomFunctions]] pattern) and estimate per row.
  *
  * Completes the engine's sketch family: HLL (q07) for distinct counts,
  * GK quantiles (q0c), Bloom (q6g) for membership, MinHash/SimHash
  * (q62/q63) for similarity, CMS (q0d) for frequency.
  */
object CmsFunctions {

  /** Estimated frequency of `item` per the serialized CMS `sketch`.
    * CMS guarantees estimate ≥ true count (no undercount, ever) and
    * estimate ≤ true + eps·N with probability ≥ confidence. */
  def cms_estimate(sketch: Column, item: Column): Column =
    bridge.column(CmsEstimateExpr(
      bridge.expression(sketch), bridge.expression(item)))
}

/** (sketchBytes, item) → estimated count. Interpreted-only
  * (CodegenFallback): the probe runs AFTER aggregation on group-count-
  * sized data, never in a scan loop. The sketch child is a scalar
  * subquery — the same byte array instance for every row in a task — so
  * deserialization is cached per expression instance behind a reference-
  * equality fast path (full byte compare as the safety net). Items probe
  * with the same representation `CountMinSketchAgg.update` inserts
  * (UTF8String bytes for strings, longs for integral types), so build
  * and probe hash identically. */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cached: CountMinSketch = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes eq cachedBytes) &&
        !java.util.Arrays.equals(bytes, cachedBytes)) {
      cached = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    cached
  }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val cms = sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
    val probe: Any = right.dataType match {
      case StringType => item.asInstanceOf[UTF8String].getBytes
      case BinaryType => item
      case _ => item // integral types: CountMinSketch hashes the long
    }
    cms.estimateCount(probe)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimateExpr = copy(left = l, right = r)
}
