package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Embedding-vector primitives for similarity search / near-dup detection
  * (SURVEY.md §2.12; north-star Tier C — the reference moves only scalar
  * and one-level-array columns, §1.3, so these are engine extensions).
  *
  * Implemented as native Catalyst expressions WITH codegen (`doGenCode`
  * emits the tight float loop) because they sit in the hot inner loop of
  * brute-force / rerank scoring: no UDF boxing, no per-row closure, stays
  * inside whole-stage codegen. Accumulation is sequential in index order
  * using doubles — bit-identical to the DuckDB oracle's
  * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`, which makes exact
  * hash-compare possible for similarity outputs.
  */
object VectorFunctions {

  /** Cosine similarity of two array<float> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    bridge.column(CosineSimilarityExpr(bridge.expression(a), bridge.expression(b)))

  /** Dot product of two array<float> columns. */
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProductExpr(bridge.expression(a), bridge.expression(b)))
}

sealed trait FloatVectorBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** scala implementation (interpreted path) */
  protected def compute(a: ArrayData, b: ArrayData): Double
  /** java source for the codegen'd path; receives array variable names and
    * must assign the result to `resultVar`. */
  protected def javaLoop(a: String, b: String, resultVar: String): String

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => javaLoop(a, b, ev.value.toString))
}

/** dot/(|a||b|), accumulated in index order as doubles (oracle-exact). */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends FloatVectorBinaryOp {
  override def prettyName: String = "cosine_sim"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def javaLoop(a: String, b: String, res: String): String =
    s"""
       |int n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = (double) $a.getFloat(i);
       |  double y = (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$res = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
     """.stripMargin

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends FloatVectorBinaryOp {
  override def prettyName: String = "dot_product"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def javaLoop(a: String, b: String, res: String): String =
    s"""
       |int n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double dot = 0.0;
       |for (int i = 0; i < n; i++) {
       |  dot += (double) $a.getFloat(i) * (double) $b.getFloat(i);
       |}
       |$res = dot;
     """.stripMargin

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
