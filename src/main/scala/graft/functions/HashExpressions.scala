package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch/fingerprint expressions for near-duplicate detection at scale
  * (SURVEY.md §2.12, Tier C).
  *
  * All three are single-pass, fixed-output-size sketches — the property
  * that makes shuffle volume independent of document size at 100 TB:
  *   - MinHash signature → banded LSH (Broder '97 resemblance sketches)
  *   - SimHash → Hamming-bucket LSH (Charikar '02 random hyperplanes)
  *   - polynomial rolling fingerprint → exact content identity mod order
  *
  * Hashing uses xxhash64 (same core as Spark's `xxhash64` builtin) over the
  * token's UTF-8 bytes. MinHash permutations are affine transforms
  * `a_i * h + b_i` with odd multipliers derived from a seed — hashing once
  * per token, O(tokens + k) per row.
  */
object HashExpressions {

  def minhash_signature(tokens: Column, k: Int, seed: Long = 42L): Column =
    bridge.column(MinHashSignatureExpr(bridge.expression(tokens), k, seed))

  def simhash64(tokens: Column, seed: Long = 42L): Column =
    bridge.column(SimHash64Expr(bridge.expression(tokens), seed))

  def fingerprint64(text: Column): Column =
    bridge.column(Fingerprint64Expr(bridge.expression(text)))

  private[functions] def xx64(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}


/** Keeps whole-stage codegen alive around a Scala-implemented expression:
  * emits a call to this expression's `nullSafeEval` through a reference
  * object instead of falling back to interpreted mode for the whole stage
  * (CodegenFallback poisons every sibling expression in the stage).
  */
trait RefObjCodegen { self: UnaryExpression =>
  protected def refObjGenCode(ctx: CodegenContext, ev: ExprCode,
      javaType: String): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", self)
    self.nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = ($javaType) $ref.nullSafeEval($c);")
  }
}

/** array<string> → array<long>: k-permutation MinHash signature. */
case class MinHashSignatureExpr(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData")
  require(k > 0 && k <= 1024, "k in (0, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // affine permutation parameters, fixed by seed at plan time
  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new java.util.SplittableRandom(seed)
    val a = Array.fill(k)(rnd.nextLong() | 1L) // odd multipliers
    val b = Array.fill(k)(rnd.nextLong())
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = HashExpressions.xx64(arr.getUTF8String(i), 0L)
      var j = 0
      while (j < k) {
        val v = as(j) * h + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr =
    copy(child = c)
}

/** array<string> → long: 64-bit SimHash (sign of per-bit vote sums). */
case class SimHash64Expr(child: Expression, seed: Long)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "java.lang.Long")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = HashExpressions.xx64(arr.getUTF8String(i), seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
}

/** string → long: polynomial rolling hash over UTF-8 bytes,
  * base 1000003 mod 2^61-1 (Karp–Rabin style document fingerprint). */
case class Fingerprint64Expr(child: Expression)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "java.lang.Long")

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  private final val Mod = (1L << 61) - 1
  private final val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < s.length) {
      // h = (h * Base + byte) mod 2^61-1, via 128-bit-safe mulmod
      h = Math.floorMod(multiplyMod(h, Base) + (s(i) & 0xff), Mod)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  private def multiplyMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod (2^61-1)
    val loMod = (lo & Mod) + (lo >>> 61 & 0x7L) + (hi << 3 & Mod) + (hi >>> 58)
    Math.floorMod(loMod, Mod)
  }

  override protected def withNewChildInternal(c: Expression): Fingerprint64Expr =
    copy(child = c)
}
