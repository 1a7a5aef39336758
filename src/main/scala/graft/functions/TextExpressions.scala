package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text shingling as a native expression (SURVEY.md §2.12 Tier C).
  *
  * Semantics match the declarative form
  * `array_distinct(transform(sequence(1, size(toks)-n+1), i -> concat_ws(' ',
  * toks[i..i+n-1])))` — and its DuckDB mirror `list_distinct(list_transform(
  * generate_series(...)))` — but run as one compiled loop per row. The
  * higher-order-function form pays per-element interpreted lambda dispatch
  * (HOFs are CodegenFallback in Spark) which measured ~30× slower on the
  * dedup pipeline; shingling sits under every near-dup operator, so it gets
  * the native treatment.
  *
  * Also fixes a latent edge of the declarative form: for texts with fewer
  * than n words, `sequence(1, size-n+1)` would produce a DESCENDING sequence
  * (Spark's sequence auto-negates the step) and garbage shingles; here short
  * texts yield an empty array, like DuckDB's `generate_series`.
  */
object TextExpressions {

  /** Distinct word n-gram shingles of a whitespace-separated text. */
  def word_shingles(text: Column, n: Int): Column =
    bridge.column(WordShinglesExpr(bridge.expression(text), n))

  /** All word n-grams INCLUDING repeats — for frequency profiles, where
    * dedup would corrupt the counts. */
  def word_shingles_all(text: Column, n: Int): Column =
    bridge.column(WordShinglesExpr(bridge.expression(text), n, distinct = false))

  /** All ordered (i<j) pairs of a sorted array<long> of ids. */
  def id_pairs(ids: Column): Column =
    bridge.column(IdPairsExpr(bridge.expression(ids)))

  /** Content-defined chunk boundary positions (1-based, ascending). */
  def cdc_boundaries(text: Column): Column =
    bridge.column(CdcBoundariesExpr(bridge.expression(text)))

  /** Rolling hash of every length-`l` character window (one element per
    * start position 1..n-l+1). */
  def gram_hashes(text: Column, l: Int): Column =
    bridge.column(GramHashesExpr(bridge.expression(text), l))
}

/** string → array<long>: a polynomial rolling hash of EVERY length-`l`
  * character window, element k (0-based) covering chars [k, k+l). One
  * compiled pass per document: H_{k+1} = (H_k − c_k·B^{l−1})·B + c_{k+l}
  * in wrapping 64-bit arithmetic. This is q6z's pass-1 kernel — the
  * declarative form re-sliced a fresh l-char substring and xxhash64'd it
  * at every position (O(l) work and one allocation per position, the
  * suite's slowest query); this does O(1) per position and allocates
  * nothing but the output.
  *
  * The hash is an internal pre-filter only (never mirrored by an oracle):
  * q6z's pass 2 re-verifies candidate grams as STRINGS, so collisions can
  * only add candidates, never corrupt the result — which is why a fast
  * polynomial hash is enough. Window POSITIONS, however, must align with
  * the consumer's `substring(text, k+1, l)`, which Spark (and DuckDB)
  * resolve by CODE POINT — so the loop iterates code points, not UTF-16
  * chars. With char indexing, any supplementary-plane character shifts
  * every later window: pass 2 then recovers the wrong gram and true
  * duplicate spans are silently dropped — a position bug, which string
  * re-verification cannot catch (unlike a hash collision, which only
  * ever ADDS candidates). For BMP-only text the two indexings coincide,
  * so this changes nothing on ASCII corpora. */
case class GramHashesExpr(child: Expression, l: Int)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData")
  require(l >= 1 && l <= 256, "gram width in [1,256]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  private[this] final val B = 1000003L
  // B^(l-1) in wrapping 64-bit arithmetic, for the remove-leading term
  @transient private lazy val bPow: Long = {
    var p = 1L
    var i = 1
    while (i < l) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code-point array so window k covers exactly what
    // substring(text, k+1, l) returns (see class doc)
    val cps = s.codePoints().toArray
    val n = cps.length
    val m = n - l + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < l) { h = h * B + cps(i); i += 1 }
    out(0) = h
    var k = 1
    while (k < m) {
      h = (h - cps(k - 1) * bPow) * B + cps(k + l - 1)
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): GramHashesExpr =
    copy(child = c)
}

/** string → array<int>: 1-based end positions i where the 8-char window
  * hash H_i = Σ_{j=0..7} char(i-7+j)·31^j ≡ 0 (mod 32) — the boundary
  * rule of the LBFS/FastCDC-shape content-defined chunker (q5y/q8j).
  * One compiled rolling-hash pass per document: H_i = (H_{i-1} −
  * c_{i-8})/31 + c_i·31⁷ (exact integer division — the subtraction
  * leaves a multiple of 31 by construction). The declarative HOF form
  * paid interpreted lambda dispatch per character (HOFs are
  * CodegenFallback) and made q5y/q8j the suite's two slowest queries;
  * this is the same loop at memory speed.
  *
  * Char values are UTF-16 code units, which for BMP text equal the code
  * points Spark's `ascii()` and DuckDB's `ord()` both return — the
  * algebra this expression must replay bit-exactly (the oracle recomputes
  * boundaries in SQL). Supplementary-plane characters are where the two
  * engines diverge (surrogate unit vs code point), so a surrogate raises
  * immediately instead of silently producing oracle-mismatched chunks. */
case class CdcBoundariesExpr(child: Expression)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  private[this] final val P7 = 27512614111L // 31^7

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < 8) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / 24)
    var h = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isSurrogate(c)) throw new IllegalStateException(
        s"cdc_boundaries: non-BMP character at position ${i + 1} — Spark " +
          "ascii() (UTF-16 unit) and DuckDB ord() (code point) diverge on " +
          "supplementary-plane text; fixture vintage changed?")
      h = if (i < 8) h + c.toLong * pow31(i)
          else (h - s.charAt(i - 8)) / 31L + c.toLong * P7
      if (i >= 7 && h % 32L == 0L) out += Integer.valueOf(i + 1)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // 31^0..31^7 — the seed window accumulates term-by-term, every later
  // position is one rolling update
  @transient private lazy val pow31: Array[Long] = {
    val p = new Array[Long](8)
    p(0) = 1L
    (1 until 8).foreach(j => p(j) = p(j - 1) * 31L)
    p
  }

  override protected def withNewChildInternal(c: Expression): CdcBoundariesExpr =
    copy(child = c)
}

/** array<long> → array<struct<id_a,id_b>>: all ordered pairs (i<j) of a
  * sorted id list — the pair-generation kernel of the inverted-index
  * near-dup join. Compiled loop for the same reason as shingling: the HOF
  * form (flatten ∘ transform ∘ transform) interprets the lambda per pair.
  * Input lists are DF-capped upstream, so output is bounded at cap². */
case class IdPairsExpr(child: Expression)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "id_pairs"

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val n = ids.length
    // fail FAST with a clear message rather than trusting the upstream DF
    // cap: the pair count n·(n−1)/2 must be checked in LONG math (the Int
    // product wraps from n = 46342, which would let a wrapped-positive
    // size slip past a naive guard) and must fit a JVM array, else the
    // allocation below would throw NegativeArraySizeException/OOM deep in
    // a task with no hint of the cause
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= Int.MaxValue - 8,
      s"id_pairs: posting list of $n ids would generate $nPairs " +
        "pairs — apply a DF cap upstream (bucket lists this hot indicate a " +
        "skewed key, not a near-dup family)")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): IdPairsExpr =
    copy(child = c)
}

/** string → array<string>: distinct space-joined word n-grams, in first-
  * occurrence order. Split semantics = `split(text, " ", -1)` (interior and
  * trailing empty tokens preserved, matching DuckDB `string_split`). */
case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData")
  require(n >= 1 && n <= 16, "shingle width in [1,16]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val acc = new java.util.LinkedHashSet[String](m * 2)
    val all = if (distinct) null else new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (distinct) acc.add(sb.toString)
      else all(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](acc.size)
    val it = acc.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
}

/** One-pass multi-group regex extraction: string → array<string> of ALL
  * capture groups from a SINGLE Matcher run. `regexp_extract` parity: no
  * match, or a non-participating optional group, yields "" — but where N
  * separate `regexp_extract(line, re, i)` calls execute the same regex N
  * times per row (each is a distinct expression tree, so nothing can be
  * shared), the N `getItem(i)` projections over THIS one expression share
  * a single subtree that whole-stage codegen's subexpression elimination
  * evaluates once. That turns the clf/syslog/grok decoders (9/6/k groups)
  * into one regex execution per record — the hot-path cost the reference's
  * per-record `RecordFormat` paid reflectively. */
case class RegexGroupsExpr(child: Expression, regex: String, numGroups: Int)
    extends UnaryExpression with RefObjCodegen {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    refObjGenCode(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData")
  require(numGroups > 0, "numGroups must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "regex_groups"

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(input: Any): Any = {
    val m = pattern.matcher(input.toString)
    val out = new Array[Any](numGroups)
    if (m.find()) { // find(), like Spark's RegExpExtract
      var i = 0
      while (i < numGroups) {
        val g = m.group(i + 1)
        out(i) = UTF8String.fromString(if (g == null) "" else g)
        i += 1
      }
    } else {
      var i = 0
      while (i < numGroups) { out(i) = UTF8String.fromString(""); i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): RegexGroupsExpr =
    copy(child = c)
}
