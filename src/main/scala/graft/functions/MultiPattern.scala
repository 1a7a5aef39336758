package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan (Aho–Corasick) as a native expression —
  * the blocklist/screening primitive of corpus curation (SURVEY.md §2.12
  * Tier C). One automaton walk per document counts ALL occurrences of
  * EVERY pattern (overlapping included) in a single pass: O(|text| +
  * matches), independent of the pattern count — versus the naive
  * per-pattern scan (what the DuckDB oracle replays) that re-reads the
  * text once per pattern. At a 100 TB corpus against a thousands-entry
  * blocklist that difference is the whole operator.
  *
  * The pattern set flows IN-PLAN as the second argument (a one-row
  * `collect_list` frame cross-broadcast onto the scan — the same idiom the
  * ANN queries use for centroids), so a data-derived blocklist needs no
  * driver collect. The compiled automaton is cached per expression
  * instance and rebuilt only when the pattern array changes content —
  * per-partition cost, not per-row (the array is partition-constant by
  * construction; content equality is still checked row-by-row against the
  * cached UTF8String keys, ~20 pointer compares, so a non-constant array
  * is correct, just slower).
  */
object MultiPattern {

  /** (text, patterns array<string>) → array<struct<pattern,cnt>>, one row
    * per pattern in pattern-array order, cnt = number of occurrence
    * positions in text (overlapping counted). */
  def multi_pattern_counts(text: Column, patterns: Column): Column =
    bridge.column(MultiPatternCountsExpr(
      bridge.expression(text), bridge.expression(patterns)))
}

/** Aho–Corasick goto/fail automaton over UTF-16 chars. Built once from a
  * pattern array; `countsInto` walks the text once, following dictionary
  * suffix links at each position so overlapping and nested matches all
  * count (pattern "a a" matches twice in "a a a" — parity with a
  * position-by-position substring scan, the oracle's formulation). */
private[graft] final class AhoCorasick(patterns: Array[String]) {
  import java.lang.{Character => JChar, Integer => JInt}
  // nodes as growable parallel arrays; children as per-node sorted maps —
  // pattern sets are small (config blocklists), texts are the hot side
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.TreeMap[JChar, JInt]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val patEnd = scala.collection.mutable.ArrayBuffer(-1) // pattern idx ending here
  private val dictLink = scala.collection.mutable.ArrayBuffer(0) // nearest suffix end-state

  { // build trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      require(p.nonEmpty, "multi_pattern_counts: empty pattern")
      var s = 0
      p.foreach { ch =>
        val next = children(s).get(JChar.valueOf(ch))
        s = if (next != null) next.intValue()
        else {
          children += new java.util.TreeMap[JChar, JInt]()
          fail += 0; patEnd += -1; dictLink += 0
          val id = children.size - 1
          children(s).put(JChar.valueOf(ch), JInt.valueOf(id))
          id
        }
      }
      // duplicate patterns would double-count silently; refuse
      require(patEnd(s) == -1,
        s"multi_pattern_counts: duplicate pattern '$p'")
      patEnd(s) = pi
    }
    // BFS fail links (root's children fail to root)
    val q = scala.collection.mutable.Queue[Int]()
    children(0).forEach((_, v) => q.enqueue(v.intValue()))
    while (q.nonEmpty) {
      val u = q.dequeue()
      dictLink(u) = if (patEnd(fail(u)) >= 0) fail(u) else dictLink(fail(u))
      children(u).forEach { (ch, vBox) =>
        val v = vBox.intValue()
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        val t = children(f).get(ch)
        fail(v) = if (t != null && t.intValue() != v) t.intValue() else 0
        q.enqueue(v)
      }
    }
  }

  /** Add each pattern's occurrence count in `text` into `out` (aligned
    * with the constructor's pattern order). */
  def countsInto(text: String, out: Array[Int]): Unit = {
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = java.lang.Character.valueOf(text.charAt(i))
      while (s != 0 && !children(s).containsKey(ch)) s = fail(s)
      val t = children(s).get(ch)
      s = if (t != null) t.intValue() else 0
      // emit every pattern ending at this position via dict-suffix chain
      var e = if (patEnd(s) >= 0) s else dictLink(s)
      while (e != 0) {
        out(patEnd(e)) += 1
        e = dictLink(e)
      }
      i += 1
    }
  }
}

/** (string, array<string>) → array<struct<pattern:string, cnt:int>>. */
case class MultiPatternCountsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pattern", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "multi_pattern_counts"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this)
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.nullSafeEval($t, $p);""".stripMargin)
  }

  // automaton cache: rebuilt only when the pattern array's CONTENT changes
  @transient private var cachedKeys: Array[UTF8String] = _
  @transient private var cachedAuto: AhoCorasick = _
  @transient private var cachedPats: Array[UTF8String] = _

  override def nullSafeEval(textAny: Any, patsAny: Any): Any = {
    val pats = patsAny.asInstanceOf[ArrayData]
    val k = pats.numElements()
    var same = cachedKeys != null && cachedKeys.length == k
    if (same) {
      var i = 0
      while (same && i < k) {
        if (pats.getUTF8String(i) != cachedKeys(i)) same = false
        i += 1
      }
    }
    if (!same) {
      val keys = new Array[UTF8String](k)
      var i = 0
      while (i < k) { keys(i) = pats.getUTF8String(i).clone(); i += 1 }
      cachedKeys = keys
      cachedPats = keys
      cachedAuto = new AhoCorasick(keys.map(_.toString))
    }
    val counts = new Array[Int](k)
    cachedAuto.countsInto(textAny.asInstanceOf[UTF8String].toString, counts)
    val rows = new Array[Any](k)
    var i = 0
    while (i < k) {
      rows(i) = InternalRow(cachedPats(i), counts(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MultiPatternCountsExpr =
    copy(left = l, right = r)
}
