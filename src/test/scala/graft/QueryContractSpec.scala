package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-spec for the driver contract (QueryDef docs + Verify compare
  * rules): violations here are exactly the authoring mistakes that turn
  * into silent hash-compare failures later.
  */
class QueryContractSpec extends AnyFunSuite {

  private val defs = SparkEntry.defs

  test("query names are unique and well-formed") {
    val names = defs.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct)}")
    // two lowercase alphanumerics after the q: the original hex-pair
    // convention plus letter slots (q6g sits next to the q6x dedup family
    // it extends — mnemonic grouping beats strict hex)
    assert(names.forall(_.matches("^q[0-9a-z]{2}[a-z0-9_]*$")),
      s"malformed: ${names.filterNot(_.matches("^q[0-9a-z]{2}[a-z0-9_]*$"))}")
  }

  test("every oracle statement ends with a total ORDER BY") {
    val missing = defs.filter(d =>
      d.oracle.exists(sql => !sql.toUpperCase.contains("ORDER BY")))
    assert(missing.isEmpty,
      s"oracles without ORDER BY: ${missing.map(_.name)}")
  }

  test("oracles only reference the driver's tables") {
    val tables = graft.sources.Tables.names.toSet
    val fromRe = "(?is)\\b(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    for (d <- defs; sql <- d.oracle) {
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // CTE names and aliases are fine; flag only identifiers that look like
      // base tables but aren't (catches typos like `lineitems`)
      val cteNames = "(?is)\\b([a-z_][a-z0-9_]*)\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- cteNames
      val suspicious = unknown.filter(u => tables.exists(t =>
        u != t && (u.startsWith(t) || t.startsWith(u))))
      assert(suspicious.isEmpty,
        s"${d.name}: suspicious table refs $suspicious")
    }
  }

  test("queries map and oracle map stay aligned with defs") {
    assert(SparkEntry.queries.size == defs.size)
    assert(SparkEntry.oracleSql.size == defs.count(_.oracle.isDefined))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // Round-11 escape class: DuckDB promotes SUM(BIGINT) to DECIMAL(38,0)
  // and row_number() to BIGINT, while Spark emits BIGINT / INT — identical
  // values, different arrow types, and the driver's hash is TYPE-sensitive.
  // This lint taint-traces every uncast integer-SUM / row_number alias
  // through re-aliasing (cents AS v, p.spend AS spend_cents, ...) and fails
  // if any tainted name (or inline risky expression) reaches the oracle's
  // final top-level projection uncast. check_correctness.py enforces the
  // same contract dynamically (strict arrow-type compare).
  test("oracle final projections never emit uncast int-SUM or row_number") {
    val bad = for {
      d <- defs; sql <- d.oracle.toSeq
      v = OracleTypeLint.check(sql) if v.nonEmpty
    } yield s"${d.name}: ${v.mkString("; ")}"
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  // Round-12 escape class (qat): DuckDB round() preserves the sign of a
  // tiny negative (round(-1e-9, 4) → -0.0 raw bits 0x800...) while Spark's
  // round goes through BigDecimal, which has no -0.0 — a one-BIT hash
  // divergence in an otherwise identical cell. Protection = `+ 0` on the
  // emitted value (a no-op on every value except -0.0). This lint flags
  // every oracle final-projection item that emits a DOUBLE-typed round()
  // — inline or via alias taint — without the normalization.
  // check_correctness.py enforces the same contract dynamically (float
  // cells compared as raw IEEE-754 bits).
  test("oracle final projections never emit rounded DOUBLEs without + 0") {
    val bad = for {
      d <- defs; sql <- d.oracle.toSeq
      v = OracleTypeLint.checkSignedZero(sql) if v.nonEmpty
    } yield s"${d.name}: ${v.mkString("; ")}"
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}

/** Textual lint for the DuckDB output-type promotion trap (see the spec
  * above). Heuristic by design: paren-matched spans + alias taint closure,
  * no full SQL parse — tuned to zero false positives on the suite.
  */
object OracleTypeLint {
  private val IntCastArg = "(?is)AS\\s+(BIGINT|INT|INTEGER|SMALLINT|HUGEINT)\\b".r

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** All spans `CAST( ... )` blanked (offsets preserved) — taint does not
    * propagate through an explicit cast. */
  private def blankCasts(sql: String): String = {
    val sb = new StringBuilder(sql)
    val re = "(?i)\\bCAST\\s*\\(".r
    for (m <- re.findAllMatchIn(sql)) {
      val close = matchParen(sql, m.end - 1)
      if (close > 0) for (i <- m.start to close) sb.setCharAt(i, ' ')
    }
    sb.toString
  }

  /** (start, end-exclusive) of the final top-level SELECT's projection in
    * `s` — from the last depth-0 SELECT to the next depth-0 FROM. */
  private def finalProjection(s: String): (Int, Int) = {
    var lastSel = -1
    val sel = "(?i)\\bSELECT\\b".r.findAllMatchIn(s).map(_.start).toList
    val depthAt = {
      val d = new Array[Int](s.length + 1)
      var c = 0
      for (i <- s.indices) {
        if (s.charAt(i) == '(') c += 1 else if (s.charAt(i) == ')') c -= 1
        d(i + 1) = c
      }
      d
    }
    for (p <- sel if depthAt(p) == 0) lastSel = p
    if (lastSel < 0) return (0, 0)
    val from = "(?i)\\bFROM\\b".r.findAllMatchIn(s)
      .map(_.start).find(p => p > lastSel && depthAt(p) == 0)
    (lastSel, from.getOrElse(s.length))
  }

  def check(sql: String): Seq[String] = {
    // 1. risky sites: uncast integer-SUM (arg contains an int cast — the
    //    cents/quantize idiom) and uncast row_number().
    case class Site(start: Int, end: Int, what: String, alias: Option[String])
    def castWrapped(pos: Int): Boolean =
      sql.substring(0, pos).matches("(?is).*\\bCAST\\s*\\(\\s*")
    def aliasAfter(pos: Int): Option[String] = {
      val m = "(?s)^\\s+AS\\s+(\\w+)".r.findFirstMatchIn(sql.substring(pos))
      m.map(_.group(1))
    }
    val sites = collection.mutable.Buffer[Site]()
    for (m <- "(?i)\\bSUM\\s*\\(".r.findAllMatchIn(sql)) {
      val close = matchParen(sql, m.end - 1)
      if (close > 0) {
        val arg = sql.substring(m.end, close)
        if (IntCastArg.findFirstIn(arg).isDefined && !castWrapped(m.start))
          sites += Site(m.start, close + 1, "SUM", aliasAfter(close + 1))
      }
    }
    for (m <- "(?i)\\bROW_NUMBER\\s*\\(\\s*\\)\\s*OVER\\s*\\(".r.findAllMatchIn(sql)) {
      val close = matchParen(sql, m.end - 1)
      if (close > 0 && !castWrapped(m.start))
        sites += Site(m.start, close + 1, "row_number", aliasAfter(close + 1))
    }
    if (sites.isEmpty) return Nil

    // 2. taint closure over re-aliasing, computed on a cast-blanked copy.
    val blanked = blankCasts(sql)
    val tainted = collection.mutable.Map[String, String]() // name -> origin
    for (s <- sites; a <- s.alias) tainted(a.toLowerCase) = s.what
    var changed = true
    while (changed) {
      changed = false
      for ((name, what) <- tainted.toList) {
        val re = ("(?i)\\b(?:\\w+\\.)?" + java.util.regex.Pattern.quote(name) +
          "\\s+AS\\s+(\\w+)").r
        for (m <- re.findAllMatchIn(blanked)) {
          val a = m.group(1).toLowerCase
          if (!tainted.contains(a)) { tainted(a) = what; changed = true }
        }
      }
    }

    // 3. violation = tainted name or inline risky site in the final
    //    top-level projection (cast-blanked, so wrapped uses are clean).
    val (ps, pe) = finalProjection(blanked)
    val proj = blanked.substring(ps, pe)
    val inline = sites.filter(s => s.alias.isEmpty && s.start >= ps && s.end <= pe)
      .map(s => s"inline uncast ${s.what} in final projection")
    // Only a projection ITEM that is exactly `[tbl.]name [AS alias]`
    // emits the tainted column's type; a read inside a wider expression
    // (CASE band, arithmetic) emits that expression's type instead.
    val items: Seq[String] = {
      val body = proj.replaceFirst("(?is)^\\s*SELECT\\s+(DISTINCT\\s+)?", "")
      val parts = collection.mutable.Buffer[String]()
      var depth = 0; var start = 0
      for (i <- body.indices) body.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          parts += body.substring(start, i); start = i + 1
        case _ =>
      }
      parts += body.substring(start)
      parts.map(_.trim).toSeq
    }
    def emitsName(name: String): Boolean = {
      val re = ("(?is)^(?:\\w+\\.)?" + java.util.regex.Pattern.quote(name) +
        "(\\s+AS\\s+\\w+)?$").r
      items.exists(it => re.findFirstIn(it).isDefined)
    }
    val aliased = tainted.toSeq.sortBy(_._1).collect {
      case (name, what) if emitsName(name) =>
        s"uncast $what reaches final projection via alias '$name'"
    }
    inline.toSeq ++ aliased
  }

  /** Signed-zero lint (round-12 escape class, qat): DuckDB `round()`
    * preserves the sign of a tiny negative (`round(-1e-9, 4)` → `-0.0`)
    * while Spark's round goes through BigDecimal, which cannot represent
    * −0.0 — so any DOUBLE-typed rounded value the oracle emits is one
    * data nudge away from a one-bit hash divergence. The repo-wide
    * protection idiom is `+ 0` on the emitted value (a no-op on every
    * value except −0.0). Flags every final-projection item that emits a
    * DOUBLE round() — inline, or by exact-name emission of an alias the
    * taint closure traced back to an unprotected round — without `+ 0`.
    * Heuristic like [[check]]: paren-matched spans, no SQL parse, tuned
    * to zero false positives on the suite.
    */
  def checkSignedZero(sql: String): Seq[String] = {
    val prot = "\\+\\s*0(?![.\\w])".r // `+ 0` but not `+ 0.5` / `+ 0x1`
    case class Site(start: Int, end: Int, alias: Option[String])
    def aliasAfter(pos: Int): Option[(String, Int)] = {
      val m = "(?s)^\\s+AS\\s+(\\w+)".r.findFirstMatchIn(sql.substring(pos))
      m.map(mm => (mm.group(1), pos + mm.start(1)))
    }
    val sites = collection.mutable.Buffer[Site]()
    for (m <- "(?i)\\bround\\s*\\(".r.findAllMatchIn(sql)) {
      val close = matchParen(sql, m.end - 1)
      if (close > 0) {
        val pre = sql.substring(0, m.start)
        val wrapped = "(?is).*\\bCAST\\s*\\(\\s*$".r.findFirstIn(pre).isDefined
        val castTarget =
          if (!wrapped) None
          else "(?is)^\\s*AS\\s+([A-Z]+)".r
            .findFirstMatchIn(sql.substring(close + 1)).map(_.group(1).toUpperCase)
        if (!castTarget.exists(_ != "DOUBLE")) {
          // DOUBLE-producing round: bare, or CAST(round(...) AS DOUBLE)
          val aliasPos = castTarget match {
            case Some(_) => // skip past the enclosing cast's close paren
              val castOpen = pre.lastIndexOf('(')
              matchParen(sql, castOpen) + 1
            case None => close + 1
          }
          val a = aliasAfter(aliasPos)
          // site-level protection: `round(...) + 0 AS name`
          val siteProt = a.exists { case (_, apos) =>
            prot.findFirstIn(sql.substring(close + 1, apos)).isDefined
          }
          if (!siteProt) sites += Site(m.start, close + 1, a.map(_._1))
        }
      }
    }
    if (sites.isEmpty) return Nil

    // taint closure over plain re-aliasing (a CAST to a non-double type
    // would clean the taint, but `CAST(x AS BIGINT) AS y` does not match
    // the `x AS y` shape, so it never propagates here anyway)
    val tainted = collection.mutable.Set[String]()
    for (s <- sites; a <- s.alias) tainted += a.toLowerCase
    var changed = true
    while (changed) {
      changed = false
      for (name <- tainted.toList) {
        val re = ("(?i)\\b(?:\\w+\\.)?" + java.util.regex.Pattern.quote(name) +
          "\\s+AS\\s+(\\w+)").r
        for (m <- re.findAllMatchIn(sql)) {
          val a = m.group(1).toLowerCase
          if (!tainted.contains(a) && a != "double") { tainted += a; changed = true }
        }
      }
    }

    val (ps, pe) = finalProjection(sql)
    val proj = sql.substring(ps, pe)
    // absolute spans of the final projection's comma-split items
    val items: Seq[(Int, Int)] = {
      val selLen = "(?is)^\\s*SELECT\\s+(DISTINCT\\s+)?".r
        .findFirstIn(proj).map(_.length).getOrElse(0)
      val spans = collection.mutable.Buffer[(Int, Int)]()
      var depth = 0; var start = ps + selLen
      for (i <- (ps + selLen) until pe) sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => spans += ((start, i)); start = i + 1
        case _ =>
      }
      spans += ((start, pe))
      spans.toSeq
    }
    def itemText(sp: (Int, Int)) = sql.substring(sp._1, sp._2).trim
    val inline = for {
      sp <- items
      s <- sites if s.start >= sp._1 && s.end <= sp._2
      if prot.findFirstIn(itemText(sp)).isEmpty
    } yield s"unprotected DOUBLE round() in final projection item '${itemText(sp).take(60)}'"
    val viaAlias = for {
      sp <- items
      it = itemText(sp)
      name <- tainted.toSeq.sorted
      re = ("(?is)^(?:CAST\\s*\\(\\s*)?(?:\\w+\\.)?" +
        java.util.regex.Pattern.quote(name) +
        "(\\s+AS\\s+DOUBLE\\s*\\))?(\\s+AS\\s+\\w+)?$").r
      if re.findFirstIn(it).isDefined
    } yield s"rounded DOUBLE reaches final projection unprotected via alias '$name'"
    (inline ++ viaAlias).distinct
  }
}
