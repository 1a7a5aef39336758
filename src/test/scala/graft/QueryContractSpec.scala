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
}
