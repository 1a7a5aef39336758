package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchGate

/** The bench regression gate itself: seeded slowdowns must fail, jitter
  * and new queries must not, contended artifacts must be refused. No
  * SparkSession — pure artifact parsing/diffing. */
class BenchGateSpec extends AnyFunSuite {

  private val baseline =
    """# Local per-query bench baseline
      |Total: 10.0 s over 3 queries.
      || query | sec |
      ||---|---|
      || q01_pricing_summary | 2.00 |
      || q80_stream_tumbling | 3.00 |
      || q0a_string_agg | 0.20 |
      |""".stripMargin

  private def bench(q01: Double, q80: Double, q0a: Double,
      contended: Boolean = false, extra: String = ""): String =
    s"""{"metric":"total","value":${q01 + q80 + q0a},"unit":"sec",""" +
      s""""queries":{"q01_pricing_summary":$q01,"q80_stream_tumbling":$q80,""" +
      s""""q0a_string_agg":$q0a$extra},"sf":"sf0.1",""" +
      s""""calib_start_sec":0.2,"calib_end_sec":0.21,"contended":$contended}"""

  test("clean run within 2x passes") {
    val Right((violations, newQs)) = BenchGate.check(bench(2.1, 3.4, 0.3), baseline)
    assert(violations.isEmpty, violations.mkString("; "))
    assert(newQs.isEmpty)
  }

  test("a seeded 3x slowdown on a >1s query fails the gate") {
    val Right((violations, _)) = BenchGate.check(bench(6.1, 3.0, 0.2), baseline)
    assert(violations.map(_.query) == Seq("q01_pricing_summary"))
    assert(violations.head.ratio > 3.0)
  }

  test("sub-second jitter is not a regression even at >2x ratio") {
    // q0a 0.20 -> 0.55 is 2.75x but under the 1s absolute floor
    val Right((violations, _)) = BenchGate.check(bench(2.0, 3.0, 0.55), baseline)
    assert(violations.isEmpty, violations.mkString("; "))
  }

  test("contended artifacts are refused, not graded") {
    val res = BenchGate.check(bench(2.0, 3.0, 0.2, contended = true), baseline)
    assert(res.isLeft)
    assert(res.swap.exists(_.contains("contended")))
  }

  test("queries missing from the baseline are informational, not failures") {
    val Right((violations, newQs)) =
      BenchGate.check(bench(2.0, 3.0, 0.2, extra = ""","q6h_image_decode":9.9"""),
        baseline)
    assert(violations.isEmpty)
    assert(newQs == Seq("q6h_image_decode"))
  }

  test("the committed artifacts pass the gate end to end") {
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val res = BenchGate.check(read("BENCH_LOCAL.json"), read("BASELINE_LOCAL.md"))
    assert(res.isRight, res)
    val Right((violations, _)) = res
    assert(violations.isEmpty, violations.mkString("; "))
  }
}
