package graft

import scala.util.Random

import graft.queries.TextAnalysis

/** qa2's waterfilling vs a driver-side sequential reference: random size
  * profiles (uniform, skewed, ties, single source, all-equal) must
  * produce identical integer allocations, the allocation must sum
  * EXACTLY to the budget, and no source may exceed its cap. The engine
  * computes the cap set with a closed-form rank test + triangular joins;
  * the reference just loops — agreement proves the closed form. */
class UnimaxPropSpec extends SparkSpec {

  /** Sequential reference: uniform waterfilling of budget b over sizes
    * (cap = full size), remainder one token each to the largest uncapped
    * sources (ties by source name ascending). */
  private def reference(sizes: Map[String, Long]): Map[String, Long] = {
    val b = 9L * sizes.values.sum / 10L
    val asc = sizes.toSeq.sortBy { case (s, n) => (n, s) }
    var remaining = b
    var left = asc.size
    val out = scala.collection.mutable.Map[String, Long]()
    // take fully while the source fits under a uniform share of what's left
    var i = 0
    var capping = true
    while (i < asc.size) {
      val (s, n) = asc(i)
      if (capping && n * left <= remaining) {
        out(s) = n; remaining -= n; left -= 1
      } else {
        capping = false // sorted ascending: nothing later can cap either
        out(s) = 0L
      }
      i += 1
    }
    val unc = asc.filterNot { case (s, _) => out(s) > 0 }
    if (unc.nonEmpty) {
      val base = remaining / unc.size
      val extra = remaining % unc.size
      // +1 to the `extra` largest uncapped (ties by source ascending)
      val byDesc = unc.sortBy { case (s, n) => (-n, s) }
      byDesc.zipWithIndex.foreach { case ((s, _), idx) =>
        out(s) = base + (if (idx < extra) 1L else 0L)
      }
    }
    out.toMap
  }

  private def run(sizes: Map[String, Long]): Map[String, Long] = {
    import spark.implicits._
    TextAnalysis.unimaxAllocation(sizes.toSeq.toDF("source", "n"))
      .select("source", "alloc_tokens").as[(String, Long)].collect().toMap
  }

  test("random size profiles match the sequential reference exactly") {
    val rnd = new Random(11)
    for (trial <- 0 until 10) {
      val nSrc = 2 + rnd.nextInt(12)
      val sizes = (0 until nSrc).map { i =>
        s"s$i" -> (100L + rnd.nextInt(3000).toLong)
      }.toMap
      val got = run(sizes)
      val ref = reference(sizes)
      assert(got == ref, s"trial $trial sizes=$sizes")
      assert(got.values.sum == 9L * sizes.values.sum / 10L,
        s"trial $trial: allocation must sum exactly to the budget")
      sizes.foreach { case (s, n) =>
        assert(got(s) <= n, s"trial $trial: $s allocated over its cap")
      }
    }
  }

  test("ties, all-equal and single-source profiles") {
    // all equal: nobody caps (each n > 0.9*mean), uniform split + remainder
    val eq = Map("a" -> 100L, "b" -> 100L, "c" -> 100L)
    assert(run(eq) == reference(eq))
    // exact ties across the cap boundary
    val ties = Map("a" -> 50L, "b" -> 50L, "c" -> 500L, "d" -> 500L)
    assert(run(ties) == reference(ties))
    // single source: allocation = 90% of it
    val one = Map("solo" -> 1000L)
    assert(run(one) == Map("solo" -> 900L))
  }
}
