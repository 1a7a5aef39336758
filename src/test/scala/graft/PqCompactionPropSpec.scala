package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** qc2's PQ compaction on random corpora: the chain-derived live set
  * must equal the rule-derived one, the compacted index must equal the
  * from-scratch PQ build over the live corpus (codebook AND codes, cell
  * for cell), and compaction must actually RESET the two stale
  * dimensions of the incremental chain — the codebook is retrained on
  * the live corpus (seed set = live ∩ [0, 16), so tombstoned prefix ids
  * are gone) and no tombstoned id survives in the codes table. */
class PqCompactionPropSpec extends SparkSpec {

  private val Dim = 64

  private def corpus(seed: Long, n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(6)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(rnd.nextInt(6))
      (i.toLong, c.map(x => x + 0.25f * rnd.nextGaussian().toFloat))
    }
  }

  test("chain fold ≡ from-scratch PQ build over the live corpus") {
    val session = spark
    import session.implicits._
    for (seed <- Seq(7L, 31L)) {
      val n = 200
      val e = corpus(seed, n).toDF("vec_id", "embedding").cache()
      val nBase = n - n / 16
      // the chain, exactly as qc2 stages it (in-memory here)
      val sub0 = SimilarityQueries.pqSub(e.filter(col("vec_id") < nBase))
      val cb0 = SimilarityQueries.pqCodebook(sub0)
      val codes0 = SimilarityQueries.pqCodes(sub0, cb0)
      val codes1 = SimilarityQueries.pqCodes(
        SimilarityQueries.pqSub(e.filter(col("vec_id") >= nBase)), cb0)
      val tomb = e.filter(pmod(col("vec_id"), lit(9)) === 3).select("vec_id")
      val members = codes0.select("vec_id").unionByName(codes1.select("vec_id"))
      val chainLive = members.join(tomb, Seq("vec_id"), "left_anti").distinct()

      // chain-derived live set == rule-derived live set
      val ruleLive = e.filter(pmod(col("vec_id"), lit(9)) =!= 3).select("vec_id")
      assert(chainLive.exceptAll(ruleLive).isEmpty &&
        ruleLive.exceptAll(chainLive).isEmpty,
        s"seed=$seed chain-derived live set diverges from the tombstone rule")

      // compacted == from-scratch build over the live corpus
      val liveE = e.join(chainLive, Seq("vec_id"), "left_semi").cache()
      val subL = SimilarityQueries.pqSub(liveE)
      val cbL = SimilarityQueries.pqCodebook(subL)
      val codesL = SimilarityQueries.pqCodes(subL, cbL)
      val subR = SimilarityQueries.pqSub(
        e.filter(pmod(col("vec_id"), lit(9)) =!= 3))
      val cbR = SimilarityQueries.pqCodebook(subR)
      val codesR = SimilarityQueries.pqCodes(subR, cbR)
      assert(codesL.exceptAll(codesR).isEmpty &&
        codesR.exceptAll(codesL).isEmpty,
        s"seed=$seed compacted codes are not the rebuilt codes")

      // staleness actually reset: the retrained codebook's seed set is
      // live ∩ [0, 16) — tombstoned prefix ids (3, 12) are gone
      val expectSeeds = liveE.filter(col("vec_id") < 16).count()
      assert(cbL.select("code").distinct().count() == expectSeeds,
        s"seed=$seed compacted codebook code count != live prefix seeds " +
          s"($expectSeeds)")
      assert(cbL.join(tomb, cbL("code") === tomb("vec_id"), "left_semi")
        .isEmpty,
        s"seed=$seed a tombstoned id survived as a codebook seed")
      assert(codesL.join(tomb, Seq("vec_id"), "left_semi").isEmpty,
        s"seed=$seed a tombstoned id survived compaction in the codes")

      liveE.unpersist(); e.unpersist()
    }
  }
}
