package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** qb6's IVF compaction on random corpora: the chain-derived live set
  * must equal the rule-derived one, the compacted index must equal the
  * from-scratch build over the live corpus (centroids AND memberships,
  * cell for cell), and compaction must actually RESET the two stale
  * dimensions of the incremental chain — centroid count re-tracks
  * √(live), and no tombstoned id survives anywhere. */
class IvfCompactionPropSpec extends SparkSpec {

  private val Dim = 12

  private def corpus(seed: Long, n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(6)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(rnd.nextInt(6))
      (i.toLong, c.map(x => x + 0.25f * rnd.nextGaussian().toFloat))
    }
  }

  test("chain fold ≡ from-scratch IVF build over the live corpus") {
    val session = spark
    import session.implicits._
    for (seed <- Seq(5L, 23L)) {
      val n = 200
      val e = corpus(seed, n).toDF("vec_id", "embedding").cache()
      val nBase = n - n / 16
      val base = e.filter(col("vec_id") < nBase)
      // the chain, exactly as qb6 stages it (in-memory here)
      val c0 = SimilarityQueries.centroids(base)
      val a0 = SimilarityQueries.assignTo(base, c0)
      val a1 = SimilarityQueries.assignTo(e.filter(col("vec_id") >= nBase), c0)
      val tomb = e.filter(pmod(col("vec_id"), lit(9)) === 3).select("vec_id")
      val members = a0.select("vec_id").unionByName(a1.select("vec_id"))
      val chainLive = members.join(tomb, Seq("vec_id"), "left_anti").distinct()

      // chain-derived live set == rule-derived live set
      val ruleLive = e.filter(pmod(col("vec_id"), lit(9)) =!= 3).select("vec_id")
      assert(chainLive.exceptAll(ruleLive).isEmpty &&
        ruleLive.exceptAll(chainLive).isEmpty,
        s"seed=$seed chain-derived live set diverges from the tombstone rule")

      // compacted == from-scratch build over the live corpus
      val liveE = e.join(chainLive, Seq("vec_id"), "left_semi").cache()
      val cc = SimilarityQueries.centroids(liveE)
      val ca = SimilarityQueries.assignTo(liveE, cc)
      val rc = SimilarityQueries.centroids(
        e.filter(pmod(col("vec_id"), lit(9)) =!= 3))
      val ra = SimilarityQueries.assignTo(
        e.filter(pmod(col("vec_id"), lit(9)) =!= 3), rc)
      assert(ca.exceptAll(ra).isEmpty && ra.exceptAll(ca).isEmpty,
        s"seed=$seed compacted memberships are not the rebuilt memberships")

      // staleness actually reset: the seed BOUND re-tracks ceil(sqrt(live))
      // — the seed set is live ∩ [0, k), so tombstoned prefix ids are gone
      val kLive = math.ceil(math.sqrt(liveE.count().toDouble)).toLong
      val expectSeeds = liveE.filter(col("vec_id") < kLive).count()
      assert(cc.count() == expectSeeds,
        s"seed=$seed compacted centroid count ${cc.count()} != live seeds " +
          s"under the re-tracked bound $kLive ($expectSeeds)")
      assert(ca.join(tomb, Seq("vec_id"), "left_semi").isEmpty,
        s"seed=$seed a tombstoned id survived compaction")

      liveE.unpersist(); e.unpersist()
    }
  }
}
