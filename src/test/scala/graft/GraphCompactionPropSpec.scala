package graft

import org.apache.spark.sql.functions._

import graft.operators.NnDescent

/** qb5's compaction on random clustered corpora: the full lifecycle
  * chain — base build → incremental insert → delete with local repair
  * → compact — must land EXACTLY on the from-scratch rebuild of the
  * live corpus (the qa8/qaj merged-≡-rebuilt claim, graph edition),
  * and the live id set the compaction derives from the chain must
  * equal the rule-derived one (base ∪ delta minus tombstones). */
class GraphCompactionPropSpec extends SparkSpec {

  private val Dim = 12

  private def corpus(seed: Long, n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(8)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(rnd.nextInt(8))
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
  }

  private def dead(c: org.apache.spark.sql.Column) =
    pmod(c, lit(NnDescent.DeleteMod)) === lit(NnDescent.DeleteRes)

  test("insert + delete + compact ≡ from-scratch rebuild of the live corpus") {
    val session = spark
    import session.implicits._
    for (seed <- Seq(11L, 43L)) {
      val n = 192
      val e = corpus(seed, n).toDF("vec_id", "embedding").cache()
      val nBase = n - n / 16
      // the generation chain, exactly as qb5 stages it
      val g0 = NnDescent.knnGraph(e.filter(col("vec_id") < nBase)).cache()
      val g1 = NnDescent.insertDelta(e, g0, nBase).cache()
      val g2 = NnDescent.deleteRepair(e, g1).cache()

      // chain-derived live set == rule-derived live set
      val chainLive = g2.select(col("vec_id")).distinct()
      val ruleLive = e.filter(!dead(col("vec_id"))).select(col("vec_id"))
      assert(chainLive.exceptAll(ruleLive).isEmpty &&
        ruleLive.exceptAll(chainLive).isEmpty,
        s"seed=$seed chain-derived live set diverges from the tombstone rule")

      // compact(chain) == knnGraph(live corpus), every cell
      val compacted = NnDescent.compact(e, g2).cache()
      val rebuilt = NnDescent.knnGraph(e.filter(!dead(col("vec_id")))).cache()
      assert(compacted.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(compacted).isEmpty,
        s"seed=$seed compacted graph is not the from-scratch rebuild")

      // compaction resets incremental drift: no tombstone trace, and the
      // compacted graph never keeps a maintenance artifact edge (every
      // edge re-justified by the build)
      assert(compacted.filter(dead(col("vec_id")) || dead(col("nid"))).isEmpty,
        s"seed=$seed tombstone trace survived compaction")

      rebuilt.unpersist(); compacted.unpersist()
      g2.unpersist(); g1.unpersist(); g0.unpersist(); e.unpersist()
    }
  }
}
