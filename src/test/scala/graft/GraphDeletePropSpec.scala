package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.NnDescent
import graft.queries.SimilarityQueries

/** qb4's delete-with-local-repair on random clustered corpora: the
  * repaired graph must contain no trace of a tombstoned node, leave
  * untouched lists byte-identical, and the FreshDiskANN patch
  * (candidates from the deleted node's former list) must never make a
  * touched node's recall WORSE than just dropping the dead edges —
  * the monotone-improvement property that makes local repair a safe
  * default over a global rebuild. */
class GraphDeletePropSpec extends SparkSpec {

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

  private def recallOf(lists: DataFrame, exact: Set[(Long, Long)]): Double = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("c").desc, col("nid"))
    val got = lists.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= NnDescent.ReportK)
      .select(col("vec_id"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.count(exact) * 1.0 / exact.size
  }

  test("repair leaves no tombstone trace, keeps untouched lists, never hurts recall") {
    val session = spark
    import session.implicits._
    for (seed <- Seq(7L, 31L)) {
      val n = 192
      val e = corpus(seed, n).toDF("vec_id", "embedding").cache()
      val g0 = NnDescent.knnGraph(e).cache()
      val repaired = NnDescent.deleteRepair(e, g0).cache()

      // no deleted owner, no edge into a tombstone, anywhere
      assert(repaired.filter(dead(col("vec_id")) || dead(col("nid"))).isEmpty,
        s"seed=$seed tombstone trace in the repaired graph")

      // untouched survivors' lists are byte-identical to g0
      val touched = g0.filter(!dead(col("vec_id")) && dead(col("nid")))
        .select("vec_id").distinct()
      val untouchedRep = repaired.join(touched, Seq("vec_id"), "left_anti")
      val untouchedG0 = g0.filter(!dead(col("vec_id")))
        .join(touched, Seq("vec_id"), "left_anti")
      assert(untouchedRep.exceptAll(untouchedG0).isEmpty &&
        untouchedG0.exceptAll(untouchedRep).isEmpty,
        s"seed=$seed an untouched list changed")

      // monotone improvement on the touched probes vs drop-only
      val surE = e.filter(!dead(col("vec_id")))
      val exact = SimilarityQueries
        .exactTopKOf(surE, NnDescent.ReportK, touched)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cleanedTouched = g0.filter(!dead(col("vec_id")) && !dead(col("nid")))
        .join(touched, Seq("vec_id"), "left_semi")
      val repairedTouched = repaired.join(touched, Seq("vec_id"), "left_semi")
      val rClean = recallOf(cleanedTouched, exact)
      val rRep = recallOf(repairedTouched, exact)
      assert(rRep >= rClean,
        s"seed=$seed repair hurt recall: $rRep < drop-only $rClean")
      assert(rRep >= 0.6, s"seed=$seed repaired recall degenerate: $rRep")

      repaired.unpersist(); g0.unpersist(); e.unpersist()
    }
  }
}
