package graft

import org.apache.spark.sql.functions.{col, sha2}

import graft.functions.BloomFunctions

/** qb9's counting-Bloom retraction, checked where the single sf0.01
  * corpus can't reach: planted RE-ADMISSION (an incoming text whose only
  * snapshot partner was deleted must come out novel), the MULTISET case
  * a naive clear-the-bits delete corrupts (one copy of a duplicated
  * snapshot text deleted — the live copy must still test present), the
  * all-retracted bootstrap (filter folds to the empty map, everything
  * verdicts novel), and the no-false-negative contract on random
  * corpora against a driver-side exact reference. */
class CountingBloomPropSpec extends SparkSpec {

  private val M = 4096L
  private val K = 4

  private def gate(docs: Seq[(Long, String)], split: Long,
      deadPred: Long => Boolean): Seq[(Long, String)] = {
    import spark.implicits._
    val all = docs.toDF("doc_id", "text")
      .withColumn("h", sha2(col("text"), 256))
    val snapshot = all.filter(col("doc_id") < split)
    val dead = docs.map(_._1).filter(i => i < split && deadPred(i)).toSet
    val retracted = snapshot
      .filter(col("doc_id").isin(dead.toSeq: _*)).select(col("h"))
    val liveH = snapshot
      .filter(!col("doc_id").isin(dead.toSeq: _*)).select(col("h"))
    val cbf = BloomFunctions.counting_bloom(
      snapshot.select(col("h")), retracted, M, K)
    val flagged = all.filter(col("doc_id") >= split).withColumn("cand",
      BloomFunctions.counting_might_contain(cbf, col("h"), M, K))
    flagged.filter(!col("cand")).select(col("doc_id"), col("text"))
      .unionByName(flagged.filter(col("cand"))
        .join(liveH, Seq("h"), "left_anti")
        .select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"))
      .as[(Long, String)].collect().toSeq
  }

  private def reference(docs: Seq[(Long, String)], split: Long,
      deadPred: Long => Boolean): Seq[(Long, String)] = {
    val liveTexts = docs
      .filter { case (i, _) => i < split && !deadPred(i) }.map(_._2).toSet
    docs.filter { case (i, t) => i >= split && !liveTexts.contains(t) }
      .sortBy(_._1)
  }

  test("gate equals the exact live anti join on random corpora (planted cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(6130947)
    var readmissionFired = false
    for (trial <- 0 until 4) {
      val nBase = 20 + rnd.nextInt(10)
      val split = nBase.toLong
      def word() = s"w${rnd.nextInt(40)}"
      val base = (0 until nBase)
        .map(i => (i.toLong, Seq.fill(6)(word()).mkString(" ")))
      val delta = (0 until 14).map { i =>
        val id = (nBase + i).toLong
        rnd.nextInt(3) match {
          case 0 => (id, base(rnd.nextInt(nBase))._2) // exact dup of snapshot
          case 1 => (id, Seq.fill(6)(word()).mkString(" ")) // fresh
          case _ => // dup of a doc the sweep WILL delete (id % 3 == 0)
            (id, base(rnd.nextInt((nBase + 2) / 3) * 3)._2)
        }
      }
      val docs = base ++ delta
      val got = gate(docs, split, _ % 3 == 0)
      val want = reference(docs, split, _ % 3 == 0)
      assert(got == want, s"trial $trial:\n got=$got\nwant=$want\ndocs=$docs")
      // re-admission must actually fire: some delta doc matches ONLY
      // deleted snapshot docs and therefore survives the gate
      val deletedTexts = base.filter(_._1 % 3 == 0).map(_._2).toSet
      val liveTexts = base.filter(_._1 % 3 != 0).map(_._2).toSet
      if (delta.exists { case (_, t) =>
          deletedTexts.contains(t) && !liveTexts.contains(t) })
        readmissionFired = true
    }
    assert(readmissionFired,
      "no trial planted a deleted-partner-only dup — re-admission untested")
  }

  test("deleting ONE copy of a duplicated snapshot text keeps the live copy present") {
    // the multiset case: docs 0 and 1 share a text; 0 is retracted.
    // Counters go 2 -> 1 on the shared cells, so the filter still says
    // present (a clear-the-bits delete would say absent — a FALSE
    // NEGATIVE, the one error class a Bloom gate must never make).
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (10L, "alpha beta gamma"), (11L, "delta epsilon zeta"))
    val all = docs.toDF("doc_id", "text")
      .withColumn("h", sha2(col("text"), 256))
    val snapshot = all.filter(col("doc_id") < 10)
    val cbf = BloomFunctions.counting_bloom(
      snapshot.select(col("h")),
      snapshot.filter(col("doc_id") === 0).select(col("h")), M, K)
    val verdicts = all.filter(col("doc_id") >= 10)
      .withColumn("cand",
        BloomFunctions.counting_might_contain(cbf, col("h"), M, K))
      .select(col("doc_id"), col("cand"))
      .as[(Long, Boolean)].collect().toMap
    assert(verdicts(10L), "live duplicate copy must still test present")
    assert(verdicts(11L), "untouched key must still test present")
    // and the full gate agrees with the exact reference
    assert(gate(docs, 10L, _ == 0L) == reference(docs, 10L, _ == 0L))
  }

  test("retracting every insert folds the filter to empty — everything is novel") {
    import spark.implicits._
    val docs = Seq((0L, "solo text one"), (1L, "solo text two"),
      (10L, "solo text one"), (11L, "brand new"))
    assert(gate(docs, 10L, _ => true) ==
      Seq((10L, "solo text one"), (11L, "brand new")))
  }

  test("no false negatives: every live snapshot text tests present") {
    import spark.implicits._
    val rnd = new scala.util.Random(905531)
    val docs = (0 until 60)
      .map(i => (i.toLong, s"t${rnd.nextInt(25)} u${rnd.nextInt(25)}"))
    val all = docs.toDF("doc_id", "text")
      .withColumn("h", sha2(col("text"), 256))
    val cbf = BloomFunctions.counting_bloom(
      all.select(col("h")),
      all.filter(col("doc_id") % 2 === 0).select(col("h")), M, K)
    val missed = all.filter(col("doc_id") % 2 =!= 0)
      .withColumn("cand",
        BloomFunctions.counting_might_contain(cbf, col("h"), M, K))
      .filter(!col("cand")).count()
    assert(missed == 0, s"$missed live keys tested absent — false negative")
  }
}
