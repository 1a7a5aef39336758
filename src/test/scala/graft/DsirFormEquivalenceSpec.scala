package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.queries.TextAnalysis

/** qa1 and q8p compute the SAME DSIR weights through different plans —
  * qa1 relationally (explode features, join the term table, group per
  * doc), q8p row-locally (model folded to a map, one aggregate HOF).
  * The streaming form's correctness argument is exactly this
  * equivalence, so it gets checked on random corpora (not just the
  * oracle corpus): random token streams over random vocabularies, with
  * docs that exercise the unseen-bucket fallback (tokens absent from
  * the training slice). */
class DsirFormEquivalenceSpec extends SparkSpec {

  test("row-local map scoring equals the relational form on random corpora") {
    import spark.implicits._
    val rnd = new Random(99)
    for (trial <- 0 until 4) {
      val vocabTrain = (0 until 30).map(i => s"w${rnd.nextInt(200)}x$i")
      val vocabServe = vocabTrain ++ (0 until 10).map(i => s"UNSEEN${i}q$trial")
      def doc(id: Long, vocab: Seq[String]): (Long, String, String) = {
        val n = 2 + rnd.nextInt(12)
        (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "),
          if (id % 3 == 0) "src0" else s"src${1 + id % 4}")
      }
      val train = (0L until 40L).map(doc(_, vocabTrain))
        .toDF("doc_id", "text", "source")
      val serve = (100L until 130L).map(doc(_, vocabServe))
        .toDF("doc_id", "text", "source")

      // relational form (qa1's shape), trained on `train`, scoring `serve`
      val fe = TextAnalysis.dsirFeatures(train)
      val term = TextAnalysis.dsirTermTable(fe)
      val sfe = TextAnalysis.dsirFeatures(serve)
      // unseen buckets fall back to the prior — replicate with a left
      // join + coalesce, like the q8p oracle
      val model = TextAnalysis.dsirModelFrame(train)
      val prior = model.select("prior").as[java.math.BigDecimal].head()
      val relational = sfe.join(term, Seq("f"), "left")
        .withColumn("term", coalesce(col("term"), lit(prior)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"), sum(col("term")).as("w"))
        .select(col("doc_id"), col("n_feats"),
          round(col("w").cast("double"), 6).as("logw"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

      // row-local form (q8p's shape): broadcast model row + aggregate HOF
      val rowLocal = TextAnalysis.dsirScoreCols(
          serve.withColumn("k", lit(1))
            .join(broadcast(model.withColumn("k", lit(1))), Seq("k")))
        .select(col("doc_id"), col("n_feats"), col("logw"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

      assert(rowLocal == relational, s"trial $trial: forms diverged")
      // the fallback path must actually have fired (UNSEEN tokens exist)
      assert(rowLocal.nonEmpty)
    }
  }
}
