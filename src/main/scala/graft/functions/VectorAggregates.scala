package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregates over embedding vectors (SURVEY.md §2.11 — the engine's
  * UDAF surface; the reference has no user-extensible functions, so this is
  * Tier C machinery serving the similarity/dedup operators).
  *
  * [[VectorMeanAgg]] is a classic partial-aggregatable mean: the buffer is
  * (elementwise double sums, count), `reduce` folds rows map-side, `merge`
  * combines partials at the exchange — so at 100 TB the shuffle carries one
  * fixed-width buffer per (group × partition), never the vectors. This is
  * how real IVF centroids (k-means steps) are computed distributed.
  */
object VectorAggregates {

  type Buf = (Array[Double], Long)

  /** Elementwise mean of array<float> vectors → array<double>. */
  object VectorMeanAgg extends Aggregator[Array[Float], Buf, Array[Double]] {
    override def zero: Buf = (Array.empty[Double], 0L)

    override def reduce(b: Buf, v: Array[Float]): Buf = {
      // zero-length vectors contribute nothing — including to the count.
      // Counting them (while merge drops empty-sums partials) would make
      // the mean depend on which partition the empty vector landed in:
      // same data, different divisor per task layout.
      if (v == null || v.isEmpty) return b
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      val n = math.min(sums.length, v.length)
      while (i < n) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a._1.isEmpty) return b
      if (b._1.isEmpty) return a
      val out = a._1.clone()
      var i = 0
      val n = math.min(out.length, b._1.length)
      while (i < n) { out(i) += b._1(i); i += 1 }
      (out, a._2 + b._2)
    }

    override def finish(b: Buf): Array[Double] =
      if (b._2 == 0) Array.empty else b._1.map(_ / b._2)

    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column-API handle: `df.agg(vector_mean(col("embedding")))`. */
  val vector_mean = udaf(VectorMeanAgg)
}
