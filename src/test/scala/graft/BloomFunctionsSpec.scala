package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions._

/** Bloom membership expressions (graft.functions.BloomFunctions): the
  * aggregate builds distributed, the probe accepts a scalar-subquery bloom,
  * no false negatives ever, and the prefilter+confirm composition is
  * bit-identical to a plain anti join. */
class BloomFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives: every inserted key hits the filter") {
    val keys = (0L until 1000L).map(i => s"key-$i").toDF("k").repartition(4)
    val bloom = keys.agg(bloom_agg(col("k"), 1000L, 10000L).as("bf")).scalar()
    val misses = keys.filter(!might_contain(bloom, col("k"))).count()
    assert(misses === 0L)
  }

  test("definite-absent verdicts are honest on disjoint keys (fpp small)") {
    val in = (0L until 1000L).map(i => s"in-$i").toDF("k")
    val out = (0L until 1000L).map(i => s"out-$i").toDF("k")
    val bloom = in.agg(bloom_agg(col("k"), 1000L, 20000L).as("bf")).scalar()
    val falsePos = out.filter(might_contain(bloom, col("k"))).count()
    // ~20 bits/item => fpp well under 1%; allow generous slack.
    assert(falsePos < 50L, s"false-positive count $falsePos out of 1000")
  }

  test("empty build side: NULL filter coalesces to definitely-absent, not row loss") {
    val incoming = (0L until 100L).map(i => s"k-$i").toDF("k")
    val empty = incoming.filter(lit(false))
    val bloom = empty.agg(bloom_agg(col("k"), 10L, 100L).as("bf")).scalar()
    // every row is bloom-negative (nothing was ever inserted) — the
    // bootstrap case of incremental dedup must keep the whole batch
    assert(incoming.filter(!might_contain(bloom, col("k"))).count() === 100L)
    assert(incoming.filter(might_contain(bloom, col("k"))).count() === 0L)
  }

  test("prefilter + exact confirm == plain anti join, bit-identical") {
    val all = (0L until 2000L).map(i => (i, s"text-${i % 1500}")).toDF("id", "t")
    val snapshot = all.filter($"id" < 1000).select($"t")
    val incoming = all.filter($"id" >= 1000)

    val plain = incoming.join(snapshot, Seq("t"), "left_anti")
      .select("id", "t")

    val bloom = snapshot.agg(bloom_agg(col("t"), 1000L, 10000L).as("bf")).scalar()
    val flagged = incoming.withColumn("cand", might_contain(bloom, col("t")))
    val novel = flagged.filter(!$"cand").drop("cand")
    val confirmed = flagged.filter($"cand").drop("cand")
      .join(snapshot, Seq("t"), "left_anti")
    val viaBloom = novel.unionByName(confirmed.select("id", "t"))
      .select("id", "t")

    assert(viaBloom.sort("id").collect().toSeq ===
      plain.sort("id").collect().toSeq)
  }
}
