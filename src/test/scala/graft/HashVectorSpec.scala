package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, VectorFunctions}

/** Unit specs for the sketch + vector Catalyst expressions
  * (SURVEY.md §2.12 Tier C building blocks).
  */
class HashVectorSpec extends SparkSpec {
  import spark.implicits._

  test("minhash signature: deterministic, k-long, permutation-invariant") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("d", "c", "b", "a")), // same set, different order
      (3L, Seq("x", "y", "z", "w"))
    ).toDF("id", "toks")
      .select($"id", HashExpressions.minhash_signature($"toks", 32).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == 32)
    assert(rows(1L) == rows(2L)) // set semantics: order doesn't matter
    assert(rows(1L) != rows(3L))
  }

  test("minhash similarity estimate tracks Jaccard") {
    // 75% overlapping token sets → expected signature agreement ≈ 0.6 (J=3/5)
    val a = (1 to 100).map(i => s"tok$i")
    val b = (26 to 125).map(i => s"tok$i") // |∩|=75, |∪|=125 → J=0.6
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      .select($"id", HashExpressions.minhash_signature($"toks", 256).as("sig"))
    val Array(s1, s2) = df.orderBy("id").collect().map(_.getSeq[Long](1))
    val agree = s1.zip(s2).count { case (x, y) => x == y } / 256.0
    assert(math.abs(agree - 0.6) < 0.12, s"estimate $agree vs true 0.6")
  }

  test("simhash: near-identical token lists land at small Hamming distance") {
    val base = (1 to 200).map(i => s"w$i")
    val near = base.updated(7, "CHANGED").updated(100, "ALSO")
    val far = (1 to 200).map(i => s"v$i")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "toks")
      .select($"id", HashExpressions.simhash64($"toks").as("h"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m(1L), m(2L)) <= 12, s"near pair distance ${ham(m(1L), m(2L))}")
    assert(ham(m(1L), m(3L)) >= 16, s"far pair distance ${ham(m(1L), m(3L))}")
  }

  test("fingerprint64: exact content identity") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "hello worlD"))
      .toDF("id", "text")
      .select($"id", HashExpressions.fingerprint64($"text").as("fp"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    assert(m.values.forall(v => v >= 0 && v < (1L << 61) - 1))
  }

  test("cosine_sim / dot_product: interpreted and codegen agree with reference math") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f), Seq(2.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f), Seq(1.0f, 1.0f))
    ).toDF("id", "a", "b")
      .select($"id",
        VectorFunctions.dot_product($"a", $"b").as("dot"),
        VectorFunctions.cosine_sim($"a", $"b").as("cos"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDouble(1) == 2.0)
    assert(math.abs(rows(0).getDouble(2) - 2.0 / (math.sqrt(5) * math.sqrt(5))) < 1e-12)
    assert(math.abs(rows(1).getDouble(2) - 1.0) < 1e-12)
  }

  test("vector ops stay inside whole-stage codegen") {
    // must read a real source: a local relation would be constant-folded
    // by ConvertToLocalRelation before reaching codegen
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(
      VectorFunctions.cosine_sim($"embedding", $"embedding").as("c"))
    // `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_sim"), s"plan lacks codegen:\n$plan")
    val c = df.collect()
    assert(c.nonEmpty && math.abs(c.head.getDouble(0) - 1.0) < 1e-9)
  }

  test("null inputs yield null, not crash") {
    val df = Seq((Option.empty[Seq[String]], Option(Seq("a"))))
      .toDF("a", "b")
      .select(
        HashExpressions.minhash_signature($"a", 8).as("sig"),
        HashExpressions.simhash64($"a").as("sh"))
    assert(df.collect().head == Row(null, null))
  }
}
