package graft

/** SQL-surface spec: the extension-registered functions behave like their
  * Column-API twins (GraftExtensions is active in every GraftSession).
  */
class ExtensionsSpec extends SparkSpec {

  test("engine functions are callable from SQL") {
    val r = spark.sql("""
      SELECT
        word_shingles('a b c d', 3) AS sh,
        size(minhash_signature(array('x','y'), 16)) AS klen,
        simhash64(array('x','y')) AS sh64,
        fingerprint64('abc') AS fp,
        round(cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS cs,
        dot_product(array(2.0F, 3.0F), array(4.0F, 5.0F)) AS dp,
        id_pairs(array(1L, 2L, 3L)) AS pairs
    """).collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getInt(1) == 16)
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 23.0)
    assert(r.getSeq[org.apache.spark.sql.Row](6).length == 3)
  }

  test("SQL and Column API produce identical sketches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "the quick brown fox jumps")).toDF("id", "text")
    df.createOrReplaceTempView("ext_t")
    val viaSql = spark.sql(
      "SELECT simhash64(word_shingles(text, 3)) AS s FROM ext_t")
      .collect().head.getLong(0)
    val viaCol = df.select(
      graft.functions.HashExpressions.simhash64(
        graft.functions.TextExpressions.word_shingles(col("text"), 3)).as("s"))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
  }
}
