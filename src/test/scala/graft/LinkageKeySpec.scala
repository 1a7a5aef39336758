package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** qa4's ASCII key normalization (round-9 advice): the multi-pass
  * sorted-neighborhood linkage ranks by reverse(key), and Spark reverses
  * by code point while DuckDB reverses by grapheme cluster — identical
  * only when the key is ASCII. The key projection must therefore STRIP
  * non-ASCII rather than assume its absence, so that a non-ASCII corpus
  * cannot silently diverge engine vs oracle. */
class LinkageKeySpec extends SparkSpec {

  private def keyOf(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(DedupQueries.linkageKey(col("text")).as("key"))
      .head().getString(0)
  }

  test("non-ASCII is stripped: combining marks, emoji ZWJ, supplementary plane") {
    // U+0301 combining accent: grapheme "é" (e + mark) reverses as one
    // cluster in DuckDB but two code points in Spark — must not survive
    assert(keyOf("café menu") == "cafe menu")
    // family emoji: 4 code points joined by ZWJ, one grapheme cluster
    assert(keyOf("a 👨‍👩‍👧 b") == "a  b")
    // supplementary-plane char (surrogate pair in UTF-16)
    assert(keyOf("x𝄞y z") == "xy z")
    // precomposed non-ASCII letters go too — the projection is printable
    // ASCII, not "ASCII-compatible lookalikes"
    assert(keyOf("naïve résumé") == "nave rsum")
  }

  test("printable ASCII passes through; key is first 8 tokens") {
    val eightPlus = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    assert(keyOf(eightPlus) == "t1 t2 t3 t4 t5 t6 t7 t8")
    assert(keyOf("Hello, world! ~tilde~ [ok]") == "Hello, world! ~tilde~ [ok]")
  }

  test("on the normalized key, code-point reverse equals byte reverse") {
    // the property the reverse-ranked pass relies on: after
    // normalization every key char is single-byte single-code-point, so
    // Spark's reverse, DuckDB's reverse and a byte reverse all agree
    for (t <- Seq("café menu x", "a𝄞b c", "plain ascii words")) {
      val k = keyOf(t)
      assert(k.forall(c => c >= ' ' && c <= '~'))
      assert(k.reverse == new String(k.getBytes("US-ASCII").reverse, "US-ASCII"))
    }
  }
}
