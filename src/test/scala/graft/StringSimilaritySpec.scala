package graft

import org.apache.spark.sql.functions._
import graft.functions.StringSimilarity
import org.apache.spark.unsafe.types.UTF8String

/** Contracts of the native Jaro–Winkler expression (q9k):
  *   1. the classic literature fixtures score exactly right;
  *   2. metric properties hold on random pairs (symmetry, [0,1] bounds,
  *      self-similarity 1, empty-side 0) — DuckDB's either-side-empty →
  *      0 convention included;
  *   3. the Spark column expression agrees with the direct function on a
  *      real plan (codegen path == interpreted path).
  * Cross-engine parity with DuckDB's jaro_winkler_similarity is proven
  * by the q9k oracle itself (hash compare over every blocked pair that
  * clears the threshold); these tests pin the algebra the oracle relies
  * on.
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic fixtures score exactly") {
    // MARTHA/MARHTA: jaro 17/18, prefix 3 → 0.9611111111111111
    assert(jw("martha", "marhta") === (17.0 / 18 + 0.1 * 3 * (1 - 17.0 / 18)))
    // DIXON/DICKSONX: jaro = (4/5 + 4/8 + 4/4)/3, prefix 2
    val jDixon = (4.0 / 5 + 4.0 / 8 + 1.0) / 3
    assert(jw("dixon", "dicksonx") === jDixon + 0.1 * 2 * (1 - jDixon))
    // window = max(5,5)/2−1 = 1: only r,a,e can match (c,t are out of
    // window), in order → jaro (3/5+3/5+3/3)/3; first bytes differ → no
    // prefix boost despite clearing 0.7
    assert(jw("crate", "trace") === (3.0 / 5 + 3.0 / 5 + 1.0) / 3)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("empty-side convention matches DuckDB: either empty scores 0") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "a") === 0.0)
  }

  test("property: symmetry, bounds, self-similarity on random pairs") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 2000) {
      val a = Seq.fill(rnd.nextInt(14))("abcde "(rnd.nextInt(6))).mkString
      val b = Seq.fill(rnd.nextInt(14))("abcde "(rnd.nextInt(6))).mkString
      val s = jw(a, b)
      assert(s === jw(b, a), s"asymmetric on $a / $b")
      assert(s >= 0.0 && s <= 1.0, s"out of bounds on $a / $b: $s")
      if (a.nonEmpty) assert(jw(a, a) === 1.0)
    }
  }

  test("column expression on a plan agrees with the direct function") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("crate", "trace"), ("", "x"), ("same", "same"))
    val got = pairs.toDF("a", "b")
      .select(StringSimilarity.jaro_winkler(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === pairs.map { case (a, b) => jw(a, b) })
  }
}
