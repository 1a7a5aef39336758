package graft

import scala.collection.mutable
import scala.util.Random

import graft.queries.DedupQueries

/** q6z exact duplicated-substring spans vs a driver-side brute force:
  * random small-alphabet corpora (so cross-doc L-grams actually occur)
  * plus planted shared chunks, checked for EXACT span equality — the
  * two-pass hash pre-filter must be invisible in the output, and the
  * island merge must produce maximal spans with the b <= a + L
  * adjacency rule. */
class SubstringSpanPropSpec extends SparkSpec {

  /** brute force: every L-window occurring in >= 2 distinct docs, merged
    * per doc into maximal spans (1-based starts, like the engine). */
  private def reference(docs: Seq[(Long, String)], l: Int): Seq[(Long, Long, Long)] = {
    val owners = mutable.Map.empty[String, mutable.Set[Long]]
    for ((id, t) <- docs; i <- 0 to t.length - l)
      owners.getOrElseUpdate(t.substring(i, i + l), mutable.Set.empty) += id
    val dup = owners.collect { case (g, o) if o.size >= 2 => g }.toSet
    docs.flatMap { case (id, t) =>
      val starts = (0 to t.length - l).filter(i => dup(t.substring(i, i + l)))
        .map(_ + 1) // 1-based
      val spans = mutable.ListBuffer.empty[(Long, Long, Long)]
      var (s0, last) = (-1, -1)
      def flush(): Unit =
        if (s0 > 0) spans += ((id, s0.toLong, (last - s0 + l).toLong))
      for (i <- starts) {
        if (s0 < 0 || i > last + l) { flush(); s0 = i }
        last = i
      }
      flush()
      spans
    }.sortBy(x => (x._1, x._2))
  }

  private def run(docs: Seq[(Long, String)], l: Int): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    DedupQueries
      .exactSubstringSpans(docs.toDF("doc_id", "text"), l)
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
  }

  test("random small-alphabet corpora match the brute force exactly") {
    val rnd = new Random(42)
    for (trial <- 0 until 8) {
      val l = 4 + trial % 3
      val docs = (0L until 24L).map { id =>
        val len = 20 + rnd.nextInt(60)
        id -> Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
      }
      assert(run(docs, l) == reference(docs, l), s"trial $trial (L=$l)")
    }
  }

  test("a planted boilerplate paragraph is flagged in every host doc") {
    val rnd = new Random(7)
    val chunk = "THE-SHARED-BOILERPLATE-PARAGRAPH-XYZ"
    val docs = (0L until 10L).map { id =>
      val noise = Array.fill(40)(('m' + rnd.nextInt(13)).toChar).mkString
      // plant the chunk in docs 2 and 5 at different offsets
      val t =
        if (id == 2L) noise.take(11) + chunk + noise.drop(11)
        else if (id == 5L) chunk + noise
        else noise
      id -> t
    }
    val l = 20
    val got = run(docs, l)
    assert(got == reference(docs, l))
    // both planted docs carry a span covering the full chunk
    val byDoc = got.groupBy(_._1)
    for (id <- Seq(2L, 5L)) {
      val spans = byDoc.getOrElse(id, Nil)
      assert(spans.nonEmpty, s"doc $id: planted chunk not flagged")
      val start = docs.find(_._1 == id).get._2.indexOf(chunk) + 1
      assert(spans.exists(s => s._2 <= start && s._2 + s._3 >= start + chunk.length),
        s"doc $id: no span covers the planted chunk: $spans")
    }
  }

  test("overlapping and exactly-adjacent windows merge; a gap splits") {
    // doc pair shares two separated chunks -> two spans, not one
    val a = "aaaaaaaaaa" // 10 chars, shared
    val b = "bbbbbbbbbb"
    val docs = Seq(
      1L -> (a + "xqzjvwkpty" + b),
      2L -> (a + "mnhgfdsalk" + b))
    val l = 6
    val got = run(docs, l)
    assert(got == reference(docs, l))
    // 'aaaaaaaaaa' windows 1..5 merge to one span [1, 10]; same for the
    // b block at 21..30; the distinct middles stay unflagged
    assert(got.filter(_._1 == 1L) ==
      Seq((1L, 1L, 10L), (1L, 21L, 10L)))
  }

  test("supplementary-plane characters do not shift window positions") {
    // U+1D11E is 2 UTF-16 chars but ONE code point; Spark's substring
    // (pass 2's gram recovery) and length() count code points, so the
    // pass-1 hash windows must too. With char indexing, every window
    // after the clefs lands 3 positions late, pass 2 recovers a
    // misaligned gram for doc 1 only, the cross-doc string verify then
    // disagrees, and the true shared chunk is silently dropped.
    val clef = new String(Character.toChars(0x1D11E))
    val chunk = "SHARED-DUPLICATE-CHUNK"
    val docs = Seq(
      1L -> (clef * 3 + "xxxxx" + chunk + "padpadpad"),
      2L -> ("zzzz" + chunk + clef + "tailtail"))
    val got = run(docs, chunk.length)
    // code-point starts: doc 1 = 3 clefs + 5 x's -> 9; doc 2 = 4 z's -> 5
    assert(got.contains((1L, 9L, chunk.length.toLong)), s"doc 1 span: $got")
    assert(got.contains((2L, 5L, chunk.length.toLong)), s"doc 2 span: $got")
  }

  test("docs shorter than L never explode and never appear") {
    val docs = Seq(1L -> "ab", 2L -> "ab", 3L -> "abcdefghij", 4L -> "abcdefghij")
    val got = run(docs, 8)
    assert(got == Seq((3L, 1L, 10L), (4L, 1L, 10L)))
  }
}
