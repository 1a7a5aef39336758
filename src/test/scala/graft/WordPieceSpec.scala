package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece

/** Unit semantics of the WordPiece trainer and MaxMatch encoder (the
  * oracle gate runs the full three-round train + corpus encode; these
  * pin the local contracts on hand-built frames where the right answer
  * is checkable by eye). */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("likelihood score picks a rarer-unit pair over the raw-count argmax") {
    // 'xy' appears in every word (pair count 8) but x and y are
    // everywhere too; 'qz' appears only twice but q and z appear ONLY
    // there, so score(q,z) = 2/(2*2) = 0.5 beats
    // score(x,y) = 8/(ff * ff) for the frequent units. BPE (q90's rule)
    // would pick the raw-count winner; WordPiece must not.
    val d = docsDF(
      1L -> "xya xyb xyc xyd qz",
      2L -> "xye xyf xyg xyh qz")
    val first = WordPiece.train(d).filter(col("rnd") === 1)
      .select("left_tok", "right_tok").as[(String, String)].head()
    assert(first == ("q" -> "z"))
  }

  test("maxMatch takes the longest piece at each cursor position") {
    // vocab pieces: bcd, ab. Word "abcd_": at pos 0 only "ab" matches
    // (maxMatch never reconsiders "bcd" which starts inside the match
    // it took), then c, d, _ as single chars -> 4 tokens. A
    // longest-piece-global-replace would have taken "bcd" (3 > 2) and
    // produced [a, bcd, _] = 3 tokens — the spec witnesses that
    // MaxMatch is positional, not global.
    val withPieces = Seq(("abcd", 1L, "bcd", "ab", "zzzzz"))
      .toDF("word", "wf", "p1", "p2", "p3")
    val r = WordPiece.maxMatch(withPieces)
      .select("n_units", "n_tokens").as[(Long, Long)].head()
    assert(r == (5L -> 4L))
  }

  test("maxMatch differs from BPE merge replay on the classic witness") {
    // pieces {ab, bc}: word "abc_". MaxMatch: ab + c + _ = 3 tokens.
    // BPE replay with merge order (b,c) first would give a + bc + _ —
    // same count here, so use the stronger case: pieces {b c merged
    // as 'bc'} only. MaxMatch on "abc_": a, bc, _ = 3. Replay of merge
    // (a,b) then... we instead check the length-priority case directly:
    // pieces {abc, ab}: MaxMatch takes abc (longest at pos 0).
    val withPieces = Seq(("abc", 1L, "ab", "abc", "zzzzz"))
      .toDF("word", "wf", "p1", "p2", "p3")
    val r = WordPiece.maxMatch(withPieces)
      .select("n_tokens").as[Long].head()
    // abc + _ = 2 tokens, NOT ab + c + _ = 3
    assert(r == 2L)
  }

  test("every word encodes to at least one piece and unit totals are exact") {
    val d = docsDF(
      1L -> "the cat sat on the mat",
      2L -> "concatenate all the pieces")
    val enc = WordPiece.encodeCorpus(d)
    val bad = enc.filter(col("n_tokens") <= 0 || col("n_units") <= 0 ||
      col("n_tokens") > col("n_units"))
    assert(bad.isEmpty, bad.collect().mkString(","))
    // n_units = sum of (len(word) + 1) over kept words, independently
    val expected = d
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("w"))
      .filter(length(col("w")) <= WordPiece.MaxWordLen)
      .agg(sum(length(col("w")) + 1)).as[Long].head()
    val got = enc.agg(sum(col("n_units"))).as[Long].head()
    assert(got == expected)
  }

  test("training merges chain: round 2 can merge a round-1 piece") {
    // Force round 1 to merge (q,z); corpus where 'qz' then pairs with
    // 'w' often enough relative to unit freqs that multi-round chains
    // build a 3-char piece — we only assert the mechanism: round 2+3
    // winners exist and their applied pieces are consistent strings.
    val d = docsDF(
      1L -> "qzw qzw qzw qzw aa bb",
      2L -> "qzw qzw qzw qzw cc dd")
    val rows = WordPiece.train(d).collect()
    assert(rows.length == WordPiece.Rounds)
    val pieces = WordPiece.pieceFrame(d).collect().head
    // every trained piece is non-empty and multi-char
    (0 until WordPiece.Rounds).foreach { i =>
      assert(pieces.getString(i).length >= 2)
    }
  }
}
