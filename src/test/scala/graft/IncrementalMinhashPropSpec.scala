package graft

import org.apache.spark.sql.functions.col

import graft.queries.DedupQueries

/** qa5's incremental MinHash serve replayed against a driver-side
  * brute-force reference on RANDOM corpora (the SubstringSpanPropSpec
  * discipline): planted near-dups and decoys over a tiny vocabulary, a
  * small DF cap so the drop list actually drops, and a full
  * base×delta capped-Jaccard brute force as truth. Catches banding
  * recall misses, drop-list asymmetries (base capped differently from
  * delta), and best-match tie-break drift that the single sf0.01 corpus
  * could leave unexercised. */
class IncrementalMinhashPropSpec extends SparkSpec {

  private val vocab =
    Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibis", "jay")

  /** Random doc: 8-14 words from the tiny vocab (3-gram shingles collide
    * across docs by construction, so the inverted index and DF cap both
    * do real work). */
  private def randomDoc(rnd: scala.util.Random): String =
    Seq.fill(8 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** A near-dup of `text`: mutate one word — usually keeps capped
    * Jaccard high but not always ≥ 0.7, so the threshold is exercised
    * from both sides. */
  private def mutate(text: String, rnd: scala.util.Random): String = {
    val w = text.split(" ")
    w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
    w.mkString(" ")
  }

  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  /** Brute-force reference: snapshot-only DF cap (frozen — deleted docs
    * still count toward it, the qaa contract), capped sets, all
    * LIVE-base×delta Jaccard, best match (max jac, tie → min id). */
  private def reference(docs: Seq[(Long, String)], split: Long, cap: Long,
      dead: Set[Long] = Set.empty): Seq[(Long, Long, Double, Long)] = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val allBaseIds = docs.map(_._1).filter(_ < split)
    // the drop list is FROZEN at build time: dead docs still count
    val hot = allBaseIds.flatMap(sets).groupBy(identity)
      .collect { case (sh, occ) if occ.size > cap => sh }.toSet
    val liveBaseIds = allBaseIds.filterNot(dead)
    val capped = sets.map { case (id, s) => id -> (s -- hot) }
    docs.map(_._1).filter(_ >= split).sorted.flatMap { did =>
      val q = capped(did)
      val matches = liveBaseIds.flatMap { mid =>
        val i = capped(mid)
        val u = (q ++ i).size
        if (u == 0 || q.isEmpty || i.isEmpty) None
        else {
          val jac = (q & i).size.toDouble / u
          if (jac >= 0.7) Some((mid, jac)) else None
        }
      }
      if (matches.isEmpty) None
      else {
        val (bm, bj) = matches.maxBy { case (mid, j) => (j, -mid) }
        Some((did, bm,
          BigDecimal(bj).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          matches.size.toLong))
      }
    }
  }

  test("merged index generation equals a from-scratch rebuild, frame by frame") {
    // qa8's claim, checked stronger than the serve oracle can: every
    // index FRAME (drop list, capped sets, band buckets) of
    // build(v0) + merge(batch) must equal build(base ∪ batch) — not
    // just the answers a particular probe batch happens to touch. Low
    // cap so the merge's hard case fires: shingles crossing the cap
    // only once the batch lands must drop out of EXISTING sets and
    // those docs must re-sign.
    import spark.implicits._
    val rnd = new scala.util.Random(8251031)
    var hardCaseFired = false
    for (trial <- 0 until 4) {
      val nBase = 14 + rnd.nextInt(6)
      val nBatch = 10 + rnd.nextInt(5)
      val base = (0 until nBase).map(i => (i.toLong, randomDoc(rnd)))
      val batch = (0 until nBatch).map { i =>
        val id = (nBase + i).toLong
        if (rnd.nextBoolean()) (id, mutate(base(rnd.nextInt(nBase))._2, rnd))
        else (id, randomDoc(rnd))
      }
      val cap = 2L
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_mhmerge_$trial").toString
      DedupQueries.buildMinhashIndex(
        spark, base.toDF("doc_id", "text"), s"$root/v0", cap)
      DedupQueries.mergeMinhashIndex(
        spark, batch.toDF("doc_id", "text"), s"$root/v0", s"$root/v1", cap)
      DedupQueries.buildMinhashIndex(
        spark, (base ++ batch).toDF("doc_id", "text"), s"$root/rebuild", cap)
      def hot(p: String) = spark.read.parquet(s"$p/hot")
        .as[String].collect().sorted.toSeq
      def sets(p: String) = spark.read.parquet(s"$p/sets")
        .select(col("doc_id"),
          org.apache.spark.sql.functions.sort_array(col("sh")).as("sh"))
        .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
      def buckets(p: String) = spark.read.parquet(s"$p/buckets")
        .as[(Long, Int, Long)].collect().sorted.toSeq
      assert(hot(s"$root/v1") == hot(s"$root/rebuild"),
        s"trial $trial: drop lists diverge")
      assert(sets(s"$root/v1") == sets(s"$root/rebuild"),
        s"trial $trial: capped sets diverge")
      assert(buckets(s"$root/v1") == buckets(s"$root/rebuild"),
        s"trial $trial: band buckets diverge — a changed set kept its old signature?")
      if ((hot(s"$root/v1").toSet -- hot(s"$root/v0").toSet).nonEmpty)
        hardCaseFired = true
    }
    // the merge's hard case (a shingle crossing the cap only once the
    // batch lands) must actually fire somewhere across the trials, or
    // this test proves nothing about the set-fix/re-sign path
    assert(hardCaseFired,
      "no trial produced a newly-hot shingle — lower the cap or enlarge corpora")
  }

  test("a CHAIN of merges equals one rebuild (generation associativity)") {
    // merge(merge(build(base), b1), b2) must equal build(base ∪ b1 ∪ b2):
    // the property that lets a pipeline absorb batches one at a time
    // forever without drifting from the rebuild semantics — and the
    // contract the streaming maintenance drain (q8r) relies on per
    // micro-batch. Cap-crossing can happen at EITHER merge here.
    import spark.implicits._
    val rnd = new scala.util.Random(4170212)
    for (trial <- 0 until 3) {
      val nBase = 12 + rnd.nextInt(5)
      def mkBatch(n: Int, off: Long, pool: Seq[(Long, String)]) =
        (0 until n).map { i =>
          val id = off + i
          if (rnd.nextBoolean() && pool.nonEmpty)
            (id, mutate(pool(rnd.nextInt(pool.size))._2, rnd))
          else (id, randomDoc(rnd))
        }
      val base = (0 until nBase).map(i => (i.toLong, randomDoc(rnd)))
      val b1 = mkBatch(8, nBase.toLong, base)
      val b2 = mkBatch(8, nBase.toLong + 8, base ++ b1)
      val cap = 2L
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_mhchain_$trial").toString
      DedupQueries.buildMinhashIndex(
        spark, base.toDF("doc_id", "text"), s"$root/v0", cap)
      DedupQueries.mergeMinhashIndex(
        spark, b1.toDF("doc_id", "text"), s"$root/v0", s"$root/v1", cap)
      DedupQueries.mergeMinhashIndex(
        spark, b2.toDF("doc_id", "text"), s"$root/v1", s"$root/v2", cap)
      DedupQueries.buildMinhashIndex(
        spark, (base ++ b1 ++ b2).toDF("doc_id", "text"), s"$root/rebuild", cap)
      // sets' array order is representation detail (collect_set vs
      // array_except) — normalize by sorting before the set compare
      def frame(p: String, f: String) = {
        val d = spark.read.parquet(s"$p/$f")
        if (f == "sets")
          d.select(col("doc_id"),
            org.apache.spark.sql.functions.sort_array(col("sh")).as("sh"))
        else d
      }
      for (f <- Seq("hot", "sets", "buckets")) {
        val chained = frame(s"$root/v2", f)
        val rebuilt = frame(s"$root/rebuild", f)
        assert(chained.exceptAll(rebuilt).isEmpty &&
          rebuilt.exceptAll(chained).isEmpty,
          s"trial $trial: $f diverges after two chained merges")
      }
    }
  }

  test("tombstoned serve equals brute force restricted to live docs (frozen cap)") {
    // the qaa contract: deleted snapshot docs stop matching while the
    // drop list keeps counting them (frozen at build time) — both sides
    // of that asymmetry are on the line here
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c, lit, pmod}
    val rnd = new scala.util.Random(70331216)
    for (trial <- 0 until 3) {
      val nBase = 14 + rnd.nextInt(6)
      val split = nBase.toLong
      val base = (0 until nBase).map(i => (i.toLong, randomDoc(rnd)))
      val delta = (0 until 10).map { i =>
        val id = (nBase + i).toLong
        if (rnd.nextBoolean()) (id, mutate(base(rnd.nextInt(nBase))._2, rnd))
        else (id, randomDoc(rnd))
      }
      val docs = base ++ delta
      val dead = base.map(_._1).filter(_ % 3 == 0).toSet
      val cap = 3L
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_incmhdel_$trial").toString
      DedupQueries.buildMinhashIndex(
        spark, docs.toDF("doc_id", "text").filter(c("doc_id") < split),
        tmp, cap)
      val tomb = docs.toDF("doc_id", "text")
        .filter(c("doc_id") < split && pmod(c("doc_id"), lit(3)) === 0)
        .select(c("doc_id"))
      val got = DedupQueries.serveMinhashBatch(spark,
          docs.toDF("doc_id", "text").filter(c("doc_id") >= split),
          tmp, Some(tomb))
        .as[(Long, Long, Double, Long)].collect().toSeq
      val want = reference(docs, split, cap, dead)
      assert(got == want,
        s"trial $trial (dead=$dead):\n got=$got\nwant=$want\ndocs=$docs")
    }
  }

  test("engine serve equals brute force on random corpora (planted dups, low DF cap)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20261014)
    for (trial <- 0 until 5) {
      val nBase = 12 + rnd.nextInt(8)
      val nDelta = 8 + rnd.nextInt(6)
      val split = nBase.toLong
      val base = (0 until nBase).map(i => (i.toLong, randomDoc(rnd)))
      val delta = (0 until nDelta).map { i =>
        val id = (nBase + i).toLong
        // half the incoming docs are mutations of snapshot docs, half fresh
        if (rnd.nextBoolean()) (id, mutate(base(rnd.nextInt(nBase))._2, rnd))
        else (id, randomDoc(rnd))
      }
      val docs = base ++ delta
      val cap = 3L // tiny cap: the drop list drops real shingles here
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_incmh_$trial").toString
      val got = DedupQueries.incrementalMinhash(
          spark, docs.toDF("doc_id", "text"), tmp, split, cap)
        .as[(Long, Long, Double, Long)].collect().toSeq
      val want = reference(docs, split, cap)
      assert(got == want,
        s"trial $trial (split=$split cap=$cap):\n got=$got\nwant=$want\ndocs=$docs")
    }
  }
}
