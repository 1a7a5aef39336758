package graft

import org.apache.spark.sql.functions.{col, sort_array}

import graft.queries.DedupQueries

/** qb7's claim checked stronger than the serve oracle can see it:
  * build(v0) + merge(v1) + compact(tombstones) must equal a from-scratch
  * build over the LIVE corpus on EVERY index frame — members, DF table,
  * drop list, capped sets, complement postings, band buckets — on random
  * corpora (the IncrementalMinhashPropSpec discipline), with the two
  * compaction-specific hard cases forced: RE-ADMISSION (a shingle hot
  * before the deletes, under the cap after — the frozen-cap debt qaa
  * defers to compaction) and RESURRECTION (a doc absent from `sets`
  * because its every shingle was hot comes back once one un-hots).
  * The compaction never reads the corpus, so any divergence here means
  * the sets ∪ dropped = full-shingle-set invariant broke somewhere in
  * the build/merge/compact chain. */
class MinhashCompactionPropSpec extends SparkSpec {

  private val vocab =
    Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibis", "jay")

  private def randomDoc(rnd: scala.util.Random): String =
    Seq.fill(8 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def mutate(text: String, rnd: scala.util.Random): String = {
    val w = text.split(" ")
    w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
    w.mkString(" ")
  }

  private def frames(p: String): Map[String, Seq[String]] = {
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    Map(
      "members" -> rows(spark.read.parquet(s"$p/members")),
      "dfs" -> rows(spark.read.parquet(s"$p/dfs")),
      "hot" -> rows(spark.read.parquet(s"$p/hot")),
      "sets" -> rows(spark.read.parquet(s"$p/sets")
        .select(col("doc_id"), sort_array(col("sh")).as("sh"))),
      "dropped" -> rows(spark.read.parquet(s"$p/dropped")),
      "buckets" -> rows(spark.read.parquet(s"$p/buckets")))
  }

  test("compact(build + merge + tombstones) equals rebuild(live), frame by frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(9130822)
    var readmissionFired = false
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
        .createTempDirectory(s"graft_mhcompact_$trial").toString
      DedupQueries.buildMinhashIndex(
        spark, base.toDF("doc_id", "text"), s"$root/v0", cap)
      DedupQueries.mergeMinhashIndex(
        spark, batch.toDF("doc_id", "text"), s"$root/v0", s"$root/v1", cap)
      // tombstones from the chain's own manifest (the qb7 rule)
      val tomb = spark.read.parquet(s"$root/v1/members")
        .filter(col("doc_id") % 3 === 0)
      DedupQueries.compactMinhashIndex(
        spark, tomb, s"$root/v1", s"$root/v2", cap)
      val live = (base ++ batch).filter(_._1 % 3 != 0)
      DedupQueries.buildMinhashIndex(
        spark, live.toDF("doc_id", "text"), s"$root/rebuild", cap)
      val got = frames(s"$root/v2")
      val want = frames(s"$root/rebuild")
      for (f <- Seq("members", "dfs", "hot", "sets", "dropped", "buckets"))
        assert(got(f) == want(f),
          s"trial $trial: $f diverges from the live rebuild\n" +
            s" got=${got(f)}\nwant=${want(f)}")
      val oldHot = spark.read.parquet(s"$root/v1/hot")
        .as[String].collect().toSet
      val newHot = spark.read.parquet(s"$root/v2/hot")
        .as[String].collect().toSet
      assert(newHot.subsetOf(oldHot),
        s"trial $trial: deletes can only LOWER DF — a shingle got hot?")
      if (newHot != oldHot) readmissionFired = true
      // no tombstone trace in any compacted frame
      val tombIds = tomb.as[Long].collect().toSet
      assert(tombIds.nonEmpty, s"trial $trial: empty tombstone set")
      for ((f, idCol) <- Seq("members" -> "doc_id", "sets" -> "doc_id",
          "dropped" -> "doc_id", "buckets" -> "mid")) {
        val residue = spark.read.parquet(s"$root/v2/$f")
          .select(col(idCol)).as[Long].collect().toSet.intersect(tombIds)
        assert(residue.isEmpty, s"trial $trial: tombstoned ids $residue in $f")
      }
    }
    assert(readmissionFired,
      "no trial re-admitted a shingle — lower the cap or enlarge corpora")
  }

  test("streamed chain: merge/compact ALTERNATION equals rebuild(live), frame by frame") {
    // qd5's fold order: build v0 → merge(half 1) → compact(sweep 1) →
    // merge(half 2) → compact(sweep 2). The new cases beyond the single
    // compact-after-merge above: a MERGE landing on a COMPACTED
    // generation (its DF table was debited and its hot list re-cut —
    // the merge's append-only-DF assumption must hold relative to THAT
    // state, re-hotting shingles the compaction just re-admitted) and a
    // second compaction landing on the re-merged result. Frame equality
    // against the from-scratch build over the final live corpus is the
    // induction step qd5's oracle measures through the serve.
    import spark.implicits._
    val rnd = new scala.util.Random(4170216)
    var rehotFired = false
    for (trial <- 0 until 4) {
      val nBase = 14 + rnd.nextInt(6)
      val base = (0 until nBase).map(i => (i.toLong, randomDoc(rnd)))
      val delta = (0 until 12).map { i =>
        val id = (nBase + i).toLong
        if (rnd.nextBoolean()) (id, mutate(base(rnd.nextInt(nBase))._2, rnd))
        else (id, randomDoc(rnd))
      }
      val (half1, half2) = delta.partition(_._1 % 2 == 0)
      val cap = 2L
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_mhstream_$trial").toString
      DedupQueries.buildMinhashIndex(
        spark, base.toDF("doc_id", "text"), s"$root/v0", cap)
      DedupQueries.mergeMinhashIndex(
        spark, half1.toDF("doc_id", "text"), s"$root/v0", s"$root/v1", cap)
      // sweep 1: every 3rd id present so far (base ∪ half1)
      val tomb1 = spark.read.parquet(s"$root/v1/members")
        .filter(col("doc_id") % 3 === 0)
      DedupQueries.compactMinhashIndex(
        spark, tomb1, s"$root/v1", s"$root/v2", cap)
      val hotAfterCompact = spark.read.parquet(s"$root/v2/hot")
        .as[String].collect().toSet
      DedupQueries.mergeMinhashIndex(
        spark, half2.toDF("doc_id", "text"), s"$root/v2", s"$root/v3", cap)
      if (spark.read.parquet(s"$root/v3/hot").as[String].collect().toSet
          .diff(hotAfterCompact).nonEmpty) rehotFired = true
      // sweep 2: every 3rd id of the second half (odd delta ids)
      val tomb2 = half2.map(_._1).filter(_ % 3 == 0).toDF("doc_id")
      DedupQueries.compactMinhashIndex(
        spark, tomb2, s"$root/v3", s"$root/v4", cap)
      val live = (base ++ delta).filter(_._1 % 3 != 0)
      DedupQueries.buildMinhashIndex(
        spark, live.toDF("doc_id", "text"), s"$root/rebuild", cap)
      val got = frames(s"$root/v4")
      val want = frames(s"$root/rebuild")
      for (f <- Seq("members", "dfs", "hot", "sets", "dropped", "buckets"))
        assert(got(f) == want(f),
          s"trial $trial: streamed chain $f diverges from the live rebuild\n" +
            s" got=${got(f)}\nwant=${want(f)}")
    }
    assert(rehotFired,
      "no trial re-hotted a shingle across the post-compaction merge — " +
        "lower the cap or enlarge corpora")
  }

  test("a doc emptied by the cap RESURRECTS when its shingle un-hots") {
    // crafted corpus: "ant bee cat" appears in six docs (df 6 > cap 4 →
    // hot), one of which carries NOTHING else — its capped set is empty,
    // so it owns no sets/buckets rows at all. Tombstoning two carriers
    // puts the live DF at 4 ≤ cap: the rebuilt index has the doc back
    // with a one-shingle set, and the compaction must produce exactly
    // that from its dropped postings — without reading any text.
    import spark.implicits._
    val cap = 4L
    val carriers = (0 until 5).map { i =>
      (i.toLong, s"ant bee cat ${vocab(5 + i % 4)} ${vocab(6 + i % 3)} ${vocab(7 + i % 2)}")
    }
    val bare = Seq((5L, "ant bee cat"))
    val docs = carriers ++ bare
    val root = java.nio.file.Files
      .createTempDirectory("graft_mhresurrect").toString
    DedupQueries.buildMinhashIndex(
      spark, docs.toDF("doc_id", "text"), s"$root/v0", cap)
    // the bare doc is a member yet owns no sets row (every shingle hot)
    assert(!spark.read.parquet(s"$root/v0/sets")
      .filter(col("doc_id") === 5).collect().nonEmpty,
      "precondition: the bare doc's capped set should be empty at build")
    val tomb = Seq(0L, 1L).toDF("doc_id")
    DedupQueries.compactMinhashIndex(spark, tomb, s"$root/v0", s"$root/v1", cap)
    DedupQueries.buildMinhashIndex(
      spark, docs.filter(d => d._1 != 0L && d._1 != 1L).toDF("doc_id", "text"),
      s"$root/rebuild", cap)
    assert(frames(s"$root/v1") == frames(s"$root/rebuild"),
      "resurrection case diverges from the live rebuild")
    val resurrected = spark.read.parquet(s"$root/v1/sets")
      .filter(col("doc_id") === 5)
      .select(sort_array(col("sh"))).as[Seq[String]].collect().toSeq
    assert(resurrected == Seq(Seq("ant bee cat")),
      s"the emptied doc must come back with its un-hotted shingle: $resurrected")
  }

  test("compacted serve equals brute force under the RE-CUT cap") {
    // the end-to-end qb7 measure: after compaction the DF cap counts
    // LIVE docs only — the un-frozen half qaa's frozen-cap contract
    // couldn't express. Brute force = capped Jaccard where hot is
    // computed over live base docs (reference(live ∪ delta) — deletes
    // simply gone, which is the whole point of compacting).
    import spark.implicits._
    val rnd = new scala.util.Random(6061344)
    for (trial <- 0 until 3) {
      val nBase = 14 + rnd.nextInt(6)
      val split = nBase.toLong
      val base = (0 until nBase).map(i => (i.toLong, randomDoc(rnd)))
      val delta = (0 until 10).map { i =>
        val id = (nBase + i).toLong
        if (rnd.nextBoolean()) (id, mutate(base(rnd.nextInt(nBase))._2, rnd))
        else (id, randomDoc(rnd))
      }
      val cap = 3L
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_mhcserve_$trial").toString
      DedupQueries.buildMinhashIndex(
        spark, base.toDF("doc_id", "text"), s"$root/v0", cap)
      val tomb = spark.read.parquet(s"$root/v0/members")
        .filter(col("doc_id") % 3 === 0)
      DedupQueries.compactMinhashIndex(
        spark, tomb, s"$root/v0", s"$root/v1", cap)
      val got = DedupQueries.serveMinhashBatch(spark,
          delta.toDF("doc_id", "text"), s"$root/v1")
        .as[(Long, Long, Double, Long)].collect().toSeq
      val liveBase = base.filter(_._1 % 3 != 0)
      val want = reference(liveBase ++ delta, split, cap)
      assert(got == want,
        s"trial $trial:\n got=$got\nwant=$want\nbase=$base\ndelta=$delta")
    }
  }

  /** Brute force with the cap counted over exactly the docs given — the
    * post-compaction measure (contrast IncrementalMinhashPropSpec's
    * frozen-cap `reference`, where dead docs still count). */
  private def reference(docs: Seq[(Long, String)], split: Long,
      cap: Long): Seq[(Long, Long, Double, Long)] = {
    def shingleSet(text: String): Set[String] = {
      val w = text.split(" ")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val baseIds = docs.map(_._1).filter(_ < split)
    val hot = baseIds.flatMap(sets).groupBy(identity)
      .collect { case (sh, occ) if occ.size > cap => sh }.toSet
    val capped = sets.map { case (id, s) => id -> (s -- hot) }
    docs.map(_._1).filter(_ >= split).sorted.flatMap { did =>
      val q = capped(did)
      val matches = baseIds.flatMap { mid =>
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
}
