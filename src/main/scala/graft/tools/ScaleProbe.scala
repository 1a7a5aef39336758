package graft.tools

import graft.GraftSession
import graft.functions.{HashExpressions, TextExpressions, VectorFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 corpus Nx (ids offset per copy) and
  * time the dedup/similarity scale paths, to observe how the pipelines
  * behave when data grows 10x while the machine stays fixed — the
  * local-mode proxy for the 100 TB question. Replication multiplies
  * near-dup pairs too (every copy collides with every other), which
  * stresses candidate generation superlinearly — a worst-case probe, not a
  * realistic corpus.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe [copies]"
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCol: String, copies: Int,
      stride: Long): DataFrame =
    df.withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn(idCol, col(idCol) + col("copy") * stride)
      .drop("copy")

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    // "assign" as 2nd arg: skip the document stages and probe only the
    // IVF assignment comparison (fast iteration on the q66-vs-q5c trade);
    // "bloom" probes only the incremental-dedup comparison (q6b vs q6g)
    val assignOnly = args.length > 1 && args(1) == "assign"
    val bloomOnly = args.length > 1 && args(1) == "bloom"
    // "cc" probes only connected components: chain (diameter = N, the
    // boilerplate-corpus adversary) vs clustered (near-dup families,
    // diameter ~2) topologies — rounds and wall must stay logarithmic on
    // the chain now that the operator pointer-jumps
    val ccOnly = args.length > 1 && args(1) == "cc"
    // "kmeans" probes the per-iteration cost of the full index build
    // (q5k): each Lloyd round is one broadcast + one hash-agg shuffle, so
    // rounds should cost the same and scale linearly in N
    val kmeansOnly = args.length > 1 && args(1) == "kmeans"
    // "annsweep" probes the IVF recall-vs-cost curve (nprobe sweep at two
    // corpus scales); "deltacc" probes incremental CC (cost must scale
    // with |delta|, not |corpus|)
    val annsweepOnly = args.length > 1 && args(1) == "annsweep"
    val deltaccOnly = args.length > 1 && args(1) == "deltacc"
    // "pq" probes ADC lookup-table scoring recall vs exact dot top-5
    val pqOnly = args.length > 1 && args(1) == "pq"
    val spark: SparkSession = GraftSession.local(8)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    // incremental dedup at scale: plain anti join (q6b shape) vs bloom
    // prefilter (q6g shape), on an APPEND-MOSTLY incoming batch (95% new
    // texts — the regime the bloom path is built for). The plain join
    // shuffles every incoming hash; the bloom path settles bloom-negative
    // rows at scan time and joins only candidates (true dups + fpp tail).
    // The probe runs q6g's stated regime — append-mostly ingest: incoming
    // ≫ snapshot, snapshot ABOVE the broadcast threshold (a broadcastable
    // snapshot makes the plain anti join broadcast-cheap and the
    // comparison moot). Two outputs matter and they diverge locally:
    //   - exchange volume (the 100 TB metric): the plain join shuffles
    //     every incoming hash; the bloom path shuffles only candidates —
    //     the probe prints both row counts;
    //   - local wall-clock: local[n] shuffles are RAM-speed, so the
    //     sketch build + second incoming scan are only repaid once the
    //     incoming side is large; on a cluster the saved NETWORK shuffle
    //     dominates far earlier.
    def bloomProbe(): Unit = {
      import graft.functions.BloomFunctions
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      // snapshot: copies/8 × the corpus, texts salted unique (" s")
      val snapCopies = math.max(1, copies / 8)
      val snapshot = replicate(base, "doc_id", snapCopies, 1000000L)
        .select(sha2(concat(col("text"), lit(" s"), col("doc_id")), 256).as("h"))
        .cache()
      val snapN = snapshot.count()
      // BloomFilterAggregate rejects numBits above the session's
      // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (default 64M
      // bits); at 10 bits/key that caps out near a 6.7M-row snapshot —
      // exactly the large-`copies` regime this probe exists to measure —
      // so clamp instead of aborting (fpp degrades gracefully past the
      // clamp; the confirm join keeps results exact regardless)
      val maxNumBits = spark.conf.getOption(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
        .map(_.toLong).getOrElse(67108864L)
      val numBits = math.min(snapN * 10L, maxNumBits)
      // incoming: copies × the corpus — rows whose id lands inside the
      // snapshot's id range AND carries the " s" salt collide (≈5%/8),
      // the rest are genuinely new
      val incoming = replicate(base, "doc_id", copies, 1000000L)
        .select(col("doc_id"), sha2(concat(col("text"),
          when(pmod(col("doc_id"), lit(20)) === 0 &&
            col("doc_id") < snapCopies * 1000000L, lit(" s"))
            .otherwise(lit(" u")),
          col("doc_id")), 256).as("h"))
        .cache()
      println(s"[scale] bloom probe: snapshot=$snapN incoming=${incoming.count()}")
      time(s"incr dedup plain anti join (${copies}x)")(
        println(s"[scale]   new=" +
          incoming.join(snapshot, Seq("h"), "left_anti").count() +
          s" (shuffled ${incoming.count() + snapN} rows)"))
      time(s"incr dedup bloom prefilter (${copies}x)") {
        val bloom = snapshot
          .agg(BloomFunctions.bloom_agg(col("h"), snapN, numBits).as("bf"))
          .scalar()
        val flagged = incoming
          .withColumn("cand", BloomFunctions.might_contain(bloom, col("h")))
        val novel = flagged.filter(!col("cand")).select("doc_id")
        val confirmed = flagged.filter(col("cand"))
          .join(snapshot, Seq("h"), "left_anti").select("doc_id")
        // one action, same union shape as q6g
        println(s"[scale]   new=" + novel.unionByName(confirmed).count())
      }
      println(s"[scale]   bloom_candidates=" + incoming.filter(
        BloomFunctions.might_contain(
          snapshot.agg(BloomFunctions.bloom_agg(col("h"), snapN, numBits)
            .as("bf")).scalar(),
          col("h"))).count() +
        s" of ${incoming.count()} reached the confirm join " +
        s"(shuffle rows: candidates + $snapN snapshot)")
      incoming.unpersist(); snapshot.unpersist()
    }
    // "pagerank" probes per-round cost vs graph size: each round is one
    // (dst, contrib) shuffle + hash agg + a scalar dangling-mass agg, so
    // extra rounds should cost the same each and the per-round cost
    // should scale linearly in |E|
    val pagerankOnly = args.length > 1 && args(1) == "pagerank"
    // "prefixsum" probes StableIds.runningTotal vs the naive global
    // window: SUM() OVER (ORDER BY) funnels every row through ONE task
    // while the two-phase shape keeps all partitions busy — the
    // q0d-class single-task-bottleneck comparison, measured
    val prefixsumOnly = args.length > 1 && args(1) == "prefixsum"
    // "prefixjoin" probes the lossless prefix-filtered Jaccard join
    // (q6r): equality vs naive on a subset, growth vs the DF-capped
    // inverted index as the corpus replicates
    val prefixjoinOnly = args.length > 1 && args(1) == "prefixjoin"
    // "triangle" probes degree-ordered orientation (q6q) vs the naive
    // neighbor-pairs wedge join on a hub-skewed graph — the Σdeg² blowup
    // the orientation exists to prevent, measured
    val triangleOnly = args.length > 1 && args(1) == "triangle"

    if (pagerankOnly) {
      import graft.operators.PageRank
      for (mult <- Seq(1, 8)) {
        val n = 5000L * copies * mult
        val nodes = spark.range(n).toDF("id")
        val edges = nodes
          .select(col("id").as("src"),
            explode(sequence(lit(0), lit(2))).as("i"))
          .select(col("src"),
            ((col("src") * lit(2654435761L) + col("i") * lit(40503241L))
              % 999983L % lit(n)).as("dst"))
          .filter(col("dst") =!= col("src") && col("src") % 37 =!= 5)
          .distinct()
          .cache()
        val ne = edges.count()
        for (iters <- Seq(1, 3)) {
          time(s"pagerank n=$n |E|=$ne iters=$iters") {
            val r = PageRank.run(nodes, edges, iters)
            println(f"[scale]   mass=${r.agg(sum(col("pr"))).head.getDouble(0)}%.6f")
          }
        }
        edges.unpersist()
      }
      spark.stop(); return
    }

    if (prefixsumOnly) {
      import graft.operators.StableIds
      val n = 2000000L * copies
      val df = spark.range(n).toDF("k")
        .withColumn("v", pmod(col("k") * 2654435761L, lit(97)))
        .cache()
      df.count()
      time(s"naive global window SUM() OVER (ORDER BY) n=$n") {
        val w = Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, -1)
        println(s"[scale]   max_prefix=" + df
          .withColumn("b", coalesce(sum(col("v")).over(w), lit(0L)))
          .agg(max(col("b"))).head.getLong(0))
      }
      time(s"StableIds.runningTotal (two-phase) n=$n") {
        println(s"[scale]   max_prefix=" + StableIds
          .runningTotal(df, Seq(col("k")), col("v"), 32)
          .agg(max(col("running_before"))).head.getLong(0))
      }
      df.unpersist()
      spark.stop(); return
    }

    if (prefixjoinOnly) {
      import graft.queries.DedupQueries
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // equality check on a subset small enough for the naive O(N²) join:
      // lossless means prefix-filtered == naive, pair for pair
      val sub = docs0.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), TextExpressions.word_shingles(col("text"), 3).as("sh"))
        .cache()
      val nSub = sub.count()
      val naivePairs = time(s"naive all-pairs join n=$nSub") {
        val a = sub.select(col("doc_id").as("ia"), col("sh").as("sa"))
        val b = sub.select(col("doc_id").as("ib"), col("sh").as("sb"))
        a.join(b, col("ia") < col("ib"))
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
          .filter(col("inter") * 1.0 /
            (size(col("sa")) + size(col("sb")) - col("inter")) >= 0.7)
          .count()
      }
      val prefixPairsSub = time(s"prefix-filtered join n=$nSub") {
        DedupQueries.prefixJaccardPairs(sub).count()
      }
      println(s"[scale] lossless check: naive=$naivePairs prefix=$prefixPairsSub " +
        s"equal=${naivePairs == prefixPairsSub}")
      sub.unpersist()
      // growth: prefix-filtered (lossless) vs DF-capped inverted index
      // (recall trade) as the corpus replicates — replication is the
      // worst case (every copy is an exact dup of every other)
      for (mult <- Seq(1, 4)) {
        val d = replicate(docs0, "doc_id", mult, 10000000L)
          .select(col("doc_id"),
            TextExpressions.word_shingles(col("text"), 3).as("sh"))
          .cache()
        val n = d.count()
        val np = time(s"prefix-filtered lossless join n=$n") {
          DedupQueries.prefixJaccardPairs(d).count()
        }
        val nc = time(s"DF-capped inverted-index join n=$n") {
          DedupQueries.jaccardPairsRaw(d).count()
        }
        println(s"[scale]   pairs: prefix=$np capped=$nc (lossless ≥ capped)")
        d.unpersist()
      }
      spark.stop(); return
    }

    // "tombshard": broadcast vs shuffle-hash tombstone anti join as the
    // id set grows through Tombstones.MaxBroadcast — measures the
    // crossover the degrade path exists for (small sets: broadcast wins,
    // no corpus shuffle; past the cap: broadcast would OOM, the sharded
    // join pays one corpus shuffle and stays flat in tombstone count)
    if (args.length > 1 && args(1) == "tombshard") {
      import graft.operators.Tombstones
      // corpus frame: copies × a synthetic (doc_id, payload) table —
      // wide enough that the anti join dominates, ids dense
      val n = 2000000L * math.max(1, copies / 4)
      val corpus = spark.range(n).select(col("id").as("doc_id"),
        sha2(concat(lit("p"), col("id")), 256).as("payload"))
        .cache()
      corpus.count()
      for (tn <- Seq(10000L, 100000L, 1000000L, 4000000L, 8000000L)
          if tn <= n) {
        // every `stride`-th id dead → tn tombstones spread over the corpus
        val stride = math.max(1L, n / tn)
        val tomb = spark.range(tn).select((col("id") * stride).as("doc_id"))
        for ((label, cap) <- Seq(
            ("broadcast", Long.MaxValue), ("shard", 0L))
            // never force a broadcast PAST the contract's cap — that is
            // the OOM the helper exists to avoid; measure it only below
            if !(label == "broadcast" && tn > Tombstones.MaxBroadcast)) {
          time(f"tombshard $label%-9s corpus=$n tomb=$tn") {
            println(s"[scale]   survivors=" + Tombstones
              .joinWith(corpus, "doc_id", tomb, "left_anti", Some(tn),
                maxBroadcast = cap)
              .count())
          }
        }
      }
      corpus.unpersist()
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "incmh") {
      // qa5's incremental near-dup split: per-batch cost of SERVING a
      // fixed incoming batch against a persisted snapshot index vs the
      // non-incremental alternative (rebuild the index per batch — what
      // a pipeline without the build/serve split pays). The snapshot
      // grows 1x → 4x → 16x while the batch stays fixed: the rebuild
      // cost must grow with the snapshot (it re-shingles and re-signs
      // everything), while serve pays only the index SCAN growth —
      // the amortization that makes the operator viable on a 100 TB
      // standing corpus with a per-hour ingest batch.
      import graft.queries.DedupQueries
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val batch = docs0.filter(col("doc_id") >= 250)
        .withColumn("doc_id", col("doc_id") + 100000000L).cache()
      println(s"[scale] fixed incoming batch: ${batch.count()} docs")
      for (mult <- Seq(1, 4, 16)) {
        val base = replicate(docs0, "doc_id", mult, 10000000L).cache()
        val n = base.count()
        val p = s"/tmp/graft_scale_incmh_$mult"
        val build = time(s"index build (snapshot n=$n)") {
          DedupQueries.buildMinhashIndex(spark, base, p)
        }
        val served = time(s"serve fixed batch vs snapshot n=$n") {
          DedupQueries.serveMinhashBatch(spark, batch, p).count()
        }
        println(s"[scale]   snapshot=$n matches=$served — per-batch " +
          "incremental cost = serve only; per-batch naive cost = " +
          "build + serve")
        base.unpersist()
      }
      batch.unpersist()
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "linkage") {
      // q9k's sorted-neighborhood linkage vs the round-8 (lang,
      // length-bucket) block join it replaced: block count is
      // corpus-INDEPENDENT (O(langs × buckets)), so block population —
      // and the within-block pair join — grows linearly with the corpus
      // and candidates grow QUADRATICALLY; the sorted-neighborhood
      // window generates exactly N·W candidates — linear by
      // construction. Replication is the worst case for blocking (every
      // copy lands in its original's block) and a no-op for the window
      // bound.
      import graft.queries.DedupQueries
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val k = replicate(docs0, "doc_id", mult, 10000000L)
          .select(col("doc_id"), col("lang"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("key"))
          .cache()
        val n = k.count()
        val blockCand = time(s"block-join candidates n=$n") {
          val b = k.withColumn("lb", floor(length(col("key")) / 4))
          b.select(col("doc_id").as("ia"), col("lang"), col("lb"))
            .join(b.select(col("doc_id").as("ib"), col("lang"), col("lb")),
              Seq("lang", "lb"))
            .filter(col("ia") < col("ib")).count()
        }
        val snmScored = time(s"sorted-neighborhood linkage n=$n") {
          DedupQueries.sortedNeighborhoodLinkage(k).count()
        }
        println(s"[scale]   candidates: block=$blockCand (quadratic) " +
          s"snm=${n * 10} hard bound (linear); snm matched pairs=$snmScored")
        k.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "drain") {
      // The streaming-drain cost model, measured: 27% of the round-10
      // bench total was q8x micro-batch machinery, with the claim
      // "fixed per-trigger cost, amortizes at real volumes" asserted
      // but never measured. This mode drains a GraftDoc CDC source
      // (8 commits, maxCommitsPerTrigger=1 → 8 triggers) at batch
      // sizes spanning 3 decades and prints per-trigger seconds: the
      // fixed term is the flat floor at small batches; the data term
      // is the slope that only emerges at 100k+ rows/batch. Stateless
      // (foreachBatch count) and stateful (update-mode groupBy into a
      // memory sink, state store machinery included) are measured
      // separately — the stateful floor is the one the q8x drains pay.
      import graft.connector.GraftDoc
      import org.apache.spark.sql.streaming.Trigger
      val commits = 8
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      for (batchRows <- Seq(100L, 1000L, 10000L, 100000L)) {
        val tmp = graft.TempDirs.create(s"graft_drain_$batchRows")
        for (w <- 0 until commits)
          GraftDoc.write(
            spark.range(batchRows)
              .select((col("id") + w * batchRows).as("k"),
                pmod(col("id"), lit(97L)).as("v")),
            "k", s"$tmp/src")
        def drainWall(stateful: Boolean): Double = {
          val ckpt = java.nio.file.Files
            .createTempDirectory(s"graft_drain_ck").toFile
          val src = GraftDoc
            .readStream(spark, s"$tmp/src", maxCommitsPerTrigger = Some(1L))
            .select(col("_id").cast("long").as("k"), col("v"))
          val t0 = System.nanoTime()
          val q =
            if (stateful)
              src.groupBy(pmod(col("k"), lit(64L)).as("g"))
                .agg(count(lit(1)).as("n"),
                  sum(col("v")).as("sv"))
                .writeStream.format("memory")
                .queryName(s"drain_${batchRows}_$stateful")
                .outputMode("complete")
                .option("checkpointLocation", ckpt.getAbsolutePath)
                .trigger(Trigger.AvailableNow()).start()
            else
              src.writeStream
                .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
                  b.groupBy().count().head(); ()
                }
                .option("checkpointLocation", ckpt.getAbsolutePath)
                .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          (System.nanoTime() - t0) / 1e9
        }
        drainWall(stateful = false) // codegen/source warmup, untimed
        val sl = drainWall(stateful = false)
        val sf2 = drainWall(stateful = true)
        println(f"[scale]   drain rows/trigger=$batchRows%7d x$commits: " +
          f"stateless ${sl / commits}%.3fs/trigger, " +
          f"stateful ${sf2 / commits}%.3fs/trigger")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "suffix") {
      // qau: prefix-doubling suffix ranking must scale LINEARLY in total
      // corpus characters — each round is one narrow (doc_id, pos, rank)
      // equi self-join plus a StableIds dense rank over the distinct key
      // set (suffix strings never move, only integer ranks shuffle).
      // Replication is the adversarial case for the rank table: every
      // copy shares the original's 16-gram content, so duplicate-group
      // sizes MULTIPLY while the distinct-key count stays content-bound
      // — exactly the regime a boilerplate-heavy 100 TB corpus presents.
      import graft.operators.SuffixRanks
      val d0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      SuffixRanks.rounds(d0.limit(64)).last.count() // untimed codegen warmup
      for (mult <- Seq(1, 4)) {
        val d = replicate(d0, "doc_id", mult, 1000000L).cache()
        val nPos = d.agg(sum(length(col("text")))).head().getLong(0)
        val t0 = System.nanoTime()
        val fin = SuffixRanks.rounds(d).last
        val nRanks = fin.agg(countDistinct(col("r"))).head().getLong(0)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scale]   suffix positions=$nPos build=$wall%.2fs " +
          f"(${SuffixRanks.Rounds} rounds) distinct16=$nRanks " +
          f"us_per_pos=${wall * 1e6 / nPos}%.2f")
        d.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "nndescent") {
      // qao: per-round cost must grow LINEARLY in N (capped-degree
      // candidate generation — ≤(4K)² pairs per node regardless of
      // corpus size), unlike the N² exact build it replaces. Replicates
      // the embeddings with offset ids and times the full build at each
      // scale; recall is measured at 1x against brute force (the exact
      // side is N² and is itself the point of contrast).
      import graft.operators.NnDescent
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      NnDescent.knnGraph(e0.limit(256)).count() // untimed codegen warmup
      for (mult <- Seq(1, 4)) {
        val e = replicate(e0, "vec_id", mult, 1000000L).cache()
        val n = e.count()
        val t0 = System.nanoTime()
        val g = NnDescent.knnGraph(e)
        val edges = g.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scale]   nndescent n=$n build=$wall%.2fs " +
          f"edges=$edges (${NnDescent.Rounds} rounds, K=${NnDescent.K}; " +
          f"per-node ${edges * 1.0 / n}%.1f)")
        if (mult == 1) {
          val hits = g.join(
            graft.queries.SimilarityQueries.exactTopK(e, NnDescent.K)
              .withColumnRenamed("qid", "vec_id"), Seq("vec_id", "nid")).count()
          println(f"[scale]   recall@${NnDescent.K} vs exact = " +
            f"${hits * 1.0 / (math.min(10, n) * NnDescent.K)}%.2f " +
            "(10 query nodes)")
        }
        e.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "graphinsert") {
      // qb3: inserting a FIXED delta batch into a growing base graph
      // must cost ~flat in the base size (per-new-node work is
      // O(BeamHops·BeamWidth·K + K²) distance evals plus a base-graph
      // SCAN), while the naive alternative — rebuild the whole graph per
      // batch — grows with the base (the incmh/deltacc amortization
      // argument, applied to the graph family). Base replicates 1x → 4x
      // with contiguous ids; the delta batch stays the corpus's top
      // nn/16 vectors, re-id'd above each base.
      import graft.operators.NnDescent
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nn0 = e0.count()
      val nB0 = nn0 - nn0 / 16
      val delta0 = e0.filter(col("vec_id") >= nB0)
      println(s"[scale] fixed delta batch: ${delta0.count()} vectors")
      for (mult <- Seq(1, 4)) {
        val nBase = mult * nB0
        val base = replicate(e0.filter(col("vec_id") < nB0), "vec_id",
          mult, nB0).cache()
        val delta = delta0
          .withColumn("vec_id", col("vec_id") - nB0 + lit(nBase)).cache()
        val e = base.unionByName(delta)
        val p = s"/tmp/graft_scale_ginsert_$mult"
        time(s"naive: full graph rebuild (base n=$nBase)") {
          NnDescent.knnGraph(base).write.mode("overwrite").parquet(p)
        }
        val g0 = spark.read.parquet(p)
        val edges = time(s"insert fixed delta (base n=$nBase)") {
          NnDescent.insertDelta(e, g0, nBase).count()
        }
        println(s"[scale]   merged edges=$edges — per-batch incremental " +
          "cost = insert only; per-batch naive cost = rebuild")
        base.unpersist(); delta.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "graphdelete") {
      // qb4: repairing a FIXED tombstone sweep in a growing graph must
      // cost ~flat (per-affected-node work ≤K² distance evals plus a
      // graph scan through the semi/anti split), while the naive
      // alternative — rebuild the surviving graph — pays the full
      // construction that grows with N (the graphinsert twin, remove
      // side). The tombstone SET is held fixed by widening the modulus
      // with the replication factor (mod = 16·mult keeps ~n0/16
      // tombstones at every scale; 1e6 ≡ 0 (mod 16·4), so replicated
      // ids preserve the residue structure).
      import graft.operators.NnDescent
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      for (mult <- Seq(1, 4)) {
        val e = replicate(e0, "vec_id", mult, 1000000L).cache()
        val n = e.count()
        val mod = NnDescent.DeleteMod * mult
        val nDead = e.filter(
          pmod(col("vec_id"), lit(mod)) === NnDescent.DeleteRes).count()
        val p = s"/tmp/graft_scale_gdelete_$mult"
        NnDescent.knnGraph(e).write.mode("overwrite").parquet(p)
        val g0 = spark.read.parquet(p)
        val edges = time(s"repair fixed sweep (n=$n, tombstones=$nDead)") {
          NnDescent.deleteRepair(e, g0, mod, NnDescent.DeleteRes).count()
        }
        val rebuilt = time(s"naive: rebuild surviving graph (n=$n)") {
          NnDescent.knnGraph(e.filter(
            pmod(col("vec_id"), lit(mod)) =!= NnDescent.DeleteRes)).count()
        }
        println(s"[scale]   repaired edges=$edges rebuilt edges=$rebuilt " +
          "— per-sweep incremental cost = repair only")
        e.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "graphcompact") {
      // qb5: what compaction BUYS — the incremental chain (insert merge
      // + delete repair) trades recall for locality; compaction pays a
      // rebuild (off the serving path) to reset that drift and fold the
      // generation chain. Measures recall@ReportK over ALL live nodes
      // for the chain graph vs the compacted graph, plus the walls, so
      // the drift-reset trade is a number, not a claim.
      import graft.operators.NnDescent
      import graft.queries.SimilarityQueries
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).cache()
      val nn = e.count()
      val nBase = nn - nn / 16
      def dead(c: org.apache.spark.sql.Column) =
        pmod(c, lit(NnDescent.DeleteMod)) === lit(NnDescent.DeleteRes)
      val g0 = time(s"chain: base build (n=$nBase)") {
        NnDescent.knnGraph(e.filter(col("vec_id") < nBase)).cache()
      }
      val g1 = time("chain: insert merge") {
        NnDescent.insertDelta(e, g0, nBase).cache()
      }
      val g2 = time("chain: delete repair") {
        NnDescent.deleteRepair(e, g1).cache()
      }
      val compacted = time("compact: rebuild over the chain's live set") {
        NnDescent.compact(e, g2).cache()
      }
      val liveE = e.filter(!dead(col("vec_id"))).cache()
      val exact = SimilarityQueries
        .exactTopKOf(liveE, NnDescent.ReportK, liveE.select(col("vec_id")))
        .cache()
      val nExact = exact.count()
      def recall(g: org.apache.spark.sql.DataFrame): Double = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("c").desc, col("nid"))
        val top = g.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= NnDescent.ReportK)
          .select(col("vec_id").as("qid"), col("nid"))
        top.join(exact, Seq("qid", "nid"), "left_semi").count() * 1.0 / nExact
      }
      println(f"[scale]   chain recall@${NnDescent.ReportK} = ${recall(g2)}%.3f " +
        f"vs compacted = ${recall(compacted)}%.3f over ${liveE.count()} live nodes")
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "minhashcompact") {
      // qb7: compacting a FIXED tombstone sweep out of a growing MinHash
      // index must cost ~flat — the compaction never reads the corpus
      // (it debits the DF table from the tombstoned docs' own index
      // rows, re-cuts the drop list, and touches only re-admission-
      // affected sets) — while the naive alternative, a rebuild over
      // the live corpus, re-shingles and re-signs everything and grows
      // with N. Tombstones come from the ORIGINAL id range only, so the
      // sweep stays fixed while the corpus replicates (the graphdelete
      // discipline, index edition).
      import graft.queries.DedupQueries
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4)) {
        val base = replicate(docs0, "doc_id", mult, 10000000L).cache()
        val n = base.count()
        val p = s"/tmp/graft_scale_mhcompact_$mult"
        DedupQueries.buildMinhashIndex(spark, base, s"$p/v0")
        val tomb = spark.read.parquet(s"$p/v0/members")
          .filter(col("doc_id") < 10000000L &&
            pmod(col("doc_id"), lit(25)) === 0).cache()
        val nDead = tomb.count()
        time(s"compact fixed sweep (n=$n, tombstones=$nDead)") {
          DedupQueries.compactMinhashIndex(spark, tomb, s"$p/v0", s"$p/v1")
        }
        val readmitted = spark.read.parquet(s"$p/v0/hot")
          .join(spark.read.parquet(s"$p/v1/hot"), Seq("sh"), "left_anti")
          .count()
        time(s"naive: rebuild over live corpus (n=$n)") {
          DedupQueries.buildMinhashIndex(spark,
            base.join(tomb, Seq("doc_id"), "left_anti"), s"$p/rebuild")
        }
        println(s"[scale]   n=$n tombstones=$nDead readmitted_shingles=" +
          s"$readmitted — per-sweep incremental cost = compact only")
        base.unpersist(); tomb.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "suffixcompact") {
      // qb8: folding a FIXED tombstone sweep out of a growing suffix
      // structure — the compaction's renumber term is O(|dict|) and its
      // copy term is a row-local anti join over positions (no re-key,
      // no text read), while the naive restage re-explodes every
      // document and re-ranks from scratch. Sweep fixed to the original
      // id range (the graphdelete/minhashcompact discipline).
      import graft.operators.SuffixRanks
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4)) {
        val base = replicate(docs0, "doc_id", mult, 10000000L).cache()
        val n = base.count()
        val p = s"/tmp/graft_scale_sfxcompact_$mult"
        SuffixRanks.suffixKeys(base)
          .write.mode("overwrite").parquet(s"$p/v0/pos")
        spark.read.parquet(s"$p/v0/pos").groupBy(col("key"))
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$p/v0/counts")
        SuffixRanks.rankDict(spark.read.parquet(s"$p/v0/counts"))
          .write.mode("overwrite").parquet(s"$p/v0/dict")
        val tomb = spark.read.parquet(s"$p/v0/pos")
          .select(col("doc_id")).distinct()
          .filter(col("doc_id") < 10000000L &&
            pmod(col("doc_id"), lit(25)) === 0).cache()
        val nDead = tomb.count()
        time(s"compact fixed sweep (n=$n, tombstones=$nDead)") {
          SuffixRanks.compactDelete(spark, tomb, s"$p/v0", s"$p/v1")
        }
        time(s"naive: restage over live corpus (n=$n)") {
          val live = base.join(tomb, Seq("doc_id"), "left_anti")
          SuffixRanks.suffixKeys(live)
            .write.mode("overwrite").parquet(s"$p/rb/pos")
          spark.read.parquet(s"$p/rb/pos").groupBy(col("key"))
            .agg(count(lit(1)).as("n"))
            .write.mode("overwrite").parquet(s"$p/rb/counts")
          SuffixRanks.rankDict(spark.read.parquet(s"$p/rb/counts"))
            .write.mode("overwrite").parquet(s"$p/rb/dict")
        }
        val dictN = spark.read.parquet(s"$p/v1/dict").count()
        println(s"[scale]   n=$n tombstones=$nDead dict=$dictN — the " +
          "renumber term is O(dict), the copy term row-local")
        base.unpersist(); tomb.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "pqcompact") {
      // qc1/qc2: what the PQ fold costs and buys. The tombstone SERVE
      // (qc1's shape) is one broadcast anti join over 8-byte code rows —
      // it must stay ~flat as the corpus grows with the sweep fixed. The
      // COMPACTION (qc2: chain-derived live set → codebook retrain →
      // re-encode) is one corpus pass, q5s's build cost class — measured
      // against the from-scratch restage it must equal (compact IS the
      // rebuild, run off the serving path). What it BUYS is the
      // drift reset: ADC recall@5 vs exact dot under the STALE base
      // codebook vs the RETRAINED one, printed per scale.
      import graft.queries.SimilarityQueries
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      for (mult <- Seq(1, 4)) {
        val e = replicate(e0, "vec_id", mult, 1000000L).cache()
        val n = e.count()
        // base/delta split: 1/16 of ids arrive after the base build;
        // tombstones fixed to the ORIGINAL id range (the graphdelete/
        // minhashcompact discipline: sweep fixed, corpus grows)
        def isDelta(c: org.apache.spark.sql.Column) =
          pmod(c, lit(16)) === 7
        val tombPred = col("vec_id") < 1000000L &&
          pmod(col("vec_id"), lit(9)) === 3
        val (cb0, codesAll) = time(s"chain: stage (n=$n)") {
          val sub0 = SimilarityQueries.pqSub(e.filter(!isDelta(col("vec_id"))))
          val cb0 = SimilarityQueries.pqCodebook(sub0).cache()
          val c0 = SimilarityQueries.pqCodes(sub0, cb0)
          val c1 = SimilarityQueries.pqCodes(
            SimilarityQueries.pqSub(e.filter(isDelta(col("vec_id")))), cb0)
          val all = c0.unionByName(c1).cache()
          all.count(); (cb0, all)
        }
        val tomb = e.filter(tombPred).select("vec_id").cache()
        val nDead = tomb.count()
        val liveQ = e.filter(col("vec_id") < 10 && !tombPred)
          .select(col("vec_id").as("qid"), col("embedding").as("qe")).cache()
        time(s"qc1 serve under tombstones (n=$n, tombstones=$nDead)") {
          SimilarityQueries.pqServeFor(liveQ,
            codesAll.join(broadcast(tomb), Seq("vec_id"), "left_anti"),
            cb0).count()
        }
        val liveE = e.join(
          codesAll.select("vec_id").distinct()
            .join(tomb, Seq("vec_id"), "left_anti"),
          Seq("vec_id"), "left_semi").cache()
        val (cbL, codesL) = time(s"qc2 compact: retrain + re-encode (n=$n)") {
          val subL = SimilarityQueries.pqSub(liveE)
          val cbL = SimilarityQueries.pqCodebook(subL).cache()
          val codesL = SimilarityQueries.pqCodes(subL, cbL).cache()
          codesL.count(); (cbL, codesL)
        }
        time(s"naive: restage over rule-live corpus (n=$n)") {
          val subR = SimilarityQueries.pqSub(e.filter(!tombPred))
          SimilarityQueries.pqCodes(subR,
            SimilarityQueries.pqCodebook(subR)).count()
        }
        // drift reset as a number: ADC recall@5 vs exact dot over the
        // live corpus, stale codebook vs retrained
        val subLive = SimilarityQueries.pqSub(liveE).cache()
        val exact = subLive.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("j"), col("svec").as("qvec"))
          .join(subLive.select(col("vec_id").as("nid"), col("j"),
            col("svec").as("nvec")), Seq("j"))
          .filter(col("nid") =!= col("qid"))
          .withColumn("dq", round(
            (1 to 8).map(i =>
              element_at(col("qvec"), i) * element_at(col("nvec"), i))
              .reduceLeft(_ + _), 9))
          .groupBy(col("qid"), col("nid"))
          .agg(SimilarityQueries.pqAdcSum.as("adc"))
          .withColumn("rnk", row_number().over(Window.partitionBy(col("qid"))
            .orderBy(col("adc").desc, col("nid"))))
          .filter(col("rnk") <= 5).select(col("qid"), col("nid")).cache()
        val denom = exact.count()
        def recall(label: String, codes: DataFrame, book: DataFrame): Unit = {
          val hits = SimilarityQueries.pqServeFor(liveQ, codes, book)
            .select(col("qid"), col("nid"))
            .join(exact, Seq("qid", "nid"), "left_semi").count()
          println(f"[scale]   $label adc_recall@5=" +
            s"${hits * 1000000L / math.max(1L, denom)}ppm ($hits/$denom)")
        }
        recall("chain (stale codebook + anti join)",
          codesAll.join(broadcast(tomb), Seq("vec_id"), "left_anti"), cb0)
        recall("compacted (retrained codebook)", codesL, cbL)
        Seq(e, tomb, liveQ, liveE, cb0, codesAll, cbL, codesL, subLive,
          exact).foreach(_.unpersist())
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "joinorder") {
      // qam: does the catalog's pick match measured reality, and what
      // does picking wrong cost? Prices both left-deep orders from the
      // persisted-stats formulas, then executes BOTH and times them —
      // the picked order must not be slower than the alternative.
      import graft.queries.Joins
      val cat = Joins.starCatalog(spark, dir).cache()
      val priced = Joins.joinOrderPricing(cat)
        .orderBy(col("cost")).collect()
      priced.foreach(r => println(
        s"[scale]   priced ${r.getString(0)}: est_im=${r.getLong(1)} " +
          s"cost=${r.getLong(2)}"))
      val pick = Joins.pickOrder(Joins.joinOrderPricing(cat))
      val alt = if (pick == "OC_then_L") "LO_then_C" else "OC_then_L"
      // C_out prices the SHUFFLE regime — the 100 TB reality where no
      // fact side fits a broadcast and intermediate size IS shuffle
      // volume. At local SF Spark (rightly) broadcasts the small tables
      // and both orders collapse to near-identical zero-shuffle plans,
      // so the regime the model prices is measured with broadcast off;
      // the engine-side query keeps broadcasts ON (correct Spark-first
      // behavior — the ORDER is what the catalog decides, per plan).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // replicate the star ×copies with offset keys (FK structure kept
      // per copy, NDVs scale with the data) — at 1× the lineitem scan
      // dominates and the orders are within noise of each other; the
      // intermediate-size difference the model prices grows linearly
      val li = replicate(spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_extendedprice")),
          "l_orderkey", copies, 100000000L).cache()
      val ord0 = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("o_orderkey") + col("copy") * 100000000L).as("o_orderkey"),
          (col("o_custkey") + col("copy") * 100000000L).as("o_custkey"))
        .cache()
      val cust = replicate(spark.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey"), col("c_mktsegment")),
          "c_custkey", copies, 100000000L).cache()
      Seq(li, ord0, cust).foreach(_.count()) // materialize caches
      // hintBroadcast=false: the probe measures the regime the model
      // prices — a dimension too large to broadcast (at 100 TB a
      // customer table is TBs). With the broadcast hint both orders
      // shuffle each fact table exactly once and tie (measured: ±8%
      // machinery noise at 8x, identical exchange volumes in the plans).
      def run(order: String): Double = {
        val t0 = System.nanoTime()
        Joins.starJoinOn(li, ord0, cust, order, hintBroadcast = false).count()
        (System.nanoTime() - t0) / 1e9
      }
      if (args.length > 2 && args(2) == "plans") {
        Seq(pick, alt).foreach { o =>
          println(s"[scale] ---- $o executed plan ----")
          val df = Joins.starJoinOn(li, ord0, cust, o, hintBroadcast = false)
          df.count()
          println(df.queryExecution.executedPlan.toString.take(4000))
        }
        spark.stop(); return
      }
      try {
        run(pick); run(alt) // warm both paths (codegen)
        // min of 3: single samples are jitter-dominated locally
        val tp = (1 to 3).map(_ => run(pick)).min
        val ta = (1 to 3).map(_ => run(alt)).min
        println(f"[scale]   picked=$pick measured=$tp%.2fs " +
          f"alternative=$alt measured=$ta%.2fs at ${copies}x " +
          f"(shuffle regime; pick saves ${(ta - tp) / math.max(ta, 1e-9) * 100}%.0f%%)")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.stop(); return
    }

    // "selinger": qd3's bushy-vs-left-deep gap in the SHUFFLE regime
    // (broadcast off — the 100 TB reality the C_out lattice prices).
    // The bushy (LO)(CN) plan shuffles the tiny C⋈N intermediate into
    // the filtered-fact join where the left-deep chains shuffle a fact
    // intermediate into every subsequent join.
    if (args.length > 1 && args(1) == "selinger") {
      import graft.queries.Joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val off = 100000000L
      val li = replicate(spark.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_extendedprice") <= 25000.0)
          .select(col("l_orderkey"), col("l_extendedprice")),
          "l_orderkey", copies, off).cache()
      val ord0 = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("o_orderkey") + col("copy") * off).as("o_orderkey"),
          (col("o_custkey") + col("copy") * off).as("o_custkey"))
        .cache()
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("c_custkey") + col("copy") * off).as("c_custkey"),
          col("c_nationkey"))
        .cache()
      val nat = spark.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name")).cache()
      Seq(li, ord0, cust, nat).foreach(_.count())
      def run(plan: String): Double = {
        val t0 = System.nanoTime()
        Joins.selingerJoinOn(li, ord0, cust, nat, plan,
          hintBroadcast = false).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        for (plan <- Seq("(LO)(CN)", "((LO)C)N", "L(O(CN))")) {
          run(plan) // warm (codegen)
          val t = (1 to 3).map(_ => run(plan)).min
          println(f"[scale]   selinger $plan%-10s $t%.2fs at ${copies}x " +
            "(shuffle regime)")
        }
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.stop(); return
    }

    // "selingeraqe": round-16 verdict item — qd3's static pick is priced
    // on catalog stats and executed verbatim; under AQE the picked
    // shape's EXCHANGES can re-plan at runtime (a sub-threshold
    // intermediate converts to broadcast, skewed partitions split), so
    // the question is whether the model's ordering of plan shapes
    // survives the broadcast-threshold regime shift as the corpus
    // scales. Same staging as "selinger", but AQE ON with the DEFAULT
    // broadcast threshold (the production regime), all five shapes
    // timed + the picked plan's final adaptive plan summarized. Where
    // the model and AQE can disagree: the lattice prices C_out with
    // shuffles-only costs; once C⋈N (and even O⋈C⋈N) fit under the
    // runtime threshold, AQE broadcasts them inside ANY shape, which
    // compresses the bushy-vs-left-deep gap toward zero — the pick then
    // only needs to stay non-WORSE, which is what this probe checks.
    if (args.length > 1 && args(1) == "selingeraqe") {
      import graft.queries.Joins
      val off = 100000000L
      val li = replicate(spark.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_extendedprice") <= 25000.0)
          .select(col("l_orderkey"), col("l_extendedprice")),
          "l_orderkey", copies, off).cache()
      val ord0 = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("o_orderkey") + col("copy") * off).as("o_orderkey"),
          (col("o_custkey") + col("copy") * off).as("o_custkey"))
        .cache()
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
        .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("c_custkey") + col("copy") * off).as("c_custkey"),
          col("c_nationkey"))
        .cache()
      val nat = spark.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name")).cache()
      Seq(li, ord0, cust, nat).foreach(_.count())
      def run(plan: String): Double = {
        val t0 = System.nanoTime()
        Joins.selingerJoinOn(li, ord0, cust, nat, plan,
          hintBroadcast = false).count() // no hints: AQE decides
        (System.nanoTime() - t0) / 1e9
      }
      for (plan <- Seq("(LO)(CN)", "((LO)C)N", "(L(OC))N",
          "L((OC)N)", "L(O(CN))")) {
        run(plan) // warm (codegen)
        val t = (1 to 3).map(_ => run(plan)).min
        println(f"[scale]   selingeraqe $plan%-10s $t%.2fs at ${copies}x (AQE on)")
      }
      val picked = Joins.selingerJoinOn(li, ord0, cust, nat, "(LO)(CN)",
        hintBroadcast = false)
      picked.count()
      val fin = picked.queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(fin).size
      val smj = "SortMergeJoin".r.findAllIn(fin).size
      val shj = "ShuffledHashJoin".r.findAllIn(fin).size
      println(s"[scale]   selingeraqe picked-plan joins at ${copies}x: " +
        s"broadcast=$bhj sortmerge=$smj shufflehash=$shj")
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "cbo") {
      // qad/qaf: do the planner estimates stay cheap AND trustworthy as
      // the corpus grows? Replication multiplies every day count on both
      // sides, so the priced join's true output grows with mult² while
      // the estimator only ever touches the day-level aggregates — the
      // probe computes the exact output size from the day frames (cheap
      // algebra) at every mult and times the REAL join once at 1x as the
      // anchor for what the estimator avoids. qaf replicates with
      // offset keys (fresh sample-hash population per copy) to show the
      // bounded 2048-row sample keeps histogram error flat as n grows.
      val ord0 = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderdate"))
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_extendedprice"))
      for (mult <- Seq(1, 4, 16)) {
        val cp = explode(sequence(lit(0), lit(mult - 1))).as("copy")
        val ord = ord0.select(col("o_orderdate"), cp).drop("copy").cache()
        val li = li0.select(col("*"), cp)
          .withColumn("l_orderkey",
            col("l_orderkey") + col("copy") * 100000000L)
          .drop("copy").cache()
        val (no, nl) = (ord.count(), li.count())
        // qad: day-frame estimator (1/16 key-space correlated sample)
        val co = ord.select(datediff(col("o_orderdate"), lit("1970-01-01"))
            .cast("long").as("d"))
          .groupBy(col("d")).agg(count(lit(1)).as("nco"))
        val cl = li.select(datediff(col("l_shipdate"), lit("1970-01-01"))
            .cast("long").as("d"))
          .groupBy(col("d")).agg(count(lit(1)).as("ncl"))
        val est = time(s"qad estimator (orders=$no lineitem=$nl)") {
          co.join(broadcast(cl), Seq("d"))
            .select((col("nco") * col("ncl")).as("r"),
              pmod((col("d") % 1000003L) * 2654435761L, lit(16L)).as("hs"))
            .agg(
              (sum(when(col("hs") === 0, col("r")).otherwise(0L)) * 16)
                .as("est"),
              sum(col("r")).as("exact"))
            .head()
        }
        val (e, x) = (est.getLong(0), est.getLong(1))
        println(s"[scale]   join size est=$e exact=$x err_ppm=" +
          s"${math.abs(e - x) * 1000000L / math.max(1L, x)} " +
          s"(output grows ~mult²: $x)")
        if (mult == 1) time("real date join count (the avoided cost, 1x anchor)") {
          println(s"[scale]   materialized join rows=" +
            ord.join(li, col("o_orderdate") === col("l_shipdate")).count())
        }
        // qaf: bounded-sample histogram, max err across the 5 constants
        val nn = li.count()
        val sdiv = math.max(1L, nn / 2048L)
        val sampled = li.filter(
          pmod(((col("l_orderkey") * 8 + col("l_linenumber")) % 1000003L)
            * 2654435761L, lit(sdiv)) === 0)
        time(s"qaf histogram build+eval (n=$nn, sample div=$sdiv)") {
          val spl = sampled
            .agg(expr("""percentile(cast(l_extendedprice as double),
                array(0.0625d, 0.125d, 0.1875d, 0.25d, 0.3125d, 0.375d,
                  0.4375d, 0.5d, 0.5625d, 0.625d, 0.6875d, 0.75d,
                  0.8125d, 0.875d, 0.9375d))""").as("qs0"))
            .select(expr("transform(qs0, s -> round(s, 9))").as("qs"))
          val bk = li.crossJoin(broadcast(spl))
            .select(col("l_extendedprice").cast("double").as("x"),
              col("qs"), expr(
              """cast(aggregate(qs, 0, (a, s) ->
                   a + IF(cast(l_extendedprice as double) > s, 1, 0))
                 as int)""").as("pid"))
            .groupBy(col("pid"))
            .agg(count(lit(1)).as("cnt"), min(col("x")).as("mnb"),
              max(col("x")).as("mxb"),
              min(expr("IF(pid >= 1, element_at(qs, pid), null)"))
                .as("lo_s"),
              min(expr("IF(pid <= 14, element_at(qs, pid + 1), null)"))
                .as("hi_s"))
            .collect()
          val consts = Seq(2000.0, 10000.0, 25000.0, 50000.0, 90000.0)
          val ests = consts.map { c =>
            val below = bk.filter(r => !r.isNullAt(5) && c > r.getDouble(5))
              .map(_.getLong(1)).sum.toDouble
            val own = bk.find(r =>
              (r.isNullAt(4) || c > r.getDouble(4)) &&
                (r.isNullAt(5) || c <= r.getDouble(5)))
            c -> (below + own.map { r =>
              val (cnt, mnb, mxb) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
              val frac = if (mxb == mnb) { if (c >= mnb) 1.0 else 0.0 }
                else math.min(1.0, math.max(0.0, (c - mnb) / (mxb - mnb)))
              cnt * frac
            }.getOrElse(0.0))
          }.toMap
          val exactAggs = consts.map(c =>
            sum(when(col("l_extendedprice") <= c, 1L).otherwise(0L))
              .as(s"e$c"))
          val exactRow = li.agg(exactAggs.head, exactAggs.tail: _*).head()
          val errs = consts.zipWithIndex.map { case (c, i) =>
            val xr = exactRow.getLong(i)
            math.abs(ests(c) - xr) * 1000000L / math.max(1L, xr)
          }
          println(s"[scale]   histogram max err_ppm=${errs.max.toLong} " +
            s"(sample stays ~2048 rows at any n)")
        }
        ord.unpersist(); li.unpersist()
      }
      spark.stop(); return
    }

    if (triangleOnly) {
      import graft.operators.TriangleCount
      for (mult <- Seq(1, 4, 16)) {
        val n = 4000L * mult
        // random sparse edges + one hub wired to half the nodes: the
        // adversary for any neighbors×neighbors join (hub wedges ≈ n²/8)
        // genuinely mixed random edges (Murmur3) + one hub wired to half
        // the nodes: hub wedges alone are (n/2)²/2 — the Σdeg² adversary
        val rnd = spark.range(8L * n)
          .select(pmod(hash(col("id")), lit(n)).cast("long").as("src"),
            pmod(hash(col("id") + 1000000L), lit(n)).cast("long").as("dst"))
        val hub = spark.range(n / 2).select(lit(0L).as("src"), (col("id") * 2L + 1L).as("dst"))
        val edges = rnd.unionAll(hub).filter(col("src") =!= col("dst")).cache()
        edges.count()
        val oriented = time(s"oriented triangle count n=$n") {
          TriangleCount.perNode(edges)
            .agg(coalesce(sum(col("n_tri")), lit(0L))).head.getLong(0) / 3
        }
        val naive = time(s"naive wedge-join count n=$n") {
          val und = edges
            .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
            .filter(col("a") =!= col("b")).distinct()
          val sym = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
          val wedges = sym.select(col("a").as("u"), col("b").as("v"))
            .join(sym.select(col("a").as("u"), col("b").as("w")), Seq("u"))
            .filter(col("v") < col("w"))
          // a triangle has three wedge centers → the naive join counts
          // each exactly 3 times
          wedges.join(und,
            wedges("v") === und("a") && wedges("w") === und("b")).count() / 3
        }
        println(s"[scale]   triangles: oriented=$oriented naive=$naive " +
          s"equal=${oriented == naive}")
        edges.unpersist()
      }
      spark.stop(); return
    }

    if (bloomOnly) { bloomProbe(); spark.stop(); return }

    if (args.length > 1 && args(1) == "phash") {
      // q9t's banded perceptual-hash join vs the brute-force all-pairs
      // xor/popcount scan: pair counts must be EQUAL at every scale
      // (pigeonhole losslessness at hamming <= 3), while the naive path
      // pays N²/2 popcount pairs and the banded path pays only band
      // collisions + verify. Hashes are computed ONCE through the real
      // codec seam and cached, so the probe times candidate generation +
      // verify, not the decode.
      import graft.queries.MultimodalQueries.{MediaImage, dhashImages, synthesizePng}
      import spark.implicits._
      for (mult <- Seq(1, 4, 10)) {
        val n = 5000L * mult
        val hs = spark.range(n).select(col("id").as("doc_id")).as[Long]
          .mapPartitions(_.map(id => MediaImage(id, synthesizePng(id))))
          .mapPartitions(dhashImages).toDF().cache()
        hs.count()
        def ham = (bit_count(col("h0a").bitwiseXOR(col("h0b")))
          + bit_count(col("h1a").bitwiseXOR(col("h1b")))).cast("long")
        val banded = time(s"banded phash dedup n=$n") {
          val bands = hs.select(col("doc_id"), col("h0"), col("h1"),
            explode(array(
              struct(lit(0).as("band"), col("b0").as("key")),
              struct(lit(1).as("band"), col("b1").as("key")),
              struct(lit(2).as("band"), col("b2").as("key")),
              struct(lit(3).as("band"), col("b3").as("key")))).as("bk"))
            .select(col("doc_id"), col("h0"), col("h1"),
              col("bk.band").as("band"), col("bk.key").as("key"))
          bands.select(col("doc_id").as("id_a"), col("h0").as("h0a"),
              col("h1").as("h1a"), col("band"), col("key"))
            .join(bands.select(col("doc_id").as("id_b"), col("h0").as("h0b"),
              col("h1").as("h1b"), col("band"), col("key")), Seq("band", "key"))
            .filter(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"), col("h0a"), col("h1a"),
              col("h0b"), col("h1b")).distinct()
            .filter(ham <= 3).count()
        }
        val naive = time(s"all-pairs phash dedup n=$n") {
          val a = hs.select(col("doc_id").as("id_a"), col("h0").as("h0a"),
            col("h1").as("h1a"))
          val b = hs.select(col("doc_id").as("id_b"), col("h0").as("h0b"),
            col("h1").as("h1b"))
          a.join(b, col("id_a") < col("id_b")).filter(ham <= 3).count()
        }
        println(s"[scale]   pairs: banded=$banded naive=$naive " +
          s"equal=${banded == naive}")
        hs.unpersist()
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "rangejoin") {
      // binned range join (q1f's operator) vs the naive raw-predicate
      // join Spark can only plan as a broadcast nested loop: pair counts
      // must agree, and the binned wall must hold flat-ish while the
      // naive one grows with |points|x|intervals|
      import graft.operators.RangeJoin
      val hourNs = 3600000000000L
      val ev = graft.sources.Tables.normalizeEvents(
        spark.read.parquet(s"$dir/events.parquet"))
      val iv0 = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
        .select(col("event_id").as("iv_id"), col("ts_ns").as("lo"),
          (col("ts_ns") + (col("event_id") % 5 + 1) * hourNs).as("hi"))
      val pts0 = ev.filter(col("event_type") === "click")
        .select(col("ts_ns").as("p_ts"), col("event_id").as("p_id"))
      for (cp <- Seq(1, copies)) {
        val iv = replicate(iv0, "iv_id", cp, 10000000L).persist()
        val pts = replicate(pts0, "p_id", cp, 10000000L).persist()
        val (nIv, nPts) = (iv.count(), pts.count())
        val binned = time(s"rangejoin binned cp=$cp iv=$nIv pts=$nPts")(
          RangeJoin.pointInInterval(iv, "lo", "hi", pts, "p_ts", hourNs).count())
        val naive = time(s"rangejoin naive  cp=$cp iv=$nIv pts=$nPts")(
          iv.join(pts, col("p_ts") >= col("lo") && col("p_ts") < col("hi")).count())
        require(binned == naive, s"pair counts diverged: $binned vs $naive")
        println(s"[scale] rangejoin cp=$cp pairs=$binned")
        iv.unpersist(); pts.unpersist()
      }
      spark.stop(); return
    }

    if (kmeansOnly) {
      import graft.queries.SimilarityQueries
      val embK = replicate(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", copies, 1000000L)
        .cache()
      println(s"[scale] kmeans probe: vectors=${embK.count()} (copies=$copies)")
      // per-iteration cost: each round = broadcast(√N centroids) + one
      // map-side-combining hash agg (one shuffled row per vector) + a
      // √N-row centroid agg. Cumulative wall for T=1,2,3 rounds should
      // grow LINEARLY — superlinear growth would mean lineage leaking
      // through the per-round localCheckpoint (every round is
      // materialized inside kmeansIterations, so each T is an honest
      // fresh build of that depth).
      (1 to 3).foreach { t =>
        time(s"kmeans build, $t iteration(s) (${copies}x)") {
          val (c, _) = SimilarityQueries.kmeansIterations(embK, t)
          println(s"[scale]   cells=${c.count()}")
        }
      }
      embK.unpersist(); spark.stop(); return
    }

    if (annsweepOnly) {
      import graft.queries.SimilarityQueries
      // recall-vs-cost operating curve for the IVF serve path: candidates
      // (and serve cost) grow ~linearly with nprobe while recall
      // saturates — this table is the tuning evidence a 100 TB operator
      // reads before picking nprobe. Two corpus scales: cell count k=⌈√N⌉
      // grows with N, so the same nprobe probes a smaller FRACTION of the
      // corpus at the larger scale (recall at fixed nprobe usually drops;
      // the dial must be re-read per deployment, which is the point).
      for (scale <- Seq(1, copies).distinct) {
        val e = replicate(
          spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", scale, 1000000L).cache()
        val n = e.count()
        val (cent, assign) = SimilarityQueries.buildIndex(e)
        val centC = cent.cache(); val assignC = assign.cache()
        val k = centC.count(); assignC.count() // build once, off the clock
        val exact = SimilarityQueries.exactTopK(e, 3).cache()
        exact.count()
        for (nprobe <- Seq(1, 2, 4, 8)) {
          time(s"annsweep n=$n cells=$k nprobe=$nprobe") {
            val served = SimilarityQueries
              .ivfServe(e, centC, assignC, nprobe = nprobe, topK = 3)
            val hits = served.select(col("qid"), col("nid"))
              .join(exact, Seq("qid", "nid")).count()
            val denom = exact.count()
            println(f"[scale]   recall@3=${hits * 1000000L / denom}ppm " +
              f"($hits/$denom)")
          }
        }
        exact.unpersist(); centC.unpersist(); assignC.unpersist(); e.unpersist()
      }
      spark.stop(); return
    }

    if (pqOnly) {
      import graft.queries.SimilarityQueries
      // PQ/ADC honesty: recall@5 of lookup-table scoring vs the exact
      // DOT-product top-5 (ADC approximates dot, so dot is the fair
      // denominator), at two corpus scales — the q5n-style measurement
      // the compression claim needs: 32x smaller candidates buy HOW much
      // ranking loss?
      for (scale <- Seq(1, copies).distinct) {
        val e = replicate(
          spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", scale, 1000000L).cache()
        val n = e.count()
        val sub = SimilarityQueries.pqSub(e).cache()
        val cb = SimilarityQueries.pqCodebook(sub).cache()
        sub.count(); cb.count() // build off the clock
        // exact dot top-5 via the same subspace frame (identical algebra
        // to the ADC side except codes are the vector's OWN subvectors)
        val exactDot = sub.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("j"), col("svec").as("qvec"))
          .join(sub.select(col("vec_id").as("nid"), col("j"),
            col("svec").as("nvec")), Seq("j"))
          .filter(col("nid") =!= col("qid"))
          .withColumn("dq", round(
            (1 to 8).map(i =>
              element_at(col("qvec"), i) * element_at(col("nvec"), i))
              .reduceLeft(_ + _), 9))
          .groupBy(col("qid"), col("nid"))
          .agg(SimilarityQueries.pqAdcSum.as("adc"))
        val wEx = Window.partitionBy(col("qid"))
          .orderBy(col("adc").desc, col("nid"))
        val exact = exactDot.withColumn("rnk", row_number().over(wEx))
          .filter(col("rnk") <= 5).select(col("qid"), col("nid")).cache()
        exact.count()
        def measure(label: String, book: DataFrame): Unit =
          time(s"pq adc n=$n $label (codes = 8 bytes/vector vs 256 raw)") {
            val codes = SimilarityQueries.pqCodes(sub, book)
            val dotq = SimilarityQueries.pqDotq(sub, book)
            val wAdc = Window.partitionBy(col("qid"))
              .orderBy(col("adc").desc, col("nid"))
            val adcTop = codes
              .join(broadcast(dotq), Seq("j", "code"))
              .filter(col("vec_id") =!= col("qid"))
              .groupBy(col("qid"), col("vec_id").as("nid"))
              .agg(SimilarityQueries.pqAdcSum.as("adc"))
              .withColumn("rnk", row_number().over(wAdc))
              .filter(col("rnk") <= 5).select(col("qid"), col("nid"))
            val hits = adcTop.join(exact, Seq("qid", "nid")).count()
            val denom = exact.count()
            println(f"[scale]   adc_recall@5=${hits * 1000000L / denom}ppm ($hits/$denom)")
          }
        measure("seed codebook", cb)
        // one Lloyd round per subspace: new code vector = mean of its
        // members' subvectors — the training dial production PQ turns
        // (k-means per subspace); recall delta vs the raw id-prefix
        // seeds is the measurement
        val refined = SimilarityQueries.pqCodes(sub, cb)
          .join(sub, Seq("vec_id", "j"))
          .select(col("j"), col("code"), posexplode(col("svec")))
          .groupBy(col("j"), col("code"), col("pos"))
          .agg(avg(col("col")).as("m"))
          .groupBy(col("j"), col("code"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x.getField("m")).as("cvec"))
          .cache()
        refined.count()
        measure("1-round refined codebook", refined)
        refined.unpersist()
        exact.unpersist(); cb.unpersist(); sub.unpersist(); e.unpersist()
      }
      spark.stop(); return
    }

    if (deltaccOnly) {
      import graft.operators.ConnectedComponents
      // incremental CC: merged-label cost must scale with |delta|, not
      // |corpus| — the q6k contract. Standing graph: n nodes in star
      // families of 50 (the near-dup topology); delta: d edges joining
      // adjacent families (forcing real merges, worst case for the
      // reduced graph). Full re-run cost on the union graph is the
      // comparison line.
      val n = copies * 20000L
      val standing = spark.range(0L, n)
        .select(col("id").as("id_a"), (col("id") - col("id") % 50L).as("id_b"))
      val labels = ConnectedComponents.run(standing).cache()
      println(s"[scale] deltacc standing: n=$n labels=${labels.count()}")
      for (d <- Seq(100L, 1000L, 10000L)) {
        // delta edge j: family-anchor 50·j ~ family-anchor 50·(j+1)
        val delta = spark.range(0L, d)
          .select((col("id") * 50L).as("id_a"), ((col("id") + 1L) * 50L).as("id_b"))
        time(s"deltacc incremental |delta|=$d (n=$n)") {
          val merged = ConnectedComponents.incremental(labels, delta)
          println(s"[scale]   components=" +
            merged.agg(countDistinct(col("component"))).head().getLong(0))
        }
      }
      val union = standing.unionByName(
        spark.range(0L, 10000L)
          .select((col("id") * 50L).as("id_a"), ((col("id") + 1L) * 50L).as("id_b")))
      time(s"deltacc FULL re-run on union graph (n=$n, comparison line)") {
        val (full, rounds) = ConnectedComponents.runCounted(union, maxRounds = 64)
        println(s"[scale]   rounds=$rounds components=" +
          full.agg(countDistinct(col("component"))).head().getLong(0))
      }
      labels.unpersist(); spark.stop(); return
    }

    if (ccOnly) {
      import graft.operators.ConnectedComponents
      // chain: one component, diameter = n — min-label propagation alone
      // would need n rounds (n sequential Spark jobs); pointer jumping
      // needs ~log2(n)+2
      val n = copies * 20000L
      val chain = spark.range(0L, n)
        .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
      time(s"cc chain n=$n") {
        val (labels, rounds) = ConnectedComponents.runCounted(
          chain, maxRounds = 64)
        println(s"[scale]   rounds=$rounds components=" +
          labels.agg(countDistinct(col("component"))).head().getLong(0))
      }
      // clustered: n nodes in n/50 star-shaped families (each member
      // linked to its anchor, diameter 2) — the realistic near-dup
      // topology; rounds should be ~3 regardless of n
      val clusteredEdges = spark.range(0L, n)
        .select(col("id").as("id_a"), (col("id") - col("id") % 50L).as("id_b"))
      time(s"cc clustered n=$n families=${n / 50}") {
        val (labels, rounds) = ConnectedComponents.runCounted(
          clusteredEdges, maxRounds = 64)
        println(s"[scale]   rounds=$rounds components=" +
          labels.agg(countDistinct(col("component"))).head().getLong(0))
      }
      spark.stop(); return
    }

    val docs = replicate(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
      "doc_id", copies, 1000000L)
    val emb = replicate(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", copies, 1000000L)
    println(s"[scale] docs=${if (assignOnly) -1 else docs.count()} vectors=${emb.count()} (copies=$copies)")

    if (!assignOnly) {
    // MinHash-LSH candidate generation (the scale path of q62)
    val d = docs.select(col("doc_id"),
      TextExpressions.word_shingles(col("text"), 3).as("sh"))
    val sig = d.select(col("doc_id"),
      HashExpressions.minhash_signature(col("sh"), k = 128).as("sig"))
    val buckets = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(31)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("bh")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    time(s"minhash-lsh candidates (${copies}x)")(println(s"[scale]   pairs=${cand.count()}"))

    // exact dedup (q60 path): shuffle carries 32-byte hashes only
    time(s"exact dedup (${copies}x)")(
      println(s"[scale]   groups=" + docs
        .groupBy(sha2(col("text"), 256)).agg(count(lit(1))).count()))

    bloomProbe()

    // chunking (q5a path): row-local, scan-bound
    time(s"chunking (${copies}x)")(
      println(s"[scale]   chunks=" + docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(posexplode(sequence(lit(0), size(col("toks")) - 1, lit(40))))
        .count()))

    // graft-doc write + snapshot (q77 path): task-rolled files, MOR window
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_scale_sink")
      .toFile.getAbsolutePath
    time(s"graft-doc write+snapshot (${copies}x)") {
      graft.connector.GraftDoc.write(docs, "doc_id", sinkDir,
        overwrite = true, targetFileRows = Some(200000L))
      println(s"[scale]   snapshot=" +
        graft.connector.GraftDoc.snapshot(spark, sinkDir).count())
    }

    } // end !assignOnly (doc stages)

    // IVF ANN probe (the scale path of q66): adaptive k = ceil(sqrt(N))
    // cells, exactly the q66/q58/q6c centroid rule
    val cent = graft.queries.SimilarityQueries.centroids(emb)
    if (!assignOnly) {
      val wA = Window.partitionBy(col("vec_id")).orderBy(col("cc").desc, col("cid"))
      val assign = emb.crossJoin(broadcast(cent))
        .withColumn("cc", VectorFunctions.cosine_sim(col("embedding"), col("ce")))
        .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
      time(s"ivf assignment (${copies}x)")(
        println(s"[scale]   cells=${assign.groupBy("cid").count().count()}"))
    }

    // flat vs two-level assignment (the q66-vs-q6g trade): flat compares
    // every vector to all k = ceil(√N) centroids — O(N·k) = O(N^1.5)
    // compute; the hierarchical path routes through kc = ceil(√k) coarse
    // groups then only the winning group's ~√k fine centroids —
    // O(N·√k) = O(N^1.25). Both as max_by hash aggregates (one shuffled
    // row per vector); this probe measures where the crossover lands on
    // real hardware as N grows.
    locally {
      val flatAssign = emb.crossJoin(broadcast(cent))
        .withColumn("cc",
          round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 9))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("cc"), (-col("cid")).as("nc"))).as("cid"))
        .cache()
      time(s"ivf flat assignment O(N·k) (${copies}x)")(
        println(s"[scale]   assigned=${flatAssign.count()} k=${cent.count()}"))

      val coarse = cent.crossJoin(broadcast(
          cent.agg(ceil(sqrt(count(lit(1)))).cast("long").as("kc"))))
        .filter(col("cid") < col("kc"))
        .select(col("cid").as("gid"), col("ce").as("ge"))
      val f2c = cent.crossJoin(broadcast(coarse))
        .withColumn("gc", round(VectorFunctions.cosine_sim(col("ce"), col("ge")), 9))
        .groupBy(col("cid"))
        .agg(max_by(col("gid"), struct(col("gc"), (-col("gid")).as("ng"))).as("gid"),
          first(col("ce")).as("ce"))
      val vg = emb.crossJoin(broadcast(coarse))
        .withColumn("gc",
          round(VectorFunctions.cosine_sim(col("embedding"), col("ge")), 9))
        .groupBy(col("vec_id"))
        .agg(max_by(col("gid"), struct(col("gc"), (-col("gid")).as("ng"))).as("gid"),
          first(col("embedding")).as("embedding"))
      val hier = vg.join(broadcast(f2c.select(col("gid"), col("cid"), col("ce"))), "gid")
        .withColumn("cc",
          round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 9))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("cc"), (-col("cid")).as("nc"))).as("cid"))
        .cache()
      time(s"ivf two-level assignment O(N·√k) (${copies}x)")(
        println(s"[scale]   assigned=${hier.count()} kc=${coarse.count()}"))
      // agreement (untimed): on the raw ISOTROPIC vectors coarse routing
      // is near-random (no cluster structure to exploit), so disagreement
      // with the flat argmax is expected and harmless — both are valid
      // IVF assignments, and q5c's oracle replays the two-level one
      // exactly. Real corpora are clustered; there the coarse level
      // routes to the right region and agreement is high.
      val n = hier.count()
      val agree = hier.as("h").join(flatAssign.as("f"), "vec_id")
        .filter(col("h.cid") === col("f.cid")).count()
      println(f"[scale]   agree_with_flat=${agree.toDouble / n}%.4f (isotropic worst case)")
      flatAssign.unpersist(); hier.unpersist()
    }

    if (!assignOnly) {
    // q6c bucketed embedding dedup: cell-blocked candidate generation with
    // triangle-inequality probing at adaptive k. Two regimes, as the
    // operator's scaladoc documents:
    //  - the raw sf0.1 vectors are ISOTROPIC (structure-free), the
    //    provable worst case: cell radii approach sqrt(2), every vector
    //    probes every cell, and candidates degrade toward all pairs —
    //    through cell-blocked hash joins, never a nested loop (measured
    //    1x: 2.0M candidates = all pairs; growth tracks N^2 because the
    //    TRUE-pair spectrum of random vectors offers nothing to prune);
    //  - a CLUSTERED corpus (real dedup workloads: near-dup families) is
    //    where blocking earns its keep — cells align with clusters, radii
    //    stay small, probes prune, and candidates track true-pair mass.
    //    The probe builds one deterministically: blend every vector 90%
    //    toward its anchor (vec_id mod 40) and renormalize.
    val anchors = 40
    val anchorVecs = emb.filter(col("vec_id") < anchors)
      .select((col("vec_id") % anchors).as("aid"), col("embedding").as("ae"))
    val clustered = emb.withColumn("aid", col("vec_id") % anchors)
      .join(broadcast(anchorVecs), "aid")
      .withColumn("blend", zip_with(col("embedding"), col("ae"),
        (v, w) => v * lit(0.1) + w * lit(0.9)))
      .withColumn("nrm",
        sqrt(aggregate(col("blend"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("blend"), x => (x / col("nrm")).cast("float")).as("embedding"))
      .cache()
    val cCent = graft.queries.SimilarityQueries.centroids(clustered)
    val t = math.sqrt(2.0 - 2.0 * 0.45)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    val assign6c = clustered.crossJoin(broadcast(cCent))
      .withColumn("dist", sqrt(greatest(lit(0.0),
        lit(2.0) - lit(2.0) * VectorFunctions.cosine_sim(col("embedding"), col("ce")))))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("dist"))
    val radius = assign6c.groupBy(col("cid")).agg(max(col("dist")).as("r"))
    val probes = clustered.crossJoin(broadcast(cCent.join(radius, "cid")))
      .withColumn("dist", sqrt(greatest(lit(0.0),
        lit(2.0) - lit(2.0) * VectorFunctions.cosine_sim(col("embedding"), col("ce")))))
      .filter(col("dist") <= lit(t) + col("r"))
      .select(col("vec_id").as("probe_id"), col("cid"))
    val cand6c = assign6c.select(col("cid"), col("vec_id").as("member_id"))
      .join(probes, "cid")
      .filter(col("member_id") =!= col("probe_id"))
      .select(least(col("member_id"), col("probe_id")).as("id_a"),
        greatest(col("member_id"), col("probe_id")).as("id_b"))
      .distinct()
    time(s"q6c clustered candidates (${copies}x)") {
      val n = clustered.count()
      val c = cand6c.count()
      println(f"[scale]   n=$n candidates=$c allPairs=${n * (n - 1) / 2} " +
        f"fraction=${c.toDouble / (n.toDouble * (n - 1) / 2)}%.4f")
    }
    } // end !assignOnly (q6c stage)

    spark.stop()
  }
}
