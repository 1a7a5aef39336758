package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scale contract for the append-mode streaming drains (the q80/q81/q82/
  * q84/q86 shapes in [[graft.streaming.StreamPipelines]]): state must hold
  * only OPEN work — windows/sessions/keys the watermark hasn't closed —
  * not the full history. Each test replays a stream 10× longer than the
  * open horizon and asserts `stateOperators.numRowsTotal` (post-batch,
  * post-eviction store size) stays bounded near the open set while total
  * emitted results keep growing. Complete-mode drains fail these bounds
  * by construction (state = every group ever seen), which is why round 3
  * retired them.
  */
class StreamStateBoundSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def hourTs(h: Double): Timestamp =
    new Timestamp(base + (h * 3600 * 1000).toLong)

  /** Max numRowsTotal reported across the query's whole progress history. */
  private def maxStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)

  test("tumbling windows (q80 shape): state ~ open windows, not total windows") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sb_win")
      .outputMode("append").start()
    try {
      val chunks = 10; val winPerChunk = 10 // 100 one-hour windows total
      for (c <- 0 until chunks) {
        in.addData((0 until winPerChunk).map(w => (hourTs(c * winPerChunk + w), "k")): _*)
        q.processAllAvailable()
      }
      val total = chunks * winPerChunk
      val bound = winPerChunk + 5 // one batch's new windows + watermark tail
      assert(maxStateRows(q) <= bound,
        s"state ${maxStateRows(q)} rows exceeds open-window bound $bound (total windows $total)")
      // everything below the final watermark was emitted exactly once
      val emitted = spark.table("sb_win").count()
      assert(emitted >= total - 2 && emitted < total,
        s"emitted $emitted of $total windows")
    } finally q.stop()
  }

  test("dedup (q81 shape): seen-key state is evicted past the watermark delay") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val dedup = in.toDF().toDF("ts", "id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("sb_dedup")
      .outputMode("append").start()
    try {
      val chunks = 10; val idsPerChunk = 100 // chunk spans 1h of event time
      for (c <- 0 until chunks) {
        in.addData((0 until idsPerChunk).map { i =>
          (hourTs(c + i.toDouble / idsPerChunk), s"id_${c}_$i")
        }: _*)
        q.processAllAvailable()
      }
      val total = chunks * idsPerChunk
      // open horizon = watermark delay (1h) + the in-flight chunk ≈ 2 chunks
      val bound = 3L * idsPerChunk
      assert(maxStateRows(q) <= bound,
        s"dedup state ${maxStateRows(q)} exceeds $bound (total keys $total)")
      assert(spark.table("sb_dedup").count() == total) // all unique ids emitted
    } finally q.stop()
  }

  test("session windows (q82 shape): state ~ open sessions") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val sess = in.toDF().toDF("ts", "u")
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("u"))
      .agg(count(lit(1)).as("n"))
    val q = sess.writeStream.format("memory").queryName("sb_sess")
      .outputMode("append").start()
    try {
      // hourly events per user → every event is its own session (gap 30m);
      // 10 chunks × 10 sessions × 2 users = 200 sessions total
      val chunks = 10; val sessPerChunk = 10
      for (c <- 0 until chunks) {
        in.addData((0 until sessPerChunk).flatMap { i =>
          val h = c * sessPerChunk + i
          Seq((hourTs(h), "u1"), (hourTs(h), "u2"))
        }: _*)
        q.processAllAvailable()
      }
      val total = chunks * sessPerChunk * 2
      val bound = (sessPerChunk + 3) * 2L // one batch's sessions + tail, per user
      assert(maxStateRows(q) <= bound,
        s"session state ${maxStateRows(q)} exceeds $bound (total sessions $total)")
      val emitted = spark.table("sb_sess").count()
      assert(emitted >= total - 4 && emitted < total,
        s"emitted $emitted of $total sessions")
    } finally q.stop()
  }

  test("stream-static join (q84 shape) is stateless") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "A"), (2L, "B")).toDF("k", "seg")
    val in = MemoryStream[(Timestamp, Long)]
    val joined = in.toDF().toDF("ts", "k").join(dim, "k").select(col("seg"))
    val q = joined.writeStream.format("memory").queryName("sb_ssj")
      .outputMode("append").start()
    try {
      for (c <- 0 until 5) {
        in.addData((0 until 20).map(i => (hourTs(c), (i % 2 + 1).toLong)): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "stream-static join must carry no state store rows")
      assert(spark.table("sb_ssj").count() == 100)
    } finally q.stop()
  }

  test("stream-static ANTI join (q8e shape) is stateless and filters correctly") {
    implicit val sql = spark.sqlContext
    // historical "seen" set: even keys — the corpus-hash side of q8e
    val seen = (0L until 100L by 2).toDF("k")
    val in = MemoryStream[(Timestamp, Long)]
    val novel = in.toDF().toDF("ts", "k").join(seen, Seq("k"), "left_anti")
    val q = novel.writeStream.format("memory").queryName("sb_anti")
      .outputMode("append").start()
    try {
      for (c <- 0 until 5) {
        in.addData((0 until 20).map(i => (hourTs(c), i.toLong)): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "stream-static anti join must carry no state store rows")
      // each batch: 20 keys, the 10 odd ones pass — dedup against history
      // costs zero stream state at ANY corpus size
      assert(spark.table("sb_anti").count() == 50)
      assert(spark.table("sb_anti").select("k").as[Long].collect().forall(_ % 2 == 1))
    } finally q.stop()
  }

  test("broadcast baseline scoring (q8n shape) is stateless") {
    implicit val sql = spark.sqlContext
    // the anomaly pipeline's shape: a tiny batch-trained stats frame
    // broadcast onto the stream, row-local flagging — state must be zero
    // no matter how many events flow
    val stats = Seq(("click", 10.0, 2.0), ("view", 10.0, 1.0))
      .toDF("k", "med", "mad")
    val in = MemoryStream[(Timestamp, String, Double)]
    val flagged = in.toDF().toDF("ts", "k", "v")
      .join(org.apache.spark.sql.functions.broadcast(stats), Seq("k"))
      .filter(abs(col("v") - col("med")) > lit(3) * lit(1.4826) * col("mad"))
      .select(col("k"), col("v"))
    val q = flagged.writeStream.format("memory").queryName("sb_anom")
      .outputMode("append").start()
    try {
      for (c <- 0 until 4) {
        in.addData((0 until 20).map(i =>
          (hourTs(c), if (i % 2 == 0) "click" else "view",
            if (i % 10 == 0) 1000.0 else 10.0)): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "broadcast baseline scoring must carry no state store rows")
      // 2 of every 20 inputs are wild for their key
      assert(spark.table("sb_anom").count() == 8)
    } finally q.stop()
  }

  test("broadcast model-map scoring (q8p shape) is stateless") {
    implicit val sql = spark.sqlContext
    // the DSIR serve shape: the trained model folded to ONE map row
    // broadcast onto the stream, the whole per-doc weight computed by a
    // row-local aggregate HOF — no explode, no streaming aggregation,
    // zero state rows regardless of ingest volume
    val model = Seq(1).toDF("k")
      .select(lit(1).as("k"),
        map_from_entries(array(
          struct(lit(3).as("f"), lit(BigDecimal(0.5)).cast("decimal(30,12)").as("term")),
          struct(lit(7).as("f"), lit(BigDecimal(-0.25)).cast("decimal(30,12)").as("term"))))
          .as("tmap"),
        lit(BigDecimal(-1.0)).cast("decimal(30,12)").as("prior"))
    val in = MemoryStream[(Timestamp, Long, String)]
    val scored = in.toDF().toDF("ts", "doc_id", "fcsv")
      .withColumn("fs", expr("transform(split(fcsv, ','), x -> CAST(x AS INT))"))
      .withColumn("k", lit(1))
      .join(org.apache.spark.sql.functions.broadcast(model), Seq("k"))
      .withColumn("w", expr(
        """aggregate(fs, CAST(0 AS DECIMAL(30,12)),
           (acc, f) -> CAST(acc + coalesce(element_at(tmap, f), prior)
             AS DECIMAL(30,12)))"""))
      .select(col("doc_id"), col("w").cast("double").as("w"))
    val q = scored.writeStream.format("memory").queryName("sb_dsir")
      .outputMode("append").start()
    try {
      for (c <- 0 until 4) {
        in.addData((0 until 10).map(i =>
          (hourTs(c), c * 10L + i, if (i % 2 == 0) "3,7" else "3,9")): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "broadcast model-map scoring must carry no state store rows")
      val rows = spark.table("sb_dsir").as[(Long, Double)].collect().toMap
      assert(rows.size == 40)
      // even docs: 0.5 - 0.25 = 0.25; odd docs: 0.5 + prior(-1.0) = -0.5
      assert(rows(0L) == 0.25 && rows(1L) == -0.5)
    } finally q.stop()
  }

  test("broadcast vocab-map encode (qc3/qc4 shape) is stateless") {
    implicit val sql = spark.sqlContext
    // the streaming tokenizer-encode shape: the trained per-word table
    // folded to ONE map row broadcast onto the stream; kept words =
    // row-local filter against the map keys (the batch side's inner
    // join), accounting = size + aggregate HOFs — no explode, no
    // streaming aggregation, zero state rows regardless of ingest
    val model = Seq(1).toDF("k")
      .select(lit(1).as("k"),
        map_from_entries(array(
          struct(lit("aa").as("w"), lit(2L).as("np")),
          struct(lit("bb").as("w"), lit(3L).as("np")))).as("np_map"))
    val in = MemoryStream[(Timestamp, Long, String)]
    val enc = in.toDF().toDF("ts", "doc_id", "text")
      .withColumn("k", lit(1))
      .join(org.apache.spark.sql.functions.broadcast(model), Seq("k"))
      .withColumn("__ws", expr(
        "filter(split(text, ' '), w -> map_contains_key(np_map, w))"))
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        expr("aggregate(__ws, CAST(0 AS BIGINT), " +
          "(a, w) -> a + element_at(np_map, w))").as("n_pieces"))
    val q = enc.writeStream.format("memory").queryName("sb_vocab")
      .outputMode("append").start()
    try {
      for (c <- 0 until 4) {
        in.addData((0 until 10).map(i =>
          (hourTs(c), c * 10L + i,
            if (i % 3 == 0) "aa bb aa" else if (i % 3 == 1) "aa zz"
            else "zz yy")): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "vocab-map encode must carry no state store rows")
      val rows = spark.table("sb_vocab")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      // i%3==2 docs ("zz yy") have no trained word and vanish — the
      // inner-join rule; the rest account exactly
      assert(rows.size == 28, s"expected 28 surviving docs, got ${rows.size}")
      assert(rows(0L) == ((3L, 7L)) && rows(1L) == ((1L, 2L)))
      assert(!rows.contains(2L))
    } finally q.stop()
  }

  test("broadcast band-index probe (q8o shape) is stateless") {
    implicit val sql = spark.sqlContext
    // the image-dedup shape: a broadcast (band, key) index probed per
    // batch by an equi join — zero state rows, hits bounded by collisions
    val index = Seq((0, 7, 100L), (1, 9, 101L)).toDF("band", "key", "id_hist")
    val in = MemoryStream[(Timestamp, Int, Int, Long)]
    val hits = in.toDF().toDF("ts", "band", "key", "id_new")
      .join(org.apache.spark.sql.functions.broadcast(index), Seq("band", "key"))
      .select(col("id_new"), col("id_hist"))
    val q = hits.writeStream.format("memory").queryName("sb_bands")
      .outputMode("append").start()
    try {
      for (c <- 0 until 4) {
        in.addData((0 until 8).map(i =>
          (hourTs(c), i % 4, 7, 200L + i)): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "band-index probe must carry no state store rows")
      // per batch only (band=0, key=7) rows hit the index: 2 of 8
      assert(spark.table("sb_bands").count() == 8)
    } finally q.stop()
  }

  test("foreachBatch generation fold (q8r/qc9/qd5 shape) is stateless") {
    implicit val sql = spark.sqlContext
    // the index-maintenance folds' shape: every micro-batch runs a
    // BATCH job against persisted generation files inside foreachBatch
    // (merge / compact / tombstone append) — the streaming side itself
    // carries zero state-store rows no matter how many generations
    // accrete, because all cross-batch memory lives in the batch-id-
    // keyed files, never the state store. The pin matters: rewriting
    // any fold as a streaming aggregation (e.g. a running tombstone
    // set via groupBy) would put the FULL id history in state.
    val root = java.nio.file.Files
      .createTempDirectory("graft_sb_genfold").toString
    spark.range(0).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$root/gen_v0")
    val in = MemoryStream[(Long, String)]
    val folds = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = in.toDF().toDF("doc_id", "op").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val v = folds.getAndIncrement()
        spark.read.parquet(s"$root/gen_v$v")
          .unionByName(batch.filter(col("op") === "delete").select(col("doc_id")))
          .write.mode("overwrite").parquet(s"$root/gen_v${v + 1}")
        ()
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_sb_genfold_ckpt").toString)
      .start()
    try {
      for (c <- 0 until 4) {
        in.addData((0 until 10).map(i =>
          (c * 10L + i, if (i % 2 == 0) "insert" else "delete")): _*)
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "generation fold must carry no state store rows")
      // the cross-batch memory is all in the files: 4 batches × 5
      // deletes accreted into the final generation
      assert(spark.read.parquet(s"$root/gen_v${folds.get()}").count() == 20)
    } finally q.stop()
  }

  test("row-local capped-set serve (q8q shape) is stateless") {
    implicit val sql = spark.sqlContext
    // the streaming near-dup serve shape: the drop list folded to ONE
    // broadcast row, the capped set computed row-locally by
    // array_except (the batch side's explode→anti-join→collect_set
    // would be a stateful streaming aggregation), then a stream-static
    // probe of the persisted index — zero state rows end to end
    val hotArr = Seq(Tuple1(Seq("the cat sat"))).toDF("hot")
    val index = Seq(("a b", 1L), ("c d", 2L)).toDF("sh", "mid")
    val in = MemoryStream[(Long, Seq[String])]
    val probed = in.toDF().toDF("doc_id", "sh0")
      .crossJoin(org.apache.spark.sql.functions.broadcast(hotArr))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array_except(
            col("sh0"), col("hot"))).as("sh"))
      .join(index, Seq("sh"))
      .select(col("doc_id"), col("mid"))
    val q = probed.writeStream.format("memory").queryName("sb_capserve")
      .outputMode("append").start()
    try {
      for (_ <- 0 until 3) {
        in.addData((0L, Seq("the cat sat", "a b")), (1L, Seq("x y")))
        q.processAllAvailable()
      }
      assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "capped-set serve must carry no state store rows")
      // doc 0's hot shingle is dropped row-locally; its 'a b' hits the
      // index once per batch, doc 1 never matches
      assert(spark.table("sb_capserve").count() == 3)
    } finally q.stop()
  }
}
