package graft

import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GenerationChain, NnDescent}

/** The compaction-vs-maintenance race (round-15 verdict #4): a live
  * insert fold and an out-of-band compactor both targeting the graph
  * index's generation chain must LINEARIZE through the claim fence —
  * neither result orphaned, every committed generation derived from the
  * committed head it claimed against, and the final state bit-equal to
  * the serial replay of whichever order the race produced. Without the
  * fence both writers read head 0 and overwrite each other's gen_1 (the
  * lost-update anomaly this spec's last test demonstrates). */
class GenerationFenceSpec extends SparkSpec {

  private def embeddings(n: Int): DataFrame = {
    import spark.implicits._
    // deterministic clustered corpus (the GraphInsertPropSpec recipe,
    // minimal): 4 clusters in 8-d, ids 0..n-1, cluster = id % 4
    (0 until n).map { i =>
      val c = i % 4
      val e = Array.tabulate(8)(d =>
        (if (d % 4 == c) 1.0f else 0.0f) + (i * 31 + d * 7) % 13 * 0.01f)
      (i.toLong, e)
    }.toDF("vec_id", "embedding")
  }

  private def frames(df: DataFrame): Seq[String] =
    df.select(col("vec_id"), col("nid"), round(col("c"), 6).as("c"))
      .collect().map(_.toString).sorted.toSeq

  test("fold races compaction: both land, chain linear, final equals serial replay") {
    val e = embeddings(48)
    val nBase = 40L
    val base = e.filter(col("vec_id") < nBase)
    val delta = e.filter(col("vec_id") >= nBase)
    // two trials bias the race each way (delay the other thread's claim)
    for ((delayFold, trial) <- Seq((false, 0), (true, 1))) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_genfence_$trial").toString
      // generation 0: the base build, committed through the fence
      val (s0, b0) = GenerationChain.claimNext(root)
      assert((s0, b0) == ((0, -1)))
      NnDescent.knnGraph(base).write.mode("overwrite")
        .parquet(GenerationChain.genPath(root, 0))
      GenerationChain.commit(root, 0)

      val barrier = new CyclicBarrier(2)
      @volatile var foldSlot = -1
      @volatile var foldBasis = -1
      @volatile var compSlot = -1
      @volatile var compBasis = -1
      val folder = new Thread(() => {
        barrier.await()
        if (delayFold) Thread.sleep(40)
        val (s, b) = GenerationChain.claimNext(root, graceMs = 60000L)
        foldSlot = s; foldBasis = b
        val prev = spark.read.parquet(GenerationChain.genPath(root, b))
        NnDescent.insertDeltaOf(e, prev, nBase, delta)
          .write.mode("overwrite").parquet(GenerationChain.genPath(root, s))
        GenerationChain.commit(root, s)
      })
      val compactor = new Thread(() => {
        barrier.await()
        if (!delayFold) Thread.sleep(40)
        // the production surface: claim → compact committed head → commit
        val s = NnDescent.compactFenced(spark, e, root)
        compSlot = s; compBasis = s - 1
      })
      folder.start(); compactor.start()
      folder.join(300000); compactor.join(300000)

      // chain linear: slots {1, 2}, each derived from the previous head
      assert(Set(foldSlot, compSlot) == Set(1, 2),
        s"trial $trial: slots ($foldSlot, $compSlot) not linear")
      assert(foldBasis == foldSlot - 1 && compBasis == compSlot - 1,
        s"trial $trial: a writer folded against a non-head basis " +
          s"(fold $foldBasis/$foldSlot, compact $compBasis/$compSlot)")
      assert(GenerationChain.latest(root) == 2)

      // linearizability: the final generation bit-equals the SERIAL
      // replay of the committed order
      val expected =
        if (foldSlot < compSlot) {
          val g1 = NnDescent.insertDeltaOf(e,
            spark.read.parquet(GenerationChain.genPath(root, 0)), nBase, delta)
          NnDescent.compact(e, g1)
        } else {
          val g1 = NnDescent.compact(e,
            spark.read.parquet(GenerationChain.genPath(root, 0)))
          NnDescent.insertDeltaOf(e, g1, nBase, delta)
        }
      val got = spark.read.parquet(GenerationChain.genPath(root, 2))
      assert(frames(got) == frames(expected),
        s"trial $trial: final generation diverges from the serial replay " +
          s"(order: ${if (foldSlot < compSlot) "fold→compact" else "compact→fold"})")
      // and when the compactor lands LAST the head equals rebuild-over-
      // live exactly (compact ≡ build(live), the qb5 contract)
      if (compSlot == 2) {
        val live = e.join(got.select(col("vec_id")).distinct(),
          Seq("vec_id"), "left_semi")
        assert(frames(got) == frames(NnDescent.knnGraph(live)),
          s"trial $trial: compacted head must equal rebuild over live")
      }
    }
  }

  test("a stale claim (crashed writer) is stepped over after the grace window") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_genfence_stale").toString
    val (s0, _) = GenerationChain.claimNext(root)
    GenerationChain.commit(root, s0)
    // plant a corpse: claim_1 exists, no done_1, mtime aged past grace
    val corpse = java.nio.file.Paths.get(s"$root/claim_1")
    java.nio.file.Files.createFile(corpse)
    java.nio.file.Files.setLastModifiedTime(corpse,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    val t0 = System.nanoTime()
    val (s1, b1) = GenerationChain.claimNext(root, graceMs = 1000L)
    assert((s1, b1) == ((1, 0)),
      s"stale claim must be reaped and the slot re-claimed, got ($s1, $b1)")
    assert((System.nanoTime() - t0) / 1e6 < 5000,
      "reaping a stale claim must not wait out the full grace repeatedly")
  }

  test("without the fence the naive head+1 protocol loses an update (the anomaly)") {
    // documentation-by-demonstration: two writers that each read head 0
    // and write gen_1 directly — the second overwrite orphans the first
    // result. This is exactly the anomaly the claim fence removes.
    val root = java.nio.file.Files
      .createTempDirectory("graft_genfence_naive").toString
    import spark.implicits._
    Seq((1L, 2L, 0.9)).toDF("vec_id", "nid", "c")
      .write.mode("overwrite").parquet(s"$root/gen_1")
    Seq((7L, 8L, 0.1)).toDF("vec_id", "nid", "c")
      .write.mode("overwrite").parquet(s"$root/gen_1")
    val survivors = spark.read.parquet(s"$root/gen_1")
      .select(col("vec_id")).as[Long].collect().toSet
    assert(survivors == Set(7L), "the first writer's generation is gone")
  }
}
