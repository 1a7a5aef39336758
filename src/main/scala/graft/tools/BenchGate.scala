package graft.tools

/** Bench regression gate: diff a `graft.Bench` artifact against the
  * committed per-query baseline and FAIL (non-zero exit) on regression —
  * the 2× rule the round judges apply by hand, as a tool that can run in
  * CI order (`sbt "runMain graft.tools.BenchGate"`).
  *
  * Rules (from BASELINE_LOCAL.md's own reading discipline):
  *   - a `"contended": true` artifact is REFUSED outright — its timings
  *     are unusable (the calibration sentinel disagreed >2× across the
  *     run), and treating them as regressions OR as passes would both be
  *     wrong;
  *   - a query the artifact records as FAILED (Bench writes -1 for a
  *     query that threw) fails the gate — a crash is worse than a
  *     regression, never invisible;
  *   - a baseline query MISSING from the artifact entirely fails the
  *     gate — a query that silently vanished from the suite must not
  *     pass by omission;
  *   - a per-query ratio > 2.0× vs baseline fails the gate, but only when
  *     the measured time also exceeds baseline + 1.5 s — an ADDITIVE
  *     allowance for per-JVM bimodal fixed costs (streaming micro-batch
  *     machinery and JIT tiering flip a ~1 s drain to ~2.3 s for a whole
  *     JVM at a time, and no set of clean baseline runs is guaranteed to
  *     contain the slow mode; the round-10 q83 incident). Mode flips are
  *     additive; real regressions in data-proportional work are
  *     multiplicative and trip the 2× arm regardless. This subsumes the
  *     old 1.0 s sub-second-jitter floor. The measured
  *     time judged is the STEADY-STATE estimate over the artifact's full
  *     per-query attempt sample ([[steadyEstimate]]), not the headline
  *     min — the gate owns the acceptance rule, the measurement loop
  *     just reports every sample;
  *   - queries missing from the baseline (new this round) are reported
  *     informationally and pass — they get a baseline entry at the next
  *     re-baselining;
  *   - the suite TOTAL is held to the same 2× rule, computed over the
  *     INTERSECTION of query sets (per-query times summed on both
  *     sides), so new queries' time can never push the total comparison
  *     past 2× against an older, smaller baseline;
  *   - when both sides carry a speed index and this run's box is FASTER
  *     than the baseline's (speed ratio < 1), the shared total re-priced
  *     at baseline speed is held to the same 2× line — machine drift
  *     must not mask a uniform regression (round 16; the slower-box
  *     direction stays raw-gated: normalization never excuses a raw >2×).
  *
  * Usage: `sbt "runMain graft.tools.BenchGate [benchJson] [baselineMd]"`
  * (defaults: BENCH_LOCAL.json, BASELINE_LOCAL.md in the repo root).
  */
object BenchGate {

  /** Most >2x violations a single artifact may excuse via verified
    * per-query sentinel evidence before the whole artifact is refused
    * as measured-under-load (see the partition in [[check]]). */
  val MaxSuspectDowngrades = 2

  final case class Violation(query: String, baseSec: Double, gotSec: Double) {
    def ratio: Double = gotSec / baseSec
    override def toString: String =
      f"$query: $gotSec%.3fs vs baseline $baseSec%.3fs (${ratio}%.2fx > 2x)"
  }

  /** Gate outcome for an accepted (uncontended) artifact. The gate
    * passes iff `violations`, `failedQueries` and `missingQueries` are
    * ALL empty; `newQueries` is informational. `suspectViolations` are
    * >2x timings whose measurement window the artifact itself records
    * as sentinel-inflated (see [[parseSuspect]]) — reported as warnings,
    * the per-query twin of the whole-run contended refusal: neither a
    * pass (the timing is not evidence of health) nor a failure (it is
    * not evidence of regression either — the machine was loaded). */
  final case class GateResult(
      violations: Seq[Violation],
      newQueries: Seq[String],
      failedQueries: Seq[String],
      missingQueries: Seq[String],
      suspectViolations: Seq[Violation] = Nil,
      // informational machine-speed normalization (round-15): the raw
      // shared-total ratio, and the same ratio scaled by baselineSpeed /
      // artifactSpeed when BOTH sides recorded a speed index (the
      // median calibration probe). Never part of `pass` — the gate
      // judges raw like-for-like numbers; these exist so cross-round
      // totals stay readable while the box drifts between speed states.
      rawTotalRatio: Option[Double] = None,
      normalizedTotalRatio: Option[Double] = None,
      speedRatio: Option[Double] = None) {
    def pass: Boolean =
      violations.isEmpty && failedQueries.isEmpty && missingQueries.isEmpty
  }

  // optional leading '-' so Bench's -1 failure sentinel parses instead of
  // silently vanishing from the artifact (a crashed query must be seen)
  private val QueryTimeRe = """"(q[0-9a-z][0-9a-z_]*)":(-?[0-9.]+)""".r
  private val QueryAttemptsRe = """"(q[0-9a-z][0-9a-z_]*)":\[([0-9.,\-]*)\]""".r
  private val ContendedRe = """"contended":(true|false)""".r
  private val CpusRe = """"cpus":\s*(\d+)""".r
  private val BaselineRowRe = """\|\s*(q[0-9a-z][0-9a-z_]*)\s*\|\s*([0-9.]+)\s*\|""".r
  private val BaselineCpusHeadRe = """(?m)^#+ .*\bcpus\s*=\s*(\d+)""".r

  def parseBench(json: String): (Map[String, Double], Boolean) = {
    val qs = QueryTimeRe.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val contended = ContendedRe.findFirstMatchIn(json).exists(_.group(1) == "true")
    (qs, contended)
  }

  def parseCpus(json: String): Option[Int] =
    CpusRe.findFirstMatchIn(json).map(_.group(1).toInt)

  private val SpeedIndexRe = """"speed_index":\s*([0-9.]+)""".r
  private val BaselineSpeedRe =
    """(?m)^Speed index:\s*([0-9.]+)\s*s""".r

  /** The artifact's recorded machine-speed index (median calibration
    * probe, `"speed_index"` in round-15+ artifacts). */
  def parseSpeedIndex(json: String): Option[Double] =
    SpeedIndexRe.findFirstMatchIn(json).map(_.group(1).toDouble)

  /** Per-environment speed index from the baseline file (`Speed index:
    * X s` under each cpus heading, minted by make_baseline.py from the
    * runs' own recorded indexes). */
  def parseBaselineSpeeds(md: String): Map[Option[Int], Double] = {
    val heads = BaselineCpusHeadRe.findAllMatchIn(md).toSeq
    if (heads.isEmpty)
      BaselineSpeedRe.findFirstMatchIn(md)
        .map(m => (Option.empty[Int], m.group(1).toDouble)).toMap
    else {
      val bounds = heads.map(_.start) :+ md.length
      heads.zipWithIndex.flatMap { case (h, i) =>
        BaselineSpeedRe
          .findFirstMatchIn(md.substring(h.start, bounds(i + 1)))
          .map(m => (Some(h.group(1).toInt): Option[Int]) ->
            m.group(1).toDouble)
      }.toMap
    }
  }

  /** Per-query full attempt sample (`"attempts"` in round-9+ artifacts):
    * every successful execution's timing, in measurement order. Absent
    * for single-attempt queries and in older artifacts. */
  def parseAttempts(json: String): Map[String, Seq[Double]] =
    QueryAttemptsRe.findAllMatchIn(json).map { m =>
      m.group(1) -> m.group(2).split(",").toSeq
        .filter(_.nonEmpty).map(_.toDouble)
    }.toMap

  private val SuspectEntryRe =
    """\{"query":"(q[0-9a-z][0-9a-z_]*)","probe":([0-9.]+),"median":([0-9.]+)\}""".r

  /** Per-query sentinel-inflation evidence (`"suspect"` in round-10+
    * artifacts): queries that still exceeded their gate line after the
    * full confirm escalation WHILE the contention sentinel — sampled at
    * that moment, not at the every-15-queries cadence — read inflated.
    * Each entry carries the probe reading and the run's clean median so
    * this tool re-verifies the suspicion rule instead of trusting the
    * stamp. Query names live inside objects (not as JSON keys) so
    * [[parseBench]]'s timing regex cannot pick them up as timings. */
  def parseSuspect(json: String): Map[String, (Double, Double)] =
    SuspectEntryRe.findAllMatchIn(json).map { m =>
      m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)
    }.toMap

  /** Same bar as Bench.suspiciousProbe (kept inline here: Bench depends
    * on this object, not the reverse): the probe must read both 1.5x the
    * clean median and 60ms above it. */
  def sentinelInflated(probe: Double, cleanMedian: Double): Boolean =
    probe > cleanMedian * 1.5 && probe - cleanMedian > 0.06

  /** Steady-state estimate of a query's cost from its attempt sample:
    * drop the first attempt (it carries Catalyst planning + codegen +
    * JIT cost and is the only sample exposed to a one-off load spike),
    * then the upper median of the warmed rest. Judging this — instead of
    * the min — is what removes the min-of-N pass bias: a genuine
    * marginal regression (true ~2.2x with variance) keeps its median
    * above the line no matter how many re-measures run, while a one-off
    * spike on an otherwise healthy query sinks below it. A single-sample
    * query is its own estimate. */
  /** Upper median of the warmed attempts, tempered by the RECOVERY
    * WINDOW — the upper median of the last 3 warmed attempts. A
    * transient contended stretch early in the sample (q8p round 11:
    * [3.9, 8.3, 14.7, 6.7, 5.3, 3.2] — steady was decided 6.7 by
    * samples taken DURING the stretch even though every re-measure
    * after it came back clean) must not decide the estimate once the
    * tail has recovered. The window can only LOWER the estimate (a
    * genuinely slow query keeps a high tail and is unaffected); late
    * contention still flags, which re-arms the confirm/sentinel
    * machinery built for exactly that case. Baselines are minted with
    * this same statistic (scripts/make_baseline.py mirrors it). */
  def steadyEstimate(attempts: Seq[Double]): Double =
    if (attempts.size <= 1) attempts.headOption.getOrElse(-1.0)
    else {
      def upperMedian(xs: Seq[Double]): Double = {
        val s = xs.sorted; s(s.size / 2)
      }
      val warm = attempts.drop(1)
      math.min(upperMedian(warm), upperMedian(warm.takeRight(3)))
    }

  /** Baseline tables keyed by environment: a heading containing
    * `cpus=N` opens the table for that core count (timings are NOT
    * comparable across core counts — round 7's 8-core baseline graded
    * against a 32-core driver run produced 7 phantom >2x flags). A file
    * with no `cpus=` headings is a single environment-agnostic table
    * under key None (the pre-round-8 format). */
  def parseBaselines(md: String): Map[Option[Int], Map[String, Double]] = {
    val heads = BaselineCpusHeadRe.findAllMatchIn(md).toSeq
    if (heads.isEmpty) {
      val rows = BaselineRowRe.findAllMatchIn(md)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      if (rows.isEmpty) Map.empty else Map(Option.empty[Int] -> rows)
    } else {
      val bounds = heads.map(_.start) :+ md.length
      heads.zipWithIndex.map { case (h, i) =>
        val section = md.substring(h.start, bounds(i + 1))
        val rows = BaselineRowRe.findAllMatchIn(section)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        (Some(h.group(1).toInt): Option[Int]) -> rows
      }.toMap.filter(_._2.nonEmpty)
    }
  }

  /** Left(reason) = artifact refused; Right = graded result. */
  def check(benchJson: String, baselineMd: String): Either[String, GateResult] = {
    val (got, contended) = parseBench(benchJson)
    if (contended) return Left(
      "artifact is stamped \"contended\": true — the calibration sentinel " +
        "disagreed >2x across the run; re-measure on an idle machine " +
        "(a contended run can neither pass nor fail the gate)")
    if (got.isEmpty) return Left("no per-query timings found in the artifact")
    val tables = parseBaselines(baselineMd)
    if (tables.isEmpty) return Left("no baseline rows parsed")
    val cpus = parseCpus(benchJson)
    // like-for-like selection: an artifact stamped with cpus grades only
    // against a baseline cut at the same core count; an unstamped
    // (pre-round-8) artifact grades only against an unsectioned baseline
    val base = tables.get(cpus).orElse(
      // legacy bridge: old flat baseline + new stamped artifact — the
      // flat table was cut at local[8], so only grade cpus=8 against it
      if (cpus.contains(8)) tables.get(None) else None
    ).getOrElse(return Left(
      s"no baseline for cpus=${cpus.map(_.toString).getOrElse("<unstamped>")} — " +
        s"baseline has tables for ${tables.keys.map(_.map(_.toString)
          .getOrElse("<flat>")).toSeq.sorted.mkString(", ")}; timings are not " +
        "comparable across core counts; cut a baseline at this environment " +
        "with scripts/make_baseline.py"))
    val failed = got.filter(_._2 < 0).keys.toSeq.sorted
    val ok = got -- failed
    val attempts = parseAttempts(benchJson)
    // per-query rule judges the STEADY-STATE estimate over the full
    // attempt sample (see steadyEstimate) — the artifact's headline min
    // alone would let one lucky fast sample out of N re-measures pass a
    // genuine marginal regression. Artifacts without attempts arrays
    // (pre-round-9) degrade to judging the headline value, as before.
    val allViolations = ok.toSeq.sorted.flatMap { case (q, sec) =>
      val est = steadyEstimate(attempts.getOrElse(q, Seq(sec)))
      base.get(q) match {
        case Some(b) if est > b * 2.0 && est > b + 1.5 =>
          Some(Violation(q, b, est))
        case _ => None
      }
    }
    // downgrade to warning any violation whose measurement window the
    // artifact records as sentinel-inflated — and only if the recorded
    // evidence actually satisfies the suspicion rule (a stamp without
    // supporting numbers does not downgrade anything)
    val suspects = parseSuspect(benchJson)
    val (suspectViolations, violations) = allViolations.partition(v =>
      suspects.get(v.query).exists { case (p, m) => sentinelInflated(p, m) })
    // the sentinel-downgrade escape hatch is bounded: each downgrade is
    // self-reported evidence, and an artifact where MANY violations all
    // coincided with load windows is not a pass — it is an unusable
    // measurement session, the same verdict the whole-run contended
    // stamp gets. Cap at 2 verified downgrades per artifact (round 10's
    // worst honest run recorded 1); past that, refuse and re-measure.
    if (suspectViolations.size > MaxSuspectDowngrades) return Left(
      s"${suspectViolations.size} >2x violations all carry verified " +
        s"sentinel-inflation evidence (cap $MaxSuspectDowngrades) — too much " +
        "of the run was measured under load to grade; re-measure on an " +
        "idle machine (suspect queries: " +
        s"${suspectViolations.map(_.query).mkString(", ")})")
    // TOTAL over the intersection: sum each side's per-query values for
    // the queries both sides measured — comparable regardless of how
    // many queries were added since the baseline was cut. The artifact
    // side sums the SAME steady-state statistic the per-query arm
    // judges and the baseline was minted from (make_baseline.py mints
    // upper medians of steady estimates) — summing the headline mins
    // here would compare a systematically-low statistic against a
    // steady-minted baseline and let a uniform ~2x steady regression
    // slip under the line. Queries whose measurement the artifact
    // records (with verified evidence) as sentinel-inflated leave the
    // sum on BOTH sides: their timing is ungradable, so letting it
    // inflate the total would smuggle the downgraded violation back in
    // through the aggregate
    val ungradable = suspectViolations.map(_.query).toSet
    val shared = ok.keySet.intersect(base.keySet) -- ungradable
    val sums =
      if (shared.isEmpty) None
      else Some((
        shared.toSeq
          .map(q => steadyEstimate(attempts.getOrElse(q, Seq(ok(q))))).sum,
        shared.toSeq.map(base).sum))
    val totalViolation = sums.collect {
      case (gotSum, baseSum) if gotSum > baseSum * 2.0 =>
        Violation("TOTAL", baseSum, gotSum)
    }
    // informational speed normalization (never gates): ratio of the two
    // medians of the calibration probe — >1 = this run's box slower
    // than the baseline's box
    val speedRatio = for {
      a <- parseSpeedIndex(benchJson)
      b <- parseBaselineSpeeds(baselineMd).get(cpus)
      if b > 0
    } yield a / b
    val rawRatio = sums.collect { case (g, b) if b > 0 => g / b }
    val normRatio = for {
      r <- rawRatio; s <- speedRatio if s > 0
    } yield r / s
    // round-16: the speed-normalized total is BINDING in the MASKING
    // direction. Two rounds of speed_index data showed the box drifting
    // between ambient speed states; a run on a FASTER box (speed ratio
    // < 1) deflates every raw timing, so a genuine uniform regression
    // can sit under the raw 2x line purely on machine drift. When both
    // sides carry a speed index and this run's box is faster, the
    // shared total re-priced at baseline speed (gotSum / speedRatio)
    // must still clear 2x — past it, the gate FAILS instead of
    // footnoting. The opposite direction stays raw-gated: a slower box
    // inflates raw and the raw arm already fires; normalization is
    // never an excuse for a raw >2x total (a claimed slow box must be
    // re-measured, not waved through).
    val normTotalViolation = for {
      (gotSum, baseSum) <- sums
      if totalViolation.isEmpty // raw arm already reports this total
      s <- speedRatio
      if s > 0 && s < 1.0 && baseSum > 0
      if gotSum / s > baseSum * 2.0
    } yield Violation("TOTAL_speed_normalized", baseSum, gotSum / s)
    Right(GateResult(
      violations ++ totalViolation ++ normTotalViolation,
      got.keys.filterNot(base.contains).toSeq.sorted,
      failed,
      base.keys.filterNot(got.contains).toSeq.sorted,
      suspectViolations,
      rawRatio,
      normRatio,
      speedRatio))
  }

  def main(args: Array[String]): Unit = {
    val benchPath = if (args.length > 0) args(0) else "BENCH_LOCAL.json"
    val basePath = if (args.length > 1) args(1) else "BASELINE_LOCAL.md"
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    check(read(benchPath), read(basePath)) match {
      case Left(refusal) =>
        System.err.println(s"[bench-gate] REFUSED: $refusal")
        sys.exit(2)
      case Right(r) =>
        if (r.newQueries.nonEmpty) println(
          s"[bench-gate] ${r.newQueries.size} queries not in baseline (new this " +
            s"round, informational): ${r.newQueries.mkString(", ")}")
        r.suspectViolations.foreach(v => println(
          s"[bench-gate] WARNING (sentinel-inflated, not graded): $v — " +
            "the artifact records the contention sentinel reading high " +
            "during this query's confirm re-measures; re-measure idle " +
            "to grade it"))
        r.failedQueries.foreach(q => System.err.println(
          s"[bench-gate] FAIL: $q recorded as FAILED (-1) in the artifact"))
        r.missingQueries.foreach(q => System.err.println(
          s"[bench-gate] FAIL: baseline query $q missing from the artifact"))
        r.violations.foreach(v => System.err.println(s"[bench-gate] FAIL: $v"))
        for (raw <- r.rawTotalRatio) {
          val speed = r.speedRatio
            .map(s => f" (machine at $s%.2fx baseline speed index)")
            .getOrElse(" (no speed index on one side)")
          val norm = r.normalizedTotalRatio
            .map(n => f", speed-normalized $n%.3fx")
            .getOrElse("")
          println(f"[bench-gate] INFO: shared-total ratio raw $raw%.3fx$norm$speed")
        }
        if (r.pass) {
          println(s"[bench-gate] PASS: no uncontended per-query ratio > 2x, " +
            "no failed or vanished queries")
        } else sys.exit(1)
    }
  }
}
