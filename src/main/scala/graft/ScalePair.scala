package graft

/** N-vs-4N scaling measurement with HONEST executor emulation.
  *
  * BASELINE.json demands ≥0.8 throughput scaling efficiency from N to
  * 4N EXECUTORS. This sandbox has no cluster, so round 1 measured
  * local[8] vs local[32] inside ONE JVM — which under-reports real
  * executor scaling: all 32 "executor" threads share a single G1 young
  * gen, and the allocation-heavy extraction loop turns that into a GC
  * convoy (~9 s of young-GC pauses over a ~30 s run; a zero-allocation
  * burn scales at 0.93 on the same host — BASELINE.md round 1).
  *
  * This harness emulates executors the way a cluster actually runs
  * them: N = one 8-core JVM with its own heap; 4N = FOUR 8-core JVMs,
  * each with its own heap and GC, processing disjoint file slices of
  * the same staged input concurrently. Efficiency =
  * T_N / (4 × T_4N), with T_4N = the slowest leg (all legs start on a
  * shared barrier after warmup). Byte-identity across parallelism
  * levels is asserted by exact checksum: the four legs' partial
  * xxhash64 sums must add to the single leg's total.
  *
  * Standalone: `sbt "runMain graft.ScalePair <stagedParquetDir>"`.
  * Bench calls `run(...)` and folds the numbers into its JSON line.
  */
object ScalePair {

  /** Host steal telemetry from /proc/stat's aggregate cpu line:
    * (stealTicks, totalTicks). This host shows multi-minute steal
    * bursts that poisoned the round-2 driver bench capture ~40× low
    * (VERDICT r2 "What's wrong" #2); recording the steal delta around
    * every measured phase makes a poisoned capture machine-detectable
    * in the BENCH json itself. Returns (-1,-1) where /proc/stat is
    * unavailable. */
  def stealTicks(): (Long, Long) = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat", "UTF-8")
      try {
        val line = src.getLines().find(_.startsWith("cpu ")).get
        // fields: user nice system idle iowait irq softirq steal
        // [guest guest_nice] — guest time is already folded into
        // user/nice, so summing beyond the first 8 double-counts it
        // and deflates the steal percentage
        val f = line.trim.split("\\s+").drop(1).map(_.toLong).take(8)
        val steal = if (f.length > 7) f(7) else 0L
        (steal, f.sum)
      } finally src.close()
    } catch { case _: Exception => (-1L, -1L) }
  }

  /** Steal percentage over a window: run `f`, return (result, steal%
    * of total cpu ticks in the window; -1 if unreadable). */
  def withSteal[A](f: => A): (A, Double) = {
    val (s0, t0) = stealTicks()
    val r = f
    val (s1, t1) = stealTicks()
    val pct =
      if (s0 < 0 || s1 < 0 || t1 <= t0) -1.0
      else 100.0 * (s1 - s0).toDouble / (t1 - t0).toDouble
    (r, pct)
  }

  final case class Leg(docs: Long, seconds: Double, checksum: java.math.BigDecimal)

  /** @param efficiency   weak-scaling: one executor's time on its slice
    *   alone vs the SAME slice when 4 executors run concurrently —
    *   t_alone/t_concurrent == thr(4N)/(4·thr(N)) since per-executor
    *   work is identical in both legs. This is the executor-scaling
    *   number a real cluster reports for an embarrassingly parallel
    *   job (no shuffle crosses executors in the extract stage).
    * @param strongEfficiency same-total-input shape: one executor over
    *   ALL docs vs 4 over quarters — additionally penalized by
    *   fixed-per-job overhead amortization (the single leg amortizes
    *   planning/scheduling 4× better), so it UNDERSTATES executor
    *   scaling; reported for completeness. ADVISORY ONLY: `valid`
    *   deliberately does not gate on it — the full leg pushes 4× the
    *   data through the same fixed heap, so GC superlinearity alone
    *   produces strong > 1 on a clean host (observed in 9/36 clean
    *   history pairs, up to 1.68), and a steal burst hitting only the
    *   full leg skews it the same direction. Bench therefore computes
    *   the strong headline over the (0, 1.05] subset and labels it
    *   advisory in the JSON rather than discarding weakly-valid runs.
    * @param checksumMatch the 4 legs' xxhash64 partial sums add up to
    *   the full-input leg's sum exactly (byte-identity across
    *   parallelism levels).
    * @param stealPct host steal (% of cpu ticks) over the whole pair
    *   window — a high value marks the RUN as untrustworthy, not the
    *   engine (see stealTicks); per-leg windows in stealAlonePct /
    *   steal4nPct / stealFullPct. */
  final case class Result(
      nDocsPerSec: Double, n4DocsPerSec: Double, efficiency: Double,
      strongEfficiency: Double, checksumMatch: Boolean,
      tAlone: Double, t4N: Double, tFull: Double, stealPct: Double = -1.0,
      stealAlonePct: Double = -1.0, steal4nPct: Double = -1.0,
      stealFullPct: Double = -1.0) {
    /** A physically meaningful weak-scaling measurement: >1.05 means
      * the alone leg was steal-hit (the measurement is invalid, not
      * that scaling is superlinear); ≤0 is a degenerate capture; and a
      * run whose legs did not byte-identically reproduce the input
      * (checksum mismatch) measured the wrong computation entirely.
      *
      * Internal-consistency gate (r6 — VERDICT r5 "what's wrong" #1:
      * a pair with t_4N 12.25 s vs t_full 6.88 s passed as valid AND
      * clean and dragged every median it touched): t_4N ≤ 1.1·t_full.
      * Four concurrent quarter-legs taking longer than ONE leg over
      * the FULL input is impossible as genuine contention — it marks
      * host-level interference the steal counters did not see. (The
      * t_4N-vs-t_alone direction is already bounded by the efficiency
      * ≤ 1.05 cap — eff = t_alone/t_4N.) Uses times every history row
      * already records. */
    def valid: Boolean =
      efficiency > 0.0 && efficiency <= 1.05 && checksumMatch &&
        t4N <= tFull * 1.1

    /** The strong-shape number is physically meaningful under the same
      * rule (see strongEfficiency scaladoc: GC superlinearity or a
      * full-leg steal burst pushes it past 1); Bench tops pairs up
      * until enough of THESE exist too (VERDICT r4 #6). */
    def strongValid: Boolean =
      valid && strongEfficiency > 0.0 && strongEfficiency <= 1.05
  }

  /** Pre-flight steal gate (VERDICT r4 #7): probe host steal over
    * short windows and delay the measurement while the host is
    * storming, bounded by `maxWaitMs`. Returns the last probe's
    * steal%, so the caller can record whether it gave up waiting.
    * This raises the fraction of pairs that land in clean windows —
    * it never edits the record (poisoned pairs that slip through are
    * still appended and self-identify via their steal markers). */
  @volatile private var spinSink: Long = 0L // defeats loop elision

  /** Burn every core for `ms` — the probe load for [[awaitCalm]].
    * Measured r5: this host's steal is LOAD-DEPENDENT — an idle probe
    * window reads 0.000% while a simultaneous 32-core burst reads
    * 2-10% (six consecutive standalone pairs pre-flighted at ~0% idle
    * steal all landed on 2.3-9.1% 4N-window steal). An idle probe is
    * therefore structurally blind to exactly the weather that poisons
    * the 4N leg; probing under full-width load measures the quantity
    * the measurement will experience. */
  private def busySpin(ms: Long): Unit = {
    val deadline = System.nanoTime() + ms * 1000000L
    val n = Runtime.getRuntime.availableProcessors()
    val ts = (1 until n).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (System.nanoTime() < deadline) x += 1
        spinSink = x
      })
      t.setDaemon(true); t.start(); t
    }
    var x = 0L
    while (System.nanoTime() < deadline) x += 1
    spinSink = x
    ts.foreach(_.join())
  }

  def awaitCalm(thresholdPct: Double = 0.3, probeMs: Long = 2000,
                backoffMs: Long = 15000, maxWaitMs: Long = 120000,
                loaded: Boolean = true): Double = {
    val t0 = System.nanoTime()
    var last = -1.0
    var first = true
    while (first || (last > thresholdPct &&
        (System.nanoTime() - t0) / 1e6 < maxWaitMs)) {
      if (!first) Thread.sleep(backoffMs)
      first = false
      val (_, pct) = withSteal(
        if (loaded) busySpin(probeMs) else Thread.sleep(probeMs))
      last = pct
      if (last < 0) return last // /proc/stat unreadable — nothing to wait on
    }
    last
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork one ScaleLeg JVM over `files`; returns the running process.
    * Every leg gets the same per-executor heap + GC flags AND an
    * 8-CPU view of the machine (`taskset` pinning to a disjoint core
    * range + `-XX:ActiveProcessorCount`), exactly like a cluster
    * executor in a cpu-limited container — without this each JVM sizes
    * its GC/JIT/common pools for all 32 host CPUs and four legs thrash
    * each other (measured: leg medians 3–14.5 s for identical slices). */
  private def fork(files: Seq[String], cores: Int, tag: String,
                   dir: java.io.File, reps: Int, heap: String,
                   cpuRange: Option[String]): (Process, java.io.File, java.io.File) = {
    val fileList = new java.io.File(dir, s"$tag.files")
    val w = new java.io.PrintWriter(fileList, "UTF-8")
    files.foreach(w.println); w.close()
    val ready = new java.io.File(dir, s"$tag.ready")
    val start = new java.io.File(dir, s"$tag.start")
    val result = new java.io.File(dir, s"$tag.result")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val pin = cpuRange.toSeq
      .filter(_ => new java.io.File("/usr/bin/taskset").exists())
      .flatMap(r => Seq("/usr/bin/taskset", "-c", r))
    // -Xms=-Xmx + AlwaysPreTouch: commit and zero the whole heap at
    // startup (Spark sets executor Xms=Xmx for the same reason) —
    // otherwise the first measured reps pay heap-growth page faults
    // (observed: leg rep sequences like 44s→9s→3s without this)
    val cmd = pin ++ Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx$heap", s"-Xms$heap", "-XX:+AlwaysPreTouch",
      "-XX:MaxGCPauseMillis=1000", "-XX:G1HeapRegionSize=16m",
      s"-XX:ActiveProcessorCount=$cores",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.ScaleLeg", fileList.getPath, cores.toString,
      ready.getPath, start.getPath, result.getPath, reps.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(dir, s"$tag.log"))
    (pb.start(), ready, start)
  }

  private def awaitLeg(p: Process, result: java.io.File, timeoutSec: Long): Leg = {
    if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
      p.destroyForcibly()
      throw new IllegalStateException(s"scale leg timed out: ${result.getName}")
    }
    require(p.exitValue() == 0, s"scale leg failed rc=${p.exitValue()}: ${result.getName}")
    val Array(docs, secs, sum) =
      scala.io.Source.fromFile(result, "UTF-8").mkString.trim.split(" ")
    Leg(docs.toLong, secs.toDouble, new java.math.BigDecimal(sum))
  }

  /** Run the pair over an already-staged parquet directory. */
  def run(stageDir: String, cores: Int = 8, legs: Int = 4,
          reps: Int = 3, heap: String = "6g"): Result = {
    val (r, steal) = withSteal(runInner(stageDir, cores, legs, reps, heap))
    r.copy(stealPct = steal)
  }

  private def runInner(stageDir: String, cores: Int, legs: Int,
                       reps: Int, heap: String): Result = {
    val files = new java.io.File(stageDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    require(files.size >= legs, s"need ≥$legs staged files, found ${files.size}")
    val work = java.nio.file.Files.createTempDirectory("graft-scale").toFile

    val slices = files.zipWithIndex.groupBy(_._2 % legs).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))

    // ---- N side (weak scaling): ONE executor-JVM over slice 0, alone ----
    // per-phase steal windows: a burst that hits only the 4N window
    // (observed: efficiency 0.48 with the pair-average steal at 0.4%)
    // is identifiable from the record without replaying the run
    val (alone, stealAlone) = withSteal {
      val (pa, readyA, startA) =
        fork(slices.head, cores, "alone", work, reps, heap, Some(s"0-${cores - 1}"))
      while (!readyA.exists()) Thread.sleep(20)
      startA.createNewFile()
      awaitLeg(pa, new java.io.File(work, "alone.result"), 1800)
    }

    // ---- 4N side: `legs` executor-JVMs over the disjoint slices,
    // each pinned to its own core range (= one executor per "node slot") ----
    val (legsR, steal4n) = withSteal {
      val procs = slices.zipWithIndex.map { case (slice, i) =>
        fork(slice, cores, s"m$i", work, reps, heap,
          Some(s"${i * cores}-${(i + 1) * cores - 1}"))
      }
      procs.foreach { case (_, ready, _) => while (!ready.exists()) Thread.sleep(20) }
      procs.foreach { case (_, _, start) => start.createNewFile() } // barrier release
      procs.zipWithIndex.map { case ((p, _, _), i) =>
        awaitLeg(p, new java.io.File(work, s"m$i.result"), 1800)
      }
    }

    // ---- full-input leg: strong-shape baseline + global checksum ----
    val (full, stealFull) = withSteal {
      val (pf, readyF, startF) =
        fork(files, cores, "full", work, reps, heap, Some(s"0-${cores - 1}"))
      while (!readyF.exists()) Thread.sleep(20)
      startF.createNewFile()
      awaitLeg(pf, new java.io.File(work, "full.result"), 1800)
    }

    val t4 = legsR.map(_.seconds).max // wall = slowest executor
    val docs = full.docs
    val sum4 = legsR.map(_.checksum).reduce(_.add(_))
    Result(
      nDocsPerSec = alone.docs / alone.seconds,
      n4DocsPerSec = docs / t4,
      efficiency = alone.seconds / t4, // same slice 0: alone vs concurrent
      strongEfficiency = (docs / t4) / (legs * (docs / full.seconds)),
      checksumMatch = sum4.compareTo(full.checksum) == 0 &&
        legsR.map(_.docs).sum == docs,
      tAlone = alone.seconds, t4N = t4, tFull = full.seconds,
      stealAlonePct = stealAlone, steal4nPct = steal4n, stealFullPct = stealFull)
  }

  /** One cumulative-record JSONL line per pair run — shared by Bench's
    * in-capture appends and the standalone `main` below, so a
    * calm-window standalone run reaches the committed history instead
    * of evaporating on stdout (the r5 gap: six standalone runs printed
    * and were lost until hand-appended). The two per-leg doc rates
    * ride along for the turbo-skew diagnosis BASELINE.md describes
    * (the honest summary is the pair of rates, not the ratio alone). */
  def historyLine(r: Result, benchDocs: Long, cores: Int): String =
    f"""{"ts_ms":${System.currentTimeMillis()},"cores_per_executor":$cores,"bench_docs":$benchDocs,"efficiency":${r.efficiency}%.4f,"strong_efficiency":${r.strongEfficiency}%.4f,"n_docs_per_sec":${r.nDocsPerSec}%.1f,"n4_docs_per_sec":${r.n4DocsPerSec}%.1f,"t_alone":${r.tAlone}%.3f,"t_4n":${r.t4N}%.3f,"t_full":${r.tFull}%.3f,"checksum_match":${r.checksumMatch},"steal_pct":${r.stealPct}%.3f,"steal_alone_pct":${r.stealAlonePct}%.3f,"steal_4n_pct":${r.steal4nPct}%.3f,"steal_full_pct":${r.stealFullPct}%.3f,"valid":${r.valid}}"""

  /** Append lines to the cumulative record (best-effort — a read-only
    * checkout must not fail the measurement that produced the data). */
  def appendHistory(lines: Seq[String],
                    path: String = sys.env.getOrElse("SPARK_GRAFT_HISTORY",
                      "scaling_history.jsonl")): Unit =
    try {
      val w = new java.io.FileWriter(path, true)
      try lines.foreach(l => w.write(l + System.lineSeparator()))
      finally w.close()
    } catch { case e: Exception =>
      System.err.println(s"[scalepair] history append failed: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    val stage = args.headOption.getOrElse("/tmp/graft-bench-pages-480000")
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // same loaded-probe pre-flight Bench uses before its pairs
    val pre = awaitCalm()
    System.err.println(f"[scalepair] pre-flight loaded-steal $pre%.3f%%")
    val r = run(stage, cores = cores, reps = reps)
    // the staged dir is named .../graft-bench-pages-<nDocs> by Bench
    val nDocs = "([0-9]+)$".r.findFirstIn(stage).map(_.toLong).getOrElse(480000L)
    appendHistory(Seq(historyLine(r, benchDocs = nDocs, cores = cores)))
    println(f"""{"metric":"scaling","cores_per_executor":$cores,"n_docs_per_sec":${r.nDocsPerSec}%.1f,"n4_docs_per_sec":${r.n4DocsPerSec}%.1f,"efficiency":${r.efficiency}%.3f,"strong_efficiency":${r.strongEfficiency}%.3f,"checksum_match":${r.checksumMatch},"t_alone":${r.tAlone}%.2f,"t_4n":${r.t4N}%.2f,"t_full":${r.tFull}%.2f,"steal_pct":${r.stealPct}%.3f,"steal_alone_pct":${r.stealAlonePct}%.3f,"steal_4n_pct":${r.steal4nPct}%.3f,"steal_full_pct":${r.stealFullPct}%.3f,"valid":${r.valid}}""")
  }
}
