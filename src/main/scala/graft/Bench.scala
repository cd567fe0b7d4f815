package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark main (driver contract): runs every SparkEntry
  * query on SPARK_GRAFT_SF_DIR and prints ONE JSON line. Also measures
  * the authoritative BASELINE.json metric — end-to-end
  * parse -> enrich -> route -> aggregate throughput in turns/sec — on a
  * deterministic synthetic transcript table (see [[BenchPipeline]]).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = BenchPipeline.session(cpus.toInt)
    // best-of-2 per query: the sandbox VM sees bursty hypervisor steal
    // (2x swings between identical runs), so a single timing window can
    // misattribute machine noise to a plan regression. The per-query
    // minimum of two passes is the same discipline ScalingBench applies
    // per parallelism level. Failures are LOUD: a broken query must not
    // masquerade as a (short) timing — it is recorded in `errors` and
    // its time reported as -1.
    val errors = scala.collection.mutable.Map[String, String]()
    def timeOnce(name: String,
        fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          -1.0
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val a = timeOnce(name, fn)
      val b = timeOnce(name, fn)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""{"query":"$k","error":"$v"}""" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum

    // the authoritative metric: pipeline throughput at this parallelism
    // (warmup pass absorbs JIT/codegen; then best-of-2 timed passes)
    val inputPath = BenchPipeline.ensureInput(spark,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong)
    BenchPipeline.timePipeline(spark, inputPath) // warmup
    val (rows, sec) = Seq(
      BenchPipeline.timePipeline(spark, inputPath),
      BenchPipeline.timePipeline(spark, inputPath)).minBy(_._2)
    val tput = rows / sec

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errJson,""" +
      s""""pipeline":{"turns":$rows,"sec":$sec,"turns_per_sec":$tput,"cores":$cpus},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

/** Fixed-cost single-threaded CPU calibration probe — the contended-
  * window detector the scaling gate needs (BENCH.md: rounds 5-7 all
  * lost their absolute-band evidence to bursty hypervisor steal that
  * could only be diagnosed forensically, after the fact). The probe is
  * deterministic integer work (xorshift64* folded into an accumulator
  * the caller must consume, so JIT cannot elide it) whose uncontended
  * wall time on this host is COMMITTED as [[Calibration.Ref]]; any
  * timed bench pass bracketed by probe samples that deviate more than
  * [[Calibration.Tol]] above the reference ran in a contended window
  * and is auto-annotated (and auto-rejected for promotion) rather than
  * argued about later.
  */
object Calibration {

  /** Iterations per sample — sized for ~0.4 s uncontended: long enough
    * that scheduler jitter averages out, short enough to bracket every
    * timed pass without distorting the bench.
    */
  val Iters: Long = 400000000L

  /** Committed uncontended reference seconds for one [[sample]] on the
    * bench host (min across many samples in a verified-quiet window;
    * see BENCH.md "calibration guard"). Round-8 baselining: repeated
    * 10-sample probes across the session; the quietest stretch read
    * 0.8086-0.8165 with <1% spread. Override with SPARK_GRAFT_CAL_REF
    * when re-baselining on new hardware.
    */
  val Ref: Double = 0.8086

  /** Relative deviation above [[Ref]] beyond which a window counts as
    * contended. Steal on this VM arrives in >30% bursts (BENCH.md), so
    * 10% separates real contention from sample noise with margin.
    */
  val Tol: Double = 0.10

  def ref: Double =
    sys.env.get("SPARK_GRAFT_CAL_REF").map(_.toDouble).getOrElse(Ref)
  def tol: Double =
    sys.env.get("SPARK_GRAFT_CAL_TOL").map(_.toDouble).getOrElse(Tol)

  // the accumulator escapes through a volatile so the loop is
  // observable effectful work to the JIT
  @volatile var sink: Long = 0L

  /** One timed probe: seconds for [[Iters]] xorshift64* steps. */
  def sample(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < Iters) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      acc += x * 0x2545F4914F6CDD1DL
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    sink = acc
    sec
  }

  /** Median of `k` samples (first call warms the JIT with a discarded
    * probe). Median, not min: the probe measures the window's CURRENT
    * effective speed — a min would hide exactly the bursts it exists
    * to catch.
    */
  def measure(k: Int = 3): Double = {
    if (!warmed) { sample(); sample(); warmed = true }
    val xs = (1 to k).map(_ => sample()).sorted
    xs(k / 2)
  }
  private var warmed = false

  // ---- multi-core memory-bandwidth probe ---------------------------
  // Round-8 finding: a window can pass the single-thread register
  // probe CLEAN (dev < 5%) while the 8-core pipeline level sits ~9%
  // under its historical band — co-tenant contention on shared memory
  // bandwidth / SMT resources that one register-resident thread cannot
  // observe. This second probe streams DRAM from [[MemThreads]]
  // threads at once (per-thread buffers far larger than an LLC slice),
  // so it sees exactly the shared-resource pressure the scaling
  // bench's multi-core levels are exposed to.

  val MemThreads = 8 // buffer-pool size == the largest probe level
  val MemWords: Int = 4 << 20 // 4M longs = 32 MiB per thread
  val MemPasses = 96 // ~24 GiB of total reads per 8-thread sample

  /** Committed uncontended reference seconds for one [[sampleMem]] at
    * each PROBE PARALLELISM (see BENCH.md "calibration guard"). The
    * probe runs at the bench level's own thread count: an 8-thread
    * streaming probe saturates the memory system and over-flags
    * windows whose pressure barely touches a 2-core pipeline level
    * (observed round 8: a +49% 8-thread probe window produced an
    * IN-BAND 2-core reading) — probing at the level's parallelism
    * measures the pressure that level actually experiences. Override
    * with SPARK_GRAFT_MEM_REF_<threads> when re-baselining.
    */
  val MemRefByThreads: Map[Int, Double] = Map(2 -> 0.190, 8 -> 0.262)

  /** Bandwidth-probe tolerance — wider than [[Tol]]: DRAM streaming is
    * intrinsically noisier than a register loop (prefetcher state,
    * page placement), ~15% sample spread even in quiet windows.
    */
  val MemTol: Double = 0.18

  def memRef(threads: Int): Double =
    sys.env.get(s"SPARK_GRAFT_MEM_REF_$threads").map(_.toDouble)
      .orElse(MemRefByThreads.get(threads))
      .getOrElse(MemRefByThreads(8) * threads / 8.0)
  def memTol: Double =
    sys.env.get("SPARK_GRAFT_MEM_TOL").map(_.toDouble).getOrElse(MemTol)

  /** Probe parallelism for a bench level: the level's core count,
    * capped at the buffer pool size.
    */
  def memThreadsFor(cores: Int): Int = math.min(cores, MemThreads)

  private lazy val memBufs: Array[Array[Long]] =
    Array.tabulate(MemThreads) { t =>
      val a = new Array[Long](MemWords)
      var x = t * 0x9E3779B97F4A7C15L + 1
      var i = 0
      while (i < MemWords) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        a(i) = x
        i += 1
      }
      a
    }

  /** One timed probe: wall seconds for `nThreads` threads to stream
    * their buffers [[MemPasses]] times.
    */
  def sampleMem(nThreads: Int = MemThreads): Double = {
    val n = math.min(math.max(1, nThreads), MemThreads)
    val bufs = memBufs
    val accs = new Array[Long](n)
    val threads = (0 until n).map { t =>
      new Thread(() => {
        var acc = 0L
        var p = 0
        while (p < MemPasses) {
          val a = bufs(t)
          var i = 0
          while (i < MemWords) { acc += a(i); i += 1 }
          p += 1
        }
        accs(t) = acc
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    sink = accs.sum
    sec
  }

  def measureMem(k: Int = 3, nThreads: Int = MemThreads): Double = {
    if (!memWarmed) { sampleMem(nThreads); sampleMem(nThreads); memWarmed = true }
    val xs = (1 to k).map(_ => sampleMem(nThreads)).sorted
    xs(k / 2)
  }
  private var memWarmed = false
}

/** Standalone host-quietness probe: prints calibration samples and the
  * median's deviation vs the committed reference — run it before
  * launching a scaling bench so a visibly contended window doesn't
  * waste a 15-minute measurement (and to re-baseline [[Calibration.Ref]]
  * on new hardware: take the min over a long quiet stretch).
  *
  * Usage: runMain graft.CalibrationProbe [samples]
  */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    val k = args.lift(0).map(_.toInt).getOrElse(8)
    Calibration.sample(); Calibration.sample() // JIT warmup, discarded
    Calibration.sampleMem(2); Calibration.sampleMem(8)
    val xs = (1 to k).map { i =>
      val s = Calibration.sample()
      val m2 = Calibration.sampleMem(2)
      val m8 = Calibration.sampleMem(8)
      System.err.println(
        f"[cal] sample $i: cpu=$s%.4f s mem2=$m2%.4f s mem8=$m8%.4f s")
      (s, m2, m8)
    }
    val med = xs.map(_._1).sorted.apply(k / 2)
    val mem2Med = xs.map(_._2).sorted.apply(k / 2)
    val mem8Med = xs.map(_._3).sorted.apply(k / 2)
    val (ref, tol, mtol) =
      (Calibration.ref, Calibration.tol, Calibration.memTol)
    val (mref2, mref8) = (Calibration.memRef(2), Calibration.memRef(8))
    val ok = med / ref - 1.0 <= tol &&
      mem2Med / mref2 - 1.0 <= mtol && mem8Med / mref8 - 1.0 <= mtol
    println(f"""{"cal_median":$med%.4f,"cal_min":${xs.map(_._1).min}%.4f,""" +
      f""""mem2_median":$mem2Med%.4f,"mem2_min":${xs.map(_._2).min}%.4f,""" +
      f""""mem8_median":$mem8Med%.4f,"mem8_min":${xs.map(_._3).min}%.4f,""" +
      f""""ref":$ref,"mem_ref2":$mref2,"mem_ref8":$mref8,""" +
      f""""ok":$ok}""")
  }
}

/** The BASELINE.json scaling-efficiency bench: the SAME pipeline job on
  * the SAME input at local[N] and local[4N]; reports both throughputs
  * and efficiency = (T_4N / T_N) / 4 (target >= 0.8). The sandbox has
  * no multi-node cluster, so parallelism levels stand in for executor
  * counts (BASELINE.md).
  *
  * Every timed pass is bracketed by [[Calibration]] probes; each
  * level's reported run carries its probe readings, a per-level
  * `cal_ok`, and a calibration-NORMALIZED reading (sec divided by the
  * probe slowdown factor, clamped at 1 — see BENCH.md "calibration
  * guard" for the method). A run whose chosen passes are not all
  * `cal_ok` writes `"calibration":{"ok":false}` and MUST NOT be
  * promoted to SCALING.json.
  *
  * Usage: runMain graft.ScalingBench [nConvs] [N] [4N] [outFile]
  */
object ScalingBench {

  private case class Timed(sec: Double, calBefore: Double,
      calAfter: Double, memBefore: Double, memAfter: Double) {
    def cpuDev(ref: Double): Double =
      math.max(calBefore, calAfter) / ref - 1.0
    def memDev(mref: Double): Double =
      math.max(memBefore, memAfter) / mref - 1.0
    // a window is contended when EITHER probe deviates: the register
    // probe sees CPU steal, the streaming probe sees the shared
    // memory-bandwidth/SMT pressure multi-core levels are exposed to
    def dev(ref: Double, mref: Double): Double =
      math.max(cpuDev(ref), memDev(mref))
    // each probe gates against ITS tolerance (the bandwidth probe is
    // intrinsically noisier — Calibration.MemTol)
    def ok(ref: Double, mref: Double, tol: Double, mtol: Double): Boolean =
      cpuDev(ref) <= tol && memDev(mref) <= mtol
    // normalization: the window's effective machine speed is taken
    // from the WORSE of the two probes, each averaged over its
    // before/after pair (the max-of-pair is the GATE; the mean is the
    // fairer slowdown estimate — a burst that only grazed one bracket
    // should not over-correct the whole pass). Clamped at 1 so a lucky
    // fast probe can never inflate throughput. Raw numbers are always
    // reported alongside.
    def slowdown(ref: Double, mref: Double): Double = {
      val cpuMean = ((calBefore + calAfter) / 2.0) / ref - 1.0
      val memMean = ((memBefore + memAfter) / 2.0) / mref - 1.0
      math.max(1.0, 1.0 + math.max(cpuMean, memMean))
    }
    def secNorm(ref: Double, mref: Double): Double =
      sec / slowdown(ref, mref)
  }

  def main(args: Array[String]): Unit = {
    // defaults = the BENCH.md primary pairing: 17.7M turns, 2 vs 8 cores
    // (the host's linear region — see BENCH.md host-ceiling note)
    val nConvs = args.lift(0).map(_.toLong).getOrElse(960000L)
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    val n4 = args.lift(2).map(_.toInt).getOrElse(4 * n)
    val ref = Calibration.ref
    val (tol, mtol) = (Calibration.tol, Calibration.memTol)
    // the bandwidth probe runs at each level's own parallelism (see
    // Calibration.MemRefByThreads), so it measures the pressure that
    // level actually experiences
    def mrefFor(cores: Int): Double =
      Calibration.memRef(Calibration.memThreadsFor(cores))

    // generate the shared input once (any session works for this)
    val gen = BenchPipeline.session(n4)
    val inputPath = BenchPipeline.ensureInput(gen, nConvs)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // Interleave the levels (N, 4N, N, 4N) and take each level's best
    // run: the sandbox VM sees bursty hypervisor steal, and a single
    // timing window can be 2x off — per-level minima across interleaved
    // passes approximate the uncontended machine for BOTH levels.
    var rows = 0L
    val runsByLevel =
      scala.collection.mutable.Map[Int, Vector[Timed]]().withDefaultValue(Vector())
    for (pass <- 1 to 2; cores <- Seq(n, n4)) {
      val spark = BenchPipeline.session(cores)
      BenchPipeline.timePipeline(spark, inputPath) // warmup (JIT + codegen)
      val mThreads = Calibration.memThreadsFor(cores)
      val runs = (1 to 3).map { _ =>
        val cb = Calibration.measure()
        val mb = Calibration.measureMem(nThreads = mThreads)
        val (r, s) = BenchPipeline.timePipeline(spark, inputPath)
        val ca = Calibration.measure()
        val ma = Calibration.measureMem(nThreads = mThreads)
        rows = r
        Timed(s, cb, ca, mb, ma)
      }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      runsByLevel(cores) = runsByLevel(cores) ++ runs
      val b = runs.minBy(_.sec)
      System.err.println(f"[scaling] pass=$pass cores=$cores rows=$rows " +
        f"sec=${b.sec}%.3f tput=${rows / b.sec}%.0f " +
        f"cal=${b.calBefore}%.3f/${b.calAfter}%.3f " +
        f"mem=${b.memBefore}%.3f/${b.memAfter}%.3f " +
        f"dev=${b.dev(ref, mrefFor(cores)) * 100}%.1f%% " +
        f"ok=${b.ok(ref, mrefFor(cores), tol, mtol)}")
    }
    // per level: the best RAW pass (the established discipline) plus
    // its calibration annotation and normalized reading
    def levelJson(cores: Int): (Timed, String) = {
      val mref = mrefFor(cores)
      // prefer the best CALIBRATION-CLEAN pass: the guard certifies
      // the chosen pass, and when a clean pass exists, choosing a
      // marginally faster flagged one sacrifices certification for
      // noise (observed: a clean 310,246 passed over for a flagged
      // 311,285 — 0.3% apart). Fall back to best raw only when no
      // pass was clean, in which case the run is not promotable
      // anyway and raw-best is the honest summary.
      val all = runsByLevel(cores)
      val clean = all.filter(_.ok(ref, mref, tol, mtol))
      val best = (if (clean.nonEmpty) clean else all).minBy(_.sec)
      val (t, tn) = (rows / best.sec, rows / best.secNorm(ref, mref))
      (best,
        f"""{"cores":$cores,"sec":${best.sec},"turns_per_sec":$t,""" +
        f""""cal_before":${best.calBefore},"cal_after":${best.calAfter},""" +
        f""""mem_before":${best.memBefore},"mem_after":${best.memAfter},""" +
        f""""mem_probe_threads":${Calibration.memThreadsFor(cores)},""" +
        f""""mem_ref":$mref,""" +
        f""""cal_dev":${best.cpuDev(ref)},"mem_dev":${best.memDev(mref)},""" +
        f""""cal_ok":${best.ok(ref, mref, tol, mtol)},""" +
        f""""slowdown":${best.slowdown(ref, mref)},""" +
        f""""sec_norm":${best.secNorm(ref, mref)},"turns_per_sec_norm":$tn}""")
    }
    val (b1, j1) = levelJson(n)
    val (b2, j2) = levelJson(n4)
    val eff = ((rows / b2.sec) / (rows / b1.sec)) / (n4.toDouble / n)
    val effNorm =
      ((rows / b2.secNorm(ref, mrefFor(n4))) /
        (rows / b1.secNorm(ref, mrefFor(n)))) / (n4.toDouble / n)
    val calOk = b1.ok(ref, mrefFor(n), tol, mtol) &&
      b2.ok(ref, mrefFor(n4), tol, mtol)
    val json = s"""{"metric":"scaling_efficiency","value":$eff,""" +
      s""""value_norm":$effNorm,"rows":$rows,"n":$j1,"n4":$j2,""" +
      s""""calibration":{"ref":$ref,"tol":$tol,"mem_tol":$mtol,"ok":$calOk}}"""
    println(json)
    if (!calOk) System.err.println(
      "[scaling] CONTENDED WINDOW (calibration deviation over tolerance " +
        "on the chosen pass) — this run must NOT be promoted to " +
        "SCALING.json; rerun until calibration is clean")
    // machine-readable record of this run. The artifact of record
    // (SCALING.json) is promoted EXPLICITLY by copying a reviewed run
    // file — the harness never writes that path by default, so a
    // below-gate contended window can no longer clobber the recorded
    // gate evidence (round-6 regression: run G overwrote run F).
    val out = args.lift(3).orElse(sys.env.get("SPARK_GRAFT_SCALING_OUT"))
      .getOrElse("SCALING_lastrun.json") // cwd-relative; promote by hand
    val w = new java.io.PrintWriter(new java.io.File(out))
    try w.println(json) finally w.close()
  }
}

/** Shared bench plumbing: session factory, cached synthetic input,
  * and the timed end-to-end pipeline (the BASELINE.json metric:
  * parse -> enrich -> route -> aggregate, all outputs materialized).
  */
object BenchPipeline {
  import graft.pipeline._

  def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // shuffle to tmpfs when available: the bench isolates COMPUTE
    // scaling; spinning the ~GB shuffle through the single local disk
    // would serialize both parallelism levels on the same I/O ceiling
    // (a real cluster has one set of disks per executor).
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-bench-scratch")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Deterministic synthetic transcript table under target/, reused
    * across bench invocations of the same size (content is a pure
    * function of (seed, nConvs), so reuse is safe).
    */
  def ensureInput(spark: SparkSession, nConvs: Long): String = {
    val path = s"/root/repo/target/bench_input_$nConvs"
    val marker = new java.io.File(s"$path/_SUCCESS")
    if (!marker.exists()) {
      val n = Synth.writeTable(spark, path, 42L, nConvs)
      System.err.println(s"[bench] wrote $n turns to $path")
    }
    path
  }

  /** One end-to-end pipeline pass: scan -> grok parse (incl. header
    * propagation + sessionization prefix scans) -> broadcast enrich ->
    * route -> aggregate. The three metric tables (per sink x role /
    * tool / hour) come from ONE grouped pass — a single map-side-partial
    * hash aggregate whose output is tiny; the marginals are derivable
    * from it without re-reading the data (the 100 TB-scale shape: never
    * run the scan once per metric). Returns (rows, seconds).
    */
  def timePipeline(spark: SparkSession, inputPath: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val turns = spark.read.schema(
        Schema.turnSchema.add("day", org.apache.spark.sql.types.StringType))
      .parquet(inputPath)
    import spark.implicits._
    val routed = Pipeline(turns.as[Turn], excludePattern = "token",
      chunkSize = 4096)
    // header/session aggregates keep the prefix-scan outputs live in the
    // plan — otherwise column pruning could drop the very work the
    // metric claims to measure.
    val grouped = routed.groupBy(col("sink"), col("role"),
        col("tool_category"),
        window(col("ts"), "1 hour").getField("start").as("hour_start"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("header").isNotNull, 1L).otherwise(0L))
          .as("n_with_header"),
        max(col("session_id")).as("max_session"))
      .collect()
    val rows = grouped.map(_.getLong(4)).sum
    (rows, (System.nanoTime() - t0) / 1e9)
  }
}
