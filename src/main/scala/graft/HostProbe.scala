package graft

/** Host effective-concurrency probe — the in-artifact instrument for the
  * sandbox's wandering aggregate-CPU cap (BASELINE.md round-5
  * characterization: the box intermittently caps aggregate CPU at ~10-20
  * of its 32 vCPUs while 1-thread latency degrades only ~1.3x, which
  * asymmetrically throttles the scaling section's 32-thread 4-executor
  * config). Round 5 measured the cap with an out-of-band script, so the
  * committed artifact could not distinguish "capped host" from "engine
  * regression" by itself; this probe embeds the same instrument in the
  * bench, and every scaling/latency section publishes its readings
  * (r5 verdict, Next round #1).
  *
  * Instrument: one fixed CPU-bound work unit (a splitmix64-style mixing
  * loop — pure register arithmetic, ZERO allocation, so it cannot trip
  * this VM's same-address-space memory-fault serialization that makes
  * allocation-heavy THREAD scaling meaningless here; BASELINE.md thread
  * artifact). A reading is:
  *
  *   1. single-thread floor: best-of-3 timed chunks on one thread;
  *   2. saturation: `threads` workers each loop the same chunk until a
  *      wall deadline; aggregate completed chunks / elapsed gives the
  *      parallel rate;
  *   3. `effectiveCores = parallelRate / singleRate` — how many
  *      single-thread-equivalents the host actually granted during the
  *      window; `singleThreadSlowdown = singleMs / calibration floor`
  *      (the cap's signature: effectiveCores collapses, slowdown stays
  *      ~1.0-1.3).
  *
  * Validated against the round-5 out-of-band instrument by [[main]]
  * (process-based and thread-based readings agree on this box — the cap
  * is a VM-level aggregate, not per-process; numbers in BASELINE.md).
  * Cost: ~2 s per reading at the defaults. The chunk size is calibrated
  * once per JVM ([[calibrate]]) and reused, so readings are comparable
  * within a run.
  */
object HostProbe {

  /** One probe reading. `atSec` is seconds since [[anchor]] (the bench's
    * wall origin), so the artifact can correlate readings with sections
    * and reps. `effCores` is in single-thread-equivalents of the SAME
    * window's single-thread rate; `stSlowdown` is the window's
    * single-thread chunk time over the per-JVM calibration floor.
    */
  final case class Reading(atSec: Double, effCores: Double,
      stSlowdown: Double, singleMs: Double, threads: Int) {
    /** Aggregate capacity in CLEAN single-thread equivalents — effCores
      * re-based from the window's own (possibly slowed) single-thread
      * rate to the run's floor. This is the number the round-5
      * out-of-band instrument reported (~12.6 of 32 in the capped
      * window) — the ATTRIBUTION metric for artifact readers. The
      * scaling GATE uses effCores instead: capCores inherits any floor
      * contamination (JVM-local background threads inflate singleMs
      * after Spark has run in the process), while effCores is computed
      * entirely within one window and still separates capped (~18) from
      * clean (~29-32) readings cleanly.
      */
    def capCores: Double = effCores / stSlowdown
    def json: String =
      f"""{"t_sec":$atSec%.1f,"eff_cores":$effCores%.1f,"cap_cores":$capCores%.1f,"st_slowdown":$stSlowdown%.2f,"st_chunk_ms":$singleMs%.1f,"threads":$threads}"""
  }

  @volatile private var sink = 0L // observable side effect defeats DCE

  /** The fixed work unit: `iters` splitmix64 finalizer rounds folded into
    * an accumulator. Register-only — no allocation, no memory traffic.
    */
  private def chunk(iters: Long, seed: Long): Long = {
    var x = seed
    var acc = 0L
    var i = 0L
    while (i < iters) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    acc
  }

  private def timeChunkMs(iters: Long): Double = {
    val t0 = System.nanoTime()
    sink ^= chunk(iters, t0)
    (System.nanoTime() - t0) / 1e6
  }

  /** (iters per chunk, first floor estimate ms) — sized so one chunk runs
    * ~targetMs on one thread, after JIT warmup. Computed once per JVM.
    */
  private lazy val calibration: (Long, Double) = calibrate(25.0)

  /** Running single-thread floor (ms/chunk): the MIN over every chunk this
    * JVM has timed. The host's noise is strictly one-sided (runs are clean
    * or slowed, never fast — BASELINE.md noise model), so the minimum is
    * the unbiased clean estimate, and a calibration that happened to land
    * in a capped window self-corrects as later readings observe faster
    * chunks. Raw `singleMs` is published per reading, so slowdowns can be
    * recomputed against any floor post-hoc.
    */
  private val floorMsRef = new java.util.concurrent.atomic.AtomicLong(
    java.lang.Double.doubleToLongBits(Double.MaxValue))
  private def observeFloor(ms: Double): Unit = {
    var done = false
    while (!done) {
      val cur = floorMsRef.get()
      done = ms >= java.lang.Double.longBitsToDouble(cur) ||
        floorMsRef.compareAndSet(cur, java.lang.Double.doubleToLongBits(ms))
    }
  }
  private def floorMs: Double = java.lang.Double.longBitsToDouble(floorMsRef.get())

  private def calibrate(targetMs: Double): (Long, Double) = {
    sink ^= chunk(1L << 22, 1L) // JIT warmup before any timing
    var iters = 1L << 20
    var ms = timeChunkMs(iters)
    while (ms < targetMs && iters < (1L << 34)) {
      iters *= 2
      ms = timeChunkMs(iters)
    }
    val floor = (0 until 3).map(_ => timeChunkMs(iters)).min
    observeFloor(floor)
    (iters, floor)
  }

  private val t0Nanos = System.nanoTime()

  /** Wall origin for `atSec`; call once at bench start to anchor readings
    * to the run's own clock (defaults to JVM start of this object).
    */
  @volatile private var anchorNanos: Long = t0Nanos
  def anchor(): Unit = anchorNanos = System.nanoTime()

  /** Take one reading: ~3 single-thread chunks + `windowMs` of saturation
    * across `threads` workers.
    */
  def measure(threads: Int = defaultThreads, windowMs: Long = 1500): Reading = {
    val (iters, _) = calibration
    val singleMs = (0 until 3).map(_ => timeChunkMs(iters)).min
    observeFloor(singleMs)
    val deadline = System.nanoTime() + windowMs * 1000000L
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val start = new java.util.concurrent.CountDownLatch(1)
    val ws = (0 until threads).map { w =>
      val t = new Thread(() => {
        start.await()
        var local = 0L
        while (System.nanoTime() < deadline) {
          sink ^= chunk(iters, w * 7919L + local)
          local += 1
        }
        counts.set(w, local)
      })
      t.setDaemon(true)
      t.start()
      t
    }
    val wall0 = System.nanoTime()
    start.countDown()
    ws.foreach(_.join(windowMs * 3 + 5000))
    val wallMs = (System.nanoTime() - wall0) / 1e6
    var done = 0L
    (0 until threads).foreach(w => done += counts.get(w))
    // last chunks may overrun the deadline; wallMs (join time) absorbs it
    val aggChunksPerMs = done / wallMs
    val singleChunksPerMs = 1.0 / singleMs
    Reading((System.nanoTime() - anchorNanos) / 1e9,
      aggChunksPerMs / singleChunksPerMs, singleMs / floorMs, singleMs,
      threads)
  }

  /** Readings-to-JSON-array helper for the bench artifact. */
  def jsonArray(rs: Seq[Reading]): String =
    rs.map(_.json).mkString("[", ",", "]")

  /** Compact `[t_sec, eff_cores, cap_cores]` triples for the FINAL bench
    * line: the driver keeps only the last ~2000 characters of bench
    * stdout as the committed artifact tail, so the scaling section's
    * probe evidence must stay terse there — the full readings are
    * printed live (one `{"host_probe":...}` line each) for the log.
    */
  def compactArray(rs: Seq[Reading]): String =
    rs.map(r => f"[${r.atSec}%.0f,${r.effCores}%.1f,${r.capCores}%.1f]")
      .mkString("[", ",", "]")

  def defaultThreads: Int =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_THREADS", "32").toInt

  /** The capped/clean decision threshold (effective cores of
    * [[defaultThreads]]): below it the scaling section treats the window
    * as capped. Default 26 of 32 — the observed cap wanders 10-20, clean
    * windows read ~29-32 (BASELINE.md), so 26 splits the two modes with
    * margin on both sides.
    */
  def minCleanCores: Double =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_MIN_CORES", "26").toDouble

  /** The capCores leg of the gate — lower than [[minCleanCores]] because
    * the floor can drift (Reading.capCores scaladoc) while real caps read
    * 10-20: both legs must pass for a window to count as clean.
    */
  def minCleanCapCores: Double =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_MIN_CAP_CORES", "21").toDouble

  /** The scaling gate's clean-window predicate: BOTH the within-window
    * parallelism (effCores) and the floor-based capacity (capCores) read
    * healthy. Dress-1 evidence (2026-08-18): effCores alone passed a
    * transient 26+ reading whose capCores was 18.8 and the rep pair
    * measured 0.54 efficiency — the conjunction would have held it.
    */
  def healthy(r: Reading): Boolean =
    r.effCores >= minCleanCores && r.capCores >= minCleanCapCores

  /** Validation CLI: interleaves thread-based readings (this instrument)
    * with process-based readings (N single-thread child JVMs running the
    * same chunk loop — the shape of the round-5 out-of-band probe) so the
    * two can be compared on the same windows. `runMain graft.HostProbe
    * [reps [threads]]`.
    */
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val threads = if (args.length > 1) args(1).toInt else defaultThreads
    anchor()
    (0 until reps).foreach { r =>
      val t = measure(threads)
      val p = processReading(threads)
      println(s"""{"rep":$r,"thread_probe":${t.json},"process_probe":$p}""")
    }
  }

  /** Process-based cross-check: `n` child JVMs each time one fixed chunk
    * batch; effective cores = sum of single-JVM rates achieved
    * concurrently / the best rate achieved alone. Validation-only (the
    * bench uses [[measure]] — child JVM spawn is too heavy per-rep).
    */
  private def processReading(n: Int): String = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def spawn(): Process =
      new ProcessBuilder((javaBin :: "-XX:ActiveProcessorCount=1" :: "-Xmx64m" ::
        "-cp" :: cp :: "graft.HostProbeChild" :: Nil): _*)
        .redirectErrorStream(true).start()
    def secOf(p: Process): Double = {
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      p.waitFor()
      """\[probe-child\] ([0-9.]+)""".r.findFirstMatchIn(out)
        .map(_.group(1).toDouble).getOrElse(Double.NaN)
    }
    val solo = secOf(spawn())
    val procs = (0 until n).map(_ => spawn())
    val secs = procs.map(secOf)
    val eff = secs.map(s => solo / s).sum
    f"""{"eff_cores":$eff%.1f,"solo_sec":$solo%.2f,"procs":$n}"""
  }
}

/** Child main for [[HostProbe]]'s process-based validation: time one
  * fixed chunk batch and print it.
  */
object HostProbeChild {
  def main(args: Array[String]): Unit = {
    // same register-only loop, sized ~1.5 s; one JIT warmup pass first
    var acc = 0L
    def run(iters: Long): Double = {
      val t0 = System.nanoTime()
      var x = t0
      var i = 0L
      while (i < iters) {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        acc ^= z ^ (z >>> 31)
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    run(1L << 22)
    val sec = run(1L << 28)
    println(f"[probe-child] $sec%.3f acc=$acc")
  }
}
