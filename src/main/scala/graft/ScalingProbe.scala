package graft

import graft.gen.Pages
import graft.index.{IndexBuilder, IndexOptions}
import org.apache.spark.sql.SparkSession

/** One timed index build at a given executor-process count — the child
  * JVM spawned by [[ScalingProbe]]. Runs `local-cluster[n,1,mem]`: n REAL
  * executor JVMs with one core each, scheduled over RPC with real shuffle
  * fetches — the faithful single-box proxy for n cluster executors.
  *
  * Why processes and not `local[n]` threads: this sandbox VM serializes
  * same-address-space memory faults, so allocation-heavy work does not
  * scale across threads in ONE JVM at all (measured: one thread 10.9k
  * docs/s of tokenize-shaped work, 8 threads in one JVM 7.4k TOTAL — while
  * 8 separate 1-thread JVMs reach 75k aggregate). A real cluster runs one
  * JVM per executor, which is exactly what local-cluster reproduces; the
  * threads-in-one-JVM artifact measured the sandbox, not the engine.
  *
  * The synthetic input is generated and materialized BEFORE the timed
  * window: the probe measures index-build scaling, not the data
  * generator's.
  */
object ScalingBuild {
  def main(args: Array[String]): Unit = {
    val execs = args(0).toInt
    val docs = args(1).toLong
    val dir = args(2)
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,1,3072]")
      .appName(s"graft-scaling-$execs")
      .config("spark.executor.memory", "2700m")
      // each 1-core executor must SIZE itself for 1-2 cpus: by default every
      // executor JVM sees the host's 32 cpus and spawns ~23 GC threads + 32
      // netty/compiler threads, and parallel GC threads inside one address
      // space hit this VM's same-address-space fault serialization — the
      // executors then fight themselves, not compute
      .config("spark.executor.extraJavaOptions",
        "-XX:ActiveProcessorCount=2")
      // the processor cap must not starve the shuffle transport: netty
      // server/client pools default to the visible cpu count (2 after the
      // cap), which throttles the all-to-all fetch at higher executor counts
      .config("spark.shuffle.io.serverThreads", "8")
      .config("spark.shuffle.io.clientThreads", "8")
      .config("spark.rpc.io.threads", "8")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // executor JVMs register asynchronously; if the first job runs while
      // only 2 of 8 are up, the input cache lands skewed on the early ones
      // and every later stage inherits the imbalance plus locality waits —
      // the source of bimodal (3x) run-to-run times at fixed config
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
      .config("spark.locality.wait", "0s")
      // shuffle/spill must not go through the shared /tmp disk: with 8
      // executor processes the one spindle saturates and masquerades as
      // poor scaling (cluster nodes bring their own disks; tmpfs is the
      // faithful proxy, same as the probe's output dir)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-scale-local"
        else System.getProperty("java.io.tmpdir"))
      // executors are fresh JVMs: they need the application classes (and
      // under sbt, the scala/test harness jars) on their classpath
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      // identical plan shape at every executor count — only parallelism varies
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // untimed warmup build: compiles the codegen stages, JITs the
      // UDF/codec hot paths and exercises the parquet commit protocol once,
      // so the timed window measures steady-state throughput (in production
      // these one-time costs amortize over hours; round-1 protocol did the
      // same warmup)
      val warmPages = Pages.generate(spark, 20000L, partitions = 32)
      val warmInput = IndexBuilder.assignDocIds(spark, warmPages, "url", 0L, 32)
        .selectExpr("docId", "url AS key", "text", "warc_ts AS ts")
      IndexBuilder.build(spark, warmInput, s"$dir-warmup",
        IndexOptions(docsPerSegment = 1L << 14, withPositions = true))

      val pages = Pages.generate(spark, docs, partitions = 32)
      val input = IndexBuilder.assignDocIds(spark, pages, "url", 0L, 32)
        .selectExpr("docId", "url AS key", "text", "warc_ts AS ts")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      input.count() // materialize input outside the timed window
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, input, dir,
        IndexOptions(docsPerSegment = 1L << 14, withPositions = true))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""[scaling-build] {"execs":$execs,"docs":$docs,"sec":$sec%.2f,"docs_per_sec":${docs / sec}%.1f}""")
    } finally spark.stop()
  }
}

/** Scaling-efficiency probe (BASELINE.md protocol; north_rule evidence):
  * identical build at N vs 4N executor PROCESSES (`local-cluster[n,1,..]`),
  * same input, same plan. Each measurement runs in a freshly spawned child
  * JVM — clean heap and JIT state per run, and full control of the env the
  * Spark launcher needs (SPARK_SCALA_VERSION, worker dirs under /tmp).
  * Configurations are run INTERLEAVED (A,B,A,B) and the minimum wall time
  * per configuration is used — the sandbox host is multi-tenant and a
  * single measurement can be off by 2-3x; min-of-reps is the standard
  * noise-robust estimator for throughput. Run exclusively.
  */
object ScalingProbe {

  /** Spawn one ScalingBuild child; returns wall seconds of its timed build. */
  def buildInChild(execs: Int, docs: Long, dir: String): Double = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    // the driver JVM gets the same processor cap as executors: uncapped it
    // sizes GC/JIT/netty pools for all 32 host cpus, and >20 GC threads in
    // one address space intermittently collide with this VM's serialized
    // memory faults (measured: identical 8-executor runs flip between 15.6k
    // and 2.9k docs/s without the cap)
    val cmd = javaBin :: "-Xmx8g" :: "-XX:ActiveProcessorCount=4" :: "-cp" :: cp ::
      "graft.ScalingBuild" :: execs.toString :: docs.toString :: dir :: Nil
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_WORKER_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-scale-worker")
    pb.redirectErrorStream(true)
    sys.env.get("GRAFT_BUILD_TIMING").foreach(v =>
      pb.environment().put("GRAFT_BUILD_TIMING", v))
    val p = pb.start()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    var line = rd.readLine()
    while (line != null) {
      out += line
      if (line.contains("[build-phase]")) println(s"  (execs=$execs) $line")
      line = rd.readLine()
    }
    val code = p.waitFor()
    val marker = out.reverseIterator.find(_.contains("[scaling-build]"))
    require(code == 0 && marker.isDefined,
      s"scaling child (execs=$execs) failed (exit $code); last output:\n" +
        out.takeRight(25).mkString("\n"))
    """"sec":([0-9.]+)""".r.findFirstMatchIn(marker.get).get.group(1).toDouble
  }

  /** Interleaved per-rep wall seconds: result(rep)(execCount) = sec. The
    * two configs of one rep run back-to-back and so share the host's noise
    * phase — per-rep efficiency pairs like with like, where pairing the
    * global minima can cross a lucky low-parallelism run with an unlucky
    * high-parallelism one (host noise is one-sided: it only slows runs).
    *
    * A wall-clock budget (SPARK_GRAFT_SCALE_BUDGET_SEC, default 2700 s)
    * stops starting NEW reps once at least 3 are complete and the budget is
    * spent — on a host slow night a rep can take 3x its usual time, and an
    * unbounded rep count could blow the whole bench window. Stopping on
    * elapsed TIME is unbiased: the decision never looks at the efficiency
    * values. Completed-rep counts are always reported, so a short run is
    * visible in the artifact.
    */
  def runDetailed(cores: Seq[Int], docs: Long, reps: Int,
      tmp: String): Vector[Map[Int, Double]] = {
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET_SEC", "2700").toLong
    val t0 = System.nanoTime()
    val out = Vector.newBuilder[Map[Int, Double]]
    var r = 0
    var stop = false
    while (r < reps && !stop) {
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (r >= 3 && elapsed > budgetSec) {
        println(f"""{"scale_budget_stop":true,"completed_reps":$r,"elapsed_sec":$elapsed%.0f}""")
        stop = true
      } else {
        out += cores.map { c =>
          val sec = buildInChild(c, docs, s"$tmp/c$c-r$r")
          println(f"""{"execs":$c,"rep":$r,"docs":$docs,"sec":$sec%.1f,"docs_per_sec":${docs / sec}%.1f}""")
          c -> sec
        }.toMap
        r += 1
      }
    }
    out.result()
  }

  /** Min-of-reps throughput per executor count (docs/sec). */
  def run(cores: Seq[Int], docs: Long, reps: Int,
      tmp: String): Map[Int, Double] = {
    val detailed = runDetailed(cores, docs, reps, tmp)
    cores.map(c => c -> docs / detailed.map(_(c)).min).toMap
  }

  /** Noise-rejected scaling efficiency. This host's noise is ONE-SIDED
    * (random multi-minute slow phases only ever slow a run, measured 3-4x;
    * BASELINE.md) — so a rep whose lo-config time blew past 1.5x the best
    * lo time across reps spuriously INFLATES that rep's efficiency, and a
    * blown hi-config time spuriously DEFLATES it. Reps with either side
    * noise-afflicted are discarded (symmetrically — rejection must not
    * cherry-pick the flattering direction), and the efficiency is the
    * median over the survivors. Degenerate case (every rep had one noisy
    * side): fall back to the ratio of per-config minima, the standard
    * noise-robust throughput estimator. Everything is reported — all
    * per-rep efficiencies plus which were kept — so the artifact shows the
    * estimator's inputs, not just its output.
    *
    * Returns (efficiency, perRepEfficiencyInRunOrder, keptRepIndices).
    */
  def robustEfficiency(detailed: Vector[Map[Int, Double]], lo: Int, hi: Int,
      tol: Double = 1.5): (Double, Vector[Double], Vector[Int]) = {
    val bestLo = detailed.map(_(lo)).min
    val bestHi = detailed.map(_(hi)).min
    val perRep = detailed.map(m => (m(lo) / m(hi)) / (hi.toDouble / lo))
    val kept = detailed.indices.filter(i =>
      detailed(i)(lo) <= tol * bestLo && detailed(i)(hi) <= tol * bestHi).toVector
    val ks = kept.map(perRep).sorted
    val eff =
      if (ks.nonEmpty) ks(ks.size / 2)
      else (bestLo / bestHi) / (hi.toDouble / lo)
    (eff, perRep, kept)
  }

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "7").toInt
    val cores = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4)
    // tmpfs output: on one box the disk is shared across all executor
    // counts, which under-measures cluster scaling where each node brings
    // its own disks; memory-backed output makes the proxy measure
    // compute+shuffle.
    val tmpRoot = if (new java.io.File("/dev/shm").isDirectory)
      java.nio.file.Paths.get("/dev/shm") else
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tmp = java.nio.file.Files.createTempDirectory(tmpRoot, "graft-scale").toString
    try {
      val detailed = runDetailed(cores, docs, reps, tmp)
      val lo = cores.head
      val hi = cores.last
      val tp = cores.map(c => c -> docs / detailed.map(_(c)).min).toMap
      val (eff, perRep, kept) = robustEfficiency(detailed, lo, hi)
      println(f"""{"docs":$docs,"reps":$reps,"best_docs_per_sec":{${cores.map(c => s""""$c":${tp(c).round}""").mkString(",")}},"per_rep_efficiency":[${perRep.map(e => f"$e%.3f").mkString(",")}],"kept_reps":[${kept.mkString(",")}],"efficiency_${lo}_to_$hi":$eff%.3f}""")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
