package graft

import graft.gen.Pages
import graft.index.{IndexBuilder, IndexOptions, Searcher}
import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): prints ONE final JSON line.
  *
  * Section order is chosen so the artifact degrades gracefully under the
  * driver's wall-clock kill (the BENCH_r03 rc=124 lesson — the 2M-doc
  * scaling probe used to run FIRST and ate the whole window before a
  * single query timing printed):
  *
  *  0. scaling input generated once + scaling block A (<= 5 reps, bounded
  *     to the first ~28 minutes — see the phase-sampling rationale at the
  *     block-A code);
  *  1. cache builds (warm the indexes so query timings are query timings);
  *  2. per-query suite at `SPARK_GRAFT_SF_DIR` — N full interleaved passes
  *     (default 2), per-query MIN published plus every raw pass (the same
  *     one-sided-noise estimator the scaling section uses);
  *  3. BM25 latency distribution;
  *  4. index-build throughput (the BASELINE.md headline) — best of 2
  *     builds, raw reps published;
  *  5. scaling block B under whatever remains of the whole-run budget
  *     (`SPARK_GRAFT_BENCH_BUDGET_SEC`, default 3000 s), merged with block
  *     A into one estimator — every block checks the deadline before EVERY
  *     rep and hard-kills wedged children (ScalingProbe.runWithDeadline),
  *     so it can run short but can never blow the window.
  *
  * After EVERY section a `{"bench_section":...}` line is printed and
  * flushed: a run killed mid-way still leaves each completed section's
  * numbers in the output tail instead of nothing (round-3 verdict "What's
  * wrong" #4).
  *
  * Scaling protocol: identical build at N vs 4N executor PROCESSES
  * (`local-cluster[n,1,..]` child JVMs — BASELINE.md protocol; see
  * ScalingBuild for why local[N] threads cannot measure scaling on this
  * sandbox), default 1 -> 4 executors over a SHARED pre-generated input
  * table, interleaved reps; headline efficiency = ratio of per-config
  * minima (the noise-robust estimator under this host's strictly
  * one-sided slowdowns — ScalingProbe.robustEfficiency scaladoc), with
  * every rep's value, the noise-rejected kept set, and the conservative
  * kept-median published alongside in the JSON.
  */
object Bench {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def emitSection(name: String, json: String): Unit = {
    println(s"""{"bench_section":"$name",$json}""")
    System.out.flush()
  }

  /** Full pipeline build over n synthetic pages; returns (docs/sec, postings/sec). */
  private def buildThroughput(spark: SparkSession, n: Long, dir: String,
      parts: Int): (Double, Double) = {
    val pages = Pages.generate(spark, n, partitions = parts)
    val docs = IndexBuilder
      .assignDocIds(spark, pages, "url", 0L, parts)
      .selectExpr("docId", "url AS key", "text", "warc_ts AS ts")
    val (m, sec) = time {
      IndexBuilder.build(spark, docs, dir,
        IndexOptions(docsPerSegment = 1L << 14, withPositions = true))
    }
    val postings = m.waves.map(_.totalTokens).sum // upper bound ~ tokens
    (n / sec, postings / sec)
  }

  /** Pids of java processes OUTSIDE this JVM's ancestry. Round-1 lesson:
    * two orphaned JVMs from an earlier streaming-test hang silently burned
    * cores through the whole bench window and inflated q12 from 33s to
    * 192s — so the bench refuses to trust a dirty box silently: it warns,
    * reports the count in the JSON line, and aborts under
    * SPARK_GRAFT_BENCH_STRICT=1.
    */
  private def foreignJvms(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val self = ProcessHandle.current()
    var ancestors = Set(self.pid)
    var p = self.parent()
    while (p.isPresent) { ancestors += p.get.pid; p = p.get.parent() }
    ProcessHandle.allProcesses().iterator().asScala
      .filter(h => !ancestors.contains(h.pid))
      .filter { h =>
        val info = h.info()
        val cmd = info.command().orElse("") + " " + info.commandLine().orElse("")
        cmd.contains("java")
      }
      .map(_.pid).toSeq
  }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "3000").toLong
    val deadline = wall0 + budgetSec * 1000000000L
    // host-concurrency probe (HostProbe scaladoc; r5 verdict #1): one
    // reading at every section boundary so the artifact itself carries
    // the host-health trace a reader needs to attribute slow sections —
    // the r5 artifact's 0.781 scaling could only be attributed to the
    // measured CPU-cap window out-of-band
    HostProbe.anchor()
    val probeTrace = scala.collection.mutable.ArrayBuffer.empty[(String, HostProbe.Reading)]
    def probeAt(label: String): HostProbe.Reading = {
      val r = HostProbe.measure()
      probeTrace += ((label, r))
      println(s"""{"host_probe":"$label","reading":${r.json}}""")
      System.out.flush()
      r
    }
    probeAt("start")

    val stale = foreignJvms()
    if (stale.nonEmpty) {
      System.err.println(s"[bench] WARNING: ${stale.size} foreign java " +
        s"process(es) alive (pids ${stale.mkString(",")}); timings may be " +
        "contaminated. Set SPARK_GRAFT_BENCH_STRICT=1 to abort instead.")
      if (sys.env.get("SPARK_GRAFT_BENCH_STRICT").contains("1")) {
        System.err.println("[bench] STRICT mode: refusing to bench a dirty box")
        sys.exit(2)
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    // 1M docs (round-4 re-derivation, BASELINE.md): with the per-wave
    // serial tail cut (wave-stats + termstats posting count now ride the
    // write jobs as observed metrics) a CLEAN 1M pair measures ~0.86-0.90 —
    // the old ~0.70 "1M Amdahl floor" that forced 2M inputs no longer
    // exists, and 2M's 1-exec side was bimodal (spill-or-not: 275s vs 660s
    // observed in ONE night), which made the per-rep estimator useless.
    // Shorter reps = more reps per window = a robust median.
    val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "1000000").toLong
    val scaleReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10").toInt
    val scaleCores = sys.env.getOrElse("SPARK_GRAFT_SCALE_CORES", "1,4")
      .split(",").map(_.trim.toInt).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString

    // ---- 0. scaling input (generated once) + scaling block A --------------
    // The host's multi-JVM slow phases last 10-40 minutes — about the span
    // of this whole bench — so a single contiguous scaling block gambles
    // the round's headline number on one phase (observed same-day:
    // 0.949 at 07:30, 0.414 at 08:20, 0.815 at 08:50, same protocol).
    // Scaling therefore runs in TWO blocks, one before and one after the
    // query/latency/build sections, merged into one estimator: reps from a
    // clean phase set the per-config minima, and the symmetric noise
    // rejection discards the phase-slowed reps regardless of which block
    // they fell in. Both blocks run under the same absolute deadline
    // machinery, so either can run short (or empty) without endangering
    // the artifact.
    val loC = scaleCores.head
    val hiC = scaleCores.last
    val scaleTmp = ScalingProbe.tmpfsTempDir("graft-bench-scale")
    // a crash anywhere between here and the scaling section's finally must
    // not leak a multi-GB tmpfs dir (one earlier aborted run did)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(scaleTmp)): Unit))
    val scaleDeadline = deadline - 60L * 1000000000L // final-JSON reserve
    // block A gets the larger share: in every observed two-block run the
    // early window (before this JVM commits its multi-GB local[32] heap)
    // produced the clean reps and the late window the phase-slowed ones
    // (BASELINE.md round 4) — block B is kept as the temporal-diversity
    // hedge, not the workhorse. A must still leave room for the ~600 s
    // front sections + at least one B rep.
    val blockADeadline = math.min(scaleDeadline - 1200L * 1000000000L,
      wall0 + 1700L * 1000000000L)
    var genSec = -1.0
    val blockA = try {
      genSec = ScalingProbe.prepareInput(scaleDocs, s"$scaleTmp/input",
        math.max(60L, budgetSec / 4))
      val a = ScalingProbe.runWithDeadline(scaleCores, scaleDocs,
        math.min(5, scaleReps), scaleTmp, s"$scaleTmp/input", blockADeadline,
        gate = true)
      emitSection("scaling_block_a",
        s""""completed_reps":${a.reps.size},"failed_reps":${a.failedReps},""" +
          s""""probe_wait_sec":${a.probeWaitSec}""")
      a
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] scaling block A failed: $e")
        ScalingProbe.ScaleResult(Vector.empty, 0, budgetStop = false, 0.0)
    }

    probeAt("after_block_a")
    var spark = session(cpus)

    // ---- 1. warm the index caches so query timings are query timings ------
    val (_, buildFullSec) = time(IndexCache.full(spark, sfDir))
    val (_, buildTwoSec) = time(IndexCache.twoWave(spark, sfDir))
    val (_, buildAnnSec) = time(IndexCache.ann(spark, sfDir))
    val (_, buildIvfSec) = time(IndexCache.ivf(spark, sfDir))
    val (_, buildPqSec) = time(IndexCache.pq(spark, sfDir))
    val (_, buildTriSec) = time(IndexCache.trigram(spark, sfDir))
    // warm the streaming machinery too (state store, streaming codegen,
    // checkpoint manager — ~15 s of one-time JVM init measured at q22
    // otherwise) with a 64-row self-contained stream, same philosophy as
    // the index cache warmup: query timings are query timings
    val (_, streamWarmSec) = time {
      val warmDir = s"$tmp/streamwarm"
      spark.range(0, 64).selectExpr(
        "timestamp_seconds(1704067200 + id) AS ts",
        "'w' AS event_type", "CAST(id AS DOUBLE) AS value")
        .coalesce(1).write.parquet(warmDir)
      graft.streaming.StreamingOps
        .windowedEventCountsIncremental(spark, warmDir).count()
    }
    emitSection("cache_builds",
      f""""cache_build_full_sec":$buildFullSec%.3f,"cache_build_twowave_sec":$buildTwoSec%.3f,"cache_build_ann_sec":$buildAnnSec%.3f,"cache_build_ivf_sec":$buildIvfSec%.3f,"cache_build_pq_sec":$buildPqSec%.3f,"cache_build_trigram_sec":$buildTriSec%.3f,"stream_warm_sec":$streamWarmSec%.3f""")
    probeAt("after_cache_builds")

    // ---- 2. per-query timings: min over interleaved passes ----------------
    // The host's slow phases are strictly ONE-SIDED (a run is clean or
    // slowed, never fast — BASELINE.md noise model), and they last minutes:
    // BENCH_r04 timed each query ONCE and its suite caught a slow phase
    // (45.1 s / q22 9.2 s) while the same-day, same-binary rehearsal
    // measured 27.6 s / 3.8 s. Same medicine the scaling section already
    // takes: run FULL passes back-to-back (each pass is a different ~30 s
    // time window, so a phase boundary falls between passes, not inside a
    // query's reps), publish the per-query MIN as the estimate and every
    // raw pass alongside.
    val queryPasses = sys.env.getOrElse("SPARK_GRAFT_QUERY_PASSES", "2").toInt
    val qNames = SparkEntry.queries.toSeq.sortBy(_._1)
    // Sink = a noop-format write, NOT count(): count lets Catalyst prune
    // every unused projection, so a projection-only query (q17-q21) would
    // be timed as little more than a parquet metadata scan — measured: the
    // interpreted-HOF q19 cost 3.6 ms/doc under full evaluation while its
    // `.count()` "timing" sat at 0.3 s regardless. The noop sink evaluates
    // every output column and discards the rows executor-side.
    val passes = (0 until queryPasses).map { pass =>
      val p = qNames.map { case (name, fn) =>
        val (_, sec) = time {
          try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name pass $pass: $e")
          }
        }
        name -> sec
      }
      emitSection(s"queries_pass_$pass",
        f""""pass_total_sec":${p.map(_._2).sum}%.3f""")
      p
    }
    val results = qNames.zipWithIndex.map { case ((name, _), i) =>
      name -> passes.map(_(i)._2).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val rawPasses = passes.map(p =>
      p.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")).mkString("[", ",", "]")
    val total = results.map(_._2).sum
    emitSection("queries",
      f""""total_sec":$total%.3f,"queries":$qs,"query_passes":$rawPasses""")
    probeAt("after_queries")

    // ---- 3. BM25 latency distribution -------------------------------------
    // Noise defense (r5 verdict #6: the r5 artifact's p99 was 3,858 ms in
    // a measured cap window vs 585 in rehearsal): every 5th rep is stamped
    // with a quick probe reading, and alongside the raw p50/p99 the
    // best CONTIGUOUS half-window's p50/p99 are published — under the
    // host's multi-minute one-sided slow phases the best contiguous run
    // is the clean estimate, and the probe stamps say whether the raw
    // tail was the engine or the host.
    val searcher = new Searcher(spark, IndexCache.full(spark, sfDir))
    val termSets = Seq(
      Seq("spark", "vector", "dup"), Seq("merge", "sort"), Seq("dup"),
      Seq("window", "filter", "scan"), Seq("table", "query", "key"))
    val latStamps = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val latRaw = (0 until 30).map { i =>
      if (i % 5 == 0)
        latStamps += ((i, HostProbe.measure(windowMs = 500).capCores))
      val (_, sec) = time(searcher.bm25(termSets(i % termSets.size), 10).count())
      sec * 1000.0
    }
    def pcts(xs: Seq[Double]): (Double, Double) = {
      val s = xs.sorted
      (s(s.size / 2), s(math.min(s.size - 1, (s.size * 99) / 100)))
    }
    val (p50, p99) = pcts(latRaw)
    val half = latRaw.size / 2
    val bestWin = latRaw.sliding(half).minBy(_.sum)
    val (p50w, p99w) = pcts(bestWin)
    val latJson =
      f""""bm25_p50_ms":$p50%.1f,"bm25_p99_ms":$p99%.1f,""" +
        f""""bm25_best_window_p50_ms":$p50w%.1f,"bm25_best_window_p99_ms":$p99w%.1f,""" +
        s""""bm25_raw_ms":[${latRaw.map(v => f"$v%.0f").mkString(",")}],""" +
        s""""bm25_probe_cap_cores":[${latStamps.map(s => f"""[${s._1},${s._2}%.1f]""").mkString(",")}]"""
    emitSection("bm25_latency", latJson)

    // ---- 4. build throughput at the bench session's core count ------------
    // Same one-sided-noise defense as the query suite: two builds, keep the
    // best (r4 committed 12.8k docs/s in a slow phase; the same-day
    // rehearsal 29.4k), publish both raw reps.
    val buildReps = (0 until 2).map { i =>
      buildThroughput(spark, benchDocs, s"$tmp/main$i", cpus)
    }
    val (docsPerSec, postingsPerSec) = buildReps.maxBy(_._1)
    val buildRepsJson = buildReps
      .map(r => f"""{"docs_per_sec":${r._1}%.1f,"postings_per_sec":${r._2}%.1f}""")
      .mkString("[", ",", "]")
    emitSection("index_build",
      f""""docs":$benchDocs,"docs_per_sec":$docsPerSec%.1f,"postings_per_sec":$postingsPerSec%.1f,"build_reps":$buildRepsJson""")
    graft.util.Staging.dropStaged() // full drain: dedup + streaming staging
    spark.stop()
    // ask G1 to uncommit this JVM's now-idle multi-GB heap before block B's
    // children run: the scaling children should not share the box with a
    // fully committed local[32] heap they never benefit from
    System.gc()
    probeAt("before_block_b")

    // ---- 5. scaling block B under the remaining window, then merge -------
    val scalingJson = try {
      val blockB =
        if (genSec < 0) // input prep failed earlier; nothing to run against
          ScalingProbe.ScaleResult(Vector.empty, 0, budgetStop = false, 0.0)
        // failed A reps count against the total too: scaleReps bounds
        // ATTEMPTED reps across both blocks, so a run with failures can
        // never attempt more children than the configured cap
        else ScalingProbe.runWithDeadline(scaleCores, scaleDocs,
          scaleReps - blockA.reps.size - blockA.failedReps, scaleTmp,
          s"$scaleTmp/input", scaleDeadline,
          repOffset = blockA.reps.size + blockA.failedReps, gate = true)
      val reps = blockA.reps ++ blockB.reps
      val failed = blockA.failedReps + blockB.failedReps
      val budgetStop = blockB.budgetStop
      val repProbes = blockA.repProbes ++ blockB.repProbes
      val waitSec = blockA.probeWaitSec + blockB.probeWaitSec
      // the probe evidence rides the scaling JSON itself: every reading
      // from both blocks, per-completed-rep before/after capCores, the
      // gate threshold, and the total capped-window wait — a sub-0.8
      // efficiency with sub-threshold cap_cores stamps is the HOST's
      // number, and the artifact now says so by itself
      val probeJson =
        s""""probe_min_clean_cores":${HostProbe.minCleanCores},""" +
          s""""probe_wait_sec":$waitSec,""" +
          s""""host_probe_t_eff_cap":${HostProbe.compactArray(blockA.probeReadings ++ blockB.probeReadings)},""" +
          s""""rep_probe_cap_cores":[${repProbes.map(p => f"[${p._1}%.1f,${p._2}%.1f]").mkString(",")}]"""
      if (reps.isEmpty)
        f""""docs":$scaleDocs,"cores_lo":$loC,"cores_hi":$hiC,"gen_sec":$genSec%.1f,""" +
          s""""completed_reps":0,"failed_reps":$failed,""" +
          s""""budget_stop":$budgetStop,$probeJson,"efficiency":null"""
      else {
        val dpsLo = scaleDocs / reps.map(_(loC)).min
        val dpsHi = scaleDocs / reps.map(_(hiC)).min
        val (efficiency, medKept, perRepEff, keptReps) =
          ScalingProbe.robustEfficiency(reps, loC, hiC)
        f""""docs":$scaleDocs,"cores_lo":$loC,"cores_hi":$hiC,"gen_sec":$genSec%.1f,""" +
          f""""completed_reps":${reps.size},"reps_block_a":${blockA.reps.size},""" +
          f""""failed_reps":$failed,"budget_stop":$budgetStop,""" +
          f""""docs_per_sec_lo":$dpsLo%.1f,"docs_per_sec_hi":$dpsHi%.1f,""" +
          s""""per_rep_efficiency":[${perRepEff.map(e => f"$e%.3f").mkString(",")}],""" +
          s""""kept_reps":[${keptReps.mkString(",")}],""" +
          s"""$probeJson,""" +
          f""""efficiency_median_kept":$medKept%.3f,""" +
          f""""efficiency":$efficiency%.3f"""
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] scaling section failed: $e")
        s""""docs":$scaleDocs,"cores_lo":$loC,"cores_hi":$hiC,"error":"${e.getClass.getSimpleName}","efficiency":null"""
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scaleTmp))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    emitSection("scaling", scalingJson)
    probeAt("end")

    // compact trace entries: ["label", t_sec, eff_cores, cap_cores] — the
    // full readings were already printed live, one JSON line each
    val traceJson = probeTrace
      .map { case (l, r) =>
        f"""["$l",${r.atSec}%.0f,${r.effCores}%.1f,${r.capCores}%.1f]""" }
      .mkString("[", ",", "]")
    val wallSec = (System.nanoTime() - wall0) / 1e9
    // field ORDER matters: the driver keeps the LAST ~2000 characters of
    // stdout as the committed artifact tail, so the summary a reader needs
    // most — bm25 latency with its noise defense, then the scaling section
    // with the probe evidence and the efficiencies — goes at the END
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_passes":$rawPasses,"sf":"$sfDir",""" +
        f""""index_build":{"docs":$benchDocs,"docs_per_sec":$docsPerSec%.1f,"postings_per_sec":$postingsPerSec%.1f,"build_reps":$buildRepsJson,""" +
        f""""cache_build_full_sec":$buildFullSec%.3f,"cache_build_twowave_sec":$buildTwoSec%.3f,"cache_build_ann_sec":$buildAnnSec%.3f,"cache_build_ivf_sec":$buildIvfSec%.3f,"cache_build_pq_sec":$buildPqSec%.3f,"cache_build_trigram_sec":$buildTriSec%.3f,"stream_warm_sec":$streamWarmSec%.3f},""" +
        s""""stale_jvms":${stale.size},""" +
        f""""bench_wall_sec":$wallSec%.1f,"bench_budget_sec":$budgetSec,""" +
        s""""host_probe_trace":$traceJson,""" +
        s"""$latJson,""" +
        s""""scaling":{$scalingJson}}""")
  }
}
