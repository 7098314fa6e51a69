package graft

/** The host-concurrency probe is bench EVIDENCE (BENCH_r06+ publishes its
  * readings to attribute capped-window scaling numbers in-artifact), so
  * its invariants get the same spec treatment as operators. No Spark.
  */
class HostProbeSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("a reading is sane: positive cores within the thread budget, slowdown >= ~1") {
    val r = HostProbe.measure(threads = 4, windowMs = 400)
    assert(r.threads == 4)
    assert(r.effCores > 0.1, r.json)
    // effCores exceeds the worker count only when the single-thread
    // samples caught a host stall the saturation window missed — bound
    // at 2x the workers: beyond that the instrument itself is broken
    assert(r.effCores <= 8.0, r.json)
    assert(r.singleMs > 0.0, r.json)
    // the running floor is the min over observed chunks, so the window's
    // own single-thread time can undercut it only within timer jitter
    assert(r.stSlowdown >= 0.95, r.json)
    assert(r.capCores <= r.effCores + 1e-9, r.json)
  }

  test("reading JSON is well-formed and carries every artifact field") {
    val r = HostProbe.measure(threads = 2, windowMs = 300)
    val j = r.json
    for (f <- Seq("t_sec", "eff_cores", "cap_cores", "st_slowdown",
        "st_chunk_ms", "threads"))
      assert(j.contains("\"" + f + "\":"), j)
    // structurally valid: balanced braces, no trailing comma
    assert(j.startsWith("{") && j.endsWith("}") && !j.contains(",}"), j)
    val arr = HostProbe.jsonArray(Seq(r, r))
    assert(arr.startsWith("[{") && arr.endsWith("}]"), arr)
  }

  test("more workers never measure LESS aggregate capacity (monotone, coarse)") {
    // coarse 2x margin: scheduling noise is real, but 4 workers reading
    // under HALF of 1 worker's rate would mean the instrument (not the
    // host) is broken — e.g. the DCE sink or the latch went wrong
    val r1 = HostProbe.measure(threads = 1, windowMs = 400)
    val r4 = HostProbe.measure(threads = 4, windowMs = 400)
    assert(r4.effCores > r1.effCores / 2.0, s"${r1.json} vs ${r4.json}")
  }
}
