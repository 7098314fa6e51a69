package graft

/** Driver-contract consistency: every oracle has a query, the flagship
  * returns rows, and result column names line up with the oracle aliases
  * (the driver hashes columns sorted by name — a mismatch zeroes the query).
  */
class EntrySpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("IndexStats report summarizes the cached index without reading blobs") {
    val r = graft.IndexStats.report(spark,
      IndexCache.full(spark, "/root/testdata/sf0.001"))
    assert(r.contains("docs 500"), r)
    assert(r.contains("wave   0:"), r)
    assert(r.contains("postings"), r)
    assert(r.contains("segments"), r)
  }

  test("every query runs and is non-empty at sf0.001 (except known-empty)") {
    val mayBeEmpty = Set("q10_dedup_exact") // no exact dups at small sf — still 500 rows though
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
      if (!mayBeEmpty.contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }
}
