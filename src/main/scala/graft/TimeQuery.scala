package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: `runMain graft.TimeQuery <sfDir>
  * <queryName>[,<queryName>...] [reps]`. Prints per-rep wall seconds so
  * regressions can be bisected without a full Bench run. Uses the same
  * session shape as Bench (local[N], N shuffle partitions, UTC).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; r <- 1 to reps) {
      val fn = SparkEntry.queries(name)
      val s0 = graft.index.Searcher.scoredCount.sum()
      val t0 = System.nanoTime()
      // noop sink, not count(): count would let Catalyst prune unused
      // projections and time projection-only queries as metadata scans
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val scored = graft.index.Searcher.scoredCount.sum() - s0
      // `scored` = exact BM25 scorings this rep (local-mode pruning
      // diagnostic; 0 for non-BM25 queries)
      println(f"[timequery] $name rep$r sec=$sec%.2f scored=$scored")
    }
    graft.ops.Dedup.dropStaged()
    spark.stop()
  }
}
