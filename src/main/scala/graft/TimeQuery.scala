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
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name rep$r rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
