package graft

import graft.gen.Pages
import graft.index.{IndexBuilder, IndexOptions}
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency probe (BASELINE.md protocol): identical build at
  * local[N] for each core count, same input, shuffle partitions scaled with
  * cores. Configurations are run INTERLEAVED (A,B,A,B) and the minimum wall
  * time per configuration is used — the sandbox host is multi-tenant and a
  * single measurement can be off by 2-3x; min-of-reps is the standard
  * noise-robust estimator for throughput. Run exclusively.
  */
object ScalingProbe {

  def buildOnce(cores: Int, docs: Long, dir: String): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scale-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val pages = Pages.generate(spark, docs, partitions = 32)
      val input = IndexBuilder.assignDocIds(spark, pages, "url", 0L, 32)
        .selectExpr("docId", "url AS key", "text", "warc_ts AS ts")
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, input, dir,
        IndexOptions(docsPerSegment = 1L << 14, withPositions = true))
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }

  /** Interleaved min-of-reps throughput per core count (docs/sec). */
  def run(cores: Seq[Int], docs: Long, reps: Int,
      tmp: String): Map[Int, Double] = {
    val best = scala.collection.mutable.Map.empty[Int, Double]
    (0 until reps).foreach { r =>
      cores.foreach { c =>
        val sec = buildOnce(c, docs, s"$tmp/c$c-r$r")
        println(f"""{"cores":$c,"rep":$r,"docs":$docs,"sec":$sec%.1f,"docs_per_sec":${docs / sec}%.1f}""")
        best(c) = math.min(best.getOrElse(c, Double.MaxValue), sec)
      }
    }
    best.map { case (c, sec) => c -> docs / sec }.toMap
  }

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "400000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val cores = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    // tmpfs output: on one box the disk is shared across all thread counts,
    // which under-measures cluster scaling where each node brings its own
    // disks; memory-backed output makes the proxy measure compute+shuffle.
    val tmpRoot = if (new java.io.File("/dev/shm").isDirectory)
      java.nio.file.Paths.get("/dev/shm") else
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tmp = java.nio.file.Files.createTempDirectory(tmpRoot, "graft-scale").toString
    // warm-up: one small untimed build so JIT compilation doesn't land in rep 0
    buildOnce(cores.max, math.min(docs / 8, 50000L), s"$tmp/warmup")
    val tp = run(cores, docs, reps, tmp)
    val lo = cores.head
    val hi = cores.last
    val eff = (tp(hi) / tp(lo)) / (hi.toDouble / lo)
    println(f"""{"docs":$docs,"reps":$reps,"best_docs_per_sec":{${cores.map(c => s""""$c":${tp(c).round}""").mkString(",")}},"efficiency_${lo}_to_$hi":$eff%.3f}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
