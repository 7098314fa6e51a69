package graft

import graft.index._
import graft.sources.CorpusSource
import org.apache.spark.sql.SparkSession

/** spark-submit entry points (SURVEY.md §2.1 #26):
  *
  *   spark-submit --class graft.BuildIndex app.jar <tableSpec> <indexDir> \
  *       [--append] [--docs-per-segment N] [--no-positions] [--compact]
  *   spark-submit --class graft.QueryIndex app.jar <indexDir> \
  *       <and|or|phrase|lookup|bm25> term [term ...] [--k N] \
  *       [--from epochMs --to epochMs] [--resolve]
  *
  * tableSpec: `parquet:/path`, `iceberg:cat.db.tbl`, or `table:name`
  * (CorpusSource). The input must be pages-shaped (url, warc_ts,
  * html|text, ...); docIds are assigned deterministically.
  */
object CliSession {
  def session(name: String): SparkSession = {
    val b = SparkSession.builder().appName(name)
      .config("spark.sql.session.timeZone", "UTC")
    // local default for ad-hoc runs; spark-submit's --master wins if set
    if (!sys.props.contains("spark.master") && sys.env.get("MASTER").isEmpty)
      b.master("local[*]").config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors.toString)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

object BuildIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BuildIndex <tableSpec> <indexDir> [flags]")
    val spec = args(0)
    val dir = args(1)
    val flags = args.drop(2)
    def flagVal(name: String): Option[String] =
      flags.sliding(2).collectFirst { case Array(`name`, v) => v }
    val spark = CliSession.session("graft-build")
    val opts = IndexOptions(
      docsPerSegment = flagVal("--docs-per-segment").map(_.toLong).getOrElse(1L << 20),
      withPositions = !flags.contains("--no-positions"))
    val pages = CorpusSource.load(spark, spec)
    val append = flags.contains("--append")
    val base = if (append) ManifestIO.read(dir).nextDocBase else 0L
    val input = CorpusSource.pagesAsIndexInput(pages, assignIds = true, idBase = base)
    val m = if (append) IndexBuilder.append(spark, input, dir)
      else IndexBuilder.build(spark, input, dir, opts)
    val m2 = if (flags.contains("--compact")) Compactor.compact(spark, dir) else m
    val w = m2.waves.maxBy(_.wave)
    println(s"committed wave ${w.wave}: ${w.numDocs} docs, " +
      f"${w.docsPerSec}%.0f docs/sec, ${w.postingsPerSec}%.0f postings/sec; " +
      s"index now ${m2.totalDocs} docs / ${m2.waves.size} wave(s)")
    spark.stop()
  }
}

/** Continuous streaming index ingest (SURVEY.md §2.1 #2's production
  * shape as a spark-submit app):
  *
  *   spark-submit --class graft.StreamIndex app.jar <watchDir> <indexDir> \
  *       [--checkpoint DIR] [--docs-per-segment N] [--no-positions] \
  *       [--max-files-per-trigger N] [--no-compact] [--once]
  *
  * Watches `watchDir` for pages-shaped parquet drops; every micro-batch
  * commits one LSM wave, tiered compaction keeps the wave count bounded,
  * and with `--checkpoint` a restart resumes exactly-once (the manifest's
  * stream-batch high-water mark suppresses foreachBatch replays). `--once`
  * drains what is currently available and exits (cron-style ingest);
  * without it the query runs until killed.
  */
object StreamIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamIndex <watchDir> <indexDir> [flags]")
    val watchDir = args(0)
    val indexDir = args(1)
    val flags = args.drop(2)
    def flagVal(name: String): Option[String] =
      flags.sliding(2).collectFirst { case Array(`name`, v) => v }
    val spark = CliSession.session("graft-stream-index")
    val opts = IndexOptions(
      docsPerSegment = flagVal("--docs-per-segment").map(_.toLong).getOrElse(1L << 20),
      withPositions = !flags.contains("--no-positions"))
    val q = graft.streaming.StreamingOps.ingestPagesStream(
      spark, watchDir, indexDir, opts,
      maxFilesPerTrigger = flagVal("--max-files-per-trigger").map(_.toInt).getOrElse(8),
      checkpointDir = flagVal("--checkpoint"),
      compact = !flags.contains("--no-compact"))
    if (flags.contains("--once")) {
      q.processAllAvailable()
      q.stop()
      val m = ManifestIO.read(indexDir)
      println(s"drained: index now ${m.totalDocs} docs / ${m.waves.size} " +
        s"wave(s), last stream batch ${m.lastStreamBatch}")
      spark.stop()
    } else q.awaitTermination()
  }
}

/** Index inspection (ops tooling):
  *
  *   spark-submit --class graft.IndexStats app.jar <indexDir>
  *
  * Prints the manifest summary, per-wave build metrics, on-disk bytes per
  * component, and postings totals (one small aggregate over termstats —
  * the posting blobs are never read).
  */
object IndexStats {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: IndexStats <indexDir>")
    val dir = args(0)
    val spark = CliSession.session("graft-index-stats")
    try println(report(spark, dir))
    finally spark.stop()
  }

  def report(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val m = ManifestIO.read(dir)
    def bytesOf(sub: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
    }
    val comps = Seq("segments", "norms", "docmeta", "termstats")
      .map(c => c -> bytesOf(c))
    val Seq(terms, postings) = spark.read
      .parquet(s"${IndexBuilder.termstatsPath(dir)}")
      .agg(count_distinct(col("term")), sum(col("tf")))
      .head().toSeq.map(v => Option(v).fold(0L)(_.toString.toLong))
    val segBytes = comps.head._2
    val sb = new StringBuilder
    sb ++= s"index $dir: format v${m.version}, tokenizer ${m.tokenizer}\n"
    sb ++= f"  docs ${m.totalDocs}%,d  tokens ${m.totalTokens}%,d  " +
      f"avgdl ${m.avgdl}%.1f  waves ${m.waves.size}"
    if (m.lastStreamBatch >= 0) sb ++= s"  lastStreamBatch ${m.lastStreamBatch}"
    sb ++= "\n"
    sb ++= f"  terms ${terms}%,d  postings ${postings}%,d  " +
      f"(${if (postings == 0) 0.0 else segBytes.toDouble / postings}%.2f segment bytes/posting)\n"
    comps.foreach { case (c, b) => sb ++= f"  $c%-9s ${b / 1048576.0}%,.1f MiB\n" }
    m.waves.foreach { w =>
      sb ++= f"  wave ${w.wave}%3d: ${w.numDocs}%,d docs  ids [${w.minDocId},${w.maxDocId}]  " +
        f"${w.docsPerSec}%,.0f docs/s  docmeta dirs ${w.docmetaWaveIds.mkString(",")}\n"
    }
    sb.result()
  }
}

object QueryIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryIndex <indexDir> <mode> term... [flags]")
    val dir = args(0)
    val mode = args(1)
    val rest = args.drop(2)
    val flagNames = Set("--k", "--from", "--to")
    val boolFlags = Set("--resolve")
    val terms = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < rest.length) {
        if (flagNames(rest(i))) i += 2
        else if (boolFlags(rest(i))) i += 1
        else { buf += rest(i); i += 1 }
      }
      buf.toSeq
    }
    def flagVal(name: String): Option[String] =
      rest.sliding(2).collectFirst { case Array(`name`, v) => v }
    val k = flagVal("--k").map(_.toInt).getOrElse(10)
    val spark = CliSession.session("graft-query")
    val base = new Searcher(spark, dir)
    val s = (flagVal("--from"), flagVal("--to")) match {
      case (Some(f), Some(t)) => base.inTimeRange(f.toLong, t.toLong)
      case _ => base
    }
    val result = mode match {
      case "lookup" => s.lookup(terms.head)
      case "and" => s.and(terms.toSeq)
      case "or" => s.or(terms.toSeq)
      case "phrase" => s.phrase(terms.toSeq)
      case "bm25" => s.bm25(terms.toSeq, k)
      case other => sys.error(s"unknown mode $other")
    }
    // --resolve: join docIds back to the forward map (url/key + ts)
    val out = if (rest.contains("--resolve")) s.resolve(result) else result
    out.show(k, truncate = false)
    println(s"${out.count()} rows")
    spark.stop()
  }
}
