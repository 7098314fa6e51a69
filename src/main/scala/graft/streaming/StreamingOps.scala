package graft.streaming

import graft.index.{IndexBuilder, IndexManifest, IndexOptions, ManifestIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming facets of the engine.
  *
  * The reference has no streaming framework, but its ingest IS an unbounded
  * push stream with a flush watermark (`max_active_size`,
  * /root/reference/src/storage/storage.rs:221-224) and a monotone-timestamp
  * clamp (block.rs:376-383). Those map to: micro-batch `foreachBatch` index
  * appends (one wave per batch ≙ one memtable flush) and watermarked
  * windowed aggregation.
  */
object StreamingOps {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The production streaming form: watermarked tumbling-window aggregation
    * over an event stream, returned as an unstarted streaming DataFrame for
    * the caller to sink (update mode + an incremental sink — kafka/delta/
    * foreachBatch; each window finalizes once the watermark passes it).
    * [[windowedEventCounts]] below wraps this with a complete-mode memory
    * sink, which materializes ALL windows on the driver — that form is the
    * ORACLE SHIM for bounded test inputs, not a production path.
    */
  def windowedEventCountsStream(events: DataFrame, windowSec: Int = 300,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(unix_timestamp(col("window.start")).as("ws"),
        col("event_type"), col("n"), col("total"))

  /** Tumbling-window counts over the events stream, run synchronously to
    * completion against a static parquet path (memory sink). Window start
    * is returned as epoch seconds so batch/oracle comparisons are
    * timezone-free. Harness-grade by construction (complete output mode,
    * driver-bound memory sink) — see [[windowedEventCountsStream]] for the
    * scale path.
    */
  def windowedEventCounts(spark: SparkSession, eventsPath: String,
      windowSec: Int = 300): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema
    // the file streaming source requires a directory; stage single files
    val streamPath = {
      val p = java.nio.file.Paths.get(eventsPath)
      if (java.nio.file.Files.isDirectory(p)) eventsPath
      else {
        val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      }
    }
    val stream = spark.readStream.schema(schema).parquet(streamPath)
    // the cast inside windowedEventCountsStream also converts parquet NTZ
    // timestamps to session-TZ (UTC) instants for watermarking
    val agg = windowedEventCountsStream(stream, windowSec)
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Streaming index ingest: every micro-batch becomes one committed LSM
    * wave (build for the first, append + tiered compaction after). DocIds
    * must already be assigned monotonically upstream (e.g. by an offset
    * column), mirroring the reference's rebase discipline.
    */
  def ingestStream(spark: SparkSession, docs: DataFrame, indexDir: String,
      opts: IndexOptions): org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (batch.isEmpty) ()
      else if (!ManifestIO.exists(indexDir))
        IndexBuilder.build(batch.sparkSession, batch, indexDir, opts): Unit
      else {
        IndexBuilder.append(batch.sparkSession, batch, indexDir)
        graft.index.Compactor.compact(batch.sparkSession, indexDir): Unit
      }
    }.start()
  }
}
