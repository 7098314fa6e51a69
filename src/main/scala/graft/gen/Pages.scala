package graft.gen

import graft.util.Hashing._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One synthetic Common-Crawl-style web page, shaped exactly per
  * BASELINE.json input_hint:
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic page generator (FIXTURES.md §2, seed 42).
  *
  * - 1,000-word Zipf(s ~= 1.07) vocabulary `term0000`..`term0999`: head terms
  *   hit nearly every doc (the stopword-skew path), tail terms few (point
  *   lookups).
  * - `warc_ts` strictly increasing in doc index i — the monotone-timestamp
  *   invariant the reference clamps into every block
  *   (/root/reference/src/storage/block.rs:376-383).
  * - html is built FROM text so the html->text extractor can be asserted
  *   byte-identical per row (input_hint invariant).
  *
  * All randomness is splitmix64 of (seed, i[, j]); no RNG state, so any
  * row is computable independently on any executor — the generator
  * parallelizes via `spark.range`.
  */
object Pages {
  val Seed = 42L
  val VocabSize = 1000
  val ZipfS = 1.07
  val Epoch = 1704067200000L // 2024-01-01T00:00:00Z millis

  val vocab: Array[String] = Array.tabulate(VocabSize)(j => f"term$j%04d")

  /** Cumulative Zipf weights, normalized to [0,1). */
  private val cumWeights: Array[Double] = {
    val w = Array.tabulate(VocabSize)(j => 1.0 / math.pow(j + 1.0, ZipfS))
    val total = w.sum
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var j = 0
    while (j < VocabSize) { acc += w(j) / total; cum(j) = acc; j += 1 }
    cum(VocabSize - 1) = 1.0
    cum
  }

  @inline private def unit(h: Long): Double = (h >>> 11) * 1.1102230246251565e-16 // 2^-53

  def zipfRank(h: Long): Int = {
    val u = unit(h)
    val idx = java.util.Arrays.binarySearch(cumWeights, u)
    val r = if (idx >= 0) idx + 1 else -idx - 1
    math.min(r, VocabSize - 1)
  }

  private val langs = Array("en", "de", "fr", "es", "ru")

  def text(i: Long): String = {
    val w = 20 + (mix(Seed ^ 0x7e2d, i) % 180 + 180) % 180
    val sb = new java.lang.StringBuilder()
    var j = 0L
    while (j < w) {
      if (j > 0) sb.append(' ')
      sb.append(vocab(zipfRank(mix(Seed ^ 0x3c91, i * 1000003L + j))))
      j += 1
    }
    sb.toString
  }

  def page(i: Long): Page = {
    val h = mix(Seed, i)
    val t = text(i)
    val url = s"https://example-${((h % 1000) + 1000) % 1000}.org/p/$i"
    val tsMillis = Epoch + i * 1000L + ((h % 1000) + 1000) % 1000
    val html = s"<html><head><title>T$i</title></head><body><p>$t</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(url, new java.sql.Timestamp(tsMillis), html, t, langs((((h >>> 13) % 5) + 5).toInt % 5))
  }

  /** Distributed generation: one deterministic row per i in [0, n). */
  def generate(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => page(i.longValue))).toDF()
  }
}
