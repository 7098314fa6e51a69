package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded media metadata for one document. The schema is the real
  * contract a downstream trainer consumes.
  */
final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
    height: Int, frames: Int, kind: String)

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns processed in partition-sized batches.
  *
  * The metadata decode is REAL for container formats whose headers are
  * parseable in pure JVM code with no codec libraries — BMP and PNG image
  * dimensions, WAV sample counts ([[Multimodal.decode]], each gated by a
  * byte-level unit test on hand-crafted files). Payloads in formats the
  * container can't decode (no JPEG/opus codecs ship here) fall back to the
  * deterministic [[Multimodal.decodeStub]] so tests and oracles can still
  * gate the batch plumbing end-to-end.
  */
object Multimodal {

  /** STUB decoder for unrecognized formats: a real implementation would
    * call an image/audio codec on `payload`. Metadata derives
    * deterministically from the payload bytes so oracles can gate the
    * plumbing around it.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, String) = {
    val n = if (payload == null) 0 else payload.length
    val width = 64 + n % 576
    val height = 64 + (n * 7) % 416
    val frames = 1 + n % 16
    val kind = n % 3 match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    (width, height, frames, kind)
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Real header parse: (width, height, frames, kind), or None if the
    * payload is not a recognizable BMP / PNG / WAV.
    *
    *  - BMP: BITMAPINFOHEADER width/height (little-endian int32 at byte
    *    18/22 of the file, per the public Windows BMP layout).
    *  - PNG: IHDR width/height (big-endian int32 right after the 8-byte
    *    signature + chunk length/type, per the PNG spec).
    *  - WAV: RIFF/WAVE chunk walk; frames = data-chunk bytes / block align
    *    from the fmt chunk, per the public RIFF WAVE layout.
    */
  def decodeReal(p: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (p == null) return None
    // BMP
    if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
      return Some((le32(p, 18), le32(p, 22), 1, "image"))
    // PNG
    if (p.length >= 24 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
        p(3) == 'G' && p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      return Some((be32(p, 16), be32(p, 20), 1, "image"))
    // WAV: RIFF....WAVE then chunk list. The walk runs on UNTRUSTED bytes:
    // chunk sizes are read as UNSIGNED 32-bit (a signed read lets a crafted
    // size of -8/-9 zero the advance — an executor-wedging busy loop — and
    // more-negative sizes drive the offset negative and throw), offsets are
    // tracked in Long so `off + 8 + sz` cannot overflow, and the offset must
    // strictly advance every iteration (structurally guaranteed by sz >= 0,
    // enforced anyway as a belt-and-braces guard).
    if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
      var off = 12L
      var blockAlign = 0
      var dataSize = -1L
      var walking = true
      while (walking && off + 8 <= p.length && (blockAlign == 0 || dataSize < 0)) {
        val io = off.toInt
        val id = new String(p, io, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = le32(p, io + 4) & 0xffffffffL // chunk size is unsigned
        if (id == "fmt " && io + 22 + 2 <= p.length) blockAlign = le16(p, io + 20)
        if (id == "data") dataSize = sz
        val next = off + 8L + sz + (sz & 1L) // chunks are word-aligned
        if (next <= off) walking = false else off = next
      }
      if (blockAlign > 0 && dataSize >= 0)
        return Some((0, 0,
          math.min(dataSize / blockAlign, Int.MaxValue.toLong).toInt, "audio"))
    }
    None
  }

  /** Parse-or-stub: real container headers first, deterministic stub for
    * everything else.
    */
  def decode(payload: Array[Byte]): (Int, Int, Int, String) =
    decodeReal(payload).getOrElse(decodeStub(payload))

  /** Extract media metadata from (idCol LONG, payloadCol BINARY) rows.
    * Batched per partition; payload bytes never hit the driver.
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val n = if (payload == null) 0L else payload.length.toLong
          val (w, h, f, k) = decode(payload)
          MediaMeta(id, n, w, h, f, k)
        }
      }
  }

  // ---- deterministic payload synthesis (fixture path) ---------------------
  // The testdata tables carry no real media bytes, so the driver queries
  // synthesize valid container files from (doc_id, text): docs 0 mod 3 get a
  // real BMP header (+text tail as pixel junk), 1 mod 3 a real WAV with one
  // 16-bit sample per text char, 2 mod 3 the raw text bytes (unrecognized ->
  // stub fallback). All three decode paths are exercised and every output
  // field stays a closed form of (doc_id, length(text)) for the SQL oracle.

  def bmpBytes(width: Int, height: Int, tail: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + tail.length)
    def wle32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def wle16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    wle32(2, out.length); wle32(10, 54)
    wle32(14, 40); wle32(18, width); wle32(22, height)
    wle16(26, 1); wle16(28, 24)
    System.arraycopy(tail, 0, out, 54, tail.length)
    out
  }

  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val out = new Array[Byte](44 + dataSize)
    def wle32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def wle16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); wle32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); wle32(16, 16); wle16(20, 1); wle16(22, channels)
    wle32(24, sampleRate); wle32(28, sampleRate * blockAlign)
    wle16(32, blockAlign); wle16(34, bitsPerSample)
    tag(36, "data"); wle32(40, dataSize)
    out
  }

  /** (doc_id, text) -> deterministic container payload (see above). */
  def synthPayload: (Column, Column) => Column = { (docId, text) =>
    val f = udf { (id: Long, t0: String) =>
      val t = if (t0 == null) "" else t0
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val L = bytes.length
      (id % 3) match {
        case 0 => bmpBytes(64 + L % 576, 64 + (L * 7) % 416, bytes)
        case 1 => wavBytes(16000, 1, 16, L)
        case _ => bytes
      }
    }
    f(docId, text)
  }
}
