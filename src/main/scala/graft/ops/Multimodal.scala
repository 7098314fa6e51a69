package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded media metadata for one document. The schema is the real
  * contract a downstream trainer consumes; only the pixel/sample decode is
  * stubbed (see [[Multimodal.decodeStub]]).
  */
final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
    height: Int, frames: Int, kind: String)

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns processed in partition-sized batches.
  *
  * The container ships no media codecs, so the decode itself is a
  * deterministic STUB (`decodeStub`) — everything around it is real and
  * tested: binary column handling, typed batch iteration via
  * `mapPartitions` (one JVM-side batch per partition — the Scala analogue
  * of an arrow-batched UDF), deterministic metadata schema, and partition
  * sizing that keeps payload batches bounded in memory.
  */
object Multimodal {

  /** STUB decoder: a real implementation would call an image/audio codec
    * (JPEG/PNG/opus...) on `payload`. Here metadata derives deterministically
    * from the payload bytes so tests and oracles can gate the plumbing.
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
          val (w, h, f, k) = decodeStub(payload)
          MediaMeta(id, n, w, h, f, k)
        }
      }
  }
}
