package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper

/** Manifest read/write. The manifest is the index's commit point: a wave's
  * data files are visible iff its entry is in the manifest, and the manifest
  * is replaced atomically (write temp + move). This is our Iceberg-snapshot
  * stand-in (SURVEY.md §7.0): same DataFrame shapes, one `format("iceberg")`
  * switch away in production, and it fixes the reference's acknowledged
  * crash-loss bug (/root/reference/src/storage/storage.rs:345-348) by
  * committing metadata strictly after data.
  */
object ManifestIO {
  val FileName = "manifest.json"

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(m: IndexManifest): String = {
    val waves = m.waves.map { w =>
      val dmw = if (w.docmetaWaves.isEmpty) ""
        else s""","docmetaWaves":[${w.docmetaWaves.mkString(",")}]"""
      s"""{"wave":${w.wave},"numDocs":${w.numDocs},"totalTokens":${w.totalTokens},""" +
        s""""minDocId":${w.minDocId},"maxDocId":${w.maxDocId},"minTs":${w.minTs},"maxTs":${w.maxTs},""" +
        s""""buildSec":${w.buildSec},"docsPerSec":${w.docsPerSec},"postingsPerSec":${w.postingsPerSec}$dmw}"""
    }.mkString("[", ",", "]")
    val lsb = if (m.lastStreamBatch < 0) ""
      else s""""lastStreamBatch":${m.lastStreamBatch},"""
    s"""{"version":${m.version},"tokenizer":"${esc(m.tokenizer)}","docsPerSegment":${m.docsPerSegment},""" +
      s""""blockSize":${m.blockSize},"withPositions":${m.withPositions},$lsb""" +
      s""""totalDocs":${m.totalDocs},"totalTokens":${m.totalTokens},"waves":$waves}"""
  }

  def write(dir: String, m: IndexManifest): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, FileName + ".tmp")
    Files.write(tmp, toJson(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, FileName),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir, FileName))

  /** Cheap change-detection token for a committed manifest: (mtime, size,
    * fileKey) from ONE stat call. `write` replaces the file atomically via
    * a rename, which gives the manifest a NEW inode — so the fileKey
    * component changes on EVERY commit, closing the (mtime, size) aliasing
    * hole where two commits inside the same millisecond producing the same
    * byte count would serve a silently stale Searcher. Filesystems that
    * report no fileKey (returns null) fall back to mtime+size alone.
    */
  def stamp(dir: String): (Long, Long, String) = {
    val p = Paths.get(dir, FileName)
    val attrs = Files.readAttributes(
      p, classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = attrs.fileKey()
    (attrs.lastModifiedTime().toMillis, attrs.size(),
      if (key == null) "" else key.toString)
  }

  /** Manifest reads per index dir in this JVM — a test observability hook
    * (RuleSpec asserts Searcher memoization keeps repeated queries from
    * re-reading manifests; per-dir so concurrently running suites don't
    * perturb each other's counts).
    */
  private val readCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  def readCount(dir: String): Long = {
    val c = readCounts.get(dir)
    if (c == null) 0L else c.get()
  }

  def read(dir: String): IndexManifest = {
    readCounts.computeIfAbsent(dir,
      _ => new java.util.concurrent.atomic.AtomicLong(0)).incrementAndGet()
    val bytes = Files.readAllBytes(Paths.get(dir, FileName))
    val root = new ObjectMapper().readTree(bytes)
    val ver = root.get("version").asInt()
    // fail fast on any other format version: a v1 index has a flat (unpar-
    // titioned) termstats dir and no per-block minDl, so reading it with
    // this code would throw obscure schema errors deep in a query instead
    // of a clear contract error here. Indexes are derived data — rebuild.
    require(ver == IndexBuilder.Version,
      s"index at $dir is format v$ver; this build reads/writes " +
        s"v${IndexBuilder.Version} (v1 -> v2: per-wave termstats layout + " +
        "per-block minDl metadata). Rebuild the index from the corpus.")
    val waves = root.get("waves").elements()
    val buf = scala.collection.mutable.ListBuffer.empty[WaveInfo]
    while (waves.hasNext) {
      val w = waves.next()
      buf += WaveInfo(
        wave = w.get("wave").asInt(),
        numDocs = w.get("numDocs").asLong(),
        totalTokens = w.get("totalTokens").asLong(),
        minDocId = w.get("minDocId").asLong(),
        maxDocId = w.get("maxDocId").asLong(),
        minTs = w.get("minTs").asLong(),
        maxTs = w.get("maxTs").asLong(),
        buildSec = w.get("buildSec").asDouble(),
        docsPerSec = w.get("docsPerSec").asDouble(),
        postingsPerSec = w.get("postingsPerSec").asDouble(),
        docmetaWaves = {
          val n = w.get("docmetaWaves")
          if (n == null) Nil
          else {
            val it = n.elements()
            val b = scala.collection.mutable.ListBuffer.empty[Int]
            while (it.hasNext) b += it.next().asInt()
            b.toList
          }
        })
    }
    IndexManifest(
      version = root.get("version").asInt(),
      tokenizer = root.get("tokenizer").asText(),
      docsPerSegment = root.get("docsPerSegment").asLong(),
      blockSize = root.get("blockSize").asInt(),
      withPositions = root.get("withPositions").asBoolean(),
      waves = buf.toList,
      lastStreamBatch = {
        val n = root.get("lastStreamBatch")
        if (n == null) -1L else n.asLong()
      })
  }
}
