package graft.index

import graft.codec.PBlock

/** One posting run: all postings of `term` inside segment `segId`, built in
  * LSM wave `wave`. Spark-side analogue of one (tag -> posting list) entry of
  * the reference's columnar BlockData (/root/reference/src/storage/
  * block.rs:87-93), generalized with per-run stats + compressed blocks.
  *
  * docID spaces of distinct (wave, segId) pairs are disjoint; postings within
  * a run are strictly ascending; runs of the same (term, segId) across waves
  * concatenate in wave order without re-sorting — the reference's rebased
  * merge invariant (/root/reference/src/storage/block.rs:196-204).
  */
final case class SegmentPosting(
    term: String,
    wave: Int,
    segId: Long,
    df: Long,
    tf: Long,
    maxTf: Int,
    blocks: Array[PBlock])

/** Per-segment document-length (norms) sidecar: varbyte docIds (delta) and
  * dls, in docId order. ≙ the reference's per-block keys/timestamps forward
  * columns (/root/reference/src/storage/block.rs:90-91), carrying BM25 length
  * normalization instead.
  */
final case class SegmentNorms(
    wave: Int,
    segId: Long,
    n: Int,
    docBytes: Array[Byte],
    dlBytes: Array[Byte],
    sumDl: Long,
    minDocId: Long,
    maxDocId: Long,
    minTs: Long,
    maxTs: Long)

/** Forward map docId -> external key (+ doc stats). ≙ `keys`/`timestamps`
  * columns of the reference block (/root/reference/src/storage/block.rs:90-91).
  * `ts` is epoch millis (0 when the corpus carries no timestamp).
  */
final case class DocMeta(docId: Long, key: String, dl: Int, ts: Long)

/** Global per-term statistics (rebuilt on every wave commit). */
final case class TermStats(term: String, df: Long, tf: Long, maxTf: Int)

/** Build-time knobs. `docsPerSegment` bounds the docId range of one segment
  * (the merge/intersection unit); `withPositions` enables phrase queries at
  * the cost of position bytes; `analyzer` selects the term extractor —
  * "word" (Tokenize spec v1, BM25/boolean search) or "trigram" (Trigram
  * spec v1, exact substring search) — over the SAME posting machinery.
  * The manifest's `tokenizer` field records the choice (word indexes keep
  * the historical bare Tokenize.Version stamp), so `append` waves can never
  * mix analyzers within one index.
  */
final case class IndexOptions(
    docsPerSegment: Long = 1L << 20,
    blockSize: Int = 128,
    withPositions: Boolean = true,
    analyzer: String = IndexOptions.WordAnalyzer) {
  require(analyzer == IndexOptions.WordAnalyzer
    || analyzer == IndexOptions.TrigramAnalyzer,
    s"unknown analyzer '$analyzer' (word | trigram)")

  /** Manifest `tokenizer` stamp for this analyzer. */
  def tokenizerStamp: String =
    if (analyzer == IndexOptions.TrigramAnalyzer)
      s"trigram-${graft.text.Trigram.Version}"
    else graft.text.Tokenize.Version
}

object IndexOptions {
  val WordAnalyzer = "word"
  val TrigramAnalyzer = "trigram"

  /** Inverse of [[IndexOptions.tokenizerStamp]] for reopening an index. */
  def analyzerOf(tokenizerStamp: String): String =
    if (tokenizerStamp.startsWith("trigram")) TrigramAnalyzer else WordAnalyzer
}

/** One committed LSM wave (≙ one flushed+compacted block file of the
  * reference, /root/reference/src/storage/storage.rs:336-358, but committed
  * atomically via manifest-last ordering — the reference's acknowledged
  * write-loss TODO at storage.rs:345-348 is deliberately NOT reproduced).
  *
  * `docmetaWaves` lists the PHYSICAL `docmeta/wave=N` dirs holding this
  * wave's forward map; empty means "my own wave dir" (the build/append
  * case). Compaction merges docmeta VIRTUALLY by unioning the source
  * waves' lists instead of rewriting the corpus-sized forward map every
  * merge: wave docId ranges are disjoint and each dir is already
  * range-partitioned/sorted by docId, so the union of dirs serves reads
  * identically — and since nothing moves on disk, the manifest commit
  * stays the only visible state change (crash-safe by construction,
  * unlike a rename performed before OR after the commit).
  */
final case class WaveInfo(
    wave: Int,
    numDocs: Long,
    totalTokens: Long,
    minDocId: Long,
    maxDocId: Long,
    minTs: Long,
    maxTs: Long,
    buildSec: Double,
    docsPerSec: Double,
    postingsPerSec: Double,
    docmetaWaves: List[Int] = Nil) {
  /** Physical docmeta wave dirs backing this logical wave. */
  def docmetaWaveIds: Seq[Int] =
    if (docmetaWaves.isEmpty) Seq(wave) else docmetaWaves
}

/** `lastStreamBatch`: high-water mark of the streaming-ingest batchId
  * whose wave this manifest already contains (-1 = none / batch ingest
  * only). Committed atomically WITH the wave entry, so a replayed
  * `foreachBatch` (at-least-once) can be skipped exactly-once: either the
  * crash happened before the commit (no wave, no mark — the replay
  * ingests) or after it (wave and mark both visible — the replay
  * no-ops). Compaction's `m0.copy` carries it through untouched.
  */
final case class IndexManifest(
    version: Int,
    tokenizer: String,
    docsPerSegment: Long,
    blockSize: Int,
    withPositions: Boolean,
    waves: List[WaveInfo],
    lastStreamBatch: Long = -1L) {
  def totalDocs: Long = waves.map(_.numDocs).sum
  def totalTokens: Long = waves.map(_.totalTokens).sum
  def avgdl: Double = if (totalDocs == 0) 0.0 else totalTokens.toDouble / totalDocs
  def waveIds: Seq[Int] = waves.map(_.wave)
  def nextDocBase: Long = if (waves.isEmpty) 0L else waves.map(_.maxDocId).max + 1
}
