package graft

import graft.gen.Pages
import graft.index._
import graft.text.{HtmlText, Tokenize}
import org.apache.spark.sql.functions._

/** End-to-end build pipeline over the synthetic pages corpus
  * (FIXTURES.md §2): extraction byte-identity, docID assignment,
  * round-trip inversion, resume, and time-range pruning.
  */
class BuildSpec extends SparkSpec {
  import spark.implicits._

  private val N = 2000L

  private lazy val pages = Pages.generate(spark, N, partitions = 8).cache()

  /** docs input: deterministic docIds via the zipWithIndex-free assigner. */
  private lazy val docs = IndexBuilder
    .assignDocIds(spark, pages, "url", base = 0L, numPartitions = 8)
    .select(col("docId"), col("url").as("key"), col("text"),
      col("warc_ts").as("ts"))
    .cache()

  test("html -> text extraction is byte-identical per row (input_hint invariant)") {
    val bad = pages.select(col("html"), col("text")).as[(Array[Byte], String)]
      .filter { case (h, t) => HtmlText.extract(h) != t }.count()
    assert(bad == 0)
  }

  test("index built FROM the html column equals the text-built index byte-identically") {
    // closes the input_hint loop end-to-end: ingest raw html (≙ the
    // reference ingesting raw tags, storage.rs:198), extract text with the
    // spec-v1 extractor, and require the resulting index to be
    // indistinguishable — block bytes included — from one built on the
    // pre-extracted text column.
    val opts = IndexOptions(docsPerSegment = 256)
    val dirT = scratch("fromtext")
    IndexBuilder.build(spark, docs, dirT, opts)
    val htmlDocs = IndexBuilder
      .assignDocIds(spark, pages, "url", base = 0L, numPartitions = 8)
      .select(col("docId"), col("url").as("key"),
        HtmlText.extractUdf(col("html")).as("text"), col("warc_ts").as("ts"))
    val dirH = scratch("fromhtml")
    IndexBuilder.build(spark, htmlDocs, dirH, opts)
    def dump(dir: String) = new Searcher(spark, dir).segments
      .select("term", "wave", "segId", "df", "tf", "maxTf", "blocks")
      .as[SegmentPosting]
      .map(sp => (sp.term, sp.wave, sp.segId, sp.df, sp.tf, sp.maxTf,
        sp.blocks.map(b => (b.maxDocId, b.maxTf, b.minDl, b.n,
          java.util.Arrays.hashCode(b.docBytes),
          java.util.Arrays.hashCode(b.tfBytes),
          java.util.Arrays.hashCode(b.posBytes))).toSeq))
      .collect().toSet
    val fromText = dump(dirT)
    assert(dump(dirH) == fromText)
    assert(fromText.nonEmpty)
  }

  test("docID assignment: dense, unique, deterministic, no zipWithIndex") {
    val ids = docs.select("docId").as[Long].collect().sorted
    assert(ids.length == N)
    assert(ids.head == 0L && ids.last == N - 1)
    assert(ids.distinct.length == N.toInt)
    // deterministic: a second assignment maps each url to the same docId
    val again = IndexBuilder.assignDocIds(spark, pages, "url", 0L, 8)
      .select(col("url"), col("docId").as("docId2"))
    val mismatch = docs.select(col("key").as("url"), col("docId"))
      .join(again, "url")
      .where(col("docId") =!= col("docId2")).count()
    assert(mismatch == 0)
  }

  test("round-trip: inverting the index reproduces the tokenized corpus") {
    val dir = scratch("roundtrip")
    val m = IndexBuilder.build(spark, docs, dir,
      IndexOptions(docsPerSegment = 256))
    assert(m.totalDocs == N)
    val s = new Searcher(spark, dir)
    val inverted = s.segments
      .select("term", "wave", "segId", "df", "tf", "maxTf", "blocks")
      .as[SegmentPosting]
      .flatMap { sp =>
        val d = graft.codec.PostingCodec.decodeRun(sp.blocks.toSeq)
        d.docIds.iterator.zip(d.tfs.iterator).map { case (doc, tf) =>
          (doc, sp.term, tf)
        }
      }.toDF("docId", "term", "tf")
    val expected = docs.select(col("docId"),
        explode(Tokenize.col(col("text"))).as("term"))
      .groupBy("docId", "term").agg(count(lit(1)).cast("int").as("tf"))
    assert(inverted.count() == expected.count())
    assert(inverted.except(expected).count() == 0)
    assert(expected.except(inverted).count() == 0)
    // corpus stats
    val tok = docs.select(size(Tokenize.col(col("text"))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(m.totalTokens == tok)
  }

  test("postings are strictly ascending and block-max consistent in every run") {
    val dir = scratch("ascending")
    IndexBuilder.build(spark, docs, dir, IndexOptions(docsPerSegment = 256))
    val s = new Searcher(spark, dir)
    val bad = s.segments
      .select("term", "wave", "segId", "df", "tf", "maxTf", "blocks")
      .as[SegmentPosting]
      .filter { sp =>
        val d = graft.codec.PostingCodec.decodeRun(sp.blocks.toSeq)
        val asc = d.docIds.sliding(2).forall(w => w.length < 2 || w(0) < w(1))
        val bm = sp.blocks.forall(b =>
          graft.codec.PostingCodec.decodeDocsTfs(b)._1.last == b.maxDocId)
        !(asc && bm && d.docIds.length == sp.df)
      }.count()
    assert(bad == 0)
  }

  test("head-term postings spread across segments: no single-task stopword list") {
    val dir = scratch("skew")
    IndexBuilder.build(spark, docs, dir, IndexOptions(docsPerSegment = 256))
    val s = new Searcher(spark, dir)
    // term0000 hits ~every doc under zipf — the stopword-skew path
    val runs = s.postings(Seq("term0000")).collect()
    assert(runs.length >= (N / 256).toInt,
      s"head term must split into per-segment runs, got ${runs.length}")
    assert(runs.forall(_.df <= 256), "no run may exceed docsPerSegment")
    val total = runs.map(_.df).sum
    val naive = docs.select(col("docId"))
      .where(array_contains(Tokenize.col(col("text")), "term0000")).count()
    assert(total == naive)
  }

  test("resume: stale uncommitted wave data is cleaned and recommitted identically") {
    val dirA = scratch("resumeA")
    val dirB = scratch("resumeB")
    // docId halves interleave in warc_ts; drop ts so the (orthogonal)
    // time-disjointness append guard doesn't fire — resume is about docIds
    val half1 = docs.where(col("docId") < N / 2).drop("ts")
    val half2 = docs.where(col("docId") >= N / 2).drop("ts")
    val opts = IndexOptions(docsPerSegment = 256)
    // clean two-wave build
    IndexBuilder.build(spark, half1, dirA, opts)
    IndexBuilder.append(spark, half2, dirA)
    // crashed build: wave-1 data written but never committed to the manifest
    IndexBuilder.build(spark, half1, dirB, opts)
    IndexBuilder.buildWave(spark, half2, dirB, 1, opts, None, None) // no commit
    assert(ManifestIO.read(dirB).waves.map(_.wave) == List(0)) // crash point
    IndexBuilder.append(spark, half2, dirB) // resume
    // identical logical content
    def dump(dir: String) = new Searcher(spark, dir).segments
      .select("term", "wave", "segId", "df", "tf", "maxTf", "blocks")
      .as[SegmentPosting]
      .flatMap { sp =>
        val d = graft.codec.PostingCodec.decodeRun(sp.blocks.toSeq)
        d.docIds.map(doc => (sp.term, doc))
      }.collect().toSet
    assert(dump(dirA) == dump(dirB))
  }

  test("time-range pruning selects only overlapping waves (fixed overlap test)") {
    val dir = scratch("timerange")
    val half1 = docs.where(col("docId") < N / 2)
    val half2 = docs.where(col("docId") >= N / 2)
    // warc_ts increases with generator index i, not docId; split by ts instead
    val tsMid = pages.agg(avg(unix_millis(col("warc_ts")))).head().getDouble(0).toLong
    val early = docs.where(unix_millis(col("ts")) <= tsMid)
    val late = docs.where(unix_millis(col("ts")) > tsMid)
    // rebase late docIds above early ones to satisfy append discipline
    val earlyN = early.count()
    val earlyIds = IndexBuilder.assignDocIds(spark, early.drop("docId"), "key", 0L, 4)
    val lateIds = IndexBuilder.assignDocIds(spark, late.drop("docId"), "key", earlyN, 4)
    IndexBuilder.build(spark, earlyIds, dir, IndexOptions(docsPerSegment = 256))
    IndexBuilder.append(spark, lateIds, dir)
    val s = new Searcher(spark, dir)
    assert(s.visibleWaves.sorted == Seq(0, 1))
    val m = s.manifest
    val w0 = m.waves.find(_.wave == 0).get
    val pruned = s.inTimeRange(w0.minTs, w0.maxTs)
    assert(pruned.visibleWaves == Seq(0))
    // a pruned query returns a subset of the unpruned one
    val all = s.lookup("term0000").count()
    val some = pruned.lookup("term0000").count()
    assert(some > 0 && some < all)
    // disjoint range -> nothing
    assert(s.inTimeRange(0L, w0.minTs - 1).visibleWaves.isEmpty)
  }

  test("time-range pruning also drops non-overlapping SEGMENTS inside a wave") {
    // ingest order == event time (the web-crawl case): docIds ascend with
    // ts, so each 128-doc segment is a contiguous time slice and a narrow
    // range must prune the postings scan to the few overlapping segIds
    val dir = scratch("timeseg")
    val epoch = 1704067200000L
    val rows = (0L until 1024L).map { i =>
      (i, f"k$i%06d", "common w" + (i % 9),
        new java.sql.Timestamp(epoch + i * 1000L))
    }.toDF("docId", "key", "text", "ts")
    IndexBuilder.build(spark, rows, dir, IndexOptions(docsPerSegment = 128))
    val s = new Searcher(spark, dir)
    val full = s.postings(Seq("common")).count()
    assert(full == 8, "8 segments, each holding the head term once")
    // range covering only the first two segments' timestamps
    val pruned = s.inTimeRange(epoch, epoch + 200 * 1000L)
    assert(pruned.visibleWaves == Seq(0), "the single wave overlaps and survives")
    assert(pruned.postings(Seq("common")).count() == 2,
      "only the two overlapping segments' posting rows may be scanned")
    // pruned results stay a correct superset of the exact range
    val ids = pruned.lookup("common").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ < 256))
  }

  test("append does O(wave) stats work: committed wave stats files untouched") {
    val dir = scratch("incstats")
    val big = (0L until 1000L).map(i => (i, s"k$i", s"t${i % 80} common x${i % 7}"))
      .toDF("docId", "key", "text")
    val tiny = (1000L until 1010L).map(i => (i, s"k$i", s"t${i % 80} fresh"))
      .toDF("docId", "key", "text")
    IndexBuilder.build(spark, big, dir, IndexOptions(docsPerSegment = 128))
    def statFiles(wave: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"${IndexBuilder.termstatsPath(dir)}/wave=$wave")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    }
    val before = statFiles(0)
    assert(before.nonEmpty)
    IndexBuilder.append(spark, tiny, dir)
    // incremental: wave-0 stats bytes are never rewritten by an append
    assert(statFiles(0) == before)
    // and the aggregated per-term view equals a full recompute from segments
    val s2 = new Searcher(spark, dir)
    val terms = Seq("common", "fresh", "t3")
    val fromSegs = IndexBuilder.readSegments(spark, dir, s2.visibleWaves)
      .where(col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("tf")).as("tf"),
        max(col("maxTf")).as("maxTf"))
      .as[TermStats].collect().map(t => t.term -> t).toMap
    assert(s2.termStats(terms) == fromSegs)
    assert(s2.termStats(Seq("fresh"))("fresh").df == 10L)
  }

  test("non-contiguous wave merge is rejected (docId-range interleave guard)") {
    val dir = scratch("contig")
    def slice(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"k$i", s"w${i % 20} body")).toDF("docId", "key", "text")
    IndexBuilder.build(spark, slice(0, 100), dir, IndexOptions(docsPerSegment = 64))
    IndexBuilder.append(spark, slice(100, 200), dir)
    IndexBuilder.append(spark, slice(200, 300), dir)
    // merging oldest+newest around the surviving middle wave would break
    // the 'higher wave id => higher docId range' concat invariant
    val ex = intercept[IllegalArgumentException] {
      Compactor.mergeWaves(spark, dir, Seq(0, 2))
    }
    assert(ex.getMessage.contains("interleaves"))
    // contiguous merges still work and round-trip
    val m = Compactor.mergeWaves(spark, dir, Seq(1, 2))
    assert(m.waves.map(_.wave).sorted == Seq(0, 3))
    assert(new Searcher(spark, dir).lookup("w3").count() > 0)
  }

  test("compaction merges docmeta virtually: zero forward-map I/O, identical reads") {
    val dir = scratch("dmw")
    def slice(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"k$i", s"w${i % 20} body")).toDF("docId", "key", "text")
    IndexBuilder.build(spark, slice(0, 100), dir, IndexOptions(docsPerSegment = 64))
    IndexBuilder.append(spark, slice(100, 200), dir)
    val before = new Searcher(spark, dir).docMeta
      .select("docId", "key", "dl", "ts").as[(Long, String, Int, Long)]
      .collect().sortBy(_._1).toSeq
    val dmp = IndexBuilder.docmetaPath(dir)
    def hasWaveDir(w: Int) = new java.io.File(
      dmp.stripPrefix("file:") + s"/wave=$w").exists()

    val m = Compactor.mergeWaves(spark, dir, Seq(0, 1))
    val wi = m.waves.find(_.wave == 2).get
    assert(wi.docmetaWaves == List(0, 1),
      "merged wave must reference the source docmeta dirs, not rewrite them")
    assert(hasWaveDir(0) && hasWaveDir(1), "referenced docmeta dirs must survive")
    assert(!hasWaveDir(2), "virtual merge must write NO new docmeta dir")
    // reads over the merged index are byte-identical, incl. resolve()
    val s2 = new Searcher(spark, dir)
    val after = s2.docMeta.select("docId", "key", "dl", "ts")
      .as[(Long, String, Int, Long)].collect().sortBy(_._1).toSeq
    assert(after == before)
    val resolved = s2.resolve(s2.lookup("w7")).select("docId", "key")
      .as[(Long, String)].collect().toMap
    assert(resolved.nonEmpty && resolved.forall { case (id, k) => k == s"k$id" })
    // the docmetaWaves round-trip through the manifest json
    assert(ManifestIO.read(dir).waves.find(_.wave == 2).get.docmetaWaves ==
      List(0, 1))

    // fragment ceiling: forcing maxDocmetaFragments=1 consolidates
    // physically — fresh wave=N dir, stale fragments reclaimed, reads equal
    IndexBuilder.append(spark, slice(200, 250), dir)
    val m2 = Compactor.mergeWaves(spark, dir, Seq(2, 3), maxDocmetaFragments = 1)
    val wi2 = m2.waves.find(_.wave == 4).get
    assert(wi2.docmetaWaves.isEmpty, "physical consolidation owns its wave dir")
    assert(hasWaveDir(4), "consolidated docmeta dir must exist")
    assert(!hasWaveDir(0) && !hasWaveDir(1) && !hasWaveDir(3),
      "dead fragments must be reclaimed after consolidation")
    val all = new Searcher(spark, dir).docMeta
      .select("docId", "key").as[(Long, String)].collect()
    assert(all.length == 250 && all.forall { case (id, k) => k == s"k$id" })
  }

  test("manifest stamp changes on every commit, even byte-identical ones") {
    val dir = scratch("stamp")
    val m = IndexManifest(IndexBuilder.Version, Tokenize.Version, 256, 128,
      withPositions = true, waves = Nil)
    ManifestIO.write(dir, m)
    val s1 = ManifestIO.stamp(dir)
    ManifestIO.write(dir, m) // same payload, same size, same millisecond
    val s2 = ManifestIO.stamp(dir)
    assert(s1 != s2,
      "stamp must include the inode fileKey so same-ms same-size rewrites are seen")
  }

  test("repacked blocks inherit per-source-block minDl (tight WAND bounds survive compaction)") {
    // three fragmented waves with distinct doc-length profiles (3/6/12
    // tokens); after the merge repack, a new block drawn entirely from the
    // long-doc wave must keep that wave's tight minDl, not the global min
    val dir = scratch("repack-mindl")
    def wave(lo: Long, words: Int) =
      (lo until lo + 3).map(i =>
        (i, s"k$i", ("tt" +: Seq.fill(words - 1)(s"x$i")).mkString(" ")))
        .toDF("docId", "key", "text")
    IndexBuilder.build(spark, wave(0, 3), dir,
      IndexOptions(docsPerSegment = 1024, blockSize = 8))
    IndexBuilder.append(spark, wave(3, 6), dir)
    IndexBuilder.append(spark, wave(6, 12), dir)
    val m = Compactor.mergeWaves(spark, dir, Seq(0, 1, 2))
    val newWave = m.waves.map(_.wave).max
    val blocks = IndexBuilder.readSegments(spark, dir, Seq(newWave))
      .select("term", "wave", "segId", "df", "tf", "maxTf", "blocks")
      .as[SegmentPosting]
      .collect().find(_.term == "tt").get.blocks
    assert(blocks.map(_.n).sum == 9)
    assert(blocks.length == 2, "9 postings at blockSize 8 must repack to 2 blocks")
    assert(blocks.head.minDl == 3,
      "first block spans all three source blocks -> min of their minDls")
    assert(blocks.last.minDl == 12,
      "last block draws only from the 12-token wave and must keep its tight bound")
  }
}
