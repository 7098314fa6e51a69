package graft

import graft.index._
import org.apache.spark.sql.functions._

/** Ports of the reference's exact semantic fixtures (FIXTURES.md §1.2,
  * /root/reference/src/storage/tests/block.rs) with tags -> terms. The
  * expected posting arrays are golden values for the segment builder and
  * the wave merger (docID rebase).
  */
class FixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String, String)]) =
    rows.toDF("docId", "key", "text")

  private def dumpPostings(dir: String): Map[String, Seq[Long]] = {
    val s = new Searcher(spark, dir)
    s.segments.select("term", "wave", "segId", "df", "tf", "maxTf", "blocks")
      .as[SegmentPosting].collect()
      .groupBy(_.term)
      .map { case (t, rs) => t -> Searcher.mergeRunDocs(rs.toSeq).toSeq }
  }

  test("active fixture: 6 pushes -> exact sorted dictionary + postings (block.rs:135-171)") {
    // push i=0..5 with tag lists; doc 4 has empty tags (empty text for us)
    // expected (block.rs:153-158): tag0->[0,2,3,5] tag1->[0,1,5] tag2->[3]
    // tag3->[1] tag4->[3]; size 10
    val rows = Seq(
      (0L, "key0", "tag0 tag1"),
      (1L, "key1", "tag1 tag3"),
      (2L, "key2", "tag0"),
      (3L, "key3", "tag0 tag2 tag4"),
      (4L, "key4", ""),
      (5L, "key5", "tag0 tag1"))
    val dir = scratch("active")
    val m = IndexBuilder.build(spark, docsDF(rows), dir,
      IndexOptions(docsPerSegment = 100, withPositions = true))
    val got = dumpPostings(dir)
    assert(got.keys.toSeq.sorted == Seq("tag0", "tag1", "tag2", "tag3", "tag4"))
    assert(got("tag0") == Seq(0L, 2L, 3L, 5L))
    assert(got("tag1") == Seq(0L, 1L, 5L))
    assert(got("tag2") == Seq(3L))
    assert(got("tag3") == Seq(1L))
    assert(got("tag4") == Seq(3L))
    assert(m.totalTokens == 10) // ≙ ActiveBlock size counter (block.rs:373)
    assert(m.totalDocs == 6)
  }

  test("merge fixture: 3+4 docs, docID rebase by left key count (block.rs:173-210)") {
    // left block: 3 docs (ids 0..2); right block: 4 docs (ids 0..3 rebased to 3..6)
    // expected merged postings (block.rs:191-203):
    // tag0->[0,2,3,5] tag1->[0,1,5] tag2->[3,4] tag3->[1] tag4->[3] tag5->[6]
    val left = Seq(
      (0L, "k0", "tag0 tag1"),
      (1L, "k1", "tag1 tag3"),
      (2L, "k2", "tag0"))
    val right = Seq( // reference right-block docIds 0..3 -> ours must be pre-rebased
      (3L, "k3", "tag0 tag2 tag4"),
      (4L, "k4", "tag2"),
      (5L, "k5", "tag0 tag1"),
      (6L, "k6", "tag5"))
    val dir = scratch("merge")
    IndexBuilder.build(spark, docsDF(left), dir, IndexOptions(docsPerSegment = 100))
    IndexBuilder.append(spark, docsDF(right), dir)
    // two waves committed; merge them (≙ BlockData::merge)
    val m = Compactor.fullCompact(spark, dir)
    assert(m.waves.length == 1)
    val got = dumpPostings(dir)
    assert(got.keys.toSeq.sorted == Seq("tag0", "tag1", "tag2", "tag3", "tag4", "tag5"))
    assert(got("tag0") == Seq(0L, 2L, 3L, 5L))
    assert(got("tag1") == Seq(0L, 1L, 5L))
    assert(got("tag2") == Seq(3L, 4L))
    assert(got("tag3") == Seq(1L))
    assert(got("tag4") == Seq(3L))
    assert(got("tag5") == Seq(6L))
  }

  test("merge_order: appending out-of-docId-order is rejected (block.rs:212-231)") {
    // The reference auto-swaps newer-first merges into older-first; our waves
    // are committed in docId order, so an append whose docIds fall below the
    // committed base violates the rebase discipline and must fail loudly.
    val dir = scratch("mergeorder")
    IndexBuilder.build(spark,
      docsDF(Seq((10L, "k10", "tag0"), (11L, "k11", "tag1"))), dir)
    intercept[IllegalArgumentException] {
      IndexBuilder.append(spark, docsDF(Seq((0L, "k0", "tag0"))), dir)
    }
  }

  test("simple_data 15-doc corpus with tiny thresholds round-trips after every wave (storage.rs:108-137)") {
    // FIXTURES.md §1.1 corpus; max_active_size=3 ≙ waves of 3 docs.
    val corpus = Seq(
      "tag0 tag1", "tag1 tag2", "tag0 tag3", "tag0", "tag4",
      "tag5 tag2", "tag5 tag1 tag0 tag3", "tag6 tag0 tag3", "tag0", "tag7",
      "tag1 tag2", "tag8", "tag3 tag2", "tag5", "tag6 tag4")
      .zipWithIndex.map { case (t, i) => (i.toLong, f"key$i%02d", t) }
    val dir = scratch("simple")
    val opts = IndexOptions(docsPerSegment = 10)
    corpus.grouped(3).zipWithIndex.foreach { case (batch, w) =>
      if (w == 0) IndexBuilder.build(spark, docsDF(batch), dir, opts)
      else IndexBuilder.append(spark, docsDF(batch), dir)
      // round-trip oracle ≙ from_block/check_storage (tests/storage.rs:61-106):
      // invert the whole index and compare to the ingested prefix
      val inverted = dumpPostings(dir).toSeq
        .flatMap { case (t, ds) => ds.map(d => (d, t)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val expected = corpus.take((w + 1) * 3)
        .map { case (id, _, t) => id -> t.split(" ").filter(_.nonEmpty).sorted.toSeq }
        .filter(_._2.nonEmpty).toMap
      assert(inverted == expected, s"after wave $w")
      // tiered compaction keeps the invariant too
      Compactor.compact(spark, dir)
      val inverted2 = dumpPostings(dir).toSeq
        .flatMap { case (t, ds) => ds.map(d => (d, t)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(inverted2 == expected, s"after compaction, wave $w")
    }
  }
}
