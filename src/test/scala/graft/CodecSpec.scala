package graft

import graft.codec.{PostingCodec, VarByte}
import graft.util.Hashing
import org.scalatest.funsuite.AnyFunSuite

/** Codec round-trip properties — ≙ the reference's serialize->reread
  * equality tests (/root/reference/src/storage/tests/block.rs:16-41,78-133),
  * over our delta+varbyte blocks instead of msgpack sections. Property
  * inputs are generated from a fixed seed (FIXTURES.md: no unseeded RNG).
  */
class CodecSpec extends AnyFunSuite {

  private def seededDocs(seed: Long, n: Int, maxGap: Long): Array[Long] = {
    val out = new Array[Long](n)
    var cur = (Hashing.mix(seed, 0) & 0xffffL)
    var i = 0
    while (i < n) {
      out(i) = cur
      cur += 1 + ((Hashing.mix(seed, i + 1) % maxGap + maxGap) % maxGap)
      i += 1
    }
    out
  }

  test("varbyte round-trips seeded non-negative longs incl. extremes") {
    val vs = (0 until 2000).map(i => Hashing.mix(7L, i).abs match {
      case v if v < 0 => 0L // Long.MinValue.abs
      case v => v
    }).toArray ++ Array(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue)
    assert(VarByte.decodeAll(VarByte.encode(vs)).sameElements(vs))
  }

  test("posting blocks round-trip docIds and tfs across sizes (property)") {
    for (n <- Seq(1, 2, 7, 127, 128, 129, 1000); seed <- 1L to 5L) {
      val docs = seededDocs(seed, n, 1000)
      val tfs = docs.map(d => (d % 17 + 1).toInt)
      val blocks = PostingCodec.encode(docs, tfs, null, blockSize = 7)
      val dec = PostingCodec.decodeRun(blocks.toSeq)
      assert(dec.docIds.sameElements(docs), s"n=$n seed=$seed")
      assert(dec.tfs.sameElements(tfs), s"n=$n seed=$seed")
    }
  }

  test("positions round-trip") {
    val docs = Array(3L, 10L, 11L, 500L)
    val tfs = Array(2, 1, 3, 1)
    val pos = Array(Array(0, 7), Array(4), Array(1, 2, 9), Array(0))
    val blocks = PostingCodec.encode(docs, tfs, pos, blockSize = 3)
    val dec = PostingCodec.decodeRun(blocks.toSeq)
    assert(dec.docIds.sameElements(docs))
    (0 until 4).foreach(i => assert(dec.positions(i).sameElements(pos(i))))
  }

  test("mixed position presence within a block decodes without misalignment") {
    // postings with and without positions in the SAME block: the codec must
    // write an explicit 0 count for position-less entries, or the position
    // stream misaligns and decodes garbage
    val docs = Array(1L, 2L, 3L, 4L)
    val tfs = Array(1, 2, 1, 2)
    val pos = Array(Array(5), null, Array.empty[Int], Array(2, 8))
    val blocks = PostingCodec.encode(docs, tfs, pos, blockSize = 16)
    val dec = PostingCodec.decodeRun(blocks.toSeq)
    assert(dec.docIds.sameElements(docs))
    assert(dec.tfs.sameElements(tfs))
    assert(dec.positions(0).sameElements(Array(5)))
    assert(dec.positions(1).isEmpty)
    assert(dec.positions(2).isEmpty)
    assert(dec.positions(3).sameElements(Array(2, 8)))
  }

  test("block-max metadata is exact per block") {
    val docs = (0L until 300L).toArray
    val tfs = docs.map(d => (d % 31 + 1).toInt)
    val blocks = PostingCodec.encode(docs, tfs, null, blockSize = 128)
    assert(blocks.length == 3)
    blocks.zipWithIndex.foreach { case (b, i) =>
      val lo = i * 128
      val hi = math.min(lo + 128, 300)
      assert(b.maxDocId == docs(hi - 1))
      assert(b.maxTf == tfs.slice(lo, hi).max)
      assert(b.n == hi - lo)
    }
  }

  test("empty posting run encodes to zero blocks") {
    assert(PostingCodec.encode(Array.empty[Long], Array.empty[Int], null).isEmpty)
  }

  test("blocks decode independently (absolute first docId per block)") {
    val docs = Array(100L, 200L, 300L, 400L)
    val tfs = Array(1, 1, 1, 1)
    val blocks = PostingCodec.encode(docs, tfs, null, blockSize = 2)
    val (d2, _) = PostingCodec.decodeDocsTfs(blocks(1))
    assert(d2.sameElements(Array(300L, 400L)))
  }

  test("non-ascending docIds rejected") {
    intercept[IllegalArgumentException] {
      PostingCodec.encode(Array(5L, 5L), Array(1, 1), null)
    }
  }

  test("compression: dense postings bit-pack to well under 1 byte per docId") {
    val docs = (0L until 10000L).toArray
    val tfs = Array.fill(10000)(1)
    val blocks = PostingCodec.encode(docs, tfs, null)
    val docBytes = blocks.map(_.docBytes.length).sum
    assert(docBytes < 10000 / 2, s"got $docBytes docId bytes for 10k dense postings")
  }

  test("FOR and varbyte paths round-trip identically across gap regimes") {
    for ((maxGap, seed, n) <- Seq((1L, 1L, 500), (3L, 2L, 500), (200L, 3L, 500),
        (1L << 30, 4L, 500), (1L << 55, 5L, 50))) {
      val docs = seededDocs(seed, n, maxGap)
      val tfs = docs.map(d => (d % 9 + 1).toInt)
      val dec = PostingCodec.decodeRun(PostingCodec.encode(docs, tfs, null).toSeq)
      assert(dec.docIds.sameElements(docs), s"maxGap=$maxGap")
      assert(dec.tfs.sameElements(tfs), s"maxGap=$maxGap")
    }
  }
}
