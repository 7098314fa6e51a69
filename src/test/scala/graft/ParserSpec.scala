package graft

import graft.index.Searcher
import graft.query.QueryParser
import graft.query.QueryParser._
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the boolean query-language parser and the
  * position-gap primitive — no Spark session needed.
  */
class ParserSpec extends AnyFunSuite {

  test("precedence: NOT > AND > OR") {
    assert(parse("a OR b AND c") ==
      OrNode(TermLeaf("a"), AndNode(TermLeaf("b"), TermLeaf("c"))))
    assert(parse("NOT a AND b") ==
      AndNode(NotNode(TermLeaf("a")), TermLeaf("b")))
    assert(parse("a AND (b OR c)") ==
      AndNode(TermLeaf("a"), OrNode(TermLeaf("b"), TermLeaf("c"))))
  }

  test("juxtaposition is implicit AND; keywords are case-insensitive") {
    assert(parse("a b c") ==
      AndNode(AndNode(TermLeaf("a"), TermLeaf("b")), TermLeaf("c")))
    assert(parse("a and b or c") == parse("a AND b OR c"))
    assert(parse("a not b") == AndNode(TermLeaf("a"), NotNode(TermLeaf("b"))))
  }

  test("terms and phrases normalize through the index tokenizer") {
    assert(parse("SPARK") == TermLeaf("spark"))
    assert(parse("\"Spark-SQL joins\"") ==
      PhraseLeaf(Seq("spark", "sql", "joins")))
    // a one-token phrase degrades to a plain term leaf
    assert(parse("\"Spark\"") == TermLeaf("spark"))
    assert(parse("filt*") == PrefixLeaf("filt"))
  }

  test("parse errors: empty, unterminated quote, bad token, trailing") {
    assertThrows[ParseException](parse(""))
    assertThrows[ParseException](parse("\"abc"))
    assertThrows[ParseException](parse("a AND"))
    assertThrows[ParseException](parse("(a OR b"))
    assertThrows[ParseException](parse("a ) b"))
    // a bare word must be ONE index term
    assertThrows[ParseException](parse("spark-sql"))
    assertThrows[ParseException](parse("\"\""))
  }

  test("matchesEmptyDoc flags queries selecting the unbounded complement") {
    assert(matchesEmptyDoc(parse("NOT a")))
    assert(matchesEmptyDoc(parse("a OR NOT b")))
    assert(matchesEmptyDoc(parse("NOT (a AND b)")))
    assert(!matchesEmptyDoc(parse("a AND NOT b")))
    assert(!matchesEmptyDoc(parse("(a OR b) AND NOT (c OR d)")))
    assert(!matchesEmptyDoc(parse("a")))
  }

  test("leaves are distinct in first-appearance order") {
    val ls = leaves(parse("a AND (b OR a) AND NOT c"))
    assert(ls == Seq(TermLeaf("a"), TermLeaf("b"), TermLeaf("c")))
  }

  test("withinGap: ordered and unordered min-gap existence") {
    val pa = Array(2, 10, 50)
    val pb = Array(7, 13)
    // |10-13|=3, |10-7|=3
    assert(Searcher.withinGap(pa, pb, 3, ordered = false))
    assert(!Searcher.withinGap(pa, pb, 2, ordered = false))
    // ordered a-then-b: 10 -> 13 (gap 3)
    assert(Searcher.withinGap(pa, pb, 3, ordered = true))
    assert(!Searcher.withinGap(pa, pb, 2, ordered = true))
    // ordered b-then-a never within 3 (7 -> 10 is b-then-a = pa after pb)
    assert(Searcher.withinGap(pb, pa, 3, ordered = true)) // 7 -> 10
    assert(!Searcher.withinGap(Array(20), Array(5), 10, ordered = true))
    assert(Searcher.withinGap(Array(20), Array(5), 15, ordered = false))
    assert(!Searcher.withinGap(Array.empty[Int], pb, 5, ordered = false))
  }

  test("withinGap agrees with the quadratic oracle on random arrays") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val pa = Array.fill(rnd.nextInt(8) + 1)(rnd.nextInt(60)).distinct.sorted
      val pb = Array.fill(rnd.nextInt(8) + 1)(rnd.nextInt(60)).distinct.sorted
      val k = rnd.nextInt(5) + 1
      val slow = pa.exists(p => pb.exists(q => math.abs(q - p) <= k))
      val slowOrd = pa.exists(p => pb.exists(q => q - p >= 1 && q - p <= k))
      assert(Searcher.withinGap(pa, pb, k, ordered = false) == slow,
        s"unordered ${pa.mkString(",")} | ${pb.mkString(",")} k=$k")
      assert(Searcher.withinGap(pa, pb, k, ordered = true) == slowOrd,
        s"ordered ${pa.mkString(",")} | ${pb.mkString(",")} k=$k")
    }
  }
}
