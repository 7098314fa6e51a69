package graft

import graft.functions.GraftMatch.graft_match
import graft.index._
import org.apache.spark.sql.functions._

/** IndexAccessRule: graft_match predicates evaluate naively on unregistered
  * tables and become index semi-joins on registered ones, with identical
  * results.
  */
class RuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val setup: (String, String) = {
    // corpus written to parquet so the scan is a HadoopFsRelation
    val docs = (0L until 400L)
      .map(i => (i, s"w${i % 37} w${(i * 3) % 37} filler$i"))
      .toDF("doc_id", "text")
    val tableDir = scratch("rule-table")
    docs.write.mode("overwrite").parquet(tableDir)
    val idxDir = scratch("rule-idx")
    IndexBuilder.build(spark,
      docs.selectExpr("doc_id AS docId", "CAST(doc_id AS STRING) AS key", "text"),
      idxDir, IndexOptions(docsPerSegment = 128))
    // activate the optimizer rule on the shared session
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[IndexAccessRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new IndexAccessRule(spark)
    (tableDir, idxDir)
  }

  test("graft_match evaluates correctly without a registered index") {
    val (tableDir, _) = setup
    IndexRegistry.clear()
    val t = spark.read.parquet(tableDir)
    val got = t.where(graft_match(col("text"), "w5"))
      .select("doc_id").as[Long].collect().toSet
    val naive = t.where(array_contains(graft.text.Tokenize.col(col("text")), "w5"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive && got.nonEmpty)
    val plan = t.where(graft_match(col("text"), "w5"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("registered index rewrites graft_match into a semi-join, same results") {
    val (tableDir, idxDir) = setup
    IndexRegistry.clear()
    IndexRegistry.register(tableDir, idxDir, "doc_id")
    val t = spark.read.parquet(tableDir)
    val q = t.where(graft_match(col("text"), "w5"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    val got = q.select("doc_id").as[Long].collect().toSet
    val naive = t.where(array_contains(graft.text.Tokenize.col(col("text")), "w5"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive && got.nonEmpty)
    IndexRegistry.clear()
  }

  test("graft_match on a NON-indexed column is not rewritten (stays correct)") {
    val docs = (0L until 100L)
      .map(i => (i, s"title$i w${i % 5}", s"w${i % 37} body"))
      .toDF("doc_id", "title", "text")
    val tableDir = scratch("rule-title-table")
    docs.write.mode("overwrite").parquet(tableDir)
    val idxDir = scratch("rule-title-idx")
    IndexBuilder.build(spark,
      docs.selectExpr("doc_id AS docId", "CAST(doc_id AS STRING) AS key", "text"),
      idxDir, IndexOptions(docsPerSegment = 128))
    IndexRegistry.clear()
    IndexRegistry.register(tableDir, idxDir, "doc_id", textCol = "text")
    val t = spark.read.parquet(tableDir)
    // index is over `text`; a match on `title` must evaluate natively
    val q = t.where(graft_match(col("title"), "w3"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    val naive = t.where(array_contains(graft.text.Tokenize.col(col("title")), "w3"))
      .select("doc_id").as[Long].collect().toSet
    assert(q.select("doc_id").as[Long].collect().toSet == naive && naive.nonEmpty)
    // sibling path sharing a name prefix must not be treated as indexed
    assert(IndexRegistry.lookup(Seq(tableDir + "_v2")).isEmpty)
    IndexRegistry.clear()
  }

  test("searcher is memoized: repeated queries pay no per-query manifest read") {
    val (tableDir, idxDir) = setup
    IndexRegistry.clear()
    IndexRegistry.register(tableDir, idxDir, "doc_id")
    val t = spark.read.parquet(tableDir)
    // first query constructs + caches the Searcher (one manifest read)
    t.where(graft_match(col("text"), "w5")).count()
    val before = ManifestIO.readCount(idxDir)
    (1 to 5).foreach(i => t.where(graft_match(col("text"), s"w$i")).count())
    assert(ManifestIO.readCount(idxDir) == before,
      "repeated graft_match queries must reuse the memoized Searcher")
    // registry change invalidates: the next query re-reads the manifest
    IndexRegistry.register(tableDir, idxDir, "doc_id")
    t.where(graft_match(col("text"), "w6")).count()
    assert(ManifestIO.readCount(idxDir) == before + 1)
    IndexRegistry.clear()
  }

  test("conjunction of graft_match terms plus residual predicate (AND = intersection)") {
    val (tableDir, idxDir) = setup
    IndexRegistry.clear()
    IndexRegistry.register(tableDir, idxDir, "doc_id")
    val t = spark.read.parquet(tableDir)
    val q = t.where(graft_match(col("text"), "w5") &&
      graft_match(col("text"), "w15") && col("doc_id") < 300)
    val plan = q.queryExecution.optimizedPlan.toString
    assert("LeftSemi".r.findAllIn(plan).size == 2, plan)
    val toks = graft.text.Tokenize.col(col("text"))
    val naive = t.where(array_contains(toks, "w5") &&
        array_contains(toks, "w15") && col("doc_id") < 300)
      .select("doc_id").as[Long].collect().toSet
    assert(q.select("doc_id").as[Long].collect().toSet == naive)
    assert(naive.nonEmpty)
    IndexRegistry.clear()
  }

  test("append to a registered index is picked up without invalidate (stamp revalidation)") {
    // fresh table + index so other tests' cached searchers don't interfere
    val docs = (0L until 200L)
      .map(i => (i, s"v${i % 11} stamped$i"))
      .toDF("doc_id", "text")
    val tableDir = scratch("rule-stamp-table")
    docs.write.mode("overwrite").parquet(tableDir)
    val idxDir = scratch("rule-stamp-idx")
    IndexBuilder.build(spark,
      docs.selectExpr("doc_id AS docId", "CAST(doc_id AS STRING) AS key", "text"),
      idxDir, IndexOptions(docsPerSegment = 128))
    IndexRegistry.clear()
    IndexRegistry.register(tableDir, idxDir, "doc_id")
    val t0 = spark.read.parquet(tableDir)
    assert(t0.where(graft_match(col("text"), "freshterm")).count() == 0)
    // append docs carrying a brand-new term to BOTH the corpus table and
    // the index; the memoized Searcher must notice the manifest changed
    // (mtime+size stamp) and serve the new wave set with NO invalidate()
    val extra = (200L until 220L).map(i => (i, s"freshterm doc$i"))
      .toDF("doc_id", "text")
    extra.write.mode("append").parquet(tableDir)
    IndexBuilder.append(spark,
      extra.selectExpr("doc_id AS docId", "CAST(doc_id AS STRING) AS key", "text"),
      idxDir)
    val t = spark.read.parquet(tableDir)
    assert(t.where(graft_match(col("text"), "freshterm")).count() == 20,
      "appended wave must be visible to the next query automatically")
    IndexRegistry.clear()
  }
}
