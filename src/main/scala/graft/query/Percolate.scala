package graft.query

import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standing-query matching — the "percolator" of fulltext engines,
  * retrieval inverted: a FIXED set of boolean queries is matched against a
  * flow of documents ("which saved searches does this new page hit?").
  *
  * Spark-first shape: the parsed ASTs ride inside ONE deterministic UDF
  * that tokenizes each doc once and evaluates every query against the
  * doc's token array + hash set — per-doc work only, ZERO shuffles, no
  * index, embarrassingly parallel over any corpus, and stateless, so the
  * same plan runs unchanged over a Structured Streaming micro-batch
  * (select + explode are stream-safe without watermarks). At real scale
  * the query set is the small side by construction (saved searches, alert
  * rules), which is exactly the broadcast-closure pattern; a million-query
  * percolator would shard the query set and union — still shuffle-free.
  *
  * Evaluation semantics mirror the index path ([[graft.index.Searcher]]
  * `query`): TermLeaf = token-set membership, PrefixLeaf = any token
  * startsWith, PhraseLeaf = adjacent token run; pure-negation queries are
  * rejected at registration exactly as the index path rejects them
  * (unbounded complement).
  */
object Percolate {

  private def eval(n: QueryParser.Node, toks: Array[String],
      set: java.util.HashSet[String]): Boolean = n match {
    case QueryParser.TermLeaf(t) => set.contains(t)
    case QueryParser.PrefixLeaf(p) =>
      var i = 0
      var found = false
      while (!found && i < toks.length) {
        if (toks(i).startsWith(p)) found = true
        i += 1
      }
      found
    case QueryParser.PhraseLeaf(ts) =>
      val n0 = ts.length
      if (n0 == 0) false
      else {
        val first = ts.head
        var i = 0
        var ok = false
        while (!ok && i + n0 <= toks.length) {
          if (toks(i) == first) {
            var j = 1
            var all = true
            while (all && j < n0) {
              if (toks(i + j) != ts(j)) all = false
              j += 1
            }
            if (all) ok = true
          }
          i += 1
        }
        ok
      }
    case QueryParser.AndNode(l, r) => eval(l, toks, set) && eval(r, toks, set)
    case QueryParser.OrNode(l, r) => eval(l, toks, set) || eval(r, toks, set)
    case QueryParser.NotNode(c) => !eval(c, toks, set)
  }

  /** (idCol, query_id) for every (doc, query) match. Query ids are the
    * caller's map keys; parse/validation failures throw at call time, not
    * inside executors.
    */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
      queries: Map[Int, String]): DataFrame = {
    require(queries.nonEmpty, "no standing queries")
    val parsed: Seq[(Int, QueryParser.Node)] = queries.toSeq.sortBy(_._1)
      .map { case (id, q) =>
        val ast = QueryParser.parse(q)
        if (QueryParser.matchesEmptyDoc(ast))
          throw QueryParser.ParseException(
            s"standing query $id '$q' matches documents containing none of " +
              "its terms (unbounded complement) — add a required positive clause")
        id -> ast
      }
    val qs = parsed // serializable capture (not the enclosing object)
    val u = udf { (s: String) =>
      if (s == null) Array.empty[Int]
      else {
        val ts = Tokenize.tokenizeScala(s)
        val set = new java.util.HashSet[String](ts.length * 2)
        var i = 0
        while (i < ts.length) { set.add(ts(i)): Unit; i += 1 }
        qs.iterator.filter { case (_, ast) => eval(ast, ts, set) }
          .map(_._1).toArray
      }
    }
    docs.select(col(idCol), explode(u(col(textCol))).as("query_id"))
  }
}
