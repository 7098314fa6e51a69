package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * functions for SQL use. Activate with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * SQL surface:
  *   - `cosine_sim(array<float>, array<float>) -> double` (codegen'd)
  *   - `topk_by(score, id, k) -> array<struct<score,id>>` (bounded-heap
  *     top-k aggregate; k an INT literal)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim expects 2 arguments")
        CosineSim(children.head, children(1))
      }))
    e.injectFunction(TopKBy.registration)
    e.injectFunction((
      new FunctionIdentifier("graft_match"),
      new ExpressionInfo(classOf[GraftMatch].getName, "graft_match"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_match expects 2 arguments")
        GraftMatch(children.head, children(1))
      }))
    // access-path selection: graft_match filters over registered corpus
    // tables become index semi-joins (see IndexAccessRule)
    e.injectOptimizerRule(s => new graft.index.IndexAccessRule(s))
  }
}
