package graft.index

import graft.functions.GraftMatch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

/** Registry: corpus table location -> (index dir, docId column). A table is
  * "indexed" when its scan location falls under a registered path.
  */
object IndexRegistry {
  final case class Entry(indexDir: String, idCol: String)
  private val entries = scala.collection.concurrent.TrieMap.empty[String, Entry]

  def register(tablePath: String, indexDir: String, idCol: String): Unit =
    entries.put(normalize(tablePath), Entry(indexDir, idCol))
  def clear(): Unit = entries.clear()
  def lookup(paths: Seq[String]): Option[Entry] =
    paths.map(normalize).flatMap(p => entries.collectFirst {
      case (reg, e) if p.startsWith(reg) => e
    }).headOption

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")
}

/** Access-path selection: rewrites `Filter(graft_match(text, 'term'), scan)`
  * over a registered corpus table into a LEFT SEMI join against the
  * inverted index's posting list for that term.
  *
  * The predicate stays correct without an index (GraftMatch tokenizes the
  * row); with one, the full-table tokenize-and-test collapses to a pushdown
  * posting fetch — the reference's whole reason to exist (tag -> posting
  * lookup instead of scanning every document), expressed as a Catalyst
  * optimizer rule injected via [[graft.functions.GraftExtensions]].
  * Multiple graft_match conjuncts become stacked semi-joins (AND =
  * intersection semantics, ≙ tag-intersection).
  */
class IndexAccessRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def scanPaths(plan: LogicalPlan): Seq[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
    case p if p.children.size == 1 => scanPaths(p.children.head)
    case _ => Nil
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val matches = conjuncts.collect {
        case GraftMatch(_, Literal(t: UTF8String, _)) => t.toString
      }
      if (matches.isEmpty) f
      else IndexRegistry.lookup(scanPaths(child)) match {
        case None => f
        case Some(entry) =>
          child.output.find(_.name == entry.idCol) match {
            case None => f
            case Some(idAttr) =>
              // residual predicates (non-graft_match conjuncts) stay in a
              // Filter; each matched term becomes one semi-join with the
              // index lookup (docIds of that term's posting list)
              val searcher = new Searcher(spark, entry.indexDir)
              val joined = matches.foldLeft(child) { (acc, term) =>
                val lookupPlan = searcher.lookup(term)
                  .queryExecution.analyzed
                val docIdAttr = lookupPlan.output.head
                Join(acc, lookupPlan, LeftSemi,
                  Some(EqualTo(idAttr, docIdAttr)), JoinHint.NONE)
              }
              val residual = conjuncts.filterNot {
                case GraftMatch(_, Literal(_, _)) => true
                case _ => false
              }
              if (residual.isEmpty) joined
              else Filter(residual.reduce(And), joined)
          }
      }
  }
}
