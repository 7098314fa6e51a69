package graft.functions

import graft.text.Tokenize
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_match(text, term)` — true iff `term` is a token of `text` under
  * the engine tokenizer (spec v1).
  *
  * Semantically this is a full-text containment predicate; the expression
  * itself evaluates by tokenizing the row (the slow fallback path, correct
  * on any table). When the scanned table has a registered inverted index,
  * [[graft.index.IndexAccessRule]] rewrites the enclosing Filter into a
  * semi-join against the index's posting list — access-path selection, the
  * pattern SURVEY.md §4 flags as the one Catalyst rule worth owning.
  */
case class GraftMatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(text: Any, term: Any): Any = {
    val toks = Tokenize.tokenizeScala(text.asInstanceOf[UTF8String].toString)
    val t = term.asInstanceOf[UTF8String].toString
    toks.contains(t)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GraftMatch = copy(left = newLeft, right = newRight)
}

object GraftMatch {
  def graft_match(text: Column, term: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(GraftMatch(ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(term)))
  }
}
