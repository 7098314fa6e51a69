package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap over (score, id): a binary min-heap keyed by
  * "worseness" under the (score DESC, id ASC) ranking, so the root is the
  * WORST kept entry and a beat-the-root test admits a new row in O(log k).
  * This is the aggregation buffer of [[TopKBy]]; k bounds the state no
  * matter how many input rows flow through.
  */
final class TopKHeap(val k: Int) {
  var n: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** (s1,i1) strictly worse than (s2,i2) under (score desc, id asc). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def insert(s: Double, id: Long): Unit = {
    if (n < k) {
      var i = n
      scores(i) = s; ids(i) = id; n += 1
      while (i > 0 &&
          worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }
}

/** Native bounded top-k aggregate: keeps the k best (score, id) pairs per
  * group under (score DESC, id ASC) and returns them as a sorted
  * `array<struct<score double, id bigint>>`.
  *
  * The point, at scale: a per-group top-k via `row_number() OVER
  * (PARTITION BY g ORDER BY s)` shuffles EVERY candidate row and sorts
  * per group, while this aggregate is a TypedImperativeAggregate whose
  * partial state is a k-bounded heap — Spark runs it map-side first, so at
  * most k rows per (partition, group) ever enter the shuffle regardless of
  * candidate count. That is the difference between a batched ANN join
  * shuffling `candidates` rows and shuffling `groups x k` rows.
  *
  * Null scores/ids are skipped (they cannot rank). Determinism: the
  * (score, id) order is total, so the result is input-order independent.
  *
  * Input typing: the buffer stores primitive doubles/longs, so the inputs
  * are declared (DOUBLE, BIGINT) with implicit casts — a SQL caller
  * passing an INT score gets the analyzer's numeric widening, and a
  * non-castable input (e.g. a STRING id) fails at ANALYSIS time instead
  * of as an executor-side ClassCastException (round-6 ADVICE item 3).
  */
case class TopKBy(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap]
  with org.apache.spark.sql.graftbridge.ScoreIdInputTypes {

  require(k >= 1, s"topk_by needs k >= 1 (got $k)")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = {
    var i = 0
    while (i < o.n) { b.insert(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKHeap): Any = {
    val idx = (0 until b.n).sortBy(i => (-b.scores(i), b.ids(i)))
    new GenericArrayData(
      idx.map(i => InternalRow(b.scores(i), b.ids(i))).toArray[Any])
  }

  override def serialize(b: TopKHeap): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 16 * b.n)
    buf.putInt(b.k)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) { h.insert(buf.getDouble(), buf.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKBy {
  /** Column API for [[TopKBy]]: the k best (score desc, id asc) pairs per
    * group as a sorted array of structs.
    */
  def topk_by(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TopKBy(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
  }

  /** (identifier, info, builder) triple for SQL registration — used by
    * [[GraftExtensions]] and directly registerable into a session's
    * FunctionRegistry. `k` must be an INT literal (the heap is sized at
    * plan time). The analyzer wraps the returned AggregateFunction in a
    * Complete AggregateExpression, as for built-in aggregates.
    */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("topk_by"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TopKBy].getName, "topk_by"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "topk_by expects (score, id, k)")
      children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) =>
          TopKBy(children.head, children(1), v)
        case other => throw new IllegalArgumentException(
          s"topk_by k must be an INT literal, got $other")
      }
    })
}
