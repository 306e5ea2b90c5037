package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native aggregate functions for scale-sensitive reductions. */
object AggExpressions {

  /** Mergeable top-k as an AGGREGATE: per group, the k highest
    * (score, id) pairs — score desc, id asc tie-break — returned as a
    * sorted array of structs.
    *
    * Why an aggregate and not a window: the rank-filter formulation
    * (row_number over partition + filter) must SORT every group;
    * WindowGroupLimit caps what crosses the wire at k rows per group per
    * map task, but each task still sorts its slice. This aggregate keeps
    * a bounded k-element heap per group — O(n log k) updates, O(k)
    * partial state, standard partial/merge/final plumbing — the same
    * one-shuffle shape as any hash aggregation, with NO sort anywhere.
    * For small k over huge skewed groups this is the plan you want.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.struct
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(struct(score, id)), k)
        .toAggregateExpression())
  }

  /** Element-wise sum of `array<long>` rows — the mergeable reduction
    * behind exact vector centroids ([[graft.operators.Vectors]]). Long
    * addition is associative, so partial/merge order CANNOT change the
    * result: the aggregate is bit-stable across partitionings, AQE
    * re-plans, and engines — which is what lets a float-derived centroid
    * hash-match a DuckDB oracle (floats are quantized to fixed-point
    * longs first; a double sum would depend on row order). State is one
    * long per dimension per group — no explode, the vector never unrolls
    * into dim× rows.
    */
  def vecSumLong(arr: Column): Column =
    ColumnBridge.column(
      VectorSumLong(ColumnBridge.expression(arr)).toAggregateExpression())
}

/** Bounded-heap top-k aggregate over struct<score double, id bigint>
  * input rows. Better = higher score, then lower id; output is the
  * final ranking order (score desc, id asc).
  */
case class TopKByScore(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with Serializable {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<double, bigint> input, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  // min-heap of the CURRENT top k: head = the weakest kept entry, i.e.
  // lowest score (ties: highest id). An incoming pair replaces the head
  // iff it beats it.
  private val weakestFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] {
      case (s, i) => (-s, i) // PQ dequeues max; invert to dequeue weakest
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(weakestFirst)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def push(buf: mutable.PriorityQueue[(Double, Long)],
                   p: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (better(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        push(buf, (row.getDouble(0), row.getLong(1)))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      buf.enqueue((bb.getDouble, bb.getLong))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = s"topk$k"
}

/** Element-wise long-array sum aggregate. The buffer grows to the widest
  * input seen (ragged inputs sum position-wise, missing tail = 0); null
  * rows are skipped. Output is `array<long>` — empty for all-null groups.
  */
case class VectorSumLong(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
    with Serializable {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  private def addInto(buf: mutable.ArrayBuffer[Long], i: Int,
                      v: Long): Unit = {
    while (buf.size <= i) buf += 0L
    buf(i) += v
  }

  override def update(buf: mutable.ArrayBuffer[Long],
                      input: InternalRow): mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) addInto(buf, i, arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Long],
                     other: mutable.ArrayBuffer[Long])
      : mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.size) {
      addInto(buf, i, other(i))
      i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "vec_sum_long"
}
