package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_topk(value, k)` — exact per-group top-k as a native
  * TypedImperativeAggregate with a bounded MIN-HEAP buffer: the
  * "top-k per group" answer in O(k) state per group, partial-aggregated
  * map-side and merged heap-wise across partitions.
  *
  * Why a custom aggregate instead of the two declarative spellings:
  *   - `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` sorts
  *     EVERY group member on the exchange — a full per-group sort and a
  *     full-width shuffle for an answer of size k;
  *   - `slice(sort_array(collect_list(v)), ...)` buffers the whole group
  *     in memory before sorting — the 10⁹-row group OOM.
  *   The heap aggregate ships k longs per partition per group, merges in
  *   O(k log k), and never materializes a group — the same reason
  *   TakeOrdered exists at the query top level, made available per-group.
  *
  * Determinism: the result is the multiset of the k largest VALUES in
  * descending order — ties are equal longs, so every arrival order
  * yields the identical array (hash-gate safe). Nulls are ignored (SQL
  * aggregate convention); groups with fewer than k values return what
  * they have.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects a BIGINT value, got ${child.dataType.simpleString}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk k must be a literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("graft_topk k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k + 1)

  private def push(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.offer(v)
    else if (v > buf.peek()) { buf.poll(); buf.offer(v) }

  override def update(
      buffer: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) push(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.PriorityQueue[java.lang.Long],
      other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) push(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    var i = buffer.size - 1
    // polling the MIN-heap yields ascending order; fill back-to-front
    while (i >= 0) { arr(i) = buffer.poll(); i -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
