package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `graft_heavyhitters(key, capacity)` — Misra–Gries frequent-items
  * summary as a native TypedImperativeAggregate: the top keys of an
  * UNBOUNDED key domain tracked in O(capacity) state per group, with the
  * published mergeable-summaries combine (Agarwal et al., PODS'12): merge
  * = pointwise counter sum, then subtract the (capacity+1)-th largest
  * count from every counter and drop the non-positive ones.
  *
  * Guarantees (any arrival order, any merge tree — the classic MG bound):
  *   - `est <= true_count` (counters only ever under-count), and
  *   - `true_count - est <= n / (capacity + 1)` where n is the group's
  *     total row count — so every key with frequency above n/(capacity+1)
  *     is guaranteed present in the summary.
  *
  * Determinism contract: whenever `capacity >=` the number of distinct
  * keys reaching any one partial buffer, no decrement ever fires and the
  * summary is the EXACT (key, count) multiset — bit-stable across
  * partitionings and merge orders, which is the regime the hash gate
  * (`ns170`) runs in. Under genuine eviction pressure the surviving key
  * set may depend on merge order, but the two bounds above hold for every
  * order — the gate's small-capacity leg therefore checks the BOUNDS, not
  * the counters. Nulls are ignored (SQL aggregate convention).
  *
  * Why not `groupBy(key).count.orderBy(...).limit(k)`: that materializes
  * the full distinct-key table on the exchange — at 100 TB a token/user
  * frequency table is itself huge. The MG summary ships `capacity`
  * (key, counter) pairs per partition per group regardless of the key
  * domain, the same reason the sketch family (CMS/HLL/Bloom) exists.
  */
case class MisraGriesAgg(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_heavyhitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_heavyhitters expects a BIGINT key, got ${child.dataType.simpleString}")
    else if (!capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters capacity must be a literal")
    else if (capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters capacity must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, java.lang.Long] =
    new java.util.HashMap[java.lang.Long, java.lang.Long](cap * 2)

  override def update(
      buffer: java.util.HashMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buffer.get(k)
      if (cur != null) buffer.put(k, cur + 1L)
      else if (buffer.size < cap) buffer.put(k, 1L)
      else {
        // MG step: decrement every counter, dropping the zeroed ones.
        // O(cap) but amortized: each decrement pays for one arrival.
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[java.lang.Long, java.lang.Long],
      other: java.util.HashMap[java.lang.Long, java.lang.Long])
    : java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (buffer.size > cap) {
      // Mergeable-summaries combine: subtract the (cap+1)-th largest
      // counter from everything; exactly the keys at or below it vanish.
      val counts = new Array[Long](buffer.size)
      var i = 0
      val vs = buffer.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buffer.size - cap - 1) // (cap+1)-th largest
      val jt = buffer.entrySet().iterator()
      while (jt.hasNext) {
        val e = jt.next()
        if (e.getValue <= sub) jt.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    val entries = new Array[(Long, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey.longValue(), e.getValue.longValue()); i += 1 }
    // est desc, key asc — the pinned presentation order of the summary
    java.util.Arrays.sort(entries, (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    })
    val rows = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      rows(i) = new GenericInternalRow(Array[Any](entries(i)._1, entries(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: java.util.HashMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), capExpr = newChildren(1))
}
