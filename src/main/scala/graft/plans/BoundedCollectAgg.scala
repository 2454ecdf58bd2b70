package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable

/** Size-bounded collect for long keys — the aggregation the dedup
  * posting-list paths need at 100 TB: keep AT MOST `cap` + 1 elements
  * per group while still counting every input, and evaluate to NULL
  * for any group whose true size exceeds `cap` (an over-cap group is
  * DROPPED by every caller, so its members never needed to
  * materialize). A plain `collect_list(...).filter(size <= cap)` holds
  * the full multi-million-element list of a degenerate group in one
  * unspillable aggregation buffer before the filter runs; this
  * aggregate's buffer is O(cap) regardless of group size, which lets
  * the posting-list pipelines run as a single hash aggregation with no
  * pre-capping count window (no sort) at any scale.
  *
  * Correctness of the truncation: partial buffers stop appending past
  * cap + 1 but keep exact counts; merged counts are exact sums. If the
  * final count is ≤ cap then NO buffer anywhere truncated (truncation
  * requires > cap + 1 appends in one buffer, which forces the total
  * past cap), so the emitted array is complete. If the count exceeds
  * cap the group evaluates to NULL — the only information the caller
  * uses. Null children COUNT against the cap but are not collected
  * (count(*)-window semantics, so the kept-group set never depends on
  * the key type). Element order is arrival order — callers sort.
  */
case class BoundedCollectLongAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[(Array[Long], mutable.ArrayBuffer[Long])] {
  // buffer: (count-cell as a 1-element array for in-place mutation, items)

  require(cap >= 1, "bounded_collect_long needs cap >= 1")

  // analysis-time type check: a non-long child would otherwise throw a
  // ClassCastException from a running task
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_long needs a BIGINT child, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect_long"

  override def createAggregationBuffer(): (Array[Long], mutable.ArrayBuffer[Long]) =
    (Array(0L), mutable.ArrayBuffer.empty)

  override def update(
      buffer: (Array[Long], mutable.ArrayBuffer[Long]),
      input: InternalRow): (Array[Long], mutable.ArrayBuffer[Long]) = {
    val v = child.eval(input)
    // EVERY row counts against the cap — null children included (they
    // are tallied, not collected), mirroring the count(*)-window cap
    // semantics so the kept-group set never depends on the key type
    buffer._1(0) += 1
    if (v != null && buffer._2.size <= cap) buffer._2 += v.asInstanceOf[Long]
    buffer
  }

  override def merge(
      buffer: (Array[Long], mutable.ArrayBuffer[Long]),
      other: (Array[Long], mutable.ArrayBuffer[Long])): (Array[Long], mutable.ArrayBuffer[Long]) = {
    buffer._1(0) += other._1(0)
    // keep at most cap + 1 items total — enough to distinguish "complete
    // at ≤ cap" from "over cap", never more
    val room = cap + 1 - buffer._2.size
    if (room > 0) buffer._2 ++= other._2.take(room)
    buffer
  }

  override def eval(buffer: (Array[Long], mutable.ArrayBuffer[Long])): Any =
    if (buffer._1(0) > cap) null
    else new GenericArrayData(buffer._2.toArray)

  override def serialize(buffer: (Array[Long], mutable.ArrayBuffer[Long])): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + buffer._2.size * 8)
    bb.putLong(buffer._1(0))
    bb.putInt(buffer._2.size)
    buffer._2.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): (Array[Long], mutable.ArrayBuffer[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    val items = mutable.ArrayBuffer.fill(n)(bb.getLong())
    (Array(count), items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The k SMALLEST long values of a group, with multiplicity, as a
  * sorted ascending array — the bounded per-key heap the per-domain
  * quota needs at 100 TB. A `row_number().over(partitionBy(domain))`
  * quota sorts EVERY domain's full partition (a hub domain = one
  * unsplittable multi-billion-row sort); this aggregate's buffer is a
  * size-k max-heap, map-side partials are ALSO capped at k, so a hub
  * domain ships at most k longs per task regardless of its row count.
  * Null children are skipped (callers make the ranking key total).
  * Unlike [[BoundedCollectLongAgg]], an over-cap group is NOT dropped —
  * its k smallest survive; `size(result) < k` ⟺ the group's true
  * non-null count was < k (an under-quota group).
  */
case class BoundedTopKLongAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {

  require(k >= 1, "bounded_topk_long needs k >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_topk_long needs a BIGINT child, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_topk_long"

  // max-heap: the head is the LARGEST of the kept k — the one a smaller
  // arrival evicts
  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long](Ordering.Long)

  private def push(heap: mutable.PriorityQueue[Long], v: Long): Unit =
    if (heap.size < k) heap += v
    else if (v < heap.head) { heap.dequeue(); heap += v }

  override def update(
      heap: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) push(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(push(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(heap.toArray.sorted)

  override def serialize(heap: mutable.PriorityQueue[Long]): Array[Byte] = {
    val items = heap.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + items.length * 8)
    bb.putInt(items.length)
    items.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap += bb.getLong(); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
