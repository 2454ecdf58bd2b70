package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries heavy-hitters summary as a native mergeable aggregate —
  * the bounded-state frequent-items tool for a 100 TB scan: at most `k`
  * counters per buffer regardless of stream length, one pass, partials
  * merge associatively (Agarwal et al. 2013, "Mergeable Summaries":
  * sum counters, then subtract the (k+1)-th largest and drop ≤0).
  *
  * Guarantees: every item with true frequency > n/(k+1) survives, and
  * each reported count c satisfies true − n/(k+1) ≤ c ≤ true. When the
  * column's distinct count never exceeds k the summary is EXACT — the
  * regime q_heavy_hitters pins against a DuckDB groupBy oracle, while
  * PropertiesSpec drives the lossy regime against the error bound.
  *
  * Returns map<string, long> of item → estimated (lower-bound) count.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "misra_gries needs k >= 1 counters")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None if buffer.size < k => buffer.update(s, 1L)
        case None =>
          // classic MG decrement-all; O(k) only on a miss at capacity
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.keysIterator.foreach { key =>
            val nc = buffer(key) - 1
            if (nc <= 0) dead += key else buffer.update(key, nc)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buffer.update(s, buffer.getOrElse(s, 0L) + c) }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count, drop the non-positive
      val m = buffer.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { key =>
        val nc = buffer(key) - m
        if (nc <= 0) dead += key else buffer.update(key, nc)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val entries = buffer.toArray
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(e => e._2: Any))
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val parts = buffer.toArray.map { case (s, c) => (s.getBytes("UTF-8"), c) }
    val bb = java.nio.ByteBuffer.allocate(4 + parts.map(_._1.length + 12).sum)
    bb.putInt(parts.length)
    parts.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      m.update(new String(arr, "UTF-8"), bb.getLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
