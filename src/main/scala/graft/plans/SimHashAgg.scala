package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash aggregate: one mutable 64-counter vote buffer per
  * group (a TypedImperativeAggregate), versus the expression-level
  * formulation that needs 64 separate sum() aggregate buffers per group.
  * Each input token hashes to 64 bits; every bit votes ±1; the final
  * signature takes the sign of each vote.
  *
  * Token hash = two 32-bit Murmur3 runs (seeds 42 / 0x9747b28c) packed
  * into 64 bits — deterministic and partition-order independent (votes
  * are commutative sums).
  */
object SimHashAgg {
  private[plans] def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }

  /** Per-row twin of the aggregate: identical hash family and vote/sign
    * arithmetic, so a row-local signature (the streaming path, where a
    * groupBy agg per doc would force an extra stateful shuffle) equals
    * the grouped `simhash_agg` of the same tokens bit for bit.
    */
  def simhashOfTokens(tokens: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = hash64(UTF8String.fromString(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  private def hash64(s: UTF8String): Long = SimHashAgg.hash64(s)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash64(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buffer(i) += 1 else buffer(i) -= 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < 64) {
      if (buffer(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Vote aggregate over PRECOMPUTED hash longs: bit b of the result is
  * set iff inputs with bit b set outnumber those with it clear (strict
  * majority, tie → 0 — the same vote/sign arithmetic as [[SimHashAgg]]).
  * One `bits`-counter buffer per group instead of `bits` separate sum()
  * aggregate buffers — this is what keeps the md5-family SimHash
  * (`Dedup.simhashMd5`, 60 bits) a single compact aggregation while its
  * value stays bit-identical to the 60-sum expression form the DuckDB
  * oracle replays.
  */
case class SimHashVoteAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_votes"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) buffer(i) += 1 else buffer(i) -= 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < bits) {
      if (buffer(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashVoteAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashVoteAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
