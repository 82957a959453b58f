package graft.functions.cat

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter aggregate over a long key column: the buffer is an
  * m-bit bitset (Array[Long]), update sets the k double-hashing bits
  * of [[Kernels.bloomSet]], merge is bitwise OR. OR is commutative,
  * associative, and idempotent, so partial aggregation order and
  * partitioning cannot change the result — the built filter is
  * bit-identical on any cluster layout (same determinism argument as
  * the KMV sketch, `KmvDistinct.scala`).
  *
  * This is the build side of the bloom semi-join pre-filter
  * (`operators/BloomJoin.scala`): at 100 TB the pre-shuffle membership
  * test drops non-joining big-side rows in the scan stage, shrinking
  * the join exchange by the selectivity of the small side — the same
  * mechanism as Spark's AQE runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
  * explicit operator so it also composes where the optimizer cannot
  * inject it (pre-aggregated keys, multi-stage reuse of one filter).
  *
  * `numBits` must be a power of two (the probe uses mask arithmetic);
  * state is constant m/8 bytes regardless of input rows.
  */
case class BloomAgg(child: Expression, numBits: Int, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"numBits must be a power of two >= 64, got $numBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Kernels.bloomSet(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** Column-level entry point; `c` must be integral (cast to long). */
  def apply(c: Column, numBits: Int, k: Int): Column =
    Bridge.column(
      new BloomAgg(Bridge.expression(c.cast("long")), numBits, k).toAggregateExpression())
}
