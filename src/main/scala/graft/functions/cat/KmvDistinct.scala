package graft.functions.cat

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch — the engine's custom
  * UDAF surface (SURVEY §2.9): a `TypedImperativeAggregate` whose state
  * is the set of the k smallest distinct polynomial hashes seen.
  *
  * Why KMV and not a counter sketch: the min-k set is a commutative,
  * idempotent monoid under union+trim, so partial aggregation order,
  * partitioning, and merge order cannot change the result — the sketch
  * is deterministic and therefore oracle-checkable (a space-saving /
  * CMS counter sketch is order-sensitive under merges and would flake
  * the hash-compare gate). Exact below k distinct values (the buffer
  * holds everything); above, the standard estimator (k-1)·p / h_(k)
  * over the polyHash domain [0, p). Constant state (k longs) per
  * group, map-side combined — the distributed shape of
  * `approx_count_distinct` with arithmetic any SQL engine reproduces.
  */
case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val P = 1000000007L

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** polyHash of a short string is bounded by ~31^len — far from
    * uniform over [0, p), which the KMV estimator assumes. Two LCG mix
    * rounds (exact integer arithmetic, mirrored in oracle SQL) wrap
    * any input across the full domain: even h=1 maps through
    * 48271² ≈ 2.3e9 > p. */
  private def mix(h0: Long): Long = {
    val h1 = (h0 * 48271L + 11L) % P
    (h1 * 48271L + 11L) % P
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(mix(Kernels.polyHash(v.asInstanceOf[UTF8String], 31, P)))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      a.add(it.next())
      if (a.size > k) a.pollLast()
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * P.toDouble / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Column-level entry point; `c` is hashed as a string. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(
      new KmvDistinct(Bridge.expression(c.cast("string")), k).toAggregateExpression())
}

/** The KMV hash domain and mixer, shared by every sketch producer so
  * sketches built by different write paths (the staged-batch agg, the
  * V2 task writers) merge losslessly at plan time. */
object KmvSketch {
  val P = 1000000007L

  /** polyHash of a short string is bounded by ~31^len — far from
    * uniform over [0, p); two LCG mix rounds wrap any input across the
    * full domain (mirrors [[KmvDistinct.mix]]). */
  def mix(h0: Long): Long = {
    val h1 = (h0 * 48271L + 11L) % P
    (h1 * 48271L + 11L) % P
  }

  /** Mixed hash of a value's string form — the unit every NDV sketch
    * inserts. */
  def hash(u: UTF8String): Long = mix(Kernels.polyHash(u, 31, P))

  /** NDV estimate from a merged min-k set: exact below `k`, the
    * standard (k-1)·p / h_(k) estimator above. */
  def estimate(sorted: java.util.TreeSet[java.lang.Long], k: Int): Long =
    if (sorted.size < k) sorted.size.toLong
    else math.round((k - 1).toDouble * P.toDouble / sorted.last.toDouble)
}

/** [[KmvDistinct]]'s sketch-VALUES twin: returns the sorted min-k hash
  * set itself (ascending `array<bigint>`) instead of the estimate —
  * the form the snapshot manifest stores per file, so plan-time
  * statistics can merge file sketches into a table-level NDV
  * ([[graft.sources.connector.SnapshotScan]]'s `columnStats`). */
case class KmvValues(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(KmvSketch.hash(v.asInstanceOf[UTF8String]))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      a.add(it.next())
      if (a.size > k) a.pollLast()
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    buf.forEach { v => out(i) = v; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_kmv_values"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvValues =
    copy(child = newChildren.head)
}

object KmvValues {
  /** Column-level entry point; `c` is hashed as a string. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(
      new KmvValues(Bridge.expression(c.cast("string")), k).toAggregateExpression())
}
