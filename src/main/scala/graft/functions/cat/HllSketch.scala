package graft.functions.cat

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a
  * `TypedImperativeAggregate` — the fixed-memory complement to
  * [[KmvDistinct]] on the engine's custom-UDAF surface (SURVEY §2.9).
  *
  * Where KMV keeps the k smallest hashes (state grows with k and is
  * exact below it), HLL keeps exactly `m` one-byte registers
  * regardless of cardinality — the shape production engines ship for
  * "distinct users per key over 100 TB": per-group state is m bytes,
  * partial aggregation combines map-side, and merging two sketches is
  * an elementwise register max, so partition count, input order, and
  * merge tree shape cannot change the result. That determinism is
  * what makes it oracle-checkable end to end.
  *
  * Hash: two polynomial hashes of the value's string form (bases
  * 31/131, moduli 1e9+7 / 998244353) paired as `x = p1 · P2 + p2`,
  * then the splitmix64 FINALIZER (two xor-shift + wraparound-multiply
  * rounds, Vigna 2015) for avalanche, truncated mod 2^48. The
  * finalizer is load-bearing: the raw CRT pair of two polyhashes of
  * the same string is correlated enough to bias the estimator by
  * ±20-40% (measured during development); after avalanche the
  * per-run error scatters ±1σ around zero. Every step is integer
  * arithmetic a SQL engine reproduces exactly — DuckDB mirrors the
  * wraparound multiplies in UHUGEINT (`xor(z, z >> 30) * C % 2^64`),
  * the JVM gets them free from Long overflow. Bucket `j = h mod m`;
  * rank `rho = 41 - bitlength(h div m)` ∈ [1, 41] (the quotient is
  * < 2^40 for any power-of-two m ≥ 256, and the all-zero quotient
  * reads as bitlength 0, so the single formula needs no special
  * case). The 2^48 truncation costs nothing: a geometric rank
  * reaching 40 needs ~2^40 · m distinct values per bucket.
  *
  * Eval emits the REGISTER SUMMARY, not just a float: `v_zero` (empty
  * registers), `s_scaled` = Σ_j 2^(41 - rho_j) — the harmonic-mean
  * denominator scaled by 2^41 so it is an EXACT ≤ 2^49 integer — and
  * `est_raw` = α_m · m² · 2^41 / s_scaled in IEEE doubles using only
  * +,*,/ (each correctly rounded, so DuckDB mirrors it bit-for-bit;
  * no log/exp, whose libm rounding differs across engines), and
  * `est` — the SHIPPED estimate with the HLL++ small-range
  * correction: when `est_raw ≤ 2.5·m` and empty registers remain,
  * linear counting `m · ln(m / v_zero)` replaces the raw estimator
  * (Flajolet's small-range regime, where the harmonic mean is badly
  * biased — the raw estimator reads ≈ α·m ≈ 0.7·m for an EMPTY
  * sketch). The correction needs one `ln`; an oracle mirrors it with
  * its own `ln` — both correctly-rounded libm doubles over the same
  * rational m/v_zero, which agree on every fixture this engine
  * gates (the raw register summary stays the exact-integer
  * hash gate either way). Standard error ≈ 1.04/√m.
  */
case class HllAgg(child: Expression, m: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 256 && (m & (m - 1)) == 0,
    s"m must be a power of two >= 256 (rho window assumes h/m < 2^40), got $m")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllAgg.hash48(v.asInstanceOf[UTF8String])
      val j = (h % m).toInt
      val r = HllAgg.rho(h / m)
      if (r > buf(j)) buf(j) = r.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var vZero = 0L
    var s = 0L
    var i = 0
    while (i < m) {
      if (buf(i) == 0) vZero += 1
      s += 1L << (41 - buf(i)) // register 0 contributes 2^41 exactly
      i += 1
    }
    val md = m.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / md)
    val raw = alpha * md * md * HllAgg.Two41 / s.toDouble
    // HLL++ small-range branch: linear counting off the empty-register
    // count (exact for tiny cardinalities, where raw is ~alpha*m even
    // for an empty sketch)
    val est =
      if (raw <= 2.5 * md && vZero > 0) md * math.log(md / vZero)
      else raw
    new GenericInternalRow(Array[Any](vZero, s, raw, est))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = HllAgg.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_hll"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  val P1 = 1000000007L
  val P2 = 998244353L
  private[cat] val Two41 = 2199023255552.0 // 2^41, exact in a double

  val OutType: StructType = StructType(Seq(
    StructField("v_zero", LongType, nullable = false),
    StructField("s_scaled", LongType, nullable = false),
    StructField("est_raw", DoubleType, nullable = false),
    StructField("est", DoubleType, nullable = false)))

  /** splitmix64 finalizer (Vigna 2015; public domain constants): full
    * avalanche from xor-shifts + wraparound multiplies. JVM Long
    * overflow IS mod-2^64; `>>>` keeps the shifts logical. */
  private def smix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** CRT-paired double polyHash through the splitmix64 finalizer,
    * truncated to 48 bits — uniform, and reproducible in any SQL
    * engine with 128-bit integer arithmetic. */
  def hash48(u: UTF8String): Long =
    smix(Kernels.polyHash(u, 31, P1) * P2 +
      Kernels.polyHash(u, 131, P2)) & 0xFFFFFFFFFFFFL

  /** 41 - bitlength(w); the all-zero quotient reads as 41. */
  def rho(w: Long): Int = java.lang.Long.numberOfLeadingZeros(w) - 23

  /** Column-level entry point; `c` is hashed via its string form. */
  def apply(c: Column, m: Int): Column =
    Bridge.column(
      new HllAgg(Bridge.expression(c.cast("string")), m).toAggregateExpression())
}
