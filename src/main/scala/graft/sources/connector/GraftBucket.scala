package graft.sources.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The graft bucket function: `bucket(n, col) = pmod(murmur3_32(col,
  * seed=42).toInt, n)` — DELIBERATELY identical to Spark's own
  * `HashPartitioning` (`pmod(Murmur3Hash(col, 42), n)`), for two
  * load-bearing reasons:
  *
  *  1. '''Write-side alignment.''' A bucketed write requests a
  *     clustered distribution on the raw column with `n` partitions;
  *     Spark's exchange routes each row to partition
  *     `pmod(murmur3(col), n)` — exactly its bucket — so every write
  *     task receives ONE bucket and writes ONE file. The task-side
  *     splitter ([[BucketedDataWriter]]) never RELIES on this (it
  *     computes each row's bucket itself and would split a
  *     multi-bucket task into per-bucket files), but the alignment is
  *     what makes the layout n files instead of n×tasks.
  *  2. '''Shuffle compatibility.''' When only one join side is a
  *     bucketed graft table, Spark (under
  *     `spark.sql.sources.v2.bucketing.shuffle.enabled`) can shuffle
  *     the OTHER side by evaluating this function — so the bucketed
  *     side still reads shuffle-free.
  *
  * Exposed through [[GraftCatalog]]'s `FunctionCatalog` surface: this
  * is how Catalyst resolves the `bucket(n, col)` transform that
  * [[SnapshotScan]] reports in its `KeyGroupedPartitioning` — the
  * storage-partitioned-join (SPJ) handshake. Two scans whose
  * transforms bind to the same `canonicalName` and bucket count are
  * co-partitioned: the join plans with ZERO Exchange on either side.
  * At 100 TB that is the difference between shuffling two fact tables
  * (the single most expensive operation a cluster can do) and a
  * straight per-bucket merge read.
  *
  * Key-type surface: integral, date/timestamp, and string — the types
  * whose Spark shuffle hash is a stable public contract. Null keys
  * hash like Spark's shuffle does (hash = seed), so null rows land in
  * bucket `pmod(42, n)` on both the write and any cooperating
  * shuffle.
  *
  * Reference scope: the reference engine (wu02067602/domanda-etl)
  * always joins via in-memory pandas merges (etl/transformer.py); a
  * distributed engine needs the co-location contract instead — this
  * follows the Iceberg bucket-function + SPJ design (public Spark
  * SPIP: storage-partitioned joins, SPARK-37375).
  */
object GraftBucket {

  /** Spark's shuffle seed ([[org.apache.spark.sql.catalyst.expressions.Murmur3Hash]]). */
  val Seed = 42L

  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }

  /** Murmur3-32 of one value exactly as Spark's `Murmur3Hash`
    * expression computes it — [[Murmur3_x86_32]] is the same public
    * primitive `Murmur3HashFunction` delegates to (integrals under 64
    * bits hash as ints, 64-bit values as longs, strings as raw UTF-8
    * bytes). `null` returns the seed — Spark's hash expressions leave
    * the running hash untouched on null children. */
  def hash32(v: Any, dt: DataType): Int = {
    if (v == null) return Seed.toInt
    dt match {
      case ByteType => Murmur3_x86_32.hashInt(v.asInstanceOf[Byte].toInt, Seed.toInt)
      case ShortType => Murmur3_x86_32.hashInt(v.asInstanceOf[Short].toInt, Seed.toInt)
      case IntegerType | DateType =>
        Murmur3_x86_32.hashInt(v.asInstanceOf[Int], Seed.toInt)
      case LongType | TimestampType | TimestampNTZType =>
        Murmur3_x86_32.hashLong(v.asInstanceOf[Long], Seed.toInt)
      case StringType =>
        val u = v.asInstanceOf[UTF8String]
        Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes(), Seed.toInt)
      case other => throw new UnsupportedOperationException(
        s"graft bucket key type ${other.simpleString} is not supported " +
          "(integral, date/timestamp, or string)")
    }
  }

  /** `pmod(hash32(v), n)` — the bucket id. */
  def of(v: Any, dt: DataType, n: Int): Int = {
    val r = hash32(v, dt) % n
    if (r < 0) r + n else r
  }

  /** Bucket of an EXTERNAL (non-catalyst) literal, e.g. a pushed
    * `Filter` value: converts to the internal representation first
    * (String → UTF8String, java.sql/ time types → internal micros /
    * days), or None when the value's runtime type cannot be the
    * column's internal form (no pruning then — conservative). */
  def ofLiteral(v: Any, dt: DataType, n: Int): Option[Int] = {
    val internal: Option[Any] = (v, dt) match {
      case (null, _) => Some(null)
      case (b: Byte, ByteType) => Some(b)
      case (s: Short, ShortType) => Some(s)
      case (i: Int, IntegerType) => Some(i)
      case (l: Long, LongType) => Some(l)
      case (s: String, StringType) => Some(UTF8String.fromString(s))
      case (d: java.sql.Date, DateType) =>
        Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d))
      case (d: java.time.LocalDate, DateType) =>
        Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(d))
      case (t: java.sql.Timestamp, TimestampType) =>
        Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
      case (t: java.time.Instant, TimestampType) =>
        Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t))
      case _ => None
    }
    internal.map(of(_, dt, n))
  }
}

/** TBLPROPERTIES IO: one small `_props.json` next to the log — layout
  * DEFAULTS (statsCols/bloomCols/clusterBy/bucketBy/buckets), not
  * data: they affect future writes only, so they live deliberately
  * outside the versioned commit history (like Delta's table config,
  * unlike its schema). Shared by [[GraftCatalog]] (SQL surface),
  * [[SnapshotWriteBuilder]] (which must cross-check a path write's
  * explicit bucket options against the table's declared layout), and
  * [[graft.sources.SnapshotTable]]'s DML paths (whose rewrites
  * preserve a declared bucket layout). */
private[sources] object GraftTableProps {

  def read(hconf: org.apache.hadoop.conf.Configuration,
           dir: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(dir, "_props.json")
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        val it = node.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      } finally in.close()
    }
  }

  def write(hconf: org.apache.hadoop.conf.Configuration, dir: String,
            props: Map[String, String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_props.json")
    val fs = p.getFileSystem(hconf)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }
}

/** The `bucket` V2 function [[GraftCatalog]] serves: binds
  * `(int numBuckets, key)` → int bucket id. The `canonicalName`
  * carries the key type — Spark treats two `TransformExpression`s as
  * compatible exactly when their bound functions' canonical names
  * (and bucket counts) match, which is the SPJ co-partitioning
  * check. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): pmod(murmur3_32(col, 42), n) — graft's write-time " +
      "hash bucket; joins between tables bucketed alike plan shuffle-free"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (numBuckets int, key), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the int bucket count, got " +
        inputType.fields(0).dataType.simpleString)
    val keyType = inputType.fields(1).dataType
    require(GraftBucket.supports(keyType),
      s"bucket key type ${keyType.simpleString} is not supported " +
        "(integral, date/timestamp, or string)")
    new GraftBucketBound(keyType)
  }
}

final class GraftBucketBound(keyType: DataType)
  extends ScalarFunction[Integer]
    with org.apache.spark.sql.connector.catalog.functions
      .ReducibleFunction[Integer, Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = if (input.isNullAt(1)) null else input.get(1, keyType)
    GraftBucket.of(v, keyType, n)
  }

  /** MISMATCHED bucket counts could in principle co-partition when one
    * divides the other (`pmod(h, kn) % n == pmod(h, n)` — the algebra
    * Iceberg's bucket reducer uses via Spark's
    * `v2.bucketing.allowCompatibleTransforms` handshake). This
    * implementation deliberately returns null: with a mod-reducer
    * wired in, Spark 4.1's reduced-value zip paired this source's
    * key-grouped partitions by RAW value (only fine ids < coarse n
    * joined — a silent 1/k answer, caught by ConnectorSpec before it
    * shipped). Returning null keeps mismatched-count joins on the
    * fallback shuffle — always correct; the spec pins exactly that.
    * Revisit when the reduced-zip contract is pinned upstream. */
  override def reducer(thisNumBuckets: Int,
      other: org.apache.spark.sql.connector.catalog.functions.ReducibleFunction[_, _],
      otherNumBuckets: Int)
      : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] =
    null
}
