package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.cat.GraftExpr

/** Z-order (Morton curve) data layout: sort an immutable corpus by the
  * bit-interleave of two scan dimensions so parquet min/max statistics
  * prune files/row-groups for range predicates on EITHER column — the
  * standard layout optimization for 100 TB append-only tables where
  * queries filter on more than one axis (e.g. `source` × `date`,
  * `user` × `time`).
  *
  * A plain sort clusters only its leading column; the Morton curve
  * bounds every partition to a hyper-rectangle in both dimensions, so
  * each file's (min,max) span on each column shrinks ~sqrt(N_files)
  * instead of not at all for the trailing column. `ZOrderSpec`
  * measures exactly that: summed per-partition spans under z-layout
  * vs a single-column sort on uniform grid data.
  *
  * Scale shape: the z-key is one codegen'd kernel call (map-side);
  * `repartitionByRange` samples the key to build range bounds (one
  * lightweight job) and performs the one shuffle any re-layout needs;
  * there is no driver-side data movement. Keys must be non-negative;
  * callers pre-scale real domains into `bits`-bit integers (the usual
  * percent-rank or fixed-width binning).
  */
object ZOrder {

  /** Morton key column for the low `bits` bits of two long columns.
    * Negative inputs raise at runtime rather than silently interleaving
    * the masked low bits of a two's-complement pattern (which would
    * yield a syntactically valid but meaningless layout). */
  def zkey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    def checked(c: Column): Column =
      when(c < 0, raise_error(
        concat(lit("zkey requires non-negative keys; got "), c.cast("string"))))
        .otherwise(c)
    GraftExpr.zorder2(checked(a.cast("long")), checked(b.cast("long")), bits)
  }

  /** Re-layout `df` z-ordered on (`c1`, `c2`) into `numFiles` range
    * partitions, rows sorted by the curve within each partition. */
  def layoutBy(df: DataFrame, c1: Column, c2: Column, bits: Int,
               numFiles: Int): DataFrame = {
    val key = zkey(c1, c2, bits)
    df.repartitionByRange(numFiles, key).sortWithinPartitions(key)
  }
}
