package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the deequ/Great-Expectations
  * shape, engine-native): a set of named constraints evaluated into a
  * violation report — one row per constraint with its violation count
  * and pass flag. Generalizes the reference's hand-rolled load gates
  * (`etl/loader.py:204-217` count assertion, `etl/loader.py:117-156`
  * gds_type gate) into a composable API.
  *
  * Shape at scale: every ROW-LEVEL constraint compiles to one
  * `sum(when(violated, 1))` inside a SINGLE aggregate over one scan —
  * adding a constraint costs one codegen'd expression, not a pass.
  * Uniqueness rides the same aggregate as `count - countDistinct`.
  * Referential integrity is the one constraint that genuinely needs a
  * second table; it joins ANTI (nothing wider than the key shuffles)
  * and unions into the same report plan.
  */
object Expectations {

  /** Thrown by gated commits (e.g. `SnapshotTable.writeGated`) when a
    * batch violates its expectations. A DEDICATED type (subclassing
    * IllegalStateException for compatibility) so callers routing bad
    * batches to quarantine can't accidentally swallow infrastructure
    * failures that also surface as IllegalStateException (version-claim
    * exhaustion, empty-table reads). */
  final class ExpectationsFailedException(msg: String)
    extends IllegalStateException(msg)

  final case class Check(name: String, violated: Column)

  /** A check's verdict per row, with NULL folded to "not violated" —
    * the single definition both [[filterValid]] and [[report]] use, so
    * a custom check whose `violated` column evaluates NULL behaves
    * identically in the filter and report forms (kept, counted as
    * passing) instead of silently diverging. */
  private def isViolated(ch: Check): Column = coalesce(ch.violated, lit(false))

  def notNull(c: String): Check = Check(s"not_null:$c", col(c).isNull)

  /** Violated when null or outside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range:$c", !col(c).between(lo, hi) || col(c).isNull)

  def inSet(c: String, values: Seq[String]): Check =
    Check(s"in_set:$c", !col(c).isin(values: _*) || col(c).isNull)

  def matches(c: String, regex: String): Check =
    Check(s"matches:$c", !col(c).rlike(regex) || col(c).isNull)

  /** Row filter form: keep only rows violating NO check — the gate a
    * pipeline applies inline when bad rows should drop rather than
    * abort the load (the report/writeGated forms are for when they
    * should). Pure map-side predicate, composes into any plan. No
    * checks means nothing to violate: the frame passes through. */
  def filterValid(df: DataFrame, checks: Seq[Check]): DataFrame =
    if (checks.isEmpty) df
    else df.filter(!checks.map(isViolated).reduce(_ || _))

  private def reportRows(df: DataFrame, pairs: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +:
      pairs.zipWithIndex.map { case ((_, v), i) => v.as(s"__v$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"), col(s"__v$i").as("violations"),
          col("__total").as("total"))
      }: _*)).as("__r"))
      .select(col("__r.check_name").as("check_name"),
        col("__r.violations").as("violations"), col("__r.total").as("total"))
  }

  /** Row-level checks + optional uniqueness keys, one scan, one
    * aggregate. `uniqueKeys` adds a `unique:<cols>` row counting
    * surplus duplicate rows (null keys are not counted distinct,
    * matching SQL COUNT(DISTINCT)). */
  def report(df: DataFrame, checks: Seq[Check],
             uniqueKeys: Seq[Seq[String]] = Nil): DataFrame = {
    val rowPairs = checks.map(ch =>
      ch.name -> coalesce(sum(when(isViolated(ch), 1L).otherwise(0L)), lit(0L)))
    val uniqPairs = uniqueKeys.map { ks =>
      s"unique:${ks.mkString(",")}" ->
        (count(lit(1)) - countDistinct(ks.head, ks.tail: _*))
    }
    withVerdict(reportRows(df, rowPairs ++ uniqPairs))
  }

  /** `fk:<childCol>` row — child keys with no parent (anti-join). */
  def refIntegrity(child: DataFrame, childCol: String,
                   parent: DataFrame, parentCol: String): DataFrame = {
    val violations = child
      .join(parent.select(col(parentCol)).distinct(),
        col(childCol) === col(parentCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    withVerdict(violations.crossJoin(total)
      .select(lit(s"fk:$childCol").as("check_name"),
        col("violations"), col("total")))
  }

  private def withVerdict(df: DataFrame): DataFrame =
    df.withColumn("pass", col("violations") === 0L)
}
