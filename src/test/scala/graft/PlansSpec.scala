package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.functions.cat.GraftExpr.StringKernelCall

/** SparkSessionExtensions surface: SQL-registered kernel functions and
  * the idempotent-normalize optimizer rule. */
class PlansSpec extends SparkTestBase {

  test("graft_* functions are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_flight_norm('ci 73') AS fn,
        |       graft_flight_valid('CI073') AS fv,
        |       graft_key_norm('  a  b ') AS kn,
        |       graft_duration_minutes('0 days 02:05:00') AS dm,
        |       graft_time_hhmm('dep at 7:45 local') AS th
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "CI073")
    assert(row.getBoolean(1))
    assert(row.getString(2) == "A B")
    assert(row.getInt(3) == 125)
    assert(row.getString(4) == "07:45")
  }

  test("CollapseIdempotentNormalize removes double normalization") {
    // non-foldable input (range, not a literal) so constant folding
    // can't erase the calls before the rule is observable
    val base = spark.range(1)
      .select(concat(lit("ci 7"), col("id").cast("string")).as("v"))
    val df = base.select(Normalize.normalizeFlightNumber(
      Normalize.normalizeFlightNumber(col("v"))).as("r"))
    val kernelCalls = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case k: StringKernelCall => k })
    assert(kernelCalls.size == 1, s"expected 1 kernel call, got $kernelCalls")
    assert(df.collect()(0).getString(0) == "CI070")

    val base2 = spark.range(1)
      .select(concat(lit("  x  y"), col("id").cast("string"), lit(" ")).as("v"))
    val mixed = base2
      .select(Normalize.normalizeTightKey(Normalize.normalizeKey(col("v"))).as("r"))
    val calls2 = mixed.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case k: StringKernelCall => k })
    assert(calls2.size == 1 && calls2.head.fn == "tightKeyNorm")
    assert(mixed.collect()(0).getString(0) == "XY0")
  }
}
