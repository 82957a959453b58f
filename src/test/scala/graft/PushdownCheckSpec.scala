package graft

import org.apache.spark.sql.functions._

/** The watermark predicate must reach the parquet scan even when the
  * fixture writes naive timestamps (TIMESTAMP_NTZ inference): a
  * non-pushed ts filter is a full scan at 100 TB. */
class PushdownCheckSpec extends SparkTestBase {
  test("ts watermark filter pushes to the parquet scan despite NTZ normalization") {
    val df = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .filter(col("ts") > to_timestamp(lit(1705363200L)))
    val scan = df.queryExecution.executedPlan.toString
    val pushed = scan.split("\n").find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThan(ts"),
      s"ts filter not pushed to scan:\n$scan")
  }
}
