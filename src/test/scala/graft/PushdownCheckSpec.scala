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

  test("predicates push into BOTH legs of a deletion-vector-masked scan") {
    import graft.sources.SnapshotTable
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dvpush").toString
    SnapshotTable.write(spark,
      spark.range(0, 2000).select($"id", ($"id" % 7).as("x"))
        .repartitionByRange(4, $"id"),
      dir, "overwrite", Seq("id"))
    SnapshotTable.deleteVectors(spark, dir, $"id" < 500 && $"x" === 3)
    // one file carries the vector, three stay plain; a residual filter
    // over the whole scan must reach BOTH legs — the parquet leg as
    // row-group PushedFilters, the connector dv leg (the vectorized
    // in-reader mask, round 12) as manifest skippingFilters. Losing
    // either is a full file read at scale.
    val q = SnapshotTable.scan(spark, dir).filter($"id" > 1500)
    val plan = q.queryExecution.executedPlan.toString
    val pushedLines = plan.split("\n").filter(_.contains("PushedFilters: ["))
      .filterNot(_.contains("PushedFilters: []"))
    assert(pushedLines.count(_.contains("GreaterThan(id,1500)")) >= 1,
      s"id filter must push into the plain parquet leg:\n$plan")
    val connScans = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }
    assert(connScans.exists(_.contains("GreaterThan(id,1500)")),
      s"id filter must reach the connector dv leg's file skipping:\n$plan")
    // and the skip is real: the dv file's ids are all < 500, so the
    // connector leg plans ZERO of its files under this filter
    val dvLegScan = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.connector.SnapshotScan]
    }
    assert(dvLegScan.exists(_.planInputPartitions().isEmpty),
      "stats must refute id>1500 for the dv-carrying file")
    assert(q.count() == 499)
  }
}
