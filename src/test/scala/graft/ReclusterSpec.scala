package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.sources.SnapshotTable

/** Incremental re-clustering: zone-map overlap decay on the declared
  * clusterBy key is detected from manifest intervals alone, and ONLY
  * the decayed overlap components are re-sorted — the hot tail of an
  * ingest pattern, never the cold bulk. */
class ReclusterSpec extends SparkTestBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-recl").toString
  spark.conf.set("spark.sql.catalog.graftrc2",
    classOf[graft.sources.connector.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graftrc2.root", root)

  private def planned(dir: String, lo: Long, hi: Long): Int = {
    val probe = spark.read.format("graft_snapshot").load(dir)
      .filter($"k" >= lo && $"k" < hi)
    probe.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.connector.SnapshotScan]
          .planInputPartitions().length
    }.head
  }

  private def decayedTable(name: String): String = {
    spark.sql(s"CREATE TABLE graftrc2.$name (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('clusterBy'='k', 'statsCols'='k', " +
      "'clusterPartitions'='8')")
    spark.sql(s"INSERT INTO graftrc2.$name SELECT id, id * 2 FROM range(0, 200000)")
    val dir = s"$root/$name"
    // hot-tail ingest: three epochs, each straddling [150k, 200k) —
    // the tail's stabbing depth decays to 4+ while the cold 75% of the
    // key domain keeps its pristine disjoint slices
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO graftrc2.$name " +
        s"SELECT id, id * 2 FROM range(${150000 + i}, 200000, 7)"))
    dir
  }

  test("only the decayed tail component is rewritten; pruning restored") {
    val dir = decayedTable("hot")
    val before = SnapshotTable.readManifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir).get)
    val total = before.files.size
    val sumBefore = spark.read.format("graft_snapshot").load(dir)
      .agg(sum($"v")).as[Long].head
    // decay visible in planning: a tail range plans every straddler, a
    // cold range still plans one slice
    assert(planned(dir, 160000, 162000) >= 4,
      s"tail should plan the straddlers, got ${planned(dir, 160000, 162000)}")
    assert(planned(dir, 10000, 12000) == 1)
    val rewritten = SnapshotTable.reclusterDecayed(spark, dir, maxDepth = 2)
    // incremental: the 3 epoch files + the straddled base slices, not
    // the table
    assert(rewritten >= 4 && rewritten < total,
      s"expected a partial rewrite, got $rewritten of $total files")
    // write-time pruning is back on the tail; the cold range untouched
    assert(planned(dir, 160000, 162000) == 1,
      s"tail still plans ${planned(dir, 160000, 162000)} files after recluster")
    assert(planned(dir, 10000, 12000) == 1)
    // content-neutral
    assert(spark.read.format("graft_snapshot").load(dir)
      .agg(sum($"v")).as[Long].head == sumBefore)
    // healthy layout: a second pass burns nothing
    val v = SnapshotTable.latestVersion(spark, dir).get
    assert(SnapshotTable.reclusterDecayed(spark, dir, maxDepth = 2) == 0)
    assert(SnapshotTable.latestVersion(spark, dir).get == v)
  }

  test("maintain drives it through the policy; off by default") {
    val dir = decayedTable("pol")
    // default policy: re-clustering is opt-in — no rewrite
    val rep0 = SnapshotTable.maintain(spark, dir,
      SnapshotTable.MaintenancePolicy(maxSmallFiles = 1000,
        keepVersions = 100, vacuumMinAgeMs = Long.MaxValue))
    assert(rep0.reclusteredFiles == 0)
    val rep = SnapshotTable.maintain(spark, dir,
      SnapshotTable.MaintenancePolicy(maxSmallFiles = 1000,
        keepVersions = 100, vacuumMinAgeMs = Long.MaxValue,
        reclusterMaxDepth = 2))
    assert(rep.reclusteredFiles >= 4)
    assert(planned(dir, 160000, 162000) == 1)
    // second policy pass: healthy, a no-op
    val rep2 = SnapshotTable.maintain(spark, dir,
      SnapshotTable.MaintenancePolicy(maxSmallFiles = 1000,
        keepVersions = 100, vacuumMinAgeMs = Long.MaxValue,
        reclusterMaxDepth = 2))
    assert(rep2.reclusteredFiles == 0)
  }
}
