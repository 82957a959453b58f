package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.sources.SnapshotTable

/** Manifest NDV sketches → the cost-based optimizer: tables with a
  * declared `ndvCols` layout record a per-file KMV sketch; the scan
  * merges pruned files' sketches at plan time and reports per-column
  * distinct counts through the V2 Statistics surface — join-size
  * estimation and CBO reordering run on real cardinalities instead of
  * defaults, with zero data reads. */
class NdvStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-ndv").toString
  spark.conf.set("spark.sql.catalog.graftndv",
    classOf[graft.sources.connector.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graftndv.root", root)

  /** A raw table dir with the `ndvCols` prop declared (TBLPROPERTIES
    * is the public surface; stageFiles reads the prop off the dir). */
  private def propDir(name: String): String = {
    spark.sql(s"CREATE TABLE graftndv.$name (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('ndvCols'='k')")
    s"$root/$name"
  }

  private def mergedNdv(dir: String, col: String): Option[Long] = {
    val m = SnapshotTable.readManifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir).get)
    if (!m.files.forall(_.ndv.contains(col))) return None
    val set = new java.util.TreeSet[java.lang.Long]()
    m.files.foreach(_.ndv(col).foreach { v =>
      set.add(v)
      if (set.size > SnapshotTable.NdvK) set.pollLast()
    })
    Some(graft.functions.cat.KmvSketch.estimate(set, SnapshotTable.NdvK))
  }

  test("per-file sketches from BOTH write paths merge to the true NDV") {
    // programmatic path: the ndvCols table prop drives stageFiles
    val dir = propDir("p1")
    SnapshotTable.write(spark,
      spark.range(0, 40000).select(($"id" % 1000).as("k"), $"id".as("v"))
        .repartition(8),
      dir, "overwrite", Seq("k"))
    val est = mergedNdv(dir, "k").get
    assert(math.abs(est - 1000L) <= 200,
      s"KMV estimate $est too far from true NDV 1000")
    // appends keep the sketch lifecycle: every file still covered
    SnapshotTable.write(spark,
      spark.range(0, 5000).select(($"id" % 2000).as("k"), $"id".as("v")),
      dir, "append", Seq("k"))
    val est2 = mergedNdv(dir, "k").get
    assert(math.abs(est2 - 2000L) <= 400,
      s"post-append estimate $est2 too far from true NDV 2000")

    // V2 path: PARTITIONED BY declares the layout, SQL INSERT inherits
    spark.sql("CREATE TABLE graftndv.f (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graftndv.f SELECT id % 500, id FROM range(0, 30000)")
    val est3 = mergedNdv(s"$root/f", "k").get
    assert(math.abs(est3 - 500L) <= 100,
      s"V2-write estimate $est3 too far from true NDV 500")
  }

  test("compaction and DML rewrites keep the sketches (lifecycle property)") {
    val dir = propDir("p2")
    SnapshotTable.write(spark,
      spark.range(0, 20000).select(($"id" % 300).as("k"), $"id".as("v"))
        .repartition(6),
      dir, "overwrite", Seq("k"))
    SnapshotTable.compact(spark, dir, smallRows = 1000000,
      targetRows = 1000000, statsCols = Seq("k"))
    val est = mergedNdv(dir, "k")
    assert(est.isDefined, "compaction dropped the NDV sketches")
    assert(math.abs(est.get - 300L) <= 60, s"post-compact estimate ${est.get}")
  }

  test("ndvCols default policy: bucket keys auto, identity keys opt-in") {
    // bucket(n, col) declares a JOIN key — the sketch is auto-declared
    spark.sql("CREATE TABLE graftndv.autob (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graftndv.autob SELECT id % 50, id FROM range(0, 5000)")
    assert(mergedNdv(s"$root/autob", "k").isDefined,
      "bucket key must auto-declare an NDV sketch")
    // an identity partition key (range clustering — often a date) does
    // NOT pay the measured ~1.2× staged-agg write cost by default
    spark.sql("CREATE TABLE graftndv.autoi (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO graftndv.autoi SELECT id % 50, id FROM range(0, 5000)")
    assert(mergedNdv(s"$root/autoi", "k").isEmpty,
      "identity keys must not auto-declare ndvCols")
  }

  test("SQL ANALYZE records inspectable stats and backfills NDV sketches") {
    spark.sql("CREATE TABLE graftndv.an (k BIGINT, v BIGINT, name STRING) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO graftndv.an " +
      "SELECT id % 150, id, concat('n', id % 37) FROM range(0, 15000)")
    // the identity-key default leaves k unsketched...
    assert(mergedNdv(s"$root/an", "k").isEmpty)
    // ...and ANALYZE FOR COLUMNS is the standard SQL face of opting
    // in: declares ndvCols AND backfills the existing files' sketches
    spark.sql("ANALYZE TABLE graftndv.an COMPUTE STATISTICS FOR COLUMNS k")
    val est = mergedNdv(s"$root/an", "k")
    assert(est.exists(e => math.abs(e - 150L) <= 30),
      s"backfilled estimate $est too far from true NDV 150")
    // table-level stats land where a SQL user looks
    val props = spark.sql("SHOW TBLPROPERTIES graftndv.an").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("stats.rowCount").contains("15000"), props.toString)
    assert(props.get("ndvCols").contains("k"))
    assert(props.get("stats.sizeBytes").exists(_.toLong > 0))
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graftndv.an")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("stats.rowCount"), s"DESCRIBE EXTENDED lacks stats:\n$desc")
    // FOR ALL COLUMNS sketches every stats-typed column, skips none fatally
    spark.sql("ANALYZE TABLE graftndv.an COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(mergedNdv(s"$root/an", "name").isDefined)
    // plain + NOSCAN forms both run (metadata-only)
    spark.sql("ANALYZE TABLE graftndv.an COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE graftndv.an COMPUTE STATISTICS NOSCAN")
    // the CBO sees what the properties show
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val stats = spark.table("graftndv.an").queryExecution.optimizedPlan
        .collect { case r: DataSourceV2ScanRelation => r.computeStats() }.head
      assert(stats.rowCount.contains(BigInt(15000)))
      assert(stats.attributeStats.exists(_._1.name == "k"),
        "ANALYZE-declared NDV did not reach the plan")
    }
    // appends after ANALYZE keep sketching (the prop persists)
    spark.sql("INSERT INTO graftndv.an SELECT id % 150, id, 'x' " +
      "FROM range(0, 1000)")
    assert(mergedNdv(s"$root/an", "k").isDefined,
      "post-ANALYZE appends lost the sketch lifecycle")
  }

  test("UNSET ndvCols opts a table out of the sketch cost") {
    spark.sql("CREATE TABLE graftndv.opt (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('ndvCols'='k')")
    spark.sql("INSERT INTO graftndv.opt SELECT id % 50, id FROM range(0, 5000)")
    assert(mergedNdv(s"$root/opt", "k").isDefined)
    spark.sql("ALTER TABLE graftndv.opt UNSET TBLPROPERTIES ('ndvCols')")
    spark.sql("INSERT INTO graftndv.opt SELECT id % 50, id FROM range(5000, 6000)")
    // the new files carry no sketch, so the table-level stat withdraws
    // (absent beats wrong) — and the write stopped paying for it
    assert(mergedNdv(s"$root/opt", "k").isEmpty)
  }

  test("distinct counts reach the plan's attribute statistics") {
    spark.sql("CREATE TABLE graftndv.s (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('ndvCols'='k')")
    spark.sql("INSERT INTO graftndv.s SELECT id % 200, id FROM range(0, 20000)")
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.table("graftndv.s")
      val stats = df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.computeStats()
      }.head
      assert(stats.rowCount.contains(BigInt(20000)))
      val kStat = stats.attributeStats.find(_._1.name == "k").map(_._2)
        .getOrElse(fail(s"no attribute stats for k in ${stats.attributeStats}"))
      val ndv = kStat.distinctCount.getOrElse(fail("no distinctCount"))
      assert((ndv - BigInt(200)).abs <= 40, s"plan-level NDV $ndv vs true 200")
      assert(kStat.nullCount.contains(BigInt(0)))
    }
  }

  test("CBO join estimation uses the sketches; results hash-identical") {
    // fact(200k rows, key ndv 100) ⋈ mid(40k rows) ⋈ tiny(50 rows):
    // with real NDVs the fact⋈mid intermediate is estimated huge and
    // the reorderer pushes `tiny` earlier; results must not change
    spark.sql("CREATE TABLE graftndv.fact (k BIGINT, j BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('ndvCols'='k')")
    spark.sql("INSERT INTO graftndv.fact " +
      "SELECT id % 100, id % 50, id FROM range(0, 200000)")
    spark.sql("CREATE TABLE graftndv.mid (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('ndvCols'='k')")
    spark.sql("INSERT INTO graftndv.mid SELECT id % 100, id FROM range(0, 40000)")
    spark.sql("CREATE TABLE graftndv.tiny (j BIGINT, name STRING) " +
      "PARTITIONED BY (j) TBLPROPERTIES ('ndvCols'='j')")
    spark.sql("INSERT INTO graftndv.tiny " +
      "SELECT id, concat('n', id) FROM range(0, 50)")
    val q = """SELECT f.k, count(*) AS cnt, sum(f.v) AS sv
              |FROM graftndv.fact f
              |JOIN graftndv.mid m ON f.k = m.k
              |JOIN graftndv.tiny t ON f.j = t.j
              |GROUP BY f.k""".stripMargin
    val off = spark.sql(q).collect().map(_.toSeq).toSet
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val on = spark.sql(q)
      // the estimation plumbing is live: every scan leaf reports a row
      // count and the join keys carry distinct counts
      val leaves = on.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.computeStats()
      }
      assert(leaves.size == 3 && leaves.forall(_.rowCount.isDefined))
      assert(leaves.forall(_.attributeStats.nonEmpty),
        "scan leaves lost their NDV attribute stats under CBO")
      assert(on.collect().map(_.toSeq).toSet == off,
        "CBO re-plan changed the query result")
    }
  }
}
