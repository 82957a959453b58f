package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.sources.connector.SnapshotScan

/** String zone maps: truncated (lower, upper) bounds per (file,
  * string column) in UTF8 binary order — what lets range predicates
  * over string keys (doc ids, URLs, ULIDs) prune files exactly like
  * integral (min,max) stats, and what widens metadata-only deletes to
  * string-clustered tables. The bounds are parquet/Iceberg
  * truncate(16): lower is a prefix of the true min (≤ it), upper is
  * the truncated-increment of the true max (≥ it) — sound under any
  * truncation. */
class StringStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-sstats").toString

  private def load(dir: String): DataFrame =
    spark.read.format("graft_snapshot").load(dir)

  private def scanOf(df: DataFrame): SnapshotScan = {
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(scans.size == 1)
    scans.head.asInstanceOf[SnapshotScan]
  }

  private def manifest(dir: String) =
    SnapshotTable.readManifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir).get)

  /** 8 range-clustered files over zero-padded string keys k000..k799. */
  private def build(dir: String): Unit =
    SnapshotTable.write(spark,
      spark.range(0, 800)
        .select(format_string("k%03d", $"id").as("key"), $"id".as("v"))
        .repartitionByRange(8, $"key"),
      dir, "overwrite", Seq("key"))

  test("bound helpers: prefix lower, incremented upper, UTF8 order") {
    import SnapshotTable.{strLowerBound, strUpperBound, strCmp}
    // short strings are their own exact bounds
    assert(strLowerBound("abc") == "abc" && strUpperBound("abc").contains("abc"))
    // long strings: 16-cp prefix lower, bumped-prefix upper
    val long = "a" * 20
    assert(strLowerBound(long) == "a" * 16)
    assert(strUpperBound(long).contains("a" * 15 + "b"))
    // the bounds really bound, in UTF8 binary order
    for (v <- Seq(long, "z" + "y" * 30, "née café crème brûlée",
                  "😀emoji😀padding😀padding😀", "ctrl" + "x" * 20)) {
      assert(strCmp(strLowerBound(v), v) <= 0, s"lower !<= $v")
      assert(strUpperBound(v).forall(u => strCmp(u, v) >= 0), s"upper !>= $v")
    }
    // incrementing must skip the surrogate gap
    val edge = "x" * 15 + "퟿" + "tail-beyond-sixteen"
    assert(strUpperBound(edge).contains("x" * 15 + ""))
  }

  test("string range predicates prune files at planning time") {
    val dir = freshDir()
    build(dir)
    assert(manifest(dir).files.forall(_.strStats.contains("key")))
    val one = load(dir).filter($"key" < "k100")
    assert(scanOf(one).planInputPartitions().length == 1)
    assert(one.count() == 100)
    val mid = load(dir).filter($"key" >= "k300" && $"key" < "k500")
    assert(scanOf(mid).planInputPartitions().length <= 3)
    assert(mid.count() == 200)
    // equality prunes by zone map AND bloom together
    val pt = load(dir).filter($"key" === "k555")
    assert(scanOf(pt).planInputPartitions().length == 1)
    assert(pt.count() == 1)
    // a miss OUTSIDE every range plans zero files
    assert(scanOf(load(dir).filter($"key" === "zzz"))
      .planInputPartitions().isEmpty)
  }

  test("metadata-only DELETE on a string-clustered table") {
    val dir = freshDir()
    build(dir)
    SnapshotTable.deleteVectors(spark, dir, $"key" < "k400")
    val m = manifest(dir)
    assert(m.op == "delete-prune", s"got ${m.op}")
    assert(m.files.forall(_.dv.isEmpty))
    assert(load(dir).count() == 400)
    assert(load(dir).agg(min($"key")).as[String].head == "k400")
  }

  test("truncated bounds stay conservative: shared 20-char prefixes") {
    val dir = freshDir()
    // every key shares a 20-char prefix; the 16-cp zone map cannot
    // distinguish them — pruning must keep files, never drop rows
    val p = "prefix-prefix-prefix-"
    SnapshotTable.write(spark,
      spark.range(0, 400)
        .select(concat(lit(p), format_string("%03d", $"id")).as("key"),
          $"id".as("v"))
        .repartitionByRange(4, $"key"),
      dir, "overwrite", Seq("key"))
    val hit = load(dir).filter($"key" === (p + "123"))
    assert(hit.count() == 1) // correct despite useless zone maps
    // range read stays correct too
    assert(load(dir).filter($"key" >= (p + "100") && $"key" < (p + "200"))
      .count() == 100)
    // and a DELETE cannot prove full-file coverage through the shared
    // prefix — it must fall to the scan, not silently drop files
    SnapshotTable.deleteVectors(spark, dir, $"key" < (p + "200"))
    assert(load(dir).count() == 200)
  }

  test("dv-merge match scan prunes string-keyed candidates") {
    val dir = freshDir()
    build(dir) // 8 range files over k000..k799
    val updates = spark.range(750, 760)
      .select(format_string("k%03d", $"id").as("key"), lit(-1L).as("v"))
      .cache()
    updates.count() // materialize outside the measured window
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SnapshotTable.mergeVectors(spark, dir, updates, "key", Seq("key"))
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(
        spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    updates.unpersist()
    // one candidate file (100 rows) + the 10-row write-back; an
    // unpruned match scan reads all 800
    assert(recordsRead.get() < 500,
      s"string-keyed merge read ${recordsRead.get()} records — zone-map " +
        "candidate pruning is not limiting the scan")
    assert(load(dir).count() == 800)
    assert(load(dir).filter($"v" === -1L).count() == 10)
  }

  test("SQL: string identity partition gets zone maps via layout props") {
    val root = Files.createTempDirectory("graft-sscat").toString
    spark.conf.set("spark.sql.catalog.graftss",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftss.root", root)
    spark.sql("CREATE TABLE graftss.t (key STRING NOT NULL, v BIGINT) " +
      "PARTITIONED BY (key) TBLPROPERTIES ('clusterPartitions'='8')")
    spark.sql("INSERT INTO graftss.t " +
      "SELECT format_string('k%03d', id), id FROM range(0, 800)")
    val m = manifest(s"$root/t")
    assert(m.files.forall(_.strStats.nonEmpty))
    // range scan prunes; retention delete is metadata-only
    val q = spark.sql("SELECT count(*) FROM graftss.t WHERE key < 'k100'")
    assert(q.as[Long].head == 100)
    spark.sql("DELETE FROM graftss.t WHERE key < 'k400'")
    val m2 = manifest(s"$root/t")
    assert(m2.op == "delete-prune", s"got ${m2.op}")
    assert(spark.sql("SELECT count(*) FROM graftss.t").as[Long].head == 400)
    // the files metadata table exposes the evidence columns
    val row = spark.sql("SELECT no_nulls, str_stats FROM graftss.t.files " +
      "ORDER BY path LIMIT 1").collect().head
    assert(row.getSeq[String](0).contains("key"))
    assert(row.getMap[String, scala.collection.Seq[String]](1)
      .get("key").exists(_.size == 2))
  }
}
