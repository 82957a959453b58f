package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Atomic CREATE OR REPLACE TABLE / REPLACE TABLE AS SELECT through
  * the catalog's StagingTableCatalog surface: the new definition's
  * files stage invisibly and publish as ONE manifest commit — a
  * failed statement leaves the current definition untouched, and the
  * replaced history stays time-travelable. */
class ReplaceTableSpec extends SparkTestBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-replace").toString
  spark.conf.set("spark.sql.catalog.graftrp",
    classOf[graft.sources.connector.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graftrp.root", root)

  private def tdir(name: String) = s"$root/$name"

  test("RTAS swaps the definition atomically; old versions time-travel") {
    spark.sql("CREATE TABLE graftrp.r1 AS " +
      "SELECT id AS k, id * 2 AS v, CAST(id AS STRING) AS s FROM range(0, 100)")
    assert(spark.sql("SELECT count(*) FROM graftrp.r1").as[Long].head == 100)
    val vPre = SnapshotTable.latestVersion(spark, tdir("r1")).get
    // REPLACE narrows the schema (drops s, regroups) — the union rule
    // would refuse this on a carrying commit; REPLACE may
    spark.sql("REPLACE TABLE graftrp.r1 AS " +
      "SELECT k % 10 AS slot, count(*) AS cnt FROM graftrp.r1 GROUP BY k % 10")
    val now = spark.sql("SELECT * FROM graftrp.r1").collect()
    assert(now.length == 10 && now.map(_.getLong(1)).sum == 100)
    assert(spark.table("graftrp.r1").schema.fieldNames.toSeq == Seq("slot", "cnt"))
    // the pre-replace definition still reads, schema and all
    val old = spark.sql(s"SELECT * FROM graftrp.r1 VERSION AS OF $vPre")
    assert(old.schema.fieldNames.toSeq == Seq("k", "v", "s"))
    assert(old.count() == 100)
  }

  test("failed RTAS publishes nothing: content, version, props untouched") {
    spark.sql("CREATE TABLE graftrp.r2 AS " +
      "SELECT id AS k, id * 3 AS v FROM range(0, 50)")
    val vPre = SnapshotTable.latestVersion(spark, tdir("r2")).get
    val sumPre = spark.sql("SELECT sum(v) FROM graftrp.r2").as[Long].head
    val ex = intercept[Exception](spark.sql(
      "REPLACE TABLE graftrp.r2 AS " +
        "SELECT k, CASE WHEN v >= 0 THEN raise_error('boom') ELSE v END AS v " +
        "FROM graftrp.r2").collect())
    assert(ex.getMessage != null)
    assert(SnapshotTable.latestVersion(spark, tdir("r2")).get == vPre)
    assert(spark.sql("SELECT sum(v) FROM graftrp.r2").as[Long].head == sumPre)
    // the aborted statement's staged files were deleted, not orphaned:
    // every file under data/ is referenced by some retained version
    val referenced = SnapshotTable.versions(spark, tdir("r2"))
      .flatMap(v => SnapshotTable.readManifest(spark, tdir("r2"), v)
        .files.map(_.path)).toSet
    val dd = new org.apache.hadoop.fs.Path(tdir("r2"), "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(dd).map(st => s"data/${st.getPath.getName}").toSet
    assert(onDisk.subsetOf(referenced),
      s"aborted RTAS left orphans: ${(onDisk -- referenced).mkString(", ")}")
  }

  test("REPLACE TABLE without AS SELECT: empty redefinition, new layout applies") {
    spark.sql("CREATE TABLE graftrp.r3 AS SELECT id AS k, id AS v FROM range(0, 30)")
    spark.sql("REPLACE TABLE graftrp.r3 (k BIGINT, label STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    assert(spark.sql("SELECT count(*) FROM graftrp.r3").as[Long].head == 0)
    assert(spark.table("graftrp.r3").schema.fieldNames.toSeq == Seq("k", "label"))
    // the NEW layout governs writes from the first insert
    spark.sql("INSERT INTO graftrp.r3 " +
      "SELECT id, CAST(id AS STRING) AS label FROM range(0, 400)")
    val m = SnapshotTable.readManifest(spark, tdir("r3"),
      SnapshotTable.latestVersion(spark, tdir("r3")).get)
    assert(m.files.nonEmpty && m.files.forall(fe =>
      fe.bucket.isDefined && fe.bucketN.contains(4)),
      s"insert after REPLACE ignored the new bucket layout: ${m.files}")
  }

  test("REPLACE layout change replaces the old props, never unions them") {
    spark.sql("CREATE TABLE graftrp.r4 (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO graftrp.r4 SELECT id % 50, id FROM range(0, 500)")
    spark.sql("CREATE OR REPLACE TABLE graftrp.r4 AS " +
      "SELECT k, sum(v) AS sv FROM graftrp.r4 GROUP BY k")
    // the bucket(8) definition died with the replace: no bucket claim
    val props = spark.sql("SHOW TBLPROPERTIES graftrp.r4").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props.contains("bucketBy") && !props.contains("buckets"),
      s"replaced table still carries the old layout: $props")
    assert(spark.sql("SELECT count(*) FROM graftrp.r4").as[Long].head == 50)
  }

  test("REPLACE on a missing table refuses; CREATE OR REPLACE creates") {
    intercept[Exception](spark.sql(
      "REPLACE TABLE graftrp.ghost AS SELECT 1 AS x"))
    spark.sql("CREATE OR REPLACE TABLE graftrp.r5 AS " +
      "SELECT id AS k FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) FROM graftrp.r5").as[Long].head == 7)
  }

  test("a commit racing a staged REPLACE conflicts; the racer survives") {
    spark.sql("CREATE TABLE graftrp.r7 AS SELECT id AS k FROM range(0, 10)")
    val cat = spark.sessionState.catalogManager.catalog("graftrp")
      .asInstanceOf[graft.sources.connector.GraftCatalog]
    val staged = cat.stageReplace(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "r7"),
      new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.LongType),
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      java.util.Collections.emptyMap[String, String]())
    // a concurrent append lands between stage and publish — REPLACE
    // replaces what the statement SAW, never a racer's work
    SnapshotTable.write(spark, spark.range(10, 20).toDF("k"),
      tdir("r7"), "append", Nil)
    intercept[Exception](staged.commitStagedChanges())
    assert(spark.sql("SELECT count(*) FROM graftrp.r7").as[Long].head == 20)
  }

  test("failed atomic CTAS leaves no table behind") {
    intercept[Exception](spark.sql(
      "CREATE TABLE graftrp.r6 AS " +
        "SELECT CASE WHEN id >= 0 THEN raise_error('boom') ELSE id END AS k " +
        "FROM range(0, 10)").collect())
    assert(!spark.catalog.tableExists("graftrp.r6") ||
      SnapshotTable.latestVersion(spark, tdir("r6")).isEmpty)
  }
}
