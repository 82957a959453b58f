package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Dynamic partition overwrite (round-18, closing the r17 advice
  * finding): with `partitioning()` reported for SHOW CREATE TABLE,
  * `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` resolves
  * to `OverwritePartitionsDynamic` — which previously failed at
  * analysis. The builder now implements SupportsDynamicOverwrite:
  * replace exactly the identity-partition values present in the
  * incoming data, as ONE atomic eq-delete + append commit with zero
  * data files rewritten; tables without identity columns keep the
  * pre-r18 truncate-overwrite semantics (Hive's view: buckets are
  * layout, not partitions). */
class DynamicOverwriteSpec extends SparkTestBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-dynow").toString
  spark.conf.set("spark.sql.catalog.graftdyn",
    classOf[graft.sources.connector.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graftdyn.root", root)

  private def manifest(dir: String) = SnapshotTable.readManifest(spark, dir,
    SnapshotTable.latestVersion(spark, dir).get)

  private def dynMode[A](body: => A): A =
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic")(body)

  test("SQL INSERT OVERWRITE (dynamic) replaces only the incoming partitions") {
    spark.sql("CREATE TABLE graftdyn.t (k BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.t " +
      "SELECT id, concat('d', CAST(id % 3 AS STRING)), CAST(id AS DOUBLE) " +
      "FROM range(0, 300)")
    val vBefore = SnapshotTable.latestVersion(spark, s"$root/t").get
    val filesBefore = manifest(s"$root/t").files.map(_.path).toSet
    // the r17 regression shape: this failed at analysis ("table does
    // not support dynamic overwrite") once partitioning() was reported
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.t " +
        "SELECT id + 1000, 'd1', CAST(-1.0 AS DOUBLE) FROM range(0, 50)")
    }
    // d0 and d2 intact, d1 replaced by the 50 new rows
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.t WHERE day = 'd0'")
      .as[Long].head == 100L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.t WHERE day = 'd2'")
      .as[Long].head == 100L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.t WHERE day = 'd1'")
      .as[Long].head == 50L)
    assert(spark.sql("SELECT min(v) AS m FROM graftdyn.t WHERE day = 'd1'")
      .as[Double].head == -1.0)
    // ONE commit, zero pre-existing data files rewritten (sidecar +
    // append — the eq-CDC cost class, not a partition rewrite)
    assert(SnapshotTable.latestVersion(spark, s"$root/t").get == vBefore + 1,
      "dynamic overwrite must be one atomic commit")
    assert(filesBefore.subsetOf(manifest(s"$root/t").files.map(_.path).toSet),
      "dynamic overwrite rewrote a pre-existing data file")
    // time travel: the pre-overwrite d1 rows still read
    assert(spark.read.format("graft_snapshot")
      .option("versionAsOf", vBefore.toString).load(s"$root/t")
      .filter($"day" === "d1").count() == 100L)
  }

  test("static mode keeps the whole-table truncate-overwrite") {
    spark.sql("CREATE TABLE graftdyn.s (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.s " +
      "SELECT id, concat('d', CAST(id % 3 AS STRING)) FROM range(0, 90)")
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "static") {
      spark.sql("INSERT OVERWRITE graftdyn.s SELECT id, 'd1' FROM range(0, 5)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.s").as[Long].head == 5L)
  }

  test("dynamic on an unpartitioned or bucket-only table = full overwrite") {
    // unpartitioned: Hive semantics (and the pre-r18 behavior)
    spark.sql("CREATE TABLE graftdyn.u (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftdyn.u SELECT id, 'old' FROM range(0, 100)")
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.u SELECT id, 'new' FROM range(0, 10)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.u").as[Long].head == 10L)
    // bucket-only: buckets are file layout, not partition identity —
    // a non-partitioned Hive table CLUSTERED INTO BUCKETS overwrites whole
    spark.sql("CREATE TABLE graftdyn.b (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graftdyn.b SELECT id, 'old' FROM range(0, 100)")
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.b SELECT id, 'new' FROM range(0, 10)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.b").as[Long].head == 10L)
    // and the bucket layout survives the overwrite
    assert(manifest(s"$root/b").files.forall(_.bucketN.contains(4)))
  }

  test("writeTo(...).overwritePartitions() drives the same path") {
    spark.sql("CREATE TABLE graftdyn.w (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.w " +
      "SELECT id, concat('d', CAST(id % 2 AS STRING)) FROM range(0, 100)")
    spark.range(0, 7).select($"id".as("k"), lit("d0").as("day"))
      .writeTo("graftdyn.w").overwritePartitions()
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.w WHERE day = 'd0'")
      .as[Long].head == 7L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.w WHERE day = 'd1'")
      .as[Long].head == 50L)
  }

  test("multi-column identity, file pruning, and the null-partition caveat") {
    spark.sql("CREATE TABLE graftdyn.m (k BIGINT, region STRING, day STRING) " +
      "PARTITIONED BY (region, day)")
    spark.sql("INSERT INTO graftdyn.m " +
      "SELECT id, concat('r', CAST(id % 2 AS STRING)), " +
      "concat('d', CAST(id % 5 AS STRING)) FROM range(0, 1000)")
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.m SELECT id, 'r0', 'd3' " +
        "FROM range(0, 9)")
    }
    // exactly the (r0, d3) tuple replaced; (r1, d3) and (r0, d4) intact
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.m " +
      "WHERE region = 'r0' AND day = 'd3'").as[Long].head == 9L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.m " +
      "WHERE region = 'r1' AND day = 'd3'").as[Long].head == 100L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.m " +
      "WHERE region = 'r0' AND day = 'd4'").as[Long].head == 100L)
    // a NULL identity member appends without replacing (SQL equality
    // never matches null) — the documented divergence from Hive's
    // __HIVE_DEFAULT_PARTITION__
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.m " +
        "SELECT id + 5000, CAST(NULL AS STRING), 'dx' FROM range(0, 3)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.m " +
      "WHERE region IS NULL").as[Long].head == 3L)
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.m " +
        "SELECT id + 6000, CAST(NULL AS STRING), 'dx' FROM range(0, 2)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.m " +
      "WHERE region IS NULL").as[Long].head == 5L,
      "null identity tuples must append, not replace")
  }

  test("REPLACE WHERE: static partition-spec overwrite and writeTo.overwrite(cond)") {
    // round-18: OVERWRITE_BY_FILTER — delete the predicate's rows
    // (metadata prune + dv boundary scan) and insert the batch as ONE
    // atomic commit (Delta's replaceWhere, SnapshotTable.replaceWhere)
    spark.sql("CREATE TABLE graftdyn.rw (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.rw " +
      "SELECT id, concat('d', CAST(id % 3 AS STRING)) FROM range(0, 300)")
    val vBefore = SnapshotTable.latestVersion(spark, s"$root/rw").get
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "static") {
      // the static partition-spec shape: OverwriteByExpression(day='d1')
      spark.sql("INSERT OVERWRITE graftdyn.rw PARTITION (day = 'd1') " +
        "SELECT id + 5000 FROM range(0, 20)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rw WHERE day = 'd1'")
      .as[Long].head == 20L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rw WHERE day = 'd0'")
      .as[Long].head == 100L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rw WHERE day = 'd2'")
      .as[Long].head == 100L)
    assert(SnapshotTable.latestVersion(spark, s"$root/rw").get == vBefore + 1,
      "replace-where must be one atomic commit")
    // time travel: the pre-replace d1 rows still read
    assert(spark.read.format("graft_snapshot")
      .option("versionAsOf", vBefore.toString).load(s"$root/rw")
      .filter($"day" === "d1").count() == 100L)
    // writeTo(...).overwrite(cond) drives the same path
    spark.range(0, 7)
      .select(($"id" + 9000).as("k"), lit("d0").as("day"))
      .writeTo("graftdyn.rw").overwrite($"day" === "d0")
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rw WHERE day = 'd0'")
      .as[Long].head == 7L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rw WHERE day = 'd2'")
      .as[Long].head == 100L)
    // overwrite(lit(true)) IS a truncate — full replace, no dv scan
    spark.range(0, 3).select($"id".as("k"), lit("dz").as("day"))
      .writeTo("graftdyn.rw").overwrite(lit(true))
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rw").as[Long].head == 3L)
  }

  test("REPLACE WHERE prunes proven files metadata-only on a clustered key") {
    // an integral clusterBy key: files whose (min,max) PROVE every row
    // matches are dropped from the manifest whole — no scan, no dv
    // sidecar (the retention-restatement shape at 100 TB)
    spark.sql("CREATE TABLE graftdyn.rp (k BIGINT, d BIGINT) " +
      "PARTITIONED BY (d) TBLPROPERTIES ('statsCols' = 'd,k')")
    // one INSERT per d value: every file is d-PURE by construction
    // (range partitioning could legally co-locate two small d values
    // in one file, which would legitimately dv-scan as a boundary)
    (0 until 4).foreach { d =>
      spark.sql(s"INSERT INTO graftdyn.rp SELECT id, CAST($d AS BIGINT) FROM " +
        s"range(${d * 100}, ${d * 100 + 100})")
    }
    val m0 = manifest(s"$root/rp")
    // d-pure files exist (identity clustering range-partitions by d)
    assert(m0.files.exists(fe => fe.stats.get("d").exists(s => s._1 == s._2)))
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "static") {
      spark.sql("INSERT OVERWRITE graftdyn.rp PARTITION (d = 2) " +
        "SELECT id + 7000 FROM range(0, 5)")
    }
    val m1 = manifest(s"$root/rp")
    // no deletion vector anywhere: the d=2 files were PROVEN and
    // dropped whole; other files ride through untouched
    assert(m1.files.forall(_.dv.isEmpty),
      "proven-partition replace must not write a deletion vector")
    assert(m0.files.filter(fe => fe.stats.get("d").exists(s =>
      !(s._1 <= 2 && 2 <= s._2))).forall(m1.files.contains),
      "files refuting the predicate must ride through verbatim")
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rp WHERE d = 2")
      .as[Long].head == 5L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rp").as[Long].head
      == 305L)
  }

  test("DATE identity: dynamic overwrite works (days-canonical eq keys)") {
    // round-18: DATE joined the equality-delete key surface (canonical
    // form = days-since-epoch, the parquet INT32's own coordinate), so
    // the MOST COMMON partition shape — a date-partitioned fact —
    // dynamic-overwrites like any other
    spark.sql("CREATE TABLE graftdyn.dt (k BIGINT, day DATE) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.dt SELECT id, " +
      "DATE_ADD(DATE'2024-01-01', CAST(id % 3 AS INT)) FROM range(0, 90)")
    val vBefore = SnapshotTable.latestVersion(spark, s"$root/dt").get
    val filesBefore = manifest(s"$root/dt").files.map(_.path).toSet
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.dt " +
        "SELECT id + 500, DATE'2024-01-02' FROM range(0, 5)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.dt " +
      "WHERE day = DATE'2024-01-02'").as[Long].head == 5L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.dt " +
      "WHERE day = DATE'2024-01-01'").as[Long].head == 30L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.dt " +
      "WHERE day = DATE'2024-01-03'").as[Long].head == 30L)
    assert(SnapshotTable.latestVersion(spark, s"$root/dt").get == vBefore + 1)
    assert(filesBefore.subsetOf(manifest(s"$root/dt").files.map(_.path).toSet))
    // the fold leaves content fixed (days-canonical masking agreed
    // across reader families before the fold)
    SnapshotTable.purgeDeletes(spark, s"$root/dt")
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.dt").as[Long].head
      == 65L)
    // static partition-spec REPLACE WHERE on dates still works too
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "static") {
      spark.sql("INSERT OVERWRITE graftdyn.dt PARTITION (day = '2024-01-03') " +
        "SELECT id + 900 FROM range(0, 4)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.dt").as[Long].head
      == 39L)
    // a genuinely-unsupported identity type (timestamp) still refuses
    // EARLY, naming the workaround
    spark.sql("CREATE TABLE graftdyn.ts (k BIGINT, at TIMESTAMP) " +
      "PARTITIONED BY (at)")
    spark.sql("INSERT INTO graftdyn.ts SELECT id, " +
      "TIMESTAMP'2024-01-01 00:00:00' FROM range(0, 10)")
    val vTs = SnapshotTable.latestVersion(spark, s"$root/ts").get
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      dynMode {
        spark.sql("INSERT OVERWRITE graftdyn.ts " +
          "SELECT id + 500, TIMESTAMP'2024-01-01 00:00:00' FROM range(0, 5)")
      }
    }
    assert(msgs(e).exists(_.contains("REPLACE WHERE")),
      s"refusal must name the workaround: ${msgs(e)}")
    assert(SnapshotTable.latestVersion(spark, s"$root/ts").get == vTs,
      "the refused write must not commit")
  }

  test("replaceWhereValidate: an out-of-predicate batch refuses before committing") {
    // opt-in (Delta's replaceWhere constraint check): without it,
    // Spark's OverwriteByExpression contract lets a restatement batch
    // carry rows OUTSIDE the predicate — they append while the old
    // out-of-predicate rows survive (surprising double data). The
    // TBLPROPERTY declares it once; writer options inherit it.
    spark.sql("CREATE TABLE graftdyn.rv (k BIGINT, day STRING) " +
      "PARTITIONED BY (day) " +
      "TBLPROPERTIES ('replaceWhereValidate' = 'true')")
    spark.sql("INSERT INTO graftdyn.rv " +
      "SELECT id, concat('d', CAST(id % 2 AS STRING)) FROM range(0, 100)")
    val vBefore = SnapshotTable.latestVersion(spark, s"$root/rv").get
    val e = intercept[Exception] {
      Seq((1L, "d0"), (2L, "d1")).toDF("k", "day")
        .writeTo("graftdyn.rv").overwrite($"day" === "d0")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("replaceWhere validation")),
      s"wrong failure: ${msgs(e)}")
    assert(SnapshotTable.latestVersion(spark, s"$root/rv").get == vBefore,
      "a refused replace must commit NOTHING")
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rv")
      .as[Long].head == 100L)
    // a compliant batch passes under the same property
    Seq((7L, "d0")).toDF("k", "day")
      .writeTo("graftdyn.rv").overwrite($"day" === "d0")
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rv WHERE day = 'd0'")
      .as[Long].head == 1L)
    // without the knob, the same violating write takes Spark's
    // unvalidated semantics: d0 replaced, the d1 batch row appends,
    // old d1 rows survive
    spark.sql("CREATE TABLE graftdyn.rv2 (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.rv2 " +
      "SELECT id, concat('d', CAST(id % 2 AS STRING)) FROM range(0, 100)")
    Seq((1L, "d0"), (2L, "d1")).toDF("k", "day")
      .writeTo("graftdyn.rv2").overwrite($"day" === "d0")
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rv2 WHERE day = 'd0'")
      .as[Long].head == 1L)
    assert(spark.sql("SELECT count(*) AS n FROM graftdyn.rv2 WHERE day = 'd1'")
      .as[Long].head == 51L)
  }

  test("dynamic overwrite composes with maintenance: purge folds, content fixed") {
    spark.sql("CREATE TABLE graftdyn.p (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftdyn.p " +
      "SELECT id, concat('d', CAST(id % 4 AS STRING)) FROM range(0, 400)")
    dynMode {
      spark.sql("INSERT OVERWRITE graftdyn.p SELECT id, 'd2' FROM range(0, 11)")
    }
    val before = spark.sql("SELECT * FROM graftdyn.p").collect()
      .map(_.toSeq).toSet
    assert(manifest(s"$root/p").files.exists(_.eqDv.nonEmpty),
      "dynamic overwrite should land as pending eq refs")
    SnapshotTable.purgeDeletes(spark, s"$root/p")
    assert(manifest(s"$root/p").files.forall(_.eqDv.isEmpty))
    assert(spark.sql("SELECT * FROM graftdyn.p").collect()
      .map(_.toSeq).toSet == before)
  }
}
