package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Named refs (tags) and zero-copy clones over the snapshot table:
  * tags address versions by name (`VERSION AS OF 'rel'`) and PIN them
  * through vacuum; a shallow clone registers a new table over the
  * source's files in O(metadata), with an auto tag on the source
  * making the share vacuum-safe. */
class RefsCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-refs").toString

  private def load(dir: String): DataFrame =
    spark.read.format("graft_snapshot").load(dir)

  private def dataFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, "data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** v1 = 100 rows in 4 files; then two 10-row appends → v2, v3. */
  private def buildVersions(dir: String): Unit = {
    SnapshotTable.write(spark,
      spark.range(0, 100).select($"id", ($"id" * 2).as("v"))
        .repartitionByRange(4, $"id"),
      dir, "overwrite", Seq("id"))
    SnapshotTable.write(spark,
      spark.range(100, 110).select($"id", ($"id" * 2).as("v")),
      dir, "append", Seq("id"))
    SnapshotTable.write(spark,
      spark.range(110, 120).select($"id", ($"id" * 2).as("v")),
      dir, "append", Seq("id"))
  }

  test("tags: create-only publish, list, resolve by token, drop") {
    val dir = freshDir()
    buildVersions(dir)
    assert(SnapshotTable.createTag(spark, dir, "rel-1", Some(2)) == 2)
    assert(SnapshotTable.createTag(spark, dir, "tip") == 3) // default: current
    assert(SnapshotTable.listTags(spark, dir).map(t => t.name -> t.version) ==
      Seq("rel-1" -> 2L, "tip" -> 3L))
    assert(SnapshotTable.resolveVersionToken(spark, dir, "rel-1") == 2)
    assert(SnapshotTable.resolveVersionToken(spark, dir, "2") == 2)
    intercept[IllegalArgumentException](
      SnapshotTable.resolveVersionToken(spark, dir, "nope"))
    // create-only: re-pointing takes an explicit drop
    intercept[IllegalStateException](
      SnapshotTable.createTag(spark, dir, "rel-1", Some(3)))
    intercept[IllegalArgumentException](
      SnapshotTable.createTag(spark, dir, "bad name!"))
    intercept[IllegalArgumentException](
      SnapshotTable.createTag(spark, dir, "ghost", Some(99)))
    // option-based read resolves the tag like a version number
    assert(load(dir).count() == 120)
    assert(spark.read.format("graft_snapshot")
      .option("versionAsOf", "rel-1").load(dir).count() == 110)
    assert(SnapshotTable.dropTag(spark, dir, "rel-1"))
    assert(!SnapshotTable.dropTag(spark, dir, "rel-1"))
    assert(SnapshotTable.listTags(spark, dir).map(_.name) == Seq("tip"))
  }

  test("vacuum retains tagged versions until the tag drops") {
    val dir = freshDir()
    buildVersions(dir) // v1..v3; v2/v3 are deltas
    SnapshotTable.createTag(spark, dir, "pinned", Some(2))
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minAgeMs = 0)
    // v2 survives the count horizon (manifest promoted to a side
    // checkpoint so its delta fold no longer needs the dropped v1)
    assert(SnapshotTable.versions(spark, dir) == Seq(2L, 3L))
    assert(SnapshotTable.scan(spark, dir, Some(2)).count() == 110)
    assert(SnapshotTable.scan(spark, dir, Some(2))
      .agg(sum($"v")).as[Long].head ==
      (0L until 110).map(_ * 2).sum)
    // ...and its data files were NOT reclaimed
    assert(load(dir).count() == 120)
    // dropping the tag re-enters normal retention: the next sweep
    // expires the version and reclaims its now-unreferenced files
    val before = dataFiles(dir).size
    SnapshotTable.dropTag(spark, dir, "pinned")
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minAgeMs = 0)
    assert(SnapshotTable.versions(spark, dir) == Seq(3L))
    assert(dataFiles(dir).size <= before) // v2's unshared files swept
    assert(load(dir).count() == 120) // current version intact
  }

  test("shallow clone: O(metadata) registration, full table from v1") {
    val src = freshDir()
    val dst = freshDir() + "/dev"
    buildVersions(src)
    SnapshotTable.cloneTable(spark, src, dst)
    // zero bytes copied: the clone's own data/ holds nothing
    assert(dataFiles(dst).isEmpty)
    assert(load(dst).collect().map(_.toSeq).toSet ==
      load(src).collect().map(_.toSeq).toSet)
    // the clone is a real table: DML works and never touches the source
    val srcFiles = dataFiles(src).toSet
    SnapshotTable.deleteVectors(spark, dst, $"id" < 10)
    assert(load(dst).count() == 110)
    assert(load(src).count() == 120)
    // an append lands under the CLONE's root (copy-on-write locality)
    SnapshotTable.write(spark,
      spark.range(1000, 1005).select($"id", ($"id" * 2).as("v")),
      dst, "append", Seq("id"))
    assert(load(dst).count() == 115)
    assert(dataFiles(dst).nonEmpty)
    assert(dataFiles(src).toSet == srcFiles)
    // the clone has its own history: v1 is the pristine cloned state
    assert(SnapshotTable.scan(spark, dst, Some(1)).count() == 120)
    // a target that already holds a table is refused
    intercept[IllegalArgumentException](
      SnapshotTable.cloneTable(spark, src, dst))
  }

  test("shallow clone survives source overwrite + vacuum via the auto tag") {
    val src = freshDir()
    val dst = freshDir() + "/snapshot"
    buildVersions(src)
    SnapshotTable.cloneTable(spark, src, dst) // pins src v3
    val tag = SnapshotTable.listTags(spark, src)
    // tag name = clone-<basename>-<digest of qualified target>, so two
    // targets sharing a basename can never re-point each other's pin
    assert(tag.size == 1 && tag.head.version == 3L &&
      tag.head.name.startsWith("clone-snapshot-"))
    // the source moves on: full overwrite, then an aggressive vacuum
    SnapshotTable.write(spark,
      spark.range(0, 5).select($"id", lit(-1L).as("v")),
      src, "overwrite", Seq("id"))
    SnapshotTable.vacuum(spark, src, keepVersions = 1, minAgeMs = 0)
    // the tagged version (and its files) survived — the clone still reads
    assert(load(dst).count() == 120)
    assert(load(src).count() == 5)
    // the pin is load-bearing: drop it, vacuum again, and the shared
    // bytes are reclaimed (the documented way to break a clone —
    // an explicit act, never a background sweep)
    SnapshotTable.dropTag(spark, src, tag.head.name)
    SnapshotTable.vacuum(spark, src, keepVersions = 1, minAgeMs = 0)
    // count() alone is served metadata-only; force a data read
    intercept[Exception](load(dst).agg(sum($"v")).collect())
  }

  test("deep clone copies the bytes and is fully independent") {
    val src = freshDir()
    val dst = freshDir() + "/full"
    buildVersions(src)
    SnapshotTable.cloneTable(spark, src, dst, deep = true)
    assert(dataFiles(dst).size == dataFiles(src).size)
    assert(SnapshotTable.listTags(spark, src).isEmpty) // no pin needed
    val expected = load(src).collect().map(_.toSeq).toSet
    // obliterate the source; the deep clone is unaffected
    val p = new org.apache.hadoop.fs.Path(src)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    assert(load(dst).collect().map(_.toSeq).toSet == expected)
  }

  test("clone of a dv-carrying version reads the masked rows") {
    val src = freshDir()
    val dst = freshDir() + "/masked"
    buildVersions(src)
    SnapshotTable.deleteVectors(spark, src, $"id" % 10 === 0) // 12 rows
    SnapshotTable.cloneTable(spark, src, dst)
    assert(load(dst).count() == 108)
    assert(load(dst).filter($"id" % 10 === 0).count() == 0)
  }

  test("timestampAsOf option: epoch-ms and date forms, exclusive with versionAsOf") {
    val dir = freshDir()
    buildVersions(dir)
    val t2 = SnapshotTable.readManifest(spark, dir, 2).ts
    assert(spark.read.format("graft_snapshot")
      .option("timestampAsOf", t2.toString).load(dir).count() == 110)
    // beyond the newest publish instant → current version
    assert(spark.read.format("graft_snapshot")
      .option("timestampAsOf", (t2 + 3600000L).toString).load(dir)
      .count() == 120)
    intercept[Exception](spark.read.format("graft_snapshot")
      .option("timestampAsOf", "1970-01-01").load(dir).count())
    intercept[IllegalArgumentException](spark.read.format("graft_snapshot")
      .option("timestampAsOf", t2.toString).option("versionAsOf", "2")
      .load(dir).count())
  }

  test("stream/feed start tokens: tag names and timestamps") {
    val dir = freshDir()
    buildVersions(dir) // v1: 100 rows, v2: +10, v3: +10
    SnapshotTable.createTag(spark, dir, "mid", Some(2))
    // batch change feed: the version range accepts TAG tokens
    val feed = spark.read.format("graft_snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "mid").load(dir)
    assert(feed.count() == 20) // v2 + v3 appends
    val t2 = SnapshotTable.readManifest(spark, dir, 2).ts
    assert(SnapshotTable.readManifest(spark, dir, 3).ts > t2)
    // ...and timestamp bounds resolve to the version current at the instant
    val feed2 = spark.read.format("graft_snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2")
      .option("endingTimestamp", t2.toString).load(dir)
    assert(feed2.count() == 10)
    // table STREAM from a timestamp: replays v2 and v3 only
    val out = Files.createTempDirectory("graft-stok").toString
    val ckpt = Files.createTempDirectory("graft-stokc").toString
    val q = spark.readStream.format("graft_snapshot")
      .option("startingTimestamp", t2.toString).load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 20)
    // both tokens on one end → loud error, never a silent pick
    intercept[Exception](spark.read.format("graft_snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2")
      .option("startingTimestamp", t2.toString).load(dir).count())
  }

  test("SQL surface: CALL create_tag/clone, VERSION AS OF tag, refs table, SPJ") {
    val root = Files.createTempDirectory("graft-refcat").toString
    spark.conf.set("spark.sql.catalog.graftrc",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftrc.root", root)
    spark.sql("CREATE TABLE graftrc.facts (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graftrc.facts SELECT id % 100, id FROM range(0, 2000)")
    spark.sql("INSERT INTO graftrc.facts SELECT id % 100, id FROM range(2000, 2500)")
    // CREATE TABLE commits v1 (empty); the inserts are v2 and v3
    val pin = spark.sql("CALL graftrc.system.create_tag('facts', 'audited', 2)")
      .collect().head.getLong(0)
    assert(pin == 2L)
    assert(spark.sql("SELECT count(*) FROM graftrc.facts VERSION AS OF 'audited'")
      .as[Long].head == 2000L)
    // refs metadata table
    val refs = spark.sql("SELECT name, version FROM graftrc.facts.refs")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(refs.toSeq == Seq("audited" -> 2L))
    // zero-copy clone via CALL; bucket layout travels with it
    val cloned = spark.sql(
      "CALL graftrc.system.clone('facts', 'facts_dev', -1, false)").collect().head
    assert(cloned.getLong(0) == 3L && cloned.getInt(1) > 0)
    assert(spark.sql("SELECT count(*) FROM graftrc.facts_dev").as[Long].head == 2500L)
    assert(dataFiles(s"$root/facts_dev").isEmpty)
    // the clone inherits the co-bucketed layout: joining it back to the
    // source plans ZERO exchanges under storage-partitioned joins
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        "SELECT f.k, count(*) AS n FROM graftrc.facts f " +
          "JOIN graftrc.facts_dev d ON f.k = d.k GROUP BY f.k")
      assert(df.count() == 100)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected the source⋈clone join to plan shuffle-free:\n$plan")
    }
    // the auto tag pins the cloned version on the source
    val auto = spark.sql("SELECT name, version FROM graftrc.facts.refs " +
      "WHERE name LIKE 'clone-%'").collect()
    assert(auto.map(r => r.getString(0) -> r.getLong(1)).toSeq match {
      case Seq((n, 3L)) => n.startsWith("clone-facts_dev-")
      case _ => false
    })
    val dropped = spark.sql(
      "CALL graftrc.system.drop_tag('facts', 'audited')").collect().head
    assert(dropped.getBoolean(0))
  }

  test("shallow clone of a shallow clone pins the ORIGINAL root too") {
    val orig = freshDir()
    val c1 = freshDir() + "/c1"
    val c2 = freshDir() + "/c2"
    buildVersions(orig)
    SnapshotTable.cloneTable(spark, orig, c1)
    // c1's manifest carries absolute entries; re-cloning must keep them
    // as-is (NOT prefix them under c1's root) and pin orig directly
    SnapshotTable.cloneTable(spark, c1, c2)
    assert(load(c2).count() == 120)
    assert(load(c2).agg(sum($"v")).as[Long].head == (0L until 120).map(_ * 2).sum)
    // two independent pins on the original: c1's and c2's
    val pins = SnapshotTable.listTags(spark, orig)
    assert(pins.size == 2 && pins.forall(_.version == 3L))
    // dropping the INTERMEDIATE clone's pin must not dangle c2: its own
    // pin on the original keeps the shared bytes through vacuum
    val c1pin = pins.map(_.name).find(_.startsWith("clone-c1-")).get
    SnapshotTable.dropTag(spark, orig, c1pin)
    SnapshotTable.write(spark,
      spark.range(0, 5).select($"id", lit(-1L).as("v")),
      orig, "overwrite", Seq("id"))
    SnapshotTable.vacuum(spark, orig, keepVersions = 1, minAgeMs = 0)
    assert(load(c2).agg(sum($"v")).as[Long].head == (0L until 120).map(_ * 2).sum)
  }

  test("deep clone of a shallow clone copies bytes, never truncates the original") {
    val orig = freshDir()
    val c1 = freshDir() + "/c1"
    val c2 = freshDir() + "/c2"
    buildVersions(orig)
    val expected = (0L until 120).map(_ * 2).sum
    SnapshotTable.cloneTable(spark, orig, c1)
    // the r14 bug: new Path(srcDir, absoluteEntry) resolved src == dst,
    // so FileUtil.copy overwrite-created the ORIGINAL's data file onto
    // itself — truncating the source's bytes. Deep-cloning a shallow
    // clone must leave the original byte-identical and produce a fully
    // independent copy.
    SnapshotTable.cloneTable(spark, c1, c2, deep = true)
    assert(load(orig).agg(sum($"v")).as[Long].head == expected)
    assert(load(c2).count() == 120)
    assert(dataFiles(c2).nonEmpty) // bytes actually landed under c2
    // independence: obliterate orig and c1; c2 still reads
    for (d <- Seq(orig, c1)) {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    assert(load(c2).agg(sum($"v")).as[Long].head == expected)
  }

  test("clone pins never collide across targets sharing a basename") {
    val src = freshDir()
    buildVersions(src)
    val devA = freshDir() + "/nsA/dev"
    SnapshotTable.cloneTable(spark, src, devA, version = Some(2))
    val devB = freshDir() + "/nsB/dev" // same basename, different table
    SnapshotTable.cloneTable(spark, src, devB, version = Some(3))
    // the r14 bug: both pins were named clone-dev, so the second clone
    // silently re-pointed the first's pin and vacuum reclaimed its files
    val pins = SnapshotTable.listTags(spark, src)
    assert(pins.size == 2 && pins.map(_.version).sorted == Seq(2L, 3L))
    SnapshotTable.write(spark,
      spark.range(0, 5).select($"id", lit(-1L).as("v")),
      src, "overwrite", Seq("id"))
    SnapshotTable.vacuum(spark, src, keepVersions = 1, minAgeMs = 0)
    assert(load(devA).agg(sum($"v")).as[Long].head == (0L until 110).map(_ * 2).sum)
    assert(load(devB).agg(sum($"v")).as[Long].head == (0L until 120).map(_ * 2).sum)
  }

  test("startingTimestamp resolves at-or-AFTER the instant (CDC cutover contract)") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 100).select($"id", ($"id" * 2).as("v")),
      dir, "overwrite", Seq("id"))
    Thread.sleep(15) // guarantee distinct publish instants
    SnapshotTable.write(spark,
      spark.range(100, 110).select($"id", ($"id" * 2).as("v")),
      dir, "append", Seq("id"))
    Thread.sleep(15)
    SnapshotTable.write(spark,
      spark.range(110, 120).select($"id", ($"id" * 2).as("v")),
      dir, "append", Seq("id"))
    val t2 = SnapshotTable.readManifest(spark, dir, 2).ts
    val t3 = SnapshotTable.readManifest(spark, dir, 3).ts
    assert(t2 < t3)
    def feedFrom(ts: Long) = spark.read.format("graft_snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", ts.toString).load(dir)
    // an instant strictly between v2 and v3 must replay ONLY v3 — the
    // r14 at-or-before resolution replayed v2 (committed BEFORE the
    // instant), double-applying it in a wall-clock-cutover consumer
    assert(feedFrom(t2 + 1).count() == 10)
    // exactly at a commit instant → that commit replays
    assert(feedFrom(t2).count() == 20)
    // beyond the newest commit → start past history: empty, not latest
    assert(feedFrom(t3 + 3600000L).count() == 0)
  }

  test("programmatic write rejects fractional statsCols before staging") {
    val dir = freshDir()
    // the r14 hole: stageFiles recorded cast('long')-truncated bounds
    // for a DOUBLE statsCol (true min -0.5 → recorded 0), which the
    // metadata-only DELETE proofs would read as full coverage and drop
    // the file — silently deleting the -0.5 row. Must fail loudly.
    val ex = intercept[IllegalArgumentException](SnapshotTable.write(spark,
      spark.range(0, 10).select($"id", ($"id" - 0.5).as("d")),
      dir, "overwrite", Seq("d")))
    assert(ex.getMessage.contains("integral or string"))
    assert(SnapshotTable.latestVersion(spark, dir).isEmpty) // nothing staged
  }
}
