package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Writable branches + write-audit-publish: a branch is an O(metadata)
  * shallow clone nested under the table root, writable through every
  * normal surface, published back to main as ONE linear-history
  * fast-forward commit — with loud conflicts, never silent merges. */
class BranchSpec extends SparkTestBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-branch").toString
  spark.conf.set("spark.sql.catalog.graftbr",
    classOf[graft.sources.connector.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graftbr.root", root)

  private def tdir(name: String) = s"$root/$name"

  private def freshDir(): String =
    Files.createTempDirectory("graft-branch-t").toString

  test("branch, write, fast-forward: main gets the branch state in one commit") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 100).select($"id", ($"id" * 2).as("v")),
      dir, "overwrite", Seq("id"))
    val base = SnapshotTable.createBranch(spark, dir, "staging")
    assert(base == 1L)
    val bdir = SnapshotTable.branchDir(dir, "staging")
    // branch takes writes and DML; main never sees them
    SnapshotTable.write(spark,
      spark.range(100, 120).select($"id", ($"id" * 2).as("v")),
      bdir, "append", Seq("id"))
    SnapshotTable.deleteVectors(spark, bdir, $"id" < 10)
    assert(SnapshotTable.scan(spark, bdir).count() == 110)
    assert(SnapshotTable.scan(spark, dir).count() == 100)
    // publish: one commit, linear history, content == branch state
    val mv = SnapshotTable.fastForward(spark, dir, "staging")
    assert(mv == 2L)
    assert(SnapshotTable.scan(spark, dir).count() == 110)
    assert(SnapshotTable.scan(spark, dir).agg(sum($"v")).as[Long].head ==
      (10L until 120).map(_ * 2).sum)
    // pre-publish version still time-travels
    assert(SnapshotTable.scan(spark, dir, Some(1)).count() == 100)
    // the branch survives, re-pointed and level with main
    assert(SnapshotTable.scan(spark, bdir).count() == 110)
    assert(SnapshotTable.listBranches(spark, dir) ==
      Seq(("staging", 2L, SnapshotTable.latestVersion(spark, bdir).get)))
    // a second epoch composes: write to the same branch, publish again
    SnapshotTable.write(spark,
      spark.range(200, 210).select($"id", ($"id" * 2).as("v")),
      bdir, "append", Seq("id"))
    assert(SnapshotTable.fastForward(spark, dir, "staging") == 3L)
    assert(SnapshotTable.scan(spark, dir).count() == 120)
  }

  test("fast-forward refuses when main advanced past the branch base") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 50).select($"id", $"id".as("v")),
      dir, "overwrite", Seq("id"))
    SnapshotTable.createBranch(spark, dir, "wap")
    val bdir = SnapshotTable.branchDir(dir, "wap")
    SnapshotTable.write(spark,
      spark.range(50, 60).select($"id", $"id".as("v")),
      bdir, "append", Seq("id"))
    // main moves on while the branch is being audited
    SnapshotTable.write(spark,
      spark.range(900, 905).select($"id", $"id".as("v")),
      dir, "append", Seq("id"))
    val mainSum = SnapshotTable.scan(spark, dir).agg(sum($"v")).as[Long].head
    intercept[Exception](SnapshotTable.fastForward(spark, dir, "wap"))
    // the refused publish changed NOTHING: main content intact, branch
    // still reads its own state (the un-move rollback)
    assert(SnapshotTable.scan(spark, dir).agg(sum($"v")).as[Long].head == mainSum)
    assert(SnapshotTable.scan(spark, bdir).count() == 60)
  }

  test("branch-held files survive an aggressive main vacuum") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 80).select($"id", ($"id" * 3).as("v")),
      dir, "overwrite", Seq("id"))
    SnapshotTable.createBranch(spark, dir, "hold")
    val bdir = SnapshotTable.branchDir(dir, "hold")
    // main overwrites and vacuums to its tip — the branch must keep
    // reading the forked state (its clone pin holds the base version)
    SnapshotTable.write(spark,
      spark.range(0, 5).select($"id", lit(-1L).as("v")),
      dir, "overwrite", Seq("id"))
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minAgeMs = 0)
    assert(SnapshotTable.scan(spark, bdir).agg(sum($"v")).as[Long].head ==
      (0L until 80).map(_ * 3).sum)
    // dropping the branch releases the pin; the next sweep reclaims
    assert(SnapshotTable.dropBranch(spark, dir, "hold"))
    assert(SnapshotTable.listBranches(spark, dir).isEmpty)
    assert(SnapshotTable.listTags(spark, dir).isEmpty)
  }

  test("SQL surface: WAP end-to-end with CHECK gate and branches table") {
    spark.sql("CREATE TABLE graftbr.t (k BIGINT, price DOUBLE)")
    spark.sql("ALTER TABLE graftbr.t ADD CONSTRAINT non_negative " +
      "CHECK (price >= 0)")
    spark.sql("INSERT INTO graftbr.t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 100)")
    spark.sql("CALL graftbr.system.create_branch('t', 'audit')")
    // the branch inherits the constraint: a violating batch is
    // rejected BY NAME, clean batches land
    val ex = intercept[Exception](spark.sql(
      "INSERT INTO graftbr.t.branch_audit SELECT id, CAST(-id - 1 AS DOUBLE) " +
        "FROM range(0, 5)"))
    assert(ex.getMessage.contains("non_negative"),
      s"constraint name missing from: ${ex.getMessage}")
    spark.sql("INSERT INTO graftbr.t.branch_audit " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(100, 130)")
    // audit on the branch; main unchanged until the publish
    assert(spark.sql("SELECT count(*) FROM graftbr.t.branch_audit")
      .as[Long].head == 130)
    assert(spark.sql("SELECT count(*) FROM graftbr.t").as[Long].head == 100)
    val before = SnapshotTable.versions(spark, tdir("t")).size
    val published = spark.sql(
      "CALL graftbr.system.fast_forward('t', 'audit')").collect().head.getLong(0)
    assert(spark.sql("SELECT count(*) FROM graftbr.t").as[Long].head == 130)
    // linear history: exactly ONE new version
    assert(SnapshotTable.versions(spark, tdir("t")).size == before + 1)
    val br = spark.sql("SELECT name, base_version FROM graftbr.t.branches")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(br.toSeq == Seq("audit" -> published))
    val dropped = spark.sql(
      "CALL graftbr.system.drop_branch('t', 'audit')").collect().head
    assert(dropped.getBoolean(0))
    intercept[Exception](
      spark.sql("SELECT count(*) FROM graftbr.t.branch_audit").collect())
  }

  test("VERSION AS OF 'branch:x' reads the branch head") {
    spark.sql("CREATE TABLE graftbr.vb (k BIGINT)")
    spark.sql("INSERT INTO graftbr.vb SELECT id FROM range(0, 50)")
    spark.sql("CALL graftbr.system.create_branch('vb', 'next')")
    spark.sql("INSERT INTO graftbr.vb.branch_next SELECT id FROM range(50, 80)")
    assert(spark.sql(
      "SELECT count(*) FROM graftbr.vb VERSION AS OF 'branch:next'")
      .as[Long].head == 80)
    assert(spark.sql("SELECT count(*) FROM graftbr.vb").as[Long].head == 50)
    intercept[Exception](spark.sql(
      "SELECT * FROM graftbr.vb VERSION AS OF 'branch:ghost'").collect())
  }

  test("metadata/branch addresses are reserved against table creation") {
    spark.sql("CREATE TABLE graftbr.rt (k BIGINT)")
    // creating a real table at a metadata/branch ADDRESS would shadow
    // the surface and land a junk directory inside rt's root
    intercept[Exception](
      spark.sql("CREATE TABLE graftbr.rt.branch_x (k BIGINT)"))
    intercept[Exception](
      spark.sql("CREATE TABLE graftbr.rt.history AS SELECT 1 AS x"))
    // ...but the names stay legal where no parent table exists
    spark.sql("CREATE TABLE graftbr.history (k BIGINT)")
    assert(spark.sql("SELECT count(*) FROM graftbr.history").as[Long].head == 0)
  }

  test("bucketed layout travels to the branch and back through publish") {
    spark.sql("CREATE TABLE graftbr.bt (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graftbr.bt SELECT id % 20, id FROM range(0, 1000)")
    spark.sql("CALL graftbr.system.create_branch('bt', 'load')")
    spark.sql("INSERT INTO graftbr.bt.branch_load " +
      "SELECT id % 20, id FROM range(1000, 1400)")
    spark.sql("CALL graftbr.system.fast_forward('bt', 'load')")
    assert(spark.sql("SELECT count(*) FROM graftbr.bt").as[Long].head == 1400)
    // every file main now holds is bucket-pure under the declared
    // layout — the branch epoch staged through the same bucket router
    val m = SnapshotTable.readManifest(spark, tdir("bt"),
      SnapshotTable.latestVersion(spark, tdir("bt")).get)
    assert(m.files.nonEmpty && m.files.forall(fe =>
      fe.bucket.isDefined && fe.bucketN.contains(4)),
      s"published files lost the bucket layout: ${m.files.map(f =>
        (f.path, f.bucket, f.bucketN))}")
  }

  // --- fast-forward crash recovery (the intent-marker protocol) ---

  /** Build a (main, branch) pair with divergent branch work, ready to
    * publish: main 100 rows at v1, branch +30 rows. */
  private def wapFixture(name: String): (String, String) = {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 100).select($"id", ($"id" * 2).as("v")),
      dir, "overwrite", Seq("id"))
    SnapshotTable.createBranch(spark, dir, name)
    val bdir = SnapshotTable.branchDir(dir, name)
    SnapshotTable.write(spark,
      spark.range(100, 130).select($"id", ($"id" * 2).as("v")),
      bdir, "append", Seq("id"))
    (dir, bdir)
  }

  test("crash between main publish and branch re-point: heal completes it") {
    val (dir, bdir) = wapFixture("cr1")
    SnapshotTable.ffCrashPoint = Some("after-publish")
    intercept[Error](SnapshotTable.fastForward(spark, dir, "cr1"))
    // main HAS the published state (the commit landed before the crash)
    assert(SnapshotTable.scan(spark, dir).count() == 130)
    // listBranches self-heals: the branch re-points at the published
    // version instead of silently referencing renamed-away files
    val bs = SnapshotTable.listBranches(spark, dir)
    assert(bs.map(_._1) == Seq("cr1"))
    assert(bs.head._2 == 2L, s"healed branch base wrong: $bs")
    assert(SnapshotTable.scan(spark, bdir).count() == 130,
      "healed branch must read the published state")
    // the healed branch takes further epochs normally
    SnapshotTable.write(spark,
      spark.range(200, 210).select($"id", ($"id" * 2).as("v")),
      bdir, "append", Seq("id"))
    assert(SnapshotTable.fastForward(spark, dir, "cr1") == 3L)
    assert(SnapshotTable.scan(spark, dir).count() == 140)
  }

  test("crash after renames but before publish: heal rolls the moves back") {
    val (dir, bdir) = wapFixture("cr2")
    SnapshotTable.ffCrashPoint = Some("after-renames")
    intercept[Error](SnapshotTable.fastForward(spark, dir, "cr2"))
    val healed = SnapshotTable.healFastForward(spark, dir, "cr2")
    assert(healed.exists(_.startsWith("rolled back")), s"heal said: $healed")
    // main never published; the branch's files are back in place
    assert(SnapshotTable.scan(spark, dir).count() == 100)
    assert(SnapshotTable.scan(spark, bdir).count() == 130)
    // a retried publish now lands clean
    assert(SnapshotTable.fastForward(spark, dir, "cr2") == 2L)
    assert(SnapshotTable.scan(spark, dir).count() == 130)
  }

  test("crash before any rename: the marker alone heals away") {
    val (dir, bdir) = wapFixture("cr3")
    SnapshotTable.ffCrashPoint = Some("before-renames")
    intercept[Error](SnapshotTable.fastForward(spark, dir, "cr3"))
    // the NEXT fastForward heals on entry (rolled back: nothing moved)
    // and proceeds to publish in the same call
    assert(SnapshotTable.fastForward(spark, dir, "cr3") == 2L)
    assert(SnapshotTable.scan(spark, dir).count() == 130)
    assert(SnapshotTable.scan(spark, bdir).count() == 130)
  }

  test("vacuum cannot reclaim files an interrupted fast-forward moved (intent pins)") {
    // regression (round-17 advice): the moved branch-exclusive files
    // sit in main's data/ with their ORIGINAL mtimes (rename preserves
    // mtime) and are referenced by no kept main manifest — an
    // aggressive vacuum between the crash and the heal used to
    // age-gate them away, so the rollback's rename-back restored
    // nothing. The intent marker's planned paths now pin them.
    val (dir, bdir) = wapFixture("cr5")
    SnapshotTable.ffCrashPoint = Some("after-renames")
    intercept[Error](SnapshotTable.fastForward(spark, dir, "cr5"))
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minAgeMs = 0L)
    val healed = SnapshotTable.healFastForward(spark, dir, "cr5")
    assert(healed.exists(_.startsWith("rolled back")), s"heal said: $healed")
    assert(SnapshotTable.scan(spark, bdir).count() == 130,
      "vacuum reclaimed mid-protocol files — the rollback restored nothing")
    assert(SnapshotTable.scan(spark, bdir).agg(sum($"v")).as[Long].head ==
      (0L until 130L).map(_ * 2).sum)
    // the retried publish lands clean after the heal
    assert(SnapshotTable.fastForward(spark, dir, "cr5") == 2L)
    assert(SnapshotTable.scan(spark, dir).count() == 130)
  }

  test("crash mid-re-point: heal finishes the base/pin bookkeeping") {
    val (dir, bdir) = wapFixture("cr4")
    SnapshotTable.ffCrashPoint = Some("mid-repoint")
    intercept[Error](SnapshotTable.fastForward(spark, dir, "cr4"))
    assert(SnapshotTable.scan(spark, dir).count() == 130) // published
    val healed = SnapshotTable.healFastForward(spark, dir, "cr4")
    assert(healed.exists(_.startsWith("completed")), s"heal said: $healed")
    assert(SnapshotTable.listBranches(spark, dir).head._2 == 2L)
    assert(SnapshotTable.scan(spark, bdir).count() == 130)
    // idempotent: a second heal finds nothing
    assert(SnapshotTable.healFastForward(spark, dir, "cr4").isEmpty)
  }
}
