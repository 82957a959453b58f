package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum, when, count => countAgg}
import org.apache.spark.storage.StorageLevel

/** Sink operators (SURVEY §2.1 S4-S8, S10): the reference's
  * transactional full-refresh load re-expressed over parquet table
  * directories.
  *
  * Reference semantics (`etl/loader.py`):
  *  - S4  `load_to_cloud_sql` (`:15-96`): batched INSERT in one txn +
  *    read-back verification -> append write + count check.
  *  - S6  `backup_table` (`:159-195`): `CREATE TABLE backup_<ts> AS
  *    SELECT *` -> copy the table dir to `backup_<table>_<ts>`.
  *  - S5  `truncate_and_load` (`:197-238`): backup -> TRUNCATE ->
  *    insert -> verify; restore the backup on any failure.
  *  - S7  `restore_from_backup` (`:240-308`): newest `backup_%` by name
  *    (the reference's `ORDER BY table_name DESC LIMIT 1`, W2) ->
  *    truncate -> `INSERT SELECT` -> count equality check.
  *  - S8  `_cleanup_old_backups` (`:310-348`): keep the newest
  *    `maxBackups`, drop the rest.
  *
  * All paths go through the Hadoop FileSystem API, so the same code
  * runs against local disk in tests and HDFS/S3A on a cluster; the
  * parquet `overwrite` mode supplies the write atomicity the reference
  * hand-rolls with SQL transactions.
  */
object Sinks {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S4: append-load with the reference's read-back count verification.
    * Returns the number of rows appended. */
  def appendLoad(spark: SparkSession, df: DataFrame, tableDir: String): Long = {
    val before = count(spark, tableDir)
    df.write.mode("append").parquet(tableDir)
    val after = count(spark, tableDir)
    val n = after - before
    require(n >= 0, s"append to $tableDir lost rows: $before -> $after")
    n
  }

  private def count(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    if (fs(spark, p).exists(p)) spark.read.parquet(dir).count() else 0L
  }

  private def backupName(table: String, ts: Long): String = f"backup_${table}_$ts%013d"

  /** Backups of `table` under `backupRoot`, newest (by name) first —
    * names embed a zero-padded epoch so name order IS time order. */
  def listBackups(spark: SparkSession, backupRoot: String, table: String): Seq[String] = {
    val root = new Path(backupRoot)
    val f = fs(spark, root)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(s"backup_${table}_"))
      .sorted(Ordering[String].reverse)
  }

  /** S6: copy the current table into a timestamped backup. Returns the
    * backup name, or None when the table does not exist yet. */
  def backupTable(spark: SparkSession, tableDir: String, backupRoot: String,
                  table: String, nowEpoch: Long): Option[String] = {
    val src = new Path(tableDir)
    if (!fs(spark, src).exists(src)) return None
    val name = backupName(table, nowEpoch)
    spark.read.parquet(tableDir)
      .write.mode("overwrite").parquet(s"$backupRoot/$name")
    Some(name)
  }

  /** S8: keep the newest `maxBackups` backups, delete the rest. Returns
    * the deleted names. */
  def cleanupOldBackups(spark: SparkSession, backupRoot: String, table: String,
                        maxBackups: Int = 3): Seq[String] = {
    val stale = listBackups(spark, backupRoot, table).drop(maxBackups)
    stale.foreach { name =>
      val p = new Path(s"$backupRoot/$name")
      fs(spark, p).delete(p, true)
    }
    stale
  }

  /** S7: restore the table from its newest backup; count-verified.
    * Returns the restored row count. */
  def restoreFromBackup(spark: SparkSession, tableDir: String, backupRoot: String,
                        table: String): Long = {
    val latest = listBackups(spark, backupRoot, table).headOption.getOrElse(
      throw new IllegalStateException(s"no backup of $table under $backupRoot"))
    val backupDf = spark.read.parquet(s"$backupRoot/$latest")
    val expected = backupDf.count()
    backupDf.write.mode("overwrite").parquet(tableDir)
    val restored = count(spark, tableDir)
    require(restored == expected,
      s"restore of $table from $latest row mismatch: $restored != $expected")
    restored
  }

  /** F-E (`etl/loader.py:29-34`): the load-time gate — drop rows whose
    * `gateCol` is null, counting the rejects *in-flight* with
    * `df.observe` (a CollectMetrics node below the filter) so the gate
    * adds zero extra passes over the data; the reference filters the
    * frame and logs the dropped count. Read `obs.get("rejected")` after
    * the load action completes. */
  def notNullLoadGate(df: DataFrame, gateCol: String, obs: Observation): DataFrame =
    df.observe(obs,
        sum(when(col(gateCol).isNull, 1L).otherwise(0L)).as("rejected"),
        countAgg(lit(1)).as("input_rows"))
      .filter(col(gateCol).isNotNull)

  /** S5 (+F-E): transactional full refresh — optional not-null load
    * gate, backup, staged write, read-back verification, then an
    * ATOMIC publish: the new data is written to a staging directory
    * and verified there, and only then swapped into place with two
    * filesystem renames (metadata ops, no data copy). A crash anywhere
    * before the swap leaves the old table untouched and readable; the
    * swap window itself is two renames instead of `overwrite`'s whole
    * delete-and-rewrite, and a failed commit rename rolls the old
    * directory back into place (with the timestamped backup as the
    * final remedy). Returns the loaded row count.
    *
    * The frame is persisted across the write + verification count so
    * the upstream pipeline executes once per load (the reference also
    * materializes once — a pandas frame in memory). On an object store
    * without atomic rename (S3), swap the rename pair for a manifest
    * commit (or a table format); the staging/verify/publish protocol
    * is unchanged.
    *
    * `commitHook` runs after verification, immediately before the
    * publish renames — test-only failure injection for the
    * crash-mid-load path (default no-op). */
  def truncateAndLoad(spark: SparkSession, df: DataFrame, tableDir: String,
                      backupRoot: String, table: String, nowEpoch: Long,
                      maxBackups: Int = 3, gateCol: Option[String] = None,
                      gateObs: Option[Observation] = None,
                      commitHook: () => Unit = () => ()): Long = {
    val gated = gateCol match {
      case Some(c) => notNullLoadGate(df, c, gateObs.getOrElse(Observation()))
      case None => df
    }
    val backup = backupTable(spark, tableDir, backupRoot, table, nowEpoch)
    val data = gated.persist(StorageLevel.MEMORY_AND_DISK)
    val tablePath = new Path(tableDir)
    val f = fs(spark, tablePath)
    val staging = new Path(s"$tableDir.staging_$nowEpoch")
    val retired = new Path(s"$tableDir.retired_$nowEpoch")
    try {
      data.write.mode("overwrite").parquet(staging.toString)
      val expected = data.count() // served from the cache, not a re-run
      val loaded = spark.read.parquet(staging.toString).count()
      require(loaded == expected,
        s"load verification failed for $table: $loaded != $expected")
      commitHook()
      val hadOld = f.exists(tablePath)
      if (hadOld) require(f.rename(tablePath, retired),
        s"retire rename failed for $tableDir")
      try require(f.rename(staging, tablePath), s"commit rename failed for $tableDir")
      catch {
        case e: Throwable =>
          if (hadOld) f.rename(retired, tablePath) // roll the old table back
          throw e
      }
      if (hadOld) f.delete(retired, true)
      cleanupOldBackups(spark, backupRoot, table, maxBackups)
      loaded
    } catch {
      case e: Throwable =>
        f.delete(staging, true)
        // before the publish the old table was never touched; if both
        // renames failed mid-swap the timestamped backup is the remedy
        if (!f.exists(tablePath) && backup.isDefined)
          restoreFromBackup(spark, tableDir, backupRoot, table)
        throw e
    } finally data.unpersist()
  }
}
