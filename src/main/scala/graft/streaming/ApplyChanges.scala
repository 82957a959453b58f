package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.{MergeInsertClause, MergeRowAction, MergeWhenClause}

/** Applies one micro-batch of a CHANGE FEED (rows shaped
  * `table columns + change_type + commit_version`, as the
  * `readChangeFeed` stream / `cat.ns.t.changes` table emit) to a
  * downstream snapshot table — the consumer half of CDC, the
  * "apply changes into" primitive:
  *
  * {{{
  *   spark.readStream.format("graft_snapshot")
  *     .option("readChangeFeed", "true").load(srcDir)
  *     .writeStream
  *     .foreachBatch((b: DataFrame, _: Long) =>
  *       ApplyChanges.applyBatch(b, tgtDir, "id"))
  *     .option("checkpointLocation", ckpt).start()
  * }}}
  *
  * Semantics (Delta's APPLY CHANGES recipe):
  *
  *  1. '''Latest action per key wins.''' A batch may span several
  *     source versions, so one key can carry a whole history
  *     (upsert at v3, delete at v5). Only the newest action by
  *     `commit_version` applies; within ONE version an UPDATE arrives
  *     as a delete+upsert PAIR, and the post-image upsert must win
  *     over its own pre-image delete.
  *  2. '''One distributed merge applies everything.''' The collapsed
  *     action frame drives a single [[SnapshotTable.mergeClauses]]
  *     call — matched deletes land in the deletion vector, matched
  *     upserts rewrite, unmatched upserts insert, unmatched deletes
  *     no-op — O(affected) rows, one commit per batch, never a
  *     per-key driver loop. Exactly-once rides the stream checkpoint:
  *     a replayed batch recomputes the same collapsed actions and the
  *     merge is idempotent (same post-images, same delete set).
  */
object ApplyChanges {

  /** Apply one feed batch to the snapshot table at `dir`, keyed by
    * `key` (a unique key column of the table). */
  def applyBatch(batch: DataFrame, dir: String, key: String,
                 statsCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val tableCols = batch.columns.toSeq
      .filterNot(Set("change_type", "commit_version"))
    require(tableCols.contains(key),
      s"key column '$key' is not in the feed (${batch.columns.mkString(", ")})")
    // newest action per key; an update's same-version pre-image delete
    // loses to its post-image upsert
    val w = Window.partitionBy(col(key))
      .orderBy(col("commit_version").desc,
        when(col("change_type") === "upsert", 0).otherwise(1))
    val collapsed = batch
      .withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
    // bootstrap: the downstream table does not exist yet — the first
    // batch's surviving upserts ARE the initial snapshot (deletes of
    // never-seen keys no-op by definition)
    if (SnapshotTable.latestVersion(spark, dir).isEmpty) {
      val initial = collapsed.filter(col("change_type") === "upsert")
        .select(tableCols.map(c => col(s"`$c`")): _*)
      SnapshotTable.write(spark, initial, dir, "overwrite", statsCols)
      return
    }
    // source columns are renamed out of the target's namespace (the
    // merge joins target and source into one frame)
    val latest = collapsed
      .select(col("change_type").as("_cdc_change") +:
        tableCols.map(c => col(s"`$c`").as(s"_src_$c")): _*)
    if (latest.isEmpty) return
    SnapshotTable.mergeClauses(spark, dir, latest,
      keyCol = key, sourceKey = col(s"_src_$key"),
      matched = Seq(
        MergeWhenClause(Some(col("_cdc_change") === "delete"),
          MergeRowAction.Delete),
        MergeWhenClause(None, MergeRowAction.Update(
          tableCols.map(c => c -> col(s"_src_$c"))))),
      notMatched = Seq(
        MergeInsertClause(Some(col("_cdc_change") === "upsert"),
          tableCols.map(c => c -> col(s"_src_$c")))),
      statsCols = statsCols)
  }
}
