package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off variance probe for the dv-masked scan toll (test scope):
  * plain vs single-dv-file scan, count() and a real data aggregate,
  * min of 5 warm runs each — the SCALE family's single warm sample is
  * too noisy at the 0.1 s scale to steer a fix. */
object DvScanProbe {
  def main(args: Array[String]): Unit = {
    import graft.sources.SnapshotTable
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = 2000000L
    val nFiles = 16
    def minSec(body: => Unit): Double = {
      body
      (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    }
    def build(tag: String): String = {
      val dir = s"/tmp/graft-scale/dvprobe-$tag-${System.currentTimeMillis()}"
      val payload = concat(lit("p"),
        lpad(col("id").cast("string"), 18, "0"), lit("x" * 80))
      SnapshotTable.write(spark,
        spark.range(rows).select(col("id"), payload.as("payload"))
          .repartitionByRange(nFiles, col("id")),
        dir, "overwrite", Seq("id"))
      dir
    }
    val plainDir = build("plain")
    val oneDir = build("one")
    SnapshotTable.deleteVectors(spark, oneDir,
      col("id") < rows / nFiles && col("id") % (rows / 200) === 7L)
    def scanPlain = SnapshotTable.scan(spark, plainDir)
    def scanOne = SnapshotTable.scan(spark, oneDir)
    val pc = minSec(scanPlain.count())
    val oc = minSec(scanOne.count())
    val ps = minSec(scanPlain.agg(sum(length(col("payload")))).collect())
    val os = minSec(scanOne.agg(sum(length(col("payload")))).collect())
    val pf = minSec(scanPlain.filter(col("id") > rows - 1000)
      .agg(sum(length(col("payload")))).collect())
    val of = minSec(scanOne.filter(col("id") > rows - 1000)
      .agg(sum(length(col("payload")))).collect())
    // shared-sidecar decode amplification (round-13 fix): ALL 16 files
    // carry positions in ONE consolidated sidecar; the pushed
    // file=basename predicate must keep per-task decode at O(own
    // positions) — total decoded ≈ D, not files × D
    val multiDir = build("multi")
    SnapshotTable.deleteVectors(spark, multiDir,
      col("id") % (rows / 2000) === 7L) // 2000 positions, every file
    val mMulti = SnapshotTable.readManifest(spark, multiDir,
      SnapshotTable.latestVersion(spark, multiDir).get)
    val dvFiles = mMulti.files.count(_.dv.isDefined)
    val deletedTotal = mMulti.files.flatMap(_.dv.map(_._2)).sum
    def connScan = spark.read.format("graft_snapshot").load(multiDir)
    connScan.filter(col("id") >= 0).agg(sum(length(col("payload")))).collect()
    graft.sources.connector.SnapshotPartitions.resetSidecarTelemetry()
    val ms = minSec(connScan.filter(col("id") >= 0)
      .agg(sum(length(col("payload")))).collect())
    val runs = 6 // warmup + 5 timed masked scans hit deletedPositions
    val decodedPerScan =
      graft.sources.connector.SnapshotPartitions.sidecarRowsDecoded.sum() / runs
    println(f"""{"count":{"plain":$pc%.4f,"one_dv":$oc%.4f},""" +
      f""""sum":{"plain":$ps%.4f,"one_dv":$os%.4f},""" +
      f""""filtered_sum":{"plain":$pf%.4f,"one_dv":$of%.4f},""" +
      f""""shared_sidecar":{"dv_files":$dvFiles,"deleted":$deletedTotal,""" +
      f""""decoded_per_scan":$decodedPerScan,""" +
      f""""naive_would_decode":${dvFiles * deletedTotal},""" +
      f""""masked_16file_sum_sec":$ms%.4f}}""")
    spark.stop()
  }
}
