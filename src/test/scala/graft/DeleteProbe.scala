package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the metadata-only DELETE buys (test scope): the same
  * retention predicate (`k < half`) on the same 4M-row range-clustered
  * table, once through the interval proofs (files dropped whole from
  * the manifest) and once forced down the legacy path (`k * 1 < half`
  * — same rows, but opaque to the proofs: full scan + a 2M-position
  * deletion-vector sidecar). At 100 TB the pruned form is the
  * difference between a nightly retention job that commits in
  * milliseconds and one that re-reads half the table to write
  * gigabytes of positions. */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sources.SnapshotTable
    val rows = 4000000L
    val half = rows / 2
    val root = s"/tmp/graft-scale/deleteprobe-${System.currentTimeMillis()}"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def build(name: String): String = {
      val dir = s"$root/$name"
      SnapshotTable.write(spark,
        spark.range(0, rows)
          .select($"id".as("k"), ($"id" * 2).as("v"),
            lit("x" * 40).as("pad"))
          .repartitionByRange(32, $"k"),
        dir, "overwrite", Seq("k"))
      dir
    }
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def m(dir: String) = SnapshotTable.readManifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir).get)

    val pruned = build("t_prune")
    val filesBefore = m(pruned).files.size
    val tPrune = sec { SnapshotTable.deleteVectors(spark, pruned, $"k" < half) }
    val mp = m(pruned)
    require(mp.op == "delete-prune" || mp.op == "delete-dv")
    val prunedDvRows = mp.files.flatMap(_.dv.map(_._2)).sum

    val legacy = build("t_scan")
    // `k * 1` defeats the interval proofs: same rows, legacy cost
    val tScan = sec {
      SnapshotTable.deleteVectors(spark, legacy, $"k" * 1 < half)
    }
    val ml = m(legacy)
    val legacyDvRows = ml.files.flatMap(_.dv.map(_._2)).sum
    val sidecarBytes = ml.files.flatMap(_.dv.map(_._1)).distinct
      .map(p => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(legacy, p)).getLen).sum

    require(SnapshotTable.scan(spark, pruned).count() ==
      SnapshotTable.scan(spark, legacy).count())

    println(f"""{"delete":{"rows":$rows,"files":$filesBefore,""" +
      f""""prune_sec":$tPrune%.3f,"prune_op":"${mp.op}",""" +
      f""""prune_files_after":${mp.files.size},""" +
      f""""prune_dv_rows":$prunedDvRows,""" +
      f""""scan_sec":$tScan%.3f,"scan_dv_rows":$legacyDvRows,""" +
      f""""scan_sidecar_bytes":$sidecarBytes,""" +
      f""""speedup":${tScan / tPrune}%.1f}}""")
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
