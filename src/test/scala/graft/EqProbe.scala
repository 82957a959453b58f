package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what equality deletes buy on the shape they exist for: a
  * keyed delete epoch against a table UNCLUSTERED on the key (every
  * per-file range overlaps, so zone maps refute nothing). The same
  * 1000-key batch runs once as an equality delete (key sidecar + ref
  * attach — zero data reads) and once down the deletion-vector path
  * (match scan over every file to find positions). Also prices the
  * read-side trade (vectorized masked scan while refs are pending vs
  * the clean scan after purge, narrow and wide projections) — the
  * fold is where the deferred position work is paid, once, on a
  * maintenance cadence. */
object EqProbe {
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
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val root = s"/tmp/graft-scale/eqprobe-${System.currentTimeMillis()}"
    val hconf = spark.sparkContext.hadoopConfiguration

    def build(name: String): String = {
      val dir = s"$root/$name"
      SnapshotTable.write(spark,
        spark.range(0, rows)
          // scrambled key: every file's (min,max) spans ~the full
          // domain — the unclustered worst case for positional deletes
          .select((($"id" * 2654435761L) % rows).as("k"),
            ($"id" * 2).as("v"), lit("x" * 40).as("pad"))
          .repartition(32),
        dir, "overwrite", Seq("k"))
      dir
    }
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def dataBytes(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir, "data")
      p.getFileSystem(hconf).listStatus(p).map(_.getLen).sum
    }
    def m(dir: String) = SnapshotTable.readManifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir).get)
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))

    val keys = (0L until 1000L).map(i => (i * 104729L) % rows)

    // equality path: one sidecar, ref attach, zero data reads
    val eqDir = build("t_eq")
    val bytes0 = dataBytes(eqDir)
    val tEq = sec {
      SnapshotTable.deleteByKey(spark, eqDir, "k", keys.toDF("k"))
    }
    val eqBytes = dataBytes(eqDir) - bytes0
    val eqAttached = m(eqDir).files.count(_.eqDv.nonEmpty)

    // positional path: the match scan finds positions file by file
    val dvDir = build("t_dv")
    val bytes1 = dataBytes(dvDir)
    val tDv = sec {
      SnapshotTable.deleteVectors(spark, dvDir, $"k".isin(keys: _*))
    }
    val dvBytes = dataBytes(dvDir) - bytes1
    val dvPositions = m(dvDir).files.flatMap(_.dv.map(_._2)).sum

    // read-side trade while refs are pending vs after the fold. Two
    // projection shapes, because the masking cost is the KEY COLUMN's
    // decode: `narrow` projects one non-key column (worst case — the
    // mask doubles the decoded bytes), `wide` touches every column
    // (the "SELECT * while CDC is in flight" shape — the key decodes
    // anyway, so the overhead is just the per-row hash probe). Both
    // run the VECTORIZED readers since round 16; the round-15 row-
    // reader fallback paid ~4.8× on narrow at 16M rows.
    def scanSec(dir: String): Double = {
      val q = () => spark.read.format("graft_snapshot").load(dir)
        .agg(sum($"v")).collect()
      q(); sec(q()) // warm once
    }
    def scanSecWide(dir: String): Double = {
      val q = () => spark.read.format("graft_snapshot").load(dir)
        .agg(sum($"v"), sum($"k"), count($"pad")).collect()
      q(); sec(q())
    }
    val readPending = scanSec(eqDir)
    val readPendingWide = scanSecWide(eqDir)
    val tFold = sec { SnapshotTable.purgeDeletes(spark, eqDir) }
    val readFolded = scanSec(eqDir)
    val readFoldedWide = scanSecWide(eqDir)
    val countEq = spark.read.format("graft_snapshot").load(eqDir).count()
    val countDv = spark.read.format("graft_snapshot").load(dvDir).count()
    require(countEq == countDv,
      s"paths disagree: eq $countEq vs dv $countDv")

    spark.stop()
    println(
      s"""{"metric":"eq_delete_probe","rows":$rows,"batch_keys":${keys.size},
         |"eq_epoch_sec":${f3(tEq)},"eq_epoch_bytes":$eqBytes,
         |"eq_files_attached":$eqAttached,
         |"dv_epoch_sec":${f3(tDv)},"dv_epoch_bytes":$dvBytes,
         |"dv_positions":$dvPositions,
         |"epoch_speedup":${f3(tDv / tEq)},
         |"read_pending_sec":${f3(readPending)},
         |"fold_sec":${f3(tFold)},"read_folded_sec":${f3(readFolded)},
         |"read_pending_ratio_narrow":${f3(readPending / readFolded)},
         |"read_pending_wide_sec":${f3(readPendingWide)},
         |"read_folded_wide_sec":${f3(readFoldedWide)},
         |"read_pending_ratio_wide":${f3(readPendingWide / readFoldedWide)},
         |"rows_after":$countEq}""".stripMargin.replace("\n", ""))
  }
}
