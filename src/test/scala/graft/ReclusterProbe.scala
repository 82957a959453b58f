package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices incremental re-clustering on the shape it exists for: a
  * range-clustered table whose hot tail decayed under straddling
  * ingest epochs. Measures the decayed-component rewrite (rows and
  * seconds) against the full clustered rewrite of the same table, and
  * the planned-file restoration for a tail range probe. The rewrite
  * cost must track the DECAYED rows, not the table. */
object ReclusterProbe {
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
    val rows = 16000000L
    val tailLo = rows * 15 / 16 // the hot 1/16th of the key domain
    val root = s"/tmp/graft-scale/reclprobe-${System.currentTimeMillis()}"
    val hconf = spark.sparkContext.hadoopConfiguration

    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    def build(name: String): String = {
      val dir = s"$root/$name"
      val propsPath = new org.apache.hadoop.fs.Path(dir, "_props.json")
      val pfs = propsPath.getFileSystem(hconf)
      pfs.mkdirs(propsPath.getParent)
      val out = pfs.create(propsPath, true)
      try out.write("""{"clusterBy":"k","statsCols":"k"}""".getBytes("UTF-8"))
      finally out.close()
      SnapshotTable.write(spark,
        spark.range(0, rows).select($"id".as("k"), ($"id" * 2).as("v"),
          lit("x" * 40).as("pad")).repartitionByRange(32, $"k"),
        dir, "overwrite", Seq("k"))
      // three hot-tail epochs, each straddling the top 1/16th
      (1 to 3).foreach(i => SnapshotTable.write(spark,
        spark.range(tailLo + i, rows, 7)
          .select($"id".as("k"), ($"id" * 2).as("v"), lit("y" * 40).as("pad")),
        dir, "append", Seq("k")))
      dir
    }
    def m(dir: String) = SnapshotTable.readManifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir).get)
    def planned(dir: String, lo: Long, hi: Long): Int = {
      val probe = spark.read.format("graft_snapshot").load(dir)
        .filter($"k" >= lo && $"k" < hi)
      probe.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[graft.sources.connector.SnapshotScan]
            .planInputPartitions().length
      }.head
    }

    val incDir = build("inc")
    val before = m(incDir)
    val totalRows = before.files.map(_.liveRows).sum
    val plannedBefore = planned(incDir, tailLo + rows / 64, tailLo + rows / 32)
    val tInc = sec { SnapshotTable.reclusterDecayed(spark, incDir, 2) }
    val mAfter = m(incDir)
    // rows actually rewritten = live rows of the files that changed
    val survivors = mAfter.files.map(_.path).toSet
    val rewrittenRows = before.files
      .filterNot(fe => survivors.contains(fe.path)).map(_.liveRows).sum
    val plannedAfter = planned(incDir, tailLo + rows / 64, tailLo + rows / 32)

    // the full clustered rewrite of the same decayed table, for scale
    val fullDir = build("full")
    val tFull = sec {
      val known = SnapshotTable.scan(spark, fullDir)
      SnapshotTable.write(spark,
        known.repartitionByRange(32, $"k"), fullDir, "overwrite", Seq("k"))
    }

    spark.stop()
    println(
      s"""{"metric":"recluster_probe","rows":$totalRows,
         |"tail_fraction":0.0625,
         |"rewritten_rows":$rewrittenRows,
         |"rewrite_amplification":${f3(totalRows.toDouble / rewrittenRows)},
         |"planned_tail_before":$plannedBefore,
         |"planned_tail_after":$plannedAfter,
         |"incremental_sec":${f3(tInc)},
         |"full_rewrite_sec":${f3(tFull)},
         |"speedup":${f3(tFull / tInc)},
         |"files_after":${mAfter.files.size}}""".stripMargin.replace("\n", ""))
  }
}
