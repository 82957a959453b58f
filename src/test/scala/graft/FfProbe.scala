package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices write-audit-publish: branch creation and fast-forward on a
  * 4M-row vs 16M-row main with the SAME ingest batch — both must cost
  * O(batch) metadata (the branch is a shallow clone; the publish
  * renames only branch-exclusive files), so the numbers should be
  * flat in main's size. */
object FfProbe {
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
    val root = s"/tmp/graft-scale/ffprobe-${System.currentTimeMillis()}"
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))

    def run(rows: Long, tag: String): String = {
      val dir = s"$root/$tag"
      SnapshotTable.write(spark,
        spark.range(0, rows).select($"id".as("k"), ($"id" * 2).as("v"),
          lit("x" * 40).as("pad")).repartition(32),
        dir, "overwrite", Seq("k"))
      val tBranch = sec { SnapshotTable.createBranch(spark, dir, "wap") }
      val bdir = SnapshotTable.branchDir(dir, "wap")
      SnapshotTable.write(spark,
        spark.range(rows, rows + 100000)
          .select($"id".as("k"), ($"id" * 2).as("v"), lit("y" * 40).as("pad")),
        bdir, "append", Seq("k"))
      val tFf = sec { SnapshotTable.fastForward(spark, dir, "wap") }
      val n = SnapshotTable.scan(spark, dir).count()
      require(n == rows + 100000, s"ff lost rows: $n")
      s""""${tag}":{"rows":$rows,"branch_sec":${f3(tBranch)},"ff_sec":${f3(tFf)}}"""
    }

    val a = run(4000000L, "m4")
    val b = run(16000000L, "m16")
    spark.stop()
    println(s"""{"metric":"wap_probe","batch_rows":100000,$a,$b}""")
  }
}
