package graft

import org.apache.spark.sql.SparkSession

/** Focused runner for ScaleBench's anchor-format family (test scope —
  * a measurement probe, not library surface): times cold manifest
  * resolution from a parquet anchor vs the JSON entry at the sizes in
  * SPARK_GRAFT_ANCHOR_FILES without re-running every other family.
  * Used to locate the local-filesystem crossover that justifies
  * [[graft.sources.SnapshotTable.parquetAnchorMinFiles]].
  *
  *   SPARK_GRAFT_ANCHOR_FILES=10000,200000,1000000 \
  *     sbt -batch "Test/runMain graft.AnchorFormatProbe"
  */
object AnchorFormatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup of the parquet read/write path so the first
    // measured size isn't charged codegen/JIT startup
    spark.range(1000).write.mode("overwrite")
      .parquet("/tmp/graft-scale/anchor-warmup")
    spark.read.parquet("/tmp/graft-scale/anchor-warmup").count()
    println(s"""{"anchor_format":${ScaleBench.manifestFormat(spark)}}""")
    spark.stop()
  }
}
