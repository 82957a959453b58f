package graft

import org.apache.spark.sql.SparkSession

/** Focused runner for ScaleBench's connector + deletion-vector
  * families (test scope — a measurement probe, not library surface):
  * the two round-12 targets are
  *   - connector `full.sec` / `vectorized_full_sec` ≤ ~1.05 (the
  *     ColumnarBatch reader closing the r11 record-assembly 1.31× toll),
  *   - dv `scan.masked_single_file_sec` / `scan.plain_sec` ≤ ~1.5
  *     (in-reader position-mask retiring the broadcast anti-join toll).
  *
  *   sbt -batch "Test/runMain graft.ConnectorPerfProbe"
  */
object ConnectorPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // same join thresholds as ScaleBench: the DPP row needs the dim
      // to broadcast (reuseBroadcastOnly), or no runtime filter fires
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup so the first family isn't charged codegen/JIT
    spark.range(1000000).selectExpr("sum(id) s").count()
    println(s"""{"connector":${ScaleBench.connectorFamily(spark)},""" +
      s""""deletion_vectors":${ScaleBench.deletionVectorFamily(spark)}}""")
    spark.stop()
  }
}
