package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing scale-up benchmark: replicate the sf-dir lineitem `factor`×
  * with per-replica shifted ship dates (distinct join keys — replicating
  * rows *without* perturbing keys multiplies equi-join fan-out
  * quadratically, which measures key multiplicity, not scale) and run
  * the full flight pipeline. Emits one JSON line like Bench so
  * round-over-round scale behavior is mechanically comparable.
  *
  * Staging is written once per (sf, factor) under /tmp and reused;
  * only the pipeline run is timed.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaleDir = s"/tmp/graft-scale/${new java.io.File(sfDir).getName}_x$factor"
    val liPath = new Path(s"$scaleDir/lineitem.parquet")
    val fs = liPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(liPath)) {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
        // stride > the fixture's ~7-year date span: each replica lands in
        // a disjoint date range (10x data = 10 more years), so join-key
        // multiplicity per key stays that of the base data instead of
        // picking up accidental cross-replica date collisions
        .withColumn("l_shipdate", date_add(col("l_shipdate"), (col("rep") * 3000).cast("int")))
        .drop("rep")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(liPath.toString)
    }
    val rowsIn = spark.read.parquet(liPath.toString).count()

    // untimed JVM/codegen warmup, as in Bench
    spark.range(1000000).selectExpr("sum(id) s", "count(distinct id % 7) c")
      .repartition(2).count()

    val t0 = System.nanoTime()
    val rowsOut = FlightPipeline.run(spark, scaleDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"scale_flight_pipeline","value":$sec,"unit":"sec",""" +
      s""""factor":$factor,"rows_in":$rowsIn,"rows_out":$rowsOut,"sf":"$sfDir"}""")
    spark.stop()
  }
}
