package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plan of a full-table scan WITH pending
  * equality deletes — the PLANS.md evidence that the round-16 read
  * path keeps ColumnarToRow + whole-stage codegen (round 15 parked
  * such scans on row readers), plus the per-partition columnar
  * verdict and serialized partition size. */
object EqPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.sources.SnapshotTable
    val dir = s"/tmp/graft-scale/eqplan-${System.currentTimeMillis()}"
    SnapshotTable.write(spark,
      spark.range(0, 200000).select(
        (($"id" * 2654435761L) % 200000).as("k"), ($"id" * 2).as("v"))
        .repartition(4),
      dir, "overwrite", Seq("k"))
    SnapshotTable.deleteByKey(spark, dir, "k", spark.range(0, 5000).toDF("k"))
    val df = spark.read.format("graft_snapshot").load(dir)
      .filter($"v" >= 0).groupBy(($"k" % 10).as("slot")).agg(sum($"v"))
    println("== executedPlan (eq refs PENDING on every file) ==")
    println(df.queryExecution.executedPlan.toString
      .linesIterator.take(18).mkString("\n"))
    val scan = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.connector.SnapshotScan]
    }.head
    val parts = scan.planInputPartitions()
    val factory = scan.createReaderFactory()
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    parts.foreach(oos.writeObject)
    oos.close()
    println(s"partitions=${parts.length} " +
      s"columnar=${parts.forall(factory.supportColumnarReads)} " +
      s"serializedBytesPerPartition=${bos.size() / parts.length} " +
      s"count=${df.count()}")
    spark.stop()
  }
}
