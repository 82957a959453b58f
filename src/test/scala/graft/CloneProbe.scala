package graft

import org.apache.spark.sql.SparkSession

/** Measures what the ZERO-COPY clone buys (test scope): registering a
  * dev copy of a populated fact table as a shallow clone — O(metadata),
  * no bytes moved — vs the deep copy that repays the table's storage.
  * At 100 TB the shallow form is milliseconds of manifest writing vs
  * hours of copying; the probe also pins that the clone reads at full
  * speed (same aggregate over shared files) and that the source's
  * aggressive vacuum does NOT break it (the auto tag retains the
  * cloned version). */
object CloneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.SnapshotTable
    val rows = 4000000L
    val root = s"/tmp/graft-scale/cloneprobe-${System.currentTimeMillis()}"
    val src = s"$root/src"
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))

    SnapshotTable.write(spark,
      spark.range(0, rows)
        .selectExpr("id AS k", "id * 2 AS v", "repeat('x', 40) AS pad"),
      src, "overwrite", Seq("k"))
    val srcBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(src, "data")).getLength
    val srcFiles = SnapshotTable.readManifest(spark, src, 1L).files.size

    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def bytesUnder(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir, "data")
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }

    val shallow = s"$root/dev"
    val tShallow = sec { SnapshotTable.cloneTable(spark, src, shallow) }
    val shallowBytes = bytesUnder(shallow)

    val deep = s"$root/full"
    val tDeep = sec {
      SnapshotTable.cloneTable(spark, src, deep, deep = true)
    }
    val deepBytes = bytesUnder(deep)

    // the clone reads at full speed over the SHARED files
    val srcSum = SnapshotTable.scan(spark, src)
      .selectExpr("sum(v) AS s").collect().head.getLong(0)
    var cloneSum = 0L
    val tRead = sec {
      cloneSum = SnapshotTable.scan(spark, shallow)
        .selectExpr("sum(v) AS s").collect().head.getLong(0)
    }
    require(cloneSum == srcSum, s"clone read mismatch: $cloneSum vs $srcSum")

    // the source's aggressive vacuum must NOT break the clone: the
    // auto tag pins the cloned version and its files
    SnapshotTable.write(spark,
      spark.range(0, 10).selectExpr("id AS k", "id AS v", "'y' AS pad"),
      src, "overwrite", Seq("k"))
    SnapshotTable.vacuum(spark, src, keepVersions = 1, minAgeMs = 0)
    val survivedSum = SnapshotTable.scan(spark, shallow, Some(1L))
      .selectExpr("sum(v) AS s").collect().head.getLong(0)
    require(survivedSum == srcSum,
      "source vacuum broke the shallow clone despite the pin")

    println(f"""{"clone":{"rows":$rows,"src_files":$srcFiles,""" +
      f""""src_bytes":$srcBytes,"shallow_sec":$tShallow%.3f,""" +
      f""""shallow_bytes_copied":$shallowBytes,""" +
      f""""deep_sec":$tDeep%.3f,"deep_bytes_copied":$deepBytes,""" +
      f""""copy_ratio":${tDeep / tShallow}%.1f,""" +
      f""""clone_read_sec":$tRead%.3f,""" +
      f""""survives_source_vacuum":true}}""")
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
