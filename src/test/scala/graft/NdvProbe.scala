package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the NDV sketches: the same 4M-row write with and without a
  * declared `ndvCols`, plus what the manifest pays per file and what
  * the merged estimate reports vs the true distinct count. The write
  * overhead is the per-row TreeSet insert (bounded at k=64 entries);
  * the manifest overhead is ~k longs of JSON per column per file. */
object NdvProbe {
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
    val trueNdv = 50000L
    val root = s"/tmp/graft-scale/ndvprobe-${System.currentTimeMillis()}"
    val hconf = spark.sparkContext.hadoopConfiguration

    def df = spark.range(0, rows)
      .select(($"id" % trueNdv).as("k"), ($"id" * 2).as("v"),
        lit("x" * 40).as("pad"))
      .repartition(32)
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def manifestBytes(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir, "_log")
      p.getFileSystem(hconf).listStatus(p)
        .filter(_.getPath.getName.endsWith(".json")).map(_.getLen).sum
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))

    // warm the write path once so JIT/codegen don't bill the first arm
    SnapshotTable.write(spark, df, s"$root/warm", "overwrite", Seq("k"))

    val plainDir = s"$root/plain"
    val tPlain = sec {
      SnapshotTable.write(spark, df, plainDir, "overwrite", Seq("k"))
    }
    val plainManifest = manifestBytes(plainDir)

    val ndvDir = s"$root/ndv"
    // declare the layout prop directly (the catalog writes the same
    // file from TBLPROPERTIES)
    val propsPath = new org.apache.hadoop.fs.Path(ndvDir, "_props.json")
    val pfs = propsPath.getFileSystem(hconf)
    pfs.mkdirs(propsPath.getParent)
    val out = pfs.create(propsPath, true)
    try out.write("""{"ndvCols":"k"}""".getBytes("UTF-8")) finally out.close()
    val tNdv = sec {
      SnapshotTable.write(spark, df, ndvDir, "overwrite", Seq("k"))
    }
    val ndvManifest = manifestBytes(ndvDir)

    // the round-16 DEFAULT: an identity-partitioned catalog table no
    // longer auto-declares ndvCols (bucket keys auto, identity keys
    // opt-in) — price what the default saves by running the same
    // INSERT with and without the opt-in TBLPROPERTIES
    spark.conf.set("spark.sql.catalog.graftndvp",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftndvp.root", s"$root/cat")
    df.createOrReplaceTempView("ndv_src")
    // warm the CATALOG insert path too (planner + codegen), so the
    // first measured arm isn't billed the session's cold start
    spark.sql("CREATE TABLE graftndvp.warm (k BIGINT, v BIGINT, pad STRING) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO graftndvp.warm SELECT * FROM ndv_src")
    spark.sql("CREATE TABLE graftndvp.ident (k BIGINT, v BIGINT, pad STRING) " +
      "PARTITIONED BY (k)")
    val tIdentDefault = sec {
      spark.sql("INSERT INTO graftndvp.ident SELECT * FROM ndv_src")
    }
    spark.sql("CREATE TABLE graftndvp.identndv (k BIGINT, v BIGINT, pad STRING) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('ndvCols'='k')")
    val tIdentOptin = sec {
      spark.sql("INSERT INTO graftndvp.identndv SELECT * FROM ndv_src")
    }
    val identDeclaresNdv = SnapshotTable.readManifest(spark, s"$root/cat/ident",
      SnapshotTable.latestVersion(spark, s"$root/cat/ident").get)
      .files.exists(_.ndv.nonEmpty)

    val m = SnapshotTable.readManifest(spark, ndvDir,
      SnapshotTable.latestVersion(spark, ndvDir).get)
    val merged = new java.util.TreeSet[java.lang.Long]()
    m.files.foreach(_.ndv("k").foreach { x =>
      merged.add(x)
      if (merged.size > SnapshotTable.NdvK) merged.pollLast()
    })
    val est = graft.functions.cat.KmvSketch.estimate(merged, SnapshotTable.NdvK)

    spark.stop()
    println(
      s"""{"metric":"ndv_sketch_probe","rows":$rows,"true_ndv":$trueNdv,
         |"write_sec_plain":${f3(tPlain)},"write_sec_ndv":${f3(tNdv)},
         |"write_overhead_ratio":${f3(tNdv / tPlain)},
         |"manifest_bytes_plain":$plainManifest,
         |"manifest_bytes_ndv":$ndvManifest,
         |"manifest_bytes_per_file":${(ndvManifest - plainManifest) / m.files.size},
         |"files":${m.files.size},
         |"identity_default_declares_ndv":$identDeclaresNdv,
         |"identity_write_sec_default":${f3(tIdentDefault)},
         |"identity_write_sec_optin":${f3(tIdentOptin)},
         |"identity_default_overhead_ratio":${f3(tIdentDefault / tIdentOptin)},
         |"merged_estimate":$est,
         |"estimate_error_pct":${f3(math.abs(est - trueNdv).toDouble * 100 / trueNdv)}}"""
        .stripMargin.replace("\n", ""))
  }
}
