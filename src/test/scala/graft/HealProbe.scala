package graft

import org.apache.spark.sql.SparkSession

/** Measures what INCREMENTAL layout healing buys (test scope): a
  * bucketed fact table with a few stray legacy (unbucketed) files is
  * repaired by `rebucketBroken` — O(broken files) — vs the full
  * `rebucket` rewrite — O(table). At 100 TB the difference is
  * repaying gigabytes vs repaying the whole table's write cost every
  * time one stray epoch lands. Reports wall times, files rewritten by
  * each path, and the post-heal SPJ exchange count (must be 0). */
object HealProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.SnapshotTable
    val facts = 4000000L
    val strays = 50000L
    val buckets = 32
    val root = s"/tmp/graft-scale/healprobe-${System.currentTimeMillis()}"
    spark.conf.set("spark.sql.catalog.healp",
      "graft.sources.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.healp.root", root)
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(root))

    def build(name: String): String = {
      spark.sql(s"CREATE TABLE healp.$name (k BIGINT, v BIGINT, pad STRING) " +
        s"PARTITIONED BY (bucket($buckets, k))")
      spark.sql(s"INSERT INTO healp.$name SELECT id % 400000, id, " +
        s"repeat('x', 40) FROM range(0, $facts)")
      val dir = s"$root/$name"
      // two stray legacy files (a foreign writer): plain parquet +
      // bucket-less manifest entries
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until 2).foreach { i =>
        val tmp = new org.apache.hadoop.fs.Path(dir, s".legacy-$i")
        spark.range(facts + i * strays, facts + (i + 1) * strays)
          .selectExpr("id % 400000 AS k", "id AS v", "repeat('x', 40) AS pad")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = fs.listStatus(tmp).map(_.getPath)
          .find(p => p.getName.startsWith("part-")).get
        val rel = s"data/legacy-$i.parquet"
        fs.rename(part, new org.apache.hadoop.fs.Path(dir, rel))
        fs.delete(tmp, true)
        SnapshotTable.commitAdded(spark, dir, "append",
          Seq(SnapshotTable.FileEntry(rel, strays, Map.empty, Map.empty,
            None, None, None, None)), carry = true)
      }
      dir
    }
    def filesOf(dir: String): Int =
      SnapshotTable.readManifest(spark, dir,
        SnapshotTable.latestVersion(spark, dir).get).files.size
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def liveRowsOf(dir: String): Long =
      SnapshotTable.readManifest(spark, dir,
        SnapshotTable.latestVersion(spark, dir).get).files.map(_.liveRows).sum

    val dHeal = build("t_heal")
    val filesBefore = filesOf(dHeal)
    var healed = 0
    val tHeal = sec { healed = SnapshotTable.rebucketBroken(spark, dHeal) }
    // rows the heal path REWROTE = only the stray files' rows
    val healRows = 2 * strays

    val dFull = build("t_full")
    val fullRows = liveRowsOf(dFull) // the full rewrite repays the table
    val tFull = sec { SnapshotTable.rebucket(spark, dFull) }
    val fullFiles = filesOf(dFull)

    // healed table: SPJ must be back (0 exchanges against a
    // co-bucketed dim)
    spark.sql(s"CREATE TABLE healp.d (k BIGINT, w BIGINT) " +
      s"PARTITIONED BY (bucket($buckets, k))")
    spark.sql("INSERT INTO healp.d SELECT id, id FROM range(0, 400000)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = spark.sql("SELECT count(*) AS c, sum(f.v + d.w) AS s " +
      "FROM healp.t_heal f JOIN healp.d d ON f.k = d.k")
    df.collect()
    val ex = "Exchange hashpartitioning".r.findAllIn(df.queryExecution
      .executedPlan.toString.split("== Initial Plan ==").head).size

    // at this SF both paths are fixed-overhead-dominated on local[32];
    // the scale metric is ROWS REWRITTEN — the heal repays only the
    // stray bytes, the full rewrite repays the whole table, and that
    // ratio grows linearly with table size while the stray batch stays
    // ingest-sized
    println(f"""{"heal":{"facts":$facts,"stray_rows":${2 * strays},""" +
      f""""buckets":$buckets,"files_before_heal":$filesBefore,""" +
      f""""broken_files":2,"healed_files":$healed,""" +
      f""""rows_rewritten_heal":$healRows,""" +
      f""""rows_rewritten_full":$fullRows,""" +
      f""""write_amplification_ratio":${fullRows.toDouble / healRows}%.1f,""" +
      f""""heal_sec":$tHeal%.3f,"full_rebucket_sec":$tFull%.3f,""" +
      f""""full_rebucket_files":$fullFiles,""" +
      f""""post_heal_spj_exchanges":$ex}}""")
    spark.stop()
  }
}
