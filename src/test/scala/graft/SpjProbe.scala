package graft

import org.apache.spark.sql.SparkSession

/** Measures what storage-partitioned joins buy (test scope): two
  * tables bucketed alike on the join key, the same fact-to-fact join
  * run shuffled (v2 bucketing off) vs SPJ (on). Min of 5 warm runs —
  * the SCALE family's single warm sample is too noisy to grade a
  * planner feature. Also pins the plan shapes: 2 hash exchanges off,
  * 0 on. */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val facts = 4000000L
    val dims = 400000L
    val buckets = 32
    val root = s"/tmp/graft-scale/spjprobe-${System.currentTimeMillis()}"
    spark.conf.set("spark.sql.catalog.spjp",
      "graft.sources.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjp.root", root)
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(root))
    spark.sql("CREATE TABLE spjp.f (k BIGINT, v BIGINT, pad STRING) " +
      s"PARTITIONED BY (bucket($buckets, k))")
    spark.sql("CREATE TABLE spjp.d (k BIGINT, w BIGINT) " +
      s"PARTITIONED BY (bucket($buckets, k))")
    spark.sql(s"INSERT INTO spjp.f SELECT id % $dims, id, " +
      s"repeat('x', 40) FROM range(0, $facts)")
    spark.sql(s"INSERT INTO spjp.d SELECT id, id * 7 FROM range(0, $dims)")
    val q = "SELECT count(*) AS c, sum(f.v + d.w) AS s " +
      "FROM spjp.f f JOIN spjp.d d ON f.k = d.k"
    def minSec(body: => Unit): Double = {
      body
      (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      // final plan only: AQE's toString appends the pre-adaptive
      // initial plan, which would double-count
      "Exchange hashpartitioning".r.findAllIn(df.queryExecution
        .executedPlan.toString.split("== Initial Plan ==").head).size
    }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val exOff = exchanges(spark.sql(q))
    val tOff = minSec(spark.sql(q).collect())
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val exOn = exchanges(spark.sql(q))
    val tOn = minSec(spark.sql(q).collect())
    // sorted one-file buckets: the SMJ's per-partition sorts go too
    spark.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    def sorts(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "Sort \\[".r.findAllIn(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head).size
    }
    val sOn = sorts(spark.sql(q))
    val tSorted = minSec(spark.sql(q).collect())
    println(f"""{"spj":{"facts":$facts,"dims":$dims,"buckets":$buckets,""" +
      f""""exchanges_off":$exOff,"exchanges_on":$exOn,""" +
      f""""join_sec_off":$tOff%.4f,"join_sec_on":$tOn%.4f,""" +
      f""""speedup":${tOff / tOn}%.3f,""" +
      f""""sorts_with_sorting_conf":$sOn,"join_sec_sorted":$tSorted%.4f,""" +
      f""""speedup_sorted":${tOff / tSorted}%.3f}}""")
    spark.stop()
  }
}
