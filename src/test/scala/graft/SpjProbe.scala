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
    // pushPartValues: a bucket-pruned scan reports only its LIVE
    // buckets, so a selective join launches live-bucket tasks instead
    // of `buckets` mostly-empty ones — Spark's own partition-value
    // reconciliation fills the gaps on the other side and the join
    // stays shuffle-free. The empty-task floor matters at large n:
    // bucket(4096) point joins would otherwise pay 4096 task launches
    // to read one bucket.
    val liveKeys = (0 until 5).map(_ * 7L + 1) // hashes to <= 5 buckets
    val qPruned = s"SELECT count(*) AS c, sum(f.v + d.w) AS s " +
      s"FROM spjp.f f JOIN spjp.d d ON f.k = d.k " +
      s"WHERE f.k IN (${liveKeys.mkString(",")}) " +
      s"AND d.k IN (${liveKeys.mkString(",")})"
    val prunedDf = spark.sql(qPruned)
    prunedDf.collect()
    val exPruned = exchanges(spark.sql(qPruned))
    // task counts live under AQE's FINAL plan; QueryStageExec is a
    // LEAF node, so plain collect() never sees inside a stage —
    // recurse through both wrappers explicitly
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(qs.plan)
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(s.inputPartitions.size)
        case other => other.children.flatMap(scansOf)
      }
    val scanTasks = scansOf(prunedDf.queryExecution.executedPlan)
    val liveBuckets = liveKeys
      .map(k => Math.floorMod(org.apache.spark.sql.catalyst.expressions
        .Murmur3HashFunction.hash(k, org.apache.spark.sql.types.LongType,
          42L).toInt, buckets)).distinct.size
    println(f"""{"spj":{"facts":$facts,"dims":$dims,"buckets":$buckets,""" +
      f""""exchanges_off":$exOff,"exchanges_on":$exOn,""" +
      f""""join_sec_off":$tOff%.4f,"join_sec_on":$tOn%.4f,""" +
      f""""speedup":${tOff / tOn}%.3f,""" +
      f""""sorts_with_sorting_conf":$sOn,"join_sec_sorted":$tSorted%.4f,""" +
      f""""speedup_sorted":${tOff / tSorted}%.3f,""" +
      f""""pruned_join_exchanges":$exPruned,""" +
      f""""pruned_live_buckets":$liveBuckets,""" +
      f""""pruned_scan_tasks":${scanTasks.mkString("[", ",", "]")}}}""")
    spark.stop()
  }
}
