package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): runs named
  * catalog queries once (after the same warmup Bench does) with a
  * listener that records every Spark job's wall time and call site,
  * then prints a per-job breakdown. This is how "q7T is 9 s" becomes
  * "q7T is 14 jobs and the window collapse recomputes 4x per epoch" —
  * the empirical half of the measure-first loop. Reporting tool only:
  * the bench contract lives in [[Bench]], unchanged.
  *
  * Usage: SPARK_GRAFT_PROFILE_ONLY=q7T,q7M sbt "runMain graft.ProfileQuery"
  */
object ProfileQuery {

  private final case class JobRec(id: Int, site: String, start: Long,
                                  var end: Long = -1L, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
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

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    @volatile var capture = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) {
        // the result stage's name IS the action's short call site
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs.put(e.jobId, JobRec(e.jobId, site, e.time,
          tasks = e.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // same warmup as Bench: JIT/codegen + computeTable staging
    spark.range(1000000).selectExpr("sum(id) s", "count(distinct id % 7) c")
      .repartition(2).count()
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(tbl => graft.sources.Tables.computeTable(spark, sfDir, tbl).count())
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // one untimed warm pass (codegen cache), matching Bench methodology
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      new java.io.File(sfDir).getParentFile match {
        case null => "/root/testdata/sf0.001"
        case p    => new java.io.File(p, "sf0.001").getPath
      })
    if (new java.io.File(warmDir).isDirectory)
      catalog.foreach { case (name, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }

    catalog.foreach { case (name, fn) =>
      jobs.clear()
      capture = true
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch {
        case t: Throwable =>
          System.err.println(s"[profile] $name FAILED: ${t.getMessage}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      Thread.sleep(200) // let the listener bus drain job-end events
      val recs = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.toSeq.sortBy(_.id)
      }
      val jobSum = recs.collect { case r if r.end > 0 => (r.end - r.start) / 1e3 }.sum
      println(f"== $name wall=$wall%.3f s, ${recs.size} jobs, sum(job)=$jobSum%.3f s, gap=${wall - jobSum}%.3f s")
      // aggregate by call site so repeated shapes read as one line
      recs.groupBy(_.site).toSeq
        .map { case (site, rs) =>
          (site, rs.size, rs.map(r => if (r.end > 0) (r.end - r.start) / 1e3 else 0.0).sum,
            rs.map(_.tasks).sum)
        }
        .sortBy(-_._3)
        .foreach { case (site, n, sec, tasks) =>
          println(f"   $sec%8.3f s  n=$n%-3d tasks=$tasks%-5d $site")
        }
    }
    spark.stop()
  }
}
