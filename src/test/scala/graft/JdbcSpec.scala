package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** JDBC round trips against embedded Derby (the same spark-jdbc path a
  * Postgres production sink uses). */
class JdbcSpec extends SparkTestBase {

  import spark.implicits._

  private val url =
    s"jdbc:derby:${Files.createTempDirectory("graft-derby")}/db;create=true"

  test("S4 append + S1 filtered read-back (predicate pushed to the db)") {
    val df = (1 to 100).map(i => (i.toLong, s"n$i", i * 1.5)).toDF("id", "name", "v")
    Jdbc.append(df, url, "t_append")
    val back = Jdbc.read(spark, url, "t_append").filter(col("id") <= 10)
    assert(back.count() == 10)
    // the jdbc relation reports the pushed predicate
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan.take(400))
    assert(back.agg(sum("id")).collect()(0).getLong(0) == 55)
  }

  test("S5 truncate-and-load replaces content, keeps the table") {
    val v1 = (1 to 5).map(i => (i.toLong, s"a$i")).toDF("id", "name")
    val v2 = Seq((100L, "b1"), (200L, "b2")).toDF("id", "name")
    Jdbc.append(v1, url, "t_refresh")
    Jdbc.truncateAndLoad(v2, url, "t_refresh")
    val back = Jdbc.read(spark, url, "t_refresh")
    assert(back.count() == 2)
    assert(back.select("id").as[Long].collect().toSet == Set(100L, 200L))
  }
}
