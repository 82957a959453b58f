package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sinks

/** S4-S8 sink semantics over parquet table dirs (loader.py:15-348). */
class SinksSpec extends SparkTestBase {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-sinks").toString

  private def readIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("id").as[Long].collect().toSet

  test("S5 truncate-and-load replaces content and keeps a backup") {
    val root = freshRoot()
    val v1 = Seq(1L, 2L, 3L).toDF("id")
    val v2 = Seq(10L, 20L).toDF("id")
    assert(Sinks.truncateAndLoad(spark, v1, s"$root/t", s"$root/bk", "t", 1000L) == 3)
    assert(Sinks.truncateAndLoad(spark, v2, s"$root/t", s"$root/bk", "t", 2000L) == 2)
    assert(readIds(s"$root/t") == Set(10L, 20L))
    val backups = Sinks.listBackups(spark, s"$root/bk", "t")
    assert(backups.size == 1) // first load had nothing to back up
    assert(readIds(s"$root/bk/${backups.head}") == Set(1L, 2L, 3L))
  }

  test("S5/S7 failed load rolls back to the backup") {
    val root = freshRoot()
    val v1 = Seq(1L, 2L).toDF("id")
    Sinks.truncateAndLoad(spark, v1, s"$root/t", s"$root/bk", "t", 1000L)
    val poison = spark.range(3)
      .select(when(col("id") < 2, col("id"))
        .otherwise(expr("raise_error('boom')").cast("long")).as("id"))
    intercept[Exception] {
      Sinks.truncateAndLoad(spark, poison, s"$root/t", s"$root/bk", "t", 2000L)
    }
    assert(readIds(s"$root/t") == Set(1L, 2L)) // restored
  }

  test("S5 crash between verified write and publish leaves the old table intact") {
    val root = freshRoot()
    val v1 = Seq(1L, 2L, 3L).toDF("id")
    Sinks.truncateAndLoad(spark, v1, s"$root/t", s"$root/bk", "t", 1000L)
    // the new data is fully written and verified in staging; the crash
    // hits immediately before the publish renames
    intercept[RuntimeException] {
      Sinks.truncateAndLoad(spark, Seq(9L).toDF("id"), s"$root/t", s"$root/bk", "t",
        2000L, commitHook = () => throw new RuntimeException("crash before commit"))
    }
    // reader still sees the OLD table — not the new rows, not a torn dir
    assert(readIds(s"$root/t") == Set(1L, 2L, 3L))
    // staging is cleaned up, nothing half-published
    val leftovers = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(leftovers == Set("t", "bk"), s"unexpected leftovers: $leftovers")
    // and a subsequent load still succeeds normally
    assert(Sinks.truncateAndLoad(spark, Seq(7L, 8L).toDF("id"),
      s"$root/t", s"$root/bk", "t", 3000L) == 2)
    assert(readIds(s"$root/t") == Set(7L, 8L))
  }

  test("S8 retention keeps the newest maxBackups") {
    val root = freshRoot()
    (1 to 5).foreach { i =>
      Sinks.truncateAndLoad(spark, Seq(i.toLong).toDF("id"),
        s"$root/t", s"$root/bk", "t", i * 1000L, maxBackups = 3)
    }
    val left = Sinks.listBackups(spark, s"$root/bk", "t")
    // loads 2..5 create backups (of loads 1..4); retention keeps newest 3
    assert(left.size == 3)
    assert(readIds(s"$root/bk/${left.head}") == Set(4L))
  }

  test("F-E gds_type load gate drops null rows, observes the reject count") {
    val root = freshRoot()
    val df = Seq((1L, Option("AMADEUS")), (2L, None), (3L, Option("SABRE")),
      (4L, None), (5L, Option("AMADEUS"))).toDF("id", "gds_type")
    val obs = org.apache.spark.sql.Observation()
    val loaded = Sinks.truncateAndLoad(spark, df, s"$root/t", s"$root/bk", "t", 1000L,
      gateCol = Some("gds_type"), gateObs = Some(obs))
    assert(loaded == 3)
    assert(readIds(s"$root/t") == Set(1L, 3L, 5L))
    assert(obs.get("rejected").asInstanceOf[Long] == 2L)
    assert(obs.get("input_rows").asInstanceOf[Long] == 5L)
  }

  test("S4 append-load verifies the read-back count") {
    val root = freshRoot()
    assert(Sinks.appendLoad(spark, Seq(1L, 2L).toDF("id"), s"$root/t") == 2)
    assert(Sinks.appendLoad(spark, Seq(3L).toDF("id"), s"$root/t") == 1)
    assert(readIds(s"$root/t") == Set(1L, 2L, 3L))
  }
}
