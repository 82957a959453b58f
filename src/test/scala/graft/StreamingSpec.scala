package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFlows

/** Structured Streaming flows driven through MemoryStream. */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  /** 2024-01-01 00:00 UTC base (hour-aligned): epoch-0 event times sit
    * exactly on the initial watermark and are filtered as late. */
  private val BaseMs = 1704067200000L
  private def ts(minutes: Long): Timestamp = new Timestamp(BaseMs + minutes * 60000L)

  test("watermarkDistinct drops in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFlows.watermarkDistinct(
      in.toDF().toDF("user_id", "ts", "value"), "ts", "1 hour", Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("wm_distinct")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0), 1.0), (1L, ts(0), 1.0), (2L, ts(1), 2.0))
      q.processAllAvailable()
      assert(spark.table("wm_distinct").count() == 2)
    } finally q.stop()
  }

  test("watermarkDistinct: file-source replay emits exactly the MemoryStream emission") {
    // q5N runs through a file stream (the production ingestion shape);
    // this pins that chunked file replay and chunked MemoryStream
    // replay are the SAME flow — same per-chunk micro-batch rounds,
    // same cross-chunk dedup state, same emission set.
    implicit val sqlCtx = spark.sqlContext
    // duplicates within chunk 1 (u1), across chunks (u2), and a
    // distinct singleton per chunk; chunk 2 sits past chunk 1's times
    val c1 = Seq((1L, ts(10), "view"), (1L, ts(10), "view"),
      (2L, ts(12), "click"), (3L, ts(14), "view"))
    val c2 = Seq((2L, ts(12), "click"), (4L, ts(40), "view"),
      (4L, ts(40), "view"))

    def emission(rows: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
      rows.select(col("user_id"), expr("unix_micros(ts)"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    // MemoryStream replay
    val in = MemoryStream[(Long, Timestamp, String)]
    val mem = StreamingFlows.watermarkDistinct(
      in.toDF().toDF("user_id", "ts", "event_type"), "ts", "1 hour",
      Seq("user_id", "event_type"))
    val qm = mem.writeStream.format("memory").queryName("wmd_mem")
      .outputMode("append").start()
    try {
      in.addData(c1: _*); qm.processAllAvailable()
      in.addData(c2: _*); qm.processAllAvailable()
    } finally qm.stop()

    // file-source replay: one chunk written per micro-batch round
    val feed = java.nio.file.Files.createTempDirectory("wmd_feed").toString
    val df1 = c1.toDF("user_id", "ts", "event_type")
    df1.write.mode("overwrite").parquet(feed)
    val fin = spark.readStream.schema(df1.schema).parquet(feed)
    val fil = StreamingFlows.watermarkDistinct(
      fin, "ts", "1 hour", Seq("user_id", "event_type"))
    val qf = fil.writeStream.format("memory").queryName("wmd_file")
      .outputMode("append").start()
    try {
      qf.processAllAvailable()
      c2.toDF("user_id", "ts", "event_type").write.mode("append").parquet(feed)
      qf.processAllAvailable()
    } finally qf.stop()

    val memOut = emission(spark.table("wmd_mem"))
    val fileOut = emission(spark.table("wmd_file"))
    assert(memOut == fileOut,
      s"file replay diverged from MemoryStream replay:\n $fileOut\n vs $memOut")
    // and both are exactly DISTINCT over the feed: u1's in-chunk dup,
    // u2's cross-chunk dup, and u4's in-chunk dup all collapse
    assert(memOut.size == 4)
  }

  test("tumblingCounts aggregates closed event-time windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFlows.tumblingCounts(
      in.toDF().toDF("user_id", "ts", "value"), "ts", "1 hour", "0 seconds")
    val q = out.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(10), 1.0), (2L, ts(20), 2.0), (1L, ts(50), 3.0))
      q.processAllAvailable()
      in.addData((3L, ts(70), 4.0)) // advances the watermark past hour 0
      q.processAllAvailable()
      in.addData((3L, ts(130), 5.0)) // closes hour 1
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("window_start", "n_events", "sum_value")
        .as[(Timestamp, Long, Double)].collect()
        .map { case (w, n, s) => ((w.getTime - BaseMs) / 60000L, (n, s)) }.toMap
      assert(rows.get(0L).map(_._1) == Some(3L))
      assert(rows.get(0L).map(_._2) == Some(6.0))
      assert(rows.get(60L).map(_._1) == Some(1L))
    } finally q.stop()
  }

  test("streaming funnel equals the batch operator under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    // full event set; the stream delivers it ACROSS batches out of order
    val all = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "purchase"),
      (3L, ts(4), "view"), (3L, ts(4), "click"),
      (4L, ts(5), "view"), (4L, ts(6), "error"))
    // batch 1 holds the LATER events; the early view/click arrive late
    val (batch2, batch1) = all.partition(e => e._2.getTime <= ts(2).getTime)
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFlows.funnelProgress(
      in.toDF().toDF("user_id", "event_time", "event_type"), stages)
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("funnel_stream")
        .orderBy(col("update_seq").desc).collect()
        .groupBy(_.getLong(0)).map { case (u, rows) =>
          u -> (rows.head.getInt(1), rows.head.getSeq[Long](2)) }
      val batch = graft.operators.Funnel.funnelStages(
          all.toDF("user_id", "ts", "event_type"), "user_id", "ts",
          "event_type", stages)
        .collect().map { r =>
          val ts3 = (1 to 3).map(i => Option(r.getTimestamp(i))
            .map(_.getTime * 1000L).getOrElse(-1L))
          r.getLong(0) -> (r.getInt(4), ts3)
        }.toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (u, (stage, ts3)) =>
        assert(streamed(u)._1 == stage, s"user $u stage")
        assert(streamed(u)._2 == ts3, s"user $u stage timestamps")
      }
      // the out-of-order view resurrected u1's full chain
      assert(streamed(1L)._1 == 3)
    } finally q.stop()
  }

  test("streaming CMS cells equal the batch sketch after any prefix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamingFlows.cmsCells(in.toDF().toDF("term"), "term",
      depth = 3, width = 64)
    val q = out.writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      val batch1 = (1 to 40).map(i => s"t${i % 7}")
      val batch2 = (1 to 25).map(i => s"u${i % 5}")
      in.addData(batch1: _*)
      q.processAllAvailable()
      def batchCells(data: Seq[String]) =
        StreamingFlows.cmsCells(data.toDF("term"), "term", depth = 3, width = 64)
      // prefix parity after batch 1
      assert(spark.table("cms_cells").exceptAll(batchCells(batch1)).isEmpty &&
        batchCells(batch1).exceptAll(spark.table("cms_cells")).isEmpty)
      in.addData(batch2: _*)
      q.processAllAvailable()
      // monoid parity over the full stream
      val full = batchCells(batch1 ++ batch2)
      assert(spark.table("cms_cells").exceptAll(full).isEmpty &&
        full.exceptAll(spark.table("cms_cells")).isEmpty)
      // state is sketch-bounded: never more than depth x width rows
      assert(spark.table("cms_cells").count() <= 3L * 64)
    } finally q.stop()
  }

  test("snapshotSink commits one version per batch; restart replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-snap-ckpt").toString
    val in = MemoryStream[(Long, Double)]
    val df = in.toDF().toDF("id", "value")
    val q = StreamingFlows.startSnapshotSink(df, dir, ckpt, Seq("id"))
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      in.addData((3L, 3.0))
      q.processAllAvailable()
      assert(SnapshotTable.scan(spark, dir).count() == 3)
      val hist = SnapshotTable.history(spark, dir)
      assert(hist.map(_._2) == Seq("stream-batch-0", "stream-batch-1"))
    } finally q.stop()
    // restart from the same checkpoint: Spark replays any batch whose
    // sink-side work it cannot prove complete; the op-tag guard must
    // keep the table unchanged rather than double-append
    val in2 = MemoryStream[(Long, Double)]
    in2.addData((1L, 1.0), (2L, 2.0))
    in2.addData((3L, 3.0))
    val q2 = StreamingFlows.startSnapshotSink(
      in2.toDF().toDF("id", "value"), dir, ckpt, Seq("id"))
    try {
      in2.addData((4L, 4.0)) // a genuinely new batch still lands
      q2.processAllAvailable()
      assert(SnapshotTable.scan(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      // per-batch snapshot isolation: version 1 is still batch 0 alone
      assert(SnapshotTable.scan(spark, dir, Some(1L)).count() == 2)
    } finally q2.stop()
  }

  test("gated snapshot sink quarantines a bad batch, commits the good ones") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Expectations
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-sink").toString
    val quar = java.nio.file.Files.createTempDirectory("graft-gate-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString
    val in = MemoryStream[(Long, Double)]
    val q = StreamingFlows.startGatedSnapshotSink(
      in.toDF().toDF("id", "value"), dir, quar, ckpt,
      checks = Seq(Expectations.inRange("value", 0.0, 100.0)))
    try {
      in.addData((1L, 1.0), (2L, 2.0)) // good
      q.processAllAvailable()
      in.addData((3L, 9999.0), (4L, 4.0)) // batch poisoned by one row
      q.processAllAvailable()
      in.addData((5L, 5.0)) // good again — stream survived the bad batch
      q.processAllAvailable()
      assert(SnapshotTable.scan(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
      val quarantined = SnapshotTable.scan(spark, quar)
      assert(quarantined.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
      assert(quarantined.select("__reason").distinct().as[String].head()
        .contains("in_range:value"))
      // the dead-letter rows carry their batch id for reprocessing
      assert(quarantined.select("__batch_id").distinct().as[Long].head() == 1L)
    } finally q.stop()
  }

  test("merge sink applies CDC batches: latest image per key wins") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val in = MemoryStream[(Long, Double, Long)]
    val q = StreamingFlows.startMergeSink(
      in.toDF().toDF("id", "value", "seq"), dir,
      keyCol = "id", orderCol = "seq", tieCol = "id", ckpt, Seq("id"))
    try {
      in.addData((1L, 10.0, 1L), (2L, 20.0, 2L))
      q.processAllAvailable()
      // one batch carrying two updates for id=1: seq 4 must win
      in.addData((1L, 11.0, 3L), (1L, 12.0, 4L), (3L, 30.0, 5L))
      q.processAllAvailable()
      val rows = SnapshotTable.scan(spark, dir)
        .select("id", "value").as[(Long, Double)].collect().toMap
      assert(rows == Map(1L -> 12.0, 2L -> 20.0, 3L -> 30.0))
      val hist = SnapshotTable.history(spark, dir)
      assert(hist.map(_._2) == Seq("stream-batch-0", "stream-batch-1"))
      // time travel: before the CDC batch, id=1 still held 10.0
      assert(SnapshotTable.scan(spark, dir, Some(1L))
        .filter($"id" === 1L).select("value").as[Double].head() == 10.0)
    } finally q.stop()
  }

  test("simhashNearDups emits a near-dup pair once, skips distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = base.replace("mu", "nu")
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingFlows.simhashNearDups(
      in.toDF().toDF("doc_id", "text", "event_time"), maxHamming = 6,
      lateness = "0 seconds")
    val q = out.writeStream.format("memory").queryName("neardups")
      .outputMode("append").start()
    try {
      in.addData((1L, base, ts(0)), (3L, far, ts(1)))
      q.processAllAvailable()
      in.addData((2L, near, ts(2)))
      q.processAllAvailable()
      val hits = spark.table("neardups").as[StreamingFlows.DupHit].collect()
      // exactly one emission for the (2,1) pair despite 4 candidate bands
      assert(hits.map(h => (h.doc_id, h.dup_of)).toSeq == Seq((2L, 1L)))
      assert(hits.head.hamming <= 6)
      // batch parity: the streamed signatures match TextDedup.simhash
      val batch = graft.operators.TextDedup.simhashPairs(
        Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 6).collect()
      assert(batch.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("sessionize closes sessions by gap and by watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFlows.sessionize(
      in.toDF().toDF("user_id", "event_time", "value"), gapMinutes = 30,
      lateness = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0 and 5 min (one session), then 100 min (new session)
      in.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
      q.processAllAvailable()
      in.addData((1L, ts(100), 3.0)) // gap > 30 min -> closes session 1
      q.processAllAvailable()
      val afterGap = spark.table("sessions")
        .as[StreamingFlows.Session].collect()
      assert(afterGap.exists(s =>
        s.user_id == 1 && s.session_seq == 1 && s.n_events == 2 && s.sum_value == 3.0))
      // advance the watermark far past 100min + gap so the open session
      // times out (timeouts fire on the batch after the watermark moves)
      in.addData((2L, ts(500), 9.0))
      q.processAllAvailable()
      in.addData((2L, ts(501), 1.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions")
        .as[StreamingFlows.Session].collect()
      assert(afterTimeout.exists(s =>
        s.user_id == 1 && s.session_seq == 2 && s.n_events == 1 && s.sum_value == 3.0))
    } finally q.stop()
  }

  test("enrichAgainstStatic equals the batch join, stream side unshuffled") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingFlows.enrichAgainstStatic(
      in.toDF().toDF("user_id", "ts", "value"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(1), 10.0), (2L, ts(2), 20.0), (9L, ts(3), 30.0))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("user_id", "value", "tier").as[(Long, Double, String)]
        .collect().toSet
      // inner join: the dim-less user drops, exactly as in batch
      assert(got == Set((1L, 10.0, "gold"), (2L, 20.0, "silver")))
    } finally q.stop()
  }
}
