package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analogues of the engine's batch semantics
  * (SURVEY §2.10: the reference is batch-only — its 12-hour lookback
  * predicate is the one time-based behavior — so these flows are the
  * beyond-parity streaming surface of the engine).
  *
  *  - [[watermarkDistinct]]: the reference's `SELECT DISTINCT … WHERE
  *    crawl_time > now-12h` scan (S1/S2/D1) as an incremental stream:
  *    the watermark bounds dedup state exactly like the lookback bounds
  *    the batch scan.
  *  - [[tumblingCounts]]: the hourly rollup (q31) with late-data
  *    handling; `approx_count_distinct` replaces the exact distinct
  *    (unbounded per-window distinct state does not scale on streams).
  *  - [[sessionize]]: gap-based sessions via
  *    `flatMapGroupsWithState` — per-user state with event-time
  *    timeouts, the streaming twin of Sessionize.sessions' two-window
  *    batch construction.
  *
  * Scale notes: all three are single-shuffle (hash partition on the
  * group key); state size is bounded by the watermark horizon, not the
  * stream length.
  */
object StreamingFlows {

  /** S1+S2+D1 as a stream: drop duplicate (keyCols, event-time) rows,
    * keeping state only inside the watermark horizon. */
  def watermarkDistinct(events: DataFrame, tsCol: String, lookback: String,
                        keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, lookback)
      .dropDuplicates(keyCols :+ tsCol)

  /** Tumbling event-time windows with late-data tolerance. */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
                     width: String = "1 hour",
                     lateness: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("n_users_approx"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_events"),
        col("n_users_approx"), col("sum_value"))

  /** [[tumblingCounts]] with the KMV sketch in place of Spark's
    * approx_count_distinct: same bounded per-window state (k hashes),
    * but the estimate is DETERMINISTIC by construction (a min-k hash
    * set is a commutative idempotent monoid — merge order, batch
    * boundaries, and partitioning cannot change it), so the streaming
    * window table can be hash-gated against an oracle that replays the
    * same min-k arithmetic. HLL's estimate is also order-independent
    * but not reproducible outside Spark; the KMV is both. */
  def tumblingCountsSketch(events: DataFrame, tsCol: String = "ts",
                           width: String = "1 hour",
                           lateness: String = "2 hours",
                           k: Int = 64): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.cat.KmvDistinct(col("user_id"), k).as("n_users_approx"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_events"),
        col("n_users_approx"), col("sum_value"))

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension frame — the standard pattern for attaching dimension
    * attributes (customer tier, source metadata) to a high-volume
    * event stream. The static side is marked for broadcast, so the
    * stream side never shuffles: at 100 TB/day of events that is the
    * difference between a map-side lookup and a continuous exchange.
    * (Spark re-plans the static side per micro-batch, so a dim refresh
    * is picked up on the next batch with no restart.) */
  def enrichAgainstStatic(events: DataFrame, dim: DataFrame,
                          key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  /** Stream-stream interval join: pair each `right` event with every
    * `left` event of the same `key` whose timestamp precedes it by at
    * most `windowMinutes` (attribution joins — purchase within an hour
    * of a view — and feature joins against a recent-context stream).
    * Both sides carry watermarks and the join condition carries the
    * time range, which is exactly what Spark needs to BOUND the join
    * state: a left row is evicted once the watermark passes
    * `leftTs + window` (no future right row could match it), so state
    * is the window's worth of each stream, not the stream's history.
    * Emission is append-mode exact for an inner join: every matching
    * pair is emitted exactly once, when the later side arrives.
    * Columns stay alias-qualified (`l.*` / `r.*`); the caller selects.
    *
    * Scale shape: one hash exchange per side on `key` (the same
    * partitioning both maintain for their state stores); no
    * broadcast, no cartesian — the interval condition is evaluated
    * inside the per-key state join. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, windowMinutes: Int,
                   lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.$rightTs >= l.$leftTs " +
        s"AND r.$rightTs <= l.$leftTs + interval $windowMinutes minutes"))
  }

  /** Transactional streaming sink: each micro-batch commits one
    * `append` version of a [[graft.sources.SnapshotTable]], stamped
    * with the batch id in an extra `__batch_id` column. Replayed
    * batches (restart after a crash between sink commit and
    * checkpoint advance — foreachBatch's documented at-least-once
    * window) are detected by batch id and skipped, upgrading the sink
    * to effectively-exactly-once the same way the Delta sink does.
    * Readers get snapshot isolation per batch for free, and
    * [[graft.sources.SnapshotTable.compact]] later repairs the
    * per-batch small files this necessarily produces at scale.
    * Returns the running query. */
  def startSnapshotSink(stream: DataFrame, dir: String, checkpoint: String,
                        statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val tag = s"stream-batch-$batchId"
        // replay detection is metadata-only: one manifest-list walk,
        // no data files opened
        val seen = graft.sources.SnapshotTable.history(spark, dir)
          .exists(_._2 == tag)
        if (!seen) {
          graft.sources.SnapshotTable.write(spark,
            batch.withColumn("__batch_id", lit(batchId)), dir, "append",
            statsCols, opTag = Some(tag))
        }
        ()
      }
      .start()

  /** Gated transactional sink with a dead-letter table: each
    * micro-batch must pass the declarative expectations to commit to
    * `dir`; a failing batch lands — whole and queryable, with the
    * failure reason — in the `quarantine` snapshot table instead of
    * killing the stream (corrupt upstream data becomes an operational
    * queue, not an outage). Same effectively-exactly-once batch-id
    * replay guard as [[startSnapshotSink]], checked against BOTH
    * tables so a replayed bad batch does not re-quarantine. */
  def startGatedSnapshotSink(stream: DataFrame, dir: String, quarantine: String,
                             checkpoint: String,
                             checks: Seq[graft.operators.Expectations.Check],
                             statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val tag = s"stream-batch-$batchId"
        def seen(d: String) =
          graft.sources.SnapshotTable.history(spark, d).exists(_._2 == tag)
        if (!seen(dir) && !seen(quarantine)) {
          val stamped = batch.withColumn("__batch_id", lit(batchId))
          // catch ONLY the expectations verdict: an infrastructure
          // IllegalStateException (publish exhaustion etc.) must kill
          // the batch, not quarantine good data with a bogus reason
          try graft.sources.SnapshotTable.writeGated(spark, stamped, dir,
            "append", checks, statsCols, opTag = Some(tag))
          catch {
            case e: graft.operators.Expectations.ExpectationsFailedException =>
              graft.sources.SnapshotTable.write(spark,
                stamped.withColumn("__reason", lit(e.getMessage)),
                quarantine, "append", Nil, opTag = Some(tag))
          }
        }
        ()
      }
      .start()

  /** CDC-apply sink: upsert each micro-batch into a snapshot table by
    * key (whole-row replace, file-granular copy-on-write MERGE). The
    * batch first collapses to one row per key — newest by `orderCol`,
    * `tieCol` breaking exact ties — because a CDC batch may carry
    * several updates for the same key and MERGE semantics need the
    * final image. First batch bootstraps the table. Same batch-id
    * replay guard as the other snapshot sinks. */
  def startMergeSink(stream: DataFrame, dir: String, keyCol: String,
                     orderCol: String, tieCol: String, checkpoint: String,
                     statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val tag = s"stream-batch-$batchId"
        if (!graft.sources.SnapshotTable.history(spark, dir).exists(_._2 == tag)) {
          val latest = graft.operators.Dedupe.keepLatest(batch, Seq(keyCol),
            orderCol, tiebreakers = Seq(col(tieCol).desc))
          if (graft.sources.SnapshotTable.latestVersion(spark, dir).isEmpty)
            graft.sources.SnapshotTable.write(spark, latest, dir, "overwrite",
              statsCols, opTag = Some(tag))
          else
            graft.sources.SnapshotTable.merge(spark, dir, latest, keyCol,
              statsCols, opTag = Some(tag))
        }
        ()
      }
      .start()

  case class BandDoc(band: Int, bandval: Long, doc_id: Long, simhash: Long,
                     event_time: java.sql.Timestamp)
  case class DupHit(doc_id: Long, dup_of: Long, hamming: Int, band: Int)
  case class BucketState(docs: List[(Long, Long)], lastMs: Long)

  /** Streaming SimHash near-duplicate detection: each arriving document
    * gets its 60-bit signature from the single-pass kernel (a map-side
    * scalar — no aggregation before the stateful step), is banded
    * 4×15 bits exactly like the batch `TextDedup.simhashPairs`, and is
    * checked against per-(band, bandval) bucket state. Emits one
    * `DupHit` per (newer doc, earlier doc) pair with Hamming distance
    * <= `maxHamming`, at the pair's first matching band only (the
    * in-row predicate both signatures allow — no cross-bucket dedup
    * state).
    *
    * State is bounded two ways: buckets expire `horizonMinutes` of
    * event time after their last arrival (event-time timeout under the
    * stream's watermark), and a bucket stops absorbing docs at
    * `maxBucket` — the streaming analogue of the batch band-bucket cap
    * (prospective rather than retroactive: docs beyond the cap are
    * ignored instead of retracting the bucket, since streams cannot
    * retract). `docs` needs columns (doc_id, text, event_time). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int,
                      lateness: String = "10 minutes",
                      horizonMinutes: Int = 60,
                      maxBucket: Int = 50): Dataset[DupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def bandOf(sh: Long, b: Int): Long = (sh >> (b * 15)) & 32767L

    def fold(key: (Int, Long), evs: Iterator[BandDoc],
             state: GroupState[BucketState]): Iterator[DupHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var kept = state.getOption.map(_.docs).getOrElse(Nil)
      var lastMs = state.getOption.map(_.lastMs).getOrElse(0L)
      val out = Seq.newBuilder[DupHit]
      val band = key._1
      evs.toSeq.sortBy(_.doc_id).foreach { e =>
        lastMs = math.max(lastMs, e.event_time.getTime)
        if (kept.size < maxBucket && !kept.exists(_._1 == e.doc_id)) {
          kept.foreach { case (oid, osh) =>
            val earlierBandMatches =
              (0 until band).exists(bp => bandOf(osh, bp) == bandOf(e.simhash, bp))
            if (!earlierBandMatches) {
              val ham = java.lang.Long.bitCount(osh ^ e.simhash)
              if (ham <= maxHamming)
                out += DupHit(math.max(e.doc_id, oid), math.min(e.doc_id, oid), ham, band)
            }
          }
          kept = (e.doc_id, e.simhash) :: kept
        }
      }
      state.update(BucketState(kept, lastMs))
      // Clamp to strictly after the current watermark: with caller-chosen
      // lateness > horizon (or a group whose last arrival lags the
      // watermark) the raw timestamp can land at/behind the watermark,
      // which Spark rejects with IllegalArgumentException and kills the
      // query. The clamp makes any parameter combination expire-eventually
      // instead of crash.
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm + 1, lastMs + horizonMinutes * 60000L))
      out.result().iterator
    }

    docs
      .withWatermark("event_time", lateness)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.cat.GraftExpr.call("simhash60", col("text").cast("string"))
          .as("simhash"),
        col("event_time"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bandval", expr("shiftright(simhash, band * 15) % 32768"))
      .select("band", "bandval", "doc_id", "simhash", "event_time")
      .as[BandDoc]
      .groupByKey(b => (b.band, b.bandval))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  case class SessEvent(user_id: Long, event_time: java.sql.Timestamp, value: Double)
  case class OpenSession(seq: Long, startUs: Long, endUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_seq: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long, sum_value: Double)

  /** Gap-based sessionization with per-user state and event-time
    * timeouts: a session closes when a newer event arrives past the gap,
    * or when the watermark passes the gap with no new events (timeout).
    * `events` needs columns (user_id, event_time: timestamp, value). */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 lateness: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fold(userId: Long, evs: Iterator[SessEvent],
             state: GroupState[OpenSession]): Iterator[Session] = {
      def close(s: OpenSession): Session =
        Session(userId, s.seq, s.startUs, s.endUs, s.n, s.sum)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).toSeq
        state.remove()
        return out.iterator
      }
      val sorted = evs.map(e => (e.event_time.getTime * 1000L, e.value)).toSeq.sortBy(_._1)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { case (us, value) =>
        open match {
          case Some(s) if us - s.endUs <= gapUs =>
            open = Some(s.copy(endUs = math.max(s.endUs, us), n = s.n + 1,
              sum = s.sum + value))
          case Some(s) =>
            closed += close(s)
            open = Some(OpenSession(s.seq + 1, us, us, 1, value))
          case None =>
            open = Some(OpenSession(1, us, us, 1, value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // fire once the watermark passes the end of the inactivity gap
        state.setTimeoutTimestamp(s.endUs / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.result().iterator
    }

    events
      .withWatermark("event_time", lateness)
      .select(col("user_id").cast("long").as("user_id"), col("event_time"),
        col("value").cast("double").as("value"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  case class FunnelEvent(user_id: Long, event_time: java.sql.Timestamp,
                         event_type: String)
  case class FunnelLists(stages: Seq[Seq[Long]], lastMs: Long, updates: Long)
  case class FunnelProgress(user_id: Long, funnel_stage: Int,
                            stage_ts_us: Seq[Long], update_seq: Long)

  /** Streaming form of `Funnel.funnelStages`: per-user progress through
    * an ordered stage sequence, exact under ANY arrival order. State
    * keeps the `maxPerStage` SMALLEST event timestamps per stage (late
    * data can only lower a stage minimum, and a lower stage-i minimum
    * can resurrect earlier stage-i+1 events — so the chain is
    * recomputed from the kept lists on every update rather than folded
    * monotonically). Within the cap this reproduces the batch operator
    * bit-for-bit (StreamingSpec pins it); state per user is bounded at
    * stages × maxPerStage longs and expires `horizonMinutes` past the
    * user's last event. Output mode is Update — downstream takes the
    * row with the highest `update_seq` per user. */
  def funnelProgress(events: DataFrame, stages: Seq[String],
                     lateness: String = "10 minutes",
                     horizonMinutes: Int = 120,
                     maxPerStage: Int = 64): Dataset[FunnelProgress] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap

    // stage i ts = min of kept list (i = 0) or min kept ts strictly
    // after the previous stage's ts; -1 once the chain breaks
    def chain(lists: Seq[Seq[Long]]): Seq[Long] =
      lists.foldLeft((Vector.empty[Long], Long.MinValue)) {
        case ((acc, prev), _) if prev == -1L => (acc :+ -1L, -1L)
        case ((acc, prev), ts) =>
          ts.find(_ > prev) match { // lists are ascending
            case Some(t) => (acc :+ t, t)
            case None => (acc :+ -1L, -1L)
          }
      }._1

    def fold(userId: Long, evs: Iterator[FunnelEvent],
             state: GroupState[FunnelLists]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val prev = state.getOption.getOrElse(
        FunnelLists(stages.map(_ => Seq.empty[Long]), 0L, 0L))
      var lists = prev.stages.toVector
      var lastMs = prev.lastMs
      evs.foreach { e =>
        lastMs = math.max(lastMs, e.event_time.getTime)
        stageIdx.get(e.event_type).foreach { i =>
          val us = e.event_time.getTime * 1000L
          if (!lists(i).contains(us))
            lists = lists.updated(i, (lists(i) :+ us).sorted.take(maxPerStage))
        }
      }
      val next = FunnelLists(lists, lastMs, prev.updates + 1)
      state.update(next)
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm + 1, lastMs + horizonMinutes * 60000L))
      val ts = chain(lists)
      Iterator.single(FunnelProgress(userId, ts.count(_ != -1L), ts, next.updates))
    }

    events
      .withWatermark("event_time", lateness)
      .select(col("user_id").cast("long").as("user_id"), col("event_time"),
        col("event_type").cast("string").as("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Streaming count-min sketch over a term stream: running (i, cell)
    * counts, the stream form of `HeavyHitters`' batch build. The
    * aggregation state is bounded at depth × width rows FOREVER — an
    * exact per-term streaming count grows state with the distinct-term
    * universe, which at corpus scale is unbounded. Cell sums are a
    * commutative monoid, so the stream materialization equals the
    * batch sketch exactly after any prefix (StreamingSpec pins this),
    * and the sketch answers the same no-false-negative heavy-hitter
    * prefilter queries as the batch side. */
  def cmsCells(terms: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 4096): DataFrame =
    terms.select(posexplode(
        graft.operators.HeavyHitters.cells(col(termCol).cast("string"), depth, width))
        .as(Seq("i", "cell")))
      .groupBy("i", "cell").agg(count(lit(1)).as("n"))
}
