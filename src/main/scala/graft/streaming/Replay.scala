package graft.streaming

/** Driver-memory contract for MemoryStream fixture replays.
  *
  * The streaming oracle queries (q54…q5Q) replay a bounded parquet
  * fixture through `MemoryStream.addData`, which requires the slice to
  * be driver-local — that is harness plumbing, not the operator under
  * test (a deployment reads Kafka/files and never collects). The
  * contract is made EXPLICIT here instead of implicit in fixture size:
  * every replay slice flows through [[BoundedReplay.boundedCollect]],
  * which caps the collected rows at [[MaxRows]] and fails loudly —
  * never truncates silently, which would corrupt the oracle — if a
  * future fixture outgrows the bound. At the driver this is at most
  * ~2M small tuples (≲ a few hundred MB), far below the harness heap;
  * the cap is ~20× the sf0.1 fixture so scale-factor bumps hit the
  * require() before they hit an OOM.
  *
  * Task-size contract (round-17): every replay constructs its
  * `MemoryStream[A](numPartitions = …)` — a partition-less stream
  * plans each added chunk as ONE input partition whose rows ride the
  * task binary (the bench flagged ~2.8 MB tasks at sf0.1). Event
  * tuples split 16 ways; DOCUMENT-TEXT replays split 64 (each row
  * carries the full text, so the per-row payload is ~50× an event
  * tuple's). Either way the engine under test sees an ordinary
  * multi-partition source.
  */
object Replay {

  /** Hard ceiling on rows a replay may hold on the driver. */
  val MaxRows: Int = 2000000

  implicit class BoundedReplay[T](private val ds: org.apache.spark.sql.Dataset[T])
      extends AnyVal {

    /** `collect()` with the replay driver-memory contract: pulls at
      * most `cap + 1` rows (the limit bounds the transfer itself, not
      * just the check) and refuses to proceed past the cap. */
    def boundedCollect(cap: Int = MaxRows): Array[T] = {
      val rows = ds.limit(cap + 1).collect()
      require(rows.length <= cap,
        s"MemoryStream replay slice exceeds the $cap-row driver bound; " +
          "replay this source through a file stream instead of addData")
      rows
    }
  }
}
