package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the round-17 COMPOSITE equality deletes against the
  * single-column baseline at the same scale: epoch cost (one
  * N-column sidecar, zero data reads — must stay flat vs single),
  * and the pending-read toll of tuple masking on a wide scan
  * (composite probes an encoded-tuple set per row vs the
  * single-column typed primitive probe — this is the documented
  * allocation trade, measured, transient until purge folds it). */
object CompositeEqProbe {
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
    val rows = args.headOption.map(_.toLong).getOrElse(16000000L)
    val root = s"/tmp/graft-scale/ceq-${System.currentTimeMillis()}"

    // scrambled 2-part business key: (g, k) with per-file ranges
    // spanning the domain — the unclustered CDC worst case
    def build(name: String): String = {
      val dir = s"$root/$name"
      SnapshotTable.write(spark,
        spark.range(0, rows)
          .select(((($"id" * 2654435761L) % rows) % 1024).as("g"),
            (($"id" * 2654435761L) % rows).as("k"),
            ($"id" * 2).as("v"), lit("x" * 40).as("pad"))
          .repartition(32),
        dir, "overwrite", Seq("k"))
      dir
    }
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // read measurements divide by sub-second baselines, which wobble
    // ±30%+ per sample on this box — SPARK_GRAFT_PROBE_REPS=N medians
    // every READ timing over N samples (the bench's discipline;
    // epoch/attach timings mutate state and stay single-shot)
    val readReps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1")
      .toInt.max(1)
    def medianOf(sample: => Double): Double = {
      val xs = Seq.fill(readReps)(sample).sorted
      xs(xs.size / 2)
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))

    val batch = spark.range(0, 1000)
      .select(((($"id" * 7919L) % rows) % 1024).as("g"),
        (($"id" * 7919L) % rows).as("k"))
    def wideRead(dir: String): Double = {
      val df = spark.read.format("graft_snapshot").load(dir)
      sec { df.agg(sum($"v"), count(lit(1))).collect() }
    }
    // keyed read: the aggregation itself decodes the key columns, so
    // folded and pending legs read the SAME projection — the ratio
    // then isolates pure masking-probe overhead (the wide read's
    // pending leg must ADDITIONALLY decode the appended key columns,
    // a structural cost that grows with key arity, not a probe cost)
    def keyedRead(dir: String, keys: Seq[String]): Double = {
      val df = spark.read.format("graft_snapshot").load(dir)
      val aggs = (sum($"v") +: keys.map(c => max(col(s"`$c`")))) :+
        count(lit(1))
      sec { df.agg(aggs.head, aggs.tail: _*).collect() }
    }

    // (string, string) business key — the most common real CDC key
    // after (int, int); round-18's TypedTupleOpenHashSet arm (the
    // generic encoded-string probe measured 11.3× here pre-fix)
    def buildSS(name: String): String = {
      val dir = s"$root/$name"
      SnapshotTable.write(spark,
        spark.range(0, rows)
          .select(concat(lit("t"),
              (((($"id" * 2654435761L) % rows) % 1024)).cast("string")).as("gs"),
            concat(lit("u"),
              (($"id" * 2654435761L) % rows).cast("string")).as("ks"),
            ($"id" * 2).as("v"), lit("x" * 40).as("pad"))
          .repartition(32),
        dir, "overwrite", Nil)
      dir
    }
    val batchSS = batch.select(
      concat(lit("t"), $"g".cast("string")).as("gs"),
      concat(lit("u"), $"k".cast("string")).as("ks"))
    // 3 integral members — past the long-pair fast path's arity
    def buildIII(name: String): String = {
      val dir = s"$root/$name"
      SnapshotTable.write(spark,
        spark.range(0, rows)
          .select(((($"id" * 2654435761L) % rows) % 1024).as("g"),
            (($"id" * 2654435761L) % rows).as("k"),
            ((($"id" * 48271L) % rows) % 4096).as("j"),
            ($"id" * 2).as("v"), lit("x" * 40).as("pad"))
          .repartition(32),
        dir, "overwrite", Seq("k"))
      dir
    }
    val batchIII = spark.range(0, 1000)
      .select(((($"id" * 7919L) % rows) % 1024).as("g"),
        (($"id" * 7919L) % rows).as("k"),
        ((($"id" * 7919L) * 48271L % rows) % 4096).as("j"))

    // warm every path (pair set, typed tuple set, attach machinery)
    locally {
      val w = build("warm")
      SnapshotTable.deleteByKeys(spark, w, Seq("g", "k"), batch)
      wideRead(w)
      val wss = buildSS("warm_ss")
      SnapshotTable.deleteByKeys(spark, wss, Seq("gs", "ks"), batchSS)
      wideRead(wss)
    }
    val sDir = build("single")
    val cDir = build("composite")
    val ssDir = buildSS("ss")
    val iiiDir = buildIII("iii")
    val base = medianOf(wideRead(sDir)) // folded baseline (no pending refs)
    val baseSS = medianOf(wideRead(ssDir)) // string tables decode wider columns
    val baseIII = medianOf(wideRead(iiiDir))
    val kBase = medianOf(keyedRead(sDir, Seq("k")))
    val kBaseSS = medianOf(keyedRead(ssDir, Seq("gs", "ks")))
    val kBaseIII = medianOf(keyedRead(iiiDir, Seq("g", "k", "j")))
    val tSingle = sec {
      SnapshotTable.deleteByKey(spark, sDir, "k", batch.select($"k"))
    }
    val tComposite = sec {
      SnapshotTable.deleteByKeys(spark, cDir, Seq("g", "k"), batch)
    }
    val tSS = sec {
      SnapshotTable.deleteByKeys(spark, ssDir, Seq("gs", "ks"), batchSS)
    }
    val tIII = sec {
      SnapshotTable.deleteByKeys(spark, iiiDir, Seq("g", "k", "j"), batchIII)
    }
    val rSingle = medianOf(wideRead(sDir))
    val rComposite = medianOf(wideRead(cDir))
    val rSS = medianOf(wideRead(ssDir))
    val rIII = medianOf(wideRead(iiiDir))
    val kSingle = medianOf(keyedRead(sDir, Seq("k")))
    val kSS = medianOf(keyedRead(ssDir, Seq("gs", "ks")))
    val kIII = medianOf(keyedRead(iiiDir, Seq("g", "k", "j")))
    val nS = spark.read.format("graft_snapshot").load(sDir).count()
    val nC = spark.read.format("graft_snapshot").load(cDir).count()
    require(nC >= nS,
      s"tuple masking must delete no more rows than its member column ($nC vs $nS)")

    spark.stop()
    println(
      s"""{"metric":"composite_eq_probe","rows":$rows,"batch_keys":1000,
         |"single_epoch_sec":${f3(tSingle)},
         |"composite_epoch_sec":${f3(tComposite)},
         |"read_folded_wide_sec":${f3(base)},
         |"read_pending_single_wide_sec":${f3(rSingle)},
         |"read_pending_composite_wide_sec":${f3(rComposite)},
         |"pending_ratio_single":${f3(rSingle / base)},
         |"pending_ratio_composite":${f3(rComposite / base)},
         |"ss_epoch_sec":${f3(tSS)},"iii_epoch_sec":${f3(tIII)},
         |"read_folded_ss_sec":${f3(baseSS)},
         |"read_pending_ss_sec":${f3(rSS)},
         |"pending_ratio_ss":${f3(rSS / baseSS)},
         |"read_folded_iii_sec":${f3(baseIII)},
         |"read_pending_iii_sec":${f3(rIII)},
         |"pending_ratio_iii":${f3(rIII / baseIII)},
         |"keyed_ratio_single":${f3(kSingle / kBase)},
         |"keyed_ratio_ss":${f3(kSS / kBaseSS)},
         |"keyed_ratio_iii":${f3(kIII / kBaseIII)}}"""
        .stripMargin.replace("\n", ""))
  }
}
