package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.functions.cat.GraftExpr.StringKernelCall

/** SparkSessionExtensions surface: SQL-registered kernel functions and
  * the idempotent-normalize optimizer rule. */
class PlansSpec extends SparkTestBase {

  test("graft_* functions are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_flight_norm('ci 73') AS fn,
        |       graft_flight_valid('CI073') AS fv,
        |       graft_key_norm('  a  b ') AS kn,
        |       graft_duration_minutes('0 days 02:05:00') AS dm,
        |       graft_time_hhmm('dep at 7:45 local') AS th
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "CI073")
    assert(row.getBoolean(1))
    assert(row.getString(2) == "A B")
    assert(row.getInt(3) == 125)
    assert(row.getString(4) == "07:45")
  }

  test("parameterized graft_* functions and the KMV aggregate work from SQL") {
    val row = spark.sql(
      """SELECT size(graft_shingle_hashes('a b c d e f', 5)) AS nsh,
        |       size(graft_minhash32('a b c d e f', 5)) AS nmh,
        |       size(graft_lsh_buckets(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 4, 8)) AS nb,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |       graft_simhash60('w1 w2 w3') AS sh
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) == 2 && row.getInt(1) == 32 && row.getInt(2) == 4)
    assert(row.getDouble(3) == 1.0)
    spark.range(100).selectExpr("CAST(id % 7 AS STRING) AS v")
      .createOrReplaceTempView("kmv_in")
    val est = spark.sql("SELECT graft_kmv_distinct(v, 64) FROM kmv_in")
      .collect()(0).getDouble(0)
    assert(est == 7.0) // below k -> exact
  }

  test("q29/q2A timed paths carry no interpreted HigherOrderFunction") {
    // The production LSH paths bucket through the codegen'd signBucket
    // kernel; the combinator (aggregate/zip_with/transform, which never
    // joins whole-stage codegen) must not appear anywhere in the
    // optimized plans of the catalogued queries.
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q29_ann_lsh", "q2A_cosine_neardup")) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      val hofs = plan.collect { case p => p.expressions.flatMap(_.collect {
        case h: HigherOrderFunction => h }) }.flatten
      assert(hofs.isEmpty, s"$name still evaluates interpreted HOFs: $hofs")
    }
  }

  test("PQ paths score through codegen'd kernels, no interpreted HOFs") {
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q4I_pq_topk", "q4K_ann_ivfpq")) {
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      val plan = qe.optimizedPlan
      val hofs = plan.collect { case p => p.expressions.flatMap(_.collect {
        case h: HigherOrderFunction => h }) }.flatten
      assert(hofs.isEmpty, s"$name evaluates interpreted HOFs: $hofs")
      val s = plan.toString
      assert(s.contains("graft_pq_lut") && s.contains("graft_pq_adc_sum"),
        s"$name lost its PQ kernels:\n$s")
    }
  }

  test("q40 flagship plan shape: broadcast joins only, bounded exchanges") {
    // The 5-way synthesis join must stay broadcast (dims are small at
    // any SF because competitor frames derive from filtered slices) and
    // the whole pipeline must keep its single dedup exchange — a
    // SortMergeJoin or extra shuffle here is an optimizer/plan
    // regression that multiplies cost at 100 TB.
    val plan = SparkEntry.queries("q40_flight_pipeline")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "flagship fell back to SortMergeJoin")
    assert(!plan.contains("CartesianProduct"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"flagship grew to $exchanges hash exchanges")
  }

  test("corpus-stats plan shapes: sketch prune map-side, group limit, one funnel exchange") {
    val dir = "/root/testdata/sf0.001"
    // q4T: the CMS estimate filter must sit BELOW the exact count's
    // exchange (map-side prune) — i.e. deeper in the printed tree than
    // the last Exchange. If it migrates above, the exact groupBy
    // shuffles the full term universe and the sketch is pointless.
    val hh = SparkEntry.queries("q4T_heavy_hitters")(spark, dir)
      .queryExecution.executedPlan.toString
    val pruneAt = hh.indexOf("least(element_at")
    assert(pruneAt >= 0, s"CMS prune filter disappeared:\n$hh")
    assert(pruneAt > hh.lastIndexOf("Exchange"),
      "CMS prune is no longer below the aggregation exchange (map-side)")
    // q4U: per-predecessor top-k must keep its partial WindowGroupLimit
    val lm = SparkEntry.queries("q4U_bigram_lm")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(lm.contains("WindowGroupLimit"), s"q4U lost WindowGroupLimit:\n$lm")
    // q4W: one data exchange serves all three stage windows
    val fn = SparkEntry.queries("q4W_funnel")(spark, dir)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(fn).size
    assert(hashEx == 1, s"funnel grew to $hashEx hash exchanges:\n$fn")
    // q4X: the wedge join must stay an equi-join — a nested-loop or
    // cartesian here is quadratic in edges
    val tri = SparkEntry.queries("q4X_triangles")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!tri.contains("CartesianProduct") &&
      !tri.contains("BroadcastNestedLoopJoin"),
      s"triangle join degenerated:\n$tri")
  }

  test("temporal join plan shapes: equi-bin joins, never nested-loop") {
    val dir = "/root/testdata/sf0.001"
    // q6A: the double inequality must ride the equi-bin hash join —
    // a BroadcastNestedLoopJoin/Cartesian here is O(|A|·|B|) per key
    val ov = SparkEntry.queries("q6A_interval_overlap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!ov.contains("CartesianProduct") &&
      !ov.contains("BroadcastNestedLoopJoin"),
      s"interval overlap degenerated to a nested loop:\n$ov")
    // q6B: forward as-of stays join-free (one window, no join operator)
    val fwd = SparkEntry.queries("q6B_asof_forward")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!fwd.contains("Join"), s"forward as-of grew a join:\n$fwd")
    // q5X: the KMV overlap never joins the element sets — the only
    // join is the 1×1 sketch cross (broadcast); the exact ground truth
    // is a plain aggregate
    val kmv = SparkEntry.queries("q5X_kmv_overlap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!kmv.contains("SortMergeJoin") && !kmv.contains("CartesianProduct"),
      s"KMV overlap joined the full sets:\n$kmv")
  }

  test("lmFitScore model joins broadcast; per-occurrence side never SMJ on w1") {
    // The bigram (w1,w2) and unigram (w1) model tables are slim
    // re-aggregations (vocab-sized); the per-occurrence doc side is
    // corpus-sized and Zipf-skewed on w1 ("the" is a hot key). The
    // model sides must resolve to BROADCAST — a SortMergeJoin would
    // shuffle every bigram occurrence on a skewed key, the exact
    // hot-key exchange TfIdf's vocabulary join is pinned against.
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q5A_lm_score")(spark, dir)
    df.count() // let AQE finalize its join strategy decisions
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"lmFitScore model join fell back to SortMergeJoin:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"lmFitScore lost its broadcast model joins:\n$plan")

    // Zipf fixture: one dominant predecessor (80% of bigrams share w1)
    // — the broadcast decision must hold under maximal w1 skew too
    val zipf = spark.range(0, 2000).selectExpr("id AS doc_id",
      "CASE WHEN id % 5 < 4 THEN 'the quick fox' ELSE 'a slow dog' END AS text")
    val op = graft.operators.NgramModel.lmFitScore(zipf, "doc_id", "text")
    op.count()
    val opPlan = op.queryExecution.executedPlan.toString
    assert(!opPlan.contains("SortMergeJoin"),
      s"lmFitScore SMJ'd a Zipf-skewed corpus on w1:\n$opPlan")
  }

  test("r8 curation ops: model/count joins broadcast, corpus never SMJs") {
    val dir = "/root/testdata/sf0.001"
    // q5E: the per-source count table (|sources| rows) must broadcast —
    // SMJ'ing the corpus on the source column would shuffle everything
    // to apply a per-row filter
    val mix = SparkEntry.queries("q5E_temperature_mix")(spark, dir)
    mix.count()
    val mixPlan = mix.queryExecution.executedPlan.toString
    assert(!mixPlan.contains("SortMergeJoin"),
      s"temperature mix SMJ'd the corpus on the source key:\n$mixPlan")
    // q5F: both feature tables are bucket-bounded (4096 rows) — the
    // model join must broadcast at ANY corpus size
    val imp = SparkEntry.queries("q5F_importance_score")(spark, dir)
    imp.count()
    val impPlan = imp.queryExecution.executedPlan.toString
    assert(!impPlan.contains("SortMergeJoin"),
      s"importance score SMJ'd the per-occurrence side:\n$impPlan")
    assert(impPlan.contains("BroadcastHashJoin"),
      s"importance score lost its broadcast model join:\n$impPlan")
    // q5D: chunking must stay shuffle-free — pure map-side fan-out
    val chunk = SparkEntry.queries("q5D_chunk_overlap")(spark, dir)
    val chunkPlan = chunk.queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findFirstIn(chunkPlan).isDefined,
      s"chunking grew a hash exchange:\n$chunkPlan")
  }

  test("CollapseIdempotentNormalize removes double normalization") {
    // non-foldable input (range, not a literal) so constant folding
    // can't erase the calls before the rule is observable
    val base = spark.range(1)
      .select(concat(lit("ci 7"), col("id").cast("string")).as("v"))
    val df = base.select(Normalize.normalizeFlightNumber(
      Normalize.normalizeFlightNumber(col("v"))).as("r"))
    val kernelCalls = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case k: StringKernelCall => k })
    assert(kernelCalls.size == 1, s"expected 1 kernel call, got $kernelCalls")
    assert(df.collect()(0).getString(0) == "CI070")

    val base2 = spark.range(1)
      .select(concat(lit("  x  y"), col("id").cast("string"), lit(" ")).as("v"))
    val mixed = base2
      .select(Normalize.normalizeTightKey(Normalize.normalizeKey(col("v"))).as("r"))
    val calls2 = mixed.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case k: StringKernelCall => k })
    assert(calls2.size == 1 && calls2.head.fn == "tightKeyNorm")
    assert(mixed.collect()(0).getString(0) == "XY0")
  }
}
