package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Expectations, FuzzyJoin, Scd2}
import graft.sources.Tables

/** Warehouse-grade relational operators beyond the reference's
  * pipeline: SCD2 history, fuzzy record linkage, declarative data
  * quality, semi-structured extraction, and ranking-window breadth.
  */
object WarehouseQueries {

  val all: Map[String, QueryDef] = Map(

    // SCD2: collapse the per-customer order-status change log into
    // validity intervals. One hash exchange serves the change window,
    // the run collapse, and the interval-closing lead().
    "q4D_scd2" -> QueryDef(
      (s, dir) => Scd2.history(Tables.computeTable(s, dir, "orders"),
          keyCols = Seq("o_custkey"), orderCol = "o_orderdate",
          tieCol = "o_orderkey", attrCols = Seq("o_orderstatus"))
        .select("o_custkey", "version_seq", "valid_from", "valid_to",
          "o_orderstatus", "n_rows", "is_current")
        .orderBy("o_custkey", "version_seq"),
      """WITH m AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |         CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |                OR lag(o_orderstatus) OVER w <> o_orderstatus
        |              THEN 1 ELSE 0 END AS nw
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |r AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version_seq
        |  FROM m),
        |g AS (
        |  SELECT o_custkey, version_seq, min(o_orderdate) AS valid_from,
        |         min(o_orderstatus) AS o_orderstatus, count(*) AS n_rows
        |  FROM r GROUP BY 1, 2)
        |SELECT o_custkey, version_seq, valid_from,
        |       lead(valid_from) OVER wk AS valid_to,
        |       o_orderstatus, n_rows,
        |       lead(valid_from) OVER wk IS NULL AS is_current
        |FROM g WINDOW wk AS (PARTITION BY o_custkey ORDER BY version_seq)
        |ORDER BY o_custkey, version_seq""".stripMargin),

    // Incremental SCD2 maintenance: build history on pre-cutoff orders,
    // fold the post-cutoff batch in via weighted pseudo-rows (no
    // original log needed). The oracle is the FULL-log rebuild — the
    // hash match proves incremental == recompute.
    "q4O_scd2_apply" -> QueryDef(
      (s, dir) => {
        val orders = Tables.computeTable(s, dir, "orders")
        val cutoff = lit("1997-01-01").cast("timestamp")
        val hist = Scd2.history(orders.filter(col("o_orderdate") < cutoff),
          keyCols = Seq("o_custkey"), orderCol = "o_orderdate",
          tieCol = "o_orderkey", attrCols = Seq("o_orderstatus"))
        Scd2.applyBatch(hist,
            orders.filter(col("o_orderdate") >= cutoff)
              .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"),
            keyCols = Seq("o_custkey"), orderCol = "o_orderdate",
            tieCol = "o_orderkey", attrCols = Seq("o_orderstatus"))
          .select("o_custkey", "version_seq", "valid_from", "valid_to",
            "o_orderstatus", "n_rows", "is_current")
          .orderBy("o_custkey", "version_seq")
      },
      """WITH m AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |         CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |                OR lag(o_orderstatus) OVER w <> o_orderstatus
        |              THEN 1 ELSE 0 END AS nw
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |r AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version_seq
        |  FROM m),
        |g AS (
        |  SELECT o_custkey, version_seq, min(o_orderdate) AS valid_from,
        |         min(o_orderstatus) AS o_orderstatus, count(*) AS n_rows
        |  FROM r GROUP BY 1, 2)
        |SELECT o_custkey, version_seq, valid_from,
        |       lead(valid_from) OVER wk AS valid_to,
        |       o_orderstatus, n_rows,
        |       lead(valid_from) OVER wk IS NULL AS is_current
        |FROM g WINDOW wk AS (PARTITION BY o_custkey ORDER BY version_seq)
        |ORDER BY o_custkey, version_seq""".stripMargin),

    // Fuzzy self-linkage on customer names: deletion-neighborhood
    // blocking turns Levenshtein<=1 into an equi-join; the oracle
    // brute-forces the same predicate (fine at oracle SF, quadratic —
    // which is exactly why the operator blocks).
    "q4E_fuzzy_join" -> QueryDef(
      (s, dir) => FuzzyJoin.selfPairs(Tables.computeTable(s, dir, "customer"),
          textCol = "c_name", idCol = "c_custkey")
        .orderBy("left_id", "right_id"),
      """SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
        |       levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY left_id, right_id""".stripMargin),

    // Two-sided fuzzy record linkage — the incremental-batch pattern
    // (q3K) applied to fuzzy matching: an arriving batch of perturbed
    // customer records (re-keyed, last name character dropped, both
    // deterministic) links against the existing corpus within
    // Levenshtein 1, nation-blocked. Exercises
    // FuzzyJoin.editDistance1Join, selfPairs' two-sided sibling: only
    // the BATCH explodes against the corpus variants — no corpus
    // self-join, candidates bounded by variant-bucket collisions.
    "q53_fuzzy_linkage" -> QueryDef(
      (s, dir) => {
        val cust = Tables.computeTable(s, dir, "customer")
        val batch = cust.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
            expr("substring(c_name, 1, length(c_name) - 1)").as("c_name"),
            col("c_nationkey"))
        FuzzyJoin.editDistance1Join(batch, cust, textCol = "c_name",
            idCol = "c_custkey", blockCols = Seq("c_nationkey"))
          .orderBy("left_id", "right_id")
      },
      """WITH batch AS (
        |  SELECT c_custkey + 1000000 AS c_custkey,
        |         substr(c_name, 1, length(c_name) - 1) AS c_name,
        |         c_nationkey
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT b.c_custkey AS left_id, c.c_custkey AS right_id,
        |       levenshtein(b.c_name, c.c_name) AS dist
        |FROM batch b JOIN customer c
        |  ON b.c_nationkey = c.c_nationkey
        | AND levenshtein(b.c_name, c.c_name) <= 1
        |ORDER BY left_id, right_id""".stripMargin),

    // Declarative DQ report over orders: four row-level constraints and
    // a uniqueness key in ONE aggregate pass + an anti-join FK row.
    "q4F_dq_report" -> QueryDef(
      (s, dir) => {
        val orders = Tables.computeTable(s, dir, "orders")
        val customer = Tables.computeTable(s, dir, "customer")
        Expectations.report(orders,
            checks = Seq(
              Expectations.notNull("o_custkey"),
              Expectations.inRange("o_totalprice", 0.0, 400000.0),
              Expectations.inSet("o_orderstatus", Seq("O", "F")),
              Expectations.matches("o_orderpriority", "^[1-5]-")),
            uniqueKeys = Seq(Seq("o_orderkey")))
          .unionAll(Expectations.refIntegrity(orders, "o_custkey",
            customer, "c_custkey"))
          .orderBy("check_name")
      },
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders)
        |SELECT check_name, violations, total, violations = 0 AS pass FROM (
        |  SELECT 'not_null:o_custkey' AS check_name,
        |         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS violations,
        |         total FROM t
        |  UNION ALL
        |  SELECT 'in_range:o_totalprice',
        |         (SELECT count(*) FROM orders
        |          WHERE o_totalprice IS NULL
        |             OR NOT o_totalprice BETWEEN 0 AND 400000), total FROM t
        |  UNION ALL
        |  SELECT 'in_set:o_orderstatus',
        |         (SELECT count(*) FROM orders
        |          WHERE o_orderstatus IS NULL
        |             OR o_orderstatus NOT IN ('O', 'F')), total FROM t
        |  UNION ALL
        |  SELECT 'matches:o_orderpriority',
        |         (SELECT count(*) FROM orders
        |          WHERE o_orderpriority IS NULL
        |             OR NOT regexp_matches(o_orderpriority, '^[1-5]-')), total FROM t
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders), total FROM t
        |  UNION ALL
        |  SELECT 'fk:o_custkey',
        |         (SELECT count(*) FROM orders
        |          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)), total FROM t)
        |ORDER BY check_name""".stripMargin),

    // Semi-structured extraction: parse the events.props JSON column
    // (schema'd from_json — codegen'd JacksonParser, no UDF) and
    // aggregate the extracted field per event type.
    "q4G_json_extract" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
          min("k").as("k_min"), max("k").as("k_max"),
          countDistinct(col("k")).as("k_distinct"))
        .orderBy("event_type"),
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
        |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
        |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
        |       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS k_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Warehouse flagship composite: DQ row gate -> SCD2 history ->
    // current intervals -> broadcast dim join -> rollup, ONE lazy plan
    // (the gate and join are map-side; the SCD2 exchange is the plan's
    // only wide dependency).
    "q4S_warehouse_pipeline" -> QueryDef(
      (s, dir) => {
        val orders = Tables.computeTable(s, dir, "orders")
        val customer = Tables.computeTable(s, dir, "customer")
        val clean = Expectations.filterValid(orders, Seq(
          Expectations.inRange("o_totalprice", 0.0, 400000.0),
          Expectations.inSet("o_orderstatus", Seq("O", "F"))))
        Scd2.history(clean, keyCols = Seq("o_custkey"),
            orderCol = "o_orderdate", tieCol = "o_orderkey",
            attrCols = Seq("o_orderstatus"))
          .filter(col("is_current"))
          .join(broadcast(customer.select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment"))), "o_custkey")
          .groupBy("c_mktsegment", "o_orderstatus")
          .agg(count(lit(1)).as("n_customers"), sum("n_rows").as("n_orders"))
          .orderBy("c_mktsegment", "o_orderstatus")
      },
      """WITH clean AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL
        |    AND o_totalprice BETWEEN 0 AND 400000
        |    AND o_orderstatus IN ('O', 'F')),
        |m AS (
        |  SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |                   OR lag(o_orderstatus) OVER w <> o_orderstatus
        |                 THEN 1 ELSE 0 END AS nw
        |  FROM clean
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |r AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version_seq
        |  FROM m),
        |g AS (
        |  SELECT o_custkey, version_seq,
        |         min(o_orderdate) AS valid_from,
        |         min(o_orderstatus) AS o_orderstatus, count(*) AS n_rows
        |  FROM r GROUP BY 1, 2),
        |cur AS (
        |  SELECT * FROM (
        |    SELECT g.*, lead(valid_from) OVER (PARTITION BY o_custkey
        |             ORDER BY version_seq) AS valid_to
        |    FROM g) __t
        |  WHERE valid_to IS NULL)
        |SELECT c.c_mktsegment, cur.o_orderstatus,
        |       count(*) AS n_customers,
        |       CAST(SUM(cur.n_rows) AS BIGINT) AS n_orders
        |FROM cur JOIN customer c ON cur.o_custkey = c.c_custkey
        |GROUP BY 1, 2 ORDER BY c_mktsegment, o_orderstatus""".stripMargin),

    // Entity resolution end-to-end: nation-blocked fuzzy name matching
    // feeds connected components; every customer gets a canonical
    // entity id (min member id of its match cluster, itself when
    // unmatched). The pair graph is the blocked deletion-neighborhood
    // join — never all-pairs — and the oracle closes the same graph
    // with a recursive CTE.
    "q4N_entity_resolution" -> QueryDef(
      (s, dir) => {
        val cust = Tables.computeTable(s, dir, "customer")
        val pairs = FuzzyJoin.selfPairs(cust, textCol = "c_name",
          idCol = "c_custkey", blockCols = Seq("c_nationkey"),
          keepBlockCols = true)
        // the blocking key confines components to nations, so the
        // block-local union-find closes the graph in ONE exchange
        // instead of diameter-many rounds (this name graph chains:
        // 31 neighbor-min rounds ≈ 31 scheduler round-trips)
        // validate=false: selfPairs blocks on the node's OWN nation, so
        // no customer's edges can span blocks — the contract holds
        // structurally and the guard's extra exchange buys nothing here
        val clusters = graft.operators.DedupClusters.resolveBlocked(
          pairs, "left_id", "right_id", blockCols = Seq("c_nationkey"),
          validate = false)
        cust.select(col("c_custkey"), col("c_nationkey"))
          .join(clusters.select(col("doc_id").as("c_custkey"),
            col("cluster_keeper")), Seq("c_custkey"), "left")
          .select(col("c_custkey"), col("c_nationkey"),
            coalesce(col("cluster_keeper"), col("c_custkey")).as("entity_id"))
          .orderBy("c_custkey")
      },
      """WITH RECURSIVE g AS (
        |  SELECT a.c_custkey AS pa, b.c_custkey AS pb
        |  FROM customer a JOIN customer b
        |    ON a.c_custkey < b.c_custkey
        |   AND a.c_nationkey = b.c_nationkey
        |   AND levenshtein(a.c_name, b.c_name) <= 1),
        |edges AS (
        |  SELECT pa AS src, pb AS dst FROM g
        |  UNION ALL SELECT pb, pa FROM g),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node),
        |cl AS (SELECT node, min(r) AS k FROM reach GROUP BY node)
        |SELECT c.c_custkey, c.c_nationkey,
        |       coalesce(cl.k, c.c_custkey) AS entity_id
        |FROM customer c LEFT JOIN cl ON c.c_custkey = cl.node
        |ORDER BY c.c_custkey""".stripMargin),

    // CSV source/sink round-trip: write a typed subset as CSV (header,
    // explicit null token), read it back with an explicit schema, and
    // hash-match the original content — Java's double toString/parse
    // is exact round-trip, so even c_acctbal survives bit-for-bit.
    "q4L_csv_roundtrip" -> QueryDef(
      (s, dir) => {
        val src = Tables.table(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        val path = new java.io.File(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          s"graft-fmt/${new java.io.File(dir).getName}/customer_csv").getAbsolutePath
        src.write.mode("overwrite")
          .option("header", "true").option("nullValue", "\\N")
          .csv(path)
        s.read.schema("c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE")
          .option("header", "true").option("nullValue", "\\N")
          .csv(path)
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // ORC round-trip: the other columnar warehouse format Spark ships
    // a vectorized reader for — type-preserving, so no read schema is
    // imposed (unlike CSV): the files carry it.
    "q5L_orc_roundtrip" -> QueryDef(
      (s, dir) => {
        val src = Tables.table(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        val path = new java.io.File(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          s"graft-fmt/${new java.io.File(dir).getName}/supplier_orc").getAbsolutePath
        src.write.mode("overwrite").orc(path)
        s.read.orc(path).orderBy("s_suppkey")
      },
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin),

    // JSON-lines round-trip (the interchange format LLM corpora
    // actually ship as): write orders as JSONL, read back schema'd.
    "q4M_jsonl_roundtrip" -> QueryDef(
      (s, dir) => {
        val src = Tables.table(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val path = new java.io.File(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          s"graft-fmt/${new java.io.File(dir).getName}/orders_jsonl").getAbsolutePath
        src.write.mode("overwrite").json(path)
        s.read.schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
          .json(path)
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // Ranking-window breadth (W-family completeness): ntile /
    // percent_rank / cume_dist / dense_rank over one partition spec —
    // one exchange, one sort, four codegen'd window functions.
    "q4H_rank_suite" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.computeTable(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            dense_rank().over(w).cast("long").as("drank"))
          .orderBy("c_mktsegment", "pct_rank", "c_custkey")
      },
      """SELECT c_custkey, c_mktsegment,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, pct_rank, c_custkey""".stripMargin),

    // ROLLUP subtotals: per-(flag,status), per-flag, and grand-total
    // rows from ONE pass — Spark plans rollup as a single Expand +
    // aggregate, so the three grouping levels cost one shuffle, not
    // three scans. Decimal sums keep every level bit-exact; the
    // fixture's grouping columns are never null, so the 'ALL' sentinel
    // is unambiguous.
    "q5H_rollup" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin),

    // CUBE completes the grouping-sets surface (ROLLUP = q5H, PIVOT =
    // q5I): all four grouping levels — (flag,status), flag-only,
    // status-only, grand total — from the same single Expand +
    // aggregate plan, one shuffle. Same decimal-exact sums and 'ALL'
    // sentinel discipline as the rollup.
    "q6C_cube" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin),

    // PIVOT: per-user event counts fanned into one column per event
    // type. The value list is EXPLICIT, so the plan is a single
    // groupBy with conditional aggregates — no extra distinct-values
    // job, no second shuffle (the implicit form pays a driver-side
    // distinct scan first; never do that at 100 TB).
    "q5I_pivot" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"))
        .orderBy("user_id"),
      """SELECT user_id,
        |       COUNT(*) FILTER (event_type = 'view') AS n_view,
        |       COUNT(*) FILTER (event_type = 'click') AS n_click,
        |       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // HyperLogLog distinct-count sketch (functions/cat/HllSketch):
    // per-flag + global distinct order keys in ONE pass with m=256
    // one-byte registers per group — the fixed-memory "distinct per
    // key over 100 TB" shape (KMV's state grows with k; HLL's never).
    // The rollup row doubles as the mergeability gate: its registers
    // are the elementwise max of the per-flag sketches, and the
    // oracle recomputes the same max from scratch. countDistinct
    // rides along as displayed ground truth (a production plan would
    // drop it and keep only the one HLL exchange). est_raw is the
    // raw HLL estimator in IEEE +,*,/ only — bit-identical in any
    // engine; `est` ships the HLL++ small-range linear-counting
    // branch, exercised HERE by a second sketch over l_linestatus
    // (2-3 distinct values — exactly the regime where the raw
    // estimator reads ~0.7·m and linear counting is near-exact);
    // both engines evaluate m·ln(m/v_zero) in libm doubles over the
    // same small rational, hash-gated like everything else.
    "q5V_hll_distinct" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "lineitem")
        .rollup(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact"),
          graft.functions.cat.HllAgg(col("l_orderkey"), 256).as("hll"),
          graft.functions.cat.HllAgg(col("l_linestatus"), 256).as("lc"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("src"),
          col("n_exact"), col("hll.v_zero").as("v_zero"),
          col("hll.s_scaled").as("s_scaled"),
          col("hll.est_raw").as("est_raw"),
          col("hll.est").as("est"),
          col("lc.v_zero").as("lc_v_zero"),
          col("lc.est").as("lc_est"))
        .orderBy("src"),
      {
        // The HllAgg.hash48 mirror: CRT pair of the two polyhashes,
        // splitmix64 finalizer in UHUGEINT (the wraparound multiplies
        // the JVM gets free from Long overflow), truncated mod 2^48.
        val key = "CAST(l_orderkey AS VARCHAR)"
        val h1 = QueryDef.duckPolyHash(key)
        val h2 = QueryDef.duckPolyHash(key, 131, 998244353L)
        val key2 = "CAST(l_linestatus AS VARCHAR)"
        val g1 = QueryDef.duckPolyHash(key2)
        val g2 = QueryDef.duckPolyHash(key2, 131, 998244353L)
        val w64 = "18446744073709551616" // 2^64
        def pipeline(h1: String, h2: String, keyCol: String) =
          s"""  SELECT l_returnflag, $keyCol,
             |         h % 256 AS j,
             |         CASE WHEN h // 256 = 0 THEN 41
             |              ELSE 41 - length(printf('%b', h // 256)) END AS rho
             |  FROM (SELECT l_returnflag, $keyCol,
             |               CAST(xor(z, z >> 31)
             |                 % CAST(281474976710656 AS UHUGEINT) AS BIGINT) AS h
             |        FROM (SELECT l_returnflag, $keyCol,
             |               (xor(z, z >> 27)
             |                 * CAST(10723151780598845931 AS UHUGEINT))
             |                 % CAST($w64 AS UHUGEINT) AS z
             |              FROM (SELECT l_returnflag, $keyCol,
             |               (xor(z, z >> 30)
             |                 * CAST(13787848793156543929 AS UHUGEINT))
             |                 % CAST($w64 AS UHUGEINT) AS z
             |                    FROM (SELECT l_returnflag, $keyCol,
             |                           CAST($h1 AS UHUGEINT) * 998244353
             |                             + CAST($h2 AS UHUGEINT) AS z
             |                          FROM lineitem)))) """.stripMargin
        def sums(b: String) =
          s"""  SELECT src,
             |         CAST(256 - COUNT(*) AS BIGINT) AS v_zero,
             |         CAST(SUM(CAST(1 AS BIGINT) << (41 - r))
             |              + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 41)
             |              AS BIGINT) AS s_scaled
             |  FROM (SELECT CAST(l_returnflag AS VARCHAR) AS src, j,
             |               MAX(rho) AS r
             |        FROM $b GROUP BY 1, 2
             |        UNION ALL
             |        SELECT 'ALL' AS src, j, MAX(rho) AS r
             |        FROM $b GROUP BY 2) GROUP BY 1 """.stripMargin
        // est_raw in IEEE +,*,/; est adds the HLL++ CASE: linear
        // counting m*ln(m/v_zero) when raw <= 2.5m and zeros remain
        val rawOf = (s: String) =>
          "(CAST(0.7213 AS DOUBLE) / (1.0 + 1.079 / 256.0)) " +
            s"* 256.0 * 256.0 * 2199023255552.0 / CAST($s AS DOUBLE)"
        s"""WITH b AS (
           |${pipeline(h1, h2, "l_orderkey")}),
           |b2 AS (
           |${pipeline(g1, g2, "l_linestatus")}),
           |s1 AS (
           |${sums("b")}),
           |s2 AS (
           |${sums("b2")}),
           |ex AS (
           |  SELECT CAST(l_returnflag AS VARCHAR) AS src,
           |         COUNT(DISTINCT l_orderkey) AS n_exact
           |  FROM lineitem GROUP BY 1
           |  UNION ALL
           |  SELECT 'ALL', COUNT(DISTINCT l_orderkey) FROM lineitem)
           |SELECT src, n_exact, v_zero, s_scaled, est_raw,
           |       CASE WHEN est_raw <= 640.0 AND v_zero > 0
           |            THEN 256.0 * ln(256.0 / v_zero) ELSE est_raw
           |       END AS est,
           |       lc_v_zero,
           |       CASE WHEN lc_raw <= 640.0 AND lc_v_zero > 0
           |            THEN 256.0 * ln(256.0 / lc_v_zero) ELSE lc_raw
           |       END AS lc_est
           |FROM (SELECT s1.src, ex.n_exact, s1.v_zero, s1.s_scaled,
           |             ${rawOf("s1.s_scaled")} AS est_raw,
           |             s2.v_zero AS lc_v_zero,
           |             ${rawOf("s2.s_scaled")} AS lc_raw
           |      FROM s1
           |      JOIN s2 ON s1.src = s2.src
           |      JOIN ex ON s1.src = ex.src)
           |ORDER BY 1""".stripMargin
      })
  )
}
