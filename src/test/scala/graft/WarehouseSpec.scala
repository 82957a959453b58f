package graft

import org.apache.spark.sql.functions._

import graft.operators.{Expectations, FuzzyJoin, Scd2}

/** Warehouse operators: SCD2 history, deletion-neighborhood fuzzy
  * join, declarative expectations. Semantics pinned on small frames
  * with hand-computed answers; plan shape pinned where it IS the
  * operator's scale story. */
class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  test("scd2 collapses runs into intervals; one exchange for the whole plan") {
    val log = Seq(
      // key 1: A A B A  -> three intervals
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      // key 2: single run, two rows, tie on order col broken by seq
      (2L, 10L, 6L, "X"), (2L, 10L, 5L, "X")
    ).toDF("k", "ord", "seq", "status")
    val out = Scd2.history(log, Seq("k"), "ord", "seq", Seq("status"))
      .orderBy("k", "version_seq")
      .select("k", "version_seq", "valid_from", "valid_to", "status",
        "n_rows", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4),
        r.getLong(5), r.getBoolean(6)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, 10L, Some(30L), "A", 2L, false),
      (1L, 2L, 30L, Some(40L), "B", 1L, false),
      (1L, 3L, 40L, None, "A", 1L, true),
      (2L, 1L, 10L, None, "X", 2L, true)))

    // the change window, run collapse, and closing lead() must share
    // ONE hash exchange on the key — that is the 100 TB claim
    val plan = Scd2.history(log, Seq("k"), "ord", "seq", Seq("status"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("scd2 null-safe attr comparison and reserved-name guard") {
    val log = Seq((1L, 1L, 1L, Some("A")), (1L, 2L, 2L, None),
      (1L, 3L, 3L, None), (1L, 4L, 4L, Some("A")))
      .toDF("k", "ord", "seq", "status")
    val runs = Scd2.history(log, Seq("k"), "ord", "seq", Seq("status"))
    // null == null must NOT open a new interval; null -> A must
    assert(runs.count() == 3)
    intercept[IllegalArgumentException] {
      Scd2.history(log.withColumn("valid_from", lit(1)),
        Seq("k"), "ord", "seq", Seq("status"))
    }
  }

  test("scd2 applyBatch: merges across the cutoff, handles new keys") {
    val old = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"),
      (2L, 10L, 3L, "X")).toDF("k", "ord", "seq", "status")
    val hist = Scd2.history(old, Seq("k"), "ord", "seq", Seq("status"))
    val batch = Seq(
      (1L, 30L, 4L, "B"), // same status as current -> absorbs into run
      (1L, 40L, 5L, "C"), // change -> new interval
      (3L, 30L, 6L, "Z")  // brand-new key
    ).toDF("k", "ord", "seq", "status")
    val out = Scd2.applyBatch(hist, batch, Seq("k"), "ord", "seq", Seq("status"))
      .orderBy("k", "version_seq")
      .select("k", "version_seq", "valid_from", "valid_to", "status",
        "n_rows", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4),
        r.getLong(5), r.getBoolean(6)))
      .toSeq
    // identical to a full rebuild over old ++ batch
    val full = Scd2.history(old.unionByName(batch), Seq("k"), "ord", "seq",
        Seq("status"))
      .orderBy("k", "version_seq")
      .select("k", "version_seq", "valid_from", "valid_to", "status",
        "n_rows", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4),
        r.getLong(5), r.getBoolean(6)))
      .toSeq
    assert(out == full)
    // spot-check the absorbed run: B spans rows 2 (old) + 1 (batch)
    assert(out.contains((1L, 2L, 20L, Some(40L), "B", 2L, false)))
    assert(out.contains((3L, 1L, 30L, None, "Z", 1L, true)))
  }

  test("scd2 applyBatch == full rebuild on randomized logs (seeded)") {
    val rnd = new scala.util.Random(42)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "version_seq", "valid_from", "valid_to", "status",
          "n_rows", "is_current")
        .orderBy("k", "version_seq").collect().toSeq
    for (_ <- 1 to 10) {
      val n = 5 + rnd.nextInt(20)
      val rows = (1 to n).map { i =>
        (rnd.nextInt(4).toLong, (1 + rnd.nextInt(15)).toLong, i.toLong,
          s"S${rnd.nextInt(3)}")
      }
      val cutoff = 1 + rnd.nextInt(16)
      val df = rows.toDF("k", "ord", "seq", "status")
      val hist = Scd2.history(df.filter($"ord" < cutoff),
        Seq("k"), "ord", "seq", Seq("status"))
      val inc = Scd2.applyBatch(hist, df.filter($"ord" >= cutoff),
        Seq("k"), "ord", "seq", Seq("status"))
      val full = Scd2.history(df, Seq("k"), "ord", "seq", Seq("status"))
      assert(collect(inc) == collect(full),
        s"divergence at cutoff=$cutoff rows=$rows")
    }
  }

  test("fuzzy join finds exactly the distance<=1 pairs, no cartesian in plan") {
    val names = Seq((1L, "kitten"), (2L, "sitten"), // substitution
      (3L, "kitte"),  // deletion of #1
      (4L, "kittens"), // insertion on #1
      (5L, "sittin"),  // dist 2 from #1, 1 from #2
      (6L, "ab"), (7L, "ba"), // shared deletion variants but dist 2
      (8L, "zzz")).toDF("id", "name")
    val got = FuzzyJoin.selfPairs(names, "name", "id")
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L)))
    val plan = FuzzyJoin.selfPairs(names, "name", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"fuzzy join fell back to all-pairs:\n$plan")
  }

  test("two-sided fuzzy linkage matches brute force, no cartesian in plan") {
    val corpus = Seq((1L, "kitten", "x"), (2L, "mitten", "x"),
      (3L, "kitten", "y"), (4L, "bitten", "x")).toDF("id", "name", "blk")
    val batch = Seq((101L, "kitte", "x"), (102L, "mitten", "y"))
      .toDF("id", "name", "blk")
    val got = FuzzyJoin.editDistance1Join(batch, corpus, "name", "id",
        blockCols = Seq("blk"))
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // 101~kitten(x) by deletion; 102~kitten(y) by substitution; never
    // across blocks: 102 vs 2 ("mitten") is an EXACT match but blk y!=x
    assert(got == Set((101L, 1L), (102L, 3L)))
    val plan = FuzzyJoin.editDistance1Join(batch, corpus, "name", "id",
        blockCols = Seq("blk"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"fuzzy linkage fell back to all-pairs:\n$plan")
  }

  test("unionFindMin equals BFS components on seeded random graphs") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(30)
      val edges = (1 to (1 + rnd.nextInt(40)))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // BFS reference over the undirected adjacency
        val adj = edges.flatMap(e => Seq(e, e.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = adj.keySet
        val expect = nodes.map { s =>
          var seen = Set(s); var frontier = Set(s)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(adj(_)) -- seen
            seen ++= frontier
          }
          s -> seen.min
        }.toMap
        val got = graft.operators.DedupClusters
          .unionFindMin(edges.iterator).toMap
        assert(got == expect, s"trial=$trial n=$n edges=$edges")
      }
    }
  }

  test("fuzzy join blocking keys restrict matches to the block") {
    val rows = Seq((1L, "abc", "x"), (2L, "abd", "x"),
      (3L, "abe", "y"), (4L, "abf", "y"), (5L, "abc", "y"))
      .toDF("id", "name", "blk")
    val blocked = FuzzyJoin.selfPairs(rows, "name", "id", blockCols = Seq("blk"))
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // within x: (1,2); within y: (3,4),(3,5),(4,5); never across blocks
    assert(blocked == Set((1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
    val unblocked = FuzzyJoin.selfPairs(rows, "name", "id")
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(unblocked.contains((1L, 5L)) && unblocked.size > blocked.size)
  }

  test("expectations: single-pass report with known violation counts") {
    val df = Seq(
      (1L, Some(10.0), "O"), (2L, Some(-5.0), "F"), (3L, None, "O"),
      (4L, Some(999.0), "Q"), (4L, Some(20.0), "O") // dup key 4
    ).toDF("id", "price", "status")
    val rep = Expectations.report(df,
        Seq(Expectations.notNull("price"),
          Expectations.inRange("price", 0.0, 100.0),
          Expectations.inSet("status", Seq("O", "F"))),
        uniqueKeys = Seq(Seq("id")))
      .orderBy("check_name")
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rep == Seq(
      ("in_range:price", 3L, 5L, false),  // -5, null, 999
      ("in_set:status", 1L, 5L, false),   // Q
      ("not_null:price", 1L, 5L, false),
      ("unique:id", 1L, 5L, false)))      // one surplus row for key 4
  }

  test("bottom-k quantile sketch: close to exact, partition-invariant") {
    val ev = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val sk = graft.operators.Sampling.bottomKQuantiles(ev,
      Seq("event_type"), "value", "event_id", k = 64, salt = "qsk")
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"),
        min("value").as("lo"), max("value").as("hi"))
    val joined = sk.join(exact, "event_type")
      .select($"event_type", $"q50", $"med", $"hi" - $"lo")
      .as[(String, Double, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (et, q50, med, range) =>
      assert(math.abs(q50 - med) <= 0.25 * range,
        s"$et: sketch median $q50 too far from exact $med (range $range)")
    }
    // hash-draw is a pure function of the data: any physical layout
    // yields byte-identical output (the mergeable-monoid property)
    val again = graft.operators.Sampling.bottomKQuantiles(ev.repartition(7),
      Seq("event_type"), "value", "event_id", k = 64, salt = "qsk")
    assert(sk.orderBy("event_type").collect().toSeq ==
      again.orderBy("event_type").collect().toSeq)
  }

  test("incremental view maintenance equals a full rebuild, groups can vanish") {
    import graft.operators.IncrementalView
    // v1: three groups; the feed updates one row (delete+upsert pair),
    // inserts a row into a NEW group, deletes group 3 entirely, and
    // carries a NULL-valued insert (counts in n_rows, adds 0 to sum)
    val v1 = Seq((1L, 10L, Some(100.0)), (1L, 11L, Some(50.0)),
      (2L, 20L, Some(7.5)), (3L, 30L, Some(1.0))).toDF("k", "id", "v")
    val v2 = Seq((1L, 10L, Some(250.0)), (1L, 11L, Some(50.0)),
      (2L, 20L, Some(7.5)), (2L, 21L, None: Option[Double]),
      (4L, 40L, Some(9.0))).toDF("k", "id", "v")
    val cdc = v2.exceptAll(v1).withColumn("change_type", lit("upsert"))
      .unionAll(v1.exceptAll(v2).withColumn("change_type", lit("delete")))
    val incremental = IncrementalView.applyChanges(
      IncrementalView.sumCountView(v1, Seq("k"), "v"), cdc, Seq("k"), "v")
    val rebuilt = IncrementalView.sumCountView(v2, Seq("k"), "v")
    val inc = incremental.orderBy("k").collect().toSeq
    assert(inc == rebuilt.orderBy("k").collect().toSeq)
    assert(!inc.exists(_.getLong(0) == 3L), "vanished group must leave the view")
    assert(inc.map(_.getLong(0)) == Seq(1L, 2L, 4L))
    // an empty feed is an exact no-op
    val noop = IncrementalView.applyChanges(
      IncrementalView.sumCountView(v1, Seq("k"), "v"),
      cdc.filter(lit(false)), Seq("k"), "v")
    assert(noop.orderBy("k").collect().toSeq ==
      IncrementalView.sumCountView(v1, Seq("k"), "v").orderBy("k").collect().toSeq)
  }

  test("min/max view: feed-only refresh unless an extremum was deleted") {
    import graft.operators.IncrementalView
    // k=1: interior delete (20) + upsert beyond max -> feed-only path
    // k=2: deletes its MIN (1.0) -> per-key rebuild must find 2.0
    // k=3: deleted entirely; k=4: brand-new; k=5: untouched;
    // k=6: all-null values, one null row deleted (no extremum impact)
    val v1 = Seq((1L, 10L, Some(10.0)), (1L, 11L, Some(20.0)), (1L, 12L, Some(30.0)),
      (2L, 20L, Some(1.0)), (2L, 21L, Some(2.0)), (3L, 30L, Some(5.0)),
      (5L, 50L, Some(7.0)), (6L, 60L, None: Option[Double]),
      (6L, 61L, None: Option[Double])).toDF("k", "id", "v")
    val v2 = Seq((1L, 10L, Some(10.0)), (1L, 12L, Some(30.0)), (1L, 13L, Some(99.0)),
      (2L, 21L, Some(2.0)), (4L, 40L, Some(9.0)), (5L, 50L, Some(7.0)),
      (6L, 61L, None: Option[Double])).toDF("k", "id", "v")
    val cdc = v2.exceptAll(v1).withColumn("change_type", lit("upsert"))
      .unionAll(v1.exceptAll(v2).withColumn("change_type", lit("delete")))
    val out = IncrementalView.applyChangesMinMax(
      IncrementalView.minMaxView(v1, Seq("k"), "v"), cdc, v2, Seq("k"), "v")
    assert(out.orderBy("k").collect().toSeq ==
      IncrementalView.minMaxView(v2, Seq("k"), "v").orderBy("k").collect().toSeq)
    // the rebuild's base-table read is scoped: a LeftSemi on the
    // triggered keys, never a full-view rebuild
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"rebuild lost its semi-join scope:\n$plan")
    // empty feed is an exact no-op (and reads no base rows)
    val noop = IncrementalView.applyChangesMinMax(
      IncrementalView.minMaxView(v1, Seq("k"), "v"),
      cdc.filter(lit(false)), v2, Seq("k"), "v")
    assert(noop.orderBy("k").collect().toSeq ==
      IncrementalView.minMaxView(v1, Seq("k"), "v").orderBy("k").collect().toSeq)
  }

  test("expectations: referential integrity via anti-join") {
    val child = Seq((1L, 10L), (2L, 11L), (3L, 99L)).toDF("id", "pid")
    val parent = Seq(10L, 11L).toDF("p")
    val row = Expectations.refIntegrity(child, "pid", parent, "p")
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].head()
    assert(row == (("fk:pid", 1L, 3L, false)))
    val clean = Expectations.refIntegrity(child.filter($"pid" < 50), "pid",
      parent, "p").select("pass").as[Boolean].head()
    assert(clean)
  }
}
