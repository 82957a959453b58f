package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOf picks latest right <= left, inclusive at equal ts, null before first") {
    val left = Seq(
      (1L, 100L, ts(50)),  // before any right row -> null refs
      (1L, 101L, ts(100)), // equal ts -> inclusive match r10
      (1L, 102L, ts(250)), // between r10 and r20 -> r10
      (1L, 103L, ts(300)), // equal ts r20 -> r20
      (2L, 200L, ts(500))  // key with no right rows at all
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts(100), 10L),
      (1L, ts(300), 20L)
    ).toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("rv"))
      .orderBy("id")
      .select("id", "ref_rv").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq(
      100L -> None, 101L -> Some(10L), 102L -> Some(10L),
      103L -> Some(20L), 200L -> None))
  }

  test("asOf tolerance nulls out stale matches") {
    val left = Seq((1L, 1L, ts(1000)), (1L, 2L, ts(5000))).toDF("k", "id", "t")
    val right = Seq((1L, ts(900), 7L)).toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("rv"),
        toleranceUs = 200L * 1000000L) // 200 s
      .orderBy("id").select("id", "ref_rv", "ref_t_us")
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq(
      (1L, Some(7L), Some(900L * 1000000L)), // 100 s stale: within
      (2L, None, None)))                     // 4100 s stale: nulled
  }

  test("pointInInterval matches containment exactly once across bin spans") {
    // width-10 bins; interval [5, 27] covers bins 0..2, [40, 41] one bin
    val intervals = Seq((1L, 5L, 27L, "a"), (1L, 40L, 41L, "b"),
      (2L, 0L, 100L, "c")).toDF("k", "lo", "hi", "tag")
    val points = Seq((1L, 5L), (1L, 27L), (1L, 15L), (1L, 39L), (1L, 41L),
      (2L, 100L), (3L, 50L)).toDF("k", "p")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "p", "lo", "hi", binWidth = 10L)
      .select("k", "p", "tag").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 5L, "a"), (1L, 27L, "a"), (1L, 15L, "a"),
      (1L, 41L, "b"), (2L, 100L, "c")))
    // exactly-once: no point/interval pair duplicated
    val n = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "p", "lo", "hi", binWidth = 10L).count()
    assert(n == 5)
  }

  test("pointInInterval handles negative coordinates (floor, not truncate)") {
    val intervals = Seq((1L, -25L, -5L, "neg")).toDF("k", "lo", "hi", "tag")
    val points = Seq((1L, -25L), (1L, -5L), (1L, -4L), (1L, -26L))
      .toDF("k", "p")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "p", "lo", "hi", binWidth = 10L)
      .select("p").as[Long].collect().toSet
    assert(out == Set(-25L, -5L))
  }

  test("asOfForward picks earliest right >= left, inclusive, null after last") {
    val left = Seq(
      (1L, 100L, ts(50)),  // before r10 -> r10
      (1L, 101L, ts(100)), // equal ts -> inclusive match r10
      (1L, 102L, ts(250)), // between -> r20
      (1L, 103L, ts(300)), // equal ts r20 -> r20
      (1L, 104L, ts(350)), // after every right row -> null refs
      (2L, 200L, ts(500))  // key with no right rows at all
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts(100), 10L),
      (1L, ts(300), 20L)
    ).toDF("k", "t", "rv")
    val out = AsOfJoin.asOfForward(left, right, Seq("k"), "t", Seq("rv"))
      .orderBy("id")
      .select("id", "ref_rv").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq(
      100L -> Some(10L), 101L -> Some(10L), 102L -> Some(20L),
      103L -> Some(20L), 104L -> None, 200L -> None))
    // tolerance bounds how far AHEAD the match may be
    val tol = AsOfJoin.asOfForward(left, right, Seq("k"), "t", Seq("rv"),
        toleranceUs = 40L * 1000000L)
      .orderBy("id").select("id", "ref_rv").as[(Long, Option[Long])].collect()
    assert(tol.toSeq == Seq(
      100L -> None /* 50 s ahead */, 101L -> Some(10L), 102L -> None,
      103L -> Some(20L), 104L -> None, 200L -> None))
  }

  test("intervalOverlap finds each overlapping pair exactly once across bins") {
    // width-10 bins; overlaps spanning multiple shared bins must not dup
    val aa = Seq((1L, 0L, 35L, "a1"), (1L, 50L, 55L, "a2"),
      (2L, 0L, 5L, "a3")).toDF("k", "alo", "ahi", "atag")
    val bb = Seq((1L, 5L, 60L, "b1"), (1L, 36L, 49L, "b2"),
      (2L, 6L, 9L, "b3"), (3L, 0L, 9L, "b4")).toDF("k", "blo", "bhi", "btag")
    val out = RangeJoin.intervalOverlap(aa, bb, Seq("k"),
        "alo", "ahi", "blo", "bhi", binWidth = 10L)
      .select("atag", "btag").as[(String, String)].collect().toSeq
    // a1×b1 share bins 0..3 — exactly once; touching endpoints are
    // inclusive (a2 [50,55] × b1 [5,60]); disjoint/cross-key drop
    assert(out.sorted == Seq("a1" -> "b1", "a2" -> "b1").sorted)
    assert(out.size == 2, "multi-bin overlap must emit exactly once")
  }

  test("intervalOverlap matches a brute-force double-inequality join (seeded)") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int) => Seq.tabulate(n) { i =>
      val lo = rnd.nextInt(1000).toLong - 500L
      (rnd.nextInt(4).toLong, lo, lo + rnd.nextInt(60))
    }
    val aa = mk(300).zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i.toLong) }
      .toDF("k", "alo", "ahi", "aid")
    val bb = mk(300).zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i.toLong) }
      .toDF("k", "blo", "bhi", "bid")
    val fast = RangeJoin.intervalOverlap(aa, bb, Seq("k"),
        "alo", "ahi", "blo", "bhi", binWidth = 25L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val brute = aa.join(bb, aa("k") === bb("k") &&
        aa("alo") <= bb("bhi") && bb("blo") <= aa("ahi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(fast.sorted == brute.sorted)
    assert(fast.size == fast.toSet.size, "no pair may be emitted twice")
  }

  test("asOf plan contains no join operator, one exchange") {
    val left = spark.range(10).select(col("id").as("k"), col("id").as("lid"),
      timestamp_seconds(col("id") * 100).as("t"))
    val right = spark.range(3).select(col("id").as("k"),
      timestamp_seconds(col("id")).as("t"), col("id").as("rv"))
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
  }
}
