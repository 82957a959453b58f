package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Co-located join via bucketing: same results, no shuffle exchange. */
class BucketingSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketed-by-key join plans without an Exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"L$i")).toDF("k", "lv")
    val right = (1 to 1000 by 3).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bk_left", buckets = 4, Seq("k"))
    Bucketing.writeBucketed(right, "bk_right", buckets = 4, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bk_left").join(spark.table("bk_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      assert(joined.count() == 334)
      val row = joined.filter($"k" === 7).collect()(0)
      assert(row.getString(1) == "L7" && row.getDouble(2) == 14.0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
