package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.SketchOps

/** KMV set-algebra estimator quality and exactness properties on
  * synthetic sets with KNOWN overlap.
  */
class SketchOpsSpec extends SparkTestBase {

  import spark.implicits._

  /** (set_id, h) element hashes for integer sets, through the same
    * polyHash + LCG wrap the production shingle path uses. */
  private def elems(sets: (Int, Range)*) = {
    val rows = sets.flatMap { case (id, r) => r.map(v => (id, v)) }
    rows.toDF("set_id", "v")
      .select(col("set_id"),
        SketchOps.mixHash(TextFunctions.polyHash(col("v").cast("string")))
          .as("h"))
  }

  test("bottomK equals the global sort's first k per set") {
    val df = elems(0 -> (1 to 5000), 1 -> (2000 to 9000))
    val got = SketchOps.bottomK(df, "set_id", "h", 32)
      .groupBy("set_id").agg(sort_array(collect_list("h")).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val want = df.distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.take(32).toSeq }
    assert(got == want)
  }

  test("overlap estimates land near truth on 1/3-Jaccard sets") {
    // |A|=10000, |B|=10000, |A∩B|=5000, |A∪B|=15000, J=1/3
    val df = elems(0 -> (1 to 10000), 1 -> (5001 to 15000))
    val r = SketchOps.kmvOverlap(df, "set_id", "h", 256).collect()(0)
    val unionEst = r.getAs[Double]("union_est")
    val jEst = r.getAs[Double]("jaccard_est")
    val interEst = r.getAs[Double]("inter_est")
    assert(math.abs(unionEst - 15000) / 15000 < 0.15,
      s"union_est $unionEst vs 15000")
    assert(math.abs(jEst - 1.0 / 3) < 0.1, s"jaccard_est $jEst vs 1/3")
    assert(math.abs(interEst - 5000) / 5000 < 0.35,
      s"inter_est $interEst vs 5000")
    info(f"union_est=$unionEst%.1f jaccard_est=$jEst%.4f inter_est=$interEst%.1f")
  }

  test("union sketch smaller than k degrades to EXACT values") {
    // 30 + 30 elements, 10 shared: union 50 < k=64 -> exact everywhere
    val df = elems(0 -> (1 to 30), 1 -> (21 to 50))
    val r = SketchOps.kmvOverlap(df, "set_id", "h", 64).collect()(0)
    assert(r.getAs[Double]("union_est") == 50.0)
    assert(r.getAs[Double]("jaccard_est") == 10.0 / 50.0)
    assert(r.getAs[Double]("inter_est") == (10.0 / 50.0) * 50.0)
  }

  test("sketch state is partition-layout invariant") {
    val df = elems(0 -> (1 to 3000), 1 -> (1500 to 4000))
    val one = SketchOps.kmvOverlap(df.coalesce(1), "set_id", "h", 128).collect()(0)
    val many = SketchOps.kmvOverlap(df.repartition(13), "set_id", "h", 128).collect()(0)
    assert(one == many)
  }
}
