package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Sign-LSH behavior on the real embeddings fixture (sf0.001): recall
  * of the bucketed ANN vs the exact top-k, and bucket balance of the
  * seeded random hyperplanes vs the raw-leading-coordinate bits they
  * replaced.
  */
class SimilaritySpec extends SparkTestBase {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ANN recall vs exact top-k: multi-table amplification beats single-table") {
    val planes = Similarity.randomHyperplanes(dim = 64, bits = 8)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val single = pairs(Similarity.lshTopK(emb, queries, 5, planes))
    val multi = pairs(Similarity.lshTopKMultiTable(emb, queries, 5,
      tables = 16, bits = 8, dim = 64))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, 5,
      centroids = emb.filter(col("vec_id") % 64 === 0), nprobe = 4, dim = 64))
    val rs = (exact & single).size.toDouble / exact.size
    val rm = (exact & multi).size.toDouble / exact.size
    val ri = (exact & ivf).size.toDouble / exact.size
    // The fixture is near-uniform random, the hardest case for LSH:
    // sign collision at angle θ is (1-θ/π)^bits ≈ a few % at the
    // moderate cosines of uniform data. 16-table OR-amplification is
    // the standard recall lever: 1-(1-p)^16.
    info(f"recall@5 vs exact: single-table=$rs%.2f multi-table(16)=$rm%.2f " +
      f"ivf(nprobe=4)=$ri%.2f (n=${exact.size})")
    assert(exact.nonEmpty)
    assert(rm >= rs) // amplification can only add candidate buckets
    assert(rm > 0.0)
    assert(ri > 0.0)
  }

  test("multi-probe recall floor: catalogued q29 parameters reach >= 0.5") {
    val planes = Similarity.randomHyperplanes(dim = 64, bits = 8)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    for (r <- Seq(0, 1, 2, 3)) {
      val mp = pairs(Similarity.lshTopKMultiProbe(emb, queries, 5, planes, maxHamming = r))
      val rec = (exact & mp).size.toDouble / exact.size
      info(f"multi-probe recall@5 maxHamming=$r: $rec%.3f (probes=${Similarity.probeMasks(8, r).size})")
    }
    val catalogued = pairs(Similarity.lshTopKMultiProbe(emb, queries, 5, planes, maxHamming = 3))
    val rec = (exact & catalogued).size.toDouble / exact.size
    assert(rec >= 0.5, f"catalogued multi-probe ANN recall@5 = $rec%.3f < 0.5")
  }

  test("probeMasks is combinatorial, popcount-bounded, and exact at 0") {
    assert(Similarity.probeMasks(8, 0) == Seq(0L))
    val m = Similarity.probeMasks(8, 2)
    assert(m.size == 1 + 8 + 28)
    assert(m.distinct.size == m.size)
    assert(m.forall(x => java.lang.Long.bitCount(x) <= 2 && x < 256))
    // wide buckets stay cheap: 63 bits, r=1 is 64 masks, not 2^63
    assert(Similarity.probeMasks(63, 1).size == 64)
    intercept[IllegalArgumentException](Similarity.probeMasks(64, 1))
  }

  test("signBucket kernel matches the Column-combinator form bit-for-bit") {
    val planes = Similarity.randomHyperplanes(dim = 64, bits = 8)
    val kernel = emb.select(col("vec_id"),
      Similarity.signBucketKernel(col("embedding"), planes).as("b"))
    val formula = emb.select(col("vec_id"),
      Similarity.signBucket(col("embedding"), planes).as("b"))
    assert(kernel.exceptAll(formula).isEmpty && formula.exceptAll(kernel).isEmpty)
  }

  test("lcgBuckets kernel matches the Column-combinator formula bit-for-bit") {
    val (tables, bits, dim) = (4, 8, 64)
    val kernel = emb.select(col("vec_id"),
      graft.functions.cat.GraftExpr.lshBuckets(col("embedding"), tables, bits).as("b"))
    val formula = emb.select(col("vec_id"),
      array((0 until tables).map(t =>
        Similarity.lcgBucket(col("embedding"), t, bits, dim)): _*).as("b"))
    assert(kernel.exceptAll(formula).isEmpty && formula.exceptAll(kernel).isEmpty)
  }

  test("quantizedTopK neighbor sets match float brute force on the fixture") {
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val quant = pairs(Similarity.quantizedTopK(emb, queries, 5))
    // int8 quantization perturbs each cosine by O(1/127); top-5 sets on
    // the fixture must stay essentially identical to the float baseline
    val overlap = (exact & quant).size.toDouble / exact.size
    info(f"quantized vs float top-5 overlap: $overlap%.3f (n=${exact.size})")
    assert(exact.size == 40 && quant.size == 40)
    assert(overlap >= 0.9, f"quantized scan diverged from float baseline: $overlap%.3f")
  }

  test("pqTopK: ADC ranking recalls the float baseline; codes compress 32x") {
    import graft.operators.ProductQuantizer
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // PQ ranks by (asymmetric) L2, so the recall reference is the exact
    // L2 top-5, not the cosine ranking (they differ on unnormalized
    // vectors): ||q-c||^2 = |q|^2 + |c|^2 - 2 q.c
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val l2 = q.join(c, col("qid") =!= col("cid"))
      .withColumn("d2", Similarity.dot(col("qv"), col("qv")) +
        Similarity.dot(col("cv"), col("cv")) -
        lit(2.0) * Similarity.dot(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2").asc, col("cid").asc)
    val exact = pairs(l2.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(w)).filter(col("rank") <= 5))
    val pq = ProductQuantizer.pqTopK(emb, queries, k = 5,
      m = 8, ks = 16, iters = 2, dim = 64)
    val approx = pairs(pq)
    assert(approx.size == 40)
    // The synthetic fixture is near-isotropic noise — PQ's worst case
    // (relative reconstruction error 0.57 at 8x16 codes; a numpy
    // replication of the same algorithm measures the same 0.225
    // recall). The floor asserts the ranking still carries signal:
    // random top-5 overlap on a 500-vector corpus would be ~0.01.
    val overlap = (exact & approx).size.toDouble / exact.size
    info(f"pq vs exact-L2 top-5 overlap: $overlap%.3f (n=${exact.size})")
    assert(overlap >= 0.15, f"PQ recall collapsed: $overlap%.3f")
    // determinism: a second run reproduces identical rows
    val again = ProductQuantizer.pqTopK(emb, queries, k = 5,
      m = 8, ks = 16, iters = 2, dim = 64)
    assert(pq.orderBy("qid", "rank").collect().toSeq ==
      again.orderBy("qid", "rank").collect().toSeq)
    // codes really are m small ints (the 32x scan-compression claim)
    val cb = ProductQuantizer.train(emb, 8, 16, 2, 64)
    val codes = ProductQuantizer.encode(emb, cb, 8, 16, 64)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("ivfPqTopK: probed-cell ADC agrees with the exhaustive PQ scan") {
    import graft.operators.ProductQuantizer
    val queries = emb.filter(col("vec_id") < 8)
    val cents = emb.filter(col("vec_id") % 64 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = ProductQuantizer.ivfPqTopK(emb, queries, k = 5,
      centroids = cents, nprobe = 2, m = 8, ks = 16, iters = 2, dim = 64)
    val got = pairs(ivfpq)
    assert(got.size == 40)
    // cell probing restricts candidates; the survivors must rank the
    // same way the exhaustive compressed scan ranks them
    val full = pairs(ProductQuantizer.pqTopK(emb, queries, k = 5,
      m = 8, ks = 16, iters = 2, dim = 64))
    val overlap = (full & got).size.toDouble / full.size
    info(f"ivf+pq vs exhaustive pq top-5 overlap: $overlap%.3f")
    assert(overlap >= 0.3, f"cell probing lost the PQ ranking: $overlap%.3f")
    // the CORPUS side must meet the probes through a hash join on the
    // cell id (the probe-cell computation itself is a deliberate tiny
    // queries x centroids cross on two broadcast-small sides)
    val plan = ProductQuantizer.ivfPqTopK(emb, queries, k = 5,
      centroids = cents, nprobe = 2, m = 8, ks = 16, iters = 2, dim = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("ANN hard negatives: >= 0.9 overlap with the brute-force rescan, " +
    "deterministic under repartitioning") {
    val planes = Similarity.randomHyperplanes(dim = 64, bits = 8)
    val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.3,
      planes = planes).select("id_a", "id_b")
    def toSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("anchor", "negative").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = toSet(graft.operators.TrainingPairs.hardNegatives(
      pairs, emb, "vec_id", "embedding", k = 2))
    // index-speed variant: near-uniform random unit vectors are the
    // WORST case for IVF (cells carry no structure) and for PQ
    // (distortion comparable to the cosine spread), so the honest
    // levers here are wide probing (6 of 8 cells), fine subspaces
    // (m=16, ks=64), and 32x fetch headroom for the exact re-rank.
    // Measured 0.956 at these settings; 0.9 is the asserted floor.
    // On real (clustered) embeddings the same shape holds at far
    // lower nprobe/kCand — the fixture is the adversarial bound.
    def ann() = graft.operators.TrainingPairs.hardNegativesAnn(
      pairs, emb, "vec_id", "embedding", k = 2, kCand = 64,
      centroids = emb.filter(col("vec_id") % 64 === 0), nprobe = 6,
      m = 16, ks = 64, iters = 2, dim = 64)
    val a1 = ann()
    val overlap = (brute & toSet(a1)).size.toDouble / brute.size
    info(f"ANN hard-negative overlap@2 vs brute force: $overlap%.3f")
    assert(overlap >= 0.9, f"ANN hard-negative overlap $overlap%.3f < 0.9")
    // pure function of the data: identical under input repartitioning
    val a2 = graft.operators.TrainingPairs.hardNegativesAnn(
      pairs.repartition(7), emb.repartition(5), "vec_id", "embedding",
      k = 2, kCand = 64,
      centroids = emb.filter(col("vec_id") % 64 === 0), nprobe = 6,
      m = 16, ks = 64, iters = 2, dim = 64)
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty)
  }

  test("ANN hard negatives on CLUSTERED embeddings: production-small " +
    "nprobe/kCand keep the brute-force overlap") {
    import spark.implicits._
    // The isotropic fixture above is the adversarial bound and needs
    // wide settings (nprobe 6/8, kCand 32x) to clear 0.9. Real
    // embedding spaces CLUSTER, and neighbors sit at GRADED distances
    // (not pure-noise-equidistant) — this fixture is that production
    // shape: 16 well-separated unit centroids, 64 members each laid
    // out along a per-cluster direction at increasing offsets, so
    // cells carry real structure, ranking margins are real, and the
    // small settings a 100 TB deployment actually runs at
    // (nprobe 1/16, kCand 4x) must hold the same floor.
    val dim = 64
    val rnd = new scala.util.Random(7)
    val centers: Array[Array[Float]] = Array.tabulate(16) { c =>
      val v = Array.fill(dim)(0f); v(c * 4) = 1f; v
    }
    val rows = for { c <- 0 until 16 } yield {
      val dir = Array.fill(dim)(rnd.nextGaussian())
      val dn = math.sqrt(dir.map(x => x * x).sum)
      (0 until 64).map { i =>
        val t = 0.8 * i / 64
        val v = Array.tabulate(dim) { d =>
          (centers(c)(d) + t * dir(d) / dn + rnd.nextGaussian() * 0.01).toFloat
        }
        val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        ((c * 64 + i).toLong, v.map(_ / n).toSeq)
      }
    }
    val cemb = rows.flatten.toDF("vec_id", "embedding")
    val centDf = centers.zipWithIndex
      .map { case (v, c) => ((c * 64).toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    // one anchor pair per cluster: the first two members
    val pairs = (0 until 16)
      .map(c => ((c * 64).toLong, (c * 64 + 1).toLong)).toDF("id_a", "id_b")
    def toSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("anchor", "negative").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = toSet(graft.operators.TrainingPairs.hardNegatives(
      pairs, cemb, "vec_id", "embedding", k = 2))
    val ann = toSet(graft.operators.TrainingPairs.hardNegativesAnn(
      pairs, cemb, "vec_id", "embedding", k = 2, kCand = 8,
      centroids = centDf, nprobe = 1, m = 16, ks = 64, iters = 2,
      dim = dim))
    val overlap = (brute & ann).size.toDouble / brute.size
    info(f"CLUSTERED ANN hard-negative overlap@2 at nprobe=1/16, " +
      f"kCand=4x: $overlap%.3f (isotropic needed nprobe=6/8, kCand=32x)")
    assert(brute.size == 64,
      s"expected 16 pairs x 2 anchors x k=2, got ${brute.size}")
    assert(overlap >= 0.9,
      f"clustered-fixture ANN overlap $overlap%.3f < 0.9 at small settings")
  }

  test("contrastiveTriplets: negatives never collide, draw is deterministic") {
    import spark.implicits._
    val corpus = (1L to 200L).toDF("vec_id")
    val pairs = (1L to 60L).map(i => (i, i + 100L)).toDF("id_a", "id_b")
    val t = graft.operators.TrainingPairs
      .contrastiveTriplets(pairs, corpus, "vec_id", buckets = 16, salt = "t1")
    val rows = t.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 60)
    rows.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"negative $n collides with ($a, $p)")
      assert(n >= 1L && n <= 200L, s"negative $n not from the corpus")
    }
    // pure function of the data: identical under any input partitioning
    val again = graft.operators.TrainingPairs.contrastiveTriplets(
      pairs.repartition(7), corpus.repartition(5), "vec_id", 16, "t1")
    assert(t.except(again).isEmpty && again.except(t).isEmpty)
  }

  test("sign buckets stay balanced (no catastrophic bucket skew)") {
    val planes = Similarity.randomHyperplanes(dim = 64, bits = 8)
    val n = emb.count()
    def maxBucket(bucket: org.apache.spark.sql.Column): Long =
      emb.select(bucket.as("b")).groupBy("b").count()
        .agg(max("count")).collect()(0).getLong(0)
    val rndMax = maxBucket(Similarity.signBucket(col("embedding"), planes))
    info(s"max bucket size over $n vecs, 256 buckets: random-hyperplane=$rndMax")
    // a degenerate hash (all mass in few buckets) would put >>10% of
    // the corpus in one bucket; the uniform fixture should stay ~n/256
    assert(rndMax < n / 10)
  }
}
