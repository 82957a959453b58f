package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices ANN index maintenance at two corpus sizes: build an IVF
  * index (flat AND product-quantized) over N and 8N vectors, then
  * apply the SAME 2,000-row CDC batch (append + keyed delete) and
  * refresh each index. Claims under test:
  *  - per-batch maintenance cost follows the BATCH, not the corpus
  *    (one equality delete masks the touched ids with zero data
  *    reads; only the appended batch assigns/encodes) — refresh_sec
  *    stays ~flat while build_sec scales with the corpus, for BOTH
  *    layouts;
  *  - the PQ index's assign/ is an order of magnitude smaller than
  *    the flat one's (8-byte codes vs the full embedding per row) —
  *    the round-17 storage story: the index is not a second corpus.
  * Also reports a maintained-index search per layout. */
object AnnIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.AnnIndex
    import graft.sources.SnapshotTable
    val baseRows = args.headOption.map(_.toLong).getOrElse(250000L)
    val dim = 32
    val pq = AnnIndex.PqSpec(m = 8, ks = 256, iters = 2)
    val root = s"/tmp/graft-scale/annix-${System.currentTimeMillis()}"

    def vecs(lo: Long, hi: Long) = spark.range(lo, hi).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)),
          j => sin($"vec_id" * 0.37 + j * 1.13).cast("float")))
    def sec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    def dirBytes(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d, "data")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).map(_.getLen).sum
    }

    final case class Arm(build: Double, refresh: Double, search: Double,
                         assignBytes: Long, n: Long)

    def arms(tag: String, rows: Long): (Arm, Arm) = {
      val corpus = s"$root/$tag/corpus"
      val flat = s"$root/$tag/flat"
      val pqi = s"$root/$tag/pq"
      // vec_id-CLUSTERED corpus — the production layout for a CDC-fed
      // table: the keyed delete's batch range then attaches to O(1)
      // files and the change-feed diff reads only those, keeping
      // refresh O(batch). (Round-robin layout makes every epoch's
      // feed O(corpus): each file's key range admits every batch.)
      SnapshotTable.write(spark,
        vecs(0, rows).repartitionByRange(32, $"vec_id"),
        corpus, "overwrite", Seq("vec_id"))
      val cen = vecs(0, rows).filter($"vec_id" % (rows / 64) === 0)
      val bFlat = sec { AnnIndex.build(spark, corpus, flat, cen, dim) }
      val bPq = sec {
        AnnIndex.build(spark, corpus, pqi, cen, dim, pq = Some(pq))
      }
      // the SAME CDC batch whatever the corpus size
      SnapshotTable.write(spark, vecs(rows, rows + 1000),
        corpus, "append", Seq("vec_id"))
      SnapshotTable.deleteByKey(spark, corpus, "vec_id",
        spark.range(0, 1000).toDF("vec_id"))
      val rFlat = sec { AnnIndex.refresh(spark, flat) }
      val rPq = sec { AnnIndex.refresh(spark, pqi) }
      val sFlat = sec {
        AnnIndex.searchTopK(spark, flat, vecs(5000, 5008), k = 5,
          nprobe = 4).collect()
      }
      val sPq = sec {
        AnnIndex.searchTopK(spark, pqi, vecs(5000, 5008), k = 5,
          nprobe = 4).collect()
      }
      (Arm(bFlat, rFlat, sFlat, dirBytes(s"$flat/assign"),
        SnapshotTable.scan(spark, s"$flat/assign").count()),
        Arm(bPq, rPq, sPq, dirBytes(s"$pqi/assign"),
          SnapshotTable.scan(spark, s"$pqi/assign").count()))
    }

    // warm the codepaths so JIT doesn't bill the first arm
    arms("warm", 20000L)
    val (f1, p1) = arms("x1", baseRows)
    val (f8, p8) = arms("x8", baseRows * 8)
    require(f1.n == baseRows && f8.n == baseRows * 8 &&
      p1.n == baseRows && p8.n == baseRows * 8,
      s"maintained counts wrong: ${(f1.n, f8.n, p1.n, p8.n)}")

    // sampled-training arms (round-18): the x8 corpus again, PQ
    // codebooks trained on 1/4 and 1/16 deterministic hash draws —
    // the Lloyd rounds' scan+update cost should drop ~linearly in the
    // fraction while encode (the other build half) and search stay
    // fraction-independent
    val corpus8 = s"$root/x8/corpus"
    val rows8 = baseRows * 8
    val cen8 = vecs(0, rows8).filter($"vec_id" % (rows8 / 64) === 0)
    def sampledArm(tag: String, fraction: Double): (Double, Double) = {
      val d = s"$root/x8/pq_$tag"
      val b = sec { AnnIndex.build(spark, corpus8, d, cen8, dim,
        pq = Some(pq.copy(trainFraction = fraction))) }
      val s = sec { AnnIndex.searchTopK(spark, d, vecs(5000, 5008), k = 5,
        nprobe = 4).collect() }
      (b, s)
    }
    val (b25, s25) = sampledArm("f25", 0.25)
    val (b06, s06) = sampledArm("f0625", 0.0625)

    spark.stop()
    println(
      s"""{"metric":"ann_index_probe","dim":$dim,"batch_rows":2000,
         |"pq_m":${pq.m},"pq_ks":${pq.ks},
         |"corpus_x1":$baseRows,"corpus_x8":${baseRows * 8},
         |"flat_build_x1_sec":${f3(f1.build)},"flat_build_x8_sec":${f3(f8.build)},
         |"flat_refresh_x1_sec":${f3(f1.refresh)},"flat_refresh_x8_sec":${f3(f8.refresh)},
         |"flat_search_x1_sec":${f3(f1.search)},"flat_search_x8_sec":${f3(f8.search)},
         |"pq_build_x1_sec":${f3(p1.build)},"pq_build_x8_sec":${f3(p8.build)},
         |"pq_refresh_x1_sec":${f3(p1.refresh)},"pq_refresh_x8_sec":${f3(p8.refresh)},
         |"pq_search_x1_sec":${f3(p1.search)},"pq_search_x8_sec":${f3(p8.search)},
         |"flat_refresh_scale_ratio":${f3(f8.refresh / f1.refresh)},
         |"pq_refresh_scale_ratio":${f3(p8.refresh / p1.refresh)},
         |"flat_assign_bytes_x8":${f8.assignBytes},
         |"pq_assign_bytes_x8":${p8.assignBytes},
         |"assign_bytes_ratio_x8":${f3(f8.assignBytes.toDouble / p8.assignBytes)},
         |"pq_build_x8_f25_sec":${f3(b25)},"pq_build_x8_f0625_sec":${f3(b06)},
         |"pq_search_x8_f25_sec":${f3(s25)},"pq_search_x8_f0625_sec":${f3(s06)}}"""
        .stripMargin.replace("\n", ""))
  }
}
