package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices ANN index maintenance at two corpus sizes: build an IVF
  * index over N and 8N vectors, then apply the SAME 2,000-row CDC
  * batch (append + keyed delete) and refresh each index. The claim
  * under test is the production one — per-batch maintenance cost
  * follows the BATCH, not the corpus (one equality delete masks the
  * touched ids with zero data reads; only the appended batch is
  * assigned) — so refresh_sec should stay ~flat while build_sec
  * scales with the corpus. Also reports a maintained-index search. */
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

    def arm(tag: String, rows: Long): (Double, Double, Double, Long) = {
      val corpus = s"$root/$tag/corpus"
      val idx = s"$root/$tag/index"
      // vec_id-CLUSTERED corpus — the production layout for a CDC-fed
      // table: the keyed delete's batch range then attaches to O(1)
      // files and the change-feed diff reads only those, keeping
      // refresh O(batch). (Round-robin layout makes every epoch's
      // feed O(corpus): each file's key range admits every batch.)
      SnapshotTable.write(spark,
        vecs(0, rows).repartitionByRange(32, $"vec_id"),
        corpus, "overwrite", Seq("vec_id"))
      val cen = vecs(0, rows).filter($"vec_id" % (rows / 64) === 0)
      val tBuild = sec { AnnIndex.build(spark, corpus, idx, cen, dim) }
      // the SAME CDC batch whatever the corpus size
      SnapshotTable.write(spark, vecs(rows, rows + 1000),
        corpus, "append", Seq("vec_id"))
      SnapshotTable.deleteByKey(spark, corpus, "vec_id",
        spark.range(0, 1000).toDF("vec_id"))
      val tRefresh = sec { AnnIndex.refresh(spark, idx) }
      val tSearch = sec {
        AnnIndex.searchTopK(spark, idx, vecs(5000, 5008), k = 5,
          nprobe = 4).collect()
      }
      val n = SnapshotTable.scan(spark, s"$idx/assign").count()
      (tBuild, tRefresh, tSearch, n)
    }

    // warm the codepaths so JIT doesn't bill the first arm
    arm("warm", 20000L)
    val (b1, r1, s1, n1) = arm("x1", baseRows)
    val (b8, r8, s8, n8) = arm("x8", baseRows * 8)
    require(n1 == baseRows && n8 == baseRows * 8,
      s"maintained counts wrong: $n1 / $n8")

    spark.stop()
    println(
      s"""{"metric":"ann_index_probe","dim":$dim,"batch_rows":2000,
         |"corpus_x1":$baseRows,"build_x1_sec":${f3(b1)},
         |"refresh_x1_sec":${f3(r1)},"search_x1_sec":${f3(s1)},
         |"corpus_x8":${baseRows * 8},"build_x8_sec":${f3(b8)},
         |"refresh_x8_sec":${f3(r8)},"search_x8_sec":${f3(s8)},
         |"build_scale_ratio":${f3(b8 / b1)},
         |"refresh_scale_ratio":${f3(r8 / r1)},
         |"search_scale_ratio":${f3(s8 / s1)}}"""
        .stripMargin.replace("\n", ""))
  }
}
