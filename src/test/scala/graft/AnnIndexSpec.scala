package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.AnnIndex
import graft.sources.SnapshotTable

/** Persisted, incrementally-maintained IVF index: build freezes the
  * coarse quantizer and materializes cell assignments as a snapshot
  * table; refresh consumes the corpus change feed (O(batch), never
  * O(corpus)); search probes cells through manifest-level pruning.
  * The invariant everything hangs on: a maintained index answers
  * EXACTLY like a from-scratch rebuild at the same corpus version. */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-annix").toString

  private val dim = 8

  /** Deterministic synthetic embeddings: vec_id → 8 floats. */
  private def vecs(ids: Seq[Long]) = ids.toDF("vec_id")
    .withColumn("embedding",
      transform(sequence(lit(0), lit(dim - 1)),
        j => sin($"vec_id" * 0.37 + j * 1.13).cast("float")))

  private def searchRows(indexDir: String, queries: org.apache.spark.sql.DataFrame) =
    AnnIndex.searchTopK(spark, indexDir, queries, k = 3, nprobe = 2)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq

  test("build → CDC epochs → refresh answers exactly like a rebuild") {
    val corpus = freshDir(); val idx = freshDir(); val reb = freshDir()
    SnapshotTable.write(spark, vecs(0L until 300L), corpus, "overwrite",
      Seq("vec_id"))
    val cen = vecs((0L until 300L).filter(_ % 40 == 0))
    AnnIndex.build(spark, corpus, idx, cen, dim)
    // epoch 1: append late arrivals
    SnapshotTable.write(spark, vecs(300L until 340L), corpus, "append",
      Seq("vec_id"))
    // epoch 2: GDPR-style keyed purge
    SnapshotTable.deleteByKey(spark, corpus, "vec_id",
      spark.range(0, 7).toDF("vec_id"))
    // epoch 3: in-place UPDATE of existing ids (rows change content →
    // the feed emits delete pre-image + upsert post-image; the new
    // vector may land in a DIFFERENT cell — the migration case)
    SnapshotTable.updateVectors(spark, corpus,
      $"vec_id".between(50, 55),
      Seq("embedding" -> transform(sequence(lit(0), lit(dim - 1)),
        j => cos($"vec_id" * 0.91 + j * 0.29).cast("float"))))
    // epoch 4: a deletion-vector delete (the SQL DELETE shape) — the
    // feed must retire these ids exactly like the eq epoch's
    SnapshotTable.deleteVectors(spark, corpus, $"vec_id".between(200, 205))
    val indexed = AnnIndex.refresh(spark, idx)
    assert(indexed == SnapshotTable.latestVersion(spark, corpus).get)
    AnnIndex.build(spark, corpus, reb, cen, dim)
    val queries = vecs(Seq(10L, 50L, 123L, 339L))
    assert(searchRows(idx, queries) == searchRows(reb, queries),
      "maintained index diverged from rebuild after append+delete+update")
    // deleted ids are really gone; updated ids reflect the new vectors
    val all = SnapshotTable.scan(spark, s"$idx/assign")
    assert(all.filter($"vec_id" < 7).count() == 0)
    assert(all.filter($"vec_id".between(200, 205)).count() == 0)
    assert(all.count() == 327) // 300 - 7 + 40 - 6, updates replace in place
    // idempotent: refresh with no corpus movement is a no-op
    assert(AnnIndex.refresh(spark, idx) == indexed)
  }

  /** This is the pin q7N/q7P used to pay for IN-BENCH (a second full
    * build + in-query comparison on every bench run): the stream-fed
    * index answers row-for-row like a from-scratch rebuild at the
    * corpus head. The oracle hash stays the bench gate; the rebuild
    * equality lives here. */
  test("stream-fed maintenance (readChangeFeed → applyFeedBatch) matches a rebuild") {
    val corpus = freshDir(); val idx = freshDir(); val reb = freshDir()
    SnapshotTable.write(spark, vecs(0L until 300L), corpus, "overwrite",
      Seq("vec_id"))
    val cen = vecs((0L until 300L).filter(_ % 40 == 0))
    val builtAt = AnnIndex.build(spark, corpus, idx, cen, dim)
    SnapshotTable.write(spark, vecs(300L until 340L), corpus, "append",
      Seq("vec_id"))
    SnapshotTable.deleteByKey(spark, corpus, "vec_id",
      spark.range(0, 7).toDF("vec_id"))
    SnapshotTable.updateVectors(spark, corpus,
      $"vec_id".between(50, 55),
      Seq("embedding" -> transform(sequence(lit(0), lit(dim - 1)),
        j => cos($"vec_id" * 0.91 + j * 0.29).cast("float"))))
    val ckpt = Files.createTempDirectory("graft-annix-ckpt").toString
    val q = spark.readStream.format("graft_snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", (builtAt + 1).toString)
      .option("maxVersionsPerTrigger", "1") // one version per batch:
      // exercises the newest-action-per-id collapse across batches
      .load(corpus)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row], _: Long) =>
        AnnIndex.applyFeedBatch(b.toDF(), idx))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AnnIndex.build(spark, corpus, reb, cen, dim)
    val queries = vecs(Seq(10L, 50L, 123L, 339L))
    assert(searchRows(idx, queries) == searchRows(reb, queries),
      "stream-maintained index diverged from a from-scratch rebuild")
  }

  test("refresh work is O(batch): one eq-delete commit + one batch-sized append") {
    val corpus = freshDir(); val idx = freshDir()
    SnapshotTable.write(spark, vecs(0L until 500L), corpus, "overwrite",
      Seq("vec_id"))
    AnnIndex.build(spark, corpus, idx,
      vecs((0L until 500L).filter(_ % 50 == 0)), dim)
    val assign = s"$idx/assign"
    val vBefore = SnapshotTable.latestVersion(spark, assign).get
    val filesBefore = SnapshotTable.readManifest(spark, assign, vBefore)
      .files.map(_.path).toSet
    SnapshotTable.write(spark, vecs(500L until 520L), corpus, "append",
      Seq("vec_id"))
    AnnIndex.refresh(spark, idx)
    val vAfter = SnapshotTable.latestVersion(spark, assign).get
    val after = SnapshotTable.readManifest(spark, assign, vAfter)
    // ≤ 2 commits (eq mask + append) and every pre-existing data file
    // untouched — the corpus-sized assignment was NOT rewritten
    assert(vAfter - vBefore <= 2, s"refresh burned ${vAfter - vBefore} commits")
    assert(filesBefore.subsetOf(after.files.map(_.path).toSet),
      "refresh rewrote pre-existing assignment files")
    assert(SnapshotTable.scan(spark, assign).count() == 520)
  }

  private val pqSpec = AnnIndex.PqSpec(m = 4, ks = 16, iters = 2)

  test("PQ index stores 8-byte codes, and maintained == rebuilt with the same codebooks") {
    val corpus = freshDir(); val idx = freshDir(); val reb = freshDir()
    SnapshotTable.write(spark, vecs(0L until 300L), corpus, "overwrite",
      Seq("vec_id"))
    val cen = vecs((0L until 300L).filter(_ % 40 == 0))
    AnnIndex.build(spark, corpus, idx, cen, dim, pq = Some(pqSpec))
    // the storage claim: assign/ carries NO vector bytes — one packed
    // BIGINT of codes per row (the index is not a second corpus)
    val assignSchema = SnapshotTable.scan(spark, s"$idx/assign").schema
    assert(assignSchema.fieldNames.toSeq == Seq("vec_id", "cell", "codes"))
    assert(assignSchema("codes").dataType.simpleString == "bigint")
    // the full CDC alphabet: append, eq delete, dv update (migrates
    // cells AND changes codes)
    SnapshotTable.write(spark, vecs(300L until 340L), corpus, "append",
      Seq("vec_id"))
    SnapshotTable.deleteByKey(spark, corpus, "vec_id",
      spark.range(0, 7).toDF("vec_id"))
    SnapshotTable.updateVectors(spark, corpus,
      $"vec_id".between(50, 55),
      Seq("embedding" -> transform(sequence(lit(0), lit(dim - 1)),
        j => cos($"vec_id" * 0.91 + j * 0.29).cast("float"))))
    AnnIndex.refresh(spark, idx)
    // a rebuild at the head, seeded with the SAME frozen codebooks
    // (a plain rebuild would re-train on the moved corpus — different
    // codebooks are a different index, not a maintenance divergence)
    val cb = AnnIndex.loadCodebooks(spark, idx, pqSpec.m, pqSpec.ks, dim)
    AnnIndex.build(spark, corpus, reb, cen, dim, pq = Some(pqSpec),
      pqCodebooks = Some(cb))
    val queries = vecs(Seq(10L, 50L, 123L, 339L))
    assert(searchRows(idx, queries) == searchRows(reb, queries),
      "maintained PQ index diverged from a same-codebooks rebuild")
  }

  test("sampled PQ training: deterministic codebooks; maintained == rebuilt") {
    // round-18: trainFraction trains the codebooks on a deterministic
    // hash-sampled draw — at 10⁹ rows the full-corpus Lloyd rounds
    // are the one honest build cost SCALE_r17 priced (107 s at 2M).
    // The draw keys on the id column, so same corpus version + same
    // fraction ⇒ bit-identical codebooks whatever the partitioning.
    val corpus = freshDir()
    SnapshotTable.write(spark, vecs(0L until 400L), corpus, "overwrite",
      Seq("vec_id"))
    val cen = vecs((0L until 400L).filter(_ % 50 == 0))
    val sampled = AnnIndex.PqSpec(m = 4, ks = 16, iters = 2,
      trainFraction = 0.3)
    val a = freshDir(); val b = freshDir()
    AnnIndex.build(spark, corpus, a, cen, dim, pq = Some(sampled))
    // a REPARTITIONED rebuild of the same corpus content draws the
    // same training rows (partition-invariant hash)
    AnnIndex.build(spark, corpus, b, cen, dim, pq = Some(sampled))
    val cbA = AnnIndex.loadCodebooks(spark, a, sampled.m, sampled.ks, dim)
    val cbB = AnnIndex.loadCodebooks(spark, b, sampled.m, sampled.ks, dim)
    assert(cbA.toSeq == cbB.toSeq, "sampled training must be deterministic")
    // the sample genuinely changed the training input (vs full-corpus)
    val full = freshDir()
    AnnIndex.build(spark, corpus, full, cen, dim, pq = Some(pqSpec))
    assert(cbA.toSeq != AnnIndex.loadCodebooks(spark, full, pqSpec.m,
      pqSpec.ks, dim).toSeq,
      "0.3 draw trained identically to the full corpus — sampling inert?")
    // maintenance stays exact under the frozen SAMPLED codebooks:
    // CDC epochs + refresh answer like a same-codebooks rebuild
    SnapshotTable.write(spark, vecs(400L until 430L), corpus, "append",
      Seq("vec_id"))
    SnapshotTable.deleteByKey(spark, corpus, "vec_id",
      spark.range(0, 5).toDF("vec_id"))
    AnnIndex.refresh(spark, a)
    val reb = freshDir()
    AnnIndex.build(spark, corpus, reb, cen, dim, pq = Some(sampled),
      pqCodebooks = Some(cbA))
    val queries = vecs(Seq(10L, 222L, 429L))
    assert(searchRows(a, queries) == searchRows(reb, queries),
      "sampled-codebook maintenance diverged from rebuild")
    // a draw thinner than ks codewords refuses loudly at build
    val tooThin = AnnIndex.PqSpec(m = 4, ks = 16, iters = 1,
      trainFraction = 0.005)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.build(spark, corpus, freshDir(), cen, dim, pq = Some(tooThin))
    }
    assert(err.getMessage.contains("fewer than"))
  }

  test("PQ search reproduces the in-query IVFADC chain at the same version") {
    val corpus = freshDir(); val idx = freshDir()
    val rows = vecs(0L until 300L)
    SnapshotTable.write(spark, rows, corpus, "overwrite", Seq("vec_id"))
    val cen = vecs((0L until 300L).filter(_ % 40 == 0))
    AnnIndex.build(spark, corpus, idx, cen, dim, pq = Some(pqSpec))
    val queries = vecs(Seq(3L, 77L, 142L))
    val viaIndex = AnnIndex.searchTopK(spark, idx, queries, k = 3, nprobe = 2)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val inQuery = graft.operators.ProductQuantizer.ivfPqTopK(
      rows, queries, k = 3, centroids = cen, nprobe = 2,
      m = pqSpec.m, ks = pqSpec.ks, iters = pqSpec.iters, dim = dim)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(viaIndex == inQuery,
      "persisted PQ index diverged from ProductQuantizer.ivfPqTopK")
  }

  test("PQ packing survives the sign bit: m=8, ks=256 codes round-trip") {
    // 8 one-dim subspaces × 256 codewords: the packed BIGINT's top
    // byte can exceed 127, i.e. the long goes negative — packing must
    // stay bitwise (ANSI arithmetic would throw long-overflow) and
    // unpacking must shift UNSIGNED. Equality with the in-query chain
    // pins the whole round trip.
    val big = AnnIndex.PqSpec(m = 8, ks = 256, iters = 1)
    val corpus = freshDir(); val idx = freshDir()
    val rows = vecs(0L until 400L)
    SnapshotTable.write(spark, rows, corpus, "overwrite", Seq("vec_id"))
    val cen = vecs((0L until 400L).filter(_ % 80 == 0))
    AnnIndex.build(spark, corpus, idx, cen, dim, pq = Some(big))
    // at ks=256 some corpus row WILL take a high codeword in the top
    // subspace — prove the fixture actually crosses the sign bit
    assert(SnapshotTable.scan(spark, s"$idx/assign")
      .filter($"codes" < 0L).count() > 0,
      "fixture never set the sign bit — the pin tests nothing")
    val queries = vecs(Seq(33L, 271L))
    val viaIndex = AnnIndex.searchTopK(spark, idx, queries, k = 3, nprobe = 2)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val inQuery = graft.operators.ProductQuantizer.ivfPqTopK(
      rows, queries, k = 3, centroids = cen, nprobe = 2,
      m = big.m, ks = big.ks, iters = big.iters, dim = dim)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(viaIndex == inQuery)
  }

  test("PQ rerank: exact-cosine refinement over the ADC candidate set") {
    val corpus = freshDir(); val idx = freshDir()
    SnapshotTable.write(spark, vecs(0L until 300L), corpus, "overwrite",
      Seq("vec_id"))
    AnnIndex.build(spark, corpus, idx,
      vecs((0L until 300L).filter(_ % 40 == 0)), dim, pq = Some(pqSpec))
    val queries = vecs(Seq(9L, 200L))
    val got = AnnIndex.searchTopKRerank(spark, idx, queries, k = 3,
      nprobe = 2, kCand = 12).orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    // expected: the SAME kCand ADC candidates, re-ranked by exact
    // cosine against the corpus vectors
    val cand = AnnIndex.searchTopK(spark, idx, queries, k = 12, nprobe = 2)
      .select($"qid", $"cid")
    val exact = cand
      .join(vecs(0L until 300L).select($"vec_id".as("cid"),
        $"embedding".as("cv")), Seq("cid"))
      .join(queries.select($"vec_id".as("qid"), $"embedding".as("qv")),
        Seq("qid"))
      .withColumn("cos", round(graft.operators.Similarity
        .cosine($"qv", $"cv"), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"qid")
      .orderBy($"cos".desc, $"cid".asc)
    val want = exact.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3).select("qid", "cid", "cos", "rank")
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got == want, "rerank diverged from exact refinement of the candidates")
  }

  test("foldAssign folds pending refs AND restores the cell-clustered layout") {
    val corpus = freshDir(); val idx = freshDir()
    withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      SnapshotTable.write(spark, vecs(0L until 400L), corpus, "overwrite",
        Seq("vec_id"))
      AnnIndex.build(spark, corpus, idx,
        vecs((0L until 400L).filter(_ % 25 == 0)), dim) // 16 cells
      // CDC epochs leave pending refs on the assign table
      SnapshotTable.deleteByKey(spark, corpus, "vec_id",
        spark.range(0, 30).toDF("vec_id"))
      AnnIndex.refresh(spark, idx)
    }
    val assign = s"$idx/assign"
    def m() = SnapshotTable.readManifest(spark, assign,
      SnapshotTable.latestVersion(spark, assign).get)
    assert(m().files.exists(_.eqDv.nonEmpty), "fixture left nothing pending")
    val queries = vecs(Seq(42L, 333L))
    val before = searchRows(idx, queries)
    withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      AnnIndex.foldAssign(spark, idx)
    }
    val after = m()
    assert(after.files.forall(_.eqDv.isEmpty), "fold left pending refs")
    assert(SnapshotTable.scan(spark, assign).count() == 370)
    // the round-17 claim: the fold PRESERVES manifest-level cell
    // pruning (purgeDeletes' bucket-blind bin-pack used to widen the
    // rewritten files' cell ranges — a probe then opened ~everything)
    assert(after.files.size >= 4, s"fixture too small: ${after.files.size}")
    val minCell = after.files.flatMap(_.stats.get("cell")).map(_._1).min
    val hit = after.files.count(fe => fe.stats.get("cell").forall {
      case (mn, mx) => minCell >= mn && minCell <= mx
    })
    assert(hit < after.files.size,
      s"fold destroyed the cell clustering: $hit of ${after.files.size} files admit one cell")
    assert(searchRows(idx, queries) == before,
      "fold changed search results")
  }

  test("quantizer drift: a planted distribution shift trips the metadata-only signal") {
    val corpus = freshDir(); val idx = freshDir()
    // near-uniform fixture over 10 cells — must NOT trip
    withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      SnapshotTable.write(spark, vecs(0L until 400L), corpus, "overwrite",
        Seq("vec_id"))
      AnnIndex.build(spark, corpus, idx,
        vecs((0L until 400L).filter(_ % 40 == 0)), dim)
      val calm = AnnIndex.driftStats(spark, idx)
      assert(calm.ratio < 4.0,
        s"uniform fixture tripped the drift signal: $calm")
      // the shift: 400 late arrivals that are all NEAR ONE VECTOR —
      // they funnel into one cell, the frozen quantizer can't adapt
      SnapshotTable.write(spark,
        spark.range(1000L, 1400L).toDF("vec_id")
          .withColumn("embedding",
            transform(sequence(lit(0), lit(dim - 1)),
              j => (sin(j * 1.13) + ($"vec_id" - 1000L) * 1e-4f)
                .cast("float"))),
        corpus, "append", Seq("vec_id"))
      AnnIndex.refresh(spark, idx)
    }
    val drifted = AnnIndex.driftStats(spark, idx)
    assert(drifted.ratio > 8.0,
      s"planted shift did not trip the drift signal: $drifted")
    // confidence datum: the hot cell's file is single-cell, so at
    // least half the rows sit where the estimate is EXACT
    assert(drifted.exactFraction >= 0.45 && drifted.exactFraction <= 1.0,
      s"exactFraction implausible: $drifted")
    // ZERO data reads: the signal answers from the manifest + the
    // vocabulary-sized centroid set alone — prove it by removing the
    // assignment PAYLOAD bytes and asking again
    val dataP = new org.apache.hadoop.fs.Path(s"$idx/assign/data")
    val f = dataP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(dataP).foreach(st => f.delete(st.getPath, false))
    assert(AnnIndex.driftStats(spark, idx).ratio == drifted.ratio,
      "driftStats touched assign/ data files")
  }

  test("maintain's index sweep: refresh-when-stale, no-op-when-fresh, drift report") {
    // round-18: CALL maintain(..., refresh_indexes => true) walks the
    // table's ANN indexes — refreshes stale ones BEFORE vacuum and
    // REPORTS (never executes) rebuild-recommended past the drift
    // threshold. Opt-in: the default sweep leaves indexes alone.
    val root = Files.createTempDirectory("graft-annix-mnt").toString
    spark.conf.set("spark.sql.catalog.graftannm",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftannm.root", root)
    vecs(0L until 400L).createOrReplaceTempView("annixm_src")
    spark.sql("CREATE TABLE graftannm.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO graftannm.corpus SELECT * FROM annixm_src")
    withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      spark.sql("CALL graftannm.system.ann_build('corpus', 'ix', " +
        s"'vec_id', 'embedding', $dim, 10)")
    }
    // stale the index with a CDC epoch
    vecs(400L until 430L).createOrReplaceTempView("annixm_more")
    spark.sql("INSERT INTO graftannm.corpus SELECT * FROM annixm_more")
    def corpusRows() = spark.sql("SELECT * FROM graftannm.corpus")
      .collect().map(_.toSeq).toSet
    val before = corpusRows()
    // default sweep: indexes NOT walked (opt-in), index stays stale
    val r0 = spark.sql("CALL graftannm.system.maintain('corpus')").head
    assert(r0.getAs[Int]("indexes_refreshed") == 0)
    assert(spark.sql("SELECT stale FROM graftannm.corpus.indexes").head
      .getBoolean(0), "default maintain must not touch indexes")
    // opted-in sweep: refreshes the stale index, corpus content fixed
    val r1 = spark.sql(
      "CALL graftannm.system.maintain('corpus', 0.0, true)").head
    assert(r1.getAs[Int]("indexes_refreshed") == 1,
      s"stale index not refreshed: $r1")
    assert(r1.getAs[String]("index_rebuild_recommended") == "")
    assert(!spark.sql("SELECT stale FROM graftannm.corpus.indexes").head
      .getBoolean(0), "sweep left the index stale")
    assert(corpusRows() == before, "index sweep mutated the corpus")
    // fresh: the second sweep is a no-op
    val r2 = spark.sql(
      "CALL graftannm.system.maintain('corpus', 0.0, true)").head
    assert(r2.getAs[Int]("indexes_refreshed") == 0)
    // planted distribution shift (the driftStats fixture): late
    // arrivals funneling into ONE cell — the sweep refreshes AND
    // reports rebuild-recommended
    spark.range(1000L, 1400L).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)),
          j => (sin(j * 1.13) + ($"vec_id" - 1000L) * 1e-4f)
            .cast("float")))
      .createOrReplaceTempView("annixm_shift")
    spark.sql("INSERT INTO graftannm.corpus SELECT * FROM annixm_shift")
    val r3 = spark.sql(
      "CALL graftannm.system.maintain('corpus', 0.0, true)").head
    assert(r3.getAs[Int]("indexes_refreshed") == 1)
    assert(r3.getAs[String]("index_rebuild_recommended") == "ix",
      s"planted shift not reported: $r3")
    assert(r3.getAs[String]("index_errors") == "")
    // a STRUCTURALLY dead index (vanished centroids) classifies as
    // rebuild-recommended, not as a transient error — and must not
    // kill the sweep
    val cen = new org.apache.hadoop.fs.Path(
      s"$root/corpus/_ann/ix/centroids")
    cen.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(cen, true)
    val r4 = spark.sql(
      "CALL graftannm.system.maintain('corpus', 0.0, true)").head
    assert(r4.getAs[String]("index_rebuild_recommended") == "ix",
      s"dead index must report rebuild-recommended: $r4")
    assert(r4.getAs[Int]("indexes_refreshed") == 0)
  }

  test("SQL face: ann_build_pq builds a PQ index; ann_search refines to exact cosine") {
    val root = Files.createTempDirectory("graft-annix-sql").toString
    spark.conf.set("spark.sql.catalog.graftann",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftann.root", root)
    vecs(0L until 300L).createOrReplaceTempView("annix_src")
    spark.sql("CREATE TABLE graftann.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO graftann.corpus SELECT * FROM annix_src")
    spark.sql("CALL graftann.system.ann_build_pq('corpus', 'px', " +
      s"'vec_id', 'embedding', $dim, 8, ${pqSpec.m}, ${pqSpec.ks}, " +
      s"${pqSpec.iters})")
    // the indexes metadata table sees the PQ layout
    val ix = spark.sql("SELECT kind, pq_m, pq_ks FROM " +
      "graftann.corpus.indexes").head
    assert((ix.getString(0), ix.getInt(1), ix.getInt(2)) ==
      ("ivf_pq", pqSpec.m, pqSpec.ks))
    spark.sql("CREATE TABLE graftann.q AS SELECT * FROM graftann.corpus " +
      "WHERE vec_id IN (CAST(5 AS BIGINT), CAST(99 AS BIGINT))")
    val viaSql = spark.sql(
      "CALL graftann.system.ann_search('corpus', 'px', 'q', 3, 2)")
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    // `cos` must mean EXACT cosine on either layout: the SQL face
    // retrieves 4k ADC candidates and refines — pin against the
    // programmatic retrieve-then-refine with the same parameters
    val want = AnnIndex.searchTopKRerank(spark, s"$root/corpus/_ann/px",
      vecs(Seq(5L, 99L)), k = 3, nprobe = 2, kCand = 12)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(viaSql == want, "SQL ann_search diverged from the rerank recipe")
    // k_cand is a PARAMETER (round-18 advice): recall of the refined
    // top-k is capped by the candidate pool, so SQL can widen it
    val widened = spark.sql(
      "CALL graftann.system.ann_search('corpus', 'px', 'q', 3, 2, 20)")
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val wantWide = AnnIndex.searchTopKRerank(spark, s"$root/corpus/_ann/px",
      vecs(Seq(5L, 99L)), k = 3, nprobe = 2, kCand = 20)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(widened == wantWide, "explicit k_cand did not reach the rerank")
    // one meta resolution per CALL (round-18): the PQ face used to
    // list+open the meta three times (isPq → rerank → nested search)
    // on the query latency path
    AnnIndex.metaResolves.reset()
    spark.sql("CALL graftann.system.ann_search('corpus', 'px', 'q', 3, 2)")
      .collect()
    assert(AnnIndex.metaResolves.sum() == 1L,
      s"ann_search resolved the index meta ${AnnIndex.metaResolves.sum()} times")
  }

  test("meta publish is create-exclusive: a lost slot race lands at a higher seq") {
    // regression (round-17 advice): publish wrote temp + rename, and
    // rename REPLACES an existing destination on POSIX/local
    // filesystems — two concurrent publishers (a streaming
    // applyFeedBatch racing a manual CALL ann_refresh) could both
    // land _ann_meta-<N>.json, silently losing one watermark advance.
    val idx = freshDir()
    val f = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val a = """{"first":true}""".getBytes("UTF-8")
    val b = """{"second":true}""".getBytes("UTF-8")
    // both publishers believe seq 1 is free — the slot loser must
    // retry upward, never clobber
    assert(AnnIndex.publishExclusive(f, idx, a, 1L) == 1L)
    assert(AnnIndex.publishExclusive(f, idx, b, 1L) == 2L)
    def read(name: String): String = {
      val in = f.open(new org.apache.hadoop.fs.Path(idx, name))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(read("_ann_meta-1.json") == """{"first":true}""",
      "the slot loser clobbered the winner's meta")
    assert(read("_ann_meta-2.json") == """{"second":true}""")
  }

  test("indexes metadata table SHOWS a broken index instead of omitting it") {
    val root = Files.createTempDirectory("graft-annix-bad").toString
    spark.conf.set("spark.sql.catalog.graftannb",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftannb.root", root)
    vecs(0L until 100L).createOrReplaceTempView("annixb_src")
    spark.sql("CREATE TABLE graftannb.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO graftannb.corpus SELECT * FROM annixb_src")
    spark.sql("CALL graftannb.system.ann_build('corpus', 'good', " +
      s"'vec_id', 'embedding', $dim, 4)")
    spark.sql("CALL graftannb.system.ann_build('corpus', 'hurt', " +
      s"'vec_id', 'embedding', $dim, 4)")
    // corrupt one index: its centroids table vanishes
    val p = new org.apache.hadoop.fs.Path(s"$root/corpus/_ann/hurt/centroids")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val rows = spark.sql("SELECT name, status FROM graftannb.corpus.indexes " +
      "ORDER BY name").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 2, s"a broken index vanished from the surface: ${rows.toSeq}")
    assert(rows(0) == ("good", "ok"))
    assert(rows(1)._1 == "hurt" && rows(1)._2 != "ok",
      s"broken index must carry its failure: ${rows(1)}")
  }

  test("meta publish is crash-safe: a readable meta exists at every instant") {
    // regression (round-17 advice): publish used to delete-then-rename
    // the single meta file, so a crash in between left the index with
    // NO meta — refresh/search/applyFeedBatch all dead until a full
    // rebuild. Publish now writes a fresh seq-named sibling first and
    // deletes older files only after it exists.
    val corpus = freshDir(); val idx = freshDir()
    SnapshotTable.write(spark, vecs(0L until 100L), corpus, "overwrite",
      Seq("vec_id"))
    AnnIndex.build(spark, corpus, idx, vecs(Seq(0L, 40L, 80L)), dim)
    val p = new org.apache.hadoop.fs.Path(idx)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def metas() = f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_ann_meta")).sorted
    assert(metas() == Seq("_ann_meta-0.json"))
    SnapshotTable.write(spark, vecs(100L until 120L), corpus, "append",
      Seq("vec_id"))
    AnnIndex.refresh(spark, idx)
    assert(metas() == Seq("_ann_meta-1.json"),
      "publish must advance the seq and clean the older file")
    // the crash-between-rename-and-delete state: BOTH present, the
    // older stale — readers must pick the newest
    val stale = new org.apache.hadoop.fs.Path(idx, "_ann_meta-0.json")
    val out = f.create(stale, true)
    try out.write(
      (s"""{"corpusDir":"$corpus","indexedVersion":1,"dim":$dim,""" +
        """"idCol":"vec_id","vecCol":"embedding"}""").getBytes("UTF-8"))
    finally out.close()
    SnapshotTable.write(spark, vecs(120L until 130L), corpus, "append",
      Seq("vec_id"))
    AnnIndex.refresh(spark, idx)
    assert(metas() == Seq("_ann_meta-2.json"),
      "the next publish must sweep the stale leftover too")
    assert(SnapshotTable.scan(spark, s"$idx/assign").count() == 130,
      "refresh must consume the feed from the NEWEST meta's version")
    // a torn higher-seq candidate (unreadable bytes) falls through to
    // the newest readable one instead of killing the index
    val torn = new org.apache.hadoop.fs.Path(idx, "_ann_meta-9.json")
    val out2 = f.create(torn, true)
    try out2.write("{half a jso".getBytes("UTF-8")) finally out2.close()
    val queries = vecs(Seq(5L, 125L))
    assert(searchRows(idx, queries).nonEmpty)
    f.delete(torn, false)
  }

  test("search probes prune at the manifest: only probed-cell files open") {
    val corpus = freshDir(); val idx = freshDir()
    SnapshotTable.write(spark, vecs(0L until 400L), corpus, "overwrite",
      Seq("vec_id"))
    // a 400-row fixture coalesces to one file under AQE; pin the
    // multi-file cell-clustered layout a real corpus gets
    withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      AnnIndex.build(spark, corpus, idx,
        vecs((0L until 400L).filter(_ % 25 == 0)), dim) // 16 cells
    }
    val assign = s"$idx/assign"
    val m = SnapshotTable.readManifest(spark, assign,
      SnapshotTable.latestVersion(spark, assign).get)
    assert(m.files.size >= 4, s"fixture too small: ${m.files.size} files")
    // a 1-query, 2-probe search admits at most the files whose cell
    // range intersects its two probed cells — strictly fewer than all
    val res = AnnIndex.searchTopK(spark, idx, vecs(Seq(42L)), k = 3,
      nprobe = 2).collect()
    assert(res.length == 3)
    // manifest-level pruning pin: a single probed cell admits a
    // strict subset of the files under the cell-clustered layout
    // (this is the predicate readIn applies before opening anything)
    val minCell = m.files.flatMap(_.stats.get("cell")).map(_._1).min
    val hit = m.files.count(fe => fe.stats.get("cell").forall {
      case (mn, mx) => minCell >= mn && minCell <= mx
    })
    assert(hit < m.files.size,
      s"cell-clustered layout failed to prune: $hit of ${m.files.size} files hit")
  }
}
