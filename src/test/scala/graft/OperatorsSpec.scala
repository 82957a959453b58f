package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

class OperatorsSpec extends SparkTestBase {

  import spark.implicits._

  test("Conform adds missing columns as typed nulls, keeps existing") {
    val df = Seq((1L, "x")).toDF("id", "a")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("a", StringType),
      StructField("b", DoubleType)))
    val out = Conform.conformSchema(df, schema)
    assert(out.columns.toSeq == Seq("id", "a", "b"))
    assert(out.select("b").collect()(0).get(0) == null)
    assert(out.schema("b").dataType == DoubleType)
  }

  test("Dedupe.keepLatest keeps the max recency row per payload") {
    val df = Seq(
      ("k1", "p", 1.0), ("k1", "p", 3.0), ("k1", "p", 2.0),
      ("k2", "q", 5.0)).toDF("k", "payload", "ct")
    val out = Dedupe.keepLatest(df, Seq("k", "payload"), "ct")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("k1", 3.0), ("k2", 5.0)))
  }

  test("keepLatestAllCols: identical payloads collapse, distinct stay") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0)).toDF("p", "creation_time")
    val out = Dedupe.keepLatestAllCols(df, "creation_time")
    assert(out.count() == 2)
    assert(out.filter($"p" === "a").select("creation_time").collect()(0).getDouble(0) == 2.0)
  }

  test("saltedLeftJoin equals the plain left join, hot key included") {
    val big = ((1 to 200).map(i => ("hot", i)) ++ Seq(("cold", 0), ("miss", -1)))
      .toDF("k", "v")
    val small = Seq(("hot", 1.5), ("cold", 2.5), ("other", 9.9)).toDF("k", "w")
    val salted = SkewJoin.saltedLeftJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "v", "w").orderBy("k", "v").collect().toSeq
    val plain = big.join(small, Seq("k"), "left")
      .select("k", "v", "w").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
    assert(salted.exists(r => r.getString(0) == "miss" && r.isNullAt(2)))
  }

  test("cleanCompetitor drops rows with any invalid flight number (F-C)") {
    val raw = Seq(
      ("CI73", "2024-01-05", "2024-01-12", 100L, 10L),
      ("BAD*CODE", "2024-01-05", "2024-01-12", 100L, 10L),
      ("", "2024-01-06", "2024-01-13", 200L, 20L))
      .toDF("去程航班編號1", "去程日期", "回程日期", "票面價格", "稅金")
    val out = Cleaners.cleanCompetitor(raw, "p", "t")
    val rows = out.select("去程_航班編號1", "出發日期").orderBy("出發日期").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "CI073") // padded
    assert(rows(0).getString(1) == "01/05") // ISO sliced
    assert(rows(1).getString(0) == "")
  }

  test("splitFlightAndClass (P7) splits on first space, trims flight, drops original") {
    val df = Seq(
      ("CI073 K", "BR010  J1", Option.empty[String]),
      ("CI9", "", Option("BR100 Y")))
      .toDF("去程_航班號1", "去程_航班號2", "回程_航班號1")
    val out = Cleaners.splitFlightAndClass(df)
    assert(!out.columns.exists(_.contains("航班號")))
    val rows = out.select(
        "去程_航班編號1", "去程_艙等1", "去程_航班編號2", "去程_艙等2",
        "回程_航班編號1", "回程_艙等1")
      .orderBy("去程_航班編號1").collect()
    // reference split(' ', n=1): flight trimmed, class keeps remainder verbatim
    assert(rows(0).getString(0) == "CI073" && rows(0).getString(1) == "K")
    assert(rows(0).getString(2) == "BR010" && rows(0).getString(3) == " J1")
    assert(rows(0).isNullAt(4) && rows(0).isNullAt(5)) // null composite -> both null
    assert(rows(1).getString(0) == "CI9" && rows(1).isNullAt(1)) // no space -> class null
    assert(rows(1).getString(2) == "" && rows(1).isNullAt(3)) // empty -> "", null
    assert(rows(1).getString(4) == "BR100" && rows(1).getString(5) == "Y")
  }

  test("exactDedup groups identical text, keeps min id") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = TextDedup.exactDedup(df, "doc_id", "text")
      .orderBy("keeper_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("incrementalDedup keeps batch rows unseen in corpus, first within batch") {
    val corpus = Seq((1L, "existing doc"), (2L, "another existing")).toDF("doc_id", "text")
    val batch = Seq(
      (17L, "existing doc"),   // dup of corpus -> dropped
      (27L, "fresh content"),  // fresh -> kept
      (37L, "repeated batch"), // first in batch -> kept
      (47L, "repeated batch")  // dup within batch -> dropped
    ).toDF("doc_id", "text")
    val out = TextDedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(27L, 37L))
  }

  test("dupShingleFraction scores repetition, zero for short docs") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "a b c a b c a b"), // 6 trigrams, 3 distinct -> 0.5
      (2L, "all words here are unique today"),
      (3L, "a b"), (4L, "")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextFunctions.dupShingleFraction($"text", 3).as("f"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 0.5), (2L, 0.0), (3L, 0.0), (4L, 0.0)))
  }

  test("ngramJaccardPairs finds a planted near-duplicate, skips distinct docs") {
    val a = "the quick brown fox jumps over the lazy dog today again"
    val b = "the quick brown fox jumps over the lazy dog today tomorrow" // 1-word change
    val c = "completely different words with no overlap at all here now"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = TextDedup.ngramJaccardPairs(df, "doc_id", "text", 5, 0.3, maxDf = 100)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
  }

  test("capShingleDf drops a boilerplate shingle present in >50% of docs") {
    // 20 distinct docs sharing one boilerplate 5-gram prefix + 1 true near-dup pair
    val boiler = "all rights reserved by site"
    val docs = (1 to 20).map(i =>
      (i.toLong, s"$boiler unique$i words$i here$i only$i body$i text$i tail$i")) ++ Seq(
      (100L, "strawberry kiwi mango papaya guava lychee durian peach plum apricot"),
      (101L, "strawberry kiwi mango papaya guava lychee durian peach plum nectarine"))
    val df = docs.toDF("doc_id", "text")
    val sh = TextDedup.shingleIndex(df, "doc_id", "text", 5)
    val capped = TextDedup.capShingleDf(sh, maxDf = 5)
    // the boilerplate shingle's hash is gone; per-doc uniques survive
    val boilerHash = spark.range(1)
      .select(graft.functions.TextFunctions.polyHash(lit(boiler)))
      .collect()(0).getLong(0)
    assert(capped.filter($"sh_hash" === boilerHash).count() == 0)
    assert(capped.count() > 0)
    val maxDfLeft = capped.groupBy("sh_hash").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxDfLeft <= 5)
    // the planted near-dup is still found; no pair exists merely via boilerplate
    val pairs = TextDedup.ngramJaccardPairs(df, "doc_id", "text", 5, 0.3, maxDf = 5)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 100L && pairs(0).getLong(1) == 101L)
  }

  test("capBandBuckets drops a hot LSH bucket of near-identical docs") {
    // 30 identical docs (exact-dedup territory -> hot band buckets) + a near-dup pair
    val docs = (1 to 30).map(i =>
      (i.toLong, "identical boilerplate document body repeated verbatim many times over")) ++ Seq(
      (100L, "strawberry kiwi mango papaya guava lychee durian peach plum apricot"),
      (101L, "strawberry kiwi mango papaya guava lychee durian peach plum nectarine"))
    val df = docs.toDF("doc_id", "text")
    val out = TextDedup.minhashLshPairs(df, "doc_id", "text", 5, 32, 4, 0.3,
      maxDf = 100, maxBucket = 10).collect()
    // the identical-doc cluster (bucket size 30 > 10) emits no pairs;
    // the small near-dup bucket survives
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)))
  }

  test("minhashLshPairs recall matches exact jaccard on planted dups") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = base.replace("mu", "nu")
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val exact = TextDedup.ngramJaccardPairs(df, "doc_id", "text", 5, 0.5, maxDf = 100)
      .select("doc_a", "doc_b").collect().toSet
    val lsh = TextDedup.minhashLshPairs(df, "doc_id", "text", 5, 32, 4, 0.5,
        maxDf = 100, maxBucket = 100)
      .select("doc_a", "doc_b").collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("DedupClusters.resolve: chain + isolated pair -> component minima") {
    // chain 1-2-3-4-5-6 (diameter 5, needs several propagation rounds),
    // isolated pair 10-11, and a triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val out = DedupClusters.resolve(pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("lmFitScore: deterministic transitions score scale, rare ones score low") {
    // doc 1 and 2: 'a' is ALWAYS followed by 'b' corpus-wide, so every
    // (a,b) transition has probability 1 -> scaled 1,000,000; doc 3
    // breaks 'c' into two successors (d here, e in doc 4) -> p = 1/2
    val docs = Seq(
      (1L, "a b a b a b"),  // 5 bigrams: ab, ba, ab, ba, ab
      (2L, "a b"),
      (3L, "c d"),
      (4L, "c e"),
      (5L, "x")).toDF("doc_id", "text") // single token: no bigrams, no row
    val out = graft.operators.NgramModel.lmFitScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2: one (a,b) bigram, p(b|a) = 4/4 -> exactly scale
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1) == ((2L, 1L, 1000000L)))
    // doc 3: one (c,d), p(d|c) = 1/2 -> exactly scale/2
    assert(out(2) == ((3L, 1L, 500000L)))
    // doc 1: 'a' only ever precedes 'b' and 'b' only ever precedes 'a'
    // corpus-wide, so all 5 transitions are deterministic -> scale
    assert(out(0) == ((1L, 5L, 1000000L)))
  }

  test("incrementalLshPairs equals cross-side slice of the self-join variant") {
    // corpus with a planted near-dup pair + batch containing an exact
    // copy, a near-dup, and an unrelated doc
    val mk = (n: Int, tail: String) =>
      (1 to 12).map(i => s"w$i").mkString(" ") + " " + tail
    val corpus = Seq(
      (1L, mk(1, "alpha beta gamma delta")),
      (2L, mk(2, "alpha beta gamma epsilon")),
      (3L, "totally different content entirely " + (1 to 10).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, mk(1, "alpha beta gamma delta")),   // exact copy of 1
      (102L, mk(2, "alpha beta gamma zeta")),    // near-dup of 2
      (103L, (1 to 15).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    val inc = graft.operators.TextDedup.incrementalLshPairs(batch, corpus,
        "doc_id", "text", k = 5, numHashes = 32, rowsPerBand = 4,
        threshold = 0.5, maxDf = 100, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the self-join variant over the union, sliced to cross-side pairs,
    // must agree exactly (same caps over the same union)
    val self = graft.operators.TextDedup.minhashLshPairs(
        corpus.unionAll(batch), "doc_id", "text", k = 5, numHashes = 32,
        rowsPerBand = 4, threshold = 0.5, maxDf = 100, maxBucket = 100)
      .filter(col("doc_b") >= 100L && col("doc_a") < 100L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    assert(inc.toSet == self.toSet)
    val pairs = inc.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((101L, 1L)) && pairs.contains((102L, 2L)))
    assert(inc.find(t => t._1 == 101L && t._2 == 1L).get._3 == 1.0)
    assert(!pairs.exists(_._1 == 103L), "unrelated batch doc must not match")
    assert(inc.forall(t => t._1 >= 100L && t._2 < 100L), "pairs must be cross-side only")
  }

  test("spanScrub removes repeated spans at any alignment, keeps first") {
    val docs = Seq(
      (1L, "a b c d e f g h"),             // first occurrence: untouched
      (2L, "x x a b c d e f g h y"),       // embeds doc 1's run at offset 2
      (3L, "p q r s p q r s"),             // INTRA-doc repeat of "p q r s"
      (4L, "t u v"),                       // shorter than w: passes through
      (5L, "")).toDF("doc_id", "text")     // empty: still gets a row
    val out = graft.operators.TextDedup.spanScrub(docs, "doc_id", "text", w = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out(0) == ((1L, 8, 0, "a b c d e f g h")))
    // doc 2: window starts 3..7 duplicate doc 1's 1..5 -> tokens 3..10 go
    assert(out(1) == ((2L, 11, 8, "x x y")))
    // doc 3: window start 5 duplicates start 1 -> tokens 5..8 go
    assert(out(2) == ((3L, 8, 4, "p q r s")))
    assert(out(3) == ((4L, 3, 0, "t u v")))
    assert(out(4) == ((5L, 0, 0, "")))
  }

  test("spanScrub matches a brute-force reference on random small-vocab docs (seeded)") {
    // tiny vocabulary + short window => dense repeated spans, heavy
    // overlap, intra- and inter-doc duplication all exercised
    def ref(docs: Seq[(Long, String)], w: Int): Map[Long, (Int, Int, String)] = {
      val toks = docs.map { case (id, t) =>
        id -> (if (t.trim.isEmpty) Array.empty[String] else t.trim.split("\\s+"))
      }
      val wins = for {
        (id, tk) <- toks if tk.length >= w
        s <- 0 to tk.length - w
      } yield ((id, s + 1), tk.slice(s, s + w).mkString(" "))
      val firstOf = wins.groupBy(_._2).map { case (txt, occ) => txt -> occ.map(_._1).min }
      val removed = wins.collect { case (loc, txt) if firstOf(txt) != loc => loc }.toSet
      toks.map { case (id, tk) =>
        val kept = tk.zipWithIndex.collect {
          case (tok, i0) if !(math.max(1, i0 + 2 - w) to (i0 + 1))
            .exists(s => removed((id, s))) => tok
        }
        id -> ((tk.length, tk.length - kept.length, kept.mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(71)
    val vocab = Array("a", "b", "c")
    for (trial <- 1 to 6) {
      val docs = (1L to (3 + rnd.nextInt(6)).toLong).map { id =>
        id -> Seq.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val w = 2 + rnd.nextInt(3)
      val got = graft.operators.TextDedup
        .spanScrub(docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      assert(got == ref(docs, w), s"trial=$trial w=$w docs=$docs")
    }
  }

  test("spanScrub plan: no cartesian product, fingerprints shuffle not text") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    val plan = graft.operators.TextDedup.spanScrub(docs, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"coverage join fell back to all-pairs:\n$plan")
  }

  test("DedupClusters.resolveBlocked matches resolve on a seeded blocked graph") {
    // three blocks with different shapes: a chain (diameter 7), a pair
    // of separate clusters in one block, and a triangle + isolated edge;
    // node ids are disjoint from block ids to catch key mix-ups
    val pairs = (
      (1L to 7L).map(i => (i, i + 1, "b1")) ++ // chain 1..8
        Seq((100L, 101L, "b2"), (200L, 201L, "b2"), (201L, 202L, "b2")) ++
        Seq((300L, 301L, "b3"), (301L, 302L, "b3"), (300L, 302L, "b3"),
          (400L, 401L, "b3"))
      ).toDF("doc_a", "doc_b", "blk")
    val local = DedupClusters.resolveBlocked(pairs, blockCols = Seq("blk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = DedupClusters.resolve(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local == dist)
    assert(local.contains(8L -> 1L) && local.contains(202L -> 200L) &&
      local.contains(401L -> 400L))
    // skew fallback: a bound below every block's edge count routes ALL
    // blocks through the distributed hybrid — same components
    val fallback = DedupClusters.resolveBlocked(pairs, blockCols = Seq("blk"),
        maxBlockEdges = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fallback == dist)
    // mixed: bound between block sizes -> b2/b3 local, b1 distributed
    val mixed = DedupClusters.resolveBlocked(pairs, blockCols = Seq("blk"),
        maxBlockEdges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mixed == dist)
  }

  test("DedupClusters.resolveBlocked fails loudly on a cross-block node") {
    // node 50 has edges under blocks b1 AND b2 — the contract
    // violation: block-local union-find would label it twice (resolve
    // computes ONE merged component), so the guard must abort instead
    // of shipping conflicting labels
    val bad = Seq((50L, 51L, "b1"), (50L, 60L, "b2"), (60L, 61L, "b2"))
      .toDF("doc_a", "doc_b", "blk")
    val ex = intercept[Exception] {
      DedupClusters.resolveBlocked(bad, blockCols = Seq("blk")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(
        _.contains("resolveBlocked contract violated"))),
      s"wrong failure: $ex")
    // validate=false restores the raw (documented-unsafe) behavior for
    // generators that guarantee the contract structurally
    val raw = DedupClusters.resolveBlocked(bad, blockCols = Seq("blk"),
      validate = false).collect()
    assert(raw.count(_.getLong(0) == 50L) == 2) // the duplicate the guard exists to catch
  }

  test("chunkWithOverlap window rule: boundaries, short docs, empty docs") {
    // reference implementation of the documented rule
    def ref(n: Int, chunk: Int, ov: Int): Seq[(Long, Long, Long)] = {
      val stride = chunk - ov
      (0 to math.max(n - ov - 1, 0) by stride).zipWithIndex
        .filter { case (s, _) => n > 0 }
        .map { case (s, i) => (i.toLong, s.toLong, math.min(chunk, n - s).toLong) }
    }
    val docs = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")), // 80 toks: starts 0/24/48
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")), // exactly one window
      (3L, (1 to 33).map(i => s"t$i").mkString(" ")), // one past: second (short) chunk
      (4L, "only three tokens"),                      // n < overlap: single chunk
      (5L, "   "),                                    // whitespace-only: no rows
      (6L, (1 to 24).map(i => s"t$i").mkString(" "))  // n == stride: one chunk
    ).toDF("doc_id", "text")
    val out = graft.operators.Curation
      .chunkWithOverlap(docs, "doc_id", "text", chunkTokens = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val expected = Seq(1 -> 80, 2 -> 32, 3 -> 33, 4 -> 3, 6 -> 24).flatMap {
      case (id, n) => ref(n, 32, 8).map(c => (id.toLong, c))
    }
    assert(out.toSeq == expected, s"got ${out.toSeq}")
    // overlap is real: chunk k's last 8 tokens == chunk k+1's first 8
    val texts = graft.operators.Curation
      .chunkWithOverlap(docs.filter($"doc_id" === 1L), "doc_id", "text", 32, 8)
      .orderBy("chunk_id").collect().map(_.getString(4))
    texts.sliding(2).foreach { case Array(a, b) =>
      assert(a.split(" ").takeRight(8).toSeq == b.split(" ").take(8).toSeq)
    case _ => }
  }

  test("DedupClusters.resolve closes deep chains via the doubling phase") {
    // diameter 119 > maxIter 64: neighbor-min alone cannot converge
    // inside the round budget — the pointer-doubling phase past
    // doublingAfter must close it (48 cheap rounds + O(log) hops)
    val chain = spark.range(1, 120)
      .selectExpr("id AS doc_a", "id + 1 AS doc_b")
    val out = DedupClusters.resolve(chain, maxIter = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 120 && out.forall(_._2 == 1L))
  }

  test("contaminatedDocs flags benchmark copies and 13-gram overlaps only") {
    val bench13 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val corpus = Seq(
      (1L, s"prefix words here $bench13 suffix words"), // contains the full 13-gram
      (2L, "totally different text with plenty of tokens but nothing shared " +
        "from the benchmark document at all in any window of thirteen"),
      (3L, bench13)) // exact copy
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, bench13)).toDF("doc_id", "text")
    val out = TextDedup.contaminatedDocs(corpus, benchmark, "doc_id", "text", 13)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L))
  }

  test("hashSample is partition-invariant and rate-accurate") {
    val df = spark.range(10000).select(col("id"), (col("id") % 3).as("s"))
    def ids(parts: Int): Set[Long] =
      Sampling.hashSample(df.repartition(parts), "id", 1, 4, "t1")
        .select("id").collect().map(_.getLong(0)).toSet
    val a = ids(1)
    assert(a == ids(13)) // same rows under any partitioning
    assert(math.abs(a.size - 2500) < 250) // ~1/4 kept
    // a different salt draws an independent sample of the same rate
    val b = Sampling.hashSample(df, "id", 1, 4, "t2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(b != a && math.abs(b.size - 2500) < 250)
    assert(math.abs((a & b).size - 625) < 200) // ~independent overlap n/16
  }

  test("weightedRepeat emits floor(num/den) or +1 copies, partition-invariant") {
    val df = spark.range(4000).select(col("id"), (col("id") % 3).as("s"))
    def rows(parts: Int): Seq[(Long, Int)] =
      Sampling.weightedRepeat(df.repartition(parts), "id", 5, 2, "up1")
        .select("id", "copy_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val a = rows(1)
    assert(a == rows(13)) // deterministic under any partitioning
    // every source row appears, with 2 or 3 copies numbered 0..k-1
    val byId = a.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byId.keySet == (0L until 4000L).toSet)
    assert(byId.values.forall(v => v == Seq(0, 1) || v == Seq(0, 1, 2)))
    // expectation 2.5 copies/row
    assert(math.abs(a.size - 10000) < 500)
    // num <= den degrades to keep-or-drop with copy_id 0
    val down = Sampling.weightedRepeat(df, "id", 1, 4, "up1")
      .select("id", "copy_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(down.forall(_._2 == 0) && math.abs(down.length - 1000) < 200)
  }

  test("redactPii scrubs urls, emails, and phone runs; leaves clean text") {
    import graft.functions.TextFunctions
    val df = Seq(
      "mail me at jo.doe+x@corp.example.org thanks",
      "docs at https://ex.example/a?b=1&c=2 and more",
      "call +1 (555) 010-7788 or (02) 1234 5678 now",
      "no pii in this sentence at all").toDF("text")
    val out = df.select(TextFunctions.redactPii($"text")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> thanks")
    assert(out(1) == "docs at <URL> and more")
    // the simple pattern anchors on a digit, so a leading "(" survives
    assert(out(2) == "call <PHONE> or (<PHONE> now")
    assert(out(3) == "no pii in this sentence at all")
  }

  test("KmvDistinct: exact below k, partition-order independent above") {
    import graft.functions.cat.KmvDistinct
    // 10 distinct values, k=64 -> exact count
    val small = (1 to 30).map(i => ("g", (i % 10).toString)).toDF("g", "v")
    val exact = small.groupBy("g").agg(KmvDistinct(col("v"), 64).as("d"))
      .collect()(0).getDouble(1)
    assert(exact == 10.0)
    // 5000 distinct values, k=64 -> estimator; identical result under
    // any partitioning (the min-k monoid is order-independent)
    val big = spark.range(5000).select(lit("g").as("g"), col("id").cast("string").as("v"))
    def est(parts: Int): Double =
      big.repartition(parts).groupBy("g").agg(KmvDistinct(col("v"), 64).as("d"))
        .collect()(0).getDouble(1)
    val e1 = est(1)
    assert(e1 == est(7) && e1 == est(32))
    assert(math.abs(e1 - 5000) / 5000.0 < 0.5) // coarse sketch, sane estimate
  }

  test("HllAgg: registers match a scalar reference, partition-independent, " +
    "rollup row merges the group sketches, estimate within error bound") {
    import graft.functions.cat.HllAgg
    val n = 5000
    val df = spark.range(n).select(
      (col("id") % 2).cast("string").as("g"), col("id").cast("string").as("v"))
    // scalar reference registers over the same values
    def refSketch(vals: Iterator[String]): Array[Byte] = {
      val regs = new Array[Byte](256)
      vals.foreach { s =>
        val h = HllAgg.hash48(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        val j = (h % 256).toInt
        val r = HllAgg.rho(h / 256)
        if (r > regs(j)) regs(j) = r.toByte
      }
      regs
    }
    def summary(regs: Array[Byte]): (Long, Long) =
      (regs.count(_ == 0).toLong, regs.map(r => 1L << (41 - r)).sum)
    val (refV, refS) = summary(refSketch((0 until n).iterator.map(_.toString)))
    def run(parts: Int) = df.repartition(parts)
      .agg(HllAgg(col("v"), 256).as("h"))
      .select(col("h.v_zero"), col("h.s_scaled"), col("h.est_raw"))
      .collect()(0)
    val r1 = run(1)
    assert((r1.getLong(0), r1.getLong(1)) == ((refV, refS)),
      "DF registers must equal the scalar reference")
    val r32 = run(32)
    assert(r1 == r32, "sketch must be partition-count independent")
    assert(math.abs(r1.getDouble(2) - n) / n < 0.2, // 1.04/sqrt(256) = 6.5% sigma
      s"estimate ${r1.getDouble(2)} too far from $n")
    // mergeability: the rollup's ALL row IS the elementwise max of the
    // per-group sketches — must equal sketching the whole input at once
    val all = df.rollup(col("g")).agg(HllAgg(col("v"), 256).as("h"))
      .filter(col("g").isNull)
      .select(col("h.v_zero"), col("h.s_scaled")).collect()(0)
    assert((all.getLong(0), all.getLong(1)) == ((refV, refS)),
      "rollup-merged sketch must equal the whole-input sketch")
  }

  test("HllAgg small-range correction: linear counting bounds low-cardinality " +
    "error where the raw estimator is useless") {
    import graft.functions.cat.HllAgg
    def sketch(n: Int): (Double, Double) = {
      val r = spark.range(n).select(col("id").cast("string").as("v"))
        .agg(HllAgg(col("v"), 256).as("h"))
        .select(col("h.est_raw"), col("h.est")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // the raw harmonic-mean estimator reads ~alpha*m (~185 for m=256)
    // even for near-empty sketches — the regime HLL++'s linear
    // counting exists for
    Seq(1, 3, 10, 50, 150).foreach { n =>
      val (raw, est) = sketch(n)
      assert(math.abs(est - n) <= math.max(1.0, 0.15 * n),
        s"corrected estimate $est too far from $n (raw was $raw)")
    }
    val (raw1, est1) = sketch(1)
    assert(raw1 > 100, s"raw estimator at n=1 should be ~alpha*m, got $raw1")
    assert(est1 < 2, s"linear counting at n=1 should be ~1, got $est1")
    // large range: the correction must NOT fire (est == est_raw)
    val (rawBig, estBig) = sketch(5000)
    assert(rawBig == estBig, "no correction outside the small range")
  }

  test("jaccardPrefixJoin is EXACT: equals brute force with stopwords, " +
    "identical docs, and boundary-threshold pairs present") {
    // 40 distinct docs sharing a super-common stopword (the prefix
    // index must survive hot tokens without caps), 3 identical docs,
    // one near-dup pair, one pair exactly AT the threshold
    val docs =
      (1 to 40).map(i => (i.toLong,
        s"the unique$i word$i only$i here$i body$i tail$i")) ++
      Seq(200L, 201L, 202L).map(i => (i, "identical repeated corpus entry verbatim")) ++
      Seq((300L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (301L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        // |A|=|B|=10, overlap 7 -> J = 7/13 ≈ 0.538
        (400L, "one two three four five six seven aaa bbb ccc"),
        (401L, "one two three four five six seven xxx yyy zzz"))
    val df = docs.toDF("doc_id", "text")
    def pairsAt(t: Double): Set[(Long, Long)] =
      graft.operators.TextDedup.jaccardPrefixJoin(df, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force via an uncapped token self-join (the oracle shape)
    val tok = df.select(col("doc_id"), explode(array_distinct(
      graft.functions.TextFunctions.tokens(col("text")))).as("token"))
    val cnt = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    def brute(t: Double): Set[(Long, Long)] = tok.as("a")
      .join(tok.as("b"), col("a.token") === col("b.token") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("sh"))
      .join(cnt.withColumnsRenamed(Map("doc_id" -> "da", "n" -> "na")), "da")
      .join(cnt.withColumnsRenamed(Map("doc_id" -> "db", "n" -> "nb")), "db")
      .filter(col("sh").cast("double") / (col("na") + col("nb") - col("sh")) >= t)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(0.9, 0.7, 0.5).foreach { t =>
      assert(pairsAt(t) == brute(t), s"prefix join must equal brute force at t=$t")
    }
    // the identical triple survives at 0.9; the J=7/13 pair appears
    // exactly when t crosses its value (>= semantics, no epsilon slop)
    assert(pairsAt(0.9).contains((200L, 201L)))
    assert(!pairsAt(0.55).contains((400L, 401L)))
    assert(pairsAt(7.0 / 13.0).contains((400L, 401L)))
    // never a cartesian product, even with the hot stopword
    val plan = graft.operators.TextDedup
      .jaccardPrefixJoin(df, "doc_id", "text", 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
    // shingle-set variant: equals the uncapped shingle brute force
    // (q5W's oracle shape) on the same corpus
    val sh = graft.operators.TextDedup
      .shingleIndex(df, "doc_id", "text", 5).distinct()
    val shCnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shBrute = sh.as("a")
      .join(sh.as("b"), col("a.sh_hash") === col("b.sh_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("sh"))
      .join(shCnt.withColumnsRenamed(Map("doc_id" -> "da", "n" -> "na")), "da")
      .join(shCnt.withColumnsRenamed(Map("doc_id" -> "db", "n" -> "nb")), "db")
      .filter(col("sh").cast("double") / (col("na") + col("nb") - col("sh")) >= 0.6)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shPrefix = graft.operators.TextDedup
      .shingleJaccardPrefixJoin(df, "doc_id", "text", 5, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shPrefix == shBrute,
      "shingle prefix join must equal the uncapped shingle brute force")
    assert(shPrefix.contains((200L, 201L))) // identical docs, J = 1
  }

  test("text kernels match combinator forms on 500 seeded random docs") {
    val rnd = new scala.util.Random(20260812L)
    val wsChars = " \t\n\r\f"
    val wordChars = "abcXYZ019.,!?café😀ß中"
    def randDoc(): String = {
      val sb = new StringBuilder
      (0 to rnd.nextInt(30)).foreach { _ =>
        (0 until rnd.nextInt(8)).foreach(_ => sb.append(wordChars(rnd.nextInt(wordChars.length))))
        (0 to rnd.nextInt(3)).foreach(_ => sb.append(wsChars(rnd.nextInt(wsChars.length))))
      }
      sb.toString
    }
    val docs = (1L to 500L).map(i => (i, randDoc())).toDF("doc_id", "text")

    val shKernel = TextDedup.shingleIndex(docs, "doc_id", "text", 5)
    val shComb = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("s"))
      .select(col("doc_id"), graft.functions.TextFunctions.polyHash(col("s")).as("sh_hash"))
    assert(shKernel.exceptAll(shComb).isEmpty && shComb.exceptAll(shKernel).isEmpty)

    val mhKernel = TextDedup.minhashSignatureArray(docs, "doc_id", "text", 5)
    val mhAgg = TextDedup.minhashSignatures(shComb, 32)
      .select(col("doc_id"), array((0 until 32).map(j => col(s"mh_$j")): _*).as("mh"))
    assert(mhKernel.exceptAll(mhAgg).isEmpty && mhAgg.exceptAll(mhKernel).isEmpty)

    val simKernel = TextDedup.simhash(docs, "doc_id", "text")
    val simAgg = TextDedup.simhashViaAggregation(docs, "doc_id", "text")
    assert(simKernel.exceptAll(simAgg).isEmpty && simAgg.exceptAll(simKernel).isEmpty)
  }

  test("shingleHashes kernel matches the combinator shingle index") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "  padded   with   extra   internal   whitespace   everywhere  "),
      (3L, "tab\tseparated words plus more tokens here now"),
      (4L, "unicode café über straße 😀 emoji and more words"),
      (5L, "four tokens only here"), (6L, ""),
      (7L, "dup dup dup dup dup dup dup dup")) // repeated shingles dedupe
      .toDF("doc_id", "text")
    val kernel = TextDedup.shingleIndex(docs, "doc_id", "text", 5)
    val combinator = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("s"))
      .select(col("doc_id"), graft.functions.TextFunctions.polyHash(col("s")).as("sh_hash"))
    assert(kernel.exceptAll(combinator).isEmpty && combinator.exceptAll(kernel).isEmpty)
    assert(kernel.filter($"doc_id" === 7L).count() == 1)
  }

  test("minhash32 kernel matches the aggregation form on edge-case texts") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "  padded   with   extra   internal   whitespace   everywhere  "),
      (3L, "tab\tseparated words plus more tokens here now"),
      (4L, "unicode café über straße 😀 emoji and more words"),
      (5L, "four tokens only here"), // < 5 tokens -> dropped by both
      (6L, "")).toDF("doc_id", "text")
    val kernel = TextDedup.minhashSignatureArray(docs, "doc_id", "text", k = 5)
    val agg = TextDedup.minhashSignatures(
        TextDedup.shingleIndex(docs, "doc_id", "text", 5), 32)
      .select(col("doc_id"), array((0 until 32).map(j => col(s"mh_$j")): _*).as("mh"))
    assert(kernel.exceptAll(agg).isEmpty && agg.exceptAll(kernel).isEmpty)
    assert(kernel.count() == 4)
  }

  test("DedupClusters matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(424242L)
    (1 to 8).foreach { _ =>
      val n = 5 + rnd.nextInt(25)
      val edges = (0 until n).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1)
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // plain union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        val got = DedupClusters.resolve(edges.toDF("doc_a", "doc_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected)
      }
    }
  }

  test("simhash kernel matches the aggregation form on edge-case texts") {
    val docs = Seq(
      (1L, "plain words in a row"),
      (2L, "  leading and trailing spaces  "),
      (3L, "tab\tseparated\ttokens"),
      (4L, "repeated repeated repeated tokens tokens"),
      (5L, "unicode café über straße 😀 emoji"),
      (6L, "newline\nseparated\nlines\nhere"),
      (7L, "x"),
      (8L, ""), (9L, "   ")) // dropped by both forms
      .toDF("doc_id", "text")
    val kernel = TextDedup.simhash(docs, "doc_id", "text")
    val agg = TextDedup.simhashViaAggregation(docs, "doc_id", "text")
    assert(kernel.exceptAll(agg).isEmpty && agg.exceptAll(kernel).isEmpty)
    assert(kernel.count() == 7)
  }

  test("simhash: identical docs get identical signatures; hamming 0 pair found") {
    val df = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val sigs = TextDedup.simhash(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(sigs(0) == sigs(1))
    val pairs = TextDedup.simhashPairs(df, "doc_id", "text", 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0.1f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 0), 2)
      .orderBy("rank").collect()
    assert(out(0).getLong(1) == 3L) // identical vector, cos=1
    assert(out(1).getLong(1) == 1L)
  }

  test("sessions split on gap > N minutes, single session otherwise") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val df = Seq(
      (1L, ts(0), 10L, 1.0), (2L, ts(10), 10L, 2.0), // session 1
      (3L, ts(60), 10L, 3.0), // gap 50min -> session 2
      (4L, ts(0), 20L, 4.0)) // other user
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.sessions(df, 30).orderBy("user_id", "session_seq").collect()
    assert(out.length == 3)
    assert(out(0).getLong(4 /* n_events */) == 2)
    assert(out(1).getLong(4) == 1)
  }

  test("image PNG encode->decode round trip recovers exact formula pixels") {
    import graft.operators.Multimodal
    for (docId <- Seq(0L, 7L, 123L)) {
      val bytes = Multimodal.encodePng(Multimodal.synthesizeImage(docId))
      assert(Multimodal.sniffFormat(bytes) == "png")
      val img = Multimodal.decodePng(bytes)
      val (w, h) = Multimodal.imageDims(docId)
      assert(img.getWidth == w && img.getHeight == h)
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == Multimodal.pixelR(docId, x, y))
        assert(((rgb >> 8) & 0xff) == Multimodal.pixelG(docId, x, y))
        assert((rgb & 0xff) == Multimodal.pixelB(docId, x, y))
      }
    }
  }

  test("sniffFormat detects containers from magic bytes") {
    import graft.operators.Multimodal.sniffFormat
    assert(sniffFormat(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) == "jpeg")
    assert(sniffFormat("GIF89a".getBytes("US-ASCII")) == "gif")
    assert(sniffFormat(("RIFF" + " " * 4 + "WEBPVP8 ").getBytes("ISO-8859-1")) == "webp")
    assert(sniffFormat("not an image".getBytes) == "unknown")
    assert(sniffFormat(Array.emptyByteArray) == "unknown")
  }

  test("distributed decode/resize report real raster stats") {
    import graft.operators.Multimodal
    val docs = Seq(1L, 2L, 36L).toDF("doc_id")
    val media = Multimodal.mediaTable(spark, docs)
    val metas = Multimodal.decodeImages(media).collect().sortBy(_.doc_id)
    for (m <- metas) {
      val (w, h) = Multimodal.imageDims(m.doc_id)
      val expR = (for (x <- 0 until w; y <- 0 until h)
        yield Multimodal.pixelR(m.doc_id, x, y).toLong).sum
      assert(m.format == "png" && m.width == w && m.height == h)
      assert(m.n_pixels == w * h && m.sum_r == expR)
    }
    // nearest-neighbor resize: dst(x,y) = src(x*w//dw, y*h//dh)
    val resized = Multimodal.resizeImages(media, maxDim = 8).collect().sortBy(_.doc_id)
    for (r <- resized) {
      val (w, h) = Multimodal.imageDims(r.doc_id)
      val m = math.max(w, h)
      val (dw, dh) = (w * 8 / m, h * 8 / m)
      val expR = (for (x <- 0 until dw; y <- 0 until dh)
        yield Multimodal.pixelR(r.doc_id, x * w / dw, y * h / dh).toLong).sum
      assert(r.width == dw && r.height == dh && r.sum_r == expR)
    }
    // histogram features sum to ~1 and match the formula-side counts
    val feats = Multimodal.imageFeatures(media).collect().sortBy(_.doc_id)
    for (f <- feats) {
      val (w, h) = Multimodal.imageDims(f.doc_id)
      val counts = new Array[Long](8)
      for (x <- 0 until w; y <- 0 until h)
        counts(Multimodal.pixelR(f.doc_id, x, y) * 8 / 256) += 1
      val exp = counts.map(c => (c.toDouble / (w * h)).toFloat)
      assert(f.features.toSeq == exp.toSeq)
    }
  }

  test("chunkDedup keeps first occurrence corpus-wide, reassembles survivors") {
    // 3-word chunks; doc 1 owns both chunks, doc 2 repeats chunk A plus a
    // fresh one, doc 3 is entirely seen-before -> disappears.
    val df = Seq(
      (1L, "a b c d e f"),   // chunks: "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" seen (doc 1), "x y z" fresh
      (3L, "d e f a b c"),   // both chunks seen -> dropped entirely
      (4L, "   ")            // blank -> filtered
    ).toDF("doc_id", "text")
    val out = TextDedup.chunkDedup(df, "doc_id", "text", chunkWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 2, "a b c d e f"), (2L, 1, "x y z")))
  }

  test("chunkDedup keep-first is positional within a document") {
    // the same chunk twice inside one doc: only the first survives, and
    // reassembly preserves original chunk order
    val df = Seq((5L, "p q r p q r s t u")).toDF("doc_id", "text")
    val out = TextDedup.chunkDedup(df, "doc_id", "text", chunkWords = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((5L, 2, "p q r s t u")))
  }

  test("contaminationFraction grades per-doc 13-gram overlap") {
    val bench13 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val corpus = Seq(
      (1L, s"$bench13 tail1 tail2 tail3"),  // 4 grams, first is the benchmark gram
      (2L, "no shared material in this very long and quite distinct document " +
        "with more than thirteen whitespace separated words overall here"),
      (3L, bench13))                        // exactly the one benchmark gram
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, bench13)).toDF("doc_id", "text")
    val out = TextDedup.contaminationFraction(corpus, benchmark, "doc_id", "text", 13)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out(0) == ((1L, 4L, 1L, 0.25)))
    assert(out(1)._3 == 0L && out(1)._4 == 0.0)
    assert(out(2) == ((3L, 1L, 1L, 1.0)))
  }

  test("TfIdf.topTerms ranks distinctive terms above corpus-wide ones") {
    val df = Seq(
      (1L, "shared shared zebra"),
      (2L, "shared yak yak"),
      (3L, "shared walrus")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).toSeq
    // doc 1: zebra tf=1 df=1 -> 3.0 beats shared tf=2 df=3 -> 2.0
    assert(out(0) == ((1L, "zebra", 1L, 1L, 3.0, 1)))
    assert(out(1) == ((1L, "shared", 2L, 3L, 2.0, 2)))
    // doc 2: yak tf=2 df=1 -> 6.0 top; doc 3: walrus 3.0 top
    assert(out(2) == ((2L, "yak", 2L, 1L, 6.0, 1)))
    assert(out(4) == ((3L, "walrus", 1L, 1L, 3.0, 1)))
  }

  test("WAV encode->decode round trip recovers exact formula samples") {
    for (id <- Seq(0L, 7L, 123L)) {
      val samples = Multimodal.synthesizeAudio(id)
      val payload = Multimodal.encodeWav(samples)
      assert(Multimodal.sniffFormat(payload) == "wav")
      val (rate, decoded) = Multimodal.decodeWav(payload)
      assert(rate == Multimodal.AudioRate)
      assert(decoded.toSeq == samples.toSeq)
    }
    // malformed containers are rejected, not misread
    intercept[IllegalArgumentException](Multimodal.decodeWav("nota-wav-payload!".getBytes))
  }

  test("distributed audio decode reports real waveform stats") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 4L).toDF("doc_id")
    val out = Multimodal.decodeAudio(Multimodal.audioTable(spark, docs))
      .collect().sortBy(_.doc_id)
    for (m <- out) {
      val s = Multimodal.synthesizeAudio(m.doc_id)
      assert(m.n_samples == s.length && m.sample_rate == 8000)
      assert(m.sumsq == s.map(v => v.toLong * v).sum)
      assert(m.peak == s.map(v => math.abs(v.toInt)).max)
      val zc = (1 until s.length).count(i => (s(i - 1) >= 0) != (s(i) >= 0))
      assert(m.zero_crossings == zc)
    }
  }

  test("decode quarantine: corrupt payloads become rows, not job failures") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, Seq(1L, 2L, 3L).toDF("doc_id"))
    val mangled = media.map { r =>
      if (r.doc_id == 1L) Multimodal.MediaRecord(1L, r.payload.take(10))       // truncated PNG
      else if (r.doc_id == 2L) Multimodal.MediaRecord(2L, "no-magic".getBytes) // unrecognized
      else r
    }
    val out = Multimodal.decodeImagesWithQuarantine(mangled)
      .collect().sortBy(_.doc_id)
    assert(out.length == 3)
    assert(out(0).status.startsWith("corrupt:") && out(0).format == "png")
    assert(out(1).status.startsWith("corrupt:") && out(1).format == "unknown")
    assert(out(2).status == "ok")
    val (w, h) = Multimodal.imageDims(3L)
    assert(out(2).width == w && out(2).height == h)
  }
}
