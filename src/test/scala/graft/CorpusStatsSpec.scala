package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, HeavyHitters, InvertedIndex, NgramModel}

/** Round-6 corpus-statistics operators: CMS-prefiltered heavy hitters,
  * bigram LM table, inverted-index search, event funnel. */
class CorpusStatsSpec extends SparkTestBase {

  import spark.implicits._

  test("heavy hitters exactly match a naive groupBy at any sketch width") {
    // skewed universe: term t_i appears i times, i in 1..60
    val occurrences = (1 to 60).flatMap(i => Seq.fill(i)(s"t$i")).toDF("term")
    val naive = occurrences.groupBy("term").agg(count(lit(1)).as("n"))
      .where(col("n") >= 30).as[(String, Long)].collect().toSet
    assert(naive.size == 31)
    // generous width: the sketch prunes, the answer is exact
    val wide = HeavyHitters.exactOverThreshold(occurrences, "term", 30)
      .as[(String, Long)].collect().toSet
    assert(wide == naive)
    // adversarially tiny width: every cell collides, the sketch passes
    // everything through — result must STILL be exact (CMS never
    // under-counts, the exact recount trims the false positives)
    val tiny = HeavyHitters.exactOverThreshold(occurrences, "term", 30,
      depth = 2, width = 2)
    assert(tiny.as[(String, Long)].collect().toSet == naive)
  }

  test("heavy hitters: result is partitioning-invariant") {
    val occ = (1 to 40).flatMap(i => Seq.fill(i)(s"w$i")).toDF("term")
    val a = HeavyHitters.exactOverThreshold(occ, "term", 20)
    val b = HeavyHitters.exactOverThreshold(occ.repartition(7), "term", 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("bigram top-k: counts, probabilities, deterministic tie-break") {
    val docs = Seq("a b a b a c", "a b x", "z z z").toDF("text")
    // pairs: (a,b)x3? doc1: a-b, b-a, a-b, b-a, a-c => ab:2 ba:2 ac:1; doc2 ab:1 bx:1; doc3 zz:2
    val top = NgramModel.bigramTopK(docs, "text", k = 2)
      .as[(String, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(top(("a", "b")) == ((3L, 3.0 / 4.0, 1)))
    assert(top(("a", "c")) == ((1L, 1.0 / 4.0, 2)))
    assert(top(("b", "a")) == ((2L, 2.0 / 3.0, 1)))
    // tie at n=1 between (b,x) nothing... b successors: a:2, x:1
    assert(top(("b", "x")) == ((1L, 1.0 / 3.0, 2)))
    assert(top(("z", "z")) == ((2L, 1.0, 1)))
    // k bound respected
    val k1 = NgramModel.bigramTopK(docs, "text", k = 1)
    assert(k1.groupBy("w1").count().agg(max("count")).head().getLong(0) == 1L)
    // alphabetical tie-break: successors of 'a' with equal counts rank by w2
    val tie = Seq("p q", "p r").toDF("text")
    val ranked = NgramModel.bigramTopK(tie, "text", k = 2)
      .select("w2", "rank").as[(String, Int)].collect().toMap
    assert(ranked("q") == 1 && ranked("r") == 2)
  }

  test("pmi top-k ranks exclusive pairs above promiscuous ones") {
    // "x y" always co-occur exclusively (ratio N/n_ab maximal); "a b"
    // co-occurs but a and b also pair widely, diluting the ratio
    val docs = Seq("x y", "x y", "a b", "a b", "a c", "d b", "a e", "f b")
      .toDF("text")
    val top = NgramModel.pmiTopK(docs, "text", k = 3, minCount = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(top.head._1 == "x" && top.head._2 == "y")
    // x-y: n_ab=2, n_left=2, n_right=2, N=8 -> ratio 4.0
    assert(top.head._6 == 4.0)
    // a-b: n_ab=2, n_left(a)=4, n_right(b)=4, N=8 -> 16/16
    val ab = top.find(t => t._1 == "a" && t._2 == "b").get
    assert(ab._6 == 1.0)
    // minCount prunes the hapax pairs entirely
    assert(top.forall(_._3 >= 2))
  }

  test("inverted-index searchAll requires every probe term") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "beta gamma alpha alpha"), // duplicates count once
      (4L, ""),
      (5L, "gamma")).toDF("doc_id", "text")
    val hits = InvertedIndex.searchAll(docs, "doc_id", "text",
      Seq("alpha", "gamma")).select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
    // single-term search degenerates to contains
    val one = InvertedIndex.searchAll(docs, "doc_id", "text", Seq("gamma"))
      .select("doc_id").as[Long].collect().toSet
    assert(one == Set(1L, 3L, 5L))
  }

  test("triangle counting: exact on a known graph, orientation-invariant") {
    // K4 on {1,2,3,4} (4 triangles) plus a pendant 4-5 and an isolated
    // edge 6-7; edges given in mixed orientation with a duplicate
    val raw = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (4L, 3L), (5L, 4L), (6L, 7L)).toDF("u", "v")
    val edges = graft.operators.Graph.canonicalEdges(raw, "u", "v")
    assert(edges.count() == 8) // K4's 6 + pendant + isolated, dup collapsed
    val tris = graft.operators.Graph.triangles(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(tris == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // per-node participation: each K4 vertex sits in exactly 3 triangles
    val counts = graft.operators.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counting survives a hub: star + rim closes rim-only triangles") {
    // hub 0 connected to 1..30, rim path i-(i+1) for 1..29: triangles
    // are exactly (0, i, i+1) — 29 of them; the hub's raw degree is 30
    // but its oriented OUT-degree must stay small (it orients last)
    val star = (1 to 30).map(i => (0L, i.toLong))
    val rim = (1 to 29).map(i => (i.toLong, (i + 1).toLong))
    val edges = graft.operators.Graph.canonicalEdges(
      (star ++ rim).toDF("u", "v"), "u", "v")
    val tris = graft.operators.Graph.triangles(edges)
    assert(tris.count() == 29)
    // hub participates in all 29, each rim endpoint in 1 or 2
    val counts = graft.operators.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(counts(0L) == 29L && counts(1L) == 1L && counts(15L) == 2L)
  }

  test("scaled-integer pagerank matches hand-computed fixed-point values") {
    // path graph 1-2-3: degs (1,2,1), N=3; scale 1200 -> r0 = 400 each,
    // base = 3*1200/(20*3) = 60. After one iteration:
    //   node1 <- r(2) div 2 = 200 -> 60 + (17*200) div 20 = 230
    //   node2 <- r(1) + r(3) = 800 -> 60 + (17*800) div 20 = 740
    //   node3 -> 230
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r1 = graft.operators.Graph.pageRankScaled(path, iters = 1, scale = 1200L)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 230L, 2L -> 740L, 3L -> 230L))
    // symmetry: a cycle keeps every node at the uniform rank forever
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val rc = graft.operators.Graph.pageRankScaled(cycle, iters = 5,
      scale = 1000000L).as[(Long, Long)].collect().toMap
    assert(rc.values.toSet.size == 1)
    // star: hub outranks leaves, result partitioning-invariant
    val star = (2L to 9L).map(i => (1L, i)).toDF("a", "b")
    val rs = graft.operators.Graph.pageRankScaled(star, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(rs(1L) > rs(2L) && (2L to 9L).map(rs).toSet.size == 1)
    val rs2 = graft.operators.Graph.pageRankScaled(star.repartition(5), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(rs == rs2)
  }

  test("pagerank at max iters (20) completes and matches a reference unroll") {
    // exercises the plan-growth guard: 20 rounds of 2 joins each would
    // compound the lazy plan (and square Catalyst's size stats) without
    // the periodic checkpoint; correctness is pinned against a local
    // unroll of the same integer recurrence
    def refRanks(edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
      val g = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = g.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size
      val base = (3 * scale) / (20 * n)
      var r = deg.map { case (k, _) => k -> scale / n }
      for (_ <- 1 to iters) {
        val contrib = g.groupBy(_._2).view
          .mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
        r = deg.map { case (k, _) => k -> (base + (17 * contrib.getOrElse(k, 0L)) / 20) }
      }
      r
    }
    // asymmetric graph (path + star tail) so ranks genuinely move
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (3L, 6L), (3L, 7L), (7L, 8L))
    val got = graft.operators.Graph
      .pageRankScaled(edges.toDF("a", "b"), iters = 20)
      .as[(Long, Long)].collect().toMap
    assert(got == refRanks(edges, 20, 1000000000000L))
    // a non-default cadence changes nothing but the plan
    val got2 = graft.operators.Graph
      .pageRankScaled(edges.toDF("a", "b"), iters = 20, checkpointEvery = 3)
      .as[(Long, Long)].collect().toMap
    assert(got2 == got)
  }

  test("triangles match a brute-force reference on randomized graphs (seeded)") {
    val rnd = new scala.util.Random(61)
    for (_ <- 1 to 8) {
      val n = 6 + rnd.nextInt(10)
      val pairs = for {
        a <- 1 to n; b <- (a + 1) to n; if rnd.nextDouble() < 0.35
      } yield (a.toLong, b.toLong)
      if (pairs.nonEmpty) {
        val edgeSet = pairs.toSet
        val expected = (for {
          x <- 1 to n; y <- (x + 1) to n; z <- (y + 1) to n
          if edgeSet((x.toLong, y.toLong)) && edgeSet((x.toLong, z.toLong)) &&
            edgeSet((y.toLong, z.toLong))
        } yield (x.toLong, y.toLong, z.toLong)).toSet
        val got = graft.operators.Graph.triangles(pairs.toDF("a", "b"))
          .as[(Long, Long, Long)].collect().toSet
        assert(got == expected, s"n=$n edges=${pairs.size}")
      }
    }
  }

  test("heavy hitters match naive counting on randomized skewed data (seeded)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      // zipf-ish: term t_i drawn with weight ~ 1/i
      val terms = (1 to 300).map { _ =>
        val i = math.max(1, (1.0 / (rnd.nextDouble() + 0.02)).toInt % 40)
        s"t$i"
      }
      val threshold = 3 + rnd.nextInt(10)
      val width = 1 << (2 + rnd.nextInt(6)) // 4..128, includes collision-heavy
      val df = terms.toDF("term")
      val naive = df.groupBy("term").agg(count(lit(1)).as("n"))
        .where(col("n") >= threshold).as[(String, Long)].collect().toSet
      val got = graft.operators.HeavyHitters
        .exactOverThreshold(df, "term", threshold, depth = 3, width = width)
        .as[(String, Long)].collect().toSet
      assert(got == naive, s"trial=$trial threshold=$threshold width=$width")
    }
  }

  test("pagerank conserves scaled mass up to truncation loss (seeded)") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 5) {
      val n = 5 + rnd.nextInt(8)
      val pairs = (for {
        a <- 1 to n; b <- (a + 1) to n; if rnd.nextDouble() < 0.5
      } yield (a.toLong, b.toLong))
      if (pairs.nonEmpty) {
        val scale = 1000000000000L
        val iters = 4
        val ranks = graft.operators.Graph
          .pageRankScaled(pairs.toDF("a", "b"), iters, scale)
          .as[(Long, Long)].collect()
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.size
        val total = ranks.map(_._2).sum
        // every truncating div loses < 1 unit per node per round (plus
        // the initial scale/n floor): mass stays within that envelope
        assert(total <= scale)
        val maxLoss = nodes.toLong * (2 * iters + 1) +
          nodes.toLong * 20 * (iters + 1)
        assert(total >= scale - maxLoss, s"total=$total scale=$scale n=$nodes")
        assert(ranks.forall(_._2 > 0))
      }
    }
  }

  test("batch funnel matches a per-user brute-force reference (seeded)") {
    val rnd = new scala.util.Random(83)
    val types = Seq("view", "click", "purchase", "error")
    for (trial <- 1 to 5) {
      val events = (1 to 120).map { i =>
        (rnd.nextInt(12).toLong, ts(rnd.nextInt(40).toLong),
          types(rnd.nextInt(types.length)))
      }
      def brute(userEvents: Seq[(Timestamp, String)]): Int = {
        var prev = Long.MinValue
        var stage = 0
        for (st <- Seq("view", "click", "purchase")) {
          val eligible = userEvents.collect {
            case (t, `st`) if t.getTime > prev => t.getTime }
          if (prev != -1 && eligible.nonEmpty) { prev = eligible.min; stage += 1 }
          else prev = -1
        }
        stage
      }
      val expected = events.groupBy(_._1).map { case (u, evs) =>
        u -> brute(evs.map(e => (e._2, e._3))) }
      val got = graft.operators.Funnel.funnelStages(
          events.toDF("user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .select("user_id", "funnel_stage").as[(Long, Int)].collect().toMap
      assert(got == expected, s"trial=$trial")
    }
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel stages require strict event-time progression") {
    val events = Seq(
      // u1 completes the funnel
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // u2 clicked before viewing, then purchased after the (late) view:
      // click must NOT count, so purchase can't either
      (2L, ts(10), "click"), (2L, ts(20), "view"), (2L, ts(30), "purchase"),
      // u3: click at the same instant as view — strictly-after fails
      (3L, ts(10), "view"), (3L, ts(10), "click"),
      // u4: view only
      (4L, ts(5), "view"),
      // u5: no funnel events at all
      (5L, ts(5), "error"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelStages(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("user_id", "funnel_stage").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 0))
    // u2's second chance: a later click resurrects the chain
    val extra = events.union(Seq((2L, ts(40), "click"),
      (2L, ts(50), "purchase")).toDF("user_id", "ts", "event_type"))
    val out2 = Funnel.funnelStages(extra, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("user_id", "funnel_stage").as[(Long, Int)].collect().toMap
    assert(out2(2L) == 3)
  }

  /** Single-threaded BPE reference with the exact documented tie-break
    * and greedy application — the independent implementation the
    * distributed learner is pinned against. */
  private def refBpe(words: Map[String, Long], numMerges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[String, (Vector[String], Long)] =
      words.map { case (w, n) => w -> (w.map(_.toString).toVector, n) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= numMerges && !stop) {
      val counts = vocab.values.toSeq
        .flatMap { case (syms, n) =>
          syms.sliding(2).collect { case Seq(a, b) => ((a, b), n) } }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((step, l, r, cnt))
        vocab = vocab.map { case (w, (syms, n)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.result(), n)
        }
        step += 1
      }
    }
    (merges.result(), vocab.map { case (w, (syms, _)) => w -> syms })
  }

  test("BPE learner matches the single-threaded reference (fixture + corpus)") {
    import graft.operators.Bpe
    // fixture with known dynamics: "ab" dominates, then "abc"
    val docs = Seq(
      (1L, "abc abc abc abd"), (2L, "abc abd xy xy"), (3L, "abd zq")
    ).toDF("doc_id", "text")
    val (m, seg) = Bpe.learnMerges(docs, "text", numMerges = 4)
    val got = m.orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val wc = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refM, refSeg) = refBpe(wc, 4)
    assert(got == refM, s"merge tables differ:\n got=$got\n ref=$refM")
    val gotSeg = seg.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(gotSeg == refSeg)
    // first merge must be the dominant pair with its exact count:
    // "ab" appears in abc(x5) + abd(x3) weighted by word counts
    assert(got.head._2 == "a" && got.head._3 == "b")

    // encode: segmentation join + char fallback for OOV words
    val enc = Bpe.encode(Seq((9L, "abc zq unseen")).toDF("doc_id", "text"),
        "doc_id", "text", seg)
      .orderBy("pos").select("token").collect().map(_.getString(0)).toSeq
    assert(enc.take(refSeg("abc").size) == refSeg("abc"))
    assert(enc.containsSlice(Seq("u", "n", "s", "e", "e", "n")), s"OOV fallback broke: $enc")

    // the real corpus slice: the distributed learner and the reference
    // agree merge-for-merge on sf0.001 documents
    val corpus = graft.sources.Tables.computeTable(spark,
      "/root/testdata/sf0.001", "documents")
    val (cm, cseg) = Bpe.learnMerges(corpus, "text", numMerges = 6)
    val cwc = Bpe.wordCounts(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (crefM, crefSeg) = refBpe(cwc, 6)
    val cgot = cm.orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(cgot == crefM, s"corpus merge tables differ:\n got=$cgot\n ref=$crefM")
    val csegGot = cseg.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(csegGot == crefSeg)
  }

  test("frozen-vocab replay: training words re-segment identically, OOV merges partially") {
    import graft.operators.Bpe
    val docs = Seq(
      (1L, "abc abc abc abd"), (2L, "abc abd xy xy"), (3L, "abd zq")
    ).toDF("doc_id", "text")
    val (m, seg) = Bpe.learnMerges(docs, "text", numMerges = 4)
    val ranked = m.orderBy("step").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

    // invariant: replaying the frozen merges over the training words
    // reproduces the training segmentation EXACTLY (rank-order replay
    // is how the segmentation is defined)
    val trainWords = Bpe.wordCounts(docs, "text").select("word")
    val replayed = Bpe.segmentWords(trainWords, ranked)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val trained = seg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(replayed == trained,
      s"replay diverged from training segmentation:\n $replayed\n vs $trained")

    // OOV: "abcab" was never a training word, but the frozen pairs
    // ((a,b) first, then whatever follows) still apply — it must NOT
    // fall back to bare characters
    val oov = Bpe.segmentWords(Seq("abcab").toDF("word"), ranked)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(oov("abcab").contains("ab"),
      s"frozen merges did not reach the unseen word: ${oov("abcab")}")
    assert(oov("abcab") != Vector("a", "b", "c", "a", "b"),
      "unseen word degraded to char fallback under frozen-vocab replay")

    // encodeFrozen end-to-end: unseen text tokenizes under the frozen
    // pairs with the standard (id, token, pos) contract
    val enc = Bpe.encodeFrozen(Seq((9L, "abd abcab")).toDF("doc_id", "text"),
        "doc_id", "text", ranked)
      .orderBy("pos").select("token").collect().map(_.getString(0)).toSeq
    assert(enc.take(trained("abd").size) == trained("abd"))
    assert(enc.drop(trained("abd").size) == oov("abcab"))
  }

  test("BPE minCount cutoff: trajectory preserved, rare words dropped, collect bounded") {
    import graft.operators.Bpe
    def traj(m: org.apache.spark.sql.DataFrame) = m.orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

    // the real fixture: every word appears >= 29 times, so any cutoff
    // up to that leaves the learned trajectory byte-identical — the
    // cutoff is a driver-memory bound, not a semantics change
    val corpus = graft.sources.Tables.computeTable(spark,
      "/root/testdata/sf0.001", "documents")
    val (m1, _) = Bpe.learnMerges(corpus, "text", numMerges = 6)
    val (m2, seg2) = Bpe.learnMerges(corpus, "text", numMerges = 6, minCount = 2L)
    assert(traj(m1) == traj(m2),
      "minCount=2 changed the fixture trajectory despite zero dropped words")

    // synthetic hapax: "zq" (n=1) is dropped at minCount=2; the
    // dominant ab-family merges are untouched, and the rare word
    // leaves the returned segmentation (encode's OOV fallback takes it)
    val docs = Seq(
      (1L, "abc abc abc abd"), (2L, "abc abd xy xy"), (3L, "abd zq")
    ).toDF("doc_id", "text")
    val (mAll, segAll) = Bpe.learnMerges(docs, "text", numMerges = 4)
    val (mCut, segCut) = Bpe.learnMerges(docs, "text", numMerges = 4, minCount = 2L)
    assert(traj(mAll) == traj(mCut),
      "dropping the hapax word changed merges it never participated in")
    val cutWords = segCut.select("word").collect().map(_.getString(0)).toSet
    assert(segAll.select("word").collect().map(_.getString(0)).toSet.contains("zq"))
    assert(!cutWords.contains("zq"), "hapax word survived the cutoff")

    // the driver bound fails loudly, never truncates silently
    val e = intercept[IllegalArgumentException] {
      Bpe.learnMerges(docs, "text", numMerges = 2, maxVocabRows = 2)
    }
    assert(e.getMessage.contains("driver bound"), e.getMessage)
    assert(e.getMessage.contains("minCount"), e.getMessage)
  }

  test("byte-level BPE: GPT-2 alphabet pins; multi-byte chars split and re-merge") {
    import graft.operators.Bpe
    // the GPT-2 byte->unicode table: a bijection with the published
    // anchor points (0 -> U+0100, \n -> U+010A, space -> U+0120,
    // printable ASCII maps to itself)
    val b2u = Bpe.byteToUnicode
    assert(b2u.length == 256 && b2u.toSet.size == 256, "not a bijection")
    assert(b2u(0) == "\u0100" && b2u(10) == "\u010A" && b2u(32) == "\u0120")
    assert(b2u('A'.toInt) == "A" && b2u('z'.toInt) == "z")
    assert(b2u(0xC3) == 0xC3.toChar.toString && b2u(0xA4) == 0xA4.toChar.toString)

    // U+00E4 is 0xC3 0xA4 in UTF-8: at byte level the two bytes start
    // as SEPARATE symbols and only a frequency-won merge rejoins them
    def byteAtoms(w: String): Vector[String] =
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => b2u(b & 0xff)).toVector
    val docs = Seq(
      (1L, "\u00e4b \u00e4b \u00e4b \u00e4c"), (2L, "\u00e4b xy")
    ).toDF("doc_id", "text")
    val (m, seg) = Bpe.learnMerges(docs, "text", numMerges = 3,
      mode = Bpe.ByteLevel)
    val got = m.orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // independent reference: the same single-threaded loop over byte atoms
    val wc = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refM, refSeg) = refBpeWith(wc, 3, byteAtoms)
    assert(got == refM, s"byte-level merge tables differ:\n got=$got\n ref=$refM")
    assert(seg.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1).toVector).toMap == refSeg)
    // first merge must be the intra-character byte pair (0xC3, 0xA4),
    // present in every one of the 5 accented words
    assert(got.head._2 == 0xC3.toChar.toString &&
      got.head._3 == 0xA4.toChar.toString && got.head._4 == 5L,
      s"first byte merge was not the split character: ${got.head}")

    // frozen replay carries the mode: an unseen accented word still
    // re-joins its character bytes under the frozen pairs
    val ranked = got.map(t => (t._2, t._3))
    val oov = Bpe.segmentWords(Seq("\u00e4z").toDF("word"), ranked,
        mode = Bpe.ByteLevel)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(oov("\u00e4z").head == 0xC3.toChar.toString + 0xA4.toChar.toString,
      s"frozen byte merge missed the unseen word: ${oov("\u00e4z")}")
  }

  /** [[refBpe]] generalized over the atomization (char vs byte). */
  private def refBpeWith(words: Map[String, Long], numMerges: Int,
                         atoms: String => Vector[String])
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[String, (Vector[String], Long)] =
      words.map { case (w, n) => w -> (atoms(w), n) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= numMerges && !stop) {
      val counts = vocab.values.toSeq
        .flatMap { case (syms, n) =>
          syms.sliding(2).collect { case Seq(a, b) => ((a, b), n) } }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((step, l, r, cnt))
        vocab = vocab.map { case (w, (syms, n)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.result(), n)
        }
        step += 1
      }
    }
    (merges.result(), vocab.map { case (w, (syms, _)) => w -> syms })
  }
}
