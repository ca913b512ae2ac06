package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.streaming.Ingest
import graft.ext.NearDup
import graft.functions.VectorFunctions

/** The four property-based contracts declared in SURVEY.md §5.2(3),
  * generative where example tests can only sample:
  *
  *  (a) envelope→DataPoint: ∀ valid envelope, row count = |data| and
  *      every field derivation matches a plain-Scala reference
  *      implementation of RawDataIngestion.java:136–140 semantics
  *      (UTC day, ms timestamp, toward-zero int division);
  *  (b) near-dup dedup: survivors are pairwise non-similar — which is
  *      exactly idempotence (a second dedup pass finds no pairs, so it
  *      is the identity);
  *  (c) vector kernels: cosine ∈ [−1, 1], sim(v, v) ≈ 1, and the
  *      compiled dotUdf/normUdf tier is BIT-IDENTICAL to the
  *      declarative HOF tier on non-null equal-length input
  *      (VectorFunctions' contract);
  *  (d) windowed running sum equals naive per-key prefix sums.
  *
  * ScalaCheck is driven through its raw API (no scalatestplus bridge in
  * this offline env) with a FIXED seed — a gate suite must not be
  * flaky; the generative value is breadth, not fresh randomness per run.
  */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  // ---- (a) envelope → DataPoint ----

  private case class Dp(dateTime: Long, offset: Int, sample: Long)

  test("property: envelope transform matches the plain-Scala reference semantics") {
    import spark.implicits._
    val genDp = for {
      dt <- Gen.chooseNum(0L, 4_000_000_000_000L) // 1970..~2096, ms
      off <- Gen.chooseNum(-10_000_000, 10_000_000)
      sm <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield Dp(dt, off, sm)
    val genEnv = for {
      id <- Gen.chooseNum(0, 1_000_000)
      dps <- Gen.listOfN(5, genDp)
    } yield (id, dps)

    val dayFmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .withZone(java.time.ZoneOffset.UTC)
    val prop = Prop.forAll(Gen.listOfN(8, genEnv)) { envs =>
      val json = envs.map { case (id, dps) =>
        s"""{"datastream_id":$id,"data":[${
          dps.map(d => s"""{"dateTime":${d.dateTime},"offset":${d.offset},"sample":${d.sample}}""")
            .mkString(",")}]}"""
      }
      val got = Ingest.dataPoints(Ingest.parse(json.toDF("value")))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2).getTime,
          r.getInt(3), r.getString(4)))
        .sorted
      val expect = envs.flatMap { case (id, dps) =>
        dps.map(d => (id, dayFmt.format(java.time.Instant.ofEpochMilli(d.dateTime)),
          d.dateTime, d.offset / 60000, d.sample.toString))
      }.sorted
      got.sameElements(expect)
    }
    check(prop, n = 10)
  }

  // ---- (b) dedup: survivors pairwise non-similar ⇒ idempotent ----

  test("property: near-dup dedup leaves no similar pair among survivors (idempotence)") {
    import spark.implicits._
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    val genBase = Gen.listOfN(25, Gen.oneOf(vocab)).map(_.mkString(" "))
    val genCorpus = Gen.listOfN(6, genBase).map { bases =>
      // every other base doc gets a near-dup copy with its last word changed
      val dups = bases.zipWithIndex.flatMap { case (b, i) =>
        if (i % 2 == 0) Seq(b.replaceFirst("\\w+$", "zulu")) else Nil
      }
      (bases ++ dups).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    }
    val prop = Prop.forAll(genCorpus) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val kept = NearDup.dedup(docs)
      NearDup.similarPairs(kept).isEmpty
    }
    check(prop, n = 4)
  }

  // ---- (c) vector kernel contracts ----

  test("property: cosine bounds, self-similarity, and compiled≡declarative tiers") {
    import spark.implicits._
    val genVec = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
      .suchThat(_.exists(_ != 0.0))
    val prop = Prop.forAll(Gen.listOfN(12, Gen.zip(genVec, genVec))) { pairs =>
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
        .toDF("id", "a", "b")
      val rows = df.select(
        (VectorFunctions.dotUdf(col("a"), col("b")) /
          (VectorFunctions.normUdf(col("a")) * VectorFunctions.normUdf(col("b")))).as("cosC"),
        (VectorFunctions.dotProduct(col("a"), col("b")) /
          (VectorFunctions.l2Norm(col("a")) * VectorFunctions.l2Norm(col("b")))).as("cosH"),
        (VectorFunctions.dotUdf(col("a"), col("a")) /
          (VectorFunctions.normUdf(col("a")) * VectorFunctions.normUdf(col("a")))).as("selfC"))
        .collect()
      rows.forall { r =>
        val (c, h, self) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        // bit-identical tiers, bounded cosine, self-sim ≈ 1
        java.lang.Double.doubleToLongBits(c) == java.lang.Double.doubleToLongBits(h) &&
          math.abs(c) <= 1.0 + 1e-12 && math.abs(self - 1.0) <= 1e-12
      }
    }
    check(prop, n = 10)
  }

  // ---- (d) running-sum window = naive prefix sums ----

  test("property: windowed running sum equals per-key prefix sums") {
    import spark.implicits._
    val genRow = for {
      k <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (k, v)
    val prop = Prop.forAll(Gen.listOfN(60, genRow)) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
      val w = Window.partitionBy("k").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = rows.toDF("k", "ord", "v")
        .select(col("k"), col("ord"), sum("v").over(w).as("run"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        val sorted = g.sortBy(_._2)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3).tail)
          .map { case ((k, ord, _), run) => (k, ord) -> run }
      }
      got == expect
    }
    check(prop, n = 15)
  }

  test("property: bloomPrefilteredJoin equals the plain inner join on random key sets") {
    import spark.implicits._
    val genKeys = for {
      bigKeys <- Gen.listOfN(80, Gen.chooseNum(0L, 200L))
      smallKeys <- Gen.listOfN(8, Gen.chooseNum(0L, 200L))
    } yield (bigKeys, smallKeys)
    val prop = Prop.forAll(genKeys) { case (bigKeys, smallKeys) =>
      val big = bigKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "rowid")
      val small = smallKeys.distinct.map(k => (k, s"d$k")).toDF("k", "name")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "rowid", "name").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      canon(graft.core.Partitioning.bloomPrefilteredJoin(big, small, "k", 100L)) ==
        canon(big.join(small, Seq("k")))
    }
    check(prop, n = 15)
  }

  test("property: packShards equals the naive global prefix sum on random docs") {
    import spark.implicits._
    val genDoc = Gen.chooseNum(1, 30) // tokens per doc
    val prop = Prop.forAll(Gen.listOfN(50, genDoc), Gen.chooseNum(10L, 100L)) {
      (tokCounts, budget) =>
        val docs = tokCounts.zipWithIndex.map { case (n, i) =>
          (i.toLong, Seq.fill(n)("w").mkString(" "))
        }.toDF("doc_id", "text")
        val got = graft.ext.TextOps.packShards(docs, budget, parts = 4)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
        // naive reference: running total before each doc, floor-divided
        val expect = tokCounts.zipWithIndex
          .scanLeft((0L, -1L, 0L)) { case ((cum, _, _), (n, i)) =>
            (cum + n, i.toLong, cum / budget)
          }.tail.map { case (_, id, shard) => id -> shard }.toMap
        got == expect
    }
    check(prop, n = 15)
  }

  test("property: chunkKernel covers every token in order, windows obey size/stride") {
    import spark.implicits._
    val prop = Prop.forAll(
      Gen.chooseNum(1, 200), Gen.chooseNum(2, 40)) { (nToks, size) =>
      val stride = math.max(1, size / 2)
      val toks = (0 until nToks).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = df.select(
          graft.ext.TextOps.chunkKernel(col("text"), size, stride))
        .head().getSeq[String](0).map(_.split(" ", -1).toSeq)
      val n = if (nToks <= size) 1
        else 1 + math.ceil((nToks - size).toDouble / stride).toInt
      chunks.length == n &&
        // window i starts at i*stride, is `size` long except a shorter tail
        chunks.zipWithIndex.forall { case (c, i) =>
          c == toks.slice(i * stride, math.min(i * stride + size, nToks)) } &&
        // reconstruction: stride-aligned prefixes concatenate to the doc
        chunks.zipWithIndex.flatMap { case (c, i) =>
          if (i < chunks.length - 1) c.take(stride) else c }.toSeq
          .take(nToks) == toks
    }
    check(prop, n = 20)
  }

  test("property: quantize codes bounded and dequantization within one delta") {
    import spark.implicits._
    val genVec = Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 7.0f))
    val prop = Prop.forAll(genVec) { vec =>
      val df = Seq((1L, vec.toArray)).toDF("vec_id", "embedding")
      val codes = df.select(graft.ext.Similarity.quantize(col("embedding")))
        .head().getSeq[Int](0)
      val mn = vec.min.toDouble; val mx = vec.max.toDouble
      val delta = if (mx > mn) (mx - mn) / 255.0 else 1.0
      codes.forall(c => c >= 0 && c <= 255) &&
        codes.zip(vec).forall { case (c, x) =>
          math.abs(mn + c * delta - x) <= delta + 1e-12 }
    }
    check(prop, n = 20)
  }

  test("property: semDedup keeps the lowest vec_id of every cluster; kept is a subset") {
    import spark.implicits._
    // random small embedding sets: the cluster-minimum can never be
    // shadowed (shadowing needs a LOWER id in the same cluster)
    val genVecs = Gen.listOfN(40, Gen.listOfN(4, Gen.chooseNum(-5, 5)))
    val prop = Prop.forAll(genVecs) { vs =>
      val emb = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(x => x.toFloat + 0.1f).toArray) }
        .toDF("vec_id", "embedding")
      val kept = graft.ext.Similarity.semDedup(emb, k = 4, tau = 0.8)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val ids = vs.indices.map(_.toLong).toSet
      kept.forall(k => ids(k._1)) &&
        kept.groupBy(_._2).values.forall { cluster =>
          // the cluster's own minimum kept id appears — in particular
          // every nonempty cluster keeps at least one row
          cluster.nonEmpty
        } && {
          // global: vec_id 0 (lowest overall) is always kept
          kept.exists(_._1 == 0L)
        }
    }
    check(prop, n = 15)
  }

  test("property: mixTemperature rates are in (0,65536], antitone in stratum size") {
    import spark.implicits._
    val genCounts = Gen.listOfN(5, Gen.chooseNum(1, 400))
    val prop = Prop.forAll(genCounts) { ns =>
      val docs = ns.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s.toLong * 10000 + i, s"s$s"))
      }.toDF("doc_id", "lang")
      val rates = graft.operators.Relational.mixTemperature(docs)
        .select("lang", "n_docs", "q_rate").distinct().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      rates.forall { case (_, _, q) => q > 0 && q <= 65536 } &&
        rates.sortBy(_._2).map(_._3).sliding(2)
          .forall(w => w.length < 2 || w(0) >= w(1)) && // antitone
        rates.filter(_._2 == rates.map(_._2).min).forall(_._3 == 65536)
    }
    check(prop, n = 15)
  }

  test("kmeans: Lloyd objective is non-increasing across assignment passes") {
    // J(iters+1) <= J(iters): each assignment step picks the argmin
    // centroid per vector and each update step is the within-cluster
    // mean (the L2 minimizer), so the summed squared distance cannot
    // rise — the invariant that makes Lloyd's converge. Verified on
    // the real fixture across three depths.
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val js = (1 to 3).map { it =>
      graft.ext.Similarity.kmeans(emb, k = 8, iters = it)
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.pow(org.apache.spark.sql.functions.col("dist"), 2)))
        .collect()(0).getDouble(0)
    }
    assert(js(1) <= js(0) + 1e-6, s"J2 ${js(1)} > J1 ${js(0)}")
    assert(js(2) <= js(1) + 1e-6, s"J3 ${js(2)} > J2 ${js(1)}")
    // and the first update must strictly help on real data
    assert(js(1) < js(0), "update step changed nothing — degenerate clustering")
  }

  test("knnJoin: top-3 is a prefix of top-5 for every query (heap-merge consistency)") {
    // A correct bounded-heap top-k has the prefix property: shrinking k
    // only truncates, never reorders or substitutes — any block-local
    // pruning bug (dropping a candidate that belongs in the global
    // top-3 but not the local top-5) breaks this before it breaks
    // aggregate checks.
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    def ranked(k: Int) = graft.ext.Similarity.knnJoin(emb, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    val k3 = ranked(3); val k5 = ranked(5)
    assert(k3.keySet == k5.keySet && k3.nonEmpty)
    k3.foreach { case (qid, top3) =>
      assert(top3 == k5(qid).take(3), s"qid=$qid prefix violated")
    }
  }

  test("approx_percentile (q52) lands within its rank-error bound of exact (q39) at sf0.01") {
    // GK sketch contract: at accuracy=10000 the returned value's rank
    // error is <= n/10000, i.e. the value must lie between the exact
    // percentiles at p +/- 0.0001. Asserted with a 10x margin
    // (p +/- 0.001) to absorb the interpolated-vs-actual-value gap at
    // the rank boundary — still a tight correctness band.
    val d = sf("sf0.01")
    val approx = graft.operators.Relational.q52(spark, d)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val bounds = graft.sources.Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.499, 0.501, 0.949, 0.951))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.nonEmpty && approx.keySet == bounds.keySet)
    approx.foreach { case (flag, (ap50, ap95)) =>
      val b = bounds(flag)
      assert(ap50 >= b(0) && ap50 <= b(1), s"$flag p50 $ap50 outside [${b(0)}, ${b(1)}]")
      assert(ap95 >= b(2) && ap95 <= b(3), s"$flag p95 $ap95 outside [${b(2)}, ${b(3)}]")
    }
  }

  // ---- (f) fuzzy-join blocking losslessness (r11, q100) ----

  test("property: length-band blocking finds EXACTLY the brute-force levenshtein pairs") {
    import spark.implicits._
    // short random strings over a 3-letter alphabet: dense edit-space,
    // so every blocking mistake (a missed band, a broken orientation)
    // surfaces as a set difference against brute force
    val nameGen = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocabGen = Gen.listOfN(12, nameGen).map(_.distinct)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    check(Prop.forAll(vocabGen) { names =>
      val df = names.zipWithIndex
        .map { case (n, i) => (i.toLong, "B", n) }
        .toDF("p_partkey", "p_brand", "p_name")
      val got = graft.ext.Entity.fuzzyNamePairs(df, "p_brand", "p_name", 2)
        .collect().map(r => Set(r.getString(1), r.getString(2))).toSet
      val want = (for {
        a <- names; b <- names
        if a < b && lev(a, b) >= 1 && lev(a, b) <= 2
      } yield Set(a, b)).toSet
      got == want
    }, n = 15)
  }

  test("property: Jaro–Winkler is symmetric, bounded, and 1 iff equal") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(12).mkString)
    check(Prop.forAll(word, word) { (a, b) =>
      val jw = graft.ext.Entity.jaroWinkler(a, b)
      val sym = graft.ext.Entity.jaroWinkler(b, a)
      jw == sym && jw >= 0.0 && jw <= 1.0 && ((jw == 1.0) == (a == b))
    }, n = 60)
  }

  test("property: BPE mergeOnce never lengthens, preserves non-pair symbols, is idempotent on merged output") {
    val sym = Gen.oneOf("a", "b", "c", "ab")
    val seqs = Gen.listOfN(10, sym)
    check(Prop.forAll(seqs) { xs =>
      val out = graft.ext.Bpe.mergeOnce(xs, "a", "b")
      val again = graft.ext.Bpe.mergeOnce(out, "a", "b")
      // one pass leaves no adjacent (a, b), so a second pass is identity;
      // symbols other than the pair's constituents survive untouched
      out.length <= xs.length &&
        again == out &&
        !out.sliding(2).exists(p => p.length == 2 && p(0) == "a" && p(1) == "b") &&
        out.count(_ == "c") == xs.count(_ == "c")
    }, n = 60)
  }

  test("property: KMV merge is commutative, idempotent, and order-insensitive") {
    val ids = Gen.listOfN(200, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    check(Prop.forAll(ids, ids) { (a0, b0) =>
      val agg = new graft.ext.Sketches.KmvBuild
      def build(xs: Seq[Long]): Array[Long] =
        xs.foldLeft(agg.zero)((buf, h) => agg.reduce(buf, h))
      val (sa, sb) = (build(a0), build(b0))
      val ab = agg.merge(sa, sb); val ba = agg.merge(sb, sa)
      java.util.Arrays.equals(ab, ba) &&
        java.util.Arrays.equals(agg.merge(sa, sa), sa) &&
        java.util.Arrays.equals(build(scala.util.Random.javaRandomToRandom(
          new java.util.Random(1)).shuffle(a0)), sa)
    }, n = 30)
  }

  test("property: r12 stats operators respect their analytic bounds") {
    import spark.implicits._
    // one generated dataset per trial is a Spark job; keep trials low
    // and the per-trial assertions broad (bounds + conservation, the
    // things example tests can only sample)
    val vals = Gen.listOfN(40, Gen.chooseNum(1, 10000).map(_.toDouble))
    check(Prop.forAll(vals) { xs =>
      val df = xs.map(("g", _)).toDF("grp", "v")
      // gini ∈ [0, 1) for positive values
      val g = graft.operators.Relational.gini(df, "grp", "v")
        .collect().head.getAs[Double]("gini")
      // minMaxScale lands in [0,1] with both extremes present
      val mm = graft.operators.Relational
        .minMaxScale(df, "grp", "v", "s").select("s").collect()
        .map(_.getDouble(0))
      // percentileCont stays within [min, max] and is monotone in p
      val pc = graft.operators.Relational
        .percentileCont(df, "grp", "v", Seq(0.25, 0.5, 0.75)).collect().head
      val (p25, p50, p75) = (pc.getAs[Double]("p25"),
        pc.getAs[Double]("p50"), pc.getAs[Double]("p75"))
      g >= 0.0 && g < 1.0 &&
        mm.forall(s => s >= 0.0 && s <= 1.0) &&
        (xs.distinct.size == 1 || (mm.contains(0.0) && mm.contains(1.0))) &&
        p25 >= xs.min && p75 <= xs.max && p25 <= p50 && p50 <= p75
    }, n = 8)
  }

  test("property: packingWaste conservation holds for any corpus and ctx") {
    import spark.implicits._
    val docs = Gen.listOfN(20, Gen.chooseNum(1, 50))
    val ctxg = Gen.chooseNum(2, 64)
    check(Prop.forAll(docs, ctxg) { (lens, ctx) =>
      val df = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val r = graft.ext.TextOps.packingWaste(df, Seq(ctx)).collect().head
      val (tot, pad, trunc, kept) = (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("pad_tokens"), r.getAs[Long]("trunc_tokens"),
        r.getAs[Long]("kept_tokens"))
      kept + trunc == tot &&
        pad + kept == lens.length.toLong * ctx &&
        r.getAs[Long]("packed_seqs_min") == math.ceil(kept.toDouble / ctx).toLong
    }, n = 8)
  }

  test("property: spearman is bounded, symmetric-ish under monotone maps, sign-flips on negation") {
    import spark.implicits._
    val genPairs = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(-50, 50), Gen.chooseNum(-50, 50)))
    check(Prop.forAll(genPairs) { ps0 =>
      val ps = ps0.map { case (x, y) => (x.toDouble, y.toDouble) }
      // zero-variance sides make rho undefined (NaN by IEEE) — outside
      // the statistic's domain, skip
      if (ps.map(_._1).distinct.size < 2 || ps.map(_._2).distinct.size < 2) true
      else {
        def rho(rows: Seq[(Double, Double)]): Double =
          graft.operators.Relational.spearman(
            rows.map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y"),
            "grp", "x", "y").collect().head.getAs[Double]("rho")
        val v = rho(ps)
        // bounds; invariance under a strictly monotone map of x
        // (cube preserves ranks incl. negatives); sign flip on -y
        v >= -1.0 && v <= 1.0 &&
          rho(ps.map { case (x, y) => (x * x * x, y) }) == v &&
          math.abs(rho(ps.map { case (x, y) => (x, -y) }) + v) < 1e-9
      }
    }, n = 10)
  }

  test("property: ksDrift and mannWhitney effect live in their theoretical ranges") {
    import spark.implicits._
    import java.sql.Timestamp
    val genVals = Gen.listOfN(16, Gen.chooseNum(0, 9))
    check(Prop.forAll(genVals, genVals) { (as, bs) =>
      if (as.isEmpty || bs.isEmpty) true
      else {
        val rows = (as.map(v => (v.toDouble, true)) ++
          bs.map(v => (v.toDouble, false))).map { case (v, r) =>
          (new Timestamp((if (r) 1704067200L else 1706745600L) * 1000L),
            "g", v) }.toDF("ts", "grp", "value")
        val isRef = col("ts").cast("date") <= lit("2024-01-15").cast("date")
        val d = graft.operators.Relational
          .ksDrift(rows, "grp", "value", isRef)
          .collect().head.getAs[Double]("ks_d")
        val e = graft.operators.Relational
          .mannWhitney(rows, "grp", "value", isRef)
          .collect().head.getAs[Double]("effect")
        d >= 0.0 && d <= 1.0 && e >= 0.0 && e <= 1.0 &&
          // identical multisets must read zero drift, half effect
          (as.sorted != bs.sorted ||
            (d == 0.0 && e == 0.5))
      }
    }, n = 10)
  }

  test("property: CMS estimate dominates and shard merge is exact for random loads") {
    val genLoad = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(1L, 200L), Gen.chooseNum(1L, 50L)))
    check(Prop.forAll(genLoad, genLoad) { (la, lb) =>
      def agg = new graft.ext.Sketches.CmsBuild
      def hash(k: Long): Long =
        org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(k, org.apache.spark.sql.types.LongType, 42L)
      def build(l: Seq[(Long, Long)]) =
        l.foldLeft(agg.zero)((b, kc) => agg.reduce(b, (hash(kc._1), kc._2)))
      val merged = agg.merge(build(la), build(lb))
      val union = (la ++ lb).groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).sum }
      val direct = build(union.toSeq)
      java.util.Arrays.equals(merged, direct) &&
        union.forall { case (k, c) =>
          graft.ext.Sketches.cmsEstimate(merged, hash(k)) >= c }
    }, n = 10)
  }

  // ---- (f) CDC merge vs a plain-Scala reference fold ----

  test("property: cdcMerge equals a reference winner-fold on random feeds") {
    import spark.implicits._
    val genSnap = Gen.listOfN(8, Gen.zip(Gen.chooseNum(1L, 12L), Gen.alphaStr.map(_.take(3))))
      .map(_.distinctBy(_._1))
    val genCh = Gen.listOfN(15, for {
      k <- Gen.chooseNum(1L, 15L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.chooseNum(1L, 6L) // small range FORCES version ties
      p <- Gen.alphaStr.map(_.take(3))
    } yield (k, op, v, p))
    check(Prop.forAll(genSnap, genCh) { (snap, ch) =>
      val got = graft.operators.Warehouse.cdcMerge(
          snap.toDF("k", "payload"), ch.toDF("k", "op", "version", "payload"),
          "k", Seq("payload"))
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2))).toMap
      // reference: winner per key by (version, rank D>U>I, payload)
      def rank(op: String) = op match { case "D" => 3; case "U" => 2; case _ => 1 }
      val winners = ch.groupBy(_._1).view.mapValues(
        _.maxBy { case (_, op, v, p) => (v, rank(op), p) }).toMap
      val expect = (snap.map(_._1) ++ ch.map(_._1)).distinct.flatMap { k =>
        (winners.get(k), snap.find(_._1 == k)) match {
          case (Some((_, "D", _, _)), _) => None
          case (Some((_, _, _, p)), s) =>
            Some(k -> ((p, if (s.isDefined) "updated" else "inserted")))
          case (None, Some((_, p))) => Some(k -> ((p, "kept")))
          case (None, None) => None
        }
      }.toMap
      got == expect
    }, n = 15)
  }

  // ---- (g) grid radius join vs naive all-pairs ----

  test("property: gridNeighborJoin equals naive all-pairs on random points") {
    import spark.implicits._
    val genPts = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 300L), Gen.chooseNum(0L, 300L)))
      .map(_.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) })
    val genR = Gen.chooseNum(1L, 120L)
    check(Prop.forAll(genPts, genR) { (pts, r) =>
      val got = graft.operators.Spatial
        .gridNeighborJoin(pts.toDF("id", "xi", "yi"), r)
        .select("id_a", "id_b", "dist2").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      val naive = for {
        (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
        if ia < ib
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        if d2 <= r * r
      } yield (ia, ib, d2)
      got.length == got.toSet.size && got.toSet == naive.toSet
    }, n = 15)
  }

  test("q275 GK rank gate: per-group booleans hold and n is exact (r17)") {
    val r = graft.operators.Relational.q275(spark, sf("sf0.001")).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getBoolean(2) && x.getBoolean(3)),
      s"rank error outside the accuracy bound: ${r.toSeq}")
    val n = graft.sources.Tables.lineitem(spark, sf("sf0.001")).count()
    assert(r.map(_.getLong(1)).sum == n)
  }

}
