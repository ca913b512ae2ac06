package graft

import org.apache.spark.sql.functions._
import graft.ext.{NearDup, TextOps}

/** Text-analysis ops (SURVEY.md §2.5): quality scoring, language-ID
  * heuristic, token counting, fingerprinting, SimHash near-dup. */
class TextAnalysisSpec extends SparkSpec {

  test("quality metrics on a literal doc") {
    val df = spark.createDataFrame(Seq((1L, "the cat sat on the mat")))
      .toDF("doc_id", "text")
    val r = df.select(
      length(col("text")).as("c"),
      size(split(col("text"), " ")).as("t"),
      TextOps.avgTokenLen(col("text")).as("avg"),
      TextOps.tokenRatio(col("text"), Seq("the", "a", "of", "and", "to", "in", "is")).as("sw"))
      .head()
    assert(r.getInt(0) == 22 && r.getInt(1) == 6)
    assert(r.getDouble(2) == round(17.0 / 6, 4)) // 22 chars - 5 separators
    assert(r.getDouble(3) == round(2.0 / 6, 4))  // two "the"
  }

  private def round(x: Double, dp: Int) =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("wordGramsKernel: sliding window, split contract, short/null edges") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c d e f"),     // 2 5-grams
      (2L, "a b c d"),         // shorter than n -> none
      (3L, "a  b c d e"),      // double space -> empty token kept (split contract)
      (4L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val g = df.select(col("doc_id"),
      TextOps.wordGramsKernel(col("text"), 5).as("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L) == Seq("a b c d e", "b c d e f"))
    assert(g(2L).isEmpty)
    assert(g(3L) == Seq("a  b c d", " b c d e"))
    assert(g(4L).isEmpty)
  }

  test("decontaminate flags exactly the docs sharing a 5-gram with the benchmark") {
    val docs = spark.createDataFrame(Seq(
      (1L, "v w x y z unrelated tail here"),          // shares "v w x y z" with bench
      (2L, "totally different words in this doc"),    // clean
      (3L, "p q r s t and v w x y z twice v w x y z") // shared gram counted ONCE
    )).toDF("doc_id", "text")
    val bench = spark.createDataFrame(Seq(
      (10L, "leading v w x y z trailing"))).toDF("doc_id", "text")
    val r = TextOps.decontaminate(docs, bench).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 3L -> 1L))
  }

  test("packShards equals the naive global prefix sum, invariant to partition count") {
    import org.apache.spark.sql.expressions.Window
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val docs = spark.range(100).select(col("id").as("doc_id"),
      // token counts 1..10 repeating: doc i has (i%10)+1 tokens
      concat_ws(" ", sequence(lit(0), pmod(col("id"), lit(10)))).as("text"))
    val naive = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .withColumn("shard", floor(
        (coalesce(sum(col("n_tokens")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          / 37L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for (p <- Seq(1, 3, 16)) {
      val packed = TextOps.packShards(docs, budget = 37L, parts = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(packed == naive, s"parts=$p")
    }
    // shards really pack to ~budget: every non-final shard holds >= budget - max_doc
    val sizes = TextOps.packShards(docs, 37L, 4).groupBy("shard")
      .agg(sum("n_tokens").as("tot")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = sizes.keys.max
    assert(sizes.filter(_._1 != last).values.forall(t => t >= 37L - 10 && t < 37L + 10))
    // lifecycle (r10): the internal toks cache is released before return;
    // only the eager localCheckpoint pin of the result may remain
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed)
    assert(leaked.isEmpty,
      s"packShards leaked ${leaked.size} plain cached RDDs into the session")
  }

  test("repetition signals: dominated bigram and low TTR on a literal doc") {
    val docs = spark.createDataFrame(Seq(
      (1L, "spam spam spam spam ok"),   // 4 bigrams, "spam spam" x3 -> 0.75; ttr 2/5
      (2L, "all words here differ now") // 4 distinct bigrams -> 0.25; ttr 1.0
    )).toDF("doc_id", "text")
    // run the q65 plan on the literal frame (same code path, local input)
    val gc = docs.select(col("doc_id"),
        graft.ext.TextOps.wordGramsKernel(col("text"), 2).as("g"))
      .select(col("doc_id"), explode(col("g")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    val rep = gc.groupBy("doc_id").agg(
      org.apache.spark.sql.functions.round(
        max("c").cast("double") / sum("c"), 6).as("r")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(rep(1L) == 0.75 && rep(2L) == 0.25)
  }

  test("regex tokenizer counts letter runs, digit runs, and symbols") {
    val df = spark.createDataFrame(Seq((1L, "abc 123 x!y"))).toDF("doc_id", "text")
    // tokens: abc, 123, x, !, y
    assert(df.select(TextOps.regexTokenCount(col("text"))).head().getInt(0) == 5)
  }

  test("fingerprint is whitespace-normalization invariant, content-sensitive") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b  c"), (2L, "  a b c "), (3L, "a b d"))).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    assert(fp(1L).matches("[0-9a-f]{32}"))
  }

  test("simhash: near-identical texts are close in Hamming space, distinct are far") {
    // Long texts (~46 words → ~44 shingles) so the per-bit majority vote
    // has a real margin: the near pair shares ~93% of shingles. The old
    // 14-word toy texts (12 shingles, 75% shared) made the vote noisy —
    // Hamming 9 — and the test red for 4 rounds while the REAL contract
    // (banding exact to Hamming 7, fixture recall) passed below. The
    // near/far bounds here carry a wide margin on both sides of the
    // banding threshold 7; random 64-bit hashes sit at Hamming ~32.
    val base = "the quick brown fox jumps over the lazy dog near the wide river bank " +
      "while morning light settles across the quiet valley and distant hills slowly " +
      "wake beneath a pale clear sky as birds begin their first songs of the day"
    val df = spark.createDataFrame(Seq(
      (1L, base + " today"),
      (2L, base + " tonight"),
      (3L, "columnar storage engines shuffle partitioned aggregates across executor " +
        "heaps while vectorized readers prune row groups and adaptive planners " +
        "coalesce skewed shuffle partitions into balanced tasks before codegen " +
        "stages fuse operators into tight loops over off heap buffers at runtime")))
      .toDF("doc_id", "text")
    val sh = df.select(col("doc_id"),
      TextOps.simHash(NearDup.shingleHashes(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 7, s"near-dup dist=${ham(sh(1L), sh(2L))}")
    assert(ham(sh(1L), sh(3L)) >= 20, s"distinct dist=${ham(sh(1L), sh(3L))}")
  }

  test("winnowing: deterministic, whitespace-invariant, substring guarantee, density bound") {
    // k=8, w=4: any shared substring of length >= k+w-1 = 11 chars must
    // yield at least one shared fingerprint (the winnowing guarantee)
    val shared = "a quick brown fox jumped over the lazy dog near the river bank"
    val df = spark.createDataFrame(Seq(
      (1L, s"PREFIX ONE $shared SUFFIX ALPHA"),
      (2L, s"totally different lead-in $shared and another tail"),
      (3L, s"PREFIX   ONE  $shared  SUFFIX ALPHA"), // ws-normalized dup of 1
      (4L, "unrelated content with no overlap whatsoever in this sentence")))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextOps.winnowFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(3L), "whitespace normalization")
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring must share a fingerprint")
    assert((fps(1L) & fps(4L)).isEmpty, "unrelated texts share nothing")
    // density: selected fingerprints are a strict subset of the k-gram count,
    // roughly 2/(w+1) of positions — allow a generous band
    val n = df.filter(col("doc_id") === 1L).head().getString(1).length
    assert(fps(1L).size > n / 12 && fps(1L).size < n, s"density out of band: ${fps(1L).size} of $n")
  }

  test("q50 winnow query: one row per doc, positive counts") {
    val out = TextOps.q50(spark, sf("sf0.001"))
    val rows = out.collect()
    assert(rows.length == spark.read.parquet(sf("sf0.001") + "/documents.parquet").count())
    assert(rows.forall(r => r.getLong(1) > 0))
  }

  test("simhash compiled kernel is bit-identical to the declarative HOF tier") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001")).limit(50)
    val both = docs.select(
        TextOps.simHash(NearDup.shingleHashes(col("text"))).as("k"),
        TextOps.simHashHof(NearDup.shingleHashes(col("text"))).as("h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("tokenRatio compiled kernel is bit-identical to the declarative HOF tier") {
    import spark.implicits._
    val vocab = Seq("the", "a", "of", "and", "to", "in", "is")
    // fixture docs + adversarial edges: multi-space (empty tokens),
    // leading/trailing spaces, all-vocab, no-vocab, single token, null
    val edges = Seq("the  a", " the a ", "the", "zz", "", "a a a a a a the of",
      null.asInstanceOf[String]).toDF("text")
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select("text").limit(200).union(edges)
    val both = docs.select(
        TextOps.tokenRatio(col("text"), vocab).as("hof"),
        TextOps.tokenRatioKernel(col("text"), vocab).as("k"))
      .collect()
    assert(both.length > 200)
    both.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("simHashPairs: banding is exact to Hamming 7; high recall on fixture groups at sf0.001") {
    val d = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, d)
    // ground truth: doc pairs sharing a 40-char prefix (the fixture's
    // near-dup groups — same ground truth as NearDupSpec)
    val byPrefix = docs.select(substring(col("text"), 1, 40).as("p"), col("doc_id"))
      .collect().groupBy(_.getString(0)).values
      .flatMap(g => g.map(_.getLong(1)).sorted.combinations(2).map(c => (c(0), c(1))))
      .toSet
    val got = TextOps.simHashPairs(docs).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // (1) SimHash's REAL contract: the 8-byte banding finds EXACTLY the
    // pairs within Hamming distance 7 (pigeonhole: d<=7 differing bits
    // leave >=1 of 8 bands untouched). Brute-force all-pairs check at
    // driver — fine at sf0.001 (~hundreds of docs), never an engine path.
    val sh = docs.select(col("doc_id"),
      TextOps.simHash(NearDup.shingleHashes(col("text"))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth7 = (for {
      (ida, sa) <- sh; (idb, sb) <- sh
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (ida, idb)).toSet
    assert(got == truth7,
      s"banding!=brute-force: missed ${(truth7 -- got).take(5)} spurious ${(got -- truth7).take(5)}")

    // (2) empirical quality vs the fixture's Jaccard-level ground truth:
    // a ~0.9-Jaccard pair usually (not always) lands within Hamming 7 —
    // assert high recall and no false positives. (MinHash/Jaccard is the
    // exact-recall path; SimHash trades recall for a 16-byte/doc index.)
    val recall = (byPrefix & got).size.toDouble / byPrefix.size
    assert(recall >= 0.85, s"recall=$recall missed ${(byPrefix -- got).take(5)}")
    assert((got -- byPrefix).isEmpty, s"spurious ${(got -- byPrefix).take(5)}")
  }

  test("simHashPairs: wider-key banding (maxDist=3 -> 4x16-bit blocks) is exact to Hamming 3") {
    // the 100 TB operating point: bands = maxDist+1 = 4 blocks of 16
    // bits — pigeonhole still guarantees zero false negatives at d<=3,
    // with 2^16 key space instead of 2^8. Verify against brute force.
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val got = TextOps.simHashPairs(docs, maxDist = 3).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"),
      TextOps.simHash(NearDup.shingleHashes(col("text"))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth3 = (for {
      (ida, sa) <- sh; (idb, sb) <- sh
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    assert(got == truth3,
      s"banding!=brute-force: missed ${(truth3 -- got).take(5)} spurious ${(got -- truth3).take(5)}")
  }

  test("simHashPairs: degenerate-bucket guard drops exact-dup floods") {
    // 30 identical docs -> every band bucket has 30 members -> 435 pairs
    // without the guard; maxBucket=10 drops the flood entirely (exact
    // dups belong in exact dedup, not banding).
    val dup = (1L to 30L).map(i => (i, "the quick brown fox jumps over the lazy dog " +
      "while the morning light settles across the quiet valley and distant hills"))
    val docs = spark.createDataFrame(dup).toDF("doc_id", "text")
    assert(TextOps.simHashPairs(docs, maxBucket = 10).count() == 0)
    assert(TextOps.simHashPairs(docs).count() == 435) // default cap untouched
  }

  test("winnowPairs: fingerprint-set Jaccard pairs equal the fixture prefix groups at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val got = TextOps.winnowPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byPrefix = docs.select(substring(col("text"), 1, 40).as("p"), col("doc_id"))
      .collect().groupBy(_.getString(0)).values
      .flatMap(g => g.map(_.getLong(1)).sorted.combinations(2).map(c => (c(0), c(1))))
      .toSet
    assert(got == byPrefix,
      s"missed ${(byPrefix -- got).take(5)} spurious ${(got -- byPrefix).take(5)}")
  }

  test("q30-q33 run and key invariants hold at sf0.001") {
    val d = sf("sf0.001")
    val q30 = TextOps.q30(spark, d).collect()
    assert(q30.length == 100 && q30.forall(r =>
      r.getDouble(4) >= 0 && r.getDouble(4) <= 1 && r.getLong(2) > 0))
    val q31 = TextOps.q31(spark, d).collect()
    assert(q31.forall(r => Set("en", "und")(r.getString(2))))
    val q32 = TextOps.q32(spark, d).collect()
    // all-lowercase space-separated soup: regex tokens == whitespace tokens
    assert(q32.forall(r => r.getLong(1) == r.getLong(2)))
    val q33 = TextOps.q33(spark, d).collect()
    assert(q33.map(_.getString(1)).distinct.length == 100) // no exact dups
  }

  test("q79 unigram LM: all scores negative, sorted-fold recomputation matches exactly") {
    val d = sf("sf0.001")
    val r = TextOps.q79(spark, d).collect()
    assert(r.length == 500 && r.forall(_.getDouble(2) < 0))
    // local recomputation, same sorted-word fold, for the first 5 docs
    val texts = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val uni = texts.values.toSeq.flatMap(_.split(" "))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val nTok = uni.values.sum
    (0L to 4L).foreach { id =>
      val tf = texts(id).split(" ").groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      val sumLp = tf.toSeq.sortBy(_._1).foldLeft(0d) { case (acc, (w, t)) =>
        acc + t * math.log(uni(w).toDouble / nTok)
      }
      val expect = BigDecimal(sumLp / tf.values.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = r.find(_.getLong(0) == id).get
      assert(got.getDouble(2) == expect, s"doc $id")
      assert(got.getLong(1) == tf.values.sum)
    }
  }

  test("q263 bigram backoff LM: exact recomputation; both CASE branches fire") {
    val d = sf("sf0.001")
    val texts = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    def toks(t: String): Array[String] = t.split("\\s+").filter(_.nonEmpty)
    val refIds = texts.keys.filter(_ % 25 == 0).toSeq
    val c1 = refIds.flatMap(id => toks(texts(id)))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val n = c1.values.sum
    val v = c1.size.toLong
    val c2 = refIds.flatMap(id => toks(texts(id)).sliding(2)
        .collect { case Array(a, b) => (a, b) })
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val r = TextOps.q263(spark, d).collect()
    val scoredIds = texts.keys
      .filter(id => id % 25 != 0 && toks(texts(id)).length >= 2)
    assert(r.length == scoredIds.size)
    // the reference slice misses bigrams AND covers some: both branches
    assert(r.map(_.getLong(2)).sum > 0, "backoff branch never fired")
    assert(r.map(x => x.getLong(1) - x.getLong(2)).sum > 0, "seen branch never fired")
    r.take(5).foreach { row =>
      val id = row.getLong(0)
      val bgs = toks(texts(id)).sliding(2)
        .collect { case Array(a, b) => (a, b) }.toSeq
      var backoff = 0L
      val slp = bgs.foldLeft(0d) { case (acc, (w1, w2)) =>
        acc + (c2.get((w1, w2)) match {
          case Some(cc) => math.log(cc.toDouble / c1(w1).toDouble)
          case None =>
            backoff += 1
            math.log(0.4) +
              math.log((c1.getOrElse(w2, 0L) + 1L).toDouble / (n + v).toDouble)
        })
      }
      val expect = BigDecimal(slp / bgs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getLong(1) == bgs.length.toLong, s"doc $id n_bigrams")
      assert(row.getLong(2) == backoff, s"doc $id n_backoff")
      assert(row.getDouble(3) == expect, s"doc $id score")
    }
  }

  test("q269 CCNet buckets: exact-rank terciles match a driver recompute; ties collapse down") {
    val d = sf("sf0.001")
    val scores = TextOps.q263(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    def q(x: Double): Long =
      BigDecimal(x * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val lpq = scores.map { case (id, lp) => id -> q(lp) }
    val sortedDesc = lpq.values.toSeq.sorted.reverse
    val n = sortedDesc.length.toLong
    val (k1, k2) = (n / 3, 2 * n / 3)
    val t1 = sortedDesc(k1.toInt)
    val t2 = sortedDesc(k2.toInt)
    val want = lpq.map { case (id, v) =>
      id -> (if (v > t1) "head" else if (v > t2) "middle" else "tail")
    }
    val got = TextOps.q269(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.length == want.size)
    got.foreach { case (id, lp, b) =>
      assert(lp == scores(id), s"doc $id score")
      assert(b == want(id), s"doc $id bucket: $b != ${want(id)}")
    }
    val sizes = got.groupBy(_._3).map { case (b, g) => b -> g.length }
    assert(sizes.keySet == Set("head", "middle", "tail"), s"buckets $sizes")
    // strictly-above semantics: head is AT MOST k1, ties collapse down
    assert(sizes("head") <= k1, s"head overflow: $sizes k1=$k1")
  }

  test("segmentDedup: untouched docs reconstruct exactly, boilerplate really drops") {
    val d = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, d)
    val r = TextOps.q78(spark, d)
      .join(docs.select(col("doc_id"), md5(col("text")).as("orig_md5")), Seq("doc_id"))
      .collect()
    assert(r.length == 500) // total: one row per doc, none disappear
    // a doc that lost no segments re-joins to exactly its original text
    val untouched = r.filter(x => x.getLong(2) == x.getLong(1))
    assert(untouched.nonEmpty)
    untouched.foreach(x => assert(x.getString(3) == x.getString(4)))
    // the fixture's near-dup prefix groups ARE repeated segments: some drop
    val touched = r.filter(x => x.getLong(2) < x.getLong(1))
    assert(touched.nonEmpty)
    touched.foreach(x => assert(x.getLong(2) == 0L || x.getString(3) != x.getString(4)))
  }

  test("redactPii removes every phone/email match; q67 counts follow the injection rule") {
    val df = spark.createDataFrame(Seq(
      (1L, "call 25-989-741-2988 or mail a.b_c@ex.co now"),
      (2L, "no pii here 123 45-67"))).toDF("doc_id", "text")
    val red = df.select(col("doc_id"), TextOps.redactPii(col("text")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(red(1L) == "call [PHONE] or mail [EMAIL] now")
    assert(red(2L) == "no pii here 123 45-67") // partial shapes untouched
    val r = TextOps.q67(spark, sf("sf0.001")).collect()
    r.foreach { row =>
      val (id, nPhone, nEmail, text) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3))
      assert(nPhone == (if (id % 3 == 0) 2L else 1L), s"doc $id")
      assert(nEmail == 1L, s"doc $id")
      // post-redaction text has zero residual matches
      assert(!text.matches(s".*${TextOps.phonePattern}.*"), s"doc $id")
      assert(text.contains("[PHONE]") && text.endsWith("[EMAIL]"))
    }
  }

  test("chunkKernel: stride windows, partial tail kept, full token coverage") {
    val toks = (0 until 80).map(i => s"t$i")
    val df = spark.createDataFrame(Seq(
      (1L, toks.mkString(" ")), (2L, "a b c"))).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        TextOps.chunkKernel(col("text"), 32, 24).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // 80 tokens, size 32, stride 24 -> 1 + ceil(48/24) = 3 chunks
    assert(chunks(1L).length == 3)
    assert(chunks(1L)(0) == toks.slice(0, 32).mkString(" "))
    assert(chunks(1L)(1) == toks.slice(24, 56).mkString(" "))
    assert(chunks(1L)(2) == toks.slice(48, 80).mkString(" ")) // partial tail
    // coverage: every token appears in at least one chunk
    assert(chunks(1L).flatMap(_.split(" ")).toSet == toks.toSet)
    assert(chunks(2L) == Seq("a b c")) // short doc = one whole chunk
  }

  test("q74 shard digests equal a local recomputation of shard content") {
    val d = sf("sf0.001")
    val r = SparkEntry.queries("q74_shard_text")(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(3))).toList
    val docs = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).sortBy(_._1)
    val assign = TextOps.packShards(
      graft.sources.Tables.documents(spark, d), 5000L).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    val local = docs.groupBy { case (id, _) => assign(id) }.toList.sortBy(_._1)
      .map { case (shard, members) =>
        val content = members.sortBy(_._1).map(_._2).mkString("\n")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (shard, members.size.toLong, md)
      }
    assert(r == local)
  }

  test("charGramsKernel windows and decontaminateChars flag exact char overlap") {
    val g = spark.createDataFrame(Seq((1L, "abcde"), (2L, "abc"), (3L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.charGramsKernel(col("text"), 4).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L) == Seq("abcd", "bcde"))
    assert(g(2L).isEmpty && g(3L).isEmpty)
    val docs = spark.createDataFrame(Seq(
      (1L, "xxxx the exact twenty chars zz"), // shares a 20-char window
      (2L, "completely different body here"))).toDF("doc_id", "text")
    val bench = spark.createDataFrame(Seq(
      (10L, "yy the exact twenty chars kkk"))).toDF("doc_id", "text")
    val r = TextOps.decontaminateChars(docs, bench).collect()
      .map(x => x.getLong(0)).toSet
    assert(r == Set(1L))
  }

  test("q69 collocations: deterministic PMI ranking, significance floor holds") {
    val r = TextOps.q69(spark, sf("sf0.001")).collect()
    assert(r.length == 100)
    assert(r.forall(_.getLong(2) >= 5)) // c_ab floor
    val pmis = r.map(_.getDouble(3))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }) // sorted desc
    // PMI of independent word soup hovers near 0; top collocations are
    // positive, the floor row is finite
    assert(pmis.head > 0 && !pmis.last.isNaN && !pmis.last.isInfinite)
  }

  test("q82 DSIR weights: sorted-fold recomputation matches exactly, en docs skew high") {
    val d = sf("sf0.001")
    val r = TextOps.q82(spark, d).collect()
    assert(r.length == 500)
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    val toks = docs.map { case (id, lang, t) => (id, lang, t.split(" ")) }
    val uniC = toks.flatMap(_._3).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val uniT = toks.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val nC = uniC.values.sum; val nT = uniT.values.sum; val v = uniC.size
    (0L to 4L).foreach { id =>
      val tf = toks.find(_._1 == id).get._3.groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      val sumLr = tf.toSeq.sortBy(_._1).foldLeft(0d) { case (acc, (w, t)) =>
        acc + t * (math.log((uniT.getOrElse(w, 0L) + 1).toDouble / (nT + v)) -
          math.log((uniC(w) + 1).toDouble / (nC + v)))
      }
      val expect = BigDecimal(sumLr / tf.values.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.find(_.getLong(0) == id).get.getDouble(2) == expect, s"doc $id")
    }
    // the target slice should score higher than the rest on average
    val byLang = r.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val langOf = docs.map(x => (x._1, x._2)).toMap
    val en = byLang.collect { case (id, s) if langOf(id) == "en" => s }
    val rest = byLang.collect { case (id, s) if langOf(id) != "en" => s }
    assert(en.sum / en.size > rest.sum / rest.size,
      "target-LM ratio should separate the target slice")
  }

  test("q84 BM25: brute-force recomputation matches, rank total, top-k plan is heap-shaped") {
    val d = sf("sf0.001")
    val q = TextOps.q84(spark, d)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    val r = q.collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    assert(r.length == 20 && r.map(_._3).toSeq == (1L to 20L))
    // brute force on the driver
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").collect().map(x => (x.getLong(0), x.getString(1).split(" ")))
    val terms = Seq("dup", "hash", "window")
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.flatMap { case (id, ws) =>
      val tfs = terms.sorted.flatMap { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0) None else Some {
          math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * ws.length / avgdl))
        }
      }
      if (tfs.isEmpty) None
      else Some(id -> BigDecimal(tfs.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expect = scored.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    assert(r.map(x => (x._1, x._2)).toSeq == expect)
    // the rare term must out-weigh the common one at equal tf
    assert(math.log((n - df("dup") + 0.5) / (df("dup") + 0.5) + 1.0) >
      math.log((n - df("window") + 0.5) / (df("window") + 0.5) + 1.0))
  }

  test("q85 budget curation: per-lang greedy fill exact, budget tight, next doc would burst") {
    val d = sf("sf0.001")
    val r = TextOps.q85(spark, d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty && r.forall(_._4 <= 3000L))
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2).split(" ")))
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val byLang = docs.groupBy(_._2)
    byLang.foreach { case (lang, ds) =>
      val ordered = ds.map { case (id, _, ws) =>
        val sr = BigDecimal(ws.count(stop).toDouble / ws.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, ws.length.toLong, sr)
      }.sortBy { case (id, _, sr) => (sr, id) }
      var cum = 0L
      val expect = ordered.takeWhile { case (_, nt, _) => { cum += nt; cum <= 3000L } }
        .map(_._1).toSet
      val got = r.filter(_._1 == lang).map(_._2).toSet
      assert(got == expect, s"lang=$lang")
      // tightness: the admitted set is maximal under the order
      val admitted = r.filter(_._1 == lang)
      val tail = ordered.filterNot(x => expect(x._1))
      if (tail.nonEmpty && admitted.nonEmpty)
        assert(admitted.map(_._3).sum + tail.head._2 > 3000L, s"lang=$lang not tight")
    }
  }

  test("q88 pipeline v4: shards respect the budget, selection is heap-shaped and bounded") {
    val q = TextOps.q88(spark, sf("sf0.001"))
    // the result frame is post-localCheckpoint (its plan is a scan), so
    // the selection stage's shape is asserted on the stage itself:
    // cluster-core selection merges through the bounded-heap aggregator,
    // never a per-cluster window sort
    val selPlan = {
      val km = graft.ext.Similarity.kmeans(
        graft.sources.Tables.embeddings(spark, sf("sf0.001")), 8, 2)
      val topc = org.apache.spark.sql.functions.udaf(new graft.functions.TopKAggregator(40))
      km.groupBy("cluster").agg(topc(col("vec_id"), -col("dist")).as("core"))
        .queryExecution.executedPlan.toString
    }
    assert(selPlan.toLowerCase.contains("partial_topkaggregator"), selPlan.take(2000))
    val r = q.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.nonEmpty)
    // every selected doc fits 8 clusters x 40 cores, post-fill
    assert(r.map(_._2).sum <= 320)
    // shard budget: every shard's START respects the 1,000-token cut
    // (a shard may overflow by at most its last doc)
    val cum = r.sortBy(_._1).map(_._3).scanLeft(0L)(_ + _)
    r.sortBy(_._1).zip(cum).foreach { case ((sid, _, _, _), before) =>
      assert(before / 1000L == sid, s"shard $sid starts at token $before")
    }
    assert(r.map(_._4).distinct.length == r.length, "shard digests distinct")
  }

  test("q89 exact-n sample: exactly min(n, stratum) per lang, md5-order pick, heap-shaped plan") {
    val d = sf("sf0.001")
    val q = graft.operators.Relational.q89(spark, d)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    val r = q.collect().map(x => (x.getString(0), x.getLong(1)))
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "lang").collect().map(x => (x.getLong(0), x.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex12(id: Long): String = md.synchronized {
      md.reset()
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    }
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val expect = ds.map(_._1).sortBy(id => (hex12(id), id)).take(25).toSet
      val got = r.filter(_._1 == lang).map(_._2).toSet
      assert(got.size == math.min(25, ds.length), s"lang=$lang size")
      assert(got == expect, s"lang=$lang pick")
    }
  }

  test("q90 contamination ratio: total function, exact counts, flagged set == q62's docs") {
    val d = sf("sf0.001")
    val r = TextOps.q90(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").collect().map(x => (x.getLong(0), x.getString(1)))
    val train = docs.filter(_._1 % 10 != 0)
    // total over every train doc with >= 5 tokens
    assert(r.length == train.count(_._2.split(" ").length >= 5))
    val benchGrams = docs.filter(_._1 % 10 == 0)
      .flatMap { case (_, t) => t.split(" ").sliding(5).map(_.mkString(" ")) }.toSet
    (r.take(10) ++ r.filter(_._3 > 0).take(10)).foreach { case (id, ng, ns, ratio) =>
      val grams = train.find(_._1 == id).get._2.split(" ").sliding(5).map(_.mkString(" ")).toSet
      assert(ng == grams.size, s"doc $id n_grams")
      assert(ns == grams.count(benchGrams), s"doc $id n_shared")
      val expect = BigDecimal(ns.toDouble / ng)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio == expect, s"doc $id ratio")
    }
    // the binary flag (q62) is exactly the ratio > 0 slice
    val flagged = TextOps.q62(spark, d).collect().map(_.getLong(0)).toSet
    assert(r.filter(_._3 > 0).map(_._1).toSet == flagged)
  }

  test("q83 inverted index: df exact, head page = first 50 sorted doc_ids, state bounded") {
    val d = sf("sf0.001")
    val r = TextOps.q83(spark, d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2)))
    assert(r.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val postings = docs.flatMap { case (id, t) => t.split(" ").distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sorted.toSeq }
      .filter(_._2.length >= 2)
    assert(r.length == postings.size)
    r.foreach { case (w, df, pg) =>
      val expect = postings(w)
      assert(df == expect.length, s"df of $w")
      assert(pg == expect.take(50).mkString(","), s"head page of $w")
      assert(pg.split(",").length <= 50)
    }
  }

  test("nfc_normalize composes combining marks (q104 expression contract)") {
    // decomposed: e + COMBINING ACUTE (U+0065 U+0301); precomposed: U+00E9
    val decomposed = "cafe\u0301 au lait"
    val precomposed = "caf\u00e9 au lait"
    assert(decomposed != precomposed) // byte-different inputs...
    import spark.implicits._
    val out = Seq(Tuple1(decomposed), Tuple1(precomposed)).toDF("s")
      .selectExpr("nfc_normalize(s) AS n").collect()
    assert(out(0).getString(0) == precomposed) // ...compose to NFC
    assert(out(1).getString(0) == precomposed) // already-NFC is identity
  }

  test("normalizeText fingerprints NFC-equal texts identically") {
    import spark.implicits._
    val df = Seq(
      (1L, "cafe\u0301 du \t monde"), // decomposed + whitespace run
      (2L, "Caf\u00e9 du monde!"),     // precomposed + case + punct
      (3L, "tea house"))                // distinct content
      .toDF("doc_id", "text")
    val r = TextOps.normalizeText(df).select("doc_id", "norm", "fp")
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(2))).toMap
    // e\u0301 composes to \u00e9, which is outside [a-z0-9 ] and is
    // stripped — both spellings normalize to the same bytes, hence ONE
    // fingerprint for byte-different inputs
    assert(r(1L)._1 == "caf du monde" && r(1L) == r(2L))
    assert(r(3L)._2 != r(1L)._2)
  }

  test("packingWaste: pad/trunc/kept account for every token at each ctx") {
    import spark.implicits._
    // docs of 3, 5, 10 tokens; ctx 4: pad = 1 (doc1), trunc = 1+6,
    // kept = 3+4+4 = 11, packed_min = ceil(11/4) = 3
    val docs = Seq((1L, "a b c"), (2L, "a b c d e"),
      (3L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val r = graft.ext.TextOps.packingWaste(docs, Seq(4)).collect().head
    assert(r.getAs[Long]("n_docs") == 3 && r.getAs[Long]("total_tokens") == 18)
    assert(r.getAs[Long]("pad_tokens") == 1 && r.getAs[Long]("trunc_tokens") == 7)
    assert(r.getAs[Long]("kept_tokens") == 11 && r.getAs[Long]("packed_seqs_min") == 3)
    // conservation: kept + trunc = total; pad + kept = n_docs·ctx
    assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("trunc_tokens") ==
      r.getAs[Long]("total_tokens"))
    assert(r.getAs[Long]("pad_tokens") + r.getAs[Long]("kept_tokens") == 3 * 4)
  }

  test("tokenFertility: exact per-lang chars/token and tokens/doc") {
    import spark.implicits._
    val docs = Seq((1L, "en", 10L, "a b"), (2L, "en", 20L, "c d e f"),
      (3L, "de", 9L, "x y z")).toDF("doc_id", "lang", "n_chars", "text")
    val r = graft.ext.TextOps.tokenFertility(docs).collect()
      .map(x => x.getString(0) -> ((x.getAs[Long]("total_chars"),
        x.getAs[Long]("total_tokens"), x.getAs[Double]("chars_per_token"),
        x.getAs[Double]("tokens_per_doc")))).toMap
    assert(r("en") == ((30L, 6L, 5.0, 3.0)))
    assert(r("de") == ((9L, 3L, 3.0, 3.0)))
  }

  test("repetitionAudit: hand fractions on a planted boilerplate doc, clean doc near zero") {
    import spark.implicits._
    // doc 1: "x y x y x y z" — tokens: x×3 y×3 z×1 → dup_token 6/7;
    // 2-grams: (x y)×3 (y x)×2 (y z)×1 → dup 5/6; 3-grams:
    // (x y x)×2 (y x y)×2 (x y z)×1 → dup 4/5; top token 3/7.
    // doc 2: all distinct — every fraction 0.
    val docs = Seq((1L, "x y x y x y z"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.repetitionAudit(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Double]("dup_token_frac") == math.rint(6.0 / 7 * 1e6) / 1e6)
    assert(d1.getAs[Double]("dup_2gram_frac") == math.rint(5.0 / 6 * 1e6) / 1e6)
    assert(d1.getAs[Double]("dup_3gram_frac") == 0.8)
    assert(d1.getAs[Double]("top_token_frac") == math.rint(3.0 / 7 * 1e6) / 1e6)
    val d2 = out(2L)
    assert(d2.getAs[Double]("dup_token_frac") == 0.0 &&
      d2.getAs[Double]("dup_2gram_frac") == 0.0 &&
      d2.getAs[Double]("dup_3gram_frac") == 0.0)
    assert(d2.getAs[Double]("top_token_frac") == 0.2)
  }

  test("repetitionAudit: sub-3-token docs are excluded, not fabricated") {
    import spark.implicits._
    // a 2-token doc has no 3-grams: the descending-sequence hazard
    // (sequence(0,-1) = [0,-1] indexing t[-1]) must NOT invent grams —
    // the doc drops out of the audit entirely
    val docs = Seq((1L, "a b"), (2L, "a a a a")).toDF("doc_id", "text")
    val out = graft.ext.TextOps.repetitionAudit(docs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.head.getAs[Double]("dup_3gram_frac") == 1.0)
  }

  test("zipfFit recovers a planted power law and caps the rank frame at topR") {
    import spark.implicits._
    // plant freq(r) = round(10000·r^-1): ln-ln OLS over the head must
    // come out near slope −1 (rounding the counts perturbs it slightly)
    val docs = Seq(Tuple1((1 to 200).flatMap(r =>
      Seq.fill(math.max(1, math.round(10000.0 / r).toInt))(s"w$r"))
      .mkString(" "))).toDF("text").withColumn("doc_id", lit(1L))
    val fit = graft.ext.TextOps.zipfFit(docs, 100).collect().head
    assert(fit.getAs[Long]("n_ranks") == 100)
    val slope = fit.getAs[Double]("zipf_slope")
    assert(math.abs(slope + 1.0) < 0.01, s"slope $slope")
    // flat corpus (every token equally frequent): slope exactly 0
    val flat = Seq(Tuple1((1 to 50).map(i => s"t$i t$i t$i").mkString(" ")))
      .toDF("text").withColumn("doc_id", lit(1L))
    assert(graft.ext.TextOps.zipfFit(flat, 50).collect().head
      .getAs[Double]("zipf_slope") == 0.0)
  }

  test("langConfusion: marker-heavy docs route to en, shares sum to 1 per true lang") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat is on the mat and of a"),   // marker-dense → en
      (2L, "en", "zzz qqq rrr sss ttt"),              // marker-free → und
      (3L, "de", "der hund zzz qqq rrr"))             // no en markers → und
      .toDF("doc_id", "lang", "text")
    val out = graft.ext.TextOps.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(out(("en", "en")) == ((1L, 0.5)) && out(("en", "und")) == ((1L, 0.5)))
    assert(out(("de", "und")) == ((1L, 1.0)) && !out.contains(("de", "en")))
  }

  test("setSimilarityJoin (PPJoin prefix+length+positional) == naive all-pairs") {
    // The filters are lossless by theorem; this pins it empirically:
    // the filtered plan must equal the NAIVE gram self-join row-for-row
    // on real fixture text, at two thresholds (q241's 1/2 and a looser
    // 1/3 that admits more size-skewed pairs — the length-filter edge).
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    def naive(num: Int, den: Int, n: Int = 5) = {
      val w = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= n)
      val tok = w.select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("w")) - n),
            i => array_join(slice(col("w"), i + lit(1), lit(n)), " ")))
          .as("gram"))
        .distinct()
      val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      tok.select(col("doc_id").as("da"), col("gram"))
        .join(tok.select(col("doc_id").as("db"), col("gram")), Seq("gram"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("co"))
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .filter(col("co") * den >= (col("na") + col("nb") - col("co")) * num)
        .select("da", "db", "co", "na", "nb")
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    for ((num, den) <- Seq((1, 2), (1, 3))) {
      val got = key(TextOps.setSimilarityJoin(docs, num, den)
        .select("doc_a", "doc_b", "co", "na", "nb"))
      val want = key(naive(num, den))
      assert(got == want,
        s"t=$num/$den: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"t=$num/$den fixture yields no pairs — test is vacuous")
    }
  }

  test("containmentJoin (prefix+length+positional) == naive all-pairs, asymmetric") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    def naive(num: Int, den: Int, n: Int = 5) = {
      val w = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= n)
      val tok = w.select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("w")) - n),
            i => array_join(slice(col("w"), i + lit(1), lit(n)), " ")))
          .as("gram"))
        .distinct()
      val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      tok.select(col("doc_id").as("da"), col("gram"))
        .join(tok.select(col("doc_id").as("db"), col("gram")), Seq("gram"))
        .filter(col("da") =!= col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("co"))
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .filter(col("co") * den >= col("na") * num)
        .select("da", "db", "co", "na", "nb")
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    for ((num, den) <- Seq((2, 3), (1, 2))) {
      val got = key(TextOps.containmentJoin(docs, num, den)
        .select("doc_a", "doc_b", "co", "na", "nb"))
      val want = key(naive(num, den))
      assert(got == want,
        s"t=$num/$den: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"t=$num/$den fixture yields no pairs — test is vacuous")
    }
    // asymmetry pin on a handcrafted short-doc-inside-long-doc pair
    // (the fixture's near-dups are all similar-sized, so every
    // qualifying fixture pair happens to be mutual): the short doc's
    // grams are fully covered (containment 1 ≥ 2/3) but cover only a
    // fraction of the long doc's (reverse must NOT qualify).
    import spark.implicits._
    val hand = Seq(
      (1L, "a b c d e f"),                                  // 2 5-grams, both in doc 2
      (2L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text") // 12 5-grams
    val pairs = graft.ext.TextOps.containmentJoin(hand, 2, 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only (1,2), got $pairs")
  }

  test("exactSubstrDedup: arbitrary-offset shared spans removed, within-doc repeats kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x1 x2 A B C D E y1"),  // shares A..E with doc 2 at offset 3
      (2L, "A B C D E z1 z2 z3"),  // ...at offset 1
      (3L, "p q r"),               // shorter than k — no windows, all kept
      (4L, "m m m m m m m m")      // repeated WITHIN one doc only — kept
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.exactSubstrDedup(docs, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def digest(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1: dup windows (A B C D)@3 and (B C D E)@4 cover p 3..7 = A..E
    assert(out(1L) == ((8L, 3L, digest("x1 x2 y1"))), s"doc1: ${out(1L)}")
    assert(out(2L) == ((8L, 3L, digest("z1 z2 z3"))), s"doc2: ${out(2L)}")
    assert(out(3L) == ((3L, 3L, digest("p q r"))), s"doc3: ${out(3L)}")
    assert(out(4L) == ((8L, 8L, digest("m m m m m m m m"))), s"doc4: ${out(4L)}")
    // fully-duplicated doc: everything covered -> NULL digest, row stays
    val all = Seq((1L, "A B C D E"), (2L, "A B C D E")).toDF("doc_id", "text")
    val r = graft.ext.TextOps.exactSubstrDedup(all, k = 5).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.isNullAt(3))).toMap
    assert(r == Map(1L -> ((0L, true)), 2L -> ((0L, true))), s"full-dup: $r")
  }

  test("lexicalDiversity: exact TTR and hapax share") {
    import spark.implicits._
    // "a a b c": 4 tokens, 3 types (ttr .75), hapax {b,c} → 2/3
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = graft.ext.TextOps.lexicalDiversity(docs).collect().head
    assert(r.getAs[Long]("n_tokens") == 4 && r.getAs[Long]("n_types") == 3 &&
      r.getAs[Long]("n_hapax") == 2)
    assert(r.getAs[Double]("ttr") == 0.75)
    assert(r.getAs[Double]("hapax_frac") == math.rint(2.0 / 3 * 1e6) / 1e6)
  }

  test("q263 guard: empty/whitespace/1-token docs skip, never crash (r17 ADVICE)") {
    // before the greatest(size-1, 0) guard, size(lf) = 0 made slice's
    // length argument -1 and Spark threw at runtime, while the DuckDB
    // oracle's range(1, len(lf)) yielded an empty list and scored on
    val df = spark.createDataFrame(Seq(
      (0L, "the ref slice has these tokens and the tokens repeat"),
      (1L, "these tokens repeat and also miss"),
      (2L, ""),                            // empty -> zero tokens
      (3L, "   \t  "),                     // whitespace-only -> zero tokens
      (4L, "single")))                     // one token -> zero bigrams
      .toDF("doc_id", "text")
    val r = graft.ext.TextOps.bigramLmScore(df).collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L),
      "only the >=2-token non-reference doc is scored")
    assert(r.head.getLong(1) == 5L, "doc 1 has 5 bigrams")
  }


  test("q278 winnow density gate: bounds hold on the fixture and at the edges (r17)") {
    val r = graft.ext.TextOps.q278(spark, sf("sf0.001")).collect()
    assert(r.length == 500)
    assert(r.forall(_.getBoolean(2)), "density guarantee violated")
    // edge shapes: exactly k chars (one k-gram), k+w-1 chars (w windows)
    val df = spark.createDataFrame(Seq(
      (1L, "abcdefgh"), (2L, "abcdefghijk"), (3L, "ab")))
      .toDF("doc_id", "text")
    val edge = df.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.ext.TextOps.winnowFingerprint(
          org.apache.spark.sql.functions.col("text"))).as("n"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(edge(1L) == 1, "single k-gram must yield exactly one fp")
    assert(edge(3L) == 0, "sub-k doc must yield none")
    assert(edge(2L) >= 1 && edge(2L) <= 4)
  }

}
