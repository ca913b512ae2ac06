package graft

import org.apache.spark.sql.functions._

/** Contracts for the mergeable HLL sketch tier (q141). No SQL oracle
  * exists (the estimate is algorithm-defined), so these carry the
  * correctness burden: byte-exact mergeability (the property that
  * makes layered sketch aggregation SOUND), duplicate absorption,
  * and measured error against exact cardinalities. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._
  import graft.ext.Sketches

  private def buildSketch(ids: Seq[Long]): Array[Byte] = {
    val b = udaf(new Sketches.HllBuild)
    ids.toDF("id").select(xxhash64(col("id")).as("h"))
      .agg(b(col("h"))).collect().head.getAs[Array[Byte]](0)
  }

  test("build(A ∪ B) equals merge(build(A), build(B)) byte-for-byte") {
    val a = (1L to 5000L)
    val b = (4000L to 9000L) // overlapping
    val m = udaf(new Sketches.HllMerge)
    val merged = Seq(buildSketch(a), buildSketch(b)).toDF("s")
      .agg(m(col("s"))).collect().head.getAs[Array[Byte]](0)
    val direct = buildSketch((a ++ b).distinct)
    assert(java.util.Arrays.equals(merged, direct))
  }

  test("duplicates are absorbed: sketch of multiset equals sketch of set") {
    val once = buildSketch(1L to 1000L)
    val thrice = buildSketch(Seq.fill(3)(1L to 1000L).flatten)
    assert(java.util.Arrays.equals(once, thrice))
  }

  test("estimate error is within the 4096-register band") {
    for (n <- Seq(100, 5000, 50000)) {
      val est = Sketches.estimate(buildSketch(1L to n.toLong))
      val err = math.abs(est - n) / n.toDouble
      assert(err < 0.05, s"n=$n est=$est err=$err") // 3σ ≈ 4.9%
    }
  }

  test("rolling HLL tracks the exact rolling distinct within the band") {
    // 3 days × overlapping user sets; k=2 → complete windows at day 2,3
    val day = 86400L
    val ev = (1 to 3).flatMap { d =>
      (1L to 2000L).map(u => ((d - 1) * day + u, u * d)) // users u*d day d
    }.toDF("sec", "user_id")
      .select(timestamp_seconds(col("sec")).as("ts"), col("user_id"))
    val got = Sketches.rollingDistinctHll(ev, "user_id", 2)
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got.keySet == Set("1970-01-02", "1970-01-03"))
    // exact unions: d1∪d2 = {1..2000}∪{2,4..4000} = 3000 distinct;
    // d2∪d3 = {2,4..4000}∪{3,6..6000} = 2000+2000-667(multiples of 6)
    val ex12 = ((1L to 2000L) ++ (1L to 2000L).map(_ * 2)).distinct.size
    val ex23 = ((1L to 2000L).map(_ * 2) ++ (1L to 2000L).map(_ * 3)).distinct.size
    assert(math.abs(got("1970-01-02") - ex12) / ex12.toDouble < 0.05)
    assert(math.abs(got("1970-01-03") - ex23) / ex23.toDouble < 0.05)
  }

  // ---- q147 bloom screening ----

  private def buildBloom(ids: Seq[Long]): Array[Byte] = {
    val b = udaf(new Sketches.BloomBuild)
    ids.toDF("id").select(xxhash64(col("id")).as("h"))
      .agg(b(col("h"))).collect().head.getAs[Array[Byte]](0)
  }

  test("bloom build(A ∪ B) equals merge of shard filters byte-for-byte") {
    val a = (1L to 3000L); val b = (2000L to 6000L)
    val merged = new Sketches.BloomBuild().merge(buildBloom(a), buildBloom(b))
    assert(java.util.Arrays.equals(merged, buildBloom((a ++ b).distinct)))
  }

  test("bloom screening has ZERO false negatives and bounded FPR") {
    val history = (1L to 10000L).map(i => (i, s"key$i")).toDF("id", "k")
    // increment: 2000 true members + 20000 fresh keys
    val inc = ((1L to 2000L).map(i => (i, s"key$i")) ++
      (1L to 20000L).map(i => (100000L + i, s"fresh$i"))).toDF("id", "k")
    val got = Sketches.bloomScreen(history.select("k"), inc, "k")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("maybe_seen")).toMap
    // guarantee: every true member flags
    assert((1L to 2000L).forall(got(_)), "false negative — the one impossible outcome")
    // FPR on the fresh set stays near the design point (~0.1% at n=10k,
    // m=2Mbit, k=5); 1% is a generous 10x margin
    val fp = (1L to 20000L).count(i => got(100000L + i))
    assert(fp < 200, s"FPR ${fp / 20000.0} exceeds bound")
  }

  // ---- q165 KMV ----

  private def buildKmv(ids: Seq[Long]): Array[Long] = {
    val b = udaf(new Sketches.KmvBuild)
    ids.toDF("id").select(xxhash64(col("id")).as("h"))
      .agg(b(col("h"))).collect().head.getAs[Seq[Long]](0).toArray
  }

  test("KMV build(A ∪ B) equals merge of shard sketches byte-for-byte") {
    val a = (1L to 3000L); val b = (2000L to 6000L)
    val merged = new Sketches.KmvBuild().merge(buildKmv(a), buildKmv(b))
    assert(java.util.Arrays.equals(merged, buildKmv((a ++ b).distinct)))
    assert(merged.length == Sketches.KmvK)
    assert(merged.sameElements(merged.sorted))
  }

  test("KMV Jaccard estimate tracks the true overlap") {
    val a = buildKmv(1L to 10000L)
    val b = buildKmv(5001L to 15000L) // true J = 5000/15000 = 1/3
    val est = Sketches.kmvJaccard(a, b)
    assert(math.abs(est - 1.0 / 3) < 0.07, s"est=$est")
    assert(Sketches.kmvJaccard(a, a) == 1.0)
    assert(Sketches.kmvJaccard(a, buildKmv(90001L to 95000L)) < 0.02)
  }

  test("KMV overlap on the REAL fixture tracks q148's exact Jaccard") {
    val d = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, d)
    val est = Sketches.kmvOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = graft.ext.TextOps.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    val worst = exact.map { case (k, j) => math.abs(est(k) - j) }.max
    assert(worst < 0.1, s"worst KMV error $worst")
  }

  test("bloom screen on the REAL fixture agrees with the exact semi-join on members") {
    val d = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, d)
      .withColumn("fp", md5(regexp_replace(col("text"), "\\s+", " ")))
    val history = docs.filter(col("doc_id") % 20 < 18).select("fp")
    val inc = docs.filter(col("doc_id") % 20 >= 18).select("doc_id", "fp")
    val flagged = Sketches.bloomScreen(history, inc, "fp")
      .filter(col("maybe_seen")).select("doc_id").as[Long].collect().toSet
    val exact = inc.join(history, Seq("fp"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(flagged),
      s"false negatives: ${exact.diff(flagged)}")
  }

  // ---- Count-Min sketch ----

  private def cmsOf(keyCounts: Seq[(Long, Long)]): Array[Long] = {
    val agg = new Sketches.CmsBuild
    keyCounts.foldLeft(agg.zero)((b, kc) =>
      agg.reduce(b, (xx(kc._1), kc._2)))
  }
  private def xx(k: Long): Long = {
    // the engine hashes keys with xxhash64(col) (seed 42) — mirror it
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(k, org.apache.spark.sql.types.LongType, 42L)
  }

  test("CMS never underestimates and stays within εN on a zipf-ish load") {
    // zipf-ish: key k (1..2000) carries ~ 20000/k mass; N ≈ 20000·H(2000)
    val load = (1L to 2000L).map(k => k -> (20000 / k))
    val n = load.map(_._2).sum
    val sk = cmsOf(load)
    val eps = math.E / Sketches.CmsWidth
    var worst = 0L
    load.foreach { case (k, c) =>
      val est = Sketches.cmsEstimate(sk, xx(k))
      assert(est >= c, s"UNDERESTIMATE at key $k: $est < $c")
      worst = math.max(worst, est - c)
    }
    // the ε·N bound holds per row with prob 1−1/e; min over 4 rows
    // makes a breach on this fixed hash set practically impossible
    assert(worst <= (eps * n).toLong + 1,
      s"worst overestimate $worst vs eps*N = ${(eps * n).toLong}")
  }

  test("CMS build(A ∪ B) equals elementwise merge of shard sketches exactly") {
    val a = (1L to 3000L).map(k => k -> 3L)
    val b = (2000L to 5000L).map(k => k -> 7L)
    val agg = new Sketches.CmsBuild
    val merged = agg.merge(cmsOf(a), cmsOf(b))
    val direct = cmsOf((a ++ b).groupBy(_._1).toSeq
      .map { case (k, vs) => k -> vs.map(_._2).sum })
    assert(java.util.Arrays.equals(merged, direct))
    // weighted reduce ≡ unit-count replay: one (k, c) row is c inserts
    val unitReplay = cmsOf(Seq.fill(5)(42L -> 1L))
    assert(java.util.Arrays.equals(unitReplay, cmsOf(Seq(42L -> 5L))))
  }

  test("cmsKeyCounts end-to-end: estimates dominate the exact counts") {
    val ev = (1L to 5000L).map(i => ("u" + (i % 97), i))
      .toDF("user_id", "event_id")
    val probes = (0 until 97).map(i => "u" + i).toDF("user_id")
    val est = Sketches.cmsKeyCounts(ev, "user_id", probes).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_count")).toMap
    val exact = ev.groupBy("user_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c && est(k) <= c + (math.E / Sketches.CmsWidth * 5000).toLong + 1,
        s"$k: est ${est(k)} vs exact $c")
    }
  }

  test("q270/q271/q272 contracts hold and are non-vacuous at sf0.001 (r17 gates)") {
    val d = sf("sf0.001")
    val hll = Sketches.q270(spark, d).collect()
    assert(hll.nonEmpty, "no complete 7-day windows")
    assert(hll.forall(_.getBoolean(2)), "HLL estimate left the 5% band")
    val kmv = Sketches.q271(spark, d).collect()
    assert(kmv.nonEmpty && kmv.forall(_.getBoolean(3)),
      "KMV estimate left the 0.15 band")
    val cms = Sketches.q272(spark, d).collect()
    assert(cms.length == 10)
    assert(cms.forall(_.getBoolean(2)), "CMS underestimated (impossible)")
    assert(cms.forall(_.getBoolean(3)), "CMS overshot the epsilon-N bound")
  }


  test("q274 bloom guarantees: both slices present, booleans hold, FPs measurable") {
    val rows = Sketches.q274(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("fresh", "represented"))
    assert(rows.forall(_.getBoolean(2)), s"guarantee broken: ${rows.toSeq}")
    assert(rows.forall(_.getLong(1) > 0), "vacuous slice")
  }

}
