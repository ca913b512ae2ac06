package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Geo

/** Spherical tier (q249): the latitude-banded grid cut's lossless
  * contract vs the naive all-pairs join (identical polynomial layers),
  * on fixture coordinates plus handcrafted meridian-wrap and
  * band-boundary cases. */
class GeoSpec extends SparkSpec {

  import spark.implicits._

  private def naive(pts: DataFrame, radiusMeters: Double): DataFrame = {
    val k = Geo.havK(radiusMeters)
    val d = pts.select(col("id").as("id_a"), col("la"), col("lo").as("loa"))
      .crossJoin(pts.select(col("id").as("id_b"), col("la").as("lb"),
        col("lo").as("lob")))
      .filter(col("id_a") < col("id_b"))
    val l1 = Geo.havLayer1.foldLeft(d) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    val l2 = Geo.havLayer2.foldLeft(l1) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    l2.withColumn(Geo.havLayer3._1, expr(Geo.havLayer3._2))
      .filter(col("hav") <= lit(k))
      .select("id_a", "id_b", "hav")
  }

  private def key(df: DataFrame): Set[(Long, Long, Double)] = {
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // MULTISET discipline: a set compare alone would hide duplicate
    // pair emission (the nc-collapse class near the radius cap, where
    // dc offsets alias mod nc) — every engine/naive collection in this
    // suite must be duplicate-free before it is compared as a set
    assert(rows.length == rows.toSet.size,
      s"duplicate pairs emitted: ${rows.groupBy(identity).filter(_._2.length > 1).keys.take(5)}")
    rows.toSet
  }

  test("sphericalRadiusJoin == naive all-pairs on fixture coordinates") {
    // sf0.001 has only 150 customers — 150 km is vacuous here (the
    // sf0.01 oracle gate covers it with ~200 pairs); test the cut at
    // radii that yield pairs at this density
    val pts = Geo.customerPoints(spark, sf("sf0.001"))
    // 1.8/2.0 Mm sit in the nc-collapse regime (populated bands keep
    // 1–2 longitude cells), where pre-dedupe exploded keys alias
    for (r <- Seq(800000.0, 1800000.0, 2000000.0)) {
      val got = key(Geo.sphericalRadiusJoin(pts, r))
      val want = key(naive(pts, r))
      assert(got == want,
        s"r=$r: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"r=$r yields no pairs — test is vacuous")
    }
  }

  test("meridian wrap, band boundaries, polar and high-latitude pairs are lossless") {
    // lon ±180 wrap at several latitudes; band-boundary lat pairs;
    // POLE-CROSSING pairs (Δλ = 180° at 89.9° — the whole-circle
    // collapsed band); an antipodal-ish far pair that must NOT appear
    val pts = Seq(
      (1L, 0L, 179999000L), (2L, 0L, -179999000L),          // ~222 m across the seam
      (3L, 59999000L, 179990000L), (4L, 59990000L, -179990000L), // wrap near 60°
      (5L, 1349000L, 10000000L), (6L, 1351000L, 10000000L), // straddle a band edge
      (7L, -60000000L, 0L), (8L, -59900000L, 1000L),        // high-lat pair
      (9L, 30000000L, 90000000L), (10L, -30000000L, -90000000L), // far pair
      (11L, 89900000L, 0L), (12L, 89900000L, 179000000L),   // ~22 km ACROSS the pole
      (13L, -89950000L, 50000000L), (14L, -89940000L, -130000000L), // south pole
      (15L, 88600000L, -90000000L), (16L, 89990000L, 90000000L) // pole-adjacent bands
    ).toDF("id", "la", "lo")
    for (r <- Seq(25000.0, 150000.0)) {
      val got = key(Geo.sphericalRadiusJoin(pts, r))
      val want = key(naive(pts, r))
      assert(got == want,
        s"r=$r: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
    // the wrap pair must be present at 25 km (≈222 m apart), and so
    // must both pole-crossing pairs (11,12) and (13,14) — losslessness
    // at the pole is vacuous if the grid never generated them
    val at25 = key(Geo.sphericalRadiusJoin(pts, 25000.0))
    assert(at25.exists(p => p._1 == 1L && p._2 == 2L))
    assert(at25.exists(p => p._1 == 11L && p._2 == 12L), s"north-pole pair lost: $at25")
    assert(at25.exists(p => p._1 == 13L && p._2 == 14L), s"south-pole pair lost: $at25")
    // no duplicates ever
    val all = Geo.sphericalRadiusJoin(pts, 150000.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.toSet.size, s"duplicate pairs: ${all.toSeq}")
  }

  test("sphericalRadiusKnn == naive per-point rank; directed, tie-ordered, radius-bounded") {
    val pts = Geo.customerPoints(spark, sf("sf0.001"))
    val r = 1500000.0
    val k = 4
    val kThr = Geo.havK(r)
    val d = pts.select(col("id").as("id_a"), col("la"), col("lo").as("loa"))
      .crossJoin(pts.select(col("id").as("id_b"), col("la").as("lb"),
        col("lo").as("lob")))
      .filter(col("id_a") =!= col("id_b"))
    val l1 = Geo.havLayer1.foldLeft(d) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    val l2 = Geo.havLayer2.foldLeft(l1) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    val naiveKnn = l2.withColumn(Geo.havLayer3._1, expr(Geo.havLayer3._2))
      .filter(col("hav") <= lit(kThr))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id_a").orderBy(col("hav"), col("id_b"))))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("id_b"), col("hav"), col("rk").cast("long").as("rk"))
    def key(df: DataFrame) = {
      val rows = df.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
      assert(rows.length == rows.toSet.size, s"duplicate kNN rows")
      rows.toSet
    }
    val got = key(Geo.sphericalRadiusKnn(pts, r, k))
    val want = key(naiveKnn)
    assert(want.nonEmpty, "vacuous kNN fixture")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("sphericalZoneJoin == naive point × zone membership; per-zone radii; guard fires") {
    val pts = Geo.customerPoints(spark, sf("sf0.001"))
    val zones = Geo.supplierZones(spark, sf("sf0.001"))
      .union(Seq(
        (9001L, 89000000L, 170000000L, 600000.0),   // polar zone
        (9002L, -100000L, -179950000L, 1999999.0),  // dateline, near max radius
        (9003L, -52000000L, 77000000L, 100.0))      // 100 m (matches ~nothing)
        .toDF("zone_id", "zla", "zlo", "radius_m"))
    val got = {
      val rows = Geo.sphericalZoneJoin(pts, zones, 2000000.0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length == rows.toSet.size, "duplicate membership rows")
      rows.toSet
    }
    // naive: cross join through the identical layers
    val d = pts.crossJoin(zones.select(col("zone_id"),
      col("zla").as("lb"), col("zlo").as("lob"), col("radius_m")))
      .withColumn("loa", col("lo"))
    val l = (Geo.havLayer1 ++ Geo.havLayer2 :+ Geo.havLayer3) ++ Geo.kzLayers
    val want = l.foldLeft(d) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .filter(col("hav") <= col("kz"))
      .select("id", "zone_id", "hav").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "vacuous zone fixture")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // the fused radius guard fail-fasts on an out-of-contract zone
    val bad = Seq((1L, 0L, 0L, 2000001.0)).toDF("zone_id", "zla", "zlo", "radius_m")
    val e = intercept[Exception] {
      Geo.sphericalZoneJoin(pts, bad, 2000000.0).count()
    }
    assert(e.getMessage != null)
  }

  test("polynomial layers parse identically through spark.sql text") {
    // the oracle string is generated from the same layer text; make
    // sure Spark's parser accepts every generated expression
    Geo.havLayer1.foreach { case (_, e) => spark.sql(s"SELECT $e FROM (SELECT 1L AS la, 2L AS lb, 3L AS loa, 4L AS lob)").collect() }
    val base = "SELECT 0.5 AS dphih, 0.25 AS dlamh, 0.1 AS phia, 0.2 AS phib, 1 AS qa, 0 AS qb"
    Geo.havLayer2.foreach { case (_, e) => spark.sql(s"SELECT $e FROM ($base)").collect() }
  }

  test("accuracy contract: polynomial hav vs true haversine < 2e-9 up to 89.99°") {
    // the full-latitude contract (quadrant-reduced cosine): evaluate
    // the mirrored layers over handcrafted high-lat pairs and compare
    // against libm haversine — |Δhav| < 2e-9 (≈1 m at a 150 km
    // threshold) across the whole sphere, poles included
    val pairs = Seq(
      (89000000L, 10000000L, 89000000L, 95000000L),   // 89° arc
      (89990000L, 0L, 89980000L, 179000000L),          // across the pole
      (-89000000L, -170000000L, -88900000L, 170000000L),
      (61000000L, 20000000L, 60500000L, 21000000L),    // just past old 60° cap
      (45000000L, 0L, 45000001L, 1L),                  // branch boundary
      (-45000001L, 10L, 44999999L, -10L),              // both branches
      (0L, 179999999L, 0L, -180000000L),               // seam
      (90000000L, 123000000L, -90000000L, -7000000L))  // pole to pole
    val df = pairs.toDF("la", "loa", "lb", "lob")
    val l1 = Geo.havLayer1.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
    val l2 = Geo.havLayer2.foldLeft(l1) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
    val got = l2.withColumn(Geo.havLayer3._1, expr(Geo.havLayer3._2))
      .select("la", "loa", "lb", "lob", "hav").collect()
    got.foreach { r =>
      val (la, loa, lb, lob) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val rad = math.Pi / 180.0 / 1e6
      val sp = math.sin((la - lb) * rad / 2)
      val dl = (((loa - lob + 540000000L) % 360000000L) - 180000000L) * rad / 2
      val sl = math.sin(dl)
      val truth = sp * sp + math.cos(la * rad) * math.cos(lb * rad) * sl * sl
      assert(math.abs(r.getDouble(4) - truth) < 2e-9,
        s"($la,$loa)-($lb,$lob): poly=${r.getDouble(4)} true=$truth")
    }
  }

  test("speedAnomalies == naive consecutive-pair screen (havScala/kzScala)") {
    // the engine's windowed layer chain vs a driver-side recomputation
    // with the bit-identical Scala forms — every pair, both directions
    // of the predicate, on the real trajectory fixture
    val rows = Geo.eventPoints(spark, sf("sf0.001"))
      .select("user_id", "event_id", "tsu", "la", "lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      rs.sortBy(r => (r._3, r._2)).sliding(2).collect {
        case Array(p, c) =>
          val dt = c._3 - p._3
          val radius = math.min(40.0 * dt.toDouble, 20015086.0)
          val hav = Geo.havScala(c._4, c._5, p._4, p._5)
          val kz = Geo.kzScala(radius)
          (uid, c._2, dt, hav, kz)
      }.filter { case (_, _, _, hav, kz) => hav > kz }
    }.toSet
    val got = Geo.q262(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == got.toSet.size, "duplicate anomaly rows")
    assert(got.nonEmpty, "vacuous fixture: no anomalies at sf0.001")
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
    // the fixture also exercises the non-anomalous side
    val nPairs = rows.groupBy(_._1).map(_._2.length - 1).sum
    assert(got.length < nPairs, "screen flagged every pair")
  }

  test("resampleTrajectory: exact interpolation, fix hits, floor semantics, no extrapolation") {
    val pts = Seq(
      (1L, 1L, 5L, -1000L, 100L), (1L, 2L, 25L, 3000L, -500L),
      (1L, 3L, 30L, 5000L, 5000L),
      (2L, 4L, 0L, 0L, 0L), (2L, 5L, 30L, 10L, 10L),
      (3L, 6L, 0L, -10L, 0L), (3L, 7L, 30L, 0L, 0L),
      (4L, 8L, 7L, 42L, 42L)) // single mid-cell fix: empty grid, no rows
      .toDF("user_id", "event_id", "tsu", "la", "lo")
    val r = Geo.resampleTrajectory(pts, 10L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    assert(r == Set(
      (1L, 10L, 0L, -50L), (1L, 20L, 2000L, -350L), (1L, 30L, 5000L, 5000L),
      (2L, 0L, 0L, 0L), (2L, 10L, 3L, 3L), (2L, 20L, 6L, 6L),
      (2L, 30L, 10L, 10L),
      // floor (not truncate-toward-zero) on negative coordinates:
      // -10 + 10/3 → -7, not -6
      (3L, 0L, -10L, 0L), (3L, 10L, -7L, 0L), (3L, 20L, -4L, 0L),
      (3L, 30L, 0L, 0L)), s"got $r")
  }

  test("q265 == driver floor-div recompute over the sf0.001 trajectory fixture") {
    val rows = Geo.eventPoints(spark, sf("sf0.001"))
      .select("user_id", "event_id", "tsu", "la", "lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val G = 21600L
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val s = rs.sortBy(r => (r._3, r._2))
      val g0 = ((s.map(_._3).min + G - 1) / G) * G
      val g1 = (s.map(_._3).max / G) * G
      (g0 to g1 by G).flatMap { t =>
        val prevs = s.filter(_._3 <= t)
        val nexts = s.filter(_._3 > t)
        if (prevs.isEmpty) None
        else {
          val p = prevs.last
          if (p._3 == t) Some((u, t, p._4, p._5))
          else if (nexts.isEmpty) None
          else {
            val nx = nexts.head
            val den = nx._3 - p._3
            val la = Math.floorDiv((p._4 + 90000000L) * (nx._3 - t) +
              (nx._4 + 90000000L) * (t - p._3), den) - 90000000L
            val lo = Math.floorDiv((p._5 + 180000000L) * (nx._3 - t) +
              (nx._5 + 180000000L) * (t - p._3), den) - 180000000L
            Some((u, t, la, lo))
          }
        }
      }
    }.toSet
    val got = Geo.q265(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == got.toSet.size, "duplicate grid rows")
    assert(got.nonEmpty, "vacuous resample fixture")
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
  }

  test("geoHotspots == naive union-find over dense cells; lon wrap; singletons kept") {
    val res = 5000000L; val ncols = 72L; val wide = 73L; val cTot = 2592L
    val pts = Geo.customerPoints(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val cnt = pts.groupBy { case (la, lo) =>
        ((la + 90000000L) / res, (lo + 180000000L) / res) }
      .map { case (k, v) => k -> v.length.toLong }
    val n = pts.length.toLong
    val dense = cnt.filter { case (_, c) => c * cTot > 2L * n }
    assert(dense.nonEmpty, "vacuous: no dense cells at sf0.001")
    val parent = scala.collection.mutable.Map(dense.keys.map(k => k -> k).toSeq: _*)
    def find(x: (Long, Long)): (Long, Long) =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (k <- dense.keys; dr <- -1L to 1L; dc <- -1L to 1L
         if dr != 0L || dc != 0L) {
      val nb = (k._1 + dr, (((k._2 + dc) % ncols) + ncols) % ncols)
      if (dense.contains(nb)) {
        val (ra, rb) = (find(k), find(nb))
        if (ra != rb) parent(if (ra._1 * wide + ra._2 > rb._1 * wide + rb._2) ra else rb) =
          if (ra._1 * wide + ra._2 > rb._1 * wide + rb._2) rb else ra
      }
    }
    val want = dense.keys.toSeq.groupBy(find).map { case (root, ks) =>
      (ks.map(k => k._1 * wide + k._2).min,
        ks.length.toLong, ks.map(dense).sum)
    }.toSet
    val got = Geo.q264(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // at this density most clusters are singletons AND some merge
    assert(want.exists(_._2 == 1L) && want.exists(_._2 > 1L),
      "fixture exercises only one cluster shape")
  }

  test("geoHotspots: a 60-cell corridor stays ONE cluster (star CC, r17 ADVICE)") {
    import spark.implicits._
    // one point per cell -> every cell is dense (1 * 2592 > 2 * 60);
    // the corridor's adjacency graph has diameter 59, which min-label
    // propagation at maxIter = 20 would SILENTLY split into several
    // clusters -- the star-contraction form converges in ~log rounds
    val res = 5000000L
    val pts = (0 until 60)
      .map(i => (0L, -180000000L + i * res + res / 2))
      .toDF("la", "lo")
    val got = Geo.geoHotspots(pts, res, 2L).collect()
    assert(got.length == 1, s"corridor split into ${got.length} clusters")
    assert(got.head.getLong(1) == 60L && got.head.getLong(2) == 60L)
  }

}
