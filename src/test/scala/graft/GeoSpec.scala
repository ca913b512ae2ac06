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

  private def key(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("sphericalRadiusJoin == naive all-pairs on fixture coordinates") {
    // sf0.001 has only 150 customers — 150 km is vacuous here (the
    // sf0.01 oracle gate covers it with ~200 pairs); test the cut at
    // radii that yield pairs at this density
    val pts = Geo.customerPoints(spark, sf("sf0.001"))
    for (r <- Seq(800000.0, 1800000.0)) {
      val got = key(Geo.sphericalRadiusJoin(pts, r))
      val want = key(naive(pts, r))
      assert(got == want,
        s"r=$r: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"r=$r yields no pairs — test is vacuous")
    }
  }

  test("meridian wrap, band boundaries, and high-latitude pairs are lossless") {
    // lon ±180 wrap at several latitudes; band-boundary lat pairs;
    // a 60°-edge pair where the Δλ bound is widest; an antipodal-ish
    // far pair that must NOT appear
    val pts = Seq(
      (1L, 0L, 179999000L), (2L, 0L, -179999000L),          // ~222 m across the seam
      (3L, 59999000L, 179990000L), (4L, 59990000L, -179990000L), // wrap near 60°
      (5L, 1349000L, 10000000L), (6L, 1351000L, 10000000L), // straddle a band edge
      (7L, -60000000L, 0L), (8L, -59900000L, 1000L),        // south edge pair
      (9L, 30000000L, 90000000L), (10L, -30000000L, -90000000L) // far pair
    ).toDF("id", "la", "lo")
    for (r <- Seq(25000.0, 150000.0)) {
      val got = key(Geo.sphericalRadiusJoin(pts, r))
      val want = key(naive(pts, r))
      assert(got == want,
        s"r=$r: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
    // the wrap pair must be present at 25 km (≈222 m apart)
    assert(key(Geo.sphericalRadiusJoin(pts, 25000.0)).exists(p => p._1 == 1L && p._2 == 2L))
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
    def key(df: DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    val got = key(Geo.sphericalRadiusKnn(pts, r, k))
    val want = key(naiveKnn)
    assert(want.nonEmpty, "vacuous kNN fixture")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("polynomial layers parse identically through spark.sql text") {
    // the oracle string is generated from the same layer text; make
    // sure Spark's parser accepts every generated expression
    Geo.havLayer1.foreach { case (_, e) => spark.sql(s"SELECT $e FROM (SELECT 1L AS la, 2L AS lb, 3L AS loa, 4L AS lob)").collect() }
    val base = "SELECT 0.5 AS dphih, 0.25 AS dlamh, 0.1 AS phia, 0.2 AS phib"
    Geo.havLayer2.foreach { case (_, e) => spark.sql(s"SELECT $e FROM ($base)").collect() }
  }
}
