package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Spatial tier (q246): the grid-bucketed radius join's lossless-cut
  * contract, pinned against the naive all-pairs join on real fixture
  * coordinates plus handcrafted cell-boundary cases. */
class SpatialSpec extends SparkSpec {

  import spark.implicits._

  test("gridNeighborJoin == naive all-pairs on fixture coordinates") {
    val h = md5(col("c_custkey").cast("string"))
    val pts = graft.sources.Tables.customer(spark, sf("sf0.001")).select(
      col("c_custkey").cast("long").as("id"),
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(100000L)).as("xi"),
      pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(100000L)).as("yi"))
    def naive(r: Long) = pts.as("a").join(pts.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist2",
        (col("a.xi") - col("b.xi")) * (col("a.xi") - col("b.xi")) +
        (col("a.yi") - col("b.yi")) * (col("a.yi") - col("b.yi")))
      .filter(col("dist2") <= r * r)
      .select(col("a.id"), col("b.id"), col("dist2"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (r <- Seq(2000L, 8000L)) {
      val got = key(graft.operators.Spatial.gridNeighborJoin(pts, r)
        .select("id_a", "id_b", "dist2"))
      val want = key(naive(r))
      assert(got == want, s"r=$r: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"r=$r yields no pairs — test is vacuous")
    }
  }

  test("radiusKnn == naive per-point rank; directed, tie-ordered, radius-bounded") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 4L),   // 1-2 d2=9, 1-3 d2=16, 2-3 d2=25
      (4L, 0L, 5L),                                // ties: 4-3 d2=1; 4-1 d2=25 == 4-2? (3,5)->9+25=34 no
      (5L, 1000L, 1000L)                           // isolated: no neighbor in r
    ).toDF("id", "xi", "yi")
    val got = graft.operators.Spatial.radiusKnn(pts, 10L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-point 2 nearest within r=10 (d2 <= 100), tie (dist2, id_b)
    val expect = Set(
      (1L, 2L, 9L, 1L), (1L, 3L, 16L, 2L),
      (2L, 1L, 9L, 1L), (2L, 3L, 25L, 2L),
      (3L, 4L, 1L, 1L), (3L, 1L, 16L, 2L),
      (4L, 3L, 1L, 1L), (4L, 1L, 25L, 2L))
    assert(got.toSet == expect, s"got ${got.toSeq.sorted}")
    assert(!got.exists(_._1 == 5L), "isolated point must emit nothing")
    // equal-dist tie: two neighbors at the same d2 rank by id_b
    val tie = Seq((10L, 0L, 0L), (11L, 5L, 0L), (12L, 0L, 5L)).toDF("id", "xi", "yi")
    val t = graft.operators.Spatial.radiusKnn(tie, 10L, 2)
      .filter(col("id_a") === 10L).orderBy("rk")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(t.toSeq == Seq((11L, 1L), (12L, 2L)), s"tie: ${t.toSeq}")
  }

  test("pointInPolygon == independent Scala ray-cast on fixture coordinates") {
    // independent oracle: the same half-open rule implemented directly
    def naiveInside(xp: Long, yp: Long, vs: Seq[(Long, Long)]): Boolean = {
      val edges = vs zip (vs.tail :+ vs.head)
      val n = edges.count { case ((x1, y1), (x2, y2)) =>
        val straddle = (y1 <= yp) != (y2 <= yp)
        val cross = (x2 - x1) * (yp - y1) - (xp - x1) * (y2 - y1)
        straddle && ((y2 > y1 && cross > 0) || (y2 < y1 && cross < 0))
      }
      n % 2 == 1
    }
    val h = md5(col("c_custkey").cast("string"))
    val pts = graft.sources.Tables.customer(spark, sf("sf0.001")).select(
      col("c_custkey").cast("long").as("id"),
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(100000L)).as("xi"),
      pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(100000L)).as("yi"))
    val raw = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (id, x, y) <- raw
      (z, vs) <- graft.operators.Spatial.demoZones
      if naiveInside(x, y, vs)
    } yield (id, z)).toSet
    val got = graft.operators.Spatial.pointInPolygon(pts,
        graft.operators.Spatial.demoZones)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "no fixture point inside any zone — vacuous")
  }

  test("pointInPolygon: concavity, boundary, multi-membership, vertex cases") {
    import graft.operators.Spatial
    val zones = Spatial.demoZones
    val pts = Seq(
      (1L, 70000L, 27000L),  // inside hook's NOTCH -> NOT in hook
      (2L, 70000L, 15000L),  // hook's lower bar -> in hook
      (3L, 85000L, 27000L),  // hook's spine (right bar) -> in hook
      (4L, 25000L, 25000L),  // pentagon center
      (5L, 50000L, 71000L),  // diamond AND band overlap region
      (6L, 5000L, 70000L),   // band's SW corner vertex (half-open rule)
      (7L, 50000L, 70000L),  // band's bottom edge AND inside diamond
      (8L, 99000L, 99000L)   // outside everything
    ).toDF("id", "xi", "yi")
    val got = Spatial.pointInPolygon(pts, zones)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!got.contains((1L, "hook")), "notch point must be outside the C")
    assert(got.contains((2L, "hook")) && got.contains((3L, "hook")))
    assert(got.contains((4L, "pent")))
    assert(got.contains((5L, "diamond")) && got.contains((5L, "band")),
      s"overlap point must be in both: $got")
    assert(!got.exists(_._1 == 8L))
    // boundary points: don't pin which side the half-open rule lands on,
    // pin that engine and the independent Scala rule AGREE
    def naiveInside(xp: Long, yp: Long, vs: Seq[(Long, Long)]): Boolean = {
      val n = (vs zip (vs.tail :+ vs.head)).count { case ((x1, y1), (x2, y2)) =>
        ((y1 <= yp) != (y2 <= yp)) && {
          val cross = (x2 - x1) * (yp - y1) - (xp - x1) * (y2 - y1)
          (y2 > y1 && cross > 0) || (y2 < y1 && cross < 0)
        }
      }
      n % 2 == 1
    }
    for (id <- Seq(6L, 7L); (z, vs) <- zones) {
      val (x, y) = Seq((6L, (5000L, 70000L)), (7L, (50000L, 70000L)))
        .toMap.apply(id)
      assert(got.contains((id, z)) == naiveInside(x, y, vs),
        s"boundary point $id vs zone $z disagrees with the naive rule")
    }
  }

  test("polyZoneExpr resolves first containing zone in list order") {
    import graft.operators.Spatial
    val df = Seq((50000L, 71000L), (25000L, 25000L), (1L, 1L))
      .toDF("xi", "yi")
      .withColumn("zone", Spatial.polyZoneExpr(Spatial.demoZones))
    val zs = df.collect().map(_.getString(2)).toSeq
    // (50000,71000) is in band AND diamond; band comes later in the
    // list than diamond? demoZones order: pent, hook, band, diamond ->
    // band wins (first containing in list order)
    assert(zs == Seq("band", "pent", "outside"), s"got $zs")
  }

  test("gridNeighborJoin: cell-boundary pairs are found exactly once") {
    // points straddling cell boundaries at every 3x3 neighbor offset
    // (r=10: cells are 10 wide; (9,9)-(10,10) cross the corner) plus a
    // pair at EXACTLY distance r (inclusive bound) and one just past it
    val pts = Seq(
      (1L, 9L, 9L), (2L, 10L, 10L),   // corner-crossing, dist2=2
      (3L, 19L, 5L), (4L, 21L, 5L),   // x-boundary, dist2=4
      (5L, 40L, 40L), (6L, 40L, 50L), // exactly r apart -> included
      (7L, 70L, 70L), (8L, 70L, 81L)  // r+1 apart -> excluded
    ).toDF("id", "xi", "yi")
    val got = graft.operators.Spatial.gridNeighborJoin(pts, 10L)
      .select("id_a", "id_b", "dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set((1L, 2L, 2L), (3L, 4L, 4L), (5L, 6L, 100L)),
      s"got ${got.toSeq}")
  }

  test("polyZoneJoin == literal pointInPolygon on the fixture; generic ring machinery agrees") {
    import spark.implicits._
    val d = sf("sf0.001")
    val h = org.apache.spark.sql.functions.md5(col("c_custkey").cast("string"))
    val pts = graft.sources.Tables.customer(spark, d).select(
      col("c_custkey").cast("long").as("id"),
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(h, 1, 8), 16, 10)
          .cast("long"), lit(100000L)).as("xi"),
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(h, 9, 8), 16, 10)
          .cast("long"), lit(100000L)).as("yi"))
    val verts = Spatial.supplierDiamonds(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val literal = verts.groupBy(_._1).toSeq.map { case (z, vs) =>
      (z.toString, vs.sortBy(_._2).map(v => (v._3, v._4)).toSeq)
    }
    val want = Spatial.pointInPolygon(pts, literal).collect()
      .map(r => (r.getLong(0), r.getString(1).toLong, r.getLong(2))).toSet
    val got = Spatial.q266(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size, "duplicate membership rows")
    assert(got.nonEmpty, "vacuous polygon fixture")
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
  }

  test("polyZoneJoin: concave ring as data, cell-straddling zones, degenerate guard") {
    import spark.implicits._
    // a concave "C" shape spanning several 10-unit cells, plus a
    // second zone overlapping it — both as DATA rows
    val cShape = Seq((0L, 0L), (40L, 0L), (40L, 10L), (10L, 10L),
      (10L, 30L), (40L, 30L), (40L, 40L), (0L, 40L))
    val box = Seq((30L, 5L), (60L, 5L), (60L, 35L), (30L, 35L))
    val verts = (cShape.zipWithIndex.map { case ((x, y), i) => (1L, i, x, y) } ++
      box.zipWithIndex.map { case ((x, y), i) => (2L, i, x, y) })
      .toDF("zone_id", "seq", "xi", "yi")
    val pts = Seq((1L, 5L, 20L), (2L, 20L, 20L), (3L, 35L, 20L),
      (4L, 50L, 20L), (5L, 35L, 7L), (6L, 70L, 20L))
      .toDF("id", "xi", "yi")
    val got = Spatial.polyZoneJoin(pts, verts, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // p1 inside C's left bar; p2 in the concave NOTCH (outside); p3 in
    // the notch but inside the box; p4 box only; p5 in C's bottom bar
    // AND the box; p6 outside everything
    assert(got == Set((1L, 1L), (3L, 2L), (4L, 2L), (5L, 1L), (5L, 2L)),
      s"got $got")
    // degenerate ring fails fast through the fused guard
    val bad = Seq((9L, 0, 0L, 0L), (9L, 1, 5L, 5L)).toDF("zone_id", "seq", "xi", "yi")
    val ex = intercept[Exception] {
      Spatial.polyZoneJoin(pts, bad, 10L).collect()
    }
    assert(ex.getMessage != null)
  }
}
