package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Spatial tier: the radius (neighbor) join — "every pair of points
  * within distance r" — the workhorse behind geofencing, store-
  * catchment overlap, sensor clustering, and dedup-by-location. The
  * reference has no spatial surface; this is the engine's 2-D
  * generalization of the 1-D band join (q237: interval containment)
  * and the same candidate-generation doctrine as the set-similarity
  * tier: NEVER all-pairs — a grid cut first, an exact verify second.
  *
  * Determinism doctrine: coordinates are INTEGER centi-units and the
  * distance test is pure BIGINT arithmetic ((Δx)² + (Δy)² ≤ r² — no
  * sqrt, no float anywhere), so both engines compare identical exact
  * integers (coords ≤ 10⁵ ⇒ squared sums < 2·10¹⁰ ≪ 2⁶³). */
object Spatial {

  /** Grid-bucketed radius self-join over integer points (id, xi, yi):
    * all ORDERED pairs (id_a < id_b) with (Δx)² + (Δy)² ≤ radius².
    *
    * LOSSLESS grid cut: points land in radius-sized cells
    * (cx, cy) = (xi div r, yi div r); any pair within r differs by
    * ≤ 1 in each cell axis, so candidates are the 3×3 neighborhood
    * join — one side explodes its 9 neighbor cells, the join is a
    * plain equi-join on the cell key, and each qualifying pair is
    * generated EXACTLY once (at the unique (dx, dy) = cell delta —
    * no distinct needed). Verification is the exact integer test.
    *
    * Scale: the only shuffle is the cell-key equi-join (9× the point
    * count on one side — rows of four longs); per-cell fanout is
    * density-bounded (n·r²/area per cell), never n²; skewed hotspots
    * are AQE's skew-join case like any other equi-join. The naive
    * all-pairs contrast at 15 k points is 1.1·10⁸ comparisons — the
    * oracle runs THAT, the engine must reproduce it row-for-row. */
  def gridNeighborJoin(points: DataFrame, radius: Long): DataFrame = {
    require(radius > 0, s"radius=$radius must be positive")
    val cells = points.select(
      col("id").cast("long").as("id"),
      col("xi").cast("long").as("xi"),
      col("yi").cast("long").as("yi"),
      expr(s"CAST(xi DIV $radius AS BIGINT)").as("cx"),
      expr(s"CAST(yi DIV $radius AS BIGINT)").as("cy"))
    val nbr = Seq(-1, 0, 1)
    val aExp = cells
      .select(col("id").as("id_a"), col("xi").as("xa"), col("yi").as("ya"),
        col("cx"), col("cy"))
      .withColumn("d", explode(array(
        (for (dx <- nbr; dy <- nbr)
          yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("d.dx")).as("jcx"), (col("cy") + col("d.dy")).as("jcy"))
    val b = cells.select(col("id").as("id_b"), col("xi").as("xb"),
      col("yi").as("yb"), col("cx").as("bcx"), col("cy").as("bcy"))
    aExp.join(b,
        col("jcx") === col("bcx") && col("jcy") === col("bcy") &&
          col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= radius * radius)
      .select("id_a", "id_b", "xa", "ya", "xb", "yb", "dist2")
  }

  /** Radius-bounded k-nearest-neighbor join: for EVERY point, its k
    * nearest neighbors among those within `radius`, ranked by the
    * TOTAL order (dist2, id_b) — the bounded form every production
    * spatial serving layer actually runs (unbounded kNN needs
    * expanding-ring search with data-dependent termination; bounding
    * the radius makes the grid cut lossless and the per-point state
    * k-sized). DIRECTED pairs — (a → b) and (b → a) rank
    * independently; a point with no neighbor inside r emits nothing
    * (the caller left-joins if absence matters).
    *
    * Plan: [[gridNeighborJoin]]'s 3×3 candidate machinery without the
    * ordered-pair cut, then a per-point window rank — partitioned on
    * id_a (never low-cardinality), state bounded by the in-radius
    * neighbor count. Tie policy (equal dist2 → smaller id_b first) is
    * explicit on both engines. */
  def radiusKnn(points: DataFrame, radius: Long, k: Int): DataFrame = {
    require(radius > 0 && k > 0, s"radius=$radius, k=$k must be positive")
    val cells = points.select(
      col("id").cast("long").as("id"),
      col("xi").cast("long").as("xi"),
      col("yi").cast("long").as("yi"),
      expr(s"CAST(xi DIV $radius AS BIGINT)").as("cx"),
      expr(s"CAST(yi DIV $radius AS BIGINT)").as("cy"))
    val nbr = Seq(-1, 0, 1)
    val aExp = cells
      .select(col("id").as("id_a"), col("xi").as("xa"), col("yi").as("ya"),
        col("cx"), col("cy"))
      .withColumn("d", explode(array(
        (for (dx <- nbr; dy <- nbr)
          yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("d.dx")).as("jcx"), (col("cy") + col("d.dy")).as("jcy"))
    val b = cells.select(col("id").as("id_b"), col("xi").as("xb"),
      col("yi").as("yb"), col("cx").as("bcx"), col("cy").as("bcy"))
    aExp.join(b,
        col("jcx") === col("bcx") && col("jcy") === col("bcy") &&
          col("id_a") =!= col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= radius * radius)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id_a").orderBy(col("dist2"), col("id_b"))))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("id_b"), col("dist2"),
        col("rk").cast("long").as("rk"))
  }

  /** Q247 — 5-nearest neighbors within r = 3 000 per customer point
    * (same md5 coordinate derivation as q246). */
  def q247(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("c_custkey").cast("string"))
    val pts = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(100000L)).as("xi"),
      pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(100000L)).as("yi"))
    radiusKnn(pts, 3000L, 5).orderBy("id_a", "rk")
  }

  /** Demo polygon geofences in the 100 000² centi-unit space —
    * a convex pentagon, a CONCAVE C-shape (the case a bbox-only or
    * convex-only test gets wrong), a wide band, and a diamond that
    * overlaps the band (multi-membership). Shared by q250, the S39
    * polygon form, and the oracle SQL generator — one source of
    * truth for the vertex data. */
  val demoZones: Seq[(String, Seq[(Long, Long)])] = Seq(
    "pent" -> Seq((25000L, 40000L), (39000L, 30000L), (34000L, 12000L),
      (16000L, 12000L), (11000L, 30000L)),
    "hook" -> Seq((55000L, 10000L), (90000L, 10000L), (90000L, 45000L),
      (55000L, 45000L), (55000L, 35000L), (80000L, 35000L),
      (80000L, 20000L), (55000L, 20000L)),
    "band" -> Seq((5000L, 70000L), (95000L, 70000L), (95000L, 85000L),
      (5000L, 85000L)),
    "diamond" -> Seq((50000L, 50000L), (62000L, 62000L), (50000L, 74000L),
      (38000L, 62000L)))

  /** The integer ray-cast crossing test as expression pieces over
    * point columns (xi, yi) and edge columns (x1, y1, x2, y2): the
    * upward half-open straddle rule ((y1 ≤ yp) ≠ (y2 ≤ yp)) plus a
    * sign-matched BIGINT cross product decides whether the +x ray
    * from the point crosses the edge — zero float anywhere (the q246
    * doctrine; coords ≤ 1e5 ⇒ |cross| < 4·10¹⁰ ≪ 2⁶³), so both
    * engines compare identical exact integers and boundary points
    * resolve identically by arithmetic, not by epsilon. */
  private def crossingCol: org.apache.spark.sql.Column = {
    val cross = (col("x2") - col("x1")) * (col("yi") - col("y1")) -
      (col("xi") - col("x1")) * (col("y2") - col("y1"))
    val straddle = (col("y1") <= col("yi")) =!= (col("y2") <= col("yi"))
    straddle && ((col("y2") > col("y1") && cross > 0) ||
      (col("y2") < col("y1") && cross < 0))
  }

  /** Point-in-polygon zone resolution — integer ray-cast membership
    * of points (id, xi, yi) in polygon zones (closed rings, vertices
    * in order; concave and mutually overlapping zones allowed).
    * Output: one row per (point, containing zone) with the crossing
    * count. Points on a boundary resolve by the half-open rule —
    * deterministic on both engines because the test is exact BIGINT.
    *
    * Plan: the edge table (zone bbox attached to every edge) is a
    * broadcast; the bbox containment condition cuts the nested-loop
    * fanout to points-near-zones, and is LOSSLESS — a point outside
    * a zone's bbox has an even (usually zero) crossing count, never
    * odd, so the filtered groups were never members. The groupBy
    * (id, zone) partial-aggregates map-side; per-group state is one
    * running sum. A deployment with thousands of polygons would bucket
    * edges by the q246 grid first; for O(10) geofences the broadcast
    * IS the grid's degenerate case. */
  def pointInPolygon(points: DataFrame,
      zones: Seq[(String, Seq[(Long, Long)])]): DataFrame = {
    require(zones.nonEmpty && zones.forall(_._2.size >= 3),
      "each zone needs >= 3 vertices")
    val spark = points.sparkSession
    import spark.implicits._
    val edges = zones.flatMap { case (z, vs) =>
      val xs = vs.map(_._1); val ys = vs.map(_._2)
      (vs zip (vs.tail :+ vs.head)).map { case ((x1, y1), (x2, y2)) =>
        (z, x1, y1, x2, y2, xs.min, xs.max, ys.min, ys.max) }
    }.toDF("zone", "x1", "y1", "x2", "y2", "bxlo", "bxhi", "bylo", "byhi")
    points.select(col("id").cast("long").as("id"),
        col("xi").cast("long").as("xi"), col("yi").cast("long").as("yi"))
      .join(broadcast(edges),
        col("xi") >= col("bxlo") && col("xi") <= col("bxhi") &&
        col("yi") >= col("bylo") && col("yi") <= col("byhi"))
      .withColumn("cr", when(crossingCol, 1L).otherwise(0L))
      .groupBy(col("id"), col("zone"))
      .agg(sum("cr").as("n_cross"))
      .filter(col("n_cross") % 2 === 1)
  }

  /** Zone-resolution COLUMN over literal polygon zones — the narrow
    * no-join map form the S39 streaming hot path needs (the q237
    * band-dimension doctrine): first containing zone in list order
    * wins, no match = "outside". Compiles to a nested CASE over exact
    * BIGINT arithmetic. */
  def polyZoneExpr(zones: Seq[(String, Seq[(Long, Long)])])
      : org.apache.spark.sql.Column = {
    def inside(vs: Seq[(Long, Long)]): org.apache.spark.sql.Column = {
      val n = (vs zip (vs.tail :+ vs.head)).map { case ((x1, y1), (x2, y2)) =>
        val cross = (lit(x2) - x1) * (col("yi") - y1) -
          (col("xi") - x1) * (lit(y2) - y1)
        val straddle = (lit(y1) <= col("yi")) =!= (lit(y2) <= col("yi"))
        when(straddle && ((lit(y2) > y1 && cross > 0) ||
          (lit(y2) < y1 && cross < 0)), 1L).otherwise(0L)
      }.reduce(_ + _)
      n % 2 === 1
    }
    zones.foldRight(lit("outside")) { case ((name, vs), rest) =>
      when(inside(vs), lit(name)).otherwise(rest)
    }
  }

  /** Q250 — point-in-polygon membership under the ORACLE gate:
    * customers at the q246 md5 coordinates against [[demoZones]];
    * the oracle is the naive per-(point, edge) crossing SQL over the
    * same vertex data. */
  def q250(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("c_custkey").cast("string"))
    val pts = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(100000L)).as("xi"),
      pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(100000L)).as("yi"))
    pointInPolygon(pts, demoZones).orderBy("id", "zone")
  }

  /** The q250 oracle SQL, generated from the SAME vertex data the
    * engine compiles. */
  def q250OracleSql: String = {
    val values = demoZones.flatMap { case (z, vs) =>
      (vs zip (vs.tail :+ vs.head)).map { case ((x1, y1), (x2, y2)) =>
        s"('$z', $x1, $y1, $x2, $y2)" }
    }.mkString(", ")
    "WITH p AS (SELECT CAST(c_custkey AS BIGINT) AS id, " +
      "CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100000 AS xi, " +
      "CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)) AS BIGINT) % 100000 AS yi FROM customer), " +
      s"e AS (SELECT * FROM (VALUES $values) AS t(zone, x1, y1, x2, y2)), " +
      "c AS (SELECT p.id, e.zone, CASE WHEN ((e.y1 <= p.yi) != (e.y2 <= p.yi)) " +
      "AND (((e.y2 > e.y1) AND ((e.x2 - e.x1) * (p.yi - e.y1) - (p.xi - e.x1) * (e.y2 - e.y1) > 0)) " +
      "OR ((e.y2 < e.y1) AND ((e.x2 - e.x1) * (p.yi - e.y1) - (p.xi - e.x1) * (e.y2 - e.y1) < 0))) " +
      "THEN 1 ELSE 0 END AS cr FROM p, e), " +
      "g AS (SELECT id, zone, CAST(SUM(cr) AS BIGINT) AS n_cross FROM c GROUP BY id, zone) " +
      "SELECT id, zone, n_cross FROM g WHERE n_cross % 2 = 1 ORDER BY id, zone"
  }

  /** ZONE-SCALE point-in-polygon (r16): polygon zones as DATA — the
    * polygon sibling of [[graft.operators.Geo.sphericalZoneJoin]] and
    * the implemented cutover past [[pointInPolygon]]'s broadcast edge
    * table / [[polyZoneExpr]]'s literal CASE, both of which grow the
    * PLAN with the zone list. Here zones arrive as a vertex frame
    * (zone_id, seq, xi, yi — ring order, auto-closed), the zone count
    * is data, and the plan is constant:
    *
    *  - rings assemble per zone (array_sort over collected (seq, x, y)
    *    structs; per-group state = vertex count), fail-fast on < 3
    *    vertices with the guard fused into the frame both consumers
    *    read (the q256 doctrine);
    *  - each zone registers in every grid cell its bbox covers
    *    (fanout = bbox area / cell² — pick `cellSize` near the median
    *    zone diameter); each point sits in ONE cell, so a candidate
    *    (point, zone) pair is generated at most once, no dedup;
    *  - the lossless bbox cut drops far candidates before the edge
    *    join; the exact-BIGINT crossing test ([[crossingCol]] — the
    *    identical text q250 gates) aggregates map-side per
    *    (point, zone); odd crossings = member.
    *
    * Truncating DIV on both the bbox span and the point cell keeps
    * negative coordinates consistent (same rounding both sides;
    * the straddling-zero cell is merely coarser, never lossy). */
  def polyZoneJoin(points: DataFrame, vertices: DataFrame,
      cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize=$cellSize must be positive")
    val spark = points.sparkSession
    import spark.implicits._
    val ring = vertices.select(col("zone_id").cast("long").as("zone_id"),
        col("seq").cast("int").as("seq"),
        col("xi").cast("long").as("xi"), col("yi").cast("long").as("yi"))
      .groupBy("zone_id")
      .agg(array_sort(collect_list(
        struct(col("seq"), col("xi"), col("yi")))).as("vs0"))
      .withColumn("nv", size(col("vs0")))
      .withColumn("vs", when(col("nv") >= 3, col("vs0"))
        .otherwise(raise_error(concat(
          lit("polyZoneJoin: zone needs >= 3 vertices, got "),
          col("nv").cast("string")))))
      .localCheckpoint(true) // multi-consumer: edges + bbox cells
    val edges = ring.select(col("zone_id"),
        explode(zip_with(col("vs"),
          concat(expr("slice(vs, 2, nv - 1)"), expr("slice(vs, 1, 1)")),
          (a, b) => struct(a.getField("xi").as("x1"), a.getField("yi").as("y1"),
            b.getField("xi").as("x2"), b.getField("yi").as("y2")))).as("e"))
      .select(col("zone_id"), col("e.x1"), col("e.y1"),
        col("e.x2"), col("e.y2"))
    val zcells = ring.select(col("zone_id"),
        expr("array_min(transform(vs, v -> v.xi))").as("bxlo"),
        expr("array_max(transform(vs, v -> v.xi))").as("bxhi"),
        expr("array_min(transform(vs, v -> v.yi))").as("bylo"),
        expr("array_max(transform(vs, v -> v.yi))").as("byhi"))
      .withColumn("cx", explode(sequence(
        expr(s"bxlo DIV $cellSize"), expr(s"bxhi DIV $cellSize"))))
      .withColumn("cy", explode(sequence(
        expr(s"bylo DIV $cellSize"), expr(s"byhi DIV $cellSize"))))
    val p = points.select(col("id").cast("long").as("id"),
        col("xi").cast("long").as("xi"), col("yi").cast("long").as("yi"))
      .withColumn("cx", expr(s"xi DIV $cellSize"))
      .withColumn("cy", expr(s"yi DIV $cellSize"))
    val cand = p.join(zcells.hint("SHUFFLE_HASH"), Seq("cx", "cy"))
      .filter(col("xi") >= col("bxlo") && col("xi") <= col("bxhi") &&
        col("yi") >= col("bylo") && col("yi") <= col("byhi"))
      .select("id", "xi", "yi", "zone_id")
    cand.join(edges, Seq("zone_id"))
      .withColumn("cr", when(crossingCol, 1L).otherwise(0L))
      .groupBy("id", "zone_id")
      .agg(sum("cr").as("n_cross"))
      .filter(col("n_cross") % 2 === 1)
  }

  /** The q266 zone derivation: suppliers mapped to deterministic
    * DIAMOND polygons (center from two md5 slices, four arm lengths
    * in [500, 5500] from four more — always simple rings; the generic
    * ray-cast machinery is concavity-tested in SpatialSpec). */
  def supplierDiamonds(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("s_suppkey").cast("string"))
    def hx(a: Int, n: Int) = conv(substring(h, a, n), 16, 10).cast("long")
    Tables.supplier(s, d).select(
        col("s_suppkey").cast("long").as("zone_id"),
        pmod(hx(1, 8), lit(100000L)).as("cx"),
        pmod(hx(9, 8), lit(100000L)).as("cy"),
        (pmod(hx(17, 4), lit(5001L)) + 500L).as("ra"),
        (pmod(hx(21, 4), lit(5001L)) + 500L).as("rb"),
        (pmod(hx(25, 4), lit(5001L)) + 500L).as("rc"),
        (pmod(hx(29, 4), lit(5001L)) + 500L).as("rd"))
      .select(col("zone_id"), posexplode(array(
        struct((col("cx") + col("ra")).as("xi"), col("cy").as("yi")),
        struct(col("cx").as("xi"), (col("cy") + col("rb")).as("yi")),
        struct((col("cx") - col("rc")).as("xi"), col("cy").as("yi")),
        struct(col("cx").as("xi"), (col("cy") - col("rd")).as("yi"))))
        .as(Seq("seq", "v")))
      .select(col("zone_id"), col("seq"), col("v.xi"), col("v.yi"))
  }

  /** Q266 — zone-scale point-in-polygon under the ORACLE gate:
    * the q246 customer points against supplier diamond zones through
    * the cell grid; oracle = naive point × edge cross join over the
    * identical derivations. */
  def q266(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("c_custkey").cast("string"))
    val pts = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(100000L)).as("xi"),
      pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(100000L)).as("yi"))
    polyZoneJoin(pts, supplierDiamonds(s, d), 4000L)
      .orderBy("id", "zone_id")
  }

  def q266OracleSql: String = {
    def hx(a: Int, n: Int) =
      s"CAST(CONCAT('0x', substr(md5(CAST(s_suppkey AS VARCHAR)), $a, $n)) AS BIGINT)"
    val cross = "(e.x2 - e.x1) * (p.yi - e.y1) - (p.xi - e.x1) * (e.y2 - e.y1)"
    "WITH p AS (SELECT CAST(c_custkey AS BIGINT) AS id, " +
      "CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100000 AS xi, " +
      "CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)) AS BIGINT) % 100000 AS yi FROM customer), " +
      "z AS (SELECT CAST(s_suppkey AS BIGINT) AS zone_id, " +
      s"${hx(1, 8)} % 100000 AS cx, ${hx(9, 8)} % 100000 AS cy, " +
      s"${hx(17, 4)} % 5001 + 500 AS ra, ${hx(21, 4)} % 5001 + 500 AS rb, " +
      s"${hx(25, 4)} % 5001 + 500 AS rc, ${hx(29, 4)} % 5001 + 500 AS rd " +
      "FROM supplier), " +
      "e AS (SELECT zone_id, cx + ra AS x1, cy AS y1, cx AS x2, cy + rb AS y2 FROM z " +
      "UNION ALL SELECT zone_id, cx, cy + rb, cx - rc, cy FROM z " +
      "UNION ALL SELECT zone_id, cx - rc, cy, cx, cy - rd FROM z " +
      "UNION ALL SELECT zone_id, cx, cy - rd, cx + ra, cy FROM z), " +
      "c AS (SELECT p.id, e.zone_id, CASE WHEN ((e.y1 <= p.yi) != (e.y2 <= p.yi)) " +
      s"AND (((e.y2 > e.y1) AND ($cross > 0)) " +
      s"OR ((e.y2 < e.y1) AND ($cross < 0))) " +
      "THEN 1 ELSE 0 END AS cr FROM p, e), " +
      "g AS (SELECT id, zone_id, CAST(SUM(cr) AS BIGINT) AS n_cross FROM c GROUP BY id, zone_id) " +
      "SELECT id, zone_id, n_cross FROM g WHERE n_cross % 2 = 1 ORDER BY id, zone_id"
  }

  /** Q246 — radius join under the ORACLE gate: customers mapped to
    * deterministic integer coordinates in a 100 000² centi-unit space
    * via two independent md5 slices (the q42/q142 cross-engine hash
    * idiom — a multiplicative congruence was tried first and put
    * every point on a sparse 1-D lattice: ZERO close pairs, a vacuous
    * gate), all pairs within r = 2 000 (20.00 units). The oracle is
    * the NAIVE all-pairs cross join — the grid plan must reproduce it
    * exactly. */
  def q246(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("c_custkey").cast("string"))
    val pts = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(100000L)).as("xi"),
      pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(100000L)).as("yi"))
    gridNeighborJoin(pts, 2000L).orderBy("id_a", "id_b")
  }
}
