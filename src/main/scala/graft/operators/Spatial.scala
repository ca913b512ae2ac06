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
