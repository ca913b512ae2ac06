package graft

import org.apache.spark.sql.functions._

/** Contracts for the warehouse/robust-stats batch: SCD2 apply (q131),
  * snapshot diff (q132), RFM (q133), MAD outliers (q134), equi-depth
  * bins (q135), weighted sampling (q136). The DuckDB hash gates prove
  * fixture equivalence; these pin the semantics on frames where the
  * expected answer is enumerable by eye. */
class WarehouseSpec extends SparkSpec {

  import spark.implicits._
  import graft.operators.{Relational, Warehouse}

  // ---- q131 SCD2 ----

  private def dim(rows: (Long, String, Double)*) =
    rows.toDF("k", "seg", "bal")
      .withColumn("valid_from", lit("2026-01-01").cast("date"))

  private def upd(rows: (Long, String, Double)*) =
    rows.toDF("k", "seg", "bal")
      .withColumn("eff", lit("2026-06-01").cast("date"))

  test("scd2 closes the old version and opens the new on a real change") {
    val out = Warehouse.scd2Apply(
      dim((1L, "A", 10.0)), upd((1L, "A", 20.0)), Seq("k"), Seq("seg", "bal"))
      .orderBy("valid_from").collect()
    assert(out.length == 2)
    val Array(closed, opened) = out
    assert(closed.getAs[Double]("bal") == 10.0 &&
      !closed.getAs[Boolean]("is_current") &&
      closed.getAs[java.sql.Date]("valid_to").toString == "2026-06-01")
    assert(opened.getAs[Double]("bal") == 20.0 &&
      opened.getAs[Boolean]("is_current") &&
      opened.getAs[java.sql.Date]("valid_from").toString == "2026-06-01" &&
      opened.isNullAt(opened.fieldIndex("valid_to")))
  }

  test("scd2 drops no-op updates (idempotent redelivery) and passes through untouched keys") {
    val out = Warehouse.scd2Apply(
      dim((1L, "A", 10.0), (2L, "B", 5.0)),
      upd((1L, "A", 10.0)), // identical redelivery — must NOT grow history
      Seq("k"), Seq("seg", "bal")).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Boolean]("is_current") &&
      r.getAs[java.sql.Date]("valid_from").toString == "2026-01-01"))
  }

  test("scd2 inserts brand-new keys as current from eff") {
    val out = Warehouse.scd2Apply(
      dim((1L, "A", 10.0)), upd((9L, "Z", 1.0)), Seq("k"), Seq("seg", "bal"))
      .filter(col("k") === 9).collect()
    assert(out.length == 1 && out.head.getAs[Boolean]("is_current") &&
      out.head.getAs[java.sql.Date]("valid_from").toString == "2026-06-01")
  }

  // ---- q132 snapshot diff ----

  test("snapshot diff classifies insert/delete/update and drops unchanged") {
    val oldS = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v")
    val newS = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0))
      .toDF("k", "s", "v")
    val got = Warehouse.snapshotDiff(oldS, newS, Seq("k"), Seq("s", "v"))
      .select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "update"), (3L, "delete"), (4L, "insert")))
  }

  test("snapshot diff treats null→value as an update (null-safe compare)") {
    val oldS = Seq((1L, Option.empty[String])).toDF("k", "s")
    val newS = Seq((1L, Option("x"))).toDF("k", "s")
    val got = Warehouse.snapshotDiff(oldS, newS, Seq("k"), Seq("s")).collect()
    assert(got.length == 1 && got.head.getAs[String]("change_type") == "update")
  }

  // ---- percentile_disc parity (the q133/q134/q135 foundation) ----

  test("Spark percentile_disc matches ANSI/DuckDB element selection") {
    // DuckDB (probed): 1..10 → (3,5,8); 1..4 → (1,2,3). ANSI: smallest
    // value with cume_dist ≥ p. A drift here would break three gates.
    // (Spark returns the element as DOUBLE; the VALUE is what must
    // agree — boundaries are never emitted, only compared.)
    val ten = spark.range(1, 11).toDF("x")
    val r10 = ten.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY x)"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY x)")).collect().head
    assert((r10.getDouble(0), r10.getDouble(1), r10.getDouble(2)) == ((3.0, 5.0, 8.0)))
    val four = spark.range(1, 5).toDF("x")
    val r4 = four.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY x)"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY x)")).collect().head
    assert((r4.getDouble(0), r4.getDouble(1), r4.getDouble(2)) == ((1.0, 2.0, 3.0)))
  }

  // ---- q134 MAD ----

  test("MAD fence survives an extreme value that wrecks a z-score fence") {
    // 9 values at 10±2 plus one at 1e6: the mean/stddev fence swallows
    // everything (stddev ≈ 3e5), the median fence still flags only the
    // spike.
    val df = (Seq.tabulate(9)(i => 8.0 + (i % 5)) :+ 1e6).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("event_id", "event_type", "value")
    val out = Relational.madOutliers(df, "event_type", "value", 3.0)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(9L))
  }

  // ---- q135 equi-depth ----

  test("equi-depth bins partition all rows with near-equal depth on distinct values") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val bins = Relational.equiDepthBins(df, "grp", "v", 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("n")).sum == 100)
    assert(bins.forall(_.getAs[Long]("n") == 10)) // no ties → exact depth
    // lo/hi envelopes are disjoint and ordered
    val his = bins.map(_.getAs[Double]("hi"))
    assert(his.sameElements(his.sorted))
  }

  test("equi-depth keeps a tied value entirely in its lower bin") {
    val df = (Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0)).map(("g", _)).toDF("grp", "v")
    val bins = Relational.equiDepthBins(df, "grp", "v", 4)
      .orderBy("bin").collect()
    // boundaries are elements (1.0 or 2.0); strict > keeps each tied
    // mass in one bin → exactly two populated bins of 50
    assert(bins.map(_.getAs[Long]("n")).toSeq == Seq(50, 50))
  }

  // ---- q142 reconciliation fingerprints ----

  test("reconcile checksum is partition/order-invariant but flips on any row edit") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "g", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Relational.reconcileFingerprint(df, Seq("g"),
        Seq(col("k").cast("string"), col("v").cast("string")))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n"), r.getAs[Long]("checksum"))).toMap
    val a = fp(base)
    val b = fp(base.orderBy(col("k").desc).repartition(7)) // reshuffled copy
    assert(a == b)
    val edited = fp(Seq((1L, "a", 10L), (2L, "a", 21L), (3L, "b", 30L))
      .toDF("k", "g", "v"))
    assert(edited("b") == a("b") && edited("a") != a("a"),
      "an edit must flip exactly its group's checksum")
    // an even number of duplicated rows still changes the SUM (XOR's
    // blind spot)
    val duped = fp(base.unionAll(base.filter(col("k") === 1))
      .unionAll(base.filter(col("k") === 1)))
    assert(duped("a") != a("a"))
  }

  // ---- q162 time travel ----

  test("asOf bounds are inclusive-from, exclusive-to") {
    val hist = Seq(
      (1L, "2026-01-01", Option("2026-06-01"), false),
      (1L, "2026-06-01", Option.empty[String], true))
      .toDF("k", "f", "t", "is_current")
      .select(col("k"), col("f").cast("date").as("valid_from"),
        col("t").cast("date").as("valid_to"), col("is_current"))
    def at(d: String) = Warehouse.asOf(hist, d)
      .select("valid_from").collect().map(_.getDate(0).toString).toSeq
    assert(at("2026-01-01") == Seq("2026-01-01")) // from inclusive
    assert(at("2026-05-31") == Seq("2026-01-01"))
    assert(at("2026-06-01") == Seq("2026-06-01")) // to exclusive, next opens
    assert(at("2025-12-31").isEmpty)              // before history
  }

  // ---- q163 incremental maintenance ----

  test("incremental aggregate maintenance equals recompute and drops emptied groups") {
    val oldS = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
      .toDF("k", "g", "v")
    // new: k1 moves a→b with v 12, k3 deleted, k4 inserted in a
    val newS = Seq((1L, "b", 12.0), (2L, "a", 20.0), (4L, "a", 7.0))
      .toDF("k", "g", "v")
    val base = oldS.groupBy("g").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).as("s"))
    val diff = Warehouse.snapshotDiff(oldS, newS, Seq("k"), Seq("g", "v"))
    val got = Warehouse.incrementalAgg(base, diff,
      Seq(col("old_g")), Seq(col("new_g")),
      col("old_v").cast("decimal(18,2)"), col("new_v").cast("decimal(18,2)"),
      Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("s").doubleValue)).toMap
    val want = newS.groupBy("g").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("s").doubleValue)).toMap
    assert(got == want, s"got=$got want=$want")
    // a group whose rows all vanish must not linger at n=0
    val del = Warehouse.snapshotDiff(oldS, oldS.filter(col("g") =!= "b"),
      Seq("k"), Seq("g", "v"))
    val g2 = Warehouse.incrementalAgg(base, del,
      Seq(col("old_g")), Seq(col("new_g")),
      col("old_v").cast("decimal(18,2)"), col("new_v").cast("decimal(18,2)"),
      Seq("g")).select("g").as[String].collect().toSet
    assert(g2 == Set("a"))
  }

  // ---- q164 Jaro–Winkler ----

  test("Jaro–Winkler kernel reproduces the literature values") {
    import graft.ext.Entity.jaroWinkler
    assert(math.abs(jaroWinkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jaroWinkler("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(jaroWinkler("abc", "abc") == 1.0)
    assert(jaroWinkler("abc", "xyz") == 0.0)
    assert(jaroWinkler("", "abc") == 0.0)
  }

  // ---- q157 Benford ----

  test("Benford digit extraction spans magnitudes; conforming data scores low") {
    val df = Seq(123.45, 0.0042, 987.0, 1.0, 55.5, -3.0, 0.0)
      .toDF("v")
    val got = graft.operators.Relational.benford(df, "v")
      .collect().map(r => r.getAs[Long]("digit") -> r.getAs[Long]("observed")).toMap
    // -3 and 0 excluded; digits: 1(123.45), 4(0.0042), 9(987), 1(1.0), 5(55.5)
    assert(got == Map(1L -> 2L, 4L -> 1L, 5L -> 1L, 9L -> 1L))
    // a geometric series is Benford-conforming: every χ² cell stays small
    val geo = (0 until 2000).map(k => math.pow(1.0171, k)).toDF("v")
    val cells = graft.operators.Relational.benford(geo, "v")
      .collect().map(_.getAs[Double]("chi2_term"))
    assert(cells.length == 9 && cells.sum < 17.0, s"chi2=${cells.sum}") // p>0.05 band
  }

  // ---- q158 SCD integrity ----

  test("SCD integrity fires on planted corruption and reads zero on clean history") {
    def hist(rows: (Long, String, String, Boolean)*) =
      rows.toDF("k", "f", "t", "is_current")
        .select(col("k"), col("f").cast("date").as("valid_from"),
          when(col("t") =!= "", col("t").cast("date")).as("valid_to"),
          col("is_current"))
    val clean = hist(
      (1L, "2026-01-01", "2026-06-01", false),
      (1L, "2026-06-01", "", true),
      (2L, "2026-01-01", "", true))
    val g1 = graft.operators.Relational.scdIntegrity(clean, "k")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("violations")).toMap
    assert(g1.values.forall(_ == 0L), g1.toString)
    val dirty = hist(
      (1L, "2026-01-01", "2026-07-01", false), // overlaps the next window
      (1L, "2026-06-01", "", true),
      (2L, "2026-01-01", "", true),
      (2L, "2026-02-01", "", true),            // two currents
      (3L, "2026-05-01", "2026-05-01", false), // inverted window
      (3L, "2026-05-01", "", true))
    val g2 = graft.operators.Relational.scdIntegrity(dirty, "k")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("violations")).toMap
    assert(g2("one_current_per_key") == 1L)      // key 2
    assert(g2("valid_to_after_valid_from") == 1L) // key 3
    assert(g2("no_overlapping_windows") >= 1L)   // key 1
  }

  // ---- q152 PSI drift ----

  test("PSI is near zero for identical distributions, large for a planted shift") {
    // group "stable": identical ref/cur; group "shifted": cur moved up
    // by 100 (all mass leaves the reference deciles' lower bins)
    val rows =
      (1 to 1000).map(i => ("stable", true, i.toDouble % 97)) ++
      (1 to 1000).map(i => ("stable", false, i.toDouble % 97)) ++
      (1 to 1000).map(i => ("shifted", true, i.toDouble % 97)) ++
      (1 to 1000).map(i => ("shifted", false, 100.0 + i % 97))
    val df = rows.toDF("grp", "ref", "v")
    val got = graft.operators.Relational
      .psiDrift(df, "grp", "v", col("ref"), 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(math.abs(got("stable")) < 0.01, s"stable PSI ${got("stable")}")
    assert(got("shifted") > 1.0, s"shifted PSI ${got("shifted")}")
  }

  test("psiDriftApprox tracks the exact tier within the sketch's rank-error band") {
    // at accuracy=10000 on 2k rows/group the GK sketch is exact-rank,
    // so decile bounds coincide and the PSI delta collapses to ~0;
    // assert a conservative band PLUS the qualitative verdicts agree
    val rows =
      (1 to 2000).map(i => ("stable", true, (i * 7 % 997).toDouble)) ++
      (1 to 2000).map(i => ("stable", false, (i * 11 % 997).toDouble)) ++
      (1 to 2000).map(i => ("shifted", true, (i * 7 % 997).toDouble)) ++
      (1 to 2000).map(i => ("shifted", false, 500.0 + (i * 13 % 997)))
    val df = rows.toDF("grp", "ref", "v")
    val exact = graft.operators.Relational
      .psiDrift(df, "grp", "v", col("ref"), 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    val approx = graft.operators.Relational
      .psiDriftApprox(df, "grp", "v", col("ref"), 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    exact.foreach { case (g, e) =>
      assert(math.abs(approx(g) - e) < 0.05, s"$g exact=$e approx=${approx(g)}")
    }
    assert(math.abs(approx("stable")) < 0.05 && approx("shifted") > 1.0)
  }

  // ---- q153 chi-square ----

  test("chi-square matches the hand-computed 2x2 contingency value") {
    // o = [[10,20],[30,40]] → e = [[12,18],[28,42]],
    // χ² = 4/12 + 4/18 + 4/28 + 4/42 = 0.793651 (round 6), dof 1
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(20)(("a", 1L)) ++
      Seq.fill(30)(("b", 0L)) ++ Seq.fill(40)(("b", 1L))
    val out = graft.operators.Relational
      .chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    assert(out.getAs[Double]("chi2") == 0.793651)
    assert(out.getAs[Long]("dof") == 1L && out.getAs[Long]("n") == 100L)
  }

  // ---- q136 weighted sampling ----

  test("Efraimidis–Spirakis selection rate is weight-monotone") {
    // 1000 items, weight 1 vs weight 9 (alternating): the top-200 cut
    // must be dominated by the heavy class far beyond chance.
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) 9.0 else 1.0))
      .toDF("id", "w")
    val picked = Relational.weightedSample(df, "id", "w", 200)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ % 2 == 0)
    assert(picked.length == 200)
    assert(heavy > 150, s"heavy-weight picks $heavy of 200 — not monotone")
  }

  test("fkOrphans fires on planted corruption and distinguishes keys from rows") {
    import spark.implicits._
    // parent holds keys 1..3; child points at 1, 1, 2, 99, 99, 99, 42:
    // orphan KEYS = {99, 42} → 2; orphan ROWS = 3 + 1 = 4. Null child
    // keys are not orphans (nullable FK semantics).
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(99L),
      Some(99L), Some(42L), None).toDF("ck")
    val out = graft.operators.Warehouse.fkOrphans(
      Seq(("child->parent", child, "ck", parent, "pk"))).collect().head
    assert(out.getAs[String]("edge") == "child->parent")
    assert(out.getAs[Long]("orphan_keys") == 2)
    assert(out.getAs[Long]("orphan_rows") == 4)
    // clean edge → explicit zeros, not an empty frame
    val clean = graft.operators.Warehouse.fkOrphans(
      Seq(("c->p", Seq(1L, 2L).toDF("ck"), "ck", parent, "pk")))
      .collect().head
    assert(clean.getAs[Long]("orphan_keys") == 0 &&
      clean.getAs[Long]("orphan_rows") == 0)
  }

  test("profileNumeric: exact null/distinct/min/max per column") {
    import spark.implicits._
    val df = Seq((Some(1.0), Some(10L)), (Some(2.5), None),
      (None, Some(10L)), (Some(2.5), Some(40L)))
      .toDF("a", "b")
    val out = graft.operators.Warehouse.profileNumeric(df, Seq("a", "b"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_rows") == 4 && a.getAs[Long]("n_null") == 1 &&
      a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("vmin") == 1.0 && a.getAs[Double]("vmax") == 2.5)
    val b = out("b")
    assert(b.getAs[Long]("n_null") == 1 && b.getAs[Long]("n_distinct") == 2)
    assert(b.getAs[Double]("vmin") == 10.0 && b.getAs[Double]("vmax") == 40.0)
  }

  test("cdcMerge: last-writer wins, delete drops, insert/update/kept provenance") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "seg", "bal")
    val ch = Seq(
      (1L, "U", 5L, "a2", 11.0),  // older update...
      (1L, "U", 9L, "a3", 12.0),  // ...beaten by this one (max version)
      (2L, "D", 7L, "x", 0.0),    // delete wins: key 2 gone
      (2L, "U", 3L, "y", 99.0),   // late lower-version update ignored
      (5L, "I", 8L, "e", 50.0))   // brand-new key
      .toDF("k", "op", "version", "seg", "bal")
    val out = graft.operators.Warehouse.cdcMerge(snap, ch, "k", Seq("seg", "bal"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 3L, 4L, 5L), s"keys: ${out.keySet}")
    assert(out(1L) == (("a3", 12.0, "updated", 9L)), s"k=1: ${out(1L)}")
    assert(out(3L) == (("c", 30.0, "kept", -1L)), s"k=3: ${out(3L)}")
    assert(out(4L) == (("d", 40.0, "kept", -1L)), s"k=4: ${out(4L)}")
    assert(out(5L) == (("e", 50.0, "inserted", 8L)), s"k=5: ${out(5L)}")
    // same-version tie: D outranks U (the declared op precedence)
    val tie = Seq((9L, "U", 1L, "u", 1.0), (9L, "D", 1L, "d", 2.0))
      .toDF("k", "op", "version", "seg", "bal")
    val out2 = graft.operators.Warehouse
      .cdcMerge(Seq((9L, "z", 0.0)).toDF("k", "seg", "bal"), tie, "k", Seq("seg", "bal"))
      .collect()
    assert(out2.isEmpty, s"tie must resolve to the delete: ${out2.toSeq}")
  }

  test("zorderCluster: the non-sorted dimension's per-file range collapses (r17)") {
    import org.apache.spark.sql.functions._
    val pts = graft.operators.Geo.customerPoints(spark, sf("sf0.01"))
    val n = 16
    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("part", spark_partition_id())
        .groupBy("part")
        .agg((max("la") - min("la")).cast("double").as("dla"),
          (max("lo") - min("lo")).cast("double").as("dlo"))
        .agg(avg("dla"), avg("dlo")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (_, slabLo) = avgRanges(
      pts.repartitionByRange(n, col("la")).sortWithinPartitions("la"))
    val (zLa, zLo) = avgRanges(graft.operators.Warehouse.zorderCluster(
      pts, col("la") + lit(90000000L), col("lo") + lit(180000000L), n))
    // a la-sort leaves lo at full width per file; z-order tiles BOTH
    assert(zLo < 0.6 * slabLo,
      s"z-order did not shrink the second dimension: $zLo vs $slabLo")
    assert(zLa < 180000000.0, "z-order degenerated on the first dimension")
    // bit-exactness: morton(3, 5) = 0b100111 = 39
    val m = spark.range(1).select(graft.operators.Warehouse.mortonKey(
      lit(3L), lit(5L)).as("m")).head().getLong(0)
    assert(m == 39L, s"morton(3,5) = $m")
  }

}
