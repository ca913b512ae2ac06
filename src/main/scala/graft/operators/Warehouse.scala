package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Warehouse-maintenance operators: slowly-changing-dimension (SCD2)
  * history building and snapshot differencing (CDC). The reference
  * pipeline lands append-only raw streams (RawDataIngestion.java:152's
  * partitioned sink); these are the maintenance queries a warehouse
  * built on such landed data runs next — keeping dimensions historied
  * and auditing what changed between loads.
  *
  * Scale doctrine shared by both operators: the DIMENSION/SNAPSHOT side
  * is the big side (billions of rows at 100 TB) and must never be
  * driver-materialized or re-sorted; the daily UPDATE batch is orders
  * of magnitude smaller and rides a broadcast where possible. Neither
  * operator carries any window over the big side.
  */
object Warehouse {

  /** SCD type-2 apply: fold one update batch into a current-state
    * dimension, emitting full history rows.
    *
    * Inputs:
    *  - `current`: the dimension's CURRENT rows — `keys ++ tracked ++
    *    valid_from:date`. (Open rows only; closed history is immutable
    *    and appended elsewhere — this operator never rewrites it.)
    *  - `updates`: one batch — `keys ++ tracked ++ eff:date`.
    *
    * Output: `keys ++ tracked ++ (valid_from, valid_to, is_current)`:
    *  - changed rows (any tracked column differs, null-safe) close the
    *    old version at `eff` and open a new current version;
    *  - no-op updates (all tracked columns equal) are DROPPED — a
    *    re-delivered identical record must not grow history (the
    *    idempotence half of SCD2 that naive implementations miss);
    *  - brand-new keys insert as current from `eff`;
    *  - untouched keys pass through unchanged.
    *
    * Shuffle story: ONE left join of dimension against the update
    * batch plus one anti-join for inserts — with NO forced broadcast
    * hint: the planner (and AQE at runtime) broadcasts a batch under
    * the threshold, in which case the dimension is never shuffled, and
    * DEGRADES to a shuffle join for a bulk backfill batch instead of
    * failing on the driver's broadcast limits. The unions are free
    * (no exchange). At 100 TB the dimension stays hash-partitioned by
    * key on disk and this plan touches each partition once —
    * merge-on-read, not rewrite-the-world.
    */
  def scd2Apply(current: DataFrame, updates: DataFrame,
      keys: Seq[String], tracked: Seq[String]): DataFrame = {
    val outCols = (keys ++ tracked).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))
    val upd = updates.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"u_$c")) :+ col("eff"): _*)
    val joined = current.join(upd, keys, "left")
    val changed = tracked.map(c => !(col(c) <=> col(s"u_$c")))
      .reduce(_ || _)
    val hasUpd = col("eff").isNotNull
    // untouched keys AND no-op updates: current row stays open
    val stay = joined.filter(!hasUpd || !changed)
      .select((keys ++ tracked).map(col) :+ col("valid_from"): _*)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    // changed: close the old version at eff
    val closed = joined.filter(hasUpd && changed)
      .select((keys ++ tracked).map(col) ++
        Seq(col("valid_from"), col("eff").as("valid_to")): _*)
      .withColumn("is_current", lit(false))
    // changed: open the new version
    val opened = joined.filter(hasUpd && changed)
      .select(keys.map(col) ++
        tracked.map(c => col(s"u_$c").as(c)) :+ col("eff").as("valid_from"): _*)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    // brand-new keys
    val inserted = upd.join(current.select(keys.map(col): _*), keys, "left_anti")
      .select(keys.map(col) ++
        tracked.map(c => col(s"u_$c").as(c)) :+ col("eff").as("valid_from"): _*)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    stay.select(outCols: _*)
      .unionByName(closed.select(outCols: _*))
      .unionByName(opened.select(outCols: _*))
      .unionByName(inserted.select(outCols: _*))
  }

  /** Q131 — SCD2 over the customer dimension. The update batch is the
    * deterministic slice c_custkey % 10 = 3 with acctbal bumped by
    * +100.0 (an IEEE-exact double add — both engines compute the
    * identical sum, the q04 doctrine), effective 2026-06-01 against a
    * baseline valid_from of 2026-01-01. Every update row is a genuine
    * change, so history = closed old + opened new for the slice and
    * pass-through for the rest; the oracle mirrors the union
    * algebraically. */
  def q131(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val current = cust.select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      col("c_acctbal").as("bal"),
      lit("2026-01-01").cast("date").as("valid_from"))
    val updates = cust.filter(col("c_custkey") % 10 === 3).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      (col("c_acctbal") + 100.0d).as("bal"),
      lit("2026-06-01").cast("date").as("eff"))
    scd2Apply(current, updates, Seq("k"), Seq("seg", "bal"))
      .orderBy(col("k"), col("valid_from"))
  }

  /** Snapshot diff (CDC audit): classify every key across two loads of
    * the same table as insert / delete / update, dropping unchanged
    * rows. The operator a lakehouse runs to validate what a pipeline
    * rewrite actually changed — at 100 TB the full-outer join on the
    * key is the unavoidable cost, and it runs shuffle-free when both
    * snapshots are bucketed by key (the layout the partitioned sink
    * already writes); otherwise one hash-partition pass over each
    * side. Unchanged rows (the overwhelming majority in a real diff)
    * are filtered BEFORE any downstream consumer, so the changed set —
    * not the table — is what flows on.
    *
    * Inputs carry `keys ++ compared`; output is `keys ++ change_type ++
    * old_/new_ copies of each compared column`. Null-safe comparison
    * (`<=>`) so a null→value transition counts as an update.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], compared: Seq[String]): DataFrame = {
    val o = oldDf.select(keys.map(col) ++
      compared.map(c => col(c).as(s"old_$c")) :+ lit(true).as("in_old"): _*)
    val n = newDf.select(keys.map(col) ++
      compared.map(c => col(c).as(s"new_$c")) :+ lit(true).as("in_new"): _*)
    val j = o.join(n, keys, "full_outer")
    val differs = compared.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    j.withColumn("change_type",
        when(col("in_old").isNull, lit("insert"))
          .when(col("in_new").isNull, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        compared.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Q132 — snapshot diff over orders. Old load = keys with
    * o_orderkey % 5 <> 1; new load = keys with o_orderkey % 5 <> 2,
    * with o_totalprice bumped +10.0 where o_orderkey % 7 = 0. So
    * %5=1 rows are inserts, %5=2 rows are deletes, %7=0 survivors are
    * updates, and everything else must vanish from the report. The
    * +10.0 add is IEEE-exact on both engines (q131's doctrine). */
  def q132(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val oldSnap = orders.filter(col("o_orderkey") % 5 =!= 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val newSnap = orders.filter(col("o_orderkey") % 5 =!= 2)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0d)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** AS-OF (time travel) read over an SCD2 history: the version row
    * visible at instant `d` is the one with valid_from ≤ d < valid_to
    * (open rows read as +∞) — ONE partition-prunable filter, no join,
    * no window; this is the entire point of keeping SCD2 history. */
  def asOf(hist: DataFrame, d: String): DataFrame =
    hist.filter(col("valid_from") <= lit(d).cast("date") &&
      (col("valid_to").isNull || col("valid_to") > lit(d).cast("date")))

  /** Q162 — time travel certification: snapshot the q131 history at
    * 2026-03-01 (before the update batch) and 2026-07-01 (after),
    * tagged and unioned. The oracle derives both snapshots
    * INDEPENDENTLY from the base table (before = original values;
    * after = original with the %10=3 slice bumped) — a hash match
    * proves AS-OF reconstruction returns exactly the state that was
    * current at each instant. */
  def q162(s: SparkSession, d: String): DataFrame = {
    val hist = q131(s, d)
    asOf(hist, "2026-03-01").select(lit("before").as("at"),
        col("k"), col("seg"), col("bal"))
      .unionByName(asOf(hist, "2026-07-01").select(lit("after").as("at"),
        col("k"), col("seg"), col("bal")))
      .orderBy("at", "k")
  }

  /** Incremental aggregate maintenance — keep a grouped aggregate
    * (materialized view) current by applying a CDC delta instead of
    * recomputing from the new snapshot: deletes and update-pre-images
    * RETRACT their contribution (negative count, negated decimal sum),
    * inserts and update-post-images add theirs; one outer merge of
    * base aggregate × group-level deltas, groups whose count reaches
    * zero drop out. Exact-decimal measures make retraction lossless
    * (float sums would drift per maintenance cycle — the reason
    * streaming engines restrict retractive aggs to invertible exact
    * types).
    *
    * At 100 TB this is THE reason to capture CDC (q132): the delta is
    * orders of magnitude smaller than the table, so maintenance cost
    * tracks change volume, not data volume. The q163 gate PROVES the
    * algebra: the engine maintains incrementally; the oracle
    * recomputes the aggregate from the new snapshot directly — a hash
    * match means maintained ≡ recomputed. */
  def incrementalAgg(baseAgg: DataFrame, diff: DataFrame,
      groupFromOld: Seq[Column], groupFromNew: Seq[Column],
      oldMeasure: Column, newMeasure: Column,
      groupNames: Seq[String]): DataFrame = {
    val retract = diff.filter(col("change_type").isin("delete", "update"))
      .select(groupFromOld.zip(groupNames).map { case (c, n) => c.as(n) } :+
        lit(-1L).as("dn") :+ (-oldMeasure).as("ds"): _*)
    val add = diff.filter(col("change_type").isin("insert", "update"))
      .select(groupFromNew.zip(groupNames).map { case (c, n) => c.as(n) } :+
        lit(1L).as("dn") :+ newMeasure.as("ds"): _*)
    val deltas = retract.unionByName(add)
      .groupBy(groupNames.map(col): _*)
      .agg(sum("dn").as("dn"), sum("ds").as("ds"))
    baseAgg.join(deltas, groupNames, "full_outer")
      .select(groupNames.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)"))
          + coalesce(col("ds"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")))
          .as("s")): _*)
      .filter(col("n") > 0)
  }

  /** AS-OF enrichment — the temporal dimension lookup: join a fact
    * stream against an SCD2 history picking the version in effect AT
    * EACH ROW'S OWN event time (valid_from ≤ ts < valid_to). The
    * correctness half of late/replayed data: enriching yesterday's
    * replayed events against TODAY'S dimension silently rewrites
    * history — this join can't. Works batch and stream-static (the
    * history is the static side; Structured Streaming plans it as a
    * per-micro-batch join, S26's test). One equi-key join with the
    * interval as a join filter (q44's shape — never a cross product);
    * at 100 TB the dimension bucket-partitions by key and versions per
    * key are few. */
  def asOfEnrich(facts: DataFrame, hist: DataFrame, factKey: String,
      histKey: String, tsCol: String = "ts"): DataFrame =
    facts.join(hist,
      facts(factKey) === hist(histKey) &&
        hist("valid_from") <= facts(tsCol).cast("date") &&
        (hist("valid_to").isNull || hist("valid_to") > facts(tsCol).cast("date")),
      "left")

  /** Q173 — events enriched with the customer balance in effect at
    * each event's time, against a 2024-era SCD2 history (baseline
    * 2024-01-01, the %10 = 3 bump effective 2024-01-15 — mid-fixture,
    * so both versions are exercised). user→customer key: user_id + 1
    * (the fixture's users 0..149 land on real custkeys). */
  def q173(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val current = cust.select(
      col("c_custkey").as("k"), col("c_acctbal").as("bal"),
      lit("2024-01-01").cast("date").as("valid_from"))
    val updates = cust.filter(col("c_custkey") % 10 === 3).select(
      col("c_custkey").as("k"), (col("c_acctbal") + 100.0d).as("bal"),
      lit("2024-01-15").cast("date").as("eff"))
    val hist = scd2Apply(current, updates, Seq("k"), Seq("bal"))
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), (col("user_id") + 1).as("ck"))
    asOfEnrich(ev, hist, "ck", "k")
      .select(col("event_id"), col("ck"), col("bal"),
        col("valid_from"), col("is_current"))
      .orderBy("event_id")
  }

  /** Q163 — maintained revenue view by (status, priority): base
    * aggregate from the OLD snapshot + q132's diff, never touching the
    * new snapshot; the oracle aggregates the new snapshot directly. */
  def q163(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val oldSnap = orders.filter(col("o_orderkey") % 5 =!= 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"))
    val newSnap = orders.filter(col("o_orderkey") % 5 =!= 2)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0d)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val baseAgg = oldSnap.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
    val diff = snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_orderpriority", "o_totalprice"))
    incrementalAgg(baseAgg, diff,
      groupFromOld = Seq(col("old_o_orderstatus"), col("old_o_orderpriority")),
      groupFromNew = Seq(col("new_o_orderstatus"), col("new_o_orderpriority")),
      oldMeasure = col("old_o_totalprice").cast("decimal(18,2)"),
      newMeasure = col("new_o_totalprice").cast("decimal(18,2)"),
      groupNames = Seq("o_orderstatus", "o_orderpriority"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("s").cast("double").as("revenue"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Referential-integrity audit: for each declared FK edge, how many
    * child rows point at a parent key that does not exist. The load-
    * gate audit a warehouse runs after every batch — a nonzero orphan
    * count means the load order or an upstream delete broke the star.
    *
    * Plan shape per edge: child side reduced to DISTINCT child keys
    * FIRST (the orphan question is per-key; the distinct is the only
    * child-sized shuffle and map-side combines), then a LEFT ANTI join
    * against parent keys — dimension-sized, so the planner broadcasts
    * every dim (region/nation/customer/supplier/part) and only the
    * fact-fact edge (lineitem→orders) shuffles; orphan KEYS then
    * rejoin the child to count affected ROWS via one more key-grouped
    * agg. Edges are independent — Spark runs the union's legs in
    * parallel stages. */
  def fkOrphans(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    val per = edges.map { case (name, child, childKey, parent, parentKey) =>
      val keyCounts = child.filter(col(childKey).isNotNull)
        .groupBy(col(childKey).as("k")).agg(count(lit(1)).as("c"))
      val orphans = keyCounts.join(
        parent.select(col(parentKey).as("k")).distinct(),
        Seq("k"), "left_anti")
      orphans.agg(
        lit(name).as("edge"),
        count(lit(1)).as("orphan_keys"),
        coalesce(sum("c"), lit(0L)).as("orphan_rows"))
    }
    per.reduce(_ unionAll _)
  }

  /** Q191 — the full star-schema FK sweep. The fixture star is clean
    * by construction, so every orphan count must be zero: the gate
    * certifies the AUDIT (an oracle recomputing the same anti-joins),
    * and the planted-corruption contract in WarehouseSpec proves it
    * fires. */
  def q191(s: SparkSession, d: String): DataFrame = {
    val edges = Seq(
      ("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"),
      ("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      ("lineitem->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"),
      ("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      ("customer->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      ("supplier->nation", Tables.supplier(s, d), "s_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      ("nation->region", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey"))
    fkOrphans(edges).orderBy("edge")
  }

  /** Column-profile audit: per column, null count, distinct count, and
    * min/max — the post-load sanity read (a column suddenly 90% null
    * or single-valued is an upstream break). Numerics profile as
    * doubles; min/max of other types are presented as strings via a
    * deterministic render the oracle mirrors. One pass per SHAPE
    * (all numeric aggs fold into a single scan-wide agg row; the long
    * form is a bounded lit-keyed union — columns × 1 rows, never
    * data-sized). */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val n = df.agg(count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"))): _*)
    val legs = cols.map(c => n.select(
      lit(c).as("col_name"),
      col("n").as("n_rows"),
      col(s"${c}__nulls").as("n_null"),
      col(s"${c}__nd").as("n_distinct"),
      col(s"${c}__min").as("vmin"),
      col(s"${c}__max").as("vmax")))
    legs.reduce(_ unionAll _)
  }

  /** Q192 — numeric-column profile of orders + lineitem measures. */
  def q192(s: SparkSession, d: String): DataFrame =
    profileNumeric(Tables.orders(s, d), Seq("o_custkey", "o_totalprice"))
      .unionAll(profileNumeric(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")))
      .orderBy("col_name")

  /** CDC MERGE — the `MERGE INTO` workhorse the warehouse tier still
    * lacked (q131 builds SCD2 HISTORY; q132 diffs two snapshots; this
    * APPLIES a keyed change feed to produce the next snapshot, the
    * Delta/Iceberg/Hudi upsert semantics):
    *  - changes carry (key, op ∈ I/U/D, version, payload);
    *  - per key the WINNING change is the max-version row (tie broken
    *    by op rank D > U > I then payload — an explicit total order,
    *    the cross-engine-determinism doctrine: engine-arbitrary
    *    last-writer ties are the classic silent MERGE divergence);
    *  - winner D → the key is deleted (snapshot row dropped, late
    *    lower-version I/U for it ignored);
    *  - winner I/U → upsert of the change payload (insert if the key
    *    is new, overwrite if it exists);
    *  - keys with no change pass through.
    * Output flags each row's provenance (`src` ∈ kept/updated/
    * inserted) and the applied version (NULL for kept).
    *
    * Shuffle story (the §scaladoc doctrine above): the winner pick is
    * a window over the CHANGE FEED only (partitioned by key — never
    * the snapshot); one outer join snapshot ⟷ winners on the key, no
    * forced broadcast (AQE broadcasts a small feed, degrades to
    * shuffle for a backfill). The snapshot is touched exactly once —
    * merge-on-read, not rewrite-the-world. */
  def cdcMerge(snapshot: DataFrame, changes: DataFrame,
      key: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Internal working columns live in a reserved __cdc_ namespace
    // (r14 advice): a snapshot carrying e.g. an `op` or `version`
    // column would otherwise make the full join ambiguous or silently
    // misbind the provenance logic. The change feed's `op`/`version`
    // are its INPUT contract; they are renamed away before the join.
    val reserved = Seq("__cdc_op", "__cdc_version", "__cdc_in_snap") ++
      payload.map(c => s"__cdc_u_$c")
    val clash = snapshot.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"cdcMerge: snapshot columns collide with reserved internals: ${clash.mkString(",")}")
    val opRank = when(col("op") === "D", 3)
      .when(col("op") === "U", 2).otherwise(1)
    val win = changes
      .withColumn("__cdc_rk", row_number().over(
        Window.partitionBy(key).orderBy(
          col("version").desc, opRank.desc,
          struct(payload.map(col): _*).desc)))
      .filter(col("__cdc_rk") === 1)
      .select(col(key) +: col("op").as("__cdc_op") +:
        col("version").as("__cdc_version") +:
        payload.map(c => col(c).as(s"__cdc_u_$c")): _*)
    val joined = snapshot.withColumn("__cdc_in_snap", lit(true))
      .join(win, Seq(key), "full")
    val hasChange = col("__cdc_op").isNotNull
    joined
      .filter(!hasChange || col("__cdc_op") =!= "D")
      .select(
        col(key) +:
        payload.map(c =>
          when(hasChange, col(s"__cdc_u_$c")).otherwise(col(c)).as(c)) :++
        Seq(
          when(!hasChange, "kept")
            .when(col("__cdc_in_snap").isNotNull, "updated")
            .otherwise("inserted").as("src"),
          when(hasChange, col("__cdc_version")).cast("bigint")
            .as("applied_version")): _*)
  }

  /** Q245 — CDC merge under the ORACLE gate: the customer snapshot
    * (key, segment, balance) absorbs a change feed derived
    * deterministically from orders — op from o_orderstatus
    * ('P' → D, 'F' → U, else I), version = the globally-unique
    * o_orderkey (so the winner per key is unambiguous and the
    * tie-break policy, while declared, never fires), payload =
    * (o_orderpriority, o_totalprice). Every 50th customer key is
    * shifted beyond the snapshot's key space so the INSERT branch is
    * genuinely exercised (orders' FK would otherwise make every
    * change an update). */
  def q245(s: SparkSession, d: String): DataFrame = {
    val snap = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("k"),
      col("c_mktsegment").as("seg"),
      col("c_acctbal").cast("double").as("bal"))
    val ch = Tables.orders(s, d).select(
      when(col("o_custkey") % 50 === 0, col("o_custkey") + 1000000L)
        .otherwise(col("o_custkey")).cast("long").as("k"),
      when(col("o_orderstatus") === "P", "D")
        .when(col("o_orderstatus") === "F", "U")
        .otherwise("I").as("op"),
      col("o_orderkey").cast("bigint").as("version"),
      col("o_orderpriority").as("seg"),
      col("o_totalprice").cast("double").as("bal"))
    cdcMerge(snap, ch, "k", Seq("seg", "bal")).orderBy("k")
  }

  // ---------------------------------------------------------------
  // Z-ORDER (Morton) clustering — the multi-dimensional DATA LAYOUT
  // lever (r17). At 100 TB, min/max file statistics only prune when
  // the write order clusters the filter dimensions; a single-key sort
  // clusters ONE dimension and leaves the other's per-file range at
  // full width. Bit-interleaving two keys makes every file a tile of
  // the 2-D space, so BOTH dimensions prune (the Delta/Iceberg
  // OPTIMIZE ZORDER design, rebuilt as exact integer arithmetic).
  // ---------------------------------------------------------------

  /** Spread the low 31 bits of `x` to even bit positions — the
    * classic 5-step mask-shift ladder, exact BIGINT ops mirrored
    * verbatim by the oracle SQL (no UDF; codegen-friendly). */
  private def spreadBits(x: Column): Column = {
    val m = Seq(
      0x0000FFFF0000FFFFL -> 16, 0x00FF00FF00FF00FFL -> 8,
      0x0F0F0F0F0F0F0F0FL -> 4, 0x3333333333333333L -> 2,
      0x5555555555555555L -> 1)
    m.foldLeft(x.bitwiseAND(lit(0x7FFFFFFFL))) { case (v, (mask, s)) =>
      (v.bitwiseOR(shiftleft(v, s))).bitwiseAND(lit(mask))
    }
  }

  /** Morton key of two NON-NEGATIVE sub-2³¹ integer columns: y's bits
    * interleave above x's. Total order = Z-curve order. */
  def mortonKey(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Z-order-cluster a frame for writing: range-partition on the
    * Morton key (each output file becomes a contiguous Z-curve
    * segment = a 2-D tile), sort within partitions so parquet
    * row-group stats tile too. This is the WRITE-side half; the
    * read-side half is free (parquet min/max pruning). */
  def zorderCluster(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    val keyed = df.withColumn("zkey", mortonKey(x, y))
    keyed.repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  /** Q279 — Morton keys under the ORACLE gate: customer points (the
    * q255 µdeg derivation, shifted non-negative) bit-interleaved;
    * DuckDB mirrors the mask-shift ladder verbatim. The layout WIN is
    * pinned in WarehouseSpec (per-tile bbox area under Z-order vs
    * single-key order); this gates the key arithmetic itself. */
  def q279(s: SparkSession, d: String): DataFrame =
    graft.operators.Geo.customerPoints(s, d)
      .select(col("id"),
        mortonKey(col("la") + lit(90000000L), col("lo") + lit(180000000L))
          .as("zkey"))
      .orderBy("id")

  def q279OracleSql: String = {
    def spread(v: String): String = {
      var e = s"($v & 2147483647)"
      Seq(0x0000FFFF0000FFFFL -> 16, 0x00FF00FF00FF00FFL -> 8,
        0x0F0F0F0F0F0F0F0FL -> 4, 0x3333333333333333L -> 2,
        0x5555555555555555L -> 1).foreach { case (m, s) =>
        e = s"(($e | ($e << $s)) & $m)"
      }
      e
    }
    "WITH pts AS (SELECT CAST(c_custkey AS BIGINT) AS id, " +
      "CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 180000001 - 90000000 AS la, " +
      "CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)) AS BIGINT) % 360000000 - 180000000 AS lo " +
      "FROM customer) " +
      s"SELECT id, (${spread("(la + 90000000)")} | " +
      s"(${spread("(lo + 180000000)")} << 1)) AS zkey " +
      "FROM pts ORDER BY id"
  }
}
