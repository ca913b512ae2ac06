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
    * Shuffle story: ONE left join of dimension against the
    * (auto-broadcast-sized) update batch plus one anti-join for
    * inserts; the dimension is never shuffled when the batch
    * broadcasts, and the unions are free (no exchange). At 100 TB the
    * dimension stays hash-partitioned by key on disk and this plan
    * touches each partition once — merge-on-read, not rewrite-the-world.
    */
  def scd2Apply(current: DataFrame, updates: DataFrame,
      keys: Seq[String], tracked: Seq[String]): DataFrame = {
    val outCols = (keys ++ tracked).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))
    val upd = updates.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"u_$c")) :+ col("eff"): _*)
    val joined = current.join(broadcast(upd), keys, "left")
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
}
