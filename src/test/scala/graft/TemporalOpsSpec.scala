package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Unit semantics for the temporal operators behind Q37 (as-of join) and
  * Q38 (sessionization) on literal frames — the oracle checks the full
  * fixture; these pin the edge cases: equal-timestamp click matches
  * (at-or-before), purchases before any click get NULL, and a session
  * splits exactly when the gap is EXCEEDED (strictly greater).
  */
class TemporalOpsSpec extends SparkSpec {

  test("as-of semantics: latest click at-or-before each purchase, null when none") {
    // user 1: clicks at t=10,20; purchases at t=5 (no match), t=20
    // (equal-ts click 102 matches), t=25 (click 102, the later of the two)
    val ev = spark.createDataFrame(Seq(
      (101L, 10L, 1L, "click"), (102L, 20L, 1L, "click"),
      (201L, 5L, 1L, "purchase"), (202L, 20L, 1L, "purchase"),
      (203L, 25L, 1L, "purchase"),
      (301L, 7L, 2L, "purchase") // user 2 has no clicks at all
    )).toDF("event_id", "tsu", "user_id", "event_type")

    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tsu"), lit(0).as("kind"),
        col("event_id").as("click_id"), lit(null).cast("bigint").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu"), lit(1).as("kind"),
        lit(null).cast("bigint").as("click_id"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsu"), col("kind"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = clicks.unionByName(purchases)
      .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("asof_click"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(201L -> None, 202L -> Some(102L), 203L -> Some(102L),
      301L -> None))
  }

  test("sessionization splits strictly beyond the gap, not at it") {
    // gap = 10: deltas 10 (same session), 11 (new session)
    val ev = spark.createDataFrame(Seq(
      (1L, 100L), (1L, 110L), (1L, 121L), (2L, 500L)
    )).toDF("user_id", "tsu")
    val wo = Window.partitionBy("user_id").orderBy("tsu")
    val got = ev
      .withColumn("prev", lag(col("tsu"), 1).over(wo))
      .withColumn("ns",
        when(col("prev").isNull || col("tsu") - col("prev") > 10L, 1).otherwise(0))
      .withColumn("sid",
        sum(col("ns")).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("bigint"))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n"), min("tsu").as("s"), max("tsu").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set((1L, 1L, 2L, 100L, 110L), (1L, 2L, 1L, 121L, 121L),
      (2L, 1L, 1L, 500L, 500L)))
  }
}
