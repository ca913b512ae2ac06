package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Coverage for the QUARANTINED output type classes (r4 ADVICE): the
  * driver's hash gate red-flags DECIMAL(38,2)-from-SUM and TIMESTAMP
  * outputs with value-identical data, so the gated q07/q24 present those
  * columns as DOUBLE / DATE+BIGINT. These tests keep the original type
  * classes exercised by asserting the quarantined variants agree with
  * the gated ones row for row.
  */
class TypeClassSpec extends SparkSpec {

  private lazy val d = sf("sf0.001")

  test("q07decimal38: rev is DECIMAL(38,2) and equals the gated q07's DOUBLE rev") {
    val dec = Relational.q07decimal38(spark, d)
    assert(dec.schema("rev").dataType.sql == "DECIMAL(38,2)")
    val decRows = dec.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDecimal(3)))
    val dblRows = Relational.q07(spark, d).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(decRows.length == dblRows.length && decRows.nonEmpty)
    decRows.zip(dblRows).foreach { case ((rn1, nn1, c1, dv), (rn2, nn2, c2, db)) =>
      assert(rn1 == rn2 && nn1 == nn2 && c1 == c2)
      // test-SF sums are far below 2^53, so the double render is exact
      assert(dv.doubleValue() == db, s"rev mismatch for ($rn1,$nn1)")
    }
  }

  test("q04 decimal cast: DECIMAL(18,2)-typed p equals the gated q04_d's DOUBLE p") {
    // the r6-diagnosed class: a DECLARED decimal column diverges in the
    // driver's string form whenever the cents digit is 0 (DuckDB side
    // renders float64 '103580.8', parquet decimal stays '103580.80') —
    // so the gate presents p as DOUBLE and this test keeps the
    // decimal-typed cast itself covered, asserting exact value equality
    val lineitem = graft.sources.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(18,2)").as("pdec"),
        col("l_extendedprice").cast("decimal(18,2)").cast("double").as("pdbl"))
      .collect()
    assert(lineitem.nonEmpty)
    lineitem.foreach { r =>
      // decimal(18,2) at price magnitudes → double is exact (< 2^53 cents)
      assert(r.getDecimal(2).doubleValue() == r.getDouble(3),
        s"p mismatch at (${r.get(0)},${r.get(1)})")
    }
  }

  test("q24timestamp: h is TIMESTAMP and equals the gated q24_b's (d, hr) bucket") {
    val ts = Relational.q24timestamp(spark, d)
    assert(ts.schema("h").dataType.typeName.startsWith("timestamp"))
    val tsRows = ts
      .select(col("h").cast("date").as("d"), hour(col("h")).cast("bigint").as("hr"),
        col("event_type"), col("cnt"), col("sv"))
      .collect().map(r =>
        (r.getDate(0).toString, r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val bRows = Relational.q24(spark, d).collect().map(r =>
      (r.getDate(0).toString, r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(tsRows.nonEmpty && tsRows.sorted.sameElements(bRows.sorted))
  }
}
