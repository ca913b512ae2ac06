package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Closes the SURVEY §2.2 checklist rows beyond ROLLUP (Q15): CUBE and
  * GROUPING SETS, and the map-function family (map construction from
  * JSON-ish data, map_keys/map_values/element_at/map_concat). */
class GroupingMapSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf("sf0.001"))

  test("cube emits all four grouping-set combinations, consistent totals") {
    val cube = li.cube("l_returnflag", "l_linestatus").agg(count(lit(1)).as("cnt")).collect()
    val grand = cube.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val byFlag = cube.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val byStatus = cube.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    val full = cube.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1)
    val total = grand.head.getLong(2)
    assert(byFlag.map(_.getLong(2)).sum == total)
    assert(byStatus.map(_.getLong(2)).sum == total)
    assert(full.map(_.getLong(2)).sum == total)
    // cube == rollup ∪ the by-status-only sets
    val rollup = li.rollup("l_returnflag", "l_linestatus").agg(count(lit(1))).count()
    assert(cube.length == rollup + byStatus.length)
  }

  test("GROUPING SETS via SQL with grouping() disambiguation") {
    Tables.registerAll(spark, sf("sf0.001"))
    val r = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |       grouping(l_returnflag) AS gf, grouping(l_linestatus) AS gs
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gf, gs, l_returnflag, l_linestatus""".stripMargin).collect()
    // () set: both grouping flags = 1; exactly one such row
    assert(r.count(x => x.getByte(3) == 1 && x.getByte(4) == 1) == 1)
    // no row carries both concrete keys (that set wasn't requested)
    assert(!r.exists(x => x.getByte(3) == 0 && x.getByte(4) == 0))
  }

  test("map functions: build from entries, keys/values/element_at/concat") {
    val df = spark.createDataFrame(Seq((1, "a", 10, "b", 20))).toDF("id", "k1", "v1", "k2", "v2")
      .select(col("id"), map(col("k1"), col("v1"), col("k2"), col("v2")).as("m"))
    val r = df.select(
      map_keys(col("m")).as("ks"),
      map_values(col("m")).as("vs"),
      element_at(col("m"), "b").as("eb"),
      element_at(col("m"), "zz").as("missing"),
      map_concat(col("m"), map(lit("c"), lit(30))).as("m2")).head()
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getSeq[Int](1) == Seq(10, 20))
    assert(r.getInt(2) == 20 && r.isNullAt(3))
    assert(r.getMap[String, Int](4) == Map("a" -> 10, "b" -> 20, "c" -> 30))
  }

  test("str_to_map over events.props-style payloads") {
    val df = spark.createDataFrame(Seq((1L, "k:87,u:3"))).toDF("id", "kv")
      .select(str_to_map(col("kv"), lit(","), lit(":")).as("m"))
    assert(df.select(element_at(col("m"), "k")).head().getString(0) == "87")
  }
}
