package graft

/** Pins the cross-engine-validated facts from SURVEY.md §2.3 on sf0.001.
  * (Full hash-for-hash coverage lives in the driver's DuckDB gate /
  * tools/check_oracle.py; these are fast regressions.) */
class RelationalSmokeSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("q13 decimal aggregates match the validated values") {
    val r = SparkEntry.queries("q13_hash_agg_b")(spark, d).collect()
    assert(r.length == 6)
    val af = r.find(x => x.getString(0) == "A" && x.getString(1) == "F").get
    // sums are exact decimal internally, presented as DOUBLE (round-4
    // hash-fail experiment) — same validated values
    assert(af.getDouble(2) == 24851.00)
    assert(af.getDouble(3) == 50132697.39)
    assert(af.getDouble(4) == 0.0502)
  }

  test("q21 set-op chain = 13 rows") {
    assert(SparkEntry.queries("q21_set_ops")(spark, d).count() == 13)
  }

  test("q25 dedup finds 21 prefix groups at sf0.001") {
    assert(SparkEntry.queries("q25_dedup_prefix")(spark, d).count() == 21)
  }

  test("q27 top hit is the query vector itself with sim 1.0") {
    val head = SparkEntry.queries("q27_cosine_topk")(spark, d).head()
    assert(head.getLong(0) == 0L && head.getDouble(1) == 1.0)
  }

  test("q15 rollup emits the grand-total null row") {
    val r = SparkEntry.queries("q15_rollup")(spark, d).collect()
    assert(r.head.isNullAt(0) && r.head.isNullAt(1))
    assert(r.head.getLong(2) == r.filter(x => !x.isNullAt(0) && !x.isNullAt(1)).map(_.getLong(2)).sum)
  }

  test("entry (flagship q7) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has matching oracle key and runs") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, d).columns.nonEmpty, name)
    }
  }
}
