package graft

import graft.sources.{DriftCheck, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The testdata-drift tripwire (VERDICT r10 item 2): footer-level type
  * logging for all ten tables plus a hard gate on recognized `events.ts`
  * shapes. Pure footer reads — no SparkSession needed. */
class DriftCheckSpec extends AnyFunSuite with SparkSpec {

  test("DriftCheck.run passes on the current driver testdata at every sf") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach(s => DriftCheck.run(sf(s)))
  }

  test("footerSignature covers every table with at least one column") {
    Tables.names.foreach { n =>
      val sig = DriftCheck.footerSignature(s"${sf("sf0.001")}/$n.parquet")
      assert(sig.nonEmpty, s"$n footer signature empty")
      assert(sig.forall(_.contains(":")), s"$n malformed signature: $sig")
    }
  }

  test("events.ts footer shape is one the engine reads (micros or nanos era)") {
    val sig = DriftCheck.footerSignature(s"${sf("sf0.001")}/events.parquet")
    val ts = sig.find(_.startsWith("ts:")).getOrElse(fail("no ts column"))
    assert(ts.contains("INT64"), s"unexpected ts physical type: $ts")
  }

  test("Tables.events normalizes ts to TimestampType on current data") {
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(spark, sf("sf0.001"))
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(5).count() == 5)
  }
}
