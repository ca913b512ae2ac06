package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.{KafkaSource, Tables}
import graft.streaming.Sinks

/** Source adapters (A1 Kafka wiring, CSV/JSON scans) and sink helpers
  * (A8 limit-10 semantics, foreachBatch fan-out). */
class SourcesSinksSpec extends SparkSpec {

  test("kafka option map mirrors the reference's direct-stream config") {
    val opts = KafkaSource.options(KafkaSource.Config(
      bootstrapServers = "broker-1:9092,broker-2:9092",
      topics = Seq("rawdata", "rawdata2"),
      maxOffsetsPerTrigger = Some(50000L)))
    assert(opts("kafka.bootstrap.servers") == "broker-1:9092,broker-2:9092")
    assert(opts("subscribe") == "rawdata,rawdata2") // comma-join, :80-81
    assert(opts("startingOffsets") == "earliest")   // auto.offset.reset=smallest, :97
    assert(opts("failOnDataLoss") == "true")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    intercept[IllegalArgumentException](KafkaSource.options(
      KafkaSource.Config("b:9092", Seq.empty)))
    intercept[IllegalArgumentException](KafkaSource.options(
      KafkaSource.Config("b:9092", Seq("a,b"))))
  }

  test("kafka value projection casts binary value to string (A3)") {
    val kafkaShaped = spark.createDataFrame(Seq(
      ("k1".getBytes, """{"datastream_id":1,"data":[]}""".getBytes),
      ("k2".getBytes, "plain".getBytes))).toDF("key", "value")
    val vals = KafkaSource.values(kafkaShaped).collect().map(_.getString(0))
    assert(vals.sameElements(Array("""{"datastream_id":1,"data":[]}""", "plain")))
  }

  test("CSV and JSON-lines scans of nation match the parquet scan") {
    val pq = Tables.nation(spark, sf("sf0.001"))
    val csvDir = tmpDir("nation_csv")
    val jsonDir = tmpDir("nation_json")
    pq.write.mode("overwrite").option("header", "true").csv(csvDir)
    pq.write.mode("overwrite").json(jsonDir)

    val expect = pq.orderBy("n_nationkey").collect().toSeq
    val fromCsv = Tables.csv(spark, csvDir, pq.schema).orderBy("n_nationkey").collect().toSeq
    val fromJson = Tables.jsonLines(spark, jsonDir, pq.schema).orderBy("n_nationkey").collect().toSeq
    assert(fromCsv == expect)
    assert(fromJson == expect)
    assert(Tables.csv(spark, csvDir, pq.schema).schema == pq.schema) // explicit, not inferred
  }

  test("ORC roundtrip of lineitem matches the parquet scan, with pushdown") {
    val pq = Tables.lineitem(spark, sf("sf0.001"))
    val orcDir = tmpDir("lineitem_orc")
    pq.write.mode("overwrite").orc(orcDir)
    val orc = Tables.orc(spark, orcDir, pq.schema)
    val key = Seq("l_orderkey", "l_linenumber").map(col)
    assert(orc.orderBy(key: _*).collect().toSeq ==
      pq.orderBy(key: _*).collect().toSeq)
    // the ORC reader keeps the parquet reader's posture: vectorized
    // batch scan + filter pushed to the scan node
    val plan = orc.filter(col("l_quantity") > 45).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"), plan)
  }

  test("A8: foreachBatchLimit hands the sink at most 10 rows per batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Int]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val q = Sinks.foreachBatchLimit(mem.toDF(), 10,
      org.apache.spark.sql.streaming.Trigger.AvailableNow()) { (rows, id) =>
      seen.synchronized { seen += ((id, rows.length)); () }
    }
    mem.addData(1 to 25: _*)
    q.processAllAvailable(); q.stop()
    assert(seen.nonEmpty && seen.forall(_._2 <= 10))
    assert(seen.map(_._2).sum >= 10) // the limit actually engaged
  }

  test("fanOut computes the batch once and feeds every sink") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Int]
    val a = scala.collection.mutable.ArrayBuffer.empty[Int]
    val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = Sinks.fanOut(mem.toDF().select(col("value") * 2 as "v"),
      tmpDir("fanout_ckpt"),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      (df, _) => a.synchronized { a ++= df.collect().map(_.getInt(0)); () },
      (df, _) => b.synchronized { b ++= df.collect().map(_.getInt(0)); () })
    mem.addData(1, 2, 3)
    q.processAllAvailable(); q.stop()
    assert(a.sorted == Seq(2, 4, 6) && b.sorted == Seq(2, 4, 6))
  }
}
