package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Kafka source adapter — the Spark-native rebuild of the reference's
  * only source (A1, RawDataIngestion.java:95-100): a receiver-less
  * "direct" stream over a set of topics with string values, starting
  * from the earliest retained offset (`auto.offset.reset=smallest`,
  * :97 → `startingOffsets=earliest` in Structured Streaming).
  *
  * The option map is a pure function (unit-testable with no broker).
  * `readStream` issues the real `format("kafka")` load — it requires
  * the spark-sql-kafka connector jar on the classpath, which this
  * offline build environment does not ship. Resolution was attempted
  * and is impossible here (verified round 5:
  * `org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2` is absent from
  * /opt/spark/jars, absent from the offline coursier cache, and an
  * `sbt update` against it fails with "Not found"; re-verified rounds
  * 9 and 10 — same result, and r10 also confirmed zero network egress
  * to Maven Central); a connected
  * deployment adds the artifact (Provided scope) and this object works
  * unchanged. In THIS build the full wiring is exercised end-to-end
  * minus the broker by [[KafkaContractSource]] (r17): a DSv2
  * micro-batch source speaking the same option surface and wire
  * schema replays scripted records through subscribe filtering,
  * earliest/latest semantics, per-topic-partition parallelism,
  * checkpointed offsets, and the A3→A5 Ingest chain
  * (KafkaContractSpec). Everything
  * downstream of the source is source-agnostic: `values(df)` produces
  * the same `value: string` column contract the file and MemoryStream
  * test sources feed into graft.streaming.Ingest.
  */
object KafkaSource {

  /** Connection + subscription config (topics from a comma-split arg in
    * the reference, RawDataIngestion.java:80-81). */
  final case class Config(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest", // reference :97
      failOnDataLoss: Boolean = true,
      maxOffsetsPerTrigger: Option[Long] = None)

  /** The exact option map handed to the DataStreamReader. */
  def options(cfg: Config): Map[String, String] = {
    require(cfg.topics.nonEmpty, "at least one topic")
    require(cfg.topics.forall(t => t.nonEmpty && !t.contains(",")),
      "topic names must be non-empty and comma-free (subscribe is comma-joined)")
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topics.mkString(","),
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString
    ) ++ cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
  }

  /** Streaming read. One Spark partition per Kafka topic-partition —
    * the same parallelism contract as the reference's direct stream. */
  def readStream(spark: SparkSession, cfg: Config): DataFrame =
    spark.readStream.format("kafka").options(options(cfg)).load()

  /** A3 — value projection: drop the Kafka key, cast the value bytes to
    * string (the reference's `._2` map, RawDataIngestion.java:103-110).
    * Works on any DataFrame carrying a binary/string `value` column. */
  def values(df: DataFrame): DataFrame =
    df.select(col("value").cast("string").as("value"))
}
