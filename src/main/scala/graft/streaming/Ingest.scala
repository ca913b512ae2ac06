package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** The reference pipeline (S1), rebuilt as declarative column
  * expressions over either a batch or a streaming DataFrame — the same
  * plan works for both (Structured Streaming's incremental execution).
  *
  * Reference semantics reproduced (RawDataIngestion.java:129–149):
  *   - 1 envelope → N rows via explode of the `data` array (:134)
  *   - datastream_id (:136)
  *   - day = yyyyMMdd of dateTime (:137; UTC here — documented deviation)
  *   - datetime = timestamp of epoch-ms dateTime (:138)
  *   - offset = offset / 60000 with Java int division, truncating
  *     toward zero incl. negatives (:139 — `div` matches)
  *   - sample kept as the raw JSON text of whatever value shape (:140)
  *
  * Deviation (SURVEY.md §1.4.1): malformed/structurally-invalid
  * envelopes go to a quarantine output instead of crashing the batch
  * (the reference NPEs on them).
  *
  * Scale notes: the whole pipeline is narrow (zero shuffles) — parse,
  * explode and the scalar derivations pipeline inside one
  * WholeStageCodegen stage, so ingestion parallelism = source
  * partitions, exactly like the reference's direct-stream design but
  * with codegen'd JSON projection instead of per-record Gson DOM
  * parsing (reference inefficiency, SURVEY.md §4.1.2).
  */
object Ingest {

  /** Raw envelope text column → parsed struct (PERMISSIVE: unparseable
    * rows yield a null struct rather than failing the task). */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.withColumn("env", from_json(col(valueCol), Envelope.schema))

  private def invalid: Column =
    col("env").isNull || col("env.data").isNull || col("env.datastream_id").isNull

  /** Rows the reference would have crashed on: kept, routed aside. */
  def quarantine(parsed: DataFrame, valueCol: String = "value"): DataFrame =
    parsed.filter(invalid).select(col(valueCol).as("corrupt_record"))

  /** The envelope→DataPoint transform (schema = graft.model.DataPoint). */
  def dataPoints(parsed: DataFrame): DataFrame =
    parsed.filter(!invalid)
      .select(col("env.datastream_id").as("datastream_id"), explode(col("env.data")).as("d"))
      .select(
        col("datastream_id"),
        date_format(timestamp_millis(col("d.dateTime")), "yyyyMMdd").as("day"),
        timestamp_millis(col("d.dateTime")).as("datetime"),
        expr("d.offset div 60000").cast("int").as("offset"),
        col("d.sample").as("sample"))

  /** Full pipeline: raw strings → (datapoints, quarantine). */
  def apply(raw: DataFrame, valueCol: String = "value"): (DataFrame, DataFrame) = {
    val parsed = parse(raw, valueCol)
    (dataPoints(parsed), quarantine(parsed, valueCol))
  }
}
