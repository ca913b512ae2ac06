package graft.model

import org.apache.spark.sql.types._

/** The engine's ingestion row — the Spark-native equivalent of the
  * reference's output POJO (reference: cassandra/DataPoint.java:32–38,
  * field derivations RawDataIngestion.java:136–140).
  *
  * Deviation from the reference (documented, SURVEY.md §1.4.3): `day`
  * is derived in UTC, not JVM-default timezone, for reproducibility.
  */
final case class DataPoint(
    datastream_id: Int,
    day: String,               // yyyyMMdd, UTC calendar day of `datetime`
    datetime: java.sql.Timestamp, // event time, ms precision
    offset: Int,               // envelope offset ms → whole minutes, truncated toward zero
    sample: String)            // raw JSON payload, kept opaque

object Envelope {

  /** Input envelope schema — exactly the fields the reference reads
    * (RawDataIngestion.java:134–140). `sample` is declared StringType so
    * the JSON parser captures the raw JSON text of any value shape
    * (object/array/scalar), reproducing the reference's
    * `get("sample").toString()` opacity. */
  val schema: StructType = StructType(Seq(
    StructField("datastream_id", IntegerType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("dateTime", LongType),
      StructField("offset", IntegerType),
      StructField("sample", StringType)))))))
}
