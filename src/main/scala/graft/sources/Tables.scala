package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-table registry over the driver-provided parquet test data
  * (see /root/repo/TESTDATA.md and FIXTURES.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters and prunes
  * columns into the scan, so query code should never pre-select here.
  *
  * `events` needs special handling: the driver has shipped its `ts`
  * column in two physical shapes across rounds — INT64
  * TIMESTAMP(NANOS,false) (which Spark 4.x refuses natively,
  * [PARQUET_TYPE_ILLEGAL], so with `nanosAsLong=true` it arrives as
  * LongType nanoseconds) and, since 2026-08-13, plain INT64
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). `events` sniffs the
  * loaded schema and normalizes both to a session-zone TimestampType
  * in microseconds — the type every downstream query was verified
  * against. Under the UTC session zone (graft.core.Sessions) the
  * NTZ→LTZ cast is value-identity, and ns→us truncation is exact for
  * this data (values are ms-granular), matching what the DuckDB
  * oracle sees after any date_trunc/aggregation.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other    => spark.read.parquet(s"$sfDir/$other.parquet")
    }

  def region(spark: SparkSession, d: String): DataFrame    = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Sessions sets spark.sql.legacy.parquet.nanosAsLong=true at build
    // time (harmless for micros-era data; required for nanos-era) — a
    // table accessor must not mutate session conf as a side effect.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>          // nanos-era testdata read via nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>  // micros-era testdata (TIMESTAMP_NTZ)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected INT64 nanos, " +
          "TIMESTAMP_NTZ micros, or TIMESTAMP)")
    }
  }

  /** Register every table as a temp view (SQL-surface entry point). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  // ---- non-parquet file sources (SURVEY.md §2.2 scans row) ----
  //
  // Schema-explicit by design: schema inference is a full extra pass
  // over the data (unacceptable at 100 TB) and can silently drift types
  // between runs. Callers pass the StructType; the reader never infers.

  /** CSV scan (header expected, RFC-4180 quoting). Malformed rows go to
    * a `_corrupt_record` column (PERMISSIVE) rather than failing the
    * scan — same quarantine philosophy as streaming ingest (§1.4.1). */
  def csv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines scan (one object per line — the splittable form). */
  def jsonLines(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — the second columnar format (built into Spark; same
    * vectorized reader, predicate pushdown, and column pruning class as
    * parquet). Schema passed explicitly like every reader here. */
  def orc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
