package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-table registry over the driver-provided parquet test data
  * (see /root/repo/TESTDATA.md and FIXTURES.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters and prunes
  * columns into the scan, so query code should never pre-select here.
  *
  * `events` needs special handling: its `ts` column is INT64
  * TIMESTAMP(NANOS,false), which Spark 4.x refuses to read natively
  * ([PARQUET_TYPE_ILLEGAL]). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrives as LongType
  * nanoseconds) and convert to a microsecond timestamp. Truncation
  * ns→us is exact for this data (values are ms-granular) and matches
  * what the DuckDB oracle sees after any date_trunc/aggregation.
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
    // Requires spark.sql.legacy.parquet.nanosAsLong=true, set once at
    // session build time (graft.core.Sessions) — a table accessor must
    // not mutate session conf as a side effect.
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet has INT64 TIMESTAMP(NANOS) columns; build the session " +
        "via graft.core.Sessions (sets spark.sql.legacy.parquet.nanosAsLong=true)")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
