package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet batch formats under the ORACLE gate (r11).
  *
  * [[Tables.csv]]/[[Tables.orc]] and the row-level round-trip contracts
  * live in SourcesSinksSpec; q96 additionally puts the reader+WRITER
  * pairs under the driver's hash gate: a deterministic lineitem slice is
  * round-tripped engine-side through ORC and CSV, and an aggregate over
  * each read-back must hash-match the DuckDB aggregate computed over the
  * same slice of the PARQUET table. A type-fidelity defect anywhere in
  * either format path (CSV quoting/escaping, date rendering, double
  * parsing, ORC type mapping) breaks the hash.
  */
object Formats {

  /** Q96 — ORC + CSV round-trip gate. The slice casts `l_shipdate` to
    * DATE (CSV's portable calendar type; the raw micros timestamps are
    * midnight-valued in this data) and sums quantities as DECIMAL
    * internally (the q13 discipline — double sums are partition-order
    * dependent and would hash-flap). Writes go to a fresh temp dir per
    * invocation — the query stays deterministic and re-runnable; a
    * production deployment points the same writers at reliable
    * storage. */
  def q96(s: SparkSession, d: String): DataFrame = {
    val slice = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"),
        col("l_shipdate").cast("date").as("ship_date"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q96").toString
    slice.write.mode("overwrite").orc(s"$dir/orc")
    slice.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = Seq(
      "orc" -> Tables.orc(s, s"$dir/orc", slice.schema),
      "csv" -> Tables.csv(s, s"$dir/csv", slice.schema))
    back.map { case (fmt, df) =>
      df.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_price"),
          max("ship_date").as("max_ship"))
        .withColumn("format", lit(fmt))
        .select("format", "l_returnflag", "n_rows", "sum_qty", "sum_price", "max_ship")
    }.reduce(_.union(_)).orderBy("format", "l_returnflag")
  }
}
