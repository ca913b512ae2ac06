package graft

import graft.core.Sessions
import org.apache.spark.sql.functions._

/** One-off probe: dump (x, exp, sin, cos, asin-of-unit) over a varied
  * deterministic input range so the DuckDB side can be compared
  * bit-for-bit (extends the sqrt/ln/log10/pow libm-equality evidence
  * to the trig/exp surface before any operator relies on it). */
object LibmProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "libm-probe")
    spark.sparkContext.setLogLevel("WARN")
    // three regimes: lat/lon radians (|x| <= pi), logistic margins
    // (|x| <= 40), tiny haversine args (|x| <= 0.05)
    val base = spark.range(200000).select(
      (conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
        .cast("double") / 2.8147497671065e14 * 2.0 - 1.0).as("u"))
    val xs = base.select(col("u"),
      (col("u") * math.Pi).as("xrad"),
      (col("u") * 40.0).as("xmarg"),
      (col("u") * 0.05).as("xsmall"))
    xs.select(
        col("u"), col("xrad"), col("xmarg"), col("xsmall"),
        exp(col("xmarg")).as("e_marg"),
        sin(col("xrad")).as("s_rad"),
        cos(col("xrad")).as("c_rad"),
        sin(col("xsmall")).as("s_small"),
        asin(abs(col("u"))).as("as_u"),
        sqrt(abs(col("u"))).as("sq_u"))
      .write.mode("overwrite").parquet("/tmp/libm_probe")
    spark.stop()
  }
}
