package graft

import graft.core.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One-off discovery: which declared oracle strings run through
  * spark.sql and match the DataFrame API (the SqlCanarySpec
  * extension's exemption-list source). Prints one line per query:
  * OK / PARSE <err> / MISMATCH. */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = Sessions.local(Sessions.envCpus, "canary-probe")
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    def canon(df: DataFrame): Seq[Vector[String]] = {
      val cols = df.columns.sorted.map(col(_))
      df.select(cols.toIndexedSeq: _*).collect().iterator.map { r =>
        r.toSeq.map {
          case null => "∅"
          case t: java.sql.Timestamp if t.toString.endsWith(" 00:00:00.0") =>
            t.toString.stripSuffix(" 00:00:00.0")
          case d: java.math.BigDecimal =>
            val s = d.stripTrailingZeros
            if (s.unscaledValue.signum == 0) "0" else s.toPlainString
          case d: Double =>
            if (d == math.rint(d) && math.abs(d) < 1e15) math.rint(d).toLong.toString
            else d.toString
          case f: Float =>
            val d = f.toDouble
            if (d == math.rint(d) && math.abs(d) < 1e15) math.rint(d).toLong.toString
            else d.toString
          case x => x.toString
        }.toVector
      }.toVector.sortBy(_.mkString("|"))
    }
    SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
      val r = try {
        val sql = canon(spark.sql(SparkEntry.oracleSql(name)))
        val api = canon(SparkEntry.queries(name)(spark, dir))
        if (api == sql) "OK"
        else s"MISMATCH api=${api.size} sql=${sql.size} firstApi=${api.diff(sql).headOption.map(_.mkString(",").take(80))} firstSql=${sql.diff(api).headOption.map(_.mkString(",").take(80))}"
      } catch { case e: Throwable =>
        s"ERR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").replace('\n', ' ').take(160)}"
      }
      println(s"CANARY $name $r")
    }
    spark.stop()
  }
}
