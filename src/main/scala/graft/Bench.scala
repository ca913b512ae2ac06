package graft
import graft.core.Sessions
/** Benchmark main — one JSON line with per-query wall-clock seconds.
  *
  * Methodology (fixes the round-1 weaknesses):
  *  - action is a noop-format write, not count(): count() lets Catalyst
  *    prune the final projection, under-measuring projection-heavy
  *    queries (string/math/json). The noop sink materializes every row.
  *  - one discarded warmup pass absorbs JVM/codegen/classloading cost so
  *    per-query numbers are comparable across rounds regardless of map
  *    iteration order.
  *  - failures are NOT swallowed: a failing query records its error and
  *    the JSON carries an "errors" object (empty when all green).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.envCpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }

    run("q07_multiway_join") // warmup: joins+agg+scan, result discarded

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n))
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val qs = results.collect { case (k, Right(v)) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) => s"\"$k\":\"${esc(m)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
