package graft
import graft.core.Sessions
import graft.streaming.Ingest
import org.apache.spark.sql.functions._
/** Benchmark main — one JSON line with per-query wall-clock seconds.
  *
  * Methodology (fixes the round-1 weaknesses):
  *  - action is a noop-format write, not count(): count() lets Catalyst
  *    prune the final projection, under-measuring projection-heavy
  *    queries (string/math/json). The noop sink materializes every row.
  *  - a FULL discarded warmup pass over every query absorbs JVM/codegen/
  *    classloading cost per expression class. (A single-query warmup is
  *    not enough: round 2 showed a one-time ~10 s string-expression
  *    codegen/JIT cost landing on whichever query first touched that
  *    path, a 14× phantom regression on q02.)
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(run) // full warmup pass, results discarded
    val results = names.map(n => n -> run(n))

    // S1 ingestion throughput (BASELINE.md): synthetic envelopes with 10
    // datapoints each through the reference pipeline (parse → explode →
    // derivations; narrow, zero-shuffle). rows/s = exploded DataPoints/s.
    val s1RowsPerSec = {
      val envelopes = 200000L
      val perEnv = 10
      val raw = spark.range(envelopes).select(concat(
        lit("""{"datastream_id":"""), col("id") % 500, lit(""","data":["""),
        concat_ws(",", (0 until perEnv).map(i => concat(
          lit("""{"dateTime":"""), col("id") * 1000L + i,
          lit(s""","offset":${i * 61000},"sample":{"v":"""), col("id") + i,
          lit("}}"))): _*),
        lit("]}")).as("value"))
      raw.persist().count() // materialize: measure the pipeline, not the generator
      Ingest.dataPoints(Ingest.parse(raw))
        .write.format("noop").mode("overwrite").save() // warmup
      val t0 = System.nanoTime()
      Ingest.dataPoints(Ingest.parse(raw))
        .write.format("noop").mode("overwrite").save()
      val rps = envelopes * perEnv / ((System.nanoTime() - t0) / 1e9)
      raw.unpersist()
      rps
    }
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val qs = results.collect { case (k, Right(v)) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) => s"\"$k\":\"${esc(m)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"s1_ingest_rows_per_sec":${s1RowsPerSec.round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
