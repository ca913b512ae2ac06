package graft
import java.nio.file.{Files, Paths}
import graft.core.Sessions
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: regex over query names — local-iteration filter
    // (the driver always runs the full map)
    val keep: String => Boolean =
      if (args.length > 2) { val re = args(2).r; n => re.findFirstIn(n).isDefined }
      else _ => true
    graft.sources.DriftCheck.run(sfDir) // testdata-drift tripwire (fail fast)
    val spark = Sessions.local(Sessions.envCpus, "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    // fixture-regeneration tripwire: q280/q281 pin fixture-measured
    // constants — a silently regenerated documents.parquet must fail
    // HERE with the re-pin procedure, not as a bare hash mismatch
    graft.sources.FixtureManifest.check(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
