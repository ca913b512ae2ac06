package graft

import graft.core.Sessions

/** Dump `.explain("formatted")` for a set of declared queries to files —
  * the r19 optimization-round evidence trail (plans/r19/<q>_{before,after}.txt).
  * Read-only over the registry: builds each query's DataFrame and prints the
  * plan; nothing executes beyond what plan construction itself runs (some
  * operators materialize bounded frames eagerly — their cost is the query's
  * own documented prefix, unchanged here).
  *
  * Usage: sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [q01 q02 ...]"
  * Writes <outDir>/<queryname>_<suffix>.txt per query (full registry when no
  * query args are given).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [queries...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names0 = args.drop(3).toSeq
    val spark = Sessions.local(Sessions.envCpus, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (names0.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
        .filter(k => names0.exists(p => k == p || k.startsWith(p + "_") || k.startsWith(p)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
        System.err.println(s"[plandump] $n -> ${n}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
