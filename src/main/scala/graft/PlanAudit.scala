package graft

import graft.core.Sessions

/** Plan audit: prints, for every declared query (or an
  * args-selected subset), the distinct parquet ReadSchema / PushedFilters
  * lines and whether the plan contains the shapes that should never
  * appear unannounced (CartesianProduct, global Sort under an agg). The
  * per-round .explain discipline, mechanized: a scan that reads all
  * columns for a two-column projection, or a filter that failed to push,
  * shows up here before it shows up in the bench.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [q01 q02 ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.001")
    val only = args.filterNot(_.startsWith("/")).toSet
    val spark = Sessions.local(Sessions.envCpus, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.exists(name.startsWith)) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val reads = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList.distinct
          val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList
            .distinct.filter(_ != "PushedFilters: []")
          val flags = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
            .collect { case (f, true) => f }
          println(s"== $name ==")
          reads.foreach(r => println(s"  ${r.take(160)}"))
          pushed.foreach(p => println(s"  ${p.take(160)}"))
          if (flags.nonEmpty) println(s"  flags: ${flags.mkString(", ")}")
        } catch {
          case e: Throwable => println(s"== $name ==\n  ERROR: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
