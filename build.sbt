ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkstreamingrawdataingestionspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON. Two sbt behaviors defeated that in r10–r12 (BENCH `parsed` null
// three rounds running): (a) the forked program's stdout is routed
// through sbt's logger and prefixed `[info] `, so the JSON line never
// starts with `{`; (b) sbt appends its own `[success] Total time: …`
// line AFTER the program's output, so the program's JSON is never last.
// StdoutOutput passes the forked JVM's stdout through verbatim;
// showSuccess drops the trailing banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g measured BEST here despite 125 GiB free: an r12 A/B (3 floor
  // passes each) read the heavy pair queries stable at 8g (q121
  // 8.4/8.4 s) but wildly variable at Xms=Xmx=24g (13-48 s, one 109 s
  // q130 — G1 young-gen pauses scale with the heap while the win
  // doesn't). Leave the rest of RAM to the OS page cache.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
