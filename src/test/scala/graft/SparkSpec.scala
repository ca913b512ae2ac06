package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per suite via lazy val),
  * built through the same bootstrap as the CLI mains (graft.core.Sessions)
  * so tests see identical conf (UTC, nanosAsLong, AQE). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.Sessions.local(4, getClass.getSimpleName)

  def sf(name: String): String = s"/root/testdata/$name"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
