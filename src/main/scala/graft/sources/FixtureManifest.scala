package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Content pins for the driver-generated documents fixture (r18
  * verdict #6 / next-round #3): q280 pins measured SimHash recall
  * constants (26/23/229 keyed on truth-pair counts 28/25/256) and
  * q281 pins the BPE round-1 replay (n_merges = 40, first merge) —
  * both are FIXTURE-DERIVED. If the driver ever regenerates
  * `documents.parquet`, those oracles would surface as a bare hash
  * mismatch with no hint of the cause. This check runs at Verify
  * startup and fails LOUDLY instead, naming the re-pin procedure.
  *
  * The fingerprint is layout-independent data content: row count +
  * bit_xor of xxhash64 over every column of every row (order- and
  * file-split-insensitive; bit_xor cannot overflow under ANSI
  * arithmetic). Unknown directory basenames (ScaleBench synthetic
  * corpora, ad-hoc paths) skip the check — only the three pinned
  * driver fixtures are gated.
  *
  * To RE-PIN after an intentional regeneration:
  *   sbt "runMain graft.sources.FixtureManifest /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1"
  * then update `pins` below AND re-measure the q280 recall constants
  * and q281 merge-table pins (SparkEntry.oracleSql scaladoc there).
  */
object FixtureManifest {

  /** sf-dir basename -> (n_docs, bit_xor fingerprint). */
  val pins: Map[String, (Long, Long)] = Map(
    "sf0.001" -> (500L, 6996226434420148234L),
    "sf0.01"  -> (500L, -2554157057959591890L),
    "sf0.1"   -> (5000L, -8012191225800181670L))

  def fingerprint(spark: SparkSession, sfDir: String): (Long, Long) = {
    val r = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(count(lit(1)).cast("long"),
        expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  def check(spark: SparkSession, sfDir: String): Unit =
    checkAgainst(spark, sfDir, pins)

  private[sources] def checkAgainst(spark: SparkSession, sfDir: String,
      pinned: Map[String, (Long, Long)]): Unit = {
    val base = new java.io.File(sfDir).getName
    pinned.get(base).foreach { case (wantN, wantFp) =>
      val (gotN, gotFp) = fingerprint(spark, sfDir)
      if (gotN != wantN || gotFp != wantFp)
        throw new IllegalStateException(
          s"FIXTURE REGENERATED: $base/documents.parquet fingerprint " +
            s"($gotN, $gotFp) != pinned ($wantN, $wantFp). The q280 " +
            "SimHash recall constants and q281 BPE merge pins are " +
            "measured against the OLD fixture and must be re-measured " +
            "before correctness results mean anything — see " +
            "graft.sources.FixtureManifest scaladoc for the re-pin " +
            "procedure.")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(graft.core.Sessions.envCpus,
      "graft-fixture-manifest")
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val (n, fp) = fingerprint(spark, dir)
      println(s"""    "${new java.io.File(dir).getName}" -> (${n}L, ${fp}L),""")
    }
    spark.stop()
  }
}
