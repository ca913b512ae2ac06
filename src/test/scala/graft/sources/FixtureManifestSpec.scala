package graft.sources

import graft.SparkSpec

/** The fixture-regeneration tripwire (r18 verdict next-round #3):
  * q280/q281 pin fixture-measured constants, so a silently
  * regenerated documents.parquet must fail at Verify startup with
  * the re-pin procedure — never as a bare oracle hash mismatch. */
class FixtureManifestSpec extends SparkSpec {

  test("the committed pins match the live sf0.001 fixture (check passes)") {
    FixtureManifest.check(spark, sf("sf0.001")) // must not throw
  }

  test("a regenerated fixture fails loudly with the re-pin procedure") {
    val e = intercept[IllegalStateException] {
      FixtureManifest.checkAgainst(spark, sf("sf0.001"),
        Map("sf0.001" -> (500L, 12345L))) // stale pin = pre-regen value
    }
    assert(e.getMessage.contains("FIXTURE REGENERATED"))
    assert(e.getMessage.contains("q280"))
    assert(e.getMessage.contains("re-pin"))
  }

  test("unknown directories (synthetic corpora) skip the check") {
    FixtureManifest.checkAgainst(spark, "/no/such/dir-xyz",
      FixtureManifest.pins) // not pinned -> no read, no throw
  }

  test("the fingerprint is data-content sensitive") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("fm")
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    docs.write.parquet(s"$dir/documents.parquet")
    val base = FixtureManifest.fingerprint(spark, dir)
    // layout-insensitive: a repartitioned rewrite fingerprints the same
    val dir2 = tmpDir("fm")
    docs.repartition(7).write.parquet(s"$dir2/documents.parquet")
    assert(FixtureManifest.fingerprint(spark, dir2) == base)
    // content-sensitive: one flipped character changes it
    val dir3 = tmpDir("fm")
    docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
      .write.parquet(s"$dir3/documents.parquet")
    assert(FixtureManifest.fingerprint(spark, dir3) != base)
  }
}
