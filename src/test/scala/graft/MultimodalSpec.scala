package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal struct(meta)+binary(payload) convention (SURVEY.md §2.5):
  * pack/accessor round-trip, deterministic feature stub, frame sampling,
  * partitioned-parquet round-trip with partition pruning + metadata
  * predicate pushdown visible in the physical plan. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    // boxed Integers throughout the nullable dim columns: mixing Scala Int
    // and null would make the tuple element infer as Any (no encoder)
    val ni = null.asInstanceOf[Integer]
    def i(v: Int): Integer = Integer.valueOf(v)
    val rows = Seq(
      (1L, "image", "image/png", Array.range(0, 64).map(_.toByte), i(8), i(8), ni, ni),
      (2L, "audio", "audio/wav", Array.range(0, 160).map(x => (x % 7).toByte), ni, ni, i(16000), ni),
      (3L, "video", "video/mp4", Array.range(0, 300).map(x => (x % 11).toByte), i(16), i(16), ni, i(30)))
    spark.createDataFrame(rows).toDF(
      "id", "kind", "ct", "bytes", "w", "h", "sr", "nf")
      .select(col("id"), Multimodal.pack(
        col("kind"), col("ct"), col("bytes"),
        col("w"), col("h"), col("sr"), col("nf")).as("media"))
  }

  test("pack/accessors round-trip metadata and payload") {
    val r = media.select(
      Multimodal.kind(col("media")).as("k"),
      Multimodal.contentType(col("media")).as("ct"),
      Multimodal.payloadSize(col("media")).as("sz"),
      Multimodal.width(col("media")).as("w"),
      Multimodal.sampleRate(col("media")).as("sr"))
      .orderBy("k").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(r.map(_.getInt(2)).toSeq == Seq(160, 64, 300))
    assert(r(1).getInt(3) == 8 && r(0).getInt(4) == 16000)
    assert(r(0).isNullAt(3)) // audio has no width
  }

  test("decodeFeaturesStub is deterministic, bounded, payload-derived") {
    val f1 = media.select(col("id"), Multimodal.decodeFeaturesStub(col("media")).as("f"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    val f2 = media.select(col("id"), Multimodal.decodeFeaturesStub(col("media")).as("f"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    assert(f1.zip(f2).forall { case (a, b) => a == b })
    assert(f1.forall(v => v.length == 16 && v.forall(x => x >= 0.0 && x < 1.0)))
    assert(f1(0) != f1(1)) // different payloads → different features
  }

  test("frameSample slices payload into stride-spaced frames") {
    val frames = media.filter(col("id") === 3)
      .select(Multimodal.frameSample(col("media"), 20, 100).as("fr"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.length == 3 && frames.forall(_.length == 20))
    // frame i begins at byte i*stride of the payload
    assert(frames(1)(0) == (100 % 11).toByte)
  }

  test("partitioned parquet round-trip; kind scan does partition pruning and never reads payload") {
    val dir = tmpDir("media")
    Multimodal.writePartitioned(media, "media", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // payload survives byte-exact
    val orig = media.select(col("id"), Multimodal.payload(col("media")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    back.select(col("id"), Multimodal.payload(col("media")).as("p")).collect()
      .foreach(r => assert(r.getAs[Array[Byte]](1).toSeq == orig(r.getLong(0))))

    val pruned = back.filter(col("media_kind") === "image")
      .select(col("id"), Multimodal.width(col("media")).as("w"))
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter on media_kind, and ReadSchema prunes to meta only
    assert(plan.contains("media_kind"), plan)
    assert(!plan.contains("payload") || plan.contains("ReadSchema"), plan)
    val readSchema = "ReadSchema: .*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("payload"), s"payload not pruned: $readSchema")
  }
}
