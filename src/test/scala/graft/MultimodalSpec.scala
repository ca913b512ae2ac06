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

  // ---- REAL decoders (JDK codecs: ImageIO + javax.sound) ----

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: real PNG decode recovers dimensions and channel means") {
    // left half pure red, right half pure blue, 8x8
    val bytes = pngBytes(8, 8)((x, _) => if (x < 4) 0xFF0000 else 0x0000FF)
    val df = spark.createDataFrame(Seq(Tuple1(bytes))).toDF("p")
      .select(Multimodal.pack(lit("image"), lit("image/png"), col("p")).as("m"))
    val r = df.select(Multimodal.decodeImage(col("m")).as("d")).select("d.*").head()
    assert(r.getInt(0) == 8 && r.getInt(1) == 8)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-9) // mean_r: half the pixels full red
    assert(math.abs(r.getDouble(3) - 0.0) < 1e-9) // mean_g
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9) // mean_b
  }

  test("imageGridFeatures: luminance grid separates dark and bright halves") {
    // top half black, bottom half white, 8x8; 2x2 grid row-major
    val bytes = pngBytes(8, 8)((_, y) => if (y < 4) 0x000000 else 0xFFFFFF)
    val df = spark.createDataFrame(Seq(Tuple1(bytes))).toDF("p")
      .select(Multimodal.pack(lit("image"), lit("image/png"), col("p")).as("m"))
    val f = df.select(Multimodal.imageGridFeatures(col("m"), 2, 2).as("f"))
      .head().getSeq[Double](0)
    assert(f.length == 4)
    assert(f(0) < 1e-9 && f(1) < 1e-9, s"top cells not black: $f")
    assert(f(2) > 1.0 - 1e-9 && f(3) > 1.0 - 1e-9, s"bottom cells not white: $f")
  }

  test("resizeImage: real downscale halves dimensions, re-decodable, never upscales") {
    val bytes = pngBytes(16, 8)((_, _) => 0x808080)
    val df = spark.createDataFrame(Seq(Tuple1(bytes))).toDF("p")
      .select(Multimodal.pack(lit("image"), lit("image/png"), col("p")).as("m"))
    val resized = df.select(Multimodal.resizeImage(col("m"), 8, 8).as("m2"))
    val meta = resized.select(
      Multimodal.width(col("m2")), Multimodal.height(col("m2"))).head()
    assert(meta.getInt(0) == 8 && meta.getInt(1) == 4) // aspect preserved
    // the resized payload is itself a decodable PNG with those dims
    val rt = resized.select(Multimodal.decodeImage(col("m2")).as("d")).select("d.*").head()
    assert(rt.getInt(0) == 8 && rt.getInt(1) == 4)
    // no upscale: asking for a larger box returns the original dims
    val same = df.select(Multimodal.resizeImage(col("m"), 100, 100).as("m2"))
      .select(Multimodal.width(col("m2"))).head().getInt(0)
    assert(same == 16)
  }

  test("decodeWav: real RIFF/PCM decode recovers rate, frames, and RMS") {
    // 16-bit mono 8kHz, 800 frames of a constant half-amplitude sample
    val n = 800
    val amp = 16384 // 0.5 in 16-bit
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) { pcm(2 * i) = (amp & 0xff).toByte; pcm(2 * i + 1) = (amp >> 8).toByte }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(Seq(Tuple1(bos.toByteArray))).toDF("p")
      .select(Multimodal.pack(lit("audio"), lit("audio/wav"), col("p")).as("m"))
    val r = df.select(Multimodal.decodeWav(col("m")).as("d")).select("d.*").head()
    assert(r.getInt(0) == 8000 && r.getInt(1) == 1 && r.getLong(2) == n)
    assert(math.abs(r.getDouble(3) - amp / 32768.0) < 1e-6)
  }

  test("q53 metadata-oracle query: codec roundtrip reproduces the arithmetic ground truth") {
    val rows = Multimodal.q53(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (r.getString(1) == "image") {
        assert(r.getInt(2) == 8 + (id % 8).toInt && r.getInt(3) == 4 + (id % 4).toInt)
        val expected = BigDecimal((id % 256) / 255.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(4) == expected, s"doc $id mean ${r.getDouble(4)} != $expected")
      } else {
        assert(r.getInt(5) == 8000 + (id % 4).toInt * 4000)
        assert(r.getLong(6) == 400 + (id % 100) && r.getDouble(7) == 0.5)
      }
    }
  }

  test("aHash: identical images hash equal, noise variants land near, distinct images far") {
    import org.apache.spark.sql.functions._
    def hash(xs: Int, ys: Int, phase: Int, noise: Int): Long =
      spark.range(1).select(Multimodal.aHashUdf(
        Multimodal.synthGradientPngUdf(lit(32), lit(32), lit(xs), lit(ys),
          lit(phase), lit(noise)))).head().getLong(0)
    val a = hash(2, 3, 10, 0)
    assert(a == hash(2, 3, 10, 0)) // deterministic through the real codec
    val near = java.lang.Long.bitCount(a ^ hash(2, 3, 10, 3))
    assert(near <= 3, s"noise variant hamming $near")
    val far = java.lang.Long.bitCount(a ^ hash(5, 1, 200, 0))
    assert(far > 10, s"distinct image hamming $far")
  }

  test("q167 recovers every planted base↔variant pair; all pairs obey the cut") {
    val rows = Multimodal.q167(spark, sf("sf0.001")).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: every doc_id % 4 == 0 under 120 ships (2·id, 2·id+1) —
    // ZERO false negatives is the guarantee (banding covers Hamming ≤ 3)
    val planted = (0L until 120L).filter(_ % 4 == 0).map(id => (2 * id, 2 * id + 1)).toSet
    assert(planted.subsetOf(got), s"missing ${planted.diff(got)}")
    assert(rows.forall(_.getAs[Long]("hamming") <= 3))
    // cross-doc collisions are a property of the synthetic low-entropy
    // corpus (the q71 caveat class), but must stay a small minority
    val extras = got.diff(planted).size
    assert(extras < planted.size, s"$extras accidental pairs vs ${planted.size} planted")
  }

  test("real decoders quarantine undecodable payloads as null, not exceptions") {
    val junk = Array.fill[Byte](64)(42)
    val df = spark.createDataFrame(Seq(Tuple1(junk))).toDF("p")
      .select(Multimodal.pack(lit("image"), lit("application/octet-stream"), col("p")).as("m"))
    assert(df.select(Multimodal.decodeImage(col("m"))).head().isNullAt(0))
    assert(df.select(Multimodal.decodeWav(col("m"))).head().isNullAt(0))
    assert(df.select(Multimodal.imageGridFeatures(col("m"))).head().isNullAt(0))
  }

  // ---- MP4/ISO-BMFF container metadata ----

  test("videoMeta: synth → parse round-trip recovers every field byte-exactly") {
    val bytes = Multimodal.synthMp4(timescale = 600L, duration = 9000L,
      w = 1280, h = 720, nFrames = 360L, fourcc = "avc1")
    val vm = Multimodal.parseVideoMeta(bytes)
    assert(vm != null)
    assert(vm.timescale == 600L)
    assert(vm.duration_s == 15.0) // 9000/600, one IEEE divide
    assert(vm.width == 1280 && vm.height == 720)
    assert(vm.codec == "avc1" && vm.n_frames == 360L)
  }

  test("videoMeta: version-1 mvhd/tkhd offsets parse correctly") {
    // hand-build a v1 moov: 64-bit creation/modification/duration
    def be(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
    def bx(t: String, p: Array[Byte]): Array[Byte] =
      be(p.length + 8L, 4) ++ t.getBytes("ISO-8859-1") ++ p
    val matrix = Array.fill[Byte](36)(0)
    val mvhd = bx("mvhd", be(0x01000000L, 4) ++ be(0, 8) ++ be(0, 8) ++
      be(1000L, 4) ++ be(42000L, 8) ++ be(0x10000L, 4) ++ be(0x0100, 2) ++
      be(0, 2) ++ be(0, 8) ++ matrix ++ Array.fill[Byte](24)(0) ++ be(2, 4))
    val tkhd = bx("tkhd", be(0x01000007L, 4) ++ be(0, 8) ++ be(0, 8) ++
      be(1, 4) ++ be(0, 4) ++ be(42000L, 8) ++ be(0, 8) ++ be(0, 2) ++
      be(0, 2) ++ be(0, 2) ++ be(0, 2) ++ matrix ++
      be(640L << 16, 4) ++ be(480L << 16, 4))
    val hdlr = bx("hdlr", be(0, 4) ++ be(0, 4) ++
      "vide".getBytes("ISO-8859-1") ++ Array.fill[Byte](13)(0))
    val mdia = bx("mdia", hdlr)
    val moov = bx("moov", mvhd ++ bx("trak", tkhd ++ mdia))
    val vm = Multimodal.parseVideoMeta(moov)
    assert(vm != null)
    assert(vm.timescale == 1000L && vm.duration_s == 42.0)
    assert(vm.width == 640 && vm.height == 480)
  }

  test("videoMeta quarantines truncated, junk, and null payloads as null") {
    val good = Multimodal.synthMp4(600L, 9000L, 320, 240, 100L, "avc1")
    assert(Multimodal.parseVideoMeta(good.take(20)) == null)
    assert(Multimodal.parseVideoMeta(Array.fill[Byte](64)(42)) == null)
    assert(Multimodal.parseVideoMeta(null) == null)
    assert(Multimodal.parseVideoMeta(Array.emptyByteArray) == null)
  }

  test("q175: parsed rows carry container truth, every third payload quarantined") {
    val out = graft.ext.Multimodal.q175(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 2) assert(r.getBoolean(1), s"doc $id should quarantine")
      else {
        assert(!r.getBoolean(1))
        assert(r.getLong(2) == 600L) // timescale
        assert(r.getLong(7) == 24L * (1 + id % 30)) // n_frames
        assert(r.getString(6) == "avc1")
        // duration = frames/24fps exactly: ts·(1+id%30)/ts
        assert(r.getDouble(3) == (1 + id % 30).toDouble)
      }
    }
  }

  test("q277 recall gate: counts exact, every planted near-dup pair found (r17)") {
    val r = graft.ext.Multimodal.q277(spark, sf("sf0.001")).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 150L && r.head.getLong(1) == 30L)
    assert(r.head.getBoolean(2), "a planted pair escaped the banding")
  }

}
