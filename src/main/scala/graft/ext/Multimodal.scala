package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column convention (SURVEY.md §2.5): image/audio/video are
  * opaque `BinaryType` payloads carried next to a typed metadata struct —
  *
  *   media: struct<
  *     meta:    struct<kind string, content_type string, width int,
  *                     height int, sample_rate int, n_frames int>,
  *     payload: binary>
  *
  * Design rules for 100 TB:
  *  - metadata lives OUTSIDE the payload so predicates on it are plain
  *    column filters — parquet keeps struct leaves as separate columns,
  *    so a `kind = 'image'` scan never reads payload bytes (column
  *    pruning) and pushes min/max pruning on the leaf. For partition-level
  *    pruning the writer materializes `media_kind` as a partition column.
  *  - payload stays opaque to Catalyst (exactly like the reference keeps
  *    `sample` an uninterpreted string, RawDataIngestion.java:140).
  *  - decode/feature steps: REAL decoders exist for images
  *    (`decodeImage`/`imageGridFeatures`/`resizeImage` — javax.imageio,
  *    which ships IN the JDK with PNG/JPEG/BMP/GIF readers, no native
  *    libs needed) and for WAV/PCM audio (`decodeWavStats` —
  *    javax.sound.sampled, also JDK-built-in). Only VIDEO decode stays
  *    a stub (`decodeFeaturesStub` — the JDK has no video codec and
  *    none is installable in this offline environment); it keeps the
  *    same `array<double>` signature a real frame-embedding UDF would
  *    have, so swapping it is a one-function change.
  */
object Multimodal {

  val KindImage = "image"
  val KindAudio = "audio"
  val KindVideo = "video"

  /** Construct a media struct from metadata + payload columns.
    * Absent dimensions are passed as null literals (audio has no
    * width/height; images have no sample_rate). */
  def pack(
      kind: Column,
      contentType: Column,
      payload: Column,
      width: Column = lit(null).cast("int"),
      height: Column = lit(null).cast("int"),
      sampleRate: Column = lit(null).cast("int"),
      nFrames: Column = lit(null).cast("int")): Column =
    struct(
      struct(
        kind.cast("string").as("kind"),
        contentType.cast("string").as("content_type"),
        width.cast("int").as("width"),
        height.cast("int").as("height"),
        sampleRate.cast("int").as("sample_rate"),
        nFrames.cast("int").as("n_frames")).as("meta"),
      payload.cast("binary").as("payload"))

  // Accessors — plain nested-field references; Catalyst prunes to the
  // referenced leaves, so reading only metadata never touches payloads.
  def kind(media: Column): Column        = media.getField("meta").getField("kind")
  def contentType(media: Column): Column = media.getField("meta").getField("content_type")
  def width(media: Column): Column       = media.getField("meta").getField("width")
  def height(media: Column): Column      = media.getField("meta").getField("height")
  def sampleRate(media: Column): Column  = media.getField("meta").getField("sample_rate")
  def nFrames(media: Column): Column     = media.getField("meta").getField("n_frames")
  def payload(media: Column): Column     = media.getField("payload")
  def payloadSize(media: Column): Column = length(payload(media))

  /** Deterministic stand-in for a VIDEO feature extractor: `dim` doubles
    * in [0,1) derived from xxhash64(payload, lane). Same signature and
    * output shape (`array<double>`) as a real embedding UDF; pure column
    * expressions. Images and WAV audio have REAL decoders below —
    * only video lacks a JDK codec. */
  def decodeFeaturesStub(media: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload(media), i), lit(1000000L)).cast("double") / 1000000.0))

  // ---- REAL decoders (JDK-built-in codecs only: javax.imageio for
  // PNG/JPEG/BMP/GIF, javax.sound.sampled for WAV/PCM; compiled UDFs —
  // the decode loop is the hot path and must not be interpreted) ----

  /** Decoded image summary. */
  case class ImageInfo(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Resize result (payload re-encoded as PNG). */
  case class ResizedImage(width: Int, height: Int, payload: Array[Byte])

  /** Decoded WAV/PCM summary. */
  case class WavStats(sample_rate: Int, channels: Int, n_frames: Long, rms: Double)

  // ImageIO's default scratch-file cache would do disk IO per decode on
  // every executor thread; force in-memory once per JVM.
  @transient private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    imageIoInit
    if (bytes == null) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
  }

  /** REAL image decode: payload → (width, height, per-channel means in
    * [0,1]). Undecodable/absent payloads yield null (quarantine-style,
    * like Ingest's malformed-JSON policy). */
  val decodeImageUdf = udf { (bytes: Array[Byte]) =>
    val img = readImage(bytes)
    if (img == null) null
    else {
      val w = img.getWidth; val h = img.getHeight
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 255; g += (p >> 8) & 255; b += p & 255
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h * 255.0
      ImageInfo(w, h, r / n, g / n, b / n)
    }
  }

  def decodeImage(media: Column): Column = decodeImageUdf(payload(media))

  /** REAL image feature vector: mean luminance (Rec.601) over a
    * gridW×gridH cell grid, row-major, each in [0,1] — the classic
    * tiny-thumbnail embedding. Deterministic for lossless formats. */
  def imageGridFeatures(media: Column, gridW: Int = 4, gridH: Int = 4): Column = {
    val kernel = udf { (bytes: Array[Byte]) =>
      val img = readImage(bytes)
      if (img == null) null
      else {
        val w = img.getWidth; val h = img.getHeight
        val sums = new Array[Double](gridW * gridH)
        val counts = new Array[Long](gridW * gridH)
        var y = 0
        while (y < h) {
          val cy = math.min(y * gridH / h, gridH - 1)
          var x = 0
          while (x < w) {
            val cx = math.min(x * gridW / w, gridW - 1)
            val p = img.getRGB(x, y)
            val lum = 0.299 * ((p >> 16) & 255) + 0.587 * ((p >> 8) & 255) +
              0.114 * (p & 255)
            val c = cy * gridW + cx
            sums(c) += lum; counts(c) += 1
            x += 1
          }
          y += 1
        }
        sums.indices.map(i =>
          if (counts(i) == 0) 0.0 else sums(i) / counts(i) / 255.0).toArray
      }
    }
    kernel(payload(media))
  }

  /** REAL aspect-preserving resize (Graphics2D scale, PNG re-encode),
    * returning a full media struct with updated width/height metadata —
    * never upscales. Undecodable payloads yield a null struct. */
  def resizeImage(media: Column, maxW: Int, maxH: Int): Column = {
    val kernel = udf { (bytes: Array[Byte]) =>
      val img = readImage(bytes)
      if (img == null) null
      else
        // the scale/re-encode path gets the same degraded-payload
        // contract as decode (r5 ADVICE): a payload that decodes but
        // fails to re-encode yields the null struct instead of failing
        // the executor task
        try {
          val w = img.getWidth; val h = img.getHeight
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val dst = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = dst.createGraphics()
          try g2.drawImage(img, 0, 0, nw, nh, null) finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          ResizedImage(nw, nh, bos.toByteArray)
        } catch { case scala.util.control.NonFatal(_) => null }
    }
    val r = kernel(payload(media))
    pack(kind(media), lit("image/png"), r.getField("payload"),
      r.getField("width"), r.getField("height"),
      sampleRate(media), nFrames(media))
  }

  /** REAL WAV decode: RIFF/PCM payload → (sample_rate, channels,
    * n_frames, rms of normalized 16-bit samples). Non-WAV or non-16-bit
    * payloads yield null. */
  val decodeWavUdf = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) null
          else {
            val data = ais.readAllBytes()
            val n = data.length / 2
            var sumSq = 0.0
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff; val hi = data(2 * i + 1)
              val s = (if (fmt.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff))
                       else ((hi << 8) | lo)).toShort / 32768.0
              sumSq += s * s
              i += 1
            }
            WavStats(fmt.getSampleRate.toInt, fmt.getChannels,
              n.toLong / fmt.getChannels,
              if (n == 0) 0.0 else math.sqrt(sumSq / n))
          }
        } finally ais.close()
      } catch { case _: Exception => null }
  }

  def decodeWav(media: Column): Column = decodeWavUdf(payload(media))

  /** Frame sampling: byte-range slices of the payload, one `frameBytes`
    * slice every `strideBytes` (video keyframe / audio window analog).
    * substring works natively on BinaryType, so this is codegen'd and
    * never copies the payload more than the selected frames. */
  def frameSample(media: Column, frameBytes: Int, strideBytes: Int): Column =
    transform(
      sequence(lit(0),
        // int-div: `/` on columns is double division, sequence needs integral
        (greatest((payloadSize(media) - frameBytes).cast("int"), lit(0)) / strideBytes).cast("int")),
      i => substring(payload(media), (i * strideBytes + 1).cast("int"), lit(frameBytes)))

  /** "Resize" stub: truncate-or-keep the payload to a byte budget and
    * update n_frames metadata accordingly — the shape of a real
    * transcode/downsample (smaller payload, adjusted meta). */
  def resizeStub(media: Column, maxBytes: Int): Column =
    pack(
      kind(media), contentType(media),
      substring(payload(media), 1, maxBytes),
      width(media), height(media), sampleRate(media),
      least(nFrames(media), lit(maxBytes)))

  /** Write a media table partitioned by kind: the struct leaf is
    * duplicated into a top-level `media_kind` partition column so scans
    * filtered on kind do directory-level partition pruning (zero IO for
    * other kinds) on top of column pruning. */
  def writePartitioned(df: DataFrame, mediaCol: String, path: String): Unit =
    df.withColumn("media_kind", kind(col(mediaCol)))
      .write.partitionBy("media_kind").mode("overwrite").parquet(path)
}
