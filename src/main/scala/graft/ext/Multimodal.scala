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
  *  - decode/feature steps are column expressions over the payload where
  *    expressible; the REAL codec call (JPEG/PCM decode) needs native
  *    libraries that are unavailable in this environment, so
  *    `decodeFeaturesStub` substitutes a deterministic hash-derived
  *    feature vector with the same shape/signature a codec UDF would
  *    have. The plumbing around it (schema, batching, partitioning,
  *    pushdown) is real and tested; swapping the stub for a true codec
  *    is a one-function change.
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

  /** Deterministic stand-in for a codec feature extractor: `dim` doubles
    * in [0,1) derived from xxhash64(payload, lane). Same signature and
    * output shape (`array<double>`) as a real embedding UDF; pure column
    * expressions (the `transform` HOF evaluates interpreted /
    * CodegenFallback — fine once per row; a real codec would be a
    * compiled UDF anyway). */
  def decodeFeaturesStub(media: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload(media), i), lit(1000000L)).cast("double") / 1000000.0))

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
