package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import graft.sources.Tables

/** Mergeable HyperLogLog sketches as FIRST-CLASS ROWS — the 100 TB
  * tier q112 (exact rolling distinct) declares: materialize one
  * KB-sized sketch per (group, day), then answer any window/rollup by
  * MERGING sketch rows instead of re-scanning events (Flajolet et al.
  * 2007; the same dense-register design behind Spark's own
  * approx_count_distinct — rebuilt here because the built-in exposes
  * only a scalar estimate, never the mergeable sketch row a layered
  * aggregation needs).
  *
  * Layout: p = 12 → 4096 byte registers (4 KB per sketch), standard
  * error 1.04/√4096 ≈ 1.6%. Input rows are pre-hashed in PLAN land
  * with the codegen `xxhash64` expression — the aggregator only takes
  * max of register ranks, so the hot loop carries no hashing and the
  * sketch is DETERMINISTIC for a fixed input set: build(A ∪ B) equals
  * merge(build(A), build(B)) BYTE-FOR-BYTE (register max is
  * associative/commutative/idempotent — re-delivery is absorbed).
  * Estimates use the classic bias-corrected harmonic mean with
  * linear-counting small-range correction; no HLL++ sparse mode (a
  * 4 KB dense row is already negligible against parquet page
  * overheads at this granularity).
  *
  * Scale: the daily build is one map-side-combined agg (register max
  * merges partials — no row ever shuffles, only 4 KB buffers); the
  * rolling union fans the DAILY SKETCH table ×window (q112's fan-out
  * doctrine applied to KB rows instead of events) and merges — cost
  * independent of event volume. No SQL oracle exists (the estimate is
  * algorithm-defined, not query-defined); SketchesSpec pins byte-exact
  * mergeability, determinism, and measured error against exact counts.
  */
object Sketches {

  val P = 12
  val M = 1 << P // 4096 registers

  private def alphaM2: Double = 0.7213 / (1 + 1.079 / M) * M * M

  /** Register index + rank of one 64-bit hash. */
  @inline private def bucketRank(h: Long): (Int, Byte) = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0L) 64 - P + 1
                else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1,
                  64 - P + 1)).toByte
    (idx, rank)
  }

  /** Estimate cardinality from a dense register array. */
  def estimate(regs: Array[Byte]): Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alphaM2 / sum
    if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else e
  }

  private def mergeRegs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** xxhash64 column → HLL sketch bytes. */
  class HllBuild extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.empty
    override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
      val regs = if (buf.isEmpty) new Array[Byte](M) else buf
      val (idx, rank) = bucketRank(h)
      if (rank > regs(idx)) regs(idx) = rank
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] =
      if (buf.isEmpty) new Array[Byte](M) else buf
    override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  }

  /** sketch-bytes column → merged sketch bytes (the layered agg). */
  class HllMerge extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.empty
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = mergeRegs(buf, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] =
      if (buf.isEmpty) new Array[Byte](M) else buf
    override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  }

  private val estimateUdf = udf { (regs: Array[Byte]) =>
    math.round(estimate(regs))
  }

  /** Daily per-key HLL sketches of `idCol`: (day, sketch). */
  def dailySketches(ev: DataFrame, idCol: String): DataFrame = {
    val build = udaf(new HllBuild)
    ev.select(to_date(col("ts")).as("day"), xxhash64(col(idCol)).as("h"))
      .groupBy("day")
      .agg(build(col("h")).as("sketch"))
  }

  /** Rolling k-day distinct ESTIMATES from the daily sketch table:
    * fan each daily sketch to the k windows it serves, merge, estimate.
    * Cost ∝ days·k sketch rows — independent of event volume. */
  def rollingDistinctHll(ev: DataFrame, idCol: String, k: Int): DataFrame = {
    val merge = udaf(new HllMerge)
    val daily = dailySketches(ev, idCol)
    daily
      .select(explode(sequence(lit(0), lit(k - 1))).as("off"),
        col("day"), col("sketch"))
      .withColumn("win_end", date_add(col("day"), col("off")))
      .groupBy(col("win_end").as("day"))
      .agg(count(lit(1)).as("n_days"),
        merge(col("sketch")).as("merged"))
      .filter(col("n_days") === k) // complete windows only (q112 parity)
      .select(col("day"), estimateUdf(col("merged")).as("est_users"))
  }

  /** Q141 — 7-day rolling distinct users via mergeable daily HLL
    * sketches (rows-only driver check: the estimate is algorithm-
    * defined; byte-exact merge/determinism/error contracts live in
    * SketchesSpec, and the EXACT form it approximates is q112's gate). */
  def q141(s: SparkSession, d: String): DataFrame =
    rollingDistinctHll(Tables.events(s, d), "user_id", 7).orderBy("day")
}
