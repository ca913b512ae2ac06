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

  /** HLL relative-error budget for the q270 gate: P = 12 gives a
    * 1.04/√4096 ≈ 1.6% standard error; 5% ≈ 3σ holds deterministically
    * on the fixture (measured max ≈ threshold/3 at both gate scales)
    * while still being a meaningful contract — a broken register
    * merge or estimator overshoots it immediately. */
  val HllRelBound = 0.05

  /** Q270 — the q141 estimate's ERROR CONTRACT under the ORACLE gate
    * (r17: shrink the rows-only set with derived-invariant gates).
    * q141 itself stays rows-only — the estimate is algorithm-defined —
    * but two PROJECTIONS of it are strictly checkable: the exact
    * rolling distinct (DuckDB recomputes it independently) and the
    * boolean |est − exact| ≤ 5%·exact (TRUE on both engines unless the
    * sketch breaks). A register-merge bug, estimator regression, or
    * window-semantics drift now fails the HASH gate, not just the
    * ScalaTest contract. Exact side: one distinct + the q112 bounded
    * ×7 fan-out — scales like q112, never like events². */
  def q270(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val est = rollingDistinctHll(ev, "user_id", 7)
    val exact = ev
      .select(to_date(col("ts")).as("d0"), col("user_id").as("id")).distinct()
      .select(col("id"), col("d0"),
        explode(sequence(lit(0), lit(6))).as("off"))
      .select(col("id"), col("d0"), date_add(col("d0"), col("off")).as("day"))
      .groupBy("day")
      .agg(countDistinct(col("d0")).as("n_days"),
        countDistinct(col("id")).as("exact_users"))
      .filter(col("n_days") === 7) // complete windows (q141 parity)
    est.join(exact, "day")
      .select(col("day"), col("exact_users"),
        (abs(col("est_users").cast("double") -
          col("exact_users").cast("double")) <=
          lit(HllRelBound) * col("exact_users").cast("double"))
          .as("within_bound"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // Bloom filter — the membership sketch (Bloom 1970)
  // ---------------------------------------------------------------

  val BloomBits = 1 << 21  // 2 Mbit = 256 KB
  private val BloomBytes = BloomBits / 8
  val BloomHashes = 5

  /** The NH bit positions of one 64-bit hash (Kirsch–Mitzenmacher
    * 2006: two halves combine as h1 + i·h2 with no loss of FPR
    * guarantee — one xxhash64 per key, not NH). */
  @inline private def bloomBits(h: Long): Array[Int] = {
    val h1 = (h & 0xffffffffL).toInt
    val h2 = (h >>> 32).toInt
    Array.tabulate(BloomHashes) { i =>
      val x = h1 + i * h2
      ((x % BloomBits) + BloomBits) % BloomBits
    }
  }

  private def setBit(regs: Array[Byte], bit: Int): Unit =
    regs(bit >>> 3) = (regs(bit >>> 3) | (1 << (bit & 7))).toByte

  private def getBit(regs: Array[Byte], bit: Int): Boolean =
    (regs(bit >>> 3) & (1 << (bit & 7))) != 0

  private def orRegs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Byte](BloomBytes)
    var i = 0
    while (i < BloomBytes) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }

  /** xxhash64 column → Bloom filter bytes. Like the HLL build, bit-OR
    * is associative/commutative/idempotent, so build(A ∪ B) ==
    * merge(build(A), build(B)) byte-for-byte and per-shard filters
    * union into one. */
  class BloomBuild extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.empty
    override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
      val regs = if (buf.isEmpty) new Array[Byte](BloomBytes) else buf
      val bits = bloomBits(h)
      var i = 0
      while (i < bits.length) { setBit(regs, bits(i)); i += 1 }
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = orRegs(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] =
      if (buf.isEmpty) new Array[Byte](BloomBytes) else buf
    override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  }

  /** Screen an increment against a HISTORY membership bloom — the
    * fast-reject front tier of incremental dedup: a 256 KB filter
    * broadcast to the increment answers "definitely new" with ZERO
    * false negatives (a true duplicate can never slip through; the
    * guarantee the SketchesSpec contract pins), so only the small
    * maybe-seen set pays q91's exact banded screening. At 100 TB the
    * filter builds once per history release (one map-side-combined agg
    * over history KEYS, 256 KB buffers merging) and every daily batch
    * reuses it — the cost profile q91's prep/screen split measures,
    * with the probe side now a narrow broadcast filter instead of a
    * band join. FPR at the default sizing: (1−e^(−kn/m))^k ≈ 0.6% at
    * n = 10⁵ keys; size BloomBits to the history tier. */
  def bloomScreen(history: DataFrame, increment: DataFrame,
      keyCol: String): DataFrame = {
    val build = udaf(new BloomBuild)
    val filterRow = history
      .select(xxhash64(col(keyCol)).as("h"))
      .agg(build(col("h")).as("bloom"))
    val bc = increment.sparkSession.sparkContext
      .broadcast(filterRow.collect().head.getAs[Array[Byte]]("bloom"))
    val contains = udf { (h: Long) =>
      val regs = bc.value
      val bits = bloomBits(h)
      var i = 0
      var all = true
      while (all && i < bits.length) { all = getBit(regs, bits(i)); i += 1 }
      all
    }
    increment.withColumn("maybe_seen", contains(xxhash64(col(keyCol))))
  }

  // ---------------------------------------------------------------
  // KMV (k-minimum-values) — the set-similarity sketch
  // ---------------------------------------------------------------

  val KmvK = 512

  /** Bottom-k distinct hash values per group — the KMV/theta sketch
    * (Bar-Yossef et al. 2002; Beyer et al. 2007): union-mergeable
    * (merge = bottom-k of the concatenation — associative,
    * commutative, idempotent, so shard sketches combine byte-exactly
    * like the HLL/Bloom builds), 4 KB per group, and any pairwise
    * Jaccard estimates from two sketches alone — the q148 exact
    * overlap matrix at 100 TB without re-touching tokens. */
  class KmvBuild extends Aggregator[Long, Array[Long], Array[Long]] {
    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) return buf // distinct-only
      val ins = -pos - 1
      if (buf.length >= KmvK && ins >= KmvK) return buf
      val n = math.min(buf.length + 1, KmvK)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }
    override def zero: Array[Long] = Array.empty
    override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct runs, keep bottom k
      val out = new Array[Long](math.min(a.length + b.length, KmvK))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val take =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        if (o == 0 || out(o - 1) != take) { out(o) = take; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV Jaccard estimate: over the bottom-k of the UNION of two
    * sketches, the fraction present in both (exact arithmetic on the
    * sketch — the estimator's randomness is all in the hash). */
  private[graft] def kmvJaccard(a: Array[Long], b: Array[Long]): Double = {
    val k = math.min(KmvK, a.length + b.length)
    var i = 0; var j = 0; var taken = 0; var inBoth = 0
    while (taken < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && a(i) < b(j))) { i += 1; taken += 1 }
      else if (i >= a.length || b(j) < a(i)) { j += 1; taken += 1 }
      else { inBoth += 1; i += 1; j += 1; taken += 1 }
    }
    if (taken == 0) 0.0 else inBoth.toDouble / taken
  }

  private val kmvJaccardUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    kmvJaccard(a.toArray, b.toArray)
  }

  /** Per-group token KMV sketches → pairwise Jaccard estimates (the
    * q148 matrix from KB sketch rows; |sources|² pairs of k-long
    * arrays — never a token join). */
  def kmvOverlap(docs: DataFrame, keyCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val build = udaf(new KmvBuild)
    val sk = docs.select(col(keyCol).as("src"),
        explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("src"), xxhash64(col("w")).as("h"))
      .groupBy("src").agg(build(col("h")).as("sk"))
    sk.as("a").join(sk.withColumnRenamed("src", "src_b")
        .withColumnRenamed("sk", "sk_b").as("b"),
        col("a.src") < col("b.src_b"))
      .select(col("a.src").as("src_a"), col("src_b"),
        round(kmvJaccardUdf(col("a.sk"), col("sk_b")), 6).as("est_jaccard"))
  }

  /** Q165 — source-overlap estimates via KMV sketches (rows-only: the
    * estimate is algorithm-defined like q141/q147; the EXACT anchor is
    * q148's oracle gate, and SketchesSpec pins byte-exact shard
    * merging plus estimate error against the exact Jaccard). */
  def q165(s: SparkSession, d: String): DataFrame =
    kmvOverlap(Tables.documents(s, d)).orderBy("src_a", "src_b")

  /** KMV absolute Jaccard-error budget for the q271 gate: k = 512
    * gives σ ≈ 1/√512 ≈ 4.4% on the estimate; 0.15 ≈ 3.4σ holds
    * deterministically on the fixture while catching any k-min merge
    * or estimator regression. */
  val KmvAbsBound = 0.15

  /** Q271 — the q165 estimate's ERROR CONTRACT under the ORACLE gate
    * (the q270 pattern on the KMV tier): exact per-pair token Jaccard
    * (the q148 gate-proven arithmetic — BIGINT set sizes, ONE IEEE
    * divide, round 6) + the boolean |est − exact| ≤ 0.15. All source
    * pairs appear (left join from the sketch matrix; a pair with no
    * shared token scores exact 0), so a silently-vanishing pair also
    * fails rows. */
  def q271(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val est = kmvOverlap(docs) // (src_a, src_b, est_jaccard)
    val t = docs.select(col("source").as("src"),
        explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val sizes = t.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = t.as("a").join(t.as("b"),
        col("a.w") === col("b.w") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    val exact = inter
      .join(sizes.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"),
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
          .as("jaccard"))
    est.join(exact, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"),
        (abs(col("est_jaccard") - coalesce(col("jaccard"), lit(0.0))) <=
          lit(KmvAbsBound)).as("within_bound"))
      .orderBy("src_a", "src_b")
  }

  /** Q147 — bloom-screen the %20 ∈ {18,19} document slice against the
    * %20 < 18 history by exact content fingerprint (rows-only driver
    * check: bit patterns are algorithm-defined; the zero-false-negative
    * guarantee vs an exact semi-join, FPR bound, and byte-exact merge
    * contracts live in SketchesSpec). */
  def q147(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("fp", md5(regexp_replace(col("text"), "\\s+", " ")))
    val history = docs.filter(col("doc_id") % 20 < 18).select("fp")
    // increment = the genuinely-new %20 ∈ {18,19} slice PLUS the %20 = 0
    // history slice re-presented (guaranteed duplicates), so the gated
    // output exercises both verdicts: re-presented rows MUST flag true
    // (zero false negatives), fresh rows flag false up to the FPR.
    val inc = docs.filter(col("doc_id") % 20 >= 18 || col("doc_id") % 20 === 0)
      .select("doc_id", "fp")
    bloomScreen(history, inc, "fp")
      .select("doc_id", "maybe_seen").orderBy("doc_id")
  }

  /** Q166 — curation pipeline V5: INCREMENTAL corpus refresh, the
    * daily-production shape every earlier pipeline (q66/q75/q80/q88)
    * lacks — those rebuild from a full corpus; this one folds an
    * increment into an EXISTING corpus:
    *
    *   bloom fast-reject (q147: rows the 256 KB filter proves new skip
    *   the screen entirely — at production ratios that is most of the
    *   batch) → exact fingerprint screen of only the maybe-seen rows
    *   (q25's dedup key; the bloom's zero-false-negative guarantee
    *   makes bloom→exact ≡ exact alone, which is EXACTLY what lets the
    *   DuckDB oracle gate this pipeline end-to-end: it replays the
    *   exact semantics with no bloom at all) → q30-class quality cut →
    *   per-language admission report with maintained corpus counts
    *   (q163's maintenance posture: new totals = history + admitted,
    *   never a recount of history content).
    *
    * Scale: the filter builds once per corpus release (one agg over
    * history KEYS); the per-batch cost is the increment's narrow maps
    * + one broadcast probe + the (tiny) maybe-seen anti-join. */
  def q166(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("fp", md5(regexp_replace(col("text"), "\\s+", " ")))
    val history = docs.filter(col("doc_id") % 20 < 18)
    val inc = docs.filter(col("doc_id") % 20 >= 18 || col("doc_id") % 20 === 0)
    val screened = bloomScreen(history.select("fp"),
      inc.select("doc_id", "lang", "n_chars", "fp"), "fp")
    val fastNew = screened.filter(!col("maybe_seen"))
    val confirmedNew = screened.filter(col("maybe_seen"))
      .join(history.select("fp"), Seq("fp"), "left_anti")
    val newDocs = fastNew.drop("maybe_seen")
      .unionByName(confirmedNew.drop("maybe_seen"))
    val admitted = newDocs.filter(col("n_chars") >= 60)
    val histN = history.groupBy("lang").agg(count(lit(1)).as("n_history"))
    val incN = inc.groupBy("lang").agg(count(lit(1)).as("n_increment"))
    val newN = newDocs.groupBy("lang").agg(count(lit(1)).as("n_new"))
    val admN = admitted.groupBy("lang").agg(count(lit(1)).as("n_admitted"))
    histN.join(incN, Seq("lang"), "full_outer")
      .join(newN, Seq("lang"), "full_outer")
      .join(admN, Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("n_history"), lit(0L)).as("n_history"),
        coalesce(col("n_increment"), lit(0L)).as("n_increment"),
        (coalesce(col("n_increment"), lit(0L)) - coalesce(col("n_new"), lit(0L)))
          .as("n_dup"),
        (coalesce(col("n_new"), lit(0L)) - coalesce(col("n_admitted"), lit(0L)))
          .as("n_lowq"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        (coalesce(col("n_history"), lit(0L)) + coalesce(col("n_admitted"), lit(0L)))
          .as("n_corpus_after"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------
  // Count-Min sketch — the frequency sketch (Cormode & Muthukrishnan
  // 2005), completing the mergeable tier: HLL = distinct, Bloom =
  // membership, KMV = set similarity, CMS = per-key counts.
  // ---------------------------------------------------------------

  val CmsDepth = 4     // rows → failure prob δ = e^-4 ≈ 1.8%
  val CmsWidth = 2048  // counters/row → ε = e/W ≈ 1.33e-3 of total mass
  private val CmsSize = CmsDepth * CmsWidth // 64 KB of longs per sketch

  /** Row indices of one 64-bit key hash (the bloomBits doctrine:
    * Kirsch–Mitzenmacher h1 + i·h2 — ONE xxhash64 per key feeds all
    * rows, preserving the pairwise-independence the bound needs). */
  @inline private def cmsSlots(h: Long): Array[Int] = {
    val h1 = (h & 0xffffffffL).toInt
    val h2 = (h >>> 32).toInt
    Array.tabulate(CmsDepth) { i =>
      val x = h1 + i * h2
      i * CmsWidth + ((x % CmsWidth) + CmsWidth) % CmsWidth
    }
  }

  /** CMS build over pre-hashed keys with a LONG count each (so one
    * input row can carry map-side pre-aggregated weight). Merge is
    * elementwise addition — exact on longs, commutative, associative:
    * shard sketches combine into precisely the sketch of the union,
    * the same contract the HLL/Bloom/KMV builds carry. */
  class CmsBuild extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val b = if (buf.isEmpty) new Array[Long](CmsSize) else buf
      val slots = cmsSlots(in._1)
      var i = 0
      while (i < CmsDepth) { b(slots(i)) += in._2; i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](CmsSize)
      var i = 0
      while (i < CmsSize) { out(i) = a(i) + b(i); i += 1 }
      out
    }
    override def finish(buf: Array[Long]): Array[Long] =
      if (buf.isEmpty) new Array[Long](CmsSize) else buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate: min over the depth rows — NEVER an underestimate
    * (every slot holds the true count plus nonnegative collision mass),
    * and ≤ true + ε·N with probability 1−δ. */
  private[graft] def cmsEstimate(sketch: Array[Long], h: Long): Long = {
    val slots = cmsSlots(h)
    var best = Long.MaxValue
    var i = 0
    while (i < CmsDepth) {
      if (sketch(slots(i)) < best) best = sketch(slots(i))
      i += 1
    }
    best
  }

  private val cmsEstimateUdf = udf { (sk: Seq[Long], h: Long) =>
    cmsEstimate(sk.toArray, h)
  }

  /** Column form of the point estimate (used by batch cmsKeyCounts and
    * the S31 stream). */
  def cmsEstimateCol(sketch: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    cmsEstimateUdf(sketch, h)

  /** Per-key frequency estimates from ONE corpus-wide CMS: events
    * pre-aggregate per (shard, key) map-side, shard sketches merge in
    * the agg (64 KB rows — never raw events past the first combine),
    * then the probe keys join the 1-row sketch by broadcast. At
    * 100 TB the sketch build is the only full-data pass; any later
    * key's count is answered from the 64 KB row. */
  def cmsKeyCounts(ev: DataFrame, keyCol: String,
      probes: DataFrame): DataFrame = {
    val build = udaf(new CmsBuild)
    val perKey = ev.select(xxhash64(col(keyCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c")) // map-side combine tier
    val sketch = perKey.agg(build(col("h"), col("c")).as("sk"))
    probes.select(col(keyCol), xxhash64(col(keyCol)).as("h"))
      .crossJoin(broadcast(sketch))
      .select(col(keyCol), cmsEstimateUdf(col("sk"), col("h")).as("est_count"))
  }

  /** Q194 — CMS frequency estimates for the 10 busiest users (rows-only
    * driver check: estimates are algorithm-defined like q141/q147/q165;
    * the EXACT anchor is q99's heavy-keys gate, and SketchesSpec pins
    * the never-underestimate guarantee, the εN bound, and byte-exact
    * shard merging). */
  def q194(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(10)
    cmsKeyCounts(ev, "user_id", top.select("user_id"))
      .join(top, "user_id")
      .select(col("user_id"), col("n_exact"), col("est_count"))
      .orderBy("user_id")
  }

  /** Q274 — the q147 Bloom screen's GUARANTEE CONTRACT under the
    * ORACLE gate (the q270 pattern on the membership sketch): one row
    * per increment slice with DuckDB-recomputable exact counts and
    * the two structural booleans. `represented` rows (history re-sent)
    * must ALL flag maybe_seen — the zero-false-negative guarantee
    * every bit of the design exists for. `fresh` rows may false-
    * positive up to the sizing bound: actual FPs (flagged ∧ provably
    * NOT in history, one exact anti-join — the q91 screen class) must
    * stay ≤ 2× the (1−e^(−kn/m))^k theoretical rate computed from the
    * ACTUAL history cardinality. */
  def q274(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("fp", md5(regexp_replace(col("text"), "\\s+", " ")))
    val history = docs.filter(col("doc_id") % 20 < 18).select("fp")
    val inc = docs.filter(col("doc_id") % 20 >= 18 || col("doc_id") % 20 === 0)
      .select("doc_id", "fp")
    val screened = bloomScreen(history, inc, "fp")
      .withColumn("slice",
        when(col("doc_id") % 20 === 0, "represented").otherwise("fresh"))
    val hset = history.distinct()
    val nHist = hset.count().toDouble
    val k = BloomHashes.toDouble
    val fprBound = 2.0 *
      math.pow(1.0 - math.exp(-k * nHist / BloomBits), k)
    val falsePos = screened.filter(col("slice") === "fresh")
      .filter(col("maybe_seen"))
      .join(hset, Seq("fp"), "left_anti")
      .agg(count(lit(1)).as("n_fp"))
    screened.groupBy("slice")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("maybe_seen"), 1L).otherwise(0L)).as("n_flagged"))
      .crossJoin(broadcast(falsePos))
      .select(col("slice"), col("n_docs"),
        when(col("slice") === "represented", col("n_flagged") === col("n_docs"))
          .otherwise(col("n_fp").cast("double") <=
            lit(fprBound) * col("n_docs").cast("double")).as("guarantee_ok"))
      .orderBy("slice")
  }

  /** Q272 — the q194 estimate's GUARANTEE CONTRACT under the ORACLE
    * gate (the q270 pattern on the CMS tier). Two checkable booleans
    * per probed key: `never_under` (est ≥ exact — the CMS structural
    * guarantee, min over depth rows each of which counted the key
    * plus non-negative collisions) and `within_eps` (est − exact ≤
    * ε·N with ε = e/W ≈ 1.33e-3 of total event mass — the Cormode–
    * Muthukrishnan bound, which holds per row with prob 1 − 1/e and
    * over the min with prob 1 − e^-4; deterministic on the fixed
    * fixture). The exact counts are DuckDB-recomputable BIGINTs. */
  def q272(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(10)
    val n = ev.agg(count(lit(1)).as("n_total"))
    cmsKeyCounts(ev, "user_id", top.select("user_id"))
      .join(top, "user_id")
      .crossJoin(broadcast(n))
      .select(col("user_id"), col("n_exact"),
        (col("est_count") >= col("n_exact")).as("never_under"),
        ((col("est_count") - col("n_exact")).cast("double") <=
          lit(math.E / CmsWidth) * col("n_total").cast("double"))
          .as("within_eps"))
      .orderBy("user_id")
  }
}
