package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Near-duplicate detection: MinHash signatures + LSH banding +
  * candidate-pair Jaccard verification + min-label connected components.
  * (SURVEY.md §2.5 near-dup design; the reference has no analytics
  * operators at all — this is a north-star extension for training-data
  * pipelines over the `documents` table.)
  *
  * Everything is declarative column expressions (higher-order functions
  * + xxhash64) — no UDFs, no driver-side loops over data, no all-pairs
  * comparison anywhere:
  *
  *   1. shingle: word n-grams, hashed to i64 (`shingleHashes`) — narrow.
  *   2. signature: `numPerm` minhashes; permutation j is the keyed hash
  *      xxhash64(j, shingleHash) — narrow, deterministic (Spark's
  *      xxhash64 has a fixed seed).
  *   3. LSH banding: signature split into `bands` bands of
  *      `numPerm/bands` rows; docs sharing any band hash become
  *      candidates. One explode + one shuffle on (band, bandSig).
  *   4. verify: exact Jaccard on the shingle-hash sets, only for
  *      candidate pairs (array_intersect/array_union — codegen-friendly,
  *      no re-tokenization).
  *   5. group: connected components by iterative min-label propagation;
  *      converges in O(component diameter) joins — near-dup groups are
  *      small by construction, so 2–4 iterations in practice, hard
  *      capped and convergence-checked.
  *
  * 100 TB posture: cost is O(docs · numPerm) for signatures plus a
  * shuffle keyed on (band, bandSig). Candidate volume is controlled by
  * the (bands, rowsPerBand) S-curve — at threshold t, a pair with
  * Jaccard j collides with probability ≈ 1-(1-j^r)^b. The skew hazard
  * is a degenerate bucket (e.g. millions of IDENTICAL docs share every
  * band): `maxBucket` caps the per-bucket join fan-out and such floods
  * should be removed by exact dedup (xxhash64 of the full text) before
  * minhashing — exact dedup is cheaper and makes LSH buckets small.
  */
object NearDup {

  /** Distinct word-n-gram shingle hashes of a text column (i64 array).
    * Words beyond the end are skipped by concat_ws (null-safe), so texts
    * shorter than n words yield one shingle of the whole text. */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    val nShingles = greatest(size(words) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), nShingles - 1),
      i => xxhash64(concat_ws("",
        (0 until n).map(j => element_at(words, i + j + 1)): _*))))
  }

  /** MinHash signature (length numPerm) over a shingle-hash array.
    * Permutation j = xxhash64(j, h): one expression tree referencing the
    * hash array once, so projection collapse cannot duplicate the
    * shingling work per permutation. */
  def minhashSignature(hashes: Column, numPerm: Int = 128): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      j => array_min(transform(hashes, h => xxhash64(j, h))))

  /** LSH band hashes: array of `bands` structs (band index, band sig). */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bsig")))

  /** Candidate pairs (a < b) from LSH buckets, Jaccard-verified.
    * Output: (a, b, jaccard) with jaccard >= threshold. */
  def similarPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerm: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxBucket: Int = 10000): DataFrame = {
    require(numPerm % bands == 0, s"numPerm=$numPerm not divisible by bands=$bands")
    val rowsPerBand = numPerm / bands

    val hashed = docs.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("sh"))

    val buckets = hashed
      .select(col("id"),
        explode(bandHashes(minhashSignature(col("sh"), numPerm), bands, rowsPerBand)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.bsig").as("bsig"))

    // Degenerate-bucket guard: a bucket of size m yields m(m-1)/2 pairs;
    // drop buckets beyond maxBucket (they indicate exact-dup floods that
    // belong in exact dedup, not LSH).
    val counted = buckets
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bsig")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    val l = counted.select(col("band"), col("bsig"), col("id").as("a"))
    val r = counted.select(col("band"), col("bsig"), col("id").as("b"))
    val candidates = l.join(r, Seq("band", "bsig"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()

    val ha = hashed.select(col("id").as("a"), col("sh").as("sh_a"))
    val hb = hashed.select(col("id").as("b"), col("sh").as("sh_b"))
    candidates
      .join(ha, "a").join(hb, "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over the similar-pair graph: every doc gets a
    * group_id = min doc id reachable from it. Docs with no near-dup are
    * their own group. Iterative min-label propagation with an action per
    * round (bounded by `maxIter`, early-stops on convergence). */
  def nearDupGroups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerm: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxIter: Int = 20): DataFrame = {
    val pairs = similarPairs(docs, idCol, textCol, shingleN, numPerm, bands, threshold)
      .select("a", "b").persist()
    // adjacency both directions (self-loops implicit via the left join)
    val adj = pairs.union(pairs.select(col("b").as("a"), col("a").as("b"))).persist()
    adj.count() // materialize; drops the LSH lineage from the loop below

    var labels = docs.select(col(idCol).as("id"), col(idCol).as("label")).persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // label'(v) = min(label(v), min over neighbors u of label(u))
      val nbrMin = adj.join(labels, adj("b") === labels("id"))
        .groupBy(adj("a").as("id2")).agg(min("label").as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    pairs.unpersist(); adj.unpersist()
    labels.select(col("id").as(idCol), col("label").as("group_id"))
  }

  /** Dedup: keep one representative (the min-id doc) per near-dup group. */
  def dedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerm: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    val keepers = nearDupGroups(docs, idCol, textCol, shingleN, numPerm, bands, threshold)
      .filter(col(idCol) === col("group_id"))
      .select(col(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** Q28 — MinHash near-dup groups on `documents`: (keeper, n_members)
    * per multi-member group. The fixture's near-dup groups (shared
    * 40-char prefixes, in-group Jaccard >= 0.9, cross-group <= ~0.07)
    * are exactly recoverable at threshold 0.5, so the DuckDB oracle is
    * the prefix-group query — the same ground truth as Q25, reached via
    * LSH instead of a group-by key. */
  def q28(s: SparkSession, d: String): DataFrame =
    nearDupGroups(Tables.documents(s, d))
      .groupBy("group_id")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
      .select("keeper", "n_members")
      .orderBy("keeper")
}
