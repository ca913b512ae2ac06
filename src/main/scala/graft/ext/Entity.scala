package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Entity resolution: fuzzy (edit-distance) record linkage.
  *
  * The classic training-data/catalog curation problem the exact-dedup
  * family (q25/q33) cannot touch: two records that denote the same
  * real-world entity under *near-miss* keys ("old gear" vs "red gear").
  * The reference has no analog (its 262-line ingestion main carries no
  * analytics — SURVEY §0); this is an extension-tier operator
  * (SURVEY §2.5) built the Spark-first way: blocking keys bound the
  * candidate set, a codegen'd built-in (`levenshtein`, no UDF) verifies.
  *
  * Shape, in three bounded stages:
  *
  *  1. **Vocabulary dedup** — verify cost must be ∝ |distinct keys|²
  *     per block, never ∝ records². `distinct()` on (blockCol, nameCol)
  *     first; at 100 TB the name vocabulary is orders of magnitude
  *     smaller than the record count (Zipf), and this is one map-side-
  *     combined shuffle of short strings.
  *  2. **Length-band blocking** — Levenshtein(a,b) ≥ |len(a)−len(b)|,
  *     so a candidate pair within `maxDist` must sit within `maxDist`
  *     length bands. The build side explodes each name to keys
  *     (block, len..len+maxDist), the probe side joins with its own
  *     (block, len): an *equi*-join — shuffled, partition-parallel, no
  *     cartesian anywhere — that admits every true pair exactly once
  *     under the orientation rule below (lossless blocking). Candidates
  *     per block are |V_b|·(maxDist+1) keys, not |V_b|².
  *  3. **Verify + record fan-out** — `levenshtein ≤ maxDist` on the
  *     candidate pairs (codegen'd built-in), then the vocabulary-sized
  *     pair table is broadcast and equi-joined back to records on
  *     (block, name) to produce record-level links.
  *
  * Orientation (each unordered pair once): the probe row carries its
  * own length, the build row spans len..len+maxDist, so a candidate
  * always has len(a) ≥ len(b); equal-length pairs arise in both
  * directions and are cut to `name_a < name_b` (binary comparison —
  * both engines collate ASCII identically). dist ≥ 1 excludes
  * identical names: exact duplicates are q25's job.
  *
  * 100 TB: no stage touches records² — vocab distinct (shuffle of
  * short strings), banded equi-join over vocab, broadcast of the
  * (tiny) verified pair set, two record equi-joins on (block, name).
  * Skewed blocks (one brand owning most names) stay bounded because
  * banding subdivides by length; a residual hot (block, len) key is
  * AQE-skew-join territory, not a design change.
  */
object Entity {

  /** Verified near-miss name pairs per block: (block, name_a, name_b,
    * dist) with len(name_a) ≥ len(name_b), 1 ≤ dist ≤ maxDist. */
  def fuzzyNamePairs(
      records: DataFrame,
      blockCol: String,
      nameCol: String,
      maxDist: Int): DataFrame = {
    val vocab = records.select(col(blockCol), col(nameCol)).distinct()
      .withColumn("len", length(col(nameCol)))
    val probe = vocab.select(
      col(blockCol), col(nameCol).as("name_a"),
      col("len").as("len_a"), col("len").as("band"))
    val build = vocab.select(
      col(blockCol), col(nameCol).as("name_b"), col("len").as("len_b"),
      explode(sequence(col("len"), col("len") + lit(maxDist))).as("band"))
    probe.join(build, Seq(blockCol, "band"))
      .filter(col("len_a") > col("len_b") ||
        (col("len_a") === col("len_b") && col("name_a") < col("name_b")))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist").between(1, maxDist))
      .select(col(blockCol), col("name_a"), col("name_b"), col("dist"))
  }

  /** Record-level links: every pair of records whose names are within
    * `maxDist` edits inside the same block. Output one row per record
    * pair (key_a from the longer-name side; lexically-smaller side at
    * equal length — the orientation the oracle mirrors). */
  def fuzzyJoin(
      records: DataFrame,
      blockCol: String,
      nameCol: String,
      keyCol: String,
      maxDist: Int): DataFrame = {
    val pairs = fuzzyNamePairs(records, blockCol, nameCol, maxDist)
    val a = records.select(
      col(blockCol), col(nameCol).as("name_a"), col(keyCol).as("key_a"))
    val b = records.select(
      col(blockCol), col(nameCol).as("name_b"), col(keyCol).as("key_b"))
    a.join(broadcast(pairs), Seq(blockCol, "name_a"))
      .join(b, Seq(blockCol, "name_b"))
      .select(col("key_a"), col("key_b"), col(blockCol),
        col("name_a"), col("name_b"), col("dist"))
  }

  /** Q100 — fuzzy entity-resolution join under the ORACLE gate: part
    * records linked within the same brand by p_name edit distance ≤ 2.
    * DuckDB rebuilds the full per-brand pair set with its own
    * `levenshtein` (both engines implement classic unit-cost
    * insert/delete/substitute DP) and the same orientation rule, so
    * blocking losslessness is exactly what the hash gate checks. */
  def q100(s: SparkSession, d: String): DataFrame =
    fuzzyJoin(Tables.part(s, d), "p_brand", "p_name", "p_partkey", maxDist = 2)
      .withColumnRenamed("p_brand", "brand")
      .orderBy("key_a", "key_b")

  /** Sorted-neighborhood blocking — the OTHER classic ER candidate
    * generator (Hernández & Stolfo 1995): rank the distinct name
    * vocabulary by its sort key within each block and take candidate
    * pairs within a rank window w, then verify with the codegen'd
    * `levenshtein`. Deliberately LOSSY by design — a true pair sorted
    * > w apart is missed — in exchange for a candidate count that is
    * exactly |V|·w per block regardless of how names distribute over
    * lengths; the production complement to q100's lossless length
    * banding (multi-pass with rotated sort keys is the standard recall
    * fix, documented here, one extra pass each). The window join is an
    * EQUI-join on (block, rank) via a w-way offset fan-out — shuffled,
    * partition-parallel, no range join anywhere.
    *
    * Orientation for free: rank_a < rank_b ⇒ name_a < name_b (the rank
    * IS the sort), so each unordered pair appears exactly once. */
  def sortedNeighborhoodPairs(
      records: DataFrame,
      blockCol: String,
      nameCol: String,
      window: Int,
      maxDist: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(blockCol).orderBy(nameCol)
    val ranked = records.select(col(blockCol), col(nameCol)).distinct()
      .withColumn("rnk", row_number().over(w))
    val probe = ranked.select(col(blockCol), col(nameCol).as("name_a"),
      explode(sequence(col("rnk") + 1, col("rnk") + window)).as("rnk_b"))
    val build = ranked.select(col(blockCol), col(nameCol).as("name_b"),
      col("rnk").as("rnk_b"))
    probe.join(build, Seq(blockCol, "rnk_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist").between(1, maxDist))
      .select(col(blockCol), col("name_a"), col("name_b"), col("dist"))
  }

  /** Q128 — sorted-neighborhood ER under the ORACLE gate: per-brand
    * name pairs within a 5-rank window at edit distance ≤ 2. DuckDB
    * rebuilds the identical ranked window + verify, so the gate
    * certifies the blocking SEMANTICS (which pairs the window admits),
    * while the q100 gate already certifies full-recall linkage —
    * together they measure exactly what the lossy pass trades. */
  /** Textbook Jaro–Winkler similarity (Winkler 1990): jaro = (m/|a| +
    * m/|b| + (m−t)/m)/3 over half-window matches, jw = jaro +
    * min(4, common-prefix)·0.1·(1−jaro). Implemented to the letter so
    * the score agrees with other engines' implementations (DuckDB's
    * jaro_winkler_similarity matches at round(6) — the q164 gate); a
    * compiled kernel (the minhash-UDF precedent — string window scans
    * don't express in Catalyst). */
  private[graft] def jaroWinkler(a: String, b: String): Double = {
    if (a == b) return 1.0
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2).toDouble / m) / 3.0
    var l = 0
    while (l < math.min(4, math.min(la, lb)) &&
      a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private val jwUdf = udf { (a: String, b: String) => jaroWinkler(a, b) }

  /** Q164 — Jaro–Winkler scoring of the q128 sorted-neighborhood
    * candidates: the prefix-weighted similarity record linkage prefers
    * for person/product names (typos cluster at the tail; Winkler's
    * prefix bonus rewards shared heads), as the lossy-complement
    * scorer next to q100's edit-distance verify. Cut at rounded
    * jw ≥ 0.9 so a last-ulp implementation difference can't flip the
    * threshold row set. */
  def q164(s: SparkSession, d: String): DataFrame = {
    val parts = graft.sources.Tables.part(s, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy("p_name")
    val ranked = parts.select(col("p_brand"), col("p_name")).distinct()
      .withColumn("rnk", row_number().over(w))
    val probe = ranked.select(col("p_brand"), col("p_name").as("name_a"),
      explode(sequence(col("rnk") + 1, col("rnk") + 10)).as("rnk_b"))
    val build = ranked.select(col("p_brand"), col("p_name").as("name_b"),
      col("rnk").as("rnk_b"))
    probe.join(build, Seq("p_brand", "rnk_b"))
      .withColumn("jw", round(jwUdf(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.9)
      .select(col("p_brand"), col("name_a"), col("name_b"), col("jw"))
      .orderBy("p_brand", "name_a", "name_b")
  }

  def q128(s: SparkSession, d: String): DataFrame =
    sortedNeighborhoodPairs(Tables.part(s, d), "p_brand", "p_name",
      window = 5, maxDist = 2)
      .withColumnRenamed("p_brand", "brand")
      .orderBy("brand", "name_a", "name_b")

  /** Blocking-quality audit — the report card every ER blocking scheme
    * (q100 fuzzy-join buckets, q128 sorted neighborhood, q105's union)
    * needs BEFORE the pairwise compare runs: candidate-pair count
    * Σ b·(b−1)/2 vs the naive N·(N−1)/2, the reduction ratio that
    * says whether the O(N²) cliff is actually avoided, and the largest
    * block — the straggler task in waiting (one 10⁶-row block is 5·10¹¹
    * comparisons no matter how good the average is). Pure exact-integer
    * arithmetic off one block-count agg; the block frame is the only
    * shuffle and everything after is block-cardinality-bounded. */
  def blockingQuality(df: DataFrame, blockKey: org.apache.spark.sql.Column)
      : DataFrame = {
    val blocks = df.select(blockKey.as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("b"))
    blocks.agg(
      sum("b").as("n_records"),
      count(lit(1)).as("n_blocks"),
      max("b").as("max_block"),
      // b·(b−1) is even; shiftright keeps the whole chain in exact
      // longs (Spark's `/` would go through double)
      sum(shiftright(col("b") * (col("b") - 1), 1)).as("n_candidates"))
      .select(col("n_records"), col("n_blocks"), col("max_block"),
        col("n_candidates"),
        shiftright(col("n_records") * (col("n_records") - 1), 1).as("n_naive"),
        round(lit(1.0) - col("n_candidates").cast("double") /
          shiftright(col("n_records") * (col("n_records") - 1), 1).cast("double"), 6)
          .as("reduction_ratio"))
  }

  /** Q217 — audit of a (nation, name-tail) blocking key over customer. */
  def q217(s: SparkSession, d: String): DataFrame =
    blockingQuality(Tables.customer(s, d),
      concat_ws("|", col("c_nationkey").cast("string"),
        substring(col("c_name"), -3, 3)))
}
