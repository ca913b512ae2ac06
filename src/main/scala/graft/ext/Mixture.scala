package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-corpus MIXTURE operators (r18) — the data-mixing tier of a
  * large-scale pipeline (the Dolma/RedPajama recipe step: "compose the
  * training set as w₁·src₁ + w₂·src₂ + …"), plus the exact
  * order-statistic machinery the selection step needs:
  *
  *  - [[groupQuantiles]]: EXACT per-group quantiles of an integer
  *    column via value histogram + cumulative rank — the q257/q269
  *    bounded-window doctrine: the one ordered window runs on the
  *    (group, value) HISTOGRAM, bounded by the value DOMAIN (doc
  *    lengths, scores), never the corpus. One corpus shuffle. The
  *    quantile definition is explicit arithmetic (smallest v with
  *    count(≤ v) ≥ ⌈p·n⌉) so both engines compute the identical
  *    rank — no reliance on any engine's quantile-function tie
  *    semantics. The EXACT complement of q52's GK sketch
  *    (approximate, mergeable, one pass): sketch when ε is
  *    acceptable, histogram when the domain is bounded and the
  *    answer must be exact.
  *
  *  - [[allocateQuotas]]: largest-remainder (Hamilton) apportionment
  *    of a target corpus size across sources by integer weight —
  *    base_i = ⌊T·w_i/W⌋, the T − Σbase leftover seats go to the
  *    largest remainders (tie-break: remainder DESC, source ASC) so
  *    Σquota = T exactly. All-integer arithmetic on a sources-sized
  *    frame (the bounded dimension — the one ordered window ranks
  *    sources, never docs).
  *
  *  - [[selectionThresholds]]: per-source quota-th smallest doc_id
  *    WITHOUT a per-source global sort — the two-level histogram
  *    select (classic distributed order statistic): level 1 buckets
  *    doc_id DIV B (≤ `buckets` rows per source, so the cumulative
  *    window is bounded by construction), finds each source's target
  *    bucket and residual rank; level 2 ranks ONLY the target
  *    bucket's rows (expected n/buckets per source). Three bounded
  *    shuffles at any corpus size — a row_number over whole sources
  *    would be one task per source at 100 TB.
  */
object Mixture {

  /** Exact per-group lower quantiles (p = num/den) of `valCol`:
    * smallest v with count(≤ v) ≥ ⌈p·n⌉ = (num·n + den − 1) DIV den.
    * Output: (group, n, one column per requested (name, num, den)). */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: Column,
      ps: Seq[(String, Int, Int)]): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), valCol.cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val aggs = ps.map { case (name, num, den) =>
      min(when(col("cum") >= expr(s"(n * $num + ${den - 1}) DIV $den"),
        col("v"))).as(name)
    }
    cum.groupBy(col("g").as(groupCol))
      .agg(max("n").cast("long").as("n"), aggs: _*)
  }

  /** Largest-remainder quota per source for a target total of `target`
    * docs, weights = integer `weightCol`. Input must be ONE ROW PER
    * SOURCE (the bounded dimension frame, with a `source` column for
    * the deterministic tie-break). Output adds `quota`;
    * Σquota = target exactly whenever target ≥ 0. */
  def allocateQuotas(sources: DataFrame, weightCol: String,
      target: Long): DataFrame = {
    val tot = sources.agg(sum(col(weightCol)).cast("long").as("__wsum"))
    val based = sources.crossJoin(broadcast(tot))
      .withColumn("__base", expr(s"CAST($target AS BIGINT) * $weightCol DIV __wsum"))
      .withColumn("__rem", expr(s"CAST($target AS BIGINT) * $weightCol % __wsum"))
    based
      .withColumn("__sumbase", sum("__base").over(Window.partitionBy(lit(1))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("__rem").desc, col("source"))))
      .withColumn("quota",
        when(col("__rk") <= lit(target) - col("__sumbase"), col("__base") + 1L)
          .otherwise(col("__base")))
      .drop("__base", "__rem", "__sumbase", "__rk", "__wsum")
  }

  /** Per-source quota-th smallest doc_id by two-level histogram
    * select; `quotas` = (source, quota). Returns (source,
    * sel_threshold); sources with quota ≤ 0 or quota > n emit no row
    * (join back with left to observe them as NULL). Assumes doc_id is
    * unique per source (the corpus primary key): with duplicate ids
    * the returned threshold VALUE is still deterministic (equal ids
    * are interchangeable under the level-2 rank), but
    * count(id ≤ threshold) can exceed the quota — dedup first if ids
    * can repeat. */
  def selectionThresholds(docs: DataFrame, quotas: DataFrame,
      buckets: Int = 4096): DataFrame = {
    val ids = docs.select(col("source"), col("doc_id").cast("long").as("id"))
    val bounds = ids.agg(min("id").as("lo"), max("id").as("hi")).head()
    if (bounds.isNullAt(0)) // empty corpus: no thresholds, not an NPE
      return quotas.select(col("source"),
        lit(null).cast("long").as("sel_threshold")).limit(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val bWidth = math.max(1L, (hi - lo) / buckets + 1L)
    val bucketed = ids.withColumn("b", expr(s"(id - $lo) DIV $bWidth"))
    // level 1: per-(source, bucket) counts — ≤ `buckets` rows/source
    val l1 = bucketed.groupBy("source", "b").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("source").orderBy("b")))
    val target = l1.join(broadcast(quotas), "source")
      .filter(col("quota") > 0L && col("cum") >= col("quota") &&
        col("cum") - col("c") < col("quota"))
      .select(col("source"), col("b"),
        (col("quota") - (col("cum") - col("c"))).as("r"))
    // level 2: rank ONLY the target bucket's rows (expected n/buckets
    // per source — the window partition is bounded by bucket width)
    bucketed.join(broadcast(target), Seq("source", "b"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("id")))
      .filter(col("rk") === col("r"))
      .select(col("source"), col("id").as("sel_threshold"))
  }

  /** Q282 — exact per-source length quantiles under the ORACLE gate:
    * median and p90 of length(text) per source via [[groupQuantiles]]
    * (explicit ⌈p·n⌉ rank arithmetic mirrored by DuckDB — the exact
    * complement of the q52 GK sketch). */
  def q282(s: SparkSession, d: String): DataFrame =
    groupQuantiles(Tables.documents(s, d), "source", length(col("text")),
      Seq(("len_p50", 1, 2), ("len_p90", 9, 10)))
      .orderBy("source")

  /** Q283 — mixture quota allocation + selection thresholds under the
    * ORACLE gate: weights = source ordinal + 1 (deterministic,
    * scale-independent), target = half the corpus, Hamilton
    * apportionment, and each source's quota-th smallest doc_id by the
    * two-level select. DuckDB recomputes the apportionment arithmetic
    * verbatim and the thresholds via per-source ROW_NUMBER (fine at
    * oracle scale; the engine's two-level form exists precisely
    * because that window does not scale). */
  /** Shared q283/q284 planning prefix — ONE source of truth for the
    * weight rule (source ordinal + 1), the target (half the corpus),
    * and the quota→threshold wiring, so the plan gate and the
    * application gate cannot silently desynchronize. The quota fed to
    * the selector is CLAMPED to the source's availability
    * (LEAST(quota, n_docs) — the oracle's arithmetic), so an
    * over-quota source resolves to its max doc_id and admits fully
    * rather than diverging engine-NULL vs oracle-max-id. Returns
    * (quotas ⋈ thresholds) with n_docs/weight/quota/sel_threshold. */
  private def mixturePlan(docs: DataFrame): DataFrame = {
    val srcs = docs.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("weight",
        substring(col("source"), 4, 10).cast("long") + 1L)
    val total = srcs.agg(coalesce(sum("n_docs"), lit(0L)))
      .head().getLong(0)
    val quotas = allocateQuotas(srcs, "weight", total / 2L)
    val thresholds = selectionThresholds(docs,
      quotas.select(col("source"),
        least(col("quota"), col("n_docs")).as("quota")))
    quotas.join(thresholds, Seq("source"), "left")
  }

  def q283(s: SparkSession, d: String): DataFrame =
    mixturePlan(Tables.documents(s, d))
      .select(col("source"), col("n_docs"), col("weight"), col("quota"),
        col("sel_threshold"),
        least(col("quota"), col("n_docs")).as("n_selected"))
      .orderBy("source")

  /** Q284 — the mixture APPLIED under the ORACLE gate (the composition
    * query: q283 gates the plan, this gates the mixed corpus a user
    * actually materializes): the per-source thresholds broadcast onto
    * the corpus scan, `doc_id ≤ threshold` filters map-side, and the
    * admitted slice's per-source count, id range, and character mass
    * are exact arithmetic both engines recompute. `n_rows = quota` and
    * `max_id = threshold` per source prove the application dropped and
    * admitted EXACTLY the planned set — corpus-wide, any off-by-one
    * flips the hash. One broadcast join, no shuffle before the final
    * sources-sized agg. */
  def q284(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val thresholds = mixturePlan(docs)
      .select("source", "sel_threshold")
    docs.join(broadcast(thresholds), Seq("source"))
      .filter(col("doc_id") <= col("sel_threshold"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        sum(length(col("text"))).cast("long").as("n_chars"))
      .orderBy("source")
  }
}
