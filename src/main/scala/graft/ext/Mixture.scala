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
  *    WITHOUT a per-source global sort — a RECURSIVE histogram
  *    select (classic distributed order statistic): each round
  *    buckets every unresolved source's current [lo, hi] window into
  *    `buckets` equal slots (≤ `buckets` histogram rows per source,
  *    so the cumulative window is bounded by construction) and steps
  *    into the slot holding the residual rank; a source exits to the
  *    single final rank pass only once its slot holds ≤ `taskCap`
  *    rows. Uniform ids resolve in one round (three bounded
  *    shuffles); clustered/skewed ids take ≤ log_buckets(range)
  *    rounds instead of collapsing into a one-task-per-source sort
  *    (r18 verdict #3).
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
    * Σquota = target exactly whenever target ≥ 0. Fails loudly (not
    * all-null quotas) on an empty input or Σweight ≤ 0 — the
    * apportionment is undefined there (r18 ADVICE). The weight-sum
    * probe is one scalar aggregate on the sources-sized frame. */
  def allocateQuotas(sources: DataFrame, weightCol: String,
      target: Long, precomputedWsum: Option[Long] = None): DataFrame = {
    val wsum = precomputedWsum.getOrElse {
      val wsumRow = sources.agg(sum(col(weightCol)).cast("long")).head()
      if (wsumRow.isNullAt(0)) 0L else wsumRow.getLong(0)
    }
    require(wsum > 0L,
      s"allocateQuotas: sum($weightCol) must be positive " +
        "(empty source frame or non-positive weights)")
    sources
      .withColumn("__base", expr(s"CAST($target AS BIGINT) * $weightCol DIV $wsum"))
      .withColumn("__rem", expr(s"CAST($target AS BIGINT) * $weightCol % $wsum"))
      .withColumn("__sumbase", sum("__base").over(Window.partitionBy(lit(1))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("__rem").desc, col("source"))))
      .withColumn("quota",
        when(col("__rk") <= lit(target) - col("__sumbase"), col("__base") + 1L)
          .otherwise(col("__base")))
      .drop("__base", "__rem", "__sumbase", "__rk")
  }

  /** Per-source quota-th smallest doc_id by RECURSIVE histogram
    * select; `quotas` = (source, quota). Returns (source,
    * sel_threshold); sources with quota ≤ 0 or quota > n emit no row
    * (join back with left to observe them as NULL). Assumes doc_id is
    * unique per source (the corpus primary key): with duplicate ids
    * the returned threshold VALUE is still deterministic (a
    * single-value window resolves to the value itself; equal ids are
    * interchangeable under the final rank), but count(id ≤ threshold)
    * can exceed the quota — dedup first if ids can repeat.
    *
    * Skew posture (r18 verdict #3): bucketing is by VALUE RANGE, so a
    * clustered id distribution (epoch-prefixed / block-allocated ids)
    * can land nearly all of a source's rows in one bucket. The split
    * therefore RECURSES: each round re-buckets every still-unresolved
    * source's narrowed [lo, hi] window into `buckets` equal slots and
    * steps into the slot holding the residual rank; only when a
    * source's target slot shrinks under `taskCap` rows does it enter
    * the one final rank pass. The final window is ≤ taskCap rows per
    * source BY CONSTRUCTION — distribution-independent, never the
    * one-task-per-source sort. Rounds ≤ log_buckets(id range) ≤ 6 for
    * 64-bit ids at the default 4096 buckets; uniform ids resolve in
    * one round (the r18 two-level behavior, same plan shape and
    * results). Per-round driver state is one row per unresolved
    * source — the bounded dimension — and each round's histogram
    * scans only the unresolved sources' rows (map-side semi-join on
    * the broadcast state). */
  def selectionThresholds(docs: DataFrame, quotas: DataFrame,
      buckets: Int = 4096, taskCap: Long = 1L << 22,
      bounds: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = docs.select(col("source"), col("doc_id").cast("long").as("id"))
    // seed: per-source bounds + in-range quota → (source, lo, hi, r).
    // `bounds` (source, lo, hi, n) skips the seed's corpus scan when the
    // caller already aggregated the per-source frame (mixturePlan fuses
    // it into the one srcs pass — r19, guide §2.4: don't re-scan for
    // stats an earlier aggregation already holds).
    var pending: Array[(String, Long, Long, Long)] = bounds.getOrElse(ids
      .groupBy("source")
      .agg(min("id").as("lo"), max("id").as("hi"), count(lit(1)).as("n")))
      .join(quotas, "source")
      .filter(col("quota") > 0L && col("quota") <= col("n"))
      .select(col("source"), col("lo"), col("hi"),
        col("quota").cast("long").as("r"))
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val resolved = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val toRank = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    var rounds = 0
    while (pending.nonEmpty) {
      rounds += 1
      require(rounds <= 64, "selectionThresholds: split failed to converge")
      val state = broadcast(pending.toSeq.toDF("source", "lo", "hi", "r")
        .withColumn("w", greatest(lit(1L), expr(s"(hi - lo) DIV $buckets + 1"))))
      // histogram each unresolved source's window, step into the slot
      // holding the residual rank r
      val stepped = ids.join(state, "source")
        .filter(col("id").between(col("lo"), col("hi")))
        .withColumn("b", expr("(id - lo) DIV w"))
        .groupBy("source", "b", "lo", "hi", "r", "w")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(
          Window.partitionBy("source").orderBy("b")))
        .filter(col("cum") >= col("r") && col("cum") - col("c") < col("r"))
        .select(col("source"),
          (col("lo") + col("b") * col("w")).as("lo2"),
          least(col("hi"), col("lo") + (col("b") + 1L) * col("w") - 1L).as("hi2"),
          (col("r") - (col("cum") - col("c"))).as("r2"), col("c"))
        .collect()
      pending = stepped.flatMap { x =>
        val (s, lo2, hi2, r2, c) = (x.getString(0), x.getLong(1),
          x.getLong(2), x.getLong(3), x.getLong(4))
        if (lo2 == hi2) { resolved += ((s, lo2)); None } // single value
        else if (c <= taskCap) { toRank += ((s, lo2, hi2, r2)); None }
        else Some((s, lo2, hi2, r2))
      }
    }
    // one final rank pass over every ≤-taskCap window at once
    val ranked: DataFrame =
      if (toRank.isEmpty)
        spark.emptyDataset[(String, Long)]
          .toDF("source", "sel_threshold")
      else ids.join(broadcast(toRank.toSeq.toDF("source", "lo", "hi", "r")),
          "source")
        .filter(col("id").between(col("lo"), col("hi")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy("id")))
        .filter(col("rk") === col("r"))
        .select(col("source"), col("id").as("sel_threshold"))
    if (resolved.isEmpty) ranked
    else ranked.unionByName(
      resolved.toSeq.toDF("source", "sel_threshold"))
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
    // ONE corpus scan builds the sources-sized dimension frame; the
    // localCheckpoint pins it so the total probe, the quota window,
    // and the q284 application gate never rescan the corpus for it
    // (r18 ADVICE). Weight = ordinal suffix + 1, UNBOUNDED substring —
    // byte-identical to the oracle's SUBSTRING(source, 4) whatever
    // the ordinal width (r18 ADVICE). r19: the same pass also carries
    // the per-source id bounds the selector's seed needs, and ONE
    // sources-sized probe returns total AND Σweight — the plan now
    // touches the corpus exactly twice in total (this agg + the
    // selection rounds), guide §2.4.
    val srcs = docs.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("doc_id").cast("long")).as("__lo"),
        max(col("doc_id").cast("long")).as("__hi"))
      .withColumn("weight", expr("substring(source, 4)").cast("long") + 1L)
      .localCheckpoint(true)
    val probe = srcs.agg(coalesce(sum("n_docs"), lit(0L)),
      sum("weight").cast("long")).head()
    val total = probe.getLong(0)
    if (total == 0L) // empty corpus: empty plan, not allocateQuotas' require
      return srcs.drop("__lo", "__hi").withColumn("quota", lit(0L))
        .withColumn("sel_threshold", lit(null).cast("long")).limit(0)
    val wsum = if (probe.isNullAt(1)) None else Some(probe.getLong(1))
    val quotas = allocateQuotas(srcs, "weight", total / 2L, wsum)
      .drop("__lo", "__hi")
    val thresholds = selectionThresholds(docs,
      quotas.select(col("source"),
        least(col("quota"), col("n_docs")).as("quota")),
      bounds = Some(srcs.select(col("source"), col("__lo").as("lo"),
        col("__hi").as("hi"), col("n_docs").as("n"))))
    // sources-sized result, checkpointed: q284 broadcasts it onto the
    // corpus scan without re-running the selection
    quotas.join(thresholds, Seq("source"), "left").localCheckpoint(true)
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
  /** Q285 — PIPELINE V9: the mixture tier composed END-TO-END under
    * the ORACLE gate (the Dolma-recipe analog of q66/q75/q80/q88/
    * q243/q252/q267 — the last pipeline family that had no
    * composition):
    *   mixture plan (q283: Hamilton quotas + recursive selection
    *     thresholds, weights = source ordinal + 1, target = half the
    *     corpus)
    *   → applied admission (q284's broadcast threshold filter,
    *     map-side on the corpus scan)
    *   → quality cut (the q66/q75 cuts: length ≥ 60, stopword ratio
    *     ≥ 0.02 via the compiled kernel)
    *   → 4,000-token shard packing (q63's two-phase distributed
    *     prefix sum — never the global window)
    *   → per-shard ordered content digest (q74's bounded
    *     collect_list + array_sort md5).
    * DuckDB rebuilds the identical funnel: the apportionment
    * arithmetic verbatim, per-source ROW_NUMBER thresholds (oracle
    * scale), the same cuts, the naive global-window shard rebuild,
    * string_agg ordered digest. Any admitted/dropped doc, shard
    * boundary, or byte of shard content flips the hash. Plan shape:
    * one corpus scan to the sources frame (checkpointed), one
    * broadcast-filtered scan into the quality cut, the packShards
    * range exchange, one bounded digest agg. */
  def q285(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val thresholds = mixturePlan(docs).select("source", "sel_threshold")
    val clean = docs.join(broadcast(thresholds), Seq("source"))
      .filter(col("doc_id") <= col("sel_threshold"))
      .filter(length(col("text")) >= 60)
      .filter(TextOps.tokenRatioKernel(col("text"), TextOps.stopwords) >= 0.02)
      .select(col("doc_id"), col("text"))
    val packed = TextOps.packShards(clean, budget = 4000L)
    packed.join(clean, Seq("doc_id"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")), "\n")).as("digest"))
      .orderBy("shard")
  }

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
