package graft

import graft.core.Sessions

/** Plan audit: prints, for every declared query (or an
  * args-selected subset), the distinct parquet ReadSchema / PushedFilters
  * lines and whether the plan contains the shapes that should never
  * appear unannounced (CartesianProduct, global Sort under an agg). The
  * per-round .explain discipline, mechanized: a scan that reads all
  * columns for a two-column projection, or a filter that failed to push,
  * shows up here before it shows up in the bench.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [q01 q02 ...]"
  */
object PlanAudit {

  /** Queries whose plan INTENTIONALLY carries a BroadcastNestedLoopJoin
    * with an O(1)-BOUNDED build side — 1-row scalar totals (corpus N,
    * global min/max, day-spine bounds), a ≤k-row parameter frame (q181's
    * three ctx rows, q27/q36's query vectors, q76/q87's centroid sets),
    * or a DECLARED cross join (q11). A scalar broadcast nested-loop is
    * the correct physical plan for "join every row with this one-row
    * aggregate" — flagging it would train readers to ignore the flag.
    * Reviewed r12, one by one; anything NOT in this set that plans a
    * BNLJ/CartesianProduct prints as UNANNOUNCED below and is a build
    * break in spirit. */
  private val boundedBnlj: Set[String] = Set(
    "q107_gap_fill", "q109_histogram", "q110_moving_avg",
    "q112_rolling_distinct", "q113_cooccurrence", "q115_trend",
    "q117_largest_jump", "q11_cross_join", "q122_acf",
    "q124_attribution", "q126_ewma", "q133_rfm", "q144_contribution",
    "q153_chi_square", "q156_keywords", "q157_benford",
    "q165_kmv_overlap", "q172_cross_corr", "q181_packing_waste",
    "q27_cosine_topk", "q36_batch_topk", "q43_tfidf",
    "q68_vector_stats", "q69_collocations", "q76_semdedup",
    "q77_mix_temperature", "q79_unigram_lm", "q82_dsir_weights",
    "q84_bm25", "q87_kmeans",
    // r12 continuation, reviewed one by one: q184/q188/q195 ride
    // gapFill's 1-row day-span + groups crossJoins (the q107 class);
    // q193 adds a ≤maxLag-row lag frame; q194 joins probes with the
    // 1-row corpus sketch; q197 crosses three 1-row total frames;
    // q200 crosses a |ks|-row probe frame with the ≤max(ks) top cut
    // and a 1-row total.
    "q184_theil_sen", "q188_kendall_trend", "q193_acf",
    "q194_cms_counts", "q195_cusum", "q197_mutual_info",
    "q200_topk_coverage",
    // q203 crosses its 1-row summary with the 1-row gini frame
    "q203_partition_skew",
    // q263 crosses the 1-row (N, V) reference-count frame — the q79
    // class (reviewed r16)
    "q263_bigram_lm",
    // q269 crosses the 1-row tercile-threshold frames (t1, t2) plus
    // the same (N, V) frame through its q263 stage (reviewed r16)
    "q269_lm_buckets",
    // r13, reviewed one by one: q225 crosses the 1-row total-quantity
    // frame; q232 crosses the per-source maxr frame (|sources| rows)
    // with the 10-row checkpoint spine; q233 is the labels² non-equi
    // centroid self-join — dimension-bounded by construction.
    "q225_xyz_classes", "q232_heaps_growth", "q233_centroid_sep",
    // r12-continuation queries first audited r13, reviewed one by one —
    // every flag is a 1-row aggregate crossJoin (kmSurvival's horizon,
    // anova's grand totals, degree-dist's node total, kappa's
    // row/column-marginal product frame, growth accounting's week
    // anchor) — the q203 class.
    "q210_km_survival", "q211_anova", "q214_degree_dist",
    "q218_cohens_kappa", "q221_growth_acct",
    // r15, reviewed: q250's BNLJ build side is the ~26-row broadcast
    // polygon-edge table under the bbox condition — the degenerate
    // grid case for O(10) geofences (Spatial.pointInPolygon scaladoc);
    // a thousand-polygon deployment would bucket edges by the q246
    // grid instead.
    "q250_point_in_poly",
    // r13 batch 3/4, reviewed: q234 crosses the 1-row audience total;
    // q235's quality-rank ≤-count joins the 50-row candidate frame;
    // q237's band table is tiny BY DEFINITION (the operator's whole
    // point is broadcasting a range dimension); q238 crosses the
    // day-spine with the groups frame (the q107 class).
    "q234_audience_overlap", "q235_rrf_fusion", "q237_band_join",
    "q238_locf_fill",
    // r17, reviewed one by one. q257: the calibration threshold rides
    // 1-row (kf, thr) crossJoins over the bounded score histogram
    // (the q269 class; flagged since its r16 landing, annotated now).
    // The derived-invariant gates each cross 1-row frames by design:
    // q271 the (n_tok, vsz)-style sketch totals, q272 the 1-row
    // corpus CMS sketch + 1-row n_total, q274 the 1-row false-positive
    // count + 1-row history-size frame, q277 the 1-row missed-pair
    // count + 1-row base count.
    "q257_clf_calibrated", "q271_kmv_error_gate", "q272_cms_guarantees",
    "q274_bloom_guarantees", "q277_image_dedup_recall",
    // r18, reviewed: q283/q284's apportionment crosses the 1-row ΣW
    // total against the SOURCES dimension frame (bounded by
    // construction — Mixture.allocateQuotas scaladoc)
    "q283_mixture_quotas", "q284_mixture_apply")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.001")
    val only = args.filterNot(_.startsWith("/")).toSet
    val spark = Sessions.local(Sessions.envCpus, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    var unannounced = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.exists(name.startsWith)) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val reads = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList.distinct
          val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList
            .distinct.filter(_ != "PushedFilters: []")
          val flags = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
            .collect { case (f, true) => f }
          println(s"== $name ==")
          reads.foreach(r => println(s"  ${r.take(160)}"))
          pushed.foreach(p => println(s"  ${p.take(160)}"))
          if (flags.nonEmpty) {
            val status = if (boundedBnlj.contains(name))
              "annotated bounded-broadcast" else "UNANNOUNCED"
            if (status == "UNANNOUNCED") unannounced ::= name
            println(s"  flags: ${flags.mkString(", ")} ($status)")
          }
        } catch {
          case e: Throwable => println(s"== $name ==\n  ERROR: ${e.getMessage}")
        }
      }
    }
    println(if (unannounced.isEmpty) "[plan-audit] unannounced flags: 0"
      else s"[plan-audit] UNANNOUNCED FLAGS: ${unannounced.sorted.mkString(", ")}")
    spark.stop()
  }
}
