package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions._
import graft.functions.TopKAggregator

/** Similarity search over the `embeddings` table (SURVEY.md §2.5). */
object Similarity {

  /** Q27 — brute-force cosine top-k against the query vector
    * (vec_id = 0). The single-row query side is broadcast; the scan
    * side computes cosine via higher-order functions (interpreted /
    * CodegenFallback — acceptable here because it runs ONCE per corpus
    * row, not per pair); ORDER BY + LIMIT plans as TakeOrderedAndProject
    * = partition-local top-k heaps merged on the driver — the correct
    * distributed top-k, no global sort even at 100 TB.
    *
    * Similarity is rounded to 6 decimals and the rounded value is the
    * sort key (ties broken by vec_id) so ordering is identical across
    * engines regardless of last-ulp float drift. */
  def q27(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.crossJoin(broadcast(qv))
      .select(
        col("vec_id"),
        round(cosineSimilarity(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Batched top-k: the k most cosine-similar corpus vectors for EACH of
    * Q query vectors at once (SURVEY.md §7.4 — Q27 generalized past one
    * query).
    *
    * Shape at 100 TB: the query side is broadcast (Q is small — a batch
    * of probes, not the corpus); each corpus partition scores its rows
    * against all queries and reduces to a ≤ k-entry buffer per query
    * map-side (TopKAggregator partial), so the only shuffle carries
    * Q·k·#partitions buffer rows — never the N·Q scored pairs a
    * window/sort formulation would move.
    *
    * Output: (qid, rank, vec_id, sim), rank 1..k by (sim DESC, vec_id),
    * sim rounded to 6dp before ranking for cross-engine determinism
    * (same convention as q27).
    */
  def topKBatch(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(
        queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))))
      .select(col("qid"), col("vec_id"),
        round(cosineSimilarity(col("embedding"), col("qe")), 6).as("sim"))
      .groupBy("qid")
      .agg(topk(col("vec_id"), col("sim")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("hit.id").as("vec_id"), col("hit.score").as("sim"))
  }

  /** Exact cosine-threshold pairs (a < b, sim ≥ threshold) — the
    * embedding-space analog of near-dup detection. This is the EXACT
    * variant: an all-pairs join, O(N²/2) scored pairs, declared for
    * oracle-checkable correctness at test scale. At 100 TB you run the
    * ANN path instead (graft.ext.Ann buckets candidates first); this
    * form remains the ground-truth oracle for its recall tests.
    *
    * Kernel shape (r3 verdict fixes — 3 scale-killers removed):
    *  1. the scan is widened to defaultParallelism when it arrives
    *     under-split (Partitioning.ensureParallelism — a no-op at scale),
    *     so the nested-loop stream side runs one task per core instead
    *     of one task total;
    *  2. ||v|| is computed ONCE per row (not 2× per pair) and carried
    *     next to the vector;
    *  3. pairs are scored by the compiled `dotUdf` kernel, not the
    *     interpreted CodegenFallback HOF tree.
    * Numerics are unchanged: dot/(na·nb) over float→double-cast values
    * in left-to-right order — bit-identical to the previous HOF form
    * and to the DuckDB oracle at the 6dp round. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val prepped = graft.core.Partitioning.ensureParallelism(emb)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", normUdf(col("e")))
    val a = prepped.select(col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
    val b = prepped.select(col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dotUdf(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Q29 — embedding near-dup pairs on `embeddings` at threshold 0.4
    * (the fixture's max off-diagonal cosine is ≈0.51; 0.4 yields a
    * non-trivial pair set). */
  def q29(s: SparkSession, d: String): DataFrame =
    cosinePairs(Tables.embeddings(s, d), 0.4)
      .orderBy("a", "b")
}
