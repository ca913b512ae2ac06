package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.5). */
object Similarity {

  /** Q27 — brute-force cosine top-k against the query vector
    * (vec_id = 0). The single-row query side is broadcast; the scan
    * side computes cosine inside codegen'd higher-order functions;
    * ORDER BY + LIMIT plans as TakeOrderedAndProject = partition-local
    * top-k heaps merged on the driver — the correct distributed top-k,
    * no global sort even at 100 TB.
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
}
