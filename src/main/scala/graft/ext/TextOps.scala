package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-pipeline operators over the `documents` table (SURVEY.md §2.5:
  * dedup + text analysis extensions). All plans are shuffle-minimal:
  * one hash aggregation per query, no UDFs in these SQL-checkable ops.
  */
object TextOps {

  /** Q25 — key-based dedup: group on a content key, elect the keeper
    * (min doc_id), count members. The declared key is the 40-char text
    * prefix (the documents table has no exact duplicate texts; see
    * FIXTURES.md). At 100 TB the same plan holds: the group-by key is
    * hashed and shuffled once; no global sort of members. */
  def q25(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(substring(col("text"), 1, 40).as("prefix"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
      .orderBy("keeper")

  /** Q26 — tokenize + term count (explode is narrow; the only shuffle
    * is the word-count aggregation, with map-side partial counts). */
  def q26(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .select(col("w").as("word"), col("n"))
      .limit(20)
}
