package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink adapters — the Spark-native analogs of the reference's two
  * output operations (SURVEY.md Table A):
  *
  *   A6 Cassandra sink (RawDataIngestion.java:152) → partitioned parquet
  *      table keyed (datastream_id, day), mirroring the Cassandra
  *      partition key (DataPoint.java:33–34) so partition pruning fires
  *      on the natural access path. Exactly-once via the streaming
  *      checkpoint (idempotent batch re-writes on restart replay).
  *   A8 console debug sink, first 10 rows (RawDataIngestion.java:165).
  *
  * Unlike the reference — which registered two output ops over an
  * uncached lineage and therefore read+parsed every batch twice
  * (SURVEY.md §1.4.4) — each writer here is a single sink; compose with
  * foreachBatch+persist if both are ever needed together.
  */
object Sinks {

  val defaultTrigger: Trigger = Trigger.ProcessingTime("5 seconds") // :61,91

  /** A6: append to parquet partitioned by (datastream_id, day). */
  def parquetPartitioned(
      points: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = defaultTrigger): StreamingQuery =
    points.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("datastream_id", "day")
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** A8: console debug sink, 10 rows per batch. */
  def console(df: DataFrame, trigger: Trigger = defaultTrigger): DataStreamWriter[Row] =
    df.writeStream.format("console").option("numRows", 10).trigger(trigger)

  /** Batch form of A6 (used by tests and by foreachBatch composition). */
  def writeBatchPartitioned(points: DataFrame, path: String): Unit =
    points.write.mode("append").partitionBy("datastream_id", "day").parquet(path)

  /** A8 semantics, testable: the first `n` rows of every micro-batch
    * handed to a callback (`console` above prints them in production —
    * `print()` = take(10) in the reference, RawDataIngestion.java:165).
    * limit(n) before collect keeps the driver fetch bounded. */
  def foreachBatchLimit(df: DataFrame, n: Int,
      trigger: Trigger = defaultTrigger)(f: (Array[Row], Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => f(batch.limit(n).collect(), id))
      .trigger(trigger)
      .start()

  /** S27 — streaming SCD2 dimension maintenance: every micro-batch of
    * update records folds into a versioned dimension table with
    * `Warehouse.scd2Apply` inside foreachBatch — the canonical
    * streaming-upsert pattern for sinks without a native MERGE. The
    * dimension lives AT REST (parquet version directories), not in
    * stream state, so its size never bounds the state store.
    *
    * Restart/replay safety WITHOUT a transactional table format:
    * batch b reads the newest version directory v<b and writes
    * `v=b` with overwrite — a replayed batch re-reads the same input
    * version and overwrites its own output, byte-identically (the
    * fold is deterministic and scd2Apply drops no-op updates, the
    * idempotence half of SCD2). In-batch duplicate keys reduce to the
    * per-key LATEST record in (eff, tracked...) order first — one
    * batch, one apply, deterministic regardless of arrival order.
    *
    * 100 TB: each fold is one join of the dimension against the batch
    * (AQE broadcasts small batches) plus an anti-join — the
    * merge-on-read posture from scd2Apply's scaladoc; version dirs are
    * the poor-engine's snapshot isolation (readers pin a version,
    * compaction = deleting old versions). */
  def scd2Sink(updates: DataFrame, dimPath: String, checkpoint: String,
      keys: Seq[String], tracked: Seq[String], init: DataFrame,
      trigger: Trigger = defaultTrigger): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    updates.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val spark = batch.sparkSession
        val dir = new java.io.File(dimPath)
        val versions = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("v="))
          .map(_.getName.drop(2).toLong).filter(_ < id)
        val prev = if (versions.isEmpty) None
          else Some(spark.read.parquet(s"$dimPath/v=${versions.max}"))
        val current = prev
          .map(_.filter(col("is_current"))
            .select((keys ++ tracked).map(col) :+ col("valid_from"): _*))
          .getOrElse(init)
        val ordered = Window.partitionBy(keys.map(col): _*)
          .orderBy((col("eff") +: tracked.map(col)).map(_.desc): _*)
        val latest = batch.toDF()
          .withColumn("__rn", row_number().over(ordered))
          .filter(col("__rn") === 1).drop("__rn")
        val folded = graft.operators.Warehouse
          .scd2Apply(current, latest, keys, tracked)
        // closed history is immutable — carry it forward verbatim
        // (scd2Apply's contract folds only the LIVE rows)
        val out = prev match {
          case Some(p) => folded.unionByName(p.filter(!col("is_current")))
          case None    => folded
        }
        out.write.mode("overwrite").parquet(s"$dimPath/v=$id")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Multi-sink composition: persist each micro-batch once and fan out
    * to every sink — computing the lineage exactly once, unlike the
    * reference, whose two output ops re-read and re-parsed every batch
    * from Kafka (no cache(); SURVEY.md §1.4.4). */
  def fanOut(df: DataFrame, checkpoint: String,
      trigger: Trigger = defaultTrigger)(sinks: ((DataFrame, Long) => Unit)*): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        batch.persist()
        try sinks.foreach(s => s(batch.toDF(), id))
        finally { batch.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
