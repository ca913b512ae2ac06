package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism guards for compute-heavy operators.
  *
  * Spark sizes scan splits by bytes (`spark.sql.files.maxPartitionBytes`),
  * which is right when cost ∝ bytes. Compute-heavy kernels (minhash
  * signatures, all-pairs vector scoring) break that assumption: a small
  * single-split file can carry hours of CPU (r3 verdict: q28/q29 ran one
  * task on a 32-core box because the test parquet is one ~800 KB file).
  */
object Partitioning {

  /** Round-robin repartition ONLY when the plan has fewer partitions
    * than the cluster has slots. At scale the scan is already wide and
    * this is a no-op — never a gratuitous data-sized shuffle; on
    * small/single-split inputs it spreads the downstream CPU-bound work
    * across all cores.
    *
    * CONSTRAINT: apply to SCAN-LEVEL frames only. `df.rdd` resolves the
    * physical plan, and under AQE (default in Spark 4) that finalizes
    * the adaptive plan and EAGERLY EXECUTES any upstream shuffle stages
    * — harmless on a raw file scan (no shuffle above it, planning only),
    * a hidden job on anything post-shuffle. Current callers
    * (NearDup.hashedShingles) pass raw scans. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
