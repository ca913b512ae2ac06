package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Two tiers, same numerics:
  *
  *  - Declarative higher-order functions (`zip_with`/`aggregate`).
  *    NOTE: HOFs are CodegenFallback in every current Spark — they
  *    evaluate INTERPRETED with per-element boxing, outside
  *    WholeStageCodegen. Ruinous in per-pair hot loops (r3 verdict:
  *    q29's O(N²) HOF kernel ran ~1 core at ~80 µs/pair), and — r5
  *    finding — even once-per-row use degrades ~15× in a long-lived
  *    JVM as the interpreter's call sites go megamorphic (BENCH_r05:
  *    q27 6.5 s mid-suite vs 0.4 s fresh). Kept as the reference
  *    semantics tier; every production numeric path uses the compiled
  *    kernels.
  *
  *  - Compiled kernels (`dotUdf`/`normUdf`): plain Scala UDFs over
  *    primitive `Array[Double]` — the closure JIT-compiles to a tight
  *    SIMD-able loop. A Scala UDF costs one row-boundary conversion but
  *    the loop body is machine code; for pairwise scoring this beats the
  *    interpreted HOF tree by orders of magnitude. Use these in any
  *    all-pairs / candidate-verification path.
  *
  * All arithmetic is promoted to double with strict left-to-right
  * summation — both tiers produce bit-identical doubles to each other
  * and to the DuckDB oracle's sequential loop over the same values.
  */
object VectorFunctions {

  /** dot(a, b) in double precision, sequential sum (interpreted HOF). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ||a||₂ in double precision. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cosine(a, b) = dot(a,b) / (||a||·||b||). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance (for IVF-style assignment). */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v)

  // ---- compiled kernels (hot-path tier) ----

  /** Compiled dot product over `array<double>` columns. Left-to-right
    * summation — bit-identical to `dotProduct` on non-null, EQUAL-LENGTH
    * inputs (ragged pairs: `dotProduct`'s zip_with null-pads → null,
    * this kernel truncates to the shorter side — callers feed
    * fixed-dimension embeddings, where the two agree). Null in → null
    * out, matching the HOF tier (r4 ADVICE null-guard item). */
  val dotUdf = udf { (a: Array[Double], b: Array[Double]) =>
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      java.lang.Double.valueOf(s)
    }
  }

  /** Compiled ||a||₂ over an `array<double>` column — sqrt of the same
    * left-to-right self-dot `l2Norm` computes. Null in → null out. */
  val normUdf = udf { (a: Array[Double]) =>
    if (a == null) null.asInstanceOf[java.lang.Double]
    else {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      java.lang.Double.valueOf(math.sqrt(s))
    }
  }
}
