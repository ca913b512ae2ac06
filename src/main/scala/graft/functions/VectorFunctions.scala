package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, so
  * the whole computation stays inside WholeStageCodegen.
  *
  * All arithmetic is promoted to double with strict left-to-right
  * summation, which is bit-identical to the DuckDB oracle's sequential
  * loop over the same values.
  */
object VectorFunctions {

  /** dot(a, b) in double precision, sequential sum. */
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
}
