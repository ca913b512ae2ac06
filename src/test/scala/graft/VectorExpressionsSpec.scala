package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Native Catalyst expression tier (vec_dot/vec_norm): value contract
  * vs the UDF tier, null/ragged semantics, SQL registration through
  * SparkSessionExtensions, and WholeStageCodegen participation. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val floats = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)),
    (3L, Array(-1.5f, 2.5f, 0.0f), Array(1.0f, 1.0f, 1.0f)))

  test("vec_dot/vec_norm match the compiled UDF tier bit-for-bit on float arrays") {
    val df = floats.toDF("id", "a", "b")
    val rows = df.select(
        call_function("vec_dot", col("a"), col("b")).as("nd"),
        VectorFunctions.dotUdf(col("a").cast("array<double>"),
          col("b").cast("array<double>")).as("ud"),
        call_function("vec_norm", col("a")).as("nn"),
        VectorFunctions.normUdf(col("a").cast("array<double>")).as("un"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("vec_dot: double arrays, ragged truncation, null in → null out") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(2.0, 3.0)),      // ragged → 1·2 + 2·3
      (null.asInstanceOf[Array[Double]], Array(1.0)) // null side
    ).toDF("a", "b")
    val rows = df.select(call_function("vec_dot", $"a", $"b")).collect()
    assert(rows(0).getDouble(0) == 8.0)
    assert(rows(1).isNullAt(0))
  }

  test("vec_dot/vec_norm are callable from SQL (extension registration)") {
    val r = spark.sql(
      """SELECT vec_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |               CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d,
        |       vec_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("vec_dot participates in WholeStageCodegen (no UDF codegen fence)") {
    // a real scan, not a local relation — ConvertToLocalRelation would
    // constant-fold the projection away and leave nothing to inspect
    val df = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
      .select(call_function("vec_dot", col("embedding"), col("embedding")).as("d"))
    val explained = df.queryExecution.executedPlan.toString
    // the Project carrying vec_dot must sit inside a codegen stage
    // (marked `*(n)`), not fall back to interpreted evaluation
    val projLine = explained.linesIterator.find(_.contains("vec_dot")).get
    assert(projLine.trim.startsWith("*"), s"not codegen'd:\n$explained")
    // and the generated stage source must contain the fused loop, not a
    // boxed UDF call
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("getFloat") || gen.contains("getDouble"),
      "generated code does not read ArrayData directly")
  }
}
