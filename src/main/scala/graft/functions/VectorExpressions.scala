package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path — the top tier
  * of the extension-mechanism ladder (SURVEY §7.4; compose built-ins >
  * native `Expression` > Scala UDF).
  *
  * Why a third tier above `VectorFunctions.dotUdf`: a Scala UDF's loop
  * body is compiled, but every CALL pays the catalyst→JVM boundary — an
  * `ArrayData` → `Array[Double]` copy per argument per row (plus boxed
  * null handling), and it walls off WholeStageCodegen around the
  * projection. These expressions generate the loop INTO the stage's
  * Java source: `doGenCode` reads `ArrayData.getFloat/getDouble(i)`
  * straight out of the columnar/unsafe buffer — no copy, no boxing, no
  * codegen fence.
  *
  * Numerics contract (same as both VectorFunctions tiers): elements
  * promoted to double, strict left-to-right summation, truncate to the
  * shorter array on ragged input, null in → null out. `(double)` of a
  * float is exact, so float-array inputs produce bit-identical sums to
  * pre-cast double arrays — the DuckDB oracle agreement argument is
  * unchanged.
  *
  * Registered by [[VectorExpressions.install]] via
  * `SparkSessionExtensions.injectFunction` (SQL names `vec_dot`,
  * `vec_norm`), usable from both SQL and `call_function`.
  */
object VectorExpressions {

  // ExpectsInputTypes needs AbstractDataType, which is private[sql] in
  // Spark 4 — type acceptance is enforced via checkInputDataTypes instead
  private def acceptable(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def checkVectorInputs(e: Expression): TypeCheckResult =
    if (e.children.forall(c => acceptable(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"${e.prettyName} expects array<float>/array<double> arguments, got " +
          e.children.map(_.dataType.simpleString).mkString(", "))

  /** Per-element read snippet for the generated loop. */
  private def readElem(child: Expression, arr: String, i: String): String =
    child.dataType match {
      case ArrayType(FloatType, _)  => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case t => throw new IllegalStateException(s"unsupported input $t")
    }

  private def elemAt(dt: DataType, arr: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _)  => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case t => throw new IllegalStateException(s"unsupported input $t")
    }

  /** vec_dot(a, b) → double: Σ aᵢ·bᵢ left-to-right. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = checkVectorInputs(this)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${readElem(left, a, i)} * ${readElem(right, b, i)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** vec_norm(a) → double: √(Σ aᵢ²), same summation order. */
  case class VecNorm(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = checkVectorInputs(this)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0; var i = 0
      while (i < n) { val v = elemAt(child.dataType, x, i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = ${readElem(child, a, i)};
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The `SparkSessionExtensions` hook (wired in `Sessions.configure`
    * via `withExtensions` — also usable as a
    * `spark.sql.extensions=graft.functions.GraftExtensions` class by
    * external deployments). */
  def install(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (args: Seq[Expression]) => VecNorm(args.head)))
  }
}

/** `spark.sql.extensions`-compatible entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    VectorExpressions.install(e)
    TextExpressions.install(e)
  }
}
