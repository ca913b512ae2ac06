package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-normalization hot path.
  *
  * `nfc_normalize(s)` — Unicode canonical composition (NFC). Spark has
  * no built-in normalizer, and text normalization is step zero of every
  * dedup pipeline: "café" with a combining acute (U+0065 U+0301) and
  * "café" with the precomposed é (U+00E9) must fingerprint identically
  * or exact dedup (q25/q33) silently treats byte-different equal-text
  * documents as distinct. Same engineering argument as
  * [[VectorExpressions]]: a native expression keeps the call inside
  * WholeStageCodegen (no UDF boundary, no boxing) and is usable from
  * SQL and the Column API alike.
  *
  * Fast path: `java.text.Normalizer.isNormalized` first — real-world
  * corpora are overwhelmingly already-NFC (all-ASCII text trivially
  * so), and the check is a linear scan with no allocation, so the
  * common row costs no copy at all. The UTF8String→String→UTF8String
  * round-trip only happens on rows that actually need composing.
  *
  * DuckDB's `nfc_normalize` implements the same Unicode UAX #15 NFC —
  * the q104 oracle gate crosses the two implementations.
  */
object TextExpressions {

  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** nfc_normalize(s) → s in Unicode NFC. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string argument, got ${child.dataType.simpleString}")

    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(v: Any): Any = nfc(v.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def install(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))
  }
}
