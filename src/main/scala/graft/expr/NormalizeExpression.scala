package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel for the q110 repair pass. Spark ships
  * no normalizer function, and a Scala UDF would break whole-stage codegen
  * on the hot ingest path — so this is a proper Catalyst expression with
  * `doGenCode` (same pattern as the TextHash kernels). Cross-engine: DuckDB
  * `nfc_normalize` implements the same Unicode NFC, so the oracle replays
  * it directly. */
object TextNormalize {
  private val NFC = java.text.Normalizer.Form.NFC

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-normalized text (all ASCII, for one) returns the
    // input UTF8String untouched — no rebuild, no allocation
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }
}

/** `graft_nfc(text)` — Unicode NFC normalization (codegen'd). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  protected override def nullSafeEval(input: Any): Any =
    TextNormalize.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextNormalize.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
