package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused vector kernel: the dot product is the innermost loop of every
  * embedding operator (brute-force ranking, SRP signatures, IVF assignment,
  * cosine verify). The built-in formulation — `aggregate(zip_with(a, b, *),
  * 0d, +)` — evaluates its lambdas interpretively per element (higher-order
  * functions don't participate in whole-stage codegen), allocating a zipped
  * array per row. This kernel is one primitive loop over the two
  * UnsafeArrayData buffers, inlined into the codegen'd stage.
  *
  * Summation order is left-to-right, identical to the `aggregate` fold, so
  * results are bit-equal to the expression-tree formulation (pinned by
  * VecExprSpec) and to the DuckDB oracle's list_dot_product on the same
  * doubles. Arrays must not contain nulls (embedding columns never do);
  * length mismatch takes the common prefix, matching zip_with+`*` on the
  * overlap (zip_with would pad with null and poison the sum — don't feed
  * mismatched dims to either formulation). */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** `graft_dot(a, b)` — fused double-array dot product. Float arrays widen
  * via implicit cast (one conversion, then the primitive loop). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
