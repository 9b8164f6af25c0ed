package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Positional average-hash ("aHash") kernel for the multimodal perceptual
  * near-dup report (q122). The payload is cut into 64 equal-width byte
  * segments (boundaries `floor(i*L/64)` — the same arithmetic an image
  * aHash applies to an 8x8 downscale of pixel rows); bit `i` (MSB-first)
  * is set iff the segment's byte mean exceeds the whole-payload byte mean.
  * The comparison is CROSS-MULTIPLIED integer arithmetic
  * (`segSum * L > total * segLen`) so there is no float boundary for the
  * DuckDB oracle to disagree on; empty segments (L < 64) and empty
  * payloads hash their bits to 0. Intermediates stay in Long: the products
  * are bounded by 255 * L^2, exact for payloads up to ~180 MB.
  *
  * A per-byte histogram hash (the first design tried) is degenerate on
  * shared-vocabulary corpora — every document drew the same byte
  * distribution — which is exactly why real perceptual hashes are
  * POSITION-sensitive; this one discriminates fully on the synthetic
  * corpus while keeping byte-identical replayability in SQL.
  */
object PHash {
  def phash64(bytes: Array[Byte]): Long = {
    if (bytes == null) return 0L
    val len = bytes.length
    if (len == 0) return 0L
    var total = 0L
    var j = 0
    while (j < len) { total += (bytes(j) & 0xFF); j += 1 }
    var out = 0L
    var i = 0
    while (i < 64) {
      val lo = i.toLong * len / 64
      val hi = (i + 1).toLong * len / 64
      var segSum = 0L
      var k = lo.toInt
      while (k < hi) { segSum += (bytes(k) & 0xFF); k += 1 }
      if (segSum * len > total * (hi - lo)) out |= (1L << (63 - i))
      i += 1
    }
    out
  }
}

/** `graft_phash64(payload)` — 64-bit positional average-hash (codegen'd). */
case class PHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash64"
  protected override def nullSafeEval(input: Any): Any =
    PHash.phash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PHash.phash64($c)")
  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}
