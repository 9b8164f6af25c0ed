package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass content-defined-chunking boundary kernel.
  *
  * Semantics are EXACTLY `TextOps.cdcChunksEndsReference` (the original
  * expression-tree formulation, kept for the pinning spec): candidate
  * boundaries are the window-END char positions i ∈ [W, numChars] whose
  * 8-char window satisfies `h60(window) % Mask == 0` (h60 = top 15 md5 hex
  * chars as a BIGINT — computed here as big-endian first 8 digest bytes
  * >>> 4, the PortableSketch.beLong identity); a greedy fold accepts a
  * candidate iff it is ≥ MinLen past the last ACCEPTED boundary; the
  * document tail closes the final chunk. Returns the chunk END positions
  * (1-based, char units); empty array for empty text.
  *
  * Why a native kernel: the reference formulation builds, per document,
  * a position sequence + a transform of md5-hex-conv expressions + a
  * filter + a lambda fold — one UTF8String substring allocation, one hex
  * rendering and one base-16 conv PER CHARACTER. This loop walks the
  * UTF-8 bytes once (code-point offsets exactly as UTF8String counts
  * chars — 4-byte sequences are ONE char, matching SQL substr on both
  * engines), feeds the window's byte slice to one reused MessageDigest,
  * and folds inline. Same md5, same values, same boundaries — the oracle
  * (`Round13Queries.cdcOracleCtesFor`) is untouched. Measured ~4×
  * end-to-end on the CDC query family (q171/q173/q174/q186), whose
  * candidate scan dominated the round-15 sf1.0 drill.
  */
object CdcKernel {
  /** CDC parameters — single source of truth (TextOps re-exports). */
  val W = 8
  val Mask = 32
  val MinLen = 16

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def beLong(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)

  def ends(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // code-point start offsets (UTF8String char units: a 4-byte sequence
    // is one char — identical to SQL substr/length on both engines)
    var numChars = 0
    var i = 0
    while (i < nBytes) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      numChars += 1
    }
    val offs = new Array[Int](numChars + 1)
    i = 0
    var c = 0
    while (i < nBytes) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(numChars) = nBytes
    // candidate test + greedy min-length fold, fused (a candidate that
    // fails the %Mask test never touches `last` — same as the reference
    // fold over the filtered candidate list)
    var acc = new Array[Int](8)
    var nAcc = 0
    var last = 0
    if (numChars >= W) {
      val md = mdLocal.get()
      var e = W
      while (e <= numChars) {
        if (e - last >= MinLen) {
          md.reset()
          md.update(bytes, offs(e - W), offs(e) - offs(e - W))
          val d = md.digest()
          if (((beLong(d) >>> 4) % Mask) == 0) {
            if (nAcc == acc.length) acc = java.util.Arrays.copyOf(acc, nAcc * 2)
            acc(nAcc) = e
            nAcc += 1
            last = e
          }
        }
        e += 1
      }
    }
    if (numChars > last) {
      if (nAcc == acc.length) acc = java.util.Arrays.copyOf(acc, nAcc + 1)
      acc(nAcc) = numChars
      nAcc += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(acc, nAcc))
  }
}

/** Single-pass sliding-window hash kernel — the stride-1 char-window
  * relation builder behind the ExactSubstr family (q124/q125 spans/cut,
  * q188 maximal runs). Reference semantics: for every 1-based start
  * position p ∈ [1, numChars−w+1], the struct (pos=p, h=h60 of the w-char
  * window) — exactly `transform(sequence(1, len−w+1), i → struct(i,
  * h60(substr(i, w))))`, which allocated a substring, a hex rendering and
  * a base-16 conversion PER POSITION (the pattern the CDC kernel above
  * retired). One UTF-8 byte walk, code-point offsets as SQL substr counts
  * chars, one reused MessageDigest. Same md5 ⇒ same hashes ⇒ oracles
  * untouched; WinHashesSpec pins fused == reference. */
object WinKernel {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def beLong(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)

  def winHashes(s: UTF8String, w: Int): org.apache.spark.sql.catalyst.expressions.UnsafeArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    var numChars = 0
    var i = 0
    while (i < nBytes) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      numChars += 1
    }
    val count = numChars - w + 1
    val out = new Array[Long](if (count > 0) count else 0)
    if (count > 0) {
      val offs = new Array[Int](numChars + 1)
      i = 0
      var c = 0
      while (i < nBytes) {
        offs(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offs(numChars) = nBytes
      val md = mdLocal.get()
      var p = 0
      while (p < count) {
        md.reset()
        md.update(bytes, offs(p), offs(p + w) - offs(p))
        val d = md.digest()
        out(p) = beLong(d) >>> 4
        p += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `graft_win_hashes(text, w)` — the h60 of every w-char sliding window,
  * as a PRIMITIVE long array (element k, 0-based, is the window starting
  * at 1-based char position k+1 — pair with posexplode; a struct-array
  * return shape measured SLOWER than the expression tree it replaced,
  * because per-position row objects out-allocate what the fused digest
  * saves). Codegen'd; see [[WinKernel]]. */
case class WinHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"graft_win_hashes: w=$w must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_win_hashes"
  protected override def nullSafeEval(input: Any): Any =
    WinKernel.winHashes(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinKernel.winHashes($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinHashes =
    copy(child = newChild)
}

/** `graft_cdc_ends(text)` — chunk END positions (1-based char units) under
  * the CDC boundary rule (codegen'd; see [[CdcKernel]]). */
case class CdcEnds(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_ends"
  protected override def nullSafeEval(input: Any): Any =
    CdcKernel.ends(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CdcKernel.ends($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcEnds =
    copy(child = newChild)
}
