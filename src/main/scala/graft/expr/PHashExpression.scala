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
  * payloads hash their bits to 0. The cross products are compared in
  * 128 bits ([[PHash.mulGt]]), so the rule is exact at ANY payload size.
  *
  * A per-byte histogram hash (the first design tried) is degenerate on
  * shared-vocabulary corpora — every document drew the same byte
  * distribution — which is exactly why real perceptual hashes are
  * POSITION-sensitive; this one discriminates fully on the synthetic
  * corpus while keeping byte-identical replayability in SQL.
  */
object PHash {
  /** Exact `a*b > c*d` for NONNEGATIVE longs via 128-bit products —
    * every cross-multiplied bit rule below goes through here, so none of
    * the hash kernels has an input-size envelope where the comparison
    * silently overflows (the old in-Long products broke at ~2^24 audio
    * samples / ~190 MPixel / ~190 MB payloads). */
  @inline def mulGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = java.lang.Math.multiplyHigh(a, b)
    val hi2 = java.lang.Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

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
      if (mulGt(segSum, len.toLong, total, hi - lo)) out |= (1L << (63 - i))
      i += 1
    }
    out
  }
}

object PHashAny {
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Container magic for every image format the stock JRE's ImageIO reads
    * (PNG, JPEG, GIF, BMP, TIFF both byte orders) — a 4-byte sniff that
    * spares non-image payloads the per-row ImageIO registry + stream
    * setup. A format with no magic (WBMP) takes the byte-kernel fallback
    * — the same result a decode failure would give. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'I' && p(1) == 'I' && p(2) == 42 && p(3) == 0) ||
      (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 42)

  /** Audio container magic for the stock JRE's javax.sound readers:
    * RIFF/WAVE, FORM/AIFF (incl. AIFC), and .snd (AU). */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
        p(8) == 'A' && p(9) == 'I' && p(10) == 'F') ||
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  /** Perceptual AUDIO hash: decode to 16-bit signed PCM (the audioStats
    * conversion, so every source encoding lands on uniform samples), take
    * the 64-segment hash over per-segment mean ABSOLUTE amplitude vs the
    * global mean — the energy-envelope analogue of the image aHash, still
    * the cross-multiplied integer rule, compared in 128 bits so the rule
    * is exact for audio of any length (the in-Long products would have
    * overflowed at ~2^24 samples ≈ 6 min of 48 kHz mono). Returns the
    * byte-kernel hash when no reader claims the payload. */
  private def audioHash(payload: Array[Byte]): Long = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val samples =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val channels = math.max(1, fmt.getChannels)
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, channels, channels * 2, fmt.getSampleRate,
            false) // little-endian
          AudioSystem.getAudioInputStream(target, in).readAllBytes()
        } finally in.close()
      } catch { case _: Throwable => null }
    if (samples == null) return PHash.phash64(payload)
    val n = samples.length / 2
    if (n == 0) return 0L
    var total = 0L
    val abs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = (((samples(2 * i + 1) & 0xFF) << 8) | (samples(2 * i) & 0xFF))
        .toShort.toInt
      abs(i) = math.abs(s)
      total += abs(i)
      i += 1
    }
    var out = 0L
    var seg = 0
    while (seg < 64) {
      val lo = (seg.toLong * n / 64).toInt
      val hi = ((seg + 1).toLong * n / 64).toInt
      var sum = 0L
      var k = lo
      while (k < hi) { sum += abs(k); k += 1 }
      if (PHash.mulGt(sum, n.toLong, total, (hi - lo).toLong))
        out |= (1L << (63 - seg))
      seg += 1
    }
    out
  }

  /** REAL perceptual hash, modality-dispatched by container magic:
    * images → ImageIO decode → BT.601 integer luma → 8×8 cell-mean
    * average-hash in ONE pixel pass (no luma plane allocated;
    * cross-multiplied bit rule with floor cell boundaries — the 2-D
    * analogue of [[PHash.phash64]]'s segment rule, 128-bit compared so it
    * is exact at any pixel count); audio containers → [[audioHash]]'s
    * energy-envelope hash over decoded PCM. Payloads no reader claims
    * take the byte kernel's EXACT arithmetic, so synthetic corpora and
    * their SQL oracles are untouched while re-encodings of the same
    * pixels (PNG ↔ BMP) or samples (WAV ↔ AIFF ↔ AU) collide — the point
    * of a perceptual hash. */
  def phash64Any(payload: Array[Byte]): Long = {
    if (payload == null || payload.length < 8) return PHash.phash64(payload)
    if (looksLikeAudio(payload)) return audioHash(payload)
    if (!looksLikeImage(payload)) return PHash.phash64(payload)
    imageIoNoDiskCache
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Throwable => null }
    if (img == null) return PHash.phash64(payload)
    val w = img.getWidth
    val h = img.getHeight
    // cell-outer loops so cell membership IS the floor-boundary rule
    // (a fused per-pixel floor(x*8/w) index is a DIFFERENT partition of
    // the same pixels and silently disagrees with the x0/x1 extents);
    // cells are disjoint and covering, so getRGB still runs once per pixel
    val cellSum = new Array[Long](64)
    val cellPx = new Array[Long](64)
    var total = 0L
    var cy = 0
    while (cy < 8) {
      val y0 = (cy.toLong * h / 8).toInt
      val y1 = ((cy + 1).toLong * h / 8).toInt
      var cx = 0
      while (cx < 8) {
        val x0 = (cx.toLong * w / 8).toInt
        val x1 = ((cx + 1).toLong * w / 8).toInt
        val i = cy * 8 + cx
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            cellSum(i) += luma
            x += 1
          }
          y += 1
        }
        cellPx(i) = (y1 - y0).toLong * (x1 - x0)
        total += cellSum(i)
        cx += 1
      }
      cy += 1
    }
    val totalPx = w.toLong * h
    var out = 0L
    var i = 0
    while (i < 64) {
      if (PHash.mulGt(cellSum(i), totalPx, total, cellPx(i)))
        out |= (1L << (63 - i))
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

/** `graft_phash64any(payload)` — decoded-8×8-or-byte-kernel perceptual
  * hash (codegen'd: the decode attempt happens inside whole-stage codegen
  * via the static kernel, no UDF serialization boundary on the scan). */
case class PHash64Any(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash64any"
  protected override def nullSafeEval(input: Any): Any =
    PHashAny.phash64Any(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PHashAny.phash64Any($c)")
  override protected def withNewChildInternal(newChild: Expression): PHash64Any =
    copy(child = newChild)
}
