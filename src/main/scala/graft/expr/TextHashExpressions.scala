package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-sketch kernels: one pass over the UTF8String's bytes, no
  * per-shingle String allocation (the built-in-function formulation —
  * sequence→transform→substring→xxhash64 — allocates every shingle; these
  * kernels hash byte windows in place).
  *
  * Shingles here are BYTE n-grams. For ASCII text the hash values equal
  * `xxhash64(substring(...))` exactly (same bytes, same seed), so results are
  * identical to the expression-tree path on the test corpus; for multi-byte
  * UTF-8 a window may split a codepoint — an acceptable, documented semantic
  * for hash-sketching (the sketch only needs a deterministic shingle family).
  */
object TextHash {
  private val XXSEED = 42L // functions.xxhash64's default seed

  /** Affine MinHash family — identical to Dedup.hashFamily (seeded). */
  def family(k: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    val out = new Array[Long](2 * k)
    var i = 0
    while (i < k) {
      out(2 * i) = rnd.nextLong() | 1L
      out(2 * i + 1) = rnd.nextLong()
      i += 1
    }
    out
  }

  private def windowCount(numBytes: Int, n: Int): Int =
    if (numBytes <= n) 1 else numBytes - n + 1

  private def windowHash(base: Object, off: Long, numBytes: Int, i: Int, n: Int): Long = {
    val len = math.min(n, numBytes - i)
    XXH64.hashUnsafeBytes(base, off + i, math.max(len, 0), XXSEED)
  }

  /** MinHash signature, one fused pass (family cached per (k, seed)). */
  def minhash(s: UTF8String, n: Int, k: Int, seed: Long): UnsafeArrayData = {
    val fam = familyCache.computeIfAbsent((k, seed),
      kv => family(kv._1, kv._2))
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val windows = windowCount(nb, n)
    var i = 0
    while (i < windows) {
      val h = windowHash(base, off, nb, i, n)
      var j = 0
      while (j < k) {
        val v = h * fam(2 * j) + fam(2 * j + 1)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  private val familyCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  // Java-regex \s without UNICODE_CHARACTER_CLASS is ASCII-only:
  // [ \t\n\x0B\f\r] = 0x20 plus the contiguous 0x09..0x0D run, so a bytewise
  // scan tokenizes any UTF-8 input exactly like split(text, "\\s+").
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09 && b <= 0x0D)

  /** Word-n-gram MinHash signature in one fused pass.
    *
    * Tokenization matches `filter(split(text, "\\s+"), t => t =!= "")`
    * (maximal non-whitespace byte runs). Tokens are normalized into ONE
    * single-space-joined buffer — the only per-row allocation — and each
    * n-token shingle is then a contiguous byte window of that buffer,
    * hashed in place: bit-equal to xxhash64(concat_ws(" ", slice(tokens,
    * i, n))) of the expression-tree path. Duplicate shingles need no dedup
    * (the min-fold is idempotent); fewer than n tokens (including zero)
    * yield the whole-buffer shingle, matching wordShingles' concat_ws
    * fallback. Replaces the boxed Seq[Long] UDF fold that dominated the
    * near-dup queries' scan stage.
    */
  def wordMinhash(s: UTF8String, n: Int, k: Int, seed: Long): UnsafeArrayData = {
    val fam = familyCache.computeIfAbsent((k, seed), kv => family(kv._1, kv._2))
    val bytes = s.getBytes
    val nb = bytes.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nt = 0
    var i = 0
    while (i < nb) {
      if (!isWs(bytes(i))) {
        var j = i + 1
        while (j < nb && !isWs(bytes(j))) j += 1
        if (nt == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nt * 2)
          ends = java.util.Arrays.copyOf(ends, nt * 2)
        }
        starts(nt) = i; ends(nt) = j; nt += 1
        i = j
      } else i += 1
    }
    var total = if (nt > 0) nt - 1 else 0
    var t = 0
    while (t < nt) { total += ends(t) - starts(t); t += 1 }
    val buf = new Array[Byte](total)
    val bstart = new Array[Int](math.max(nt, 1))
    var pos = 0
    t = 0
    while (t < nt) {
      if (t > 0) { buf(pos) = 0x20; pos += 1 }
      bstart(t) = pos
      val len = ends(t) - starts(t)
      System.arraycopy(bytes, starts(t), buf, pos, len)
      pos += len
      t += 1
    }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    def fold(off: Int, len: Int): Unit = {
      val h = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off, len, XXSEED)
      var j = 0
      while (j < k) {
        val v = h * fam(2 * j) + fam(2 * j + 1)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    // zero-token text folds NO grams — the signature stays all
    // Long.MaxValue, the empty-set minhash (mirrors wordNGrams' empty
    // gram set; sketch consumers drop zero-gram docs before banding)
    if (nt == 0) ()
    else if (nt < n) fold(0, total)
    else {
      var w = 0
      while (w <= nt - n) {
        val wEnd = bstart(w + n - 1) + (ends(w + n - 1) - starts(w + n - 1))
        fold(bstart(w), wEnd - bstart(w))
        w += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 64-bit SimHash over DISTINCT byte n-grams (distinct matches the
    * array_distinct in the expression-tree formulation). */
  def simhash(s: UTF8String, n: Int): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val windows = windowCount(nb, n)
    val seen = new java.util.HashSet[java.lang.Long](math.min(windows * 2, 1 << 16))
    val votes = new Array[Int](64)
    var i = 0
    while (i < windows) {
      val h = windowHash(base, off, nb, i, n)
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    * public algorithm): hash every byte n-gram, slide a window of `w`
    * consecutive hashes, select each window's minimum (rightmost occurrence
    * on ties), emit the distinct selected hashes sorted ascending (a
    * canonical set). Guarantee the bottom-k fingerprint lacks: any shared
    * substring of length >= w + n - 1 contributes at least one shared
    * fingerprint, position-independently — the contamination/plagiarism
    * detection primitive. One pass, O(m) via a monotonic deque. */
  def winnow(s: UTF8String, n: Int, w: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val m = windowCount(nb, n)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = windowHash(base, off, nb, i, n); i += 1 }
    val win = math.max(w, 1)
    val selected = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices with increasing hash values; popping on
    // >= makes the rightmost of equal minima the survivor
    val dq = new Array[Int](m + 1)
    var head = 0; var tail = 0 // [head, tail) indexes into dq
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - win) head += 1
      if (i >= win - 1 || i == m - 1) selected.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Adjacent word-pair strings ("w1 w2") in one fused pass — the bigram
    * formation step of the statistical-LM scorer (q84). Tokenization is the
    * same maximal non-whitespace byte-run scan as [[wordMinhash]]; all
    * bigrams share ONE single-space-joined buffer (each is a contiguous
    * window of it, wrapped without copying), so the per-row cost is one
    * buffer allocation + nt-1 slice headers — replacing the interpreted
    * transform/element_at/struct HOF tree. STRICT bigram semantics: fewer
    * than two tokens (including empty/null-free zero-token text) yield an
    * EMPTY array, never a degenerate whole-text entry (q68's wordShingles
    * fallback is deliberately different and keeps its own path). */
  def wordBigrams(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nt = 0
    var i = 0
    while (i < nb) {
      if (!isWs(bytes(i))) {
        var j = i + 1
        while (j < nb && !isWs(bytes(j))) j += 1
        if (nt == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nt * 2)
          ends = java.util.Arrays.copyOf(ends, nt * 2)
        }
        starts(nt) = i; ends(nt) = j; nt += 1
        i = j
      } else i += 1
    }
    if (nt < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    var total = nt - 1
    var t = 0
    while (t < nt) { total += ends(t) - starts(t); t += 1 }
    val buf = new Array[Byte](total)
    val bstart = new Array[Int](nt)
    val blen = new Array[Int](nt)
    var pos = 0
    t = 0
    while (t < nt) {
      if (t > 0) { buf(pos) = 0x20; pos += 1 }
      bstart(t) = pos
      blen(t) = ends(t) - starts(t)
      System.arraycopy(bytes, starts(t), buf, pos, blen(t))
      pos += blen(t)
      t += 1
    }
    val out = new Array[Any](nt - 1)
    t = 0
    while (t < nt - 1) {
      out(t) = UTF8String.fromBytes(buf, bstart(t),
        bstart(t + 1) + blen(t + 1) - bstart(t))
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct word n-gram strings ("w1 … wn") in one fused pass — the
    * gram-formation step of the decontamination queries (q51/q78), whose
    * interpreted transform/sequence/slice tree dominated their scan stage.
    * Exact drop-in for TextOps.wordShingles: same ASCII-whitespace
    * tokenization (maximal non-whitespace byte runs — bytewise-safe for any
    * UTF-8 input because tokens are whole byte runs), same fewer-than-n
    * fallback (ONE gram joining all tokens; the empty string for zero
    * tokens, matching concat_ws over an empty array), same first-occurrence
    * distinct order (array_distinct semantics; UTF8String equality is byte
    * equality on both paths). All grams are windows of one single-space-
    * joined buffer, wrapped without copying. */
  def wordNGrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nt = 0
    var i = 0
    while (i < nb) {
      if (!isWs(bytes(i))) {
        var j = i + 1
        while (j < nb && !isWs(bytes(j))) j += 1
        if (nt == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nt * 2)
          ends = java.util.Arrays.copyOf(ends, nt * 2)
        }
        starts(nt) = i; ends(nt) = j; nt += 1
        i = j
      } else i += 1
    }
    var total = if (nt > 0) nt - 1 else 0
    var t = 0
    while (t < nt) { total += ends(t) - starts(t); t += 1 }
    val buf = new Array[Byte](total)
    val bstart = new Array[Int](math.max(nt, 1))
    val blen = new Array[Int](math.max(nt, 1))
    var pos = 0
    t = 0
    while (t < nt) {
      if (t > 0) { buf(pos) = 0x20; pos += 1 }
      bstart(t) = pos
      blen(t) = ends(t) - starts(t)
      System.arraycopy(bytes, starts(t), buf, pos, blen(t))
      pos += blen(t)
      t += 1
    }
    // zero-token text has NO grams (empty array, not a degenerate ""
    // gram): a document with no tokens shares nothing, and the DuckDB
    // oracles agree explicitly (their CASE yields [] at len(t)=0 —
    // array_to_string([]) is NULL there, so the old "" fallback silently
    // paired all empty docs on the Spark side only; found by
    // tools/fuzz_diff.py on an empty-text-skewed corpus)
    if (nt == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    if (nt < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.fromBytes(buf, 0, total)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var w = 0
    while (w <= nt - n) {
      val wEnd = bstart(w + n - 1) + blen(w + n - 1)
      seen.add(UTF8String.fromBytes(buf, bstart(w), wEnd - bstart(w)))
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Min window hash — the rolling 64-bit document fingerprint. */
  def fingerprint64(s: UTF8String, n: Int): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val windows = windowCount(nb, n)
    var min = Long.MaxValue
    var i = 0
    while (i < windows) {
      val h = windowHash(base, off, nb, i, n)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** `graft_minhash(text)` — fused MinHash signature (ArrayType(LongType)). */
case class MinHashSig(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.minhash($c, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_word_minhash(text)` — fused word-n-gram MinHash signature. */
case class WordMinHashSig(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_minhash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.wordMinhash(input.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.wordMinhash($c, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): WordMinHashSig =
    copy(child = newChild)
}

/** `graft_simhash(text)` — fused 64-bit SimHash. */
case class SimHash64(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.simhash($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `graft_winnow(text)` — fused winnowing fingerprint set. */
case class Winnow(child: Expression, n: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.winnow(input.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.winnow($c, $n, $w)")
  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `graft_word_bigrams(text)` — fused adjacent word-pair array (strict:
  * empty for fewer than two tokens). */
case class WordBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_bigrams"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.wordBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.wordBigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

/** `graft_word_ngrams(text, n)` — fused distinct word n-gram array, the
  * codegen'd drop-in for TextOps.wordShingles (whole-text fallback under n
  * tokens; first-occurrence distinct order). */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.wordNGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.wordNGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** `graft_fingerprint64(text)` — fused min-window-hash fingerprint. */
case class Fingerprint64(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.fingerprint64(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash.fingerprint64($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}
