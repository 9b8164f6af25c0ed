package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact immutable index of an eval-probe set's word n-grams: sorted
  * distinct gram hashes, each mapping to the (few) probes that contain it —
  * the broadcastable search-side of benchmark decontamination. Hashes are
  * `xxhash64` over the gram string's UTF-8 bytes (seed 42, the
  * functions.xxhash64 default), bit-identical to the batch q51 join key, so
  * a per-row lookup against this index reproduces the batch join's matches
  * exactly. Eval sets are small by definition (the same justification as
  * the batch path broadcasting the probe side), so the index is a few MB
  * for thousands of probe documents. */
final class ProbeGramIndex private (
    val hashes: Array[Long], // sorted distinct gram hashes
    val offsets: Array[Int], // hashes(i) maps to probeIds[offsets(i) until offsets(i+1))
    val probeIds: Array[Int],
    val nProbes: Int) extends Serializable

object ProbeGramIndex {
  /** Build from (probeIndex, gramHash) pairs; probe indices must be dense
    * [0, nProbes). Duplicate (probe, gram) pairs collapse — counts stay
    * distinct-gram counts. */
  def build(pairs: Seq[(Int, Long)], nProbes: Int): ProbeGramIndex = {
    val byHash = pairs.distinct.groupBy(_._2)
    val hashes = byHash.keys.toArray.sorted
    val offsets = new Array[Int](hashes.length + 1)
    val probes = Array.newBuilder[Int]
    var i = 0
    while (i < hashes.length) {
      val ps = byHash(hashes(i))
      offsets(i + 1) = offsets(i) + ps.size
      ps.foreach(p => probes += p._1)
      i += 1
    }
    new ProbeGramIndex(hashes, offsets, probes.result(), nProbes)
  }

  /** Max distinct-shared-gram count of `s`'s word n-grams against any single
    * probe — the per-row kernel. Tokenization and windowing are TextHash
    * wordNGrams' (one joined buffer, distinct windows); each distinct gram
    * hashes with xxhash64(seed 42) and binary-searches the index; hits bump
    * per-probe counters. Per-row cost is O(bytes + grams·log|index|), no
    * state, no shuffle — the streaming-ingest screen shape. */
  def maxShared(s: UTF8String, n: Int, idx: ProbeGramIndex): Int = {
    val grams = TextHash.wordNGrams(s, n)
    val counts = new Array[Int](idx.nProbes)
    var best = 0
    var g = 0
    while (g < grams.numElements()) {
      val gram = grams.getUTF8String(g)
      val h = XXH64.hashUnsafeBytes(gram.getBaseObject, gram.getBaseOffset,
        gram.numBytes(), 42L)
      val pos = java.util.Arrays.binarySearch(idx.hashes, h)
      if (pos >= 0) {
        var o = idx.offsets(pos)
        while (o < idx.offsets(pos + 1)) {
          val p = idx.probeIds(o)
          counts(p) += 1
          if (counts(p) > best) best = counts(p)
          o += 1
        }
      }
      g += 1
    }
    best
  }
}

/** `graft_gram_overlap(text)` — max distinct word-n-gram overlap of the row
  * against any probe in a [[ProbeGramIndex]] (carried as a reference
  * object, broadcast with the plan). The streaming counterpart of the q51
  * contamination join: stateless, codegen'd, exact same gram + hash
  * arithmetic — pinned against the batch path in StreamingDecontamSpec. */
case class GramOverlapMax(child: Expression, n: Int, index: ProbeGramIndex)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_gram_overlap"
  protected override def nullSafeEval(input: Any): Any =
    ProbeGramIndex.maxShared(input.asInstanceOf[UTF8String], n, index)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("probeGramIndex", index,
      classOf[ProbeGramIndex].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.expr.ProbeGramIndex.maxShared($c, $n, $idx)")
  }
  override protected def withNewChildInternal(newChild: Expression): GramOverlapMax =
    copy(child = newChild)
}
