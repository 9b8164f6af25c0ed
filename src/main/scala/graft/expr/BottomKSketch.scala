package graft.expr

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k sketch — a MERGEABLE fixed-size summary of a set of 64-bit
  * hashes (the k smallest distinct values). The per-group counterpart of
  * the per-document MinHash signature: where MinHashSig sketches one text's
  * shingle set in a scalar projection, this sketches an entire GROUP's
  * element set inside an aggregation, with map-side partial aggregation and
  * executor-side merges for free (Catalyst treats a typed Aggregator like
  * any other aggregate function).
  *
  * Size is bounded by construction — O(k) state per group regardless of
  * group cardinality — which is the whole point at 100 TB: a group's
  * distinct-set summary that survives partial aggregation without ever
  * holding the set (collect_set would). Two groups' sketches estimate
  * their Jaccard overlap via the standard bottom-k estimator
  * (`BottomKSketch.jaccardEstimate`): take the k smallest of the union,
  * count how many appear in both sketches; when |A ∪ B| ≤ k the sketch IS
  * the set and the estimate is exact.
  *
  * The buffer is a sorted distinct Array[Long] (≤ k elements): insertion
  * keeps it sorted (binary search + bounded arraycopy, O(k) worst case per
  * row but k is small and hit rates drop as the sketch saturates); merge is
  * one linear merge of two sorted arrays truncated at k.
  */
class BottomKAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    val n = buf.length
    if (n == k && x >= buf(n - 1)) return buf // beyond the current bottom-k
    val pos = {
      val i = java.util.Arrays.binarySearch(buf, x)
      if (i >= 0) return buf // already present
      -i - 1
    }
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, pos)
    out(pos) = x
    System.arraycopy(buf, pos, out, pos + 1, outLen - pos - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BottomKSketch {

  /** Column aggregate: bottom-k sketch of a LONG hash column. */
  def bottomK(hash: Column, k: Int): Column = udaf(new BottomKAggregator(k)).apply(hash)

  /** Bottom-k Jaccard estimator over two finished sketches (array columns):
    * among the k smallest of the union, the fraction present in both.
    * Exact when |A ∪ B| ≤ k. Plain Catalyst array functions — stays in the
    * optimizer's sight, no UDF. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val unionBottom = slice(array_sort(array_union(a, b)), 1, k)
    val inBoth = size(array_intersect(unionBottom, array_intersect(a, b)))
    when(size(unionBottom) === 0, 0.0d)
      .otherwise(inBoth.cast("double") / least(size(unionBottom), lit(k)))
  }
}
