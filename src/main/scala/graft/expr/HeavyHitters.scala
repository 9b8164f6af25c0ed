package graft.expr

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch — a MERGEABLE fixed-width frequency
  * summary (the ACMR/"mergeable summaries" formulation): at most `width`
  * (item, count) entries survive per buffer regardless of stream length,
  * with the classic deterministic guarantees for ANY partitioning / merge
  * order:
  *
  *   - underestimate only:  mg(x) ≤ true(x)
  *   - bounded error:       true(x) − mg(x) ≤ N / (width + 1)
  *   - every item with true(x) > N / (width + 1) is present in the sketch
  *
  * and, when `width` ≥ the number of distinct items, no decrement ever
  * fires, so counts are EXACT and deterministic — the mode the q70 oracle
  * hash-checks; the saturated (approximate) regime is spec-tested against
  * the order-independent bounds above (HeavyHittersSpec).
  *
  * reduce: increment, insert while below width, else decrement-all-by-one
  * (drop zeros) — O(width) worst case amortized over width insertions.
  * merge: sum counts; if more than `width` entries survive, subtract the
  * (width+1)-largest count from all and drop non-positives (Agarwal et al.
  * mergeable-summaries merge, preserving the N/(width+1) bound). */
class MisraGriesAggregator(width: Int)
    extends Aggregator[String, Map[String, Long], Array[(String, Long)]] {
  require(width > 0, s"width must be positive: $width")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < width => buf.updated(x, 1L)
      case None =>
        buf.iterator.collect { case (k, c) if c > 1 => k -> (c - 1) }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val summed = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (summed.size <= width) summed
    else {
      // subtract the (width+1)-th largest count; ≤ width positives remain
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(width)
      summed.iterator.collect { case (k, c) if c > cut => k -> (c - cut) }.toMap
    }
  }

  override def finish(buf: Map[String, Long]): Array[(String, Long)] =
    buf.toArray.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long)]]()
}

object HeavyHitters {

  /** Column aggregate: Misra-Gries sketch of a STRING column; returns an
    * array of (item, estimate) structs sorted by (estimate desc, item). */
  def misraGries(item: Column, width: Int): Column =
    udaf(new MisraGriesAggregator(width)).apply(item)
}
