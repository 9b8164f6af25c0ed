package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer induction — the other
  * mainstream subword family next to BPE (q117): instead of growing a
  * vocabulary bottom-up by merges, START from a candidate piece inventory
  * and alternate (a) Viterbi-segmenting the frequency-weighted vocabulary
  * under the current piece costs with (b) re-estimating piece
  * probabilities from the chosen segmentations and pruning to the top-K
  * pieces — hard-EM (Viterbi-EM), the deterministic, oracle-replayable
  * reduction of Kudo 2018's marginal EM (which sums over ALL segmentations
  * per word; the argmax path is the part an integer oracle can replay
  * bit-for-bit, and is how the final SentencePiece vocab is APPLIED at
  * encode time anyway).
  *
  * Determinism discipline: piece costs are integer micro-units
  * `cost_u(p) = round(1e6 · ln(total / (cnt(p)+1)))` (Laplace keeps every
  * single-char piece finite, so segmentation is always total); the Viterbi
  * DP runs entirely in BIGINT with ties broken by the `·16 + (Lmax − k)`
  * candidate encoding (equal path costs prefer the LONGER piece, then the
  * smaller start — a total order, identical in the SQL replay); pruning
  * keeps all single chars plus the top-K multi-char pieces by
  * (count desc, piece asc). Only the ln at re-estimation touches libm,
  * rounded with the house 5e-7 margin (the TrainedGate exposure).
  *
  * Scale shape (the q117 posture): the corpus collapses to its (word,
  * count) VOCABULARY first — every EM round is |vocab|-bounded regardless
  * of corpus size; the piece model (singles + K rows) is a driver-side
  * bounded model (the IVF-codebook exception) broadcast into the
  * segmentation pass; the per-word Viterbi is a justified imperative
  * kernel over that broadcast model (the simhash-vote precedent: the MATH
  * is what the oracle replays, position-unrolled in SQL).
  */
object UnigramLM {

  /** Max candidate piece length. */
  val MaxPieceLen = 4

  /** Multi-char vocabulary cap per round (singles always survive). */
  val TopK = 48

  /** EM rounds. */
  val Rounds = 3

  /** The SQL oracle unrolls the DP to this many positions. 12 sits
    * comfortably over the corpus's longest token (8) while keeping the
    * oracle's lateral-alias chain under DuckDB's 128-deep binder recursion
    * limit (the chain binds ~3 aliases/position; 16 positions exceed it).
    * Words PAST this length do not crash the fit: they segment CHAR-WISE
    * (see [[viterbi]]) — the degrade-not-crash posture a real crawl
    * vocabulary needs (URLs, German compounds, unsegmented CJK runs are
    * routinely >12 chars), with the fallback exactly replayable by a
    * length-gated branch in the oracle. */
  val MaxWordLen = 12

  /** One Viterbi segmentation under integer piece costs. `pieces` maps
    * piece → cost_u; every single char of `w` must be present (the Laplace
    * floor guarantees it). Returns the argmin-cost segmentation, ties by
    * the combined `cost·16 + (MaxPieceLen − k)` encoding (longer piece
    * wins), then by smaller start implicitly via the left-to-right DP.
    *
    * Words longer than [[MaxWordLen]] code points take the DOCUMENTED
    * fallback: a char-wise segmentation (cost = Σ single costs — exact
    * integer arithmetic, no model lookup needed to know the pieces). The
    * bound exists for the oracle's position-unrolled DP; the fallback
    * keeps fit/encode total on any vocabulary while staying bit-exact
    * with the oracle's `len(w) > MaxWordLen` branch. Split is by CODE
    * POINT (Spark/DuckDB substr semantics), not UTF-16 unit. */
  private[ops] def viterbi(w: String, pieces: collection.Map[String, Long]): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    if (w.codePointCount(0, n) > MaxWordLen) {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < n) {
        val j = w.offsetByCodePoints(i, 1)
        out += w.substring(i, j)
        i = j
      }
      return out.result()
    }
    val Inf = Long.MaxValue / 32
    val best = new Array[Long](n + 1)
    val backK = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var combinedMin = Inf
      var k = 1
      while (k <= math.min(MaxPieceLen, i)) {
        val cost = pieces.getOrElse(w.substring(i - k, i), Inf)
        if (cost < Inf && best(i - k) < Inf) {
          val combined = (best(i - k) + cost) * 16 + (MaxPieceLen - k)
          if (combined < combinedMin) { combinedMin = combined; backK(i) = k }
        }
        k += 1
      }
      best(i) = if (combinedMin == Inf) Inf else combinedMin / 16
      i += 1
    }
    require(best(n) < Inf, s"unsegmentable word (missing single chars?): $w")
    // walk back
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      val k = backK(pos)
      out = w.substring(pos - k, pos) :: out
      pos -= k
    }
    out
  }

  /** Integer micro-unit cost from a Laplace-smoothed count. */
  private def costU(cnt: Long, total: Long): Long =
    math.round(1e6 * math.log(total.toDouble / (cnt + 1)))

  /** Piece model from raw counts: singles + top-K multi-char by
    * (count desc, piece asc); costs over the KEPT set's Laplace total. */
  private def model(counts: Seq[(String, Long)]): Map[String, Long] = {
    val (singles, multi) = counts.partition(_._1.length == 1)
    val kept = singles ++
      multi.filter(_._2 > 0L).sortBy { case (p, c) => (-c, p) }.take(TopK)
    val total = kept.map(_._2 + 1L).sum
    kept.map { case (p, c) => p -> costU(c, total) }.toMap
  }

  /** Run the induction over a (w, c) vocabulary frame. Returns the final
    * piece model and the final segmentation frame (w, c, pieces). */
  def fit(tf: DataFrame): (Map[String, Long], DataFrame) = {
    val spark = tf.sparkSession
    val vocab = tf.select(col("w"), col("c").cast("long").as("c")).persist()
    // round-0 counts: frequency-weighted substring occurrences, len 1..Lmax.
    // The top-K prune runs DISTRIBUTED (TakeOrdered on the total order
    // (cnt desc, p asc) — the exact rule model() applies), so the driver
    // collects only (K + alphabet) rows, never the raw distinct-substring
    // relation: on an ASCII test corpus that relation is small, but on a
    // multilingual crawl vocabulary it is alphabet⁴-ish — tens of millions
    // of rows, the one collect in this file that was NOT model-bounded.
    val sub = vocab.select(col("c"), col("w"),
        explode(sequence(lit(1), length(col("w")))).as("_i"))
      .select(col("c"), col("w"), col("_i"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("w")) - col("_i") + 1))).as("_k"))
      .select(col("w").substr(col("_i"), col("_k")).as("p"), col("c"))
      .groupBy("p").agg(sum("c").as("cnt"))
      .persist() // feeds the singles AND the top-K collects
    val singlesInit = sub.where(length(col("p")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val multiInit = sub.where(length(col("p")) > 1 && col("cnt") > 0)
      .orderBy(col("cnt").desc, col("p").asc).limit(TopK)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    sub.unpersist()
    val init = singlesInit ++ multiInit
    val alphabet = singlesInit.map(_._1)
    var m = model(init)
    // each round: segment under the CURRENT model, recount from the chosen
    // segmentations, re-estimate + prune — then ONE final segmentation under
    // the last model (what encode time applies; the oracle replays the same
    // chain). Per-round collects are piece-model-bounded (singles + K rows).
    for (_ <- 1 to Rounds) {
      val bc = spark.sparkContext.broadcast(m)
      val segUdf = udf { (w: String) => viterbi(w, bc.value) }
      val counts = vocab
        .select(col("c"), explode(segUdf(col("w"))).as("p"))
        .groupBy("p").agg(sum("c").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val cm = counts.toMap
      // singles absent from this round's segmentations re-enter at count 0
      // (the Laplace floor keeps them usable; the alphabet never shrinks)
      val singles = alphabet.map(s => s -> cm.getOrElse(s, 0L))
      m = model(counts.filter(_._1.length > 1) ++ singles)
    }
    val bcF = spark.sparkContext.broadcast(m)
    val segUdfF = udf { (w: String) => viterbi(w, bcF.value) }
    val seg = vocab.select(col("w"), col("c"), segUdfF(col("w")).as("pieces"))
    (m, seg)
  }

  /** Persist a fitted piece model as (piece, cost_u) parquet — the
    * batch-fit → streaming-encode hand-off (the TrainedGate.saveModel
    * pattern: a model is a tiny bounded frame, not JVM state). */
  def saveModel(spark: SparkSession, m: Map[String, Long], path: String): Unit = {
    import spark.implicits._
    m.toSeq.sortBy(_._1).toDF("piece", "cost_u")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model written by [[saveModel]]. */
  def loadModel(spark: SparkSession, path: String): Map[String, Long] =
    spark.read.parquet(path).select("piece", "cost_u")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Tokenize a word under a fitted model — the encode-time entry point
    * (what a trainer's data loader runs); exactly the fit-time Viterbi. */
  def encode(w: String, m: Map[String, Long]): Seq[String] = viterbi(w, m)
}
