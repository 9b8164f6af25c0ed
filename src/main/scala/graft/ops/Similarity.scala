package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k (exact — broadcast the query set,
  * scan the corpus once, per-partition top-k then global top-k; no corpus
  * shuffle). Scale path: SRP-LSH bucketed search (probe only colliding
  * buckets) — recall traded for a |bucket|-sized candidate set.
  */
object Similarity {

  /** Dot product — the fused codegen kernel (graft.expr.VecOps): one
    * primitive loop inside the stage, vs the higher-order-function
    * formulation (below) whose lambdas evaluate interpretively per element.
    * Requires GraftFunctions registration (every DataFrame-level entry
    * point here ensures it). */
  def dot(a: Column, b: Column): Column = graft.expr.GraftFunctions.dot(a, b)

  /** The reference expression-tree formulation the kernel is pinned
    * bit-equal against (VecExprSpec): same left-to-right summation. */
  private[graft] def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0d, 0.0d).otherwise(dot(a, b) / d)
  }

  /** Deterministic random hyperplanes: planes(p)(d) ~ N(0,1), seeded.
    * Exposed to graft so the DuckDB oracle SQL for the SRP-LSH query can embed
    * the identical planes as literals (NorthStarQueries.q28 oracle). */
  private[graft] def planes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** SRP signature as a LONG bitmap: bit p = (vec · plane_p) >= 0. Built from
    * Catalyst expressions over the broadcast-literal planes — one codegen'd
    * projection per row, no shuffle. */
  def srpSignature(vec: Column, dim: Int, nPlanes: Int = 16, seed: Long = 42L): Column = {
    require(nPlanes <= 63, "signature must fit a LONG")
    val ps = planes(dim, nPlanes, seed)
    ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeLit) >= 0.0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    *
    * queries is expected to be small (it is broadcast); the corpus is scanned
    * once, cosine computed per (query, corpus) pair, and top-k selected with
    * a ranking window partitioned by query id.
    * Returns (queryId, neighborId, cosine, rank), rank 1..k.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusVec: String, corpusId: String,
      queries: DataFrame, queryVec: String, queryId: String,
      k: Int = 10, excludeSelf: Boolean = true): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val q = broadcast(queries.select(col(queryId).as("queryId"), col(queryVec).as("_qv")))
    val c = corpus.select(col(corpusId).as("neighborId"), col(corpusVec).as("_cv"))
    val scored = q.crossJoin(c)
      .where(if (excludeSelf) col("queryId") =!= col("neighborId") else lit(true))
      .select(col("queryId"), col("neighborId"),
        round(cosine(col("_qv"), col("_cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("queryId").orderBy(col("cosine").desc, col("neighborId").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: candidates must share the full SRP
    * signature with the query (single-probe; raise nPlanes for precision,
    * lower for recall). Candidate sets then rank exactly by cosine. */
  def lshTopK(
      corpus: DataFrame, corpusVec: String, corpusId: String,
      queries: DataFrame, queryVec: String, queryId: String,
      dim: Int, k: Int = 10, nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(corpusId).as("neighborId"), col(corpusVec).as("_cv"),
      srpSignature(col(corpusVec), dim, nPlanes, seed).as("_sig"))
    val q = broadcast(queries.select(col(queryId).as("queryId"), col(queryVec).as("_qv"),
      srpSignature(col(queryVec), dim, nPlanes, seed).as("_sig")))
    val scored = q.join(c, "_sig")
      .where(col("queryId") =!= col("neighborId"))
      .select(col("queryId"), col("neighborId"),
        round(cosine(col("_qv"), col("_cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("queryId").orderBy(col("cosine").desc, col("neighborId").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-style coarse quantization: assign each vector to its nearest of
    * `centroids` (broadcast literal), producing a partition key for
    * bucket-pruned search / co-clustered storage. Centroids are provided by
    * the caller (e.g. a sampled k-means done offline).
    *
    * Ties (equal similarity) resolve to the HIGHER centroid id. Vectors whose
    * cosine is NULL against every centroid (null embedding / null elements)
    * get the `-1` sentinel — same rule as [[ivfAssignModel]], so literal and
    * model quantizers bucket dirty data identically (SimilaritySpec). The
    * sentinel is an extra (sim=-2, cid=-1) struct in the argmax rather than
    * a null test on the winner: real cosines live in [-1, 1] and NULL ones
    * coalesce to -3, so the sentinel wins exactly when every centroid's
    * cosine is NULL — and the scoring tree is referenced ONCE (a
    * `when(max.sim isNull …)` wrapper would duplicate the whole K×dim
    * argmax expression; measured +43% on q47). */
  def ivfAssign(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (cVec, i) =>
      val cLit = array(cVec.toIndexedSeq.map(lit): _*)
      struct(coalesce(cosine(vec, cLit), lit(-3.0d)).as("sim"), lit(i).as("cid"))
    }
    val sentinel = struct(lit(-2.0d).as("sim"), lit(-1).as("cid"))
    array_max(array((scored :+ sentinel).toIndexedSeq: _*)).getField("cid")
  }

  /** Top-`nprobe` coarse buckets for a QUERY vector — the recall knob of
    * IVF search. The corpus keeps ONE bucket per vector ([[ivfAssign]], the
    * codegen'd hot path over billions of rows); queries probe their
    * `nprobe` nearest buckets, trading a linear candidate-set growth for
    * recall lost at bucket boundaries. Ordering and tie rule match
    * ivfAssign exactly — descending similarity, ties to the HIGHER cid —
    * so element 1 of the result IS ivfAssign's bucket (pinned in
    * SimilaritySpec), and a vector whose cosine is NULL against every
    * centroid probes the `-1` sentinel first (entries after the sentinel
    * are NULL-cosine centroids; dirty-data callers stop at -1). Uses
    * interpreted higher-order ops (array_sort/slice/transform) — fine on
    * the query side, whose cardinality is small by definition; do NOT use
    * it as the corpus-side quantizer. */
  def ivfProbe(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    require(nprobe >= 1, s"nprobe=$nprobe must be >= 1")
    val scored = centroids.zipWithIndex.map { case (cVec, i) =>
      val cLit = array(cVec.toIndexedSeq.map(lit): _*)
      struct(coalesce(cosine(vec, cLit), lit(-3.0d)).as("sim"), lit(i).as("cid"))
    }
    val sentinel = struct(lit(-2.0d).as("sim"), lit(-1).as("cid"))
    // ascending lexicographic sort on (sim, cid) reversed = sim desc, ties
    // cid desc — exactly ivfAssign's array_max order
    val sorted = reverse(array_sort(array((scored :+ sentinel).toIndexedSeq: _*)))
    transform(slice(sorted, 1, nprobe), _.getField("cid"))
  }

  /** [[ivfProbe]] against a centroid MODEL too large for literal unrolling —
    * the probe-side companion of [[ivfAssignModel]]: the whole model is ONE
    * `array<array<double>>` literal scored with an index-aware `transform`,
    * so nlist can grow to thousands. Same order and tie rule as every other
    * quantizer here (sim desc, ties to higher cid, all-NULL → -1 sentinel
    * first); slot 1 ≡ ivfAssignModel ≡ ivfAssign, pinned in SimilaritySpec.
    * Query-side only, like ivfProbe. */
  def ivfProbeModel(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    require(centroids.nonEmpty, "empty centroid model")
    require(nprobe >= 1, s"nprobe=$nprobe must be >= 1")
    val model = typedLit(centroids.map(_.toSeq).toSeq)
    val scored = transform(model, (c, i) =>
      struct(coalesce(cosine(vec, c), lit(-3.0d)).as("sim"), i.cast("integer").as("cid")))
    val withSentinel = concat(scored,
      array(struct(lit(-2.0d).as("sim"), lit(-1).as("cid"))))
    transform(slice(reverse(array_sort(withSentinel)), 1, nprobe), _.getField("cid"))
  }

  /** IVF assignment against a centroid MODEL too large for [[ivfAssign]]'s
    * literal unrolling (K×dim separate expression nodes blow the codegen
    * method-size limit past nlist≈16). The whole model ships as ONE
    * `array<array<double>>` literal — a single broadcast object in the plan,
    * not K×dim expression nodes — and the argmax folds over it with a
    * higher-order `aggregate`, carrying (bestSim, bestCid, idx) through the
    * accumulator. Still zero shuffle and zero join: one projection per row,
    * exactly like the literal form, so it composes with the same
    * bucket-probe joins downstream. Tie rule matches [[ivfAssign]]
    * (`array_max` over (sim, cid) structs): equal similarity resolves to
    * the HIGHER centroid id — here via `>=` with ascending fold order. A
    * vector whose cosine is NULL against every centroid keeps the init
    * accumulator and returns the `-1` sentinel, matching [[ivfAssign]].
    * Pinned equal to ivfAssign (ties, nulls, random vectors) in
    * SimilaritySpec. */
  /** Product-quantization encode: split the vector into M = books.length
    * subspaces and store, per subspace, the index of the nearest codebook
    * entry by L2 (argmin ‖x_m − c‖² ≡ argmax 2·x_m·c − ‖c‖², the ‖x_m‖²
    * term being constant across codes). The corpus row shrinks to M small
    * ints + one precomputed norm ([[pqNormSq]]) — the 100 TB ANN trick:
    * ADC scoring reads M codes instead of the full float vector. Ties
    * resolve to the HIGHER code (array_max over (score, k) structs, the
    * ivfAssign rule); a subvector whose dot is NULL against every code
    * scores -1e300 everywhere and deterministically takes the highest k.
    * Literal-unrolled like [[ivfAssign]] (M×K×subdim constants in one
    * codegen'd projection) — right for the M=8, K=16 coarse books here. */
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebook")
    val subdim = books(0)(0).length
    array(books.zipWithIndex.map { case (book, m) =>
      val sub = slice(vec, m * subdim + 1, subdim)
      val scored = book.zipWithIndex.map { case (c, k) =>
        val cLit = array(c.toIndexedSeq.map(lit): _*)
        val cc = c.map(x => x * x).sum
        struct(coalesce(dot(sub, cLit) * 2 - lit(cc), lit(-1e300)).as("s"),
          lit(k).as("k"))
      }
      array_max(array(scored.toIndexedSeq: _*)).getField("k")
    }.toIndexedSeq: _*)
  }

  /** Lloyd-train the PQ subspace codebooks: `rounds` synchronous k-means
    * steps per subspace, all M subspaces in ONE corpus pass per round
    * (posexplode the per-row code array, per-(m, code, dim) means). The
    * SemDedup (q91) determinism discipline applies verbatim: assignment
    * ties resolve to the HIGHER code (the [[pqEncode]] rule), per-dim
    * means ROUND to 6 dp so distributed-sum ulps can never flip a later
    * assignment in any engine, and an empty cell keeps its seed entry.
    * The collected model is M×K×subdim doubles (8×16×8 = 1 KB here) —
    * a documented bounded-model collect, like the IVF centroids.
    *
    * Measured round 16 (BASELINE.md): trained RAW codebooks lift q109
    * recall where the standard IVF-PQ residual construction (encode
    * x − c_coarse) measurably HURTS on this corpus — the embeddings are
    * isotropic unit gaussians, so coarse assignment removes no energy
    * (‖x − c‖ ≈ 1.25 > ‖x‖ = 1) and the constant q·c term compresses
    * candidate spacing. Residual encoding stays the right construction
    * for clustered real-world corpora; it is not wired here because the
    * audit (q109) showed it losing recall on this data. */
  def pqTrainBooks(emb: DataFrame, vecCol: String,
      seed: Array[Array[Array[Double]]], rounds: Int): Array[Array[Array[Double]]] = {
    val subdim = seed(0)(0).length
    var books = seed
    for (_ <- 1 to rounds) {
      val means = emb
        .select(col(vecCol).as("_v"), pqEncode(col(vecCol), books).as("_codes"))
        .select(posexplode(col("_codes")).as(Seq("_m", "_k")), col("_v"))
        .select(col("_m"), col("_k"),
          posexplode(slice(col("_v"), col("_m") * subdim + 1, lit(subdim)))
            .as(Seq("_j", "_x")))
        .groupBy("_m", "_k", "_j").agg(round(avg("_x"), 6).as("_mx"))
        .collect() // bounded: ≤ M·K·subdim rows
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      books = next
    }
    books
  }

  /** Approximate squared norm of a PQ-encoded vector: Σ_m ‖c_{m,code_m}‖² —
    * the reconstruction's norm, precomputed at encode time so search never
    * touches the original floats. */
  def pqNormSq(codes: Column, books: Array[Array[Array[Double]]]): Column = {
    val ccLit = typedLit(books.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
    books.indices.map { m =>
      element_at(element_at(ccLit, m + 1), element_at(codes, m + 1) + 1)
    }.reduce(_ + _)
  }

  /** Asymmetric-distance (ADC) dot product: the query stays exact, the
    * candidate is its PQ reconstruction — Σ_m q_m · c_{m,code_m}, an
    * M-term unrolled expression over the broadcast codebook literal. */
  def pqAdcDot(queryVec: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column = {
    val subdim = books(0)(0).length
    val model = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    books.indices.map { m =>
      dot(slice(queryVec, m * subdim + 1, subdim),
        element_at(element_at(model, m + 1), element_at(codes, m + 1) + 1))
    }.reduce(_ + _)
  }

  def ivfAssignModel(vec: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "empty centroid model")
    val model = typedLit(centroids.map(_.toSeq).toSeq)
    val init = struct(
      lit(Double.NegativeInfinity).as("sim"), lit(-1).as("cid"), lit(0).as("i"))
    aggregate(
      model, init,
      (acc, c) => {
        val s = cosine(vec, c)
        val better = s >= acc.getField("sim")
        struct(
          when(better, s).otherwise(acc.getField("sim")).as("sim"),
          when(better, acc.getField("i")).otherwise(acc.getField("cid")).as("cid"),
          (acc.getField("i") + lit(1)).as("i"))
      },
      acc => acc.getField("cid"))
  }
}
