package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph-rank propagation — the power-iteration family (PageRank
  * and friends) the connected-components operator ([[Dedup.dupClusters]])
  * doesn't cover: CC answers "which nodes are the same thing", rank answers
  * "which nodes matter". In a curation pipeline this is the host-graph
  * centrality signal web-corpus ranking runs on (Common Crawl publishes
  * exactly this as its harmonic-centrality host ranking); over the
  * dependency-link graph it is service criticality.
  *
  * Scale shape (the Pregel loop expressed in Catalyst):
  *   - the edge relation is normalized ONCE (out-degree mass per source
  *     attached), hash-partitioned on `src`, and persisted — every
  *     iteration's join probes that one cached, already-partitioned frame;
  *   - each iteration is exactly one join (rank vector, keyed by node,
  *     against edges keyed by src) plus one aggregation keyed by dst — two
  *     exchanges of |edges| contribution rows carrying 8-byte longs, never
  *     payloads;
  *   - the rank vector is locally CHECKPOINTED each iteration (the
  *     dupClusters discipline), because persist alone is not enough: a
  *     persisted-but-unbroken lineage nests one plan level per iteration
  *     and Catalyst re-plans the whole history every step — measured
  *     1.4 s → 12.5 s of pure driver-side planning growth by iteration 10
  *     at sf0.1 before the checkpoint was added. On a cluster, a reliable
  *     `checkpoint()` to the fault-tolerant store is the same call;
  *   - nothing ever collects to the driver except the node COUNT (one
  *     scalar) — the rank vector itself stays distributed, so a
  *     billion-node graph is as fine as a thousand-node one.
  *
  * Cross-engine exactness: ranks are BIGINT "mass units" (the total graph
  * mass is `mass` units) and every step is integer arithmetic —
  * per-edge contribution `(rank * w) div wsum` (truncating division; all
  * operands positive, so Spark's `div` == DuckDB's `//`), damped update
  * `((100-d)*base) div 100 + (d*sum) div 100`. Long sums are exact and
  * order-independent, so there is NO float boundary anywhere and the final
  * ranks hash-match any engine that replays the same integer steps.
  * Truncation leaks ≤ 1 unit per edge per iteration — with the default
  * 1e9-unit mass the relative rank error is ≤ out-degree/1e9, irrelevant
  * for ranking and identical in both engines by construction.
  *
  * Overflow bound (documented, not checked row-wise): `rank * w` with
  * rank ≤ mass requires `mass * max(w) < 2^63`; the 1e9 default leaves
  * headroom for per-edge weights up to ~9e9. Widen to DecimalType before
  * raising `mass` past that.
  *
  * Precondition: every `dst` must also occur as a `src` (no dangling
  * nodes — their mass would silently leak). Symmetrized graphs (an edge
  * each way, as [[graft.operators.NorthStarQueries.tradePageRank]] builds)
  * satisfy this by construction.
  */
object Graph {

  /** Weighted PageRank over `edges(src, dst, w)`: `iterations` damped
    * power-iteration steps at `dampingPct`/100, returning the final
    * `(node, rank_u)` vector in integer mass units (Σ rank_u ≤ `mass`).
    */
  def pageRank(edges: DataFrame, iterations: Int, dampingPct: Int = 85,
      mass: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val deg = e.groupBy("src").agg(sum("w").as("wsum"))
    // one normalized, src-partitioned, persisted edge relation for the loop
    val en = e.join(deg, "src").select("src", "dst", "w", "wsum")
      .repartition(col("src")).persist()
    // one distinct, materialized once: the node-count scalar and the rank
    // init used to each run their own distinct job (round-16 optimization —
    // count() now scans the checkpointed blocks)
    val nodes = en.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val base = mass / n // integer division — the oracle replays `mass // n`
    val hold = ((100L - dampingPct) * base) / 100L
    // LAZY localCheckpoint (round-16 optimization): still truncates lineage
    // to a LogicalRDD at definition time (each iteration plans O(1) work),
    // but materialization folds into the next consumer's job instead of a
    // dedicated count-job per round — each rank vector has exactly ONE
    // consumer (the next iteration's join, or the caller's action), so no
    // branch can race a half-materialized checkpoint. Measured: the eager
    // form paid one extra job + driver gap per iteration (~0.1 s each at
    // sf0.1; 45 jobs → 24). Dropped checkpoint blocks are reclaimed by the
    // ContextCleaner once the previous vector goes unreferenced.
    var ranks = nodes.withColumn("rank_u", lit(base))
    for (_ <- 1 to iterations) {
      ranks = step(en, ranks, dampingPct, hold).localCheckpoint(false)
    }
    en.unpersist()
    ranks
  }

  /** Personalized PageRank (TrustRank): identical damped power iteration,
    * but ALL teleport mass concentrates on `seeds(node)` instead of
    * spreading uniformly — the trust/spam-propagation scoring of
    * Gyöngyi et al. 2004, and the curation form of "rank hosts by
    * recursive proximity to a trusted seed list". Only seeds present in
    * the graph carry teleport (an isolated seed has no edges to propagate
    * through — documented; the caller sees it absent from the output).
    * Ranks of unreached nodes are exact zeros and STAY in the vector (the
    * rank relation is |nodes| rows every iteration — no conditional
    * shrinkage, so the plan is identical each round). Same integer
    * discipline as [[pageRank]]: teleport = mass div |effective seeds|,
    * per-node hold = ((100−d)·teleport) div 100 for seeds else 0, update
    * `hold + (d·Σcontrib) div 100` — hash-exact cross-engine. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, dampingPct: Int = 85,
      mass: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val deg = e.groupBy("src").agg(sum("w").as("wsum"))
    val en = e.join(deg, "src").select("src", "dst", "w", "wsum")
      .repartition(col("src")).persist()
    // checkpointed once: `nodes` is read by BOTH the seed semi-join and the
    // holds left-join below — unmaterialized it ran its distinct twice
    // (round-16 optimization)
    val nodes = en.select(col("src").as("node")).distinct().localCheckpoint()
    val eff = nodes.join(seeds.select(col("node")).distinct(), Seq("node"),
      "left_semi").persist()
    val nSeeds = eff.count()
    require(nSeeds > 0, "personalizedPageRank needs at least one seed in the graph")
    val teleport = mass / nSeeds
    val holdSeed = (100L - dampingPct) * teleport / 100L
    // holds: the per-node teleport floor. Instead of re-joining it against
    // the rank vector every round, the DESTINATION's hold rides the edge
    // relation (attached once here), so each iteration stays the q128
    // shape — one join + one aggregate (12.3 → 10.7 s at sf0.1; the
    // remaining q128 gap is the en2 build's extra dst-join shuffle)
    val holds = nodes.join(eff.withColumn("_s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("_s").isNotNull, lit(holdSeed)).otherwise(lit(0L)).as("hold_u"),
        when(col("_s").isNotNull, lit(teleport)).otherwise(lit(0L)).as("r0"))
    val en2 = en.join(holds.select(col("node").as("dst"), col("hold_u").as("_dh")), "dst")
      .select("src", "dst", "w", "wsum", "_dh")
      .repartition(col("src")).persist()
    // lazy loop checkpoints: same single-consumer argument as [[pageRank]] —
    // lineage truncation at definition, materialization folded into the next
    // round's job (round-16 optimization)
    var ranks = holds.select(col("node"), col("r0").as("rank_u"))
      .localCheckpoint(false)
    for (_ <- 1 to iterations) {
      // every node of a symmetrized graph has an in-edge, so the dst-keyed
      // aggregate covers the whole node set each round (zero-rank sources
      // still emit zero-valued contribution rows)
      ranks = en2.join(ranks, en2("src") === ranks("node"))
        .select(col("dst"), col("_dh"), expr("(rank_u * w) div wsum").as("c"))
        .groupBy("dst").agg(max("_dh").as("_h"), sum("c").as("s"))
        .select(col("dst").as("node"),
          (col("_h") + expr(s"($dampingPct * s) div 100")).as("rank_u"))
        .localCheckpoint(false)
    }
    en.unpersist(); eff.unpersist(); en2.unpersist()
    ranks
  }

  /** Multi-source BFS hop distance: the shortest hop count from any seed,
    * bounded at `maxHops` — the "distance to a trusted set" reachability
    * metric (TrustRank's discrete cousin) and the frontier-expansion
    * Pregel shape: each round joins only the FRONTIER (nodes first reached
    * last round) against the edge relation, so total work is
    * Σ|frontier-incident edges| — never rounds×|edges| — and a converged
    * graph costs nothing more (empty frontier short-circuits the loop).
    * Seeds sit at distance 0 whether or not they trade; unreached nodes
    * are ABSENT from the returned (node, dist) vector (the caller decides
    * their sentinel). Pure integer output — hash-exact anywhere. */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val en = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var h = 1
    var done = maxHops == 0
    while (!done) {
      val cand = en.join(frontier, en("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
      val fresh = cand.join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong)).localCheckpoint()
      if (fresh.isEmpty) done = true
      else {
        dist = dist.unionByName(fresh).localCheckpoint()
        frontier = fresh
        h += 1
        if (h > maxHops) done = true
      }
    }
    en.unpersist()
    dist
  }

  /** PER-SEED bounded BFS hop distances: [[bfsDistances]] with seed
    * identity carried through the frontier, so the result is the full
    * (seed, node, dist) relation — |S| simultaneous BFSes in one loop —
    * rather than the min over seeds. The primitive harmonic centrality
    * needs (Σ 1/d must see EVERY seed's distance; the min-merge collapses
    * exactly the information it sums).
    *
    * Scale shape: state and shuffle rows are (seed, node) pairs — bounded
    * by |sample| × |reached|, which is why the CALLER passes a seed SAMPLE
    * (the q157 discipline: deterministic modulo sample, documented rate),
    * never the full node set; with that, each round is one frontier⋈edges
    * join + a distinct + an anti-join of 16-byte rows, Σ|frontier-incident
    * edges| total work, empty-frontier short-circuit. (The sketched
    * alternative — HyperBall's HyperLogLog counters, Boldi & Vigna 2013 —
    * trades this exactness for O(|V|) state; the exact per-seed-sample
    * relation is what the integer oracle can replay.) Seeds sit at
    * distance 0 from themselves; unreached (seed, node) pairs are absent. */
  def seedDistances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val en = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    val dist = seedDistancesOver(en, seeds, maxHops)
    en.unpersist()
    dist
  }

  /** [[seedDistances]] over an edge relation the CALLER has already
    * src-partitioned and persisted — for queries that run several graph
    * passes over the same graph (q166 runs this AND the ANF sketches:
    * sharing one cached relation removes a duplicate scan+shuffle+persist
    * of the whole edge set — round-16 optimization). The caller owns the
    * relation's lifecycle. */
  private[graft] def seedDistancesOver(en: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node").as("seed"), col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var h = 1
    var done = maxHops == 0
    while (!done) {
      val cand = en.join(frontier, en("src") === frontier("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
      val fresh = cand.join(dist, Seq("seed", "node"), "left_anti")
        .withColumn("dist", lit(h.toLong)).localCheckpoint()
      if (fresh.isEmpty) done = true
      else {
        dist = dist.unionByName(fresh).localCheckpoint()
        frontier = fresh
        h += 1
        if (h > maxHops) done = true
      }
    }
    dist
  }

  /** Bounded harmonic centrality from a deterministic seed sample — the
    * statistic this file's header cites for Common Crawl's host ranking
    * (which publishes HARMONIC centrality, not PageRank: Boldi & Vigna,
    * "Axioms for centrality", 2014 — harmonic is the one that handles
    * disconnected graphs without a reachability fudge). For each node v:
    * `Σ_{s∈S, 1≤d(s,v)≤maxHops} (1_000_000 div d(s,v))` plus the reaching
    * seed count — INTEGER micro-units end to end, so the vector hash-matches
    * an unrolled/recursive SQL replay exactly.
    *
    * The hop bound is principled, not a shortcut: each >maxHops
    * contribution is < 1e6/(maxHops+1), and at crawl scale ~everything
    * sits within a small diameter of a large seed sample (the same
    * observation HyperBall exploits). Estimator shape: sampled-source
    * exact BFS (Eppstein–Wang 2004) — centrality ∝ sample mean, so the
    * caller scales by |V|/|S| when an absolute number is needed; ranking
    * needs no rescale. */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame =
    seedDistances(edges, seeds, maxHops)
      .where(col("dist") >= 1L)
      .groupBy("node")
      .agg(sum(expr("1000000 div dist")).as("harmonic_u"),
        count(lit(1)).as("n_seeds_reached"))

  /** ANF / neighborhood-function sketches (Palmer et al. 2002; the
    * HyperBall mechanism, Boldi & Vigna 2013): for EVERY node, a
    * 16-register HyperLogLog sketch of its in-ball — the set of nodes that
    * reach it within h hops (self included) — for each h ≤ maxHops. This
    * is the O(|V|·m) -state complement to [[seedDistances]]' exact
    * per-seed-sample relation: where q157 trades coverage for exactness,
    * ANF covers every node at once and trades exactness for a ~26%
    * standard-error estimate — the pair a 100 TB host-graph analysis
    * actually runs (exact on a seed sample to calibrate, sketches for the
    * full curve).
    *
    * Everything is DETERMINISTIC and engine-portable: element hash =
    * h60('anf:' || node), bucket = h mod 16, rank = position of the
    * lowest set bit of (h div 16) via `length(bin(lsb))` — string length
    * of the binary rendering, exact in any engine, no float log. Each
    * register is its own INT column, so the per-round merge is a plain
    * 16-max aggregate: codegen'd, map-side-combining, no UDAF, no
    * collect_list (a hub's merge state is 16 ints regardless of degree).
    * Union-associativity of elementwise max makes h rounds of neighbor
    * merges EQUAL the sketch of the exact ≤h-hop ball — the property the
    * oracle replays from recursive-CTE reach sets.
    *
    * Returns one frame per hop 1..maxHops: (node, r0..r15). Estimation is
    * the caller's (q163 folds registers into the HLL estimate in integer
    * units). Scale shape: each round is one join + one 16-max aggregate
    * over (node, 16×int) rows; lineage localCheckpoints per round. */
  def anfSketches(edges: DataFrame, maxHops: Int): Seq[(Int, DataFrame)] = {
    val en = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    val out = anfSketchesOver(en, maxHops)
    en.unpersist()
    out
  }

  /** [[anfSketches]] over a caller-prepared (src-partitioned, persisted)
    * edge relation — the q166 sharing companion of [[seedDistancesOver]].
    * The caller owns the relation's lifecycle. */
  private[graft] def anfSketchesOver(en: DataFrame,
      maxHops: Int): Seq[(Int, DataFrame)] = {
    require(maxHops >= 1)
    val M = 16
    val h = PortableSketch.h60(concat(lit("anf:"), col("node").cast("string")))
    val rs = (0 until M).map(i => s"r$i")
    val init = en.select(col("src").as("node"))
      .union(en.select(col("dst").as("node"))).distinct()
      .withColumn("_h", h)
      .withColumn("_b", pmod(col("_h"), lit(M.toLong)))
      .withColumn("_v", expr(s"_h div $M"))
      .withColumn("_rank",
        length(bin(expr("_v & -_v"))).cast("int"))
      .select(col("node") +: (0 until M).map(i =>
        when(col("_b") === i, col("_rank")).otherwise(lit(0)).as(s"r$i")): _*)
    var sk = init.localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, DataFrame)]
    for (hh <- 1 to maxHops) {
      val contrib = en.join(sk, en("src") === sk("node"))
        .select(col("dst").as("node") +: rs.map(col): _*)
      sk = sk.unionByName(contrib)
        .groupBy("node")
        .agg(max(rs.head).as(rs.head), rs.tail.map(r => max(r).as(r)): _*)
        .localCheckpoint()
      out += ((hh, sk))
    }
    out.toSeq
  }

  /** Bounded weighted shortest path — Bellman-Ford relaxation rounds from a
    * seed set over positive integer edge lengths: the COST-distance verb
    * next to [[bfsDistances]]' hop distance (how cheap is the path, not how
    * many steps). The min-plus Pregel shape with the frontier optimization
    * (SPFA): each round relaxes only edges out of nodes whose distance
    * IMPROVED last round — provably equal to full relaxation (a node
    * unimproved in round i−1 already contributed its final offers in the
    * round it last improved), so work ∝ Σ improved-incident edges and a
    * converged graph stops early instead of burning rounds×|edges|.
    * `rounds` bounds path LENGTH (edges), so dist after r rounds = cheapest
    * ≤r-edge path — a fixed-round definition the oracle replays exactly
    * (full relaxation in SQL, equal by the argument above). Long min-merge
    * is order-independent: integer-exact anywhere. Unreached nodes are
    * simply absent (the caller left-joins, the [[bfsDistances]] contract).
    * Precondition: w ≥ 1 (positive lengths — with them, dist values only
    * ever decrease and the merge needs no tie rule beyond min). */
  def weightedDistances(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0)
    val en = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")).persist()
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var r = 1
    var done = rounds == 0
    while (!done) {
      val cand = en.join(frontier, en("src") === frontier("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("_d"))
        .groupBy("node").agg(min("_d").as("_d"))
      val merged = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), lit(Long.MaxValue)),
            coalesce(col("_d"), lit(Long.MaxValue))).as("dist"),
          (col("_d").isNotNull && (col("dist").isNull || col("_d") < col("dist")))
            .as("_improved"))
        .localCheckpoint()
      frontier = merged.where(col("_improved")).select("node", "dist")
      dist = merged.select("node", "dist")
      if (frontier.isEmpty) done = true
      else { r += 1; if (r > rounds) done = true }
    }
    en.unpersist()
    dist
  }

  /** Synchronous weighted label propagation (community detection): every
    * node starts labeled with itself; each round it adopts the label with
    * the greatest total incident edge weight, ties to the SMALLEST label —
    * Raghavan et al. 2007 made deterministic. The third graph semantics
    * next to components (same thing?) and rank (how important?):
    * communities (which cluster?) — in curation terms, domain/topic
    * clustering over a similarity or co-occurrence graph.
    *
    * Determinism: synchronous rounds + a total argmax order (encoded
    * `ws·ordBound − label`, distinct per (ws, label) while every label <
    * `ordBound` and ws·ordBound stays in int64 — caller-guaranteed,
    * documented at the call site) make the result a pure function of the
    * graph and round count; on bipartite structures synchronous LPA can
    * OSCILLATE between two colorings (the classic artifact — a production
    * run would semi-synchronously color first), which fixed rounds keep
    * reproducible and the oracle replays exactly.
    *
    * Scale: same loop discipline as [[pageRank]] — edges cached
    * src-partitioned once; each round is one join + a (dst, label)
    * aggregate + a dst argmax (two label-keyed exchanges of 8-byte pairs);
    * the label vector localCheckpoints per round. Labels are node ids, so
    * the output is integer-exact anywhere. */
  def labelPropagation(edges: DataFrame, rounds: Int,
      ordBound: Long = 10000000L): DataFrame = {
    require(rounds >= 1)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")).persist()
    // lazy loop checkpoints: single consumer per round (the next join) —
    // the [[pageRank]] argument (round-16 optimization)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      labels = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("lab")).agg(sum("w").as("ws"))
        .groupBy(col("dst"))
        .agg(expr(s"max_by(lab, ws * $ordBound - lab)").as("lab"))
        .select(col("dst").as("node"), col("lab"))
        .localCheckpoint(false)
    }
    e.unpersist()
    labels
  }

  /** One damped power-iteration step over the normalized edge relation —
    * exposed for plan pinning: the `en` side must reuse its cached src
    * partitioning (never re-shuffle per iteration) and the contribution
    * sum must aggregate partially before its dst exchange. */
  private[graft] def step(en: DataFrame, ranks: DataFrame, dampingPct: Int,
      hold: Long): DataFrame =
    en.join(ranks, en("src") === ranks("node"))
      .select(col("dst"), expr("(rank_u * w) div wsum").as("c"))
      .groupBy("dst").agg(sum("c").as("s"))
      .select(col("dst").as("node"),
        (lit(hold) + expr(s"($dampingPct * s) div 100")).as("rank_u"))

  /** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge set —
    * the bipartite/endorsement rank the symmetrized PageRank family
    * (q128/q133) can't express: a hub is good because it points at good
    * authorities, an authority because good hubs point at it — two
    * mutually-recursive vectors, not one. Integer discipline throughout:
    * scores are BIGINT mass units, each half-round is ONE src-partitioned
    * join + ONE dst-keyed (or src-keyed) aggregate shuffling 8-byte longs,
    * and the per-round renormalization back to ~`mass` total is
    * `(raw·10000) div (Σraw div 10000)` — both factors exact integer ops
    * (Spark `div` == DuckDB `//` on positives), so the vectors hash-match
    * an unrolled-CTE replay with no float boundary. The Σraw scalar is a
    * one-row driver aggregate per half-round over the checkpointed raw
    * vector (the q128 bounded-model exception). Overflow bound: raw ≤
    * Σscore·maxWeightedDegree ≈ mass·maxdeg, and the renorm multiplies by
    * 10000 — safe while mass·maxdeg < 9.2e14 (maxdeg < ~9.2e6 at the
    * default mass); widen to Decimal past that. Truncation: each renorm
    * loses < 10^-4 relative mass — deterministic, not approximate.
    * Precondition: every src has ≥1 out-edge by construction; `mass` must
    * keep Σraw ≥ 10000 (default 1e8 does at any graph size ≥ 1 node). */
  def hits(edges: DataFrame, rounds: Int,
      mass: Long = 100000000L): DataFrame = {
    require(rounds >= 1)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")).persist()
    // one distinct, materialized once (the count scalar and the hub init
    // used to each run their own distinct job — round-16 optimization)
    val srcNodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    val nh = srcNodes.count()
    require(nh > 0, "hits needs a non-empty edge set")
    var hubs = srcNodes.withColumn("h", lit(mass / nh))
    var auths: DataFrame = hubs.limit(0).select(col("node"), col("h").as("a"))
    for (_ <- 1 to rounds) {
      // only the RAW vectors checkpoint (they are read twice: the renorm
      // scalar and the next half-round); the normalized vectors are pure
      // projections over those LogicalRDDs — lineage stays one deep without
      // paying two more materialization jobs per round. LAZY checkpoints
      // (round-16): the renorm-scalar collect right below is the first
      // consumer and materializes the blocks inside its own job; the next
      // half-round then reads the cached blocks — one job per half-round
      // instead of two.
      val ar = e.join(hubs, e("src") === hubs("node"))
        .select(col("dst"), (col("w") * col("h")).as("x"))
        .groupBy("dst").agg(sum("x").as("raw")).localCheckpoint(false)
      val asum = ar.agg(sum("raw")).head().getLong(0)
      require(asum >= 10000L,
        s"hits: authority mass $asum < 10000 — raise `mass` (renorm divisor would be 0)")
      auths = ar.select(col("dst").as("node"),
        expr(s"(raw * 10000) div (${asum}L div 10000)").as("a"))
      val hr = e.join(auths, e("dst") === auths("node"))
        .select(col("src"), (col("w") * col("a")).as("x"))
        .groupBy("src").agg(sum("x").as("raw")).localCheckpoint(false)
      val hsum = hr.agg(sum("raw")).head().getLong(0)
      require(hsum >= 10000L,
        s"hits: hub mass $hsum < 10000 — raise `mass` (renorm divisor would be 0)")
      hubs = hr.select(col("src").as("node"),
        expr(s"(raw * 10000) div (${hsum}L div 10000)").as("h"))
    }
    e.unpersist()
    hubs.select(lit("hub").as("side"), col("node"), col("h").as("score_u"))
      .unionByName(auths.select(lit("auth").as("side"), col("node"),
        col("a").as("score_u")))
  }

  // --- triangle census (cohesion) -----------------------------------------

  /** Undirected degree relation over `edges(u, v)` — one row per edge, each
    * unordered pair exactly once. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("n"))
      .unionByName(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))

  /** Degree-ordered orientation of an undirected edge set: each edge `(u,v)`
    * becomes `s → t` where `s` precedes `t` in the TOTAL order
    * `(degree, id)` — the classic triangle-enumeration preparation
    * (Chiba–Nishizeki / Schank–Wagner): in the resulting DAG every node's
    * out-degree is O(√m), so the wedge join below generates O(m^1.5)
    * intermediate rows on ANY graph, including power-law ones where
    * id-ordering alone lets a small-id hub fan out deg² wedges. The order
    * compares `struct(d, id)` — engine-native tuple comparison, no packed
    * arithmetic to overflow. `deg` is expected from [[degrees]] (small —
    * one row per node); joined twice, once per endpoint. */
  def orientByDegree(edges: DataFrame, deg: DataFrame): DataFrame = {
    val precedes = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(when(precedes, col("u")).otherwise(col("v")).as("s"),
        when(precedes, col("v")).otherwise(col("u")).as("t"))
  }

  /** Triangle enumeration over a degree-oriented DAG `(s, t)`: each triangle
    * `a ≺ b ≺ c` is produced exactly once as the path `a→b→c` closed by
    * `a→c` — two equi-joins on node ids, no window, no driver state. The
    * oriented relation is referenced three times; callers persist it. */
  def triangles(oriented: DataFrame): DataFrame =
    oriented.as("e1")
      .join(oriented.as("e2"), col("e1.t") === col("e2.s"))
      .join(oriented.as("e3"),
        col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"), "leftsemi")
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))

  /** Per-node triangle participation: each triangle credits all three
    * corners. */
  def triangleCounts(tris: DataFrame): DataFrame =
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("tri"))

  // --- link prediction (similarity) ---------------------------------------

  /** Link prediction over undirected `edges(u, v)` (u < v): for every
    * NON-adjacent pair with ≥ 1 common neighbor, the common-neighbor count
    * and the resource-allocation index (Zhou et al. 2009) — Σ over common
    * neighbors w of `scale div deg(w)`, the integer-exact member of the
    * Adamic-Adar family (low-degree shared neighbors are strong evidence, a
    * shared hub is weak). The graph family's PREDICTION verb: which links
    * are missing — recommendation, knowledge-graph completion, related-item
    * mining.
    *
    * Enumeration is wedge-by-center over the symmetrized adjacency —
    * Σ deg(w)² candidate rows, the honest cost of scoring every
    * 2-path-connected pair. The hub hazard is bounded by `cap`: neighbor
    * lists star-cap at `cap` members via the skew-safe bottom-k threshold
    * ([[Sampling.quotaPerKeyAgg]] — no single-task sort), so one celebrity
    * node can never fan out deg² rows; callers must verify the cap is
    * non-binding wherever an exact oracle replays the uncapped wedge set
    * (the q63/q122 rule). Adjacent pairs drop by ONE anti-join against the
    * edge relation; center degrees ride the wedge relation from a
    * \|nodes\|-row broadcast-able join. All integer. */
  def linkPredict(edges: DataFrame, cap: Int = 256,
      scale: Long = 1000000L): DataFrame = {
    val se = edges.select(col("u").as("w"), col("v").as("n"))
      .unionByName(edges.select(col("v").as("w"), col("u").as("n")))
    val deg = degrees(edges)
    // persist: the wedge self-join references `capped` twice — cached, the
    // symmetrize + quota aggregation + degree join run once instead of once
    // per leg (round-16 optimization, guide §2.4). Narrow (long×3) rows,
    // ≤ cap per center. Ownership: Verify/Bench clear caches per query.
    val capped = Sampling.quotaPerKeyAgg(se, "w", "n", cap)
      .join(deg.select(col("n").as("w"), col("d").as("dw")), "w")
      .persist()
    capped.as("a").join(capped.as("b"),
        col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"), col("a.dw").as("dw"))
      .join(edges.select(col("u"), col("v")), Seq("u", "v"), "left_anti")
      .groupBy("u", "v")
      .agg(count(lit(1)).as("cn"),
        sum(expr(s"${scale}L div dw")).as("ra_ppm"))
  }

  // --- k-core peel (density) ----------------------------------------------

  /** k-core peel trace over undirected `edges(u, v)`: `rounds` synchronous
    * peel steps (drop every node of current degree < k, keep only edges
    * with both endpoints surviving), reporting `(round, n_nodes, n_edges)`
    * after each — round 0 is the input graph. The graph family's DENSITY
    * verb (Seidman 1983): the 2-core strips the tree periphery, higher k
    * isolates the cohesive kernel spam/community analysis keys on. The
    * fixed round count is part of the query definition (the q135 LPA
    * discipline — deterministic, unrollable by any engine); a converged
    * trace shows equal tail rows, so convergence is VISIBLE in the output
    * rather than assumed.
    *
    * Scale shape: each round is one degree aggregation plus two left-semi
    * joins against the surviving-node relation — work ∝ current |edges|,
    * monotonically shrinking; the edge set is eagerly localCheckpoint'ed
    * every round (the pageRank lineage discipline), and per-round stats are
    * one-row aggregates UNIONed, never collected. Nodes are counted from
    * the degree relation, so isolated nodes drop with their last edge —
    * the standard subgraph-of-the-edge-set convention. */
  def kCoreTrace(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // one degree relation per round, PERSISTED (not checkpointed — an eager
    // checkpoint per round measured slower, 6.4→7.2 s, because its 7 extra
    // materialization jobs outweigh the saved re-aggregation): it is read
    // by BOTH the round's stats aggregate and the NEXT round's keep filter,
    // which previously re-aggregated degrees(e_r) from scratch twice per
    // round (round-16 optimization; one (node, long) row per node; lineage
    // is one agg over the checkpointed edge set, so no truncation needed).
    // Ownership: Verify/Bench clear the cache after each query's action.
    def stats(r: Int, deg: DataFrame): DataFrame =
      deg.agg(count(lit(1)).as("n_nodes"),
          // integer div: sum(d) is exactly 2·|edges|; float division would
          // lose exactness past 2^53 summed degree at full scale
          expr("coalesce(sum(d), 0L) div 2").as("n_edges"))
        .select(lit(r).cast("long").as("round"), col("n_nodes"), col("n_edges"))
    var e = edges.select(col("u"), col("v")).localCheckpoint()
    var deg = degrees(e).persist()
    var out = stats(0, deg)
    for (r <- 1 to rounds) {
      val keep = deg.where(col("d") >= k).select(col("n"))
      e = e.join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      deg = degrees(e).persist()
      out = out.unionAll(stats(r, deg))
    }
    out
  }
}
