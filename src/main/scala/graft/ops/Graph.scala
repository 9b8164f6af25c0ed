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
    val n = en.select("src").distinct().count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val base = mass / n // integer division — the oracle replays `mass // n`
    val hold = ((100L - dampingPct) * base) / 100L
    // eager localCheckpoint: truncates lineage to a LogicalRDD so each
    // iteration plans O(1) work; dropped checkpoint blocks are reclaimed by
    // the ContextCleaner once the previous vector goes unreferenced
    var ranks = en.select(col("src").as("node")).distinct()
      .withColumn("rank_u", lit(base)).localCheckpoint()
    for (_ <- 1 to iterations) {
      ranks = step(en, ranks, dampingPct, hold).localCheckpoint()
    }
    en.unpersist()
    ranks
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
}
