package graft.operators

import graft.ops.{Sampling, Temporal, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 pipeline operators: temporal joins (as-of, range), gap
  * sessionization, distribution sketches (quantiles), vocabulary statistics,
  * and stratified sampling — the remaining standard verbs of a large-scale
  * training-data / log-analytics pipeline, each DuckDB-oracled.
  *
  * Timestamp convention: every query compares/aggregates `events.ts` as
  * micros since epoch via [[ContractQueries.tsMicros]], which equals DuckDB's
  * `epoch_us(ts)` exactly for both testdata generations (long NANOS read via
  * nanosAsLong, where DuckDB truncates to micros anyway, and the current
  * TIMESTAMP_NTZ micros).
  */
object PipelineQueries {
  import ContractQueries.{table, tsMicros}

  /** q53 — as-of join: each click event matched to the most recent
    * prior-or-equal view event of the same user (backward as-of). Clicks
    * with no prior view are dropped (inner as-of). */
  def asofViewBeforeClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), tsMicros(ev).as("tsu"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), tsMicros(ev).as("tsu"))
    Temporal.asofJoinPrior(clicks, views, "user_id", "tsu", "tsu",
      rightPick = Seq("view_id"), rightTieBreak = "view_id")
      .where(col("view_id").isNotNull)
      .select("user_id", "click_id", "view_id")
      .orderBy("user_id", "click_id")
  }

  private val sixHoursU = 21600L * 1000000L
  private val bucketU = 3600L * 1000000L // 1 h buckets: intervals span ≤ 7

  /** q54 — range join: per-event-type "incident windows" (first occurrence +
    * 6 h), counting ALL events falling inside each window. The interval
    * join runs as a bucketed equi-join (Temporal.bucketedRangeJoin), not a
    * nested-loop theta join. */
  def windowRangeCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val windows = ev.groupBy(col("event_type").as("wtype"))
      .agg(min(tsMicros(ev)).as("lo"))
      .withColumn("hi", col("lo") + sixHoursU)
    Temporal.bucketedRangeJoin(ev.select(tsMicros(ev).as("tsu")), "tsu",
      windows, "lo", "hi", bucketWidth = bucketU)
      .groupBy("wtype").agg(count(lit(1)).as("n"))
      .orderBy("wtype")
  }

  /** q129 — cohort retention matrix: users cohorted by their FIRST active
    * day, retention reported per (cohort_day, day_offset) — the standard
    * product-analytics view q116's funnel (one fixed stage chain) and q55's
    * sessions (gap-local) don't express. Day ids are integer epoch-days
    * (`tsu div 86400000000` == DuckDB `epoch_us(ts) // 86400000000`) and
    * retention is basis points by integer division, so every cell is
    * hash-exact cross-engine.
    *
    * Scale: the corpus collapses to the distinct (user, day) relation at
    * the scan (bounded by users×days, not events); cohort assignment is a
    * user-keyed aggregate + join (one reusable user_id exchange — the q116
    * posture); cohort sizes are a days-bounded relation joined broadcast.
    * No window function, no per-user sequence materialization. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val ud = ev.select(col("user_id"), tsMicros(ev).as("tsu"))
      .select(col("user_id"), expr("tsu div 86400000000").as("day"))
      .distinct()
    val first = ud.groupBy("user_id").agg(min("day").as("d0"))
    val sizes = first.groupBy("d0").agg(count(lit(1)).as("cohort_size"))
    ud.join(first, "user_id")
      .groupBy(col("d0"), (col("day") - col("d0")).as("day_offset"))
      .agg(count(lit(1)).as("retained")) // (user, day) distinct ⇒ user count
      .join(sizes, "d0")
      .select(col("d0").as("cohort_day"), col("day_offset"),
        col("cohort_size"), col("retained"),
        expr("(retained * 10000) div cohort_size").as("retention_bp"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q130 — hourly anomaly screen: per event type, hours whose count
    * deviates from the type's own mean by more than 3σ (and 2σ), plus the
    * peak hour — the volume-anomaly monitor a log pipeline runs ahead of
    * any model. The σ rule is evaluated ENTIRELY in integers — |n−μ| > kσ
    * rewritten as (n·H − S)² > k²·(H·Q − S²) with H = hours observed,
    * S = Σn, Q = Σn² — so there is no float boundary and the strict->
    * bound is exact in both engines (an exactly-kσ hour is NOT anomalous).
    * Hours with zero events don't exist as rows and are out of scope by
    * construction (documented semantic).
    *
    * Scale: one scan collapses to the (type, hour) count relation; the
    * 5-row per-type stats relation joins back BROADCAST; everything after
    * runs on hours-bounded frames. Overflow: (n·H)² must stay < 2^63 —
    * fine to ~3e9 events per type-hour-corpus at day scale; widen to
    * DECIMAL beyond.  Peak-hour tiebreak: smallest hour id. */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    // persist: feeds both the per-type stats aggregate and the flag pass.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val h = ev.select(col("event_type"), tsMicros(ev).as("tsu"))
      .select(col("event_type"), expr("tsu div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      .persist()
    val s = h.groupBy("event_type").agg(count(lit(1)).as("hh"),
      sum("n").as("ss"), sum(expr("n * n")).as("qq"), max("n").as("mx"))
    h.join(broadcast(s), "event_type")
      .groupBy("event_type")
      .agg(max("hh").as("n_hours"),
        sum(when(expr("(n*hh - ss)*(n*hh - ss) > 9*(hh*qq - ss*ss)"), 1L)
          .otherwise(0L)).as("hours_3s"),
        sum(when(expr("(n*hh - ss)*(n*hh - ss) > 4*(hh*qq - ss*ss)"), 1L)
          .otherwise(0L)).as("hours_2s"),
        min(when(col("n") === col("mx"), col("hr"))).as("peak_hr"),
        max("mx").as("peak_n"))
      .orderBy("event_type")
  }

  /** q132 — EWMA volume trend: per event type, an exponentially-weighted
    * moving average (α = 0.3) over the DAY-ordered daily counts, plus the
    * count of "spike" days whose volume more than DOUBLES the running EWMA
    * of all prior days — the adaptive-trend complement to q130's global-σ
    * screen (a slow ramp never spikes here but shifts σ there; a step
    * change spikes here immediately). The recurrence runs as ONE
    * higher-order fold per type (the StreamingImportance/q125 discipline —
    * no window function, no self-join), entirely in integers: EWMA in
    * micro-units via `e' = (3·n·1e6 + 7·e) div 10`, spike count packed
    * into the same accumulator (`acc = e·64 + spikes`; day counts are
    * bounded by the span so spikes < 64), and the fold seeds with the
    * FIRST day pre-packed so Spark's `aggregate` and DuckDB's
    * seed-from-head `list_reduce` compute the identical chain. Both
    * engines fold the same day-ascending sequence, so the result is
    * hash-exact with no float anywhere.
    *
    * Scale: the corpus collapses to (type, day) counts at the scan; the
    * fold runs over a days-bounded array per type (the bounded-model
    * exception — thousands of elements after years, never corpus-sized).
    * Overflow: e ≤ max-daily-count·1e6 and acc = e·64 needs
    * max-daily-count < ~1.4e11. */
  def ewmaTrend(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(col("event_type"), tsMicros(ev).as("tsu"))
      .select(col("event_type"), expr("tsu div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .groupBy("event_type").agg(count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, n))), x -> x.n)")
          .as("ns"))
      .select(col("event_type"), col("n_days"),
        expr("""aggregate(slice(ns, 2, greatest(size(ns) - 1, 0)),
          CAST(element_at(ns, 1) * 1000000 * 64 AS BIGINT),
          (acc, nn) -> ((3 * nn * 1000000 + 7 * (acc div 64)) div 10) * 64
            + pmod(acc, 64)
            + IF(nn * 1000000 > 2 * (acc div 64), 1, 0))""").as("packed"))
      .select(col("event_type"), col("n_days"),
        expr("packed div 64").as("ewma_u"),
        expr("pmod(packed, 64)").as("spike_days"))
      .orderBy("event_type")
  }

  /** q137 — rolling active users: per day, DAU (distinct users active that
    * day), trailing-7-day WAU, and DAU/WAU "stickiness" in basis points —
    * the engagement family's rolling-distinct verb, which naive SQL writes
    * as a per-day window over user sets (quadratic re-scan). Relational
    * form: each distinct (user, day) activity CONTRIBUTES to the 7 report
    * days it covers (one bounded explode ×7), dedups to (user, report
    * day), and counts — cost is 7×|user-days|, never days×|users|. Days
    * past the last observed activity are cut (driver-scalar max, one
    * aggregate); leading days carry partial (shorter) windows by
    * definition. Integer-exact throughout. */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    // persist: feeds the max-day scalar, DAU, and the WAU contribution
    // explode. Ownership: Verify/Bench clear the cache after each query.
    val ud = ev.select(col("user_id"), tsMicros(ev).as("tsu"))
      .select(col("user_id"), expr("tsu div 86400000000").as("day"))
      .distinct().persist()
    val maxDay = ud.agg(max("day")).head().getLong(0)
    val wau = ud.select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("d"))
      .where(col("d") <= maxDay)
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("d"), "left")
      .na.fill(0L, Seq("dau"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        expr("(dau * 10000) div wau").as("stickiness_bp"))
      .orderBy("day")
  }

  private val gapU = 1800L * 1000000L // 30 min session gap (micros)

  /** q55 — gap sessionization: per-user sessions at a 30-minute silence
    * threshold, rolled up to per-user session stats. */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    Temporal.sessionize(
      ev.select(col("user_id"), tsMicros(ev).as("tsu"), col("event_id")),
      "user_id", "tsu", "event_id", gapU)
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n"), (max("tsu") - min("tsu")).as("dur"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"),
        round(avg("n"), 4).as("avg_events"), max("dur").as("max_dur_us"))
      .orderBy("user_id")
  }

  /** q140 — event-type transition matrix: per user, consecutive event pairs
    * in (ts, event_id) order, rolled up to first-order Markov transition
    * counts with probabilities in integer basis points — the
    * clickstream-modeling verb (next-action prediction, anomalous-flow
    * screens) next to q55's sessions and q116's fixed funnel. Scale: one
    * shuffle on user_id for the lead window (keys ∝ users, never hot); the
    * pair rollup partially aggregates map-side into ≤ |types|² groups; the
    * per-source normalizer is a window over that tiny grouped relation, not
    * over events. Integer-exact (n·10000 div total). */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    ev.select(col("user_id"), tsMicros(ev).as("tsu"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("next_type").as("dst_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob_bp",
        expr("(n * 10000) div sum(n) over (partition by src_type)"))
      .orderBy("src_type", "dst_type")
  }

  /** q147 — transition dwell time: for every q140 consecutive-pair edge, the
    * distribution of time spent between the two actions — p50/p90 seconds per
    * (src, dst) — the latency face of the transition matrix (where do users
    * stall?). Same single user-keyed window shuffle as q140; the rollup is
    * ≤ |types|² groups. Quantiles follow the q56 discipline: the EXACT
    * interpolating percentile is the oracled value (group sizes here are
    * events div |types|², so exact percentile's per-group buffer is the
    * honest cost to flag); `approx_ok` pins the bounded-memory
    * approx_percentile — the column a 100 TB run would ship — to within
    * 5%+2s of exact, so the scale path is continuously audited. */
  def transitionLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    ev.select(col("user_id"), tsMicros(ev).as("tsu"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("delta_us", lead(col("tsu"), 1).over(w) - col("tsu"))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("next_type").as("dst_type"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(delta_us, 0.5D)") / 1e6, 4).as("p50_s"),
        round(expr("percentile(delta_us, 0.9D)") / 1e6, 4).as("p90_s"),
        expr("approx_percentile(delta_us, 0.5D, 10000)").as("_ap50"))
      .select(col("src_type"), col("dst_type"), col("n"), col("p50_s"), col("p90_s"),
        // below 100 samples the gap between the sketch's DISCRETE answer
        // and the interpolated exact p50 is definitional, not sketch error
        // (a 2-element group's midpoint is a value no element-returning
        // sketch can produce — caught at sf0.001); the audit targets the
        // big-group regime a 100 TB run would actually rely on
        (col("n") < 100 ||
          abs(col("_ap50") / 1e6 - col("p50_s")) <= col("p50_s") * 0.05 + lit(2.0))
          .as("approx_ok"))
      .orderBy("src_type", "dst_type")
  }

  /** q149 — weekday seasonality: per event type and ISO weekday, event count
    * and seasonality index (share vs the uniform 1/7, basis points — 10000 =
    * flat) — the periodicity profile behind q130's hourly screen and q132's
    * daily trend (is Saturday REALLY quiet, per type?). Day-of-week is pure
    * integer arithmetic on epoch days ((d+3) mod 7, 0 = Monday — epoch day 0
    * was a Thursday), so no engine's locale/week-start convention is in
    * play. One scan collapses map-side to ≤ |types|·7 groups; the per-type
    * normalizer windows over that tiny relation. */
  def weekdaySeasonality(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(col("event_type"), tsMicros(ev).as("tsu"))
      .select(col("event_type"), expr("(tsu div 86400000000 + 3) % 7").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
      .withColumn("idx_bp",
        expr("(n * 7 * 10000) div sum(n) over (partition by event_type)"))
      .orderBy("event_type", "dow")
  }

  /** q154 — behavioral pattern screen: every q55 session's FULL ordered
    * path matched against ordered-containment patterns (SQL LIKE
    * '%a%b%' — "a then eventually b") — the cohort-filter verb behind
    * funnels: did the journey convert after a view, recover after an
    * error, enter via signup, or only browse? Counts + share in basis
    * points. LIKE is safe as sequence containment here because no event
    * type is a substring of another (view/click/purchase/signup/error —
    * asserted nowhere else, documented here). One sessionize shuffle; the
    * path rollup reuses its key prefix; the four screens fold into ONE
    * aggregate row unpivoted by stack — no per-pattern pass. Paths are
    * session-bounded (the 30-min gap rule caps realistic length; no
    * truncation, unlike q141's first-5 cut, because a tail conversion is
    * exactly what the screen must see). */
  def sessionPatternScreen(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val s = Temporal.sessionize(
      ev.select(col("user_id"), tsMicros(ev).as("tsu"), col("event_id"),
        col("event_type")),
      "user_id", "tsu", "event_id", gapU)
    val paths = s.groupBy("user_id", "session_seq")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("tsu"), col("event_id"),
          col("event_type")))),
        e => e.getField("event_type")), ">").as("path"))
    paths.agg(count(lit(1)).as("total"),
        sum(when(col("path").like("%view%purchase%"), 1L).otherwise(0L)).as("vtp"),
        sum(when(col("path").like("%error%purchase%"), 1L).otherwise(0L)).as("er"),
        sum(when(col("path").like("signup%"), 1L).otherwise(0L)).as("se"),
        sum(when(!col("path").like("%purchase%")
          && !col("path").like("%signup%"), 1L).otherwise(0L)).as("bo"))
      .select(expr("stack(4, 'browse_only', bo, 'error_recovery', er, " +
        "'signup_entry', se, 'view_to_purchase', vtp) AS (pattern, n_sessions)"),
        col("total"))
      .select(col("pattern"), col("n_sessions"),
        expr("(n_sessions * 10000) div total").as("share_bp"))
      .orderBy("pattern")
  }

  /** q150 — RFM customer segmentation: every customer scored on Recency
    * (days since last order vs the corpus anchor), Frequency (order count),
    * Monetary (total quantity — the integer-exact stand-in for revenue),
    * split hi/lo at each metric's corpus MEAN (integer div — the portable,
    * data-dependent threshold; quantile splits would drag in cross-engine
    * discrete-quantile semantics for no analytics gain), rolled up to the 8
    * R×F×M segments — the customer-base segmentation verb behind retention
    * (q129) and funnel (q116) views. Scale: two aggregates (orders by
    * customer; lineitem⋈orders by customer) + one customer-keyed join; the
    * thresholds are ONE 5-scalar driver row (bounded-model exception), with
    * rbar derived as (anchor·n − Σlast) div n so anchor and means share the
    * pass. Customers who never ordered are out of scope by construction
    * (inner semantics, documented). */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
      .select(col("o_custkey").as("cust"), col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
    val oc = ord.groupBy("cust")
      .agg(count(lit(1)).as("freq"), max("day").as("last_day"))
    val mon = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      .join(ord.select("o_orderkey", "cust"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("cust").agg(sum("qty").as("mon"))
    val j = oc.join(mon, "cust").persist()
    val t = j.agg(max("last_day"), count(lit(1)), sum("last_day"),
      sum("freq"), sum("mon")).head()
    val (anchor, n) = (t.getLong(0), t.getLong(1))
    val (rbar, fbar, mbar) =
      ((anchor * n - t.getLong(2)) / n, t.getLong(3) / n, t.getLong(4) / n)
    j.select(
        concat(lit("R"), when(lit(anchor) - col("last_day") <= rbar, lit("1")).otherwise(lit("0")),
          lit("F"), when(col("freq") > fbar, lit("1")).otherwise(lit("0")),
          lit("M"), when(col("mon") > mbar, lit("1")).otherwise(lit("0"))).as("segment"),
        col("freq"), col("mon"))
      .groupBy("segment").agg(count(lit(1)).as("n_customers"),
        sum("freq").as("tot_orders"), sum("mon").as("tot_qty"))
      .orderBy("segment")
  }

  /** q152 — token-frequency concentration: [[graft.ops.Concentration]]'s
    * Gini + top-1%-share profile per language over the corpus vocabulary —
    * the Zipf/heavy-tail measurement behind every skew decision this engine
    * makes (hot-gram caps q80/q97, salting q60, banding caps q24): how
    * unequal IS the token distribution, per slice, as one auditable number.
    * All integer basis points (single trailing div per metric); every
    * window runs over the (lang, tf-value) histogram, never over tokens. */
  def tokenConcentration(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(coalesce(col("lang"), lit("??")).as("lang"),
        explode(filter(split(col("text"), "\\s+"), t => t =!= lit(""))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("tf"))
    graft.ops.Concentration.profile(tf, Seq("lang"), "tf").orderBy("lang")
  }

  /** q141 — session path mining: the first 5 event types of every q55-style
    * session (30-min gap), as a `>`-joined path string, counted across
    * sessions — top-20 common journeys (the sequence-mining verb over the
    * session verb: what do sessions DO, not just how long are they). The
    * per-session collect is bounded by the path cut and sessions are
    * bounded by the gap; order inside the collect is made total by sorting
    * (tsu, event_id, type) structs — collect_list alone is
    * arrival-ordered. Scale: sessionize's user shuffle, then a
    * (user, session) rollup that reuses the same key prefix, then a
    * count over ≤ |types|^5 paths; top-20 is a TakeOrdered. */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val s = Temporal.sessionize(
      ev.select(col("user_id"), tsMicros(ev).as("tsu"), col("event_id"),
        col("event_type")),
      "user_id", "tsu", "event_id", gapU)
    s.groupBy("user_id", "session_seq")
      .agg(array_join(
        slice(transform(
          array_sort(collect_list(struct(col("tsu"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), 1, 5), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** q56 — distribution quantiles per language: exact percentiles
    * (interpolated, matching DuckDB quantile_cont) alongside the
    * fixed-size-sketch approximation (approx_percentile / GK-style) that a
    * 100 TB run would use — surfaced like q34's HLL as an `approx_ok`
    * accuracy bound the oracle pins TRUE, since DuckDB cannot reproduce
    * Spark's sketch internals. The bound is the sketch's actual RANK-error
    * guarantee (|rank(ap50) − n/2| ≤ n/accuracy + 2), measured by counting
    * the group's elements on each side of the sketch value — a theorem of
    * the GK summary, so it holds on ANY distribution. (The earlier
    * value-distance tolerance |ap50 − p50| ≤ 5%·p50+2 flipped FALSE on
    * distributions sparse around the median, where the nearest true
    * element legitimately sits far from the interpolated p50 — a
    * tools/fuzz_diff.py find.) */
  def charQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val base = docs.groupBy("lang")
      .agg(
        round(expr("percentile(n_chars, 0.5D)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.9D)"), 4).as("p90"),
        round(expr("percentile(n_chars, 0.99D)"), 4).as("p99"),
        expr("approx_percentile(n_chars, 0.5D, 10000)").as("_ap50"))
    // null-safe rejoin: an equi-join on lang would silently DROP the NULL-
    // lang group the aggregate (and the oracle's GROUP BY) still reports —
    // a latent data-shape divergence on corpora with unlabeled rows
    // (testdata never emits them; the fuzz generators now do).
    docs.select(col("lang"), col("n_chars")).as("d")
      .join(broadcast(base.as("b")), col("d.lang") <=> col("b.lang"))
      .select(col("d.lang").as("lang"), col("n_chars"),
        col("p50"), col("p90"), col("p99"), col("_ap50"))
      .groupBy("lang")
      .agg(first("p50").as("p50"), first("p90").as("p90"),
        first("p99").as("p99"),
        sum(when(col("n_chars") < col("_ap50"), 1L).otherwise(0L)).as("_below"),
        sum(when(col("n_chars") > col("_ap50"), 1L).otherwise(0L)).as("_above"),
        count(lit(1)).as("_n"))
      .select(col("lang"), col("p50"), col("p90"), col("p99"),
        (col("_below") <= col("_n") / 2 + col("_n") / 10000 + 2 &&
          col("_above") <= col("_n") / 2 + col("_n") / 10000 + 2).as("approx_ok"))
      .orderBy("lang")
  }

  /** q57 — vocabulary statistics: top-5 tokens per language by document
    * frequency (each token counted once per document — the inverted-index /
    * stopword-mining primitive). Count-based, so the oracle is exact. */
  def topTokensPerLang(spark: SparkSession, dir: String): DataFrame = {
    // spread: tokenization is per-row compute ahead of the first shuffle —
    // a single-file corpus must not serialize it on one task
    val toks = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("lang"),
        explode(array_distinct(filter(split(col("text"), "\\s+"), t => t =!= lit("")))).as("token"))
    val w = Window.partitionBy("lang").orderBy(col("df").desc, col("token").asc)
    toks.groupBy("lang", "token").agg(count(lit(1)).as("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .orderBy("lang", "rank")
  }

  /** q146 — distinctive terms per language: token-frequency LIFT against
    * the corpus (tf_lang·T div tf·T_lang, basis points, the q143 lift
    * formula on the (term, language) contingency) — the keyword-extraction
    * verb that surfaces what a slice talks about that the corpus doesn't,
    * log-free and integer-exact where TF-IDF needs floats. Works for any
    * slice key (source, domain, cluster); language here. tf_l ≥ 5 is the
    * noise floor (a hapax in a small language is infinite lift, not
    * signal). Top-20 by (lift, lang, token) — a total order, (lang, token)
    * unique.
    *
    * Scale: one tokenize pass; the (lang, token) rollup partially
    * aggregates map-side; language totals (\|langs\| rows) and token totals
    * (\|vocab\| rows) derive from that rollup, never from a re-scan; T is
    * the one scalar collect. Overflow bound (the q143 rule): tf_l·T·10000
    * < 2^63 holds through ~9e14 corpus tokens·slice-term frequency —
    * widen to Decimal past that. */
  def distinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(coalesce(col("lang"), lit("??")).as("lang"),
        explode(filter(split(col("text"), "\\s+"), t => t =!= lit(""))).as("token"))
    val lt = toks.groupBy("lang", "token").agg(count(lit(1)).as("tf_l")).persist()
    val langTot = lt.groupBy("lang").agg(sum("tf_l").as("ltot"))
    val tokTot = lt.groupBy("token").agg(sum("tf_l").as("tf"))
    val total = lt.agg(sum("tf_l")).head().getLong(0)
    lt.join(langTot, "lang").join(tokTot, "token")
      .where(col("tf_l") >= 5)
      .select(col("lang"), col("token"), col("tf_l"), col("tf"),
        expr(s"(tf_l * ${total}L * 10000) div (tf * ltot)").as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("lang"), col("token"))
      .limit(20)
  }

  /** Shared q114 constants (Spark + oracle): a corpus trigram frequent
    * enough to match at the oracle scale factors. */
  private val PhraseTerms = Seq("slow", "hash", "batch")

  /** q114 — POSITIONAL PHRASE SEARCH: exact-phrase retrieval over a
    * positional posting relation — the capability BM25 (q67) lacks (bag of
    * words can't distinguish "slow hash batch" from its anagrams), and the
    * retrieval half of exact-substring audits done at token granularity.
    * Each phrase term's postings align to the would-be phrase START
    * (pos - term offset), so a phrase occurrence is one (doc, start) key
    * present in ALL term legs — an equi-join chain, no window and no
    * string re-scan. Scale shape: the posexplode filters to the phrase's
    * term set at the scan (the Retrieval.bm25 posture), so only matching
    * postings are ever shuffled; the legs join on (doc_id, start) — Catalyst
    * picks broadcast/AQE shapes per leg size; top-k is a TakeOrdered. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    // persist: one filtered posting relation feeds all three term legs.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val post = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .withColumnRenamed("col", "w")
      .where(col("w").isin(PhraseTerms: _*))
      .persist()
    val legs = PhraseTerms.zipWithIndex.map { case (t, i) =>
      post.where(col("w") === t)
        .select(col("doc_id"), (col("pos") - i).as("p"))
    }
    legs.reduce(_.join(_, Seq("doc_id", "p")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        (min("p") + 1).cast("long").as("first_pos")) // 1-based, oracle-aligned
      .orderBy(col("n_matches").desc, col("doc_id").asc)
      .limit(20)
  }

  private def q114OracleSql: String = {
    val legs = PhraseTerms.zipWithIndex.map { case (t, i) =>
      s"p$i AS (SELECT doc_id, pos - $i AS p FROM toks WHERE w = '$t')"
    }.mkString(",\n")
    val joins = PhraseTerms.indices.tail
      .map(i => s"JOIN p$i USING (doc_id, p)").mkString(" ")
    s"""WITH tk AS (SELECT doc_id,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts FROM documents),
      |toks AS (SELECT doc_id, unnest(ts) AS w,
      |           unnest(generate_series(1, len(ts))) AS pos FROM tk),
      |$legs
      |SELECT doc_id, count(*) AS n_matches, min(p)::BIGINT AS first_pos
      |FROM p0 $joins
      |GROUP BY doc_id ORDER BY n_matches DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q116 — ORDERED CONVERSION FUNNEL: view → click → purchase, where each
    * stage must occur STRICTLY AFTER the user's entry into the previous one
    * (min-ts chaining — the sequential-pattern semantics a bag-of-events
    * rollup like q09 cannot express; a click before any view does not
    * convert). Output is the classic funnel report: per-stage converted
    * users and the mean seconds spent between consecutive stages. Scale
    * shape: events filter to the three stage types at the scan; each stage
    * is a user-keyed aggregate joined to the previous stage's one-row-per-
    * user frame — shuffle keys stay `user_id` throughout, so AQE can reuse
    * the exchange; the final report is three one-row aggregates unioned.
    * Gap arithmetic stays exact-integer micros until one double division
    * per stage (identical op order in the oracle). */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    // persist: the stage-typed slice feeds all three stage aggregates.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val e = ev.where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), tsMicros(ev).as("tsu"))
      .persist()
    val s1 = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("tsu").as("t1"))
    val s2 = e.where(col("event_type") === "click")
      .join(s1, "user_id").where(col("tsu") > col("t1"))
      .groupBy("user_id").agg(min("tsu").as("t2"), min("t1").as("t1"))
    val s3 = e.where(col("event_type") === "purchase")
      .join(s2.select(col("user_id"), col("t2")), "user_id")
      .where(col("tsu") > col("t2"))
      .groupBy("user_id").agg(min("tsu").as("t3"), min("t2").as("t2"))
    def report(df: DataFrame, stage: String,
        gap: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("users"),
        coalesce(round(gap / count(lit(1)) / 1e6, 6), lit(0.0)).as("avg_gap_sec"))
        .select(lit(stage).as("stage"), col("users"), col("avg_gap_sec"))
    report(s1, "1_view", lit(null).cast("long"))
      .unionByName(report(s2, "2_click", sum(col("t2") - col("t1"))))
      .unionByName(report(s3, "3_purchase", sum(col("t3") - col("t2"))))
      .orderBy("stage")
  }

  private def q116OracleSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(tsu) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(tsu) AS t2, min(t1) AS t1 FROM e
      |  JOIN s1 USING (user_id) WHERE event_type = 'click' AND tsu > t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(tsu) AS t3, min(t2) AS t2 FROM e
      |  JOIN s2 USING (user_id) WHERE event_type = 'purchase' AND tsu > t2 GROUP BY e.user_id)
      |SELECT '1_view' AS stage, count(*) AS users, 0.0::DOUBLE AS avg_gap_sec FROM s1
      |UNION ALL SELECT '2_click', count(*),
      |  COALESCE(round(sum(t2 - t1)::DOUBLE / count(*) / 1000000.0::DOUBLE, 6), 0.0) FROM s2
      |UNION ALL SELECT '3_purchase', count(*),
      |  COALESCE(round(sum(t3 - t2)::DOUBLE / count(*) / 1000000.0::DOUBLE, 6), 0.0) FROM s3
      |ORDER BY stage""".stripMargin

  /** Shared q115 constant (Spark + oracle): the standard RRF dampening. */
  private val RrfK = 60

  /** q115 — HYBRID RETRIEVAL with reciprocal-rank fusion: the sparse+dense
    * architecture every modern retrieval stack runs. Leg 1 is the q67 BM25
    * ranking; leg 2 expands each term semantically — the mean embedding of
    * its lexical top-10 (pseudo-relevance feedback, a bounded per-term
    * model with 6-dp-rounded components for cross-engine parity) cosine-
    * ranks the WHOLE corpus, surfacing docs that never contain the term.
    * Fusion: rrf = Σ legs 1/(60 + rank) over rounded integer ranks (exact
    * rational arithmetic — no float drift), top-5 per term, rank 0 marking
    * "absent from that leg's top-10". Scale shape: BM25 postings filter at
    * the scan (only query terms shuffle); the 5 centroids broadcast into a
    * one-scan brute-force rank (Similarity.bruteForceTopK — at larger k the
    * IVF path, q47, swaps in); fusion joins two ≤(terms×10 + terms×10)-row
    * relations. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.ops.Retrieval.bm25(
      table(spark, dir, "documents"), "text", "doc_id", bm25Terms)
    val wl = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id").asc)
    // persist: the lexical top-10 feeds the centroid build AND the fusion.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val lex = scored.withColumn("lex_rnk", row_number().over(wl))
      .where(col("lex_rnk") <= 10)
      .select(col("term"), col("doc_id"), col("lex_rnk")).persist()
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = lex.join(emb, lex("doc_id") === emb("vec_id"))
      .select(col("term"), posexplode(col("v")))
      .groupBy(col("term"), col("pos")).agg(round(avg("col"), 6).as("m"))
      .groupBy("term")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cv"))
    val sem = graft.ops.Similarity.bruteForceTopK(
        emb, "v", "vec_id", cents, "cv", "term", k = 10, excludeSelf = false)
      .select(col("queryId").as("term"), col("neighborId").as("doc_id"),
        col("rank").as("sem_rnk"))
    val wf = Window.partitionBy("term").orderBy(col("rrf").desc, col("doc_id").asc)
    lex.join(sem, Seq("term", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rnk")), lit(0.0)), 6))
      .withColumn("fused_rnk", row_number().over(wf))
      .where(col("fused_rnk") <= 5)
      .select(col("term"), col("doc_id"),
        coalesce(col("lex_rnk"), lit(0)).cast("long").as("lex_rnk"),
        coalesce(col("sem_rnk"), lit(0)).cast("long").as("sem_rnk"),
        col("rrf"), col("fused_rnk"))
      .orderBy("term", "fused_rnk")
  }

  private def q115OracleSql: String = {
    def cosSql(a: String, b: String): String =
      s"ROUND(CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0 THEN 0.0 " +
        s"ELSE list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END, 6)"
    val terms = bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts
      |  FROM documents),
      |st AS (SELECT count(*) AS n, avg(len(ts)) AS avgl FROM tk),
      |post AS (
      |  SELECT t.term, tk.doc_id, len(ts) AS dl, len(list_filter(ts, x -> x = t.term)) AS tf
      |  FROM tk, (SELECT unnest([$terms]) AS term) t
      |  WHERE len(list_filter(ts, x -> x = t.term)) > 0),
      |dfq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      |bscored AS (
      |  SELECT post.term, post.doc_id,
      |    ln((st.n - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE) + 1) * (post.tf * (1.2::DOUBLE + 1)) /
      |      (post.tf + 1.2::DOUBLE * (1 - 0.75::DOUBLE + 0.75::DOUBLE * post.dl / st.avgl)) AS score
      |  FROM post JOIN dfq ON post.term = dfq.term, st),
      |lex AS (SELECT term, doc_id, rnk AS lex_rnk FROM (
      |    SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
      |    FROM bscored) WHERE rnk <= 10),
      |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (SELECT term, list(m ORDER BY i) AS cv FROM (
      |    SELECT term, i, round(avg(x), 6) AS m FROM (
      |      SELECT l.term AS term, unnest(e.v) AS x, generate_subscripts(e.v, 1) AS i
      |      FROM lex l JOIN emb e ON l.doc_id = e.vec_id)
      |    GROUP BY term, i) GROUP BY term),
      |sscored AS (SELECT c.term, e.vec_id AS doc_id, ${cosSql("c.cv", "e.v")} AS cosine
      |  FROM cent c, emb e),
      |sem AS (SELECT term, doc_id, rnk AS sem_rnk FROM (
      |    SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY cosine DESC, doc_id) AS rnk
      |    FROM sscored) WHERE rnk <= 10),
      |f AS (SELECT term, doc_id,
      |    COALESCE(lex_rnk, 0)::BIGINT AS lex_rnk, COALESCE(sem_rnk, 0)::BIGINT AS sem_rnk,
      |    round(COALESCE(1.0::DOUBLE / ($RrfK + lex_rnk), 0) +
      |          COALESCE(1.0::DOUBLE / ($RrfK + sem_rnk), 0), 6) AS rrf
      |  FROM lex FULL OUTER JOIN sem USING (term, doc_id))
      |SELECT term, doc_id, lex_rnk, sem_rnk, rrf, fused_rnk FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY term ORDER BY rrf DESC, doc_id) AS INTEGER) AS fused_rnk
      |  FROM f) WHERE fused_rnk <= 5 ORDER BY term, fused_rnk""".stripMargin
  }

  /** q106 — BPE MERGE-PAIR candidates: the top adjacent character pairs by
    * corpus frequency — the scoring pass of byte-pair-encoding vocabulary
    * induction (each output row is a candidate first merge). Scale shape:
    * the corpus collapses to its VOCABULARY first (token → count, map-side
    * partial, |vocab|-bounded shuffle); the char-pair explode then runs
    * over |vocab| rows weighted by token frequency, never over corpus
    * tokens — at web scale the char-pair stage costs |vocab|·avg_len, a
    * rounding error next to the corpus scan. Top-k is a TakeOrdered (no
    * global sort materialization, no single-partition window). */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    tf.where(length(col("w")) >= 2)
      .select(col("w"), col("c"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("_i"))
      .select(col("w").substr(col("_i"), lit(2)).as("pair"), col("c"))
      .groupBy("pair").agg(sum("c").as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(20)
  }

  /** Shared q117 constant (Spark + oracle): induction rounds. */
  private val BpeRounds = 6

  /** q117 — ITERATIVE BPE INDUCTION: the full merge loop q106 only scores
    * the first round of. Each round counts adjacent symbol pairs over the
    * CURRENT segmentation of the frequency-weighted vocabulary, merges the
    * argmax pair (ties: count desc, then left/right lexicographic), and
    * re-segments every word with a greedy left-to-right fold (a merged
    * symbol never re-merges with the following token within the same pass —
    * the canonical Sennrich semantics); later rounds see earlier products
    * as single symbols, so merge 6 can pick pairs like ("m", "er"). Scale
    * shape: the corpus collapses to its vocabulary FIRST (the q106
    * posture) — every round is |vocab|-bounded work regardless of corpus
    * size; the per-round argmax is a one-row driver decision (the bounded-
    * model exception, 6 rows total), and the re-segment fold is a codegen'd
    * higher-order aggregate, no UDF. */
  /** The induction loop shared by q117 (merge list) and q118 (encode
    * report): runs [[BpeRounds]] merge rounds over a (w, c) vocabulary
    * frame, returning the FINAL persisted segmentation (w, c, s) and the
    * merge trace. Caller owns the returned frame's cache. */
  private def bpeChain(tf: DataFrame)
      : (DataFrame, Seq[(Int, String, Long)]) = {
    // persist: each round's segmentation feeds pair counting AND the next
    // round's re-segment. Ownership: intermediate rounds unpersist in-loop;
    // the caller (and Verify/Bench) release the final frame.
    var seg = tf.select(col("w"), col("c"),
      transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("s"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var r = 1
    var done = false
    while (r <= BpeRounds && !done) {
      val top = seg.where(size(col("s")) >= 2)
        .select(col("c"), col("s"),
          explode(sequence(lit(1), size(col("s")) - 1)).as("i"))
        .select(element_at(col("s"), col("i")).as("a"),
          element_at(col("s"), col("i") + 1).as("b"), col("c"))
        .groupBy("a", "b").agg(sum("c").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .head(1)
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a + " " + b, cnt))
        // greedy left-to-right merge: fold the tail onto [first symbol] so
        // the accumulator is never empty (mirrors DuckDB list_reduce's
        // first-element seeding exactly)
        val next = seg.select(col("w"), col("c"),
          aggregate(
            slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
            slice(col("s"), 1, 1),
            (acc, x) => when(
              element_at(acc, -1) === a && x === b,
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))).as("s"))
          .persist()
        next.count() // materialize before releasing the parent cache
        seg.unpersist()
        seg = next
      }
      r += 1
    }
    (seg, merges.toSeq)
  }

  def bpeInduct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val (seg, merges) = bpeChain(tf)
    seg.unpersist()
    merges.toDF("step", "pair", "n").orderBy("step")
  }

  /** q118 — BPE ENCODE / compression report: apply the q117 induction's
    * final segmentation to the corpus and report each source's
    * chars-per-BPE-token — the compression-ratio signal (bytes/token) a
    * tokenizer is actually judged by, and the per-source fit signal on the
    * merge side (q107 measures it on the vocab side). Scale shape: the
    * corpus collapses to (source, word) counts first; the induction is
    * vocabulary-bounded (q117); the encoded-size relation (word → symbol
    * count) is vocab-sized and joins back broadcastable. No document is
    * ever re-scanned to encode — frequency weighting reconstructs the
    * corpus-level totals exactly. */
  def bpeEncodeReport(spark: SparkSession, dir: String): DataFrame = {
    // persist: feeds the vocabulary build AND the per-source rollup.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val sw = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .persist()
    val tf = sw.groupBy("w").agg(sum("c").as("c"))
    val (seg, _) = bpeChain(tf)
    val enc = seg.select(col("w"), size(col("s")).as("ntok"))
    sw.join(broadcast(enc), Seq("w"))
      .groupBy("source")
      .agg(sum("c").as("n_words"),
        sum(col("c") * length(col("w"))).as("n_chars"),
        sum(col("c") * col("ntok")).as("n_bpe_tokens"),
        round(sum(col("c") * length(col("w"))) /
          sum(col("c") * col("ntok")), 6).as("chars_per_token"))
      .orderBy("source")
  }

  /** Fold-free single-round BPE resegmentation CTE block (reads
    * `seg${r-1}(w, c, s)` and the round's winning pair `m$r(a, b)`, emits
    * `seg$r(w, c, s)`). The left-to-right greedy merge-with-state fold is
    * expressed relationally as gaps-and-islands parity: candidate
    * positions j (s[j]=a ∧ s[j+1]=b) overlap only in consecutive runs
    * (which requires a=b), and the fold keeps exactly every OTHER
    * candidate from each run's head — so `kept` = odd rank within the
    * island, `consumed` = previous position kept, and the new list is the
    * non-consumed positions with kept ones emitting a||b. Replaces the
    * chr(1)-joined `list_reduce` string-accumulator fold, which (a) DuckDB
    * 1.0 MISFOLDS under full-vector evaluation (the tools/fuzz_diff.py
    * find that forced the CDC chain to a recursive CTE) and (b) assumed a
    * chr(1)-free corpus. An empty m$r (early-stopped induction) makes
    * every cand 0, so seg passes through unchanged — the LEFT JOIN keeps
    * the last segmentation exactly as the Spark loop does. Validated
    * against a reference fold on 60 randomized single-letter-alphabet
    * corpora (overlapping-candidate parity stress) before landing. */
  private[operators] def bpeResegCtes(r: Int): String =
    s"""ex$r AS (SELECT w, c, u.i AS j, s[u.i] AS sym
       |  FROM seg${r - 1}, unnest(generate_series(1, len(s))) AS u(i)),
       |cd$r AS (SELECT e.w, e.c, e.j, e.sym, m.a AS ma, m.b AS mb,
       |    CASE WHEN e.sym = m.a
       |      AND lead(e.sym) OVER (PARTITION BY e.w ORDER BY e.j) = m.b
       |    THEN 1 ELSE 0 END AS cand
       |  FROM ex$r e LEFT JOIN m$r m ON true),
       |il$r AS (SELECT *, CASE WHEN cand = 1
       |    THEN j - row_number() OVER (PARTITION BY w, cand ORDER BY j) END AS isl
       |  FROM cd$r),
       |kp$r AS (SELECT *, CASE WHEN cand = 1 AND
       |      (row_number() OVER (PARTITION BY w, isl ORDER BY j)) % 2 = 1
       |    THEN 1 ELSE 0 END AS kept
       |  FROM il$r),
       |sg$r AS (SELECT *, coalesce(lag(kept) OVER (PARTITION BY w ORDER BY j), 0)
       |    AS consumed
       |  FROM kp$r),
       |seg$r AS (SELECT w, c,
       |    list(CASE WHEN kept = 1 THEN ma || mb ELSE sym END ORDER BY j) AS s
       |  FROM sg$r WHERE consumed = 0 GROUP BY w, c)""".stripMargin

  /** q117 oracle: unrolls all [[BpeRounds]] merge rounds as CTEs; each
    * round's resegmentation is the fold-free [[bpeResegCtes]] block. */
  private def q117OracleSql: String = {
    val head =
      """tk AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w FROM documents),
        |tf AS (SELECT w, count(*) AS c FROM tk GROUP BY w),
        |seg0 AS (SELECT w, c, list_transform(generate_series(1, len(w)), i -> substr(w, i, 1)) AS s FROM tf)""".stripMargin
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (SELECT t.a, t.b, sum(c)::BIGINT AS cnt FROM (
         |  SELECT c, s[i] AS a, s[i+1] AS b FROM seg${r - 1}, unnest(generate_series(1, len(s)-1)) AS u(i)) t
         |  GROUP BY 1, 2),
         |m$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |${bpeResegCtes(r)}""".stripMargin
    }
    val sel = (1 to BpeRounds)
      .map(r => s"SELECT CAST($r AS INTEGER) AS step, a || ' ' || b AS pair, cnt AS n FROM m$r")
      .mkString("\nUNION ALL ")
    s"WITH $head,\n${rounds.mkString(",\n")}\n$sel ORDER BY step"
  }

  /** q118 oracle: the q117 merge chain re-derived with the word carried
    * through every segmentation round ([[bpeResegCtes]]'s LEFT JOIN keeps
    * an early-stopped induction's last segmentation, exactly as the Spark
    * loop does), then the frequency-weighted per-source rollup. */
  private def q118OracleSql: String = {
    val head =
      """tk AS (SELECT source, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w FROM documents),
        |swc AS (SELECT source, w, count(*) AS c FROM tk GROUP BY 1, 2),
        |tf AS (SELECT w, sum(c)::BIGINT AS c FROM swc GROUP BY w),
        |seg0 AS (SELECT w, c, list_transform(generate_series(1, len(w)), i -> substr(w, i, 1)) AS s FROM tf)""".stripMargin
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (SELECT t.a, t.b, sum(c)::BIGINT AS cnt FROM (
         |  SELECT c, s[i] AS a, s[i+1] AS b FROM seg${r - 1}, unnest(generate_series(1, len(s)-1)) AS u(i)) t
         |  GROUP BY 1, 2),
         |m$r AS (SELECT a, b FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |${bpeResegCtes(r)}""".stripMargin
    }
    s"""WITH $head,
       |${rounds.mkString(",\n")},
       |enc AS (SELECT w, len(s) AS ntok FROM seg$BpeRounds)
       |SELECT source, sum(c)::BIGINT AS n_words,
       |  sum(c * len(w))::BIGINT AS n_chars,
       |  sum(c * ntok)::BIGINT AS n_bpe_tokens,
       |  round(sum(c * len(w))::DOUBLE / sum(c * ntok), 6) AS chars_per_token
       |FROM swc JOIN enc USING (w) GROUP BY source ORDER BY source""".stripMargin
  }

  /** q107 — vocabulary COVERAGE / OOV rate: fix the tokenizer vocabulary as
    * the corpus's top-64 tokens by frequency (ties lexicographic), then
    * report each source's out-of-vocabulary token fraction — the coverage
    * check run before committing a vocab size, and a per-source mix-health
    * signal (a source whose OOV spikes is off-distribution for the
    * tokenizer). Scale shape: both the vocab and the per-source rollup
    * aggregate (source, token) counts first — vocabulary-bounded frames —
    * and the vocab (≤64 rows) joins broadcast; nothing corpus-sized
    * shuffles twice. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    // persist: the (source, token) aggregate feeds the corpus vocab AND the
    // per-source OOV rollup; the explode feeds it once.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val bySource = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .persist()
    val vocab = bySource.groupBy("w").agg(sum("c").as("cc"))
      .orderBy(col("cc").desc, col("w").asc).limit(64)
      .select(col("w"), lit(1).as("_in"))
    bySource.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("_in").isNull, col("c")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
      .orderBy("source")
  }

  /** q108 — TOKENIZER MATERIALIZATION: map every token to its vocabulary id
    * (q107's top-64 vocab, ranked by frequency then lexicographically;
    * out-of-vocabulary → 0) and certify the per-document id SEQUENCE with a
    * position-weighted checksum (Σ (pos+1)·id) — the last transform before
    * ids ship to training shards, where an off-by-one in position or a
    * drifted vocab rank silently corrupts every sequence. Scale shape: the
    * vocab ranks inside a 64-row bounded frame (the window sorts 64 rows
    * post-limit — a bounded model, not a corpus sort) and joins broadcast;
    * the corpus-side cost is one posexplode + one aggregation. */
  def tokenIds(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .withColumnRenamed("col", "w")
    // persist: feeds the vocab aggregation and the id-assignment join.
    // Ownership: Verify/Bench clear the cache after each query's action.
    toks.persist()
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cc"))
      .orderBy(col("cc").desc, col("w").asc).limit(64)
      .withColumn("id",
        row_number().over(Window.orderBy(col("cc").desc, col("w").asc)))
      .select("w", "id")
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum((col("pos") + 1) * coalesce(col("id"), lit(0))).as("ids_checksum"))
      .orderBy("doc_id")
  }

  /** Per-language sampling fractions for q58 — 'es' at 1.0 exercises the
    * saturated-threshold path in a production query. */
  private val strataFractions = Seq(
    "en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 1.0, "zh" -> 0.1)

  /** q58 — stratified deterministic sampling: per-language keep fractions
    * over content hashes (rebalancing a corpus mix), rolled up to counts. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .where(Sampling.stratifiedKeep(col("lang"), col("text"), strataFractions, salt = "s1"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_id"))
      .orderBy("lang")

  /** q59 — corpus-overlap matrix: word-3-gram Jaccard between sources
    * (pairs sharing ≥1 gram), the corpus-granularity contamination view.
    * Exact overlap is computed relationally (distinct (source, gram) →
    * equi-self-join on the gram → sizes); alongside it, the bottom-k sketch
    * UDAF (graft.expr.BottomKSketch — mergeable O(k) state per group,
    * map-side partial aggregation) estimates the same Jaccard from two
    * 256-slot sketches, surfaced as an `approx_ok` bound the oracle pins
    * TRUE. At 100 TB the exact self-join is the expensive path and the
    * sketch is the one you'd ship: per-source state stays 2 KB no matter
    * the corpus. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val docs = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
    // every downstream shuffle/join/aggregate moves the 8-byte gram hash,
    // never the gram string (the exactDedup rule applied to set overlap).
    // A 64-bit collision would perturb the counts: ~n²/2⁶⁵ odds (~1e-7 at
    // sf0.1's ~1M distinct grams) — the standard content-hash trade, and
    // the DuckDB oracle (string equality) would catch a hit. Grams come
    // from the fused graft_word_ngrams kernel (already distinct per doc).
    val sg = docs.select(col("source"),
      explode(graft.expr.GraftFunctions.wordNGrams(col("text"), 3)).as("g"))
      .select(col("source"), xxhash64(col("g")).as("h"))
      .distinct()
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = sg.select(col("source").as("srcA"), col("h"))
      .join(sg.select(col("source").as("srcB"), col("h")), "h")
      .where(col("srcA") < col("srcB"))
      .groupBy("srcA", "srcB").agg(count(lit(1)).as("inter"))
    val sketches = sg.groupBy("source")
      .agg(graft.expr.BottomKSketch.bottomK(col("h"), 256).as("sk"))
    val est = graft.expr.BottomKSketch.jaccardEstimate(col("skA"), col("skB"), 256)
    inter
      .join(broadcast(sizes.select(col("source").as("srcA"), col("sz").as("szA"))), "srcA")
      .join(broadcast(sizes.select(col("source").as("srcB"), col("sz").as("szB"))), "srcB")
      .join(broadcast(sketches.select(col("source").as("srcA"), col("sk").as("skA"))), "srcA")
      .join(broadcast(sketches.select(col("source").as("srcB"), col("sk").as("skB"))), "srcB")
      .withColumn("exact_jaccard",
        round(col("inter").cast("double") / (col("szA") + col("szB") - col("inter")), 4))
      // 256-slot sketch: sigma <= sqrt(J(1-J)/256) ~ 0.031; 0.15 is ~5 sigma
      .withColumn("approx_ok",
        abs(est - col("inter").cast("double") / (col("szA") + col("szB") - col("inter"))) <= 0.15)
      .select("srcA", "srcB", "exact_jaccard", "approx_ok")
      .orderBy("srcA", "srcB")
  }

  /** q60 — salted skew join, oracle-checked for result equivalence: events
    * join a per-type dimension on `event_type`, a key with only 5 distinct
    * values — every key is hot, the exact shape where an unsalted shuffle
    * join serializes on 5 reducers. The salt spreads each key across 8
    * shuffle keys; the oracle is the plain join (same result by
    * construction, proven on real data). */
  def saltedJoinRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val dim = ev.groupBy(col("event_type").as("etype"))
      .agg(countDistinct("user_id").as("dim_users"))
    graft.ops.Skew.saltedJoin(
      ev.select(col("event_type").as("etype"), col("value")),
      dim, "etype", salts = 8)
      .groupBy("etype")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_v"),
        max("dim_users").as("dim_users"))
      .orderBy("etype")
  }

  /** q61 — forward as-of with staleness bound: each error event matched to
    * the next purchase of the same user within 30 minutes (the
    * "did-the-user-recover" lookup). */
  def asofNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), tsMicros(ev).as("tsu"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), tsMicros(ev).as("tsu"))
    Temporal.asofJoinNext(errors, purchases, "user_id", "tsu", "tsu",
      rightPick = Seq("purchase_id"), rightTieBreak = "purchase_id",
      tolerance = gapU)
      .where(col("purchase_id").isNotNull)
      .select("user_id", "error_id", "purchase_id")
      .orderBy("user_id", "error_id")
  }

  /** q62 — winnowing fingerprint buckets: documents sharing a selected
    * winnow hash (Schleimer/Wilkerson/Aiken local fingerprinting — any
    * shared substring >= w+n-1 chars is guaranteed to surface, which the
    * bottom-k fingerprint of q30 cannot promise). Rows-only for the driver
    * (xxhash64 family, like q30); the kernel itself is pinned against a
    * brute-force formulation in WinnowSpec. */
  def winnowBuckets(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.expr.GraftFunctions.winnow(col("text"), 8, 16)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .where(col("n") > 1)
      .orderBy("fp")
  }

  private val bm25Terms = Seq("spark", "table", "join", "hash", "window")

  /** q67 — BM25 top-10 retrieval for a fixed query-term set (ops.Retrieval):
    * inverted-index postings restricted to the query terms, df + corpus
    * stats joined back, Robertson k1=1.2 b=0.75 scoring, per-term rank.
    * The oracle recomputes the identical formula with the same literal
    * grouping (left-associated idf·num/den — IEEE arithmetic is then
    * bit-reproducible across engines; only ln() may differ by 1 ulp, a
    * term-constant factor that cannot reorder a term's ranking). */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.ops.Retrieval.bm25(
      table(spark, dir, "documents"), "text", "doc_id", bm25Terms)
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10)
      .select(col("term"), col("doc_id"), col("tf"),
        round(col("score"), 4).as("score"), col("rnk"))
      .orderBy("term", "rnk")
  }

  /** q156 — retrieval-quality eval: MRR@10 / hit@1 / hit@10 of BM25
    * known-item retrieval — the standard IR-eval harness construction:
    * each doc carries a planted relevance tag token (`uniqN` — at scale
    * this column IS your labeled eval set), every 100th doc becomes a
    * probe whose query is its tag plus its 2 smallest distinct real
    * tokens, and the metric asks whether the scorer puts the known
    * relevant doc on top. The eval verb behind the retrieval family
    * (q67 BM25, q115 RRF) — and a live scorer PIN: the tag's df=1 idf
    * must dominate two near-zero-idf common terms (this corpus's 31-token
    * vocabulary makes the common terms maximally confusable), so any
    * idf/tf/length-normalization bug drops hit@1 below 100%. Pure lexical
    * self-retrieval would be structurally impossible here (every token df
    * ≫ 10) — measured 0/50 before the tags went in.
    * Scale shape: postings are built ONLY for the distinct probe-term
    * vocabulary (broadcast); the true doc's rank is 1 + count(strictly
    * better (score, −doc_id)) — ONE aggregate per probe, never a
    * per-probe sort of its match list. Ranks are float-ordering only (the
    * q67 precedent); the MRR folds integer-exactly (Σ (10000 div rank)
    * div n — truncated reciprocal basis points, deterministic). */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2; val b = 0.75
    val tok = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"),
        concat(TextOps.tokens(col("text")),
          array(concat(lit("uniq"), col("doc_id")))).as("_ts"),
        TextOps.tokens(col("text")).as("_orig")).persist()
    val stats = tok.agg(count(lit(1)).as("_n"), avg(size(col("_ts"))).as("_avg"))
    val probes = tok.where(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id").as("pid"),
        concat(array(concat(lit("uniq"), col("doc_id"))),
          slice(array_sort(array_distinct(col("_orig"))), 1, 2)).as("_q"))
    val pterms = probes.select(col("pid"), explode(col("_q")).as("term"))
    val dterm = pterms.select("term").distinct()
    val posts = tok
      .select(col("doc_id"), size(col("_ts")).as("_len"), explode(col("_ts")).as("term"))
      .join(broadcast(dterm), "term")
      .groupBy("term", "doc_id", "_len").agg(count(lit(1)).as("tf"))
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("_df"))
    val termScore = posts.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats)) // one row: corpus constants (q67 pattern)
      .withColumn("_sc",
        log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_len") / col("_avg"))))
    val sc = termScore.join(broadcast(pterms), "term")
      .groupBy("pid", "doc_id").agg(sum("_sc").as("_s"))
    val truth = sc.where(col("doc_id") === col("pid"))
      .select(col("pid"), col("_s").as("_tsc"))
    val better = sc.join(broadcast(truth), "pid")
      .where(col("doc_id") =!= col("pid"))
      .groupBy("pid").agg(sum(when(col("_s") > col("_tsc")
        || (col("_s") === col("_tsc") && col("doc_id") < col("pid")), 1L)
        .otherwise(0L)).as("_nb"))
    truth.join(better, Seq("pid"), "left")
      .select(col("pid"), (coalesce(col("_nb"), lit(0L)) + 1L).as("rank"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("rank") === 1, 1L).otherwise(0L)).as("hits_at_1"),
        sum(when(col("rank") <= 10, 1L).otherwise(0L)).as("hits_at_10"),
        expr("sum(CASE WHEN rank <= 10 THEN 10000 div rank ELSE 0 END) div count(1)")
          .as("mrr_bp"))
  }

  /** q68 — repetition quality stats (the Gopher/RefinedWeb duplicate-gram
    * rule): per document, the fraction of word bigrams that are repeats
    * (1 − distinct/total); rolled up per language. Determinism note: the
    * corpus-level ratio divides two exact integer SUMS (summation order
    * can't perturb it, unlike averaging per-doc double ratios); per-doc
    * ratios surface only through order-insensitive max and a threshold
    * count. Tokens materialize as a column before the bigram transform
    * (lambda-captured expressions re-evaluate per element). */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    // zero-token docs carry no bigrams — excluded on BOTH sides (the
    // whole-text fallback would otherwise count a "" gram here while the
    // oracle's list_distinct drops NULLs and reports rep=1.0; a
    // tools/fuzz_diff.py divergence class)
    val tk = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("_ts"))
      .where(size(col("_ts")) > 0)
    val g = tk.withColumn("_grams",
      when(size(col("_ts")) < 2, array(concat_ws(" ", col("_ts"))))
        .otherwise(transform(sequence(lit(0), size(col("_ts")) - 2),
          i => concat_ws(" ", slice(col("_ts"), i + 1, lit(2))))))
    val r = g.select(col("lang"), size(col("_grams")).as("total"),
      size(array_distinct(col("_grams"))).as("uniq"))
      .withColumn("rep", lit(1.0) - col("uniq").cast("double") / col("total"))
    r.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("total").as("grams_total"),
      sum("uniq").as("grams_uniq"),
      round(lit(1.0) - sum("uniq").cast("double") / sum("total"), 4).as("dup_ratio"),
      round(max("rep"), 4).as("max_rep"),
      count(when(col("rep") >= 0.1, 1)).as("high_rep"))
      .orderBy("lang")
  }

  /** q80 — per-document n-gram NOVELTY: for each doc, the fraction of its
    * distinct word 3-grams whose FIRST corpus occurrence (smallest doc_id)
    * is this doc — the "contribution" score curation pipelines use to rank
    * documents by how much genuinely new text they add (a near-dup scores
    * ~0, boilerplate scores low, fresh material scores ~1). Scale shape:
    * the gram-level shuffle carries the portable 60-bit md5 hash (8 bytes)
    * instead of gram strings, and the first-occurrence aggregation and the
    * membership join hash-partition on that same key, so the two stages
    * co-partition; the per-doc rollup is the only other shuffle. The
    * DuckDB oracle recomputes the identical hash family end-to-end. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // spread: tokenize+md5 is per-row compute ahead of the first shuffle (a
    // single-file corpus must not serialize it); persist: both the
    // first-occurrence aggregation and the membership join read the pair
    // relation — without it the whole explode+digest pipeline runs twice.
    // Ownership: Verify/Bench clear the cache after each query's action.
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val pairs = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.expr.GraftFunctions.wordNGrams(col("text"), 3)).as("_g"))
      .select(col("doc_id"), graft.ops.PortableSketch.h60(col("_g")).as("_h"))
      .persist()
    // no membership join back on the gram hash: a doc's novel count is the
    // number of DISTINCT grams it first-owns, which re-aggregates straight
    // off the |distinct grams| first-occurrence relation — a corpus-hot
    // gram collapses map-side in the agg instead of skewing a join; the
    // remaining join is per-doc, uniform, |docs|-sized on both sides
    val perDoc = pairs.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val novel = pairs.groupBy("_h").agg(min("doc_id").as("_first"))
      .groupBy("_first").agg(count(lit(1)).as("n_novel"))
      .withColumnRenamed("_first", "doc_id")
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  /** q81 — per-source distribution DRIFT: Jensen-Shannon divergence of each
    * source's token distribution against the whole corpus — the mix-health
    * metric curation pipelines watch to catch a crawl source going off-
    * distribution (spam influx, template change) before it pollutes a
    * training mix. All-relational: token counts per (source, token) and per
    * token corpus-wide, one equi-join, one aggregation — the JS sum runs
    * over the corpus vocabulary, where Q(t) > 0 always and a source's
    * missing tokens contribute only the Q-side KL term (p·ln(p/m) → 0 as
    * p → 0). Accumulated double noise from summation order is ~1e-13 at
    * any realistic vocabulary, far inside the round-6 the oracle compares. */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame = {
    // persist the (source, token) AGGREGATE, not the exploded token frame:
    // bySource is read three times (per-source totals, corpus vocabulary,
    // the p-side join) while the explode feeds it exactly once — and at
    // corpus scale the exploded frame IS the corpus, so caching it would be
    // a memory hazard for zero reuse. Verify/Bench clear the cache after.
    val bySource = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .persist()
    val totals = bySource.groupBy("source").agg(sum("c").as("tot"))
    val corpus = bySource.groupBy("token").agg(sum("c").as("cc"))
    // one-row corpus total attached by broadcast (the q67 constants pattern —
    // a keyless 1-row join is BNLJ by construction and O(|vocab|)); an
    // all-rows window would funnel the vocabulary through one task
    val corpusTotal = corpus.agg(sum("cc").as("_ctot"))
    val q = corpus.crossJoin(broadcast(corpusTotal))
      .select(col("token"), (col("cc") / col("_ctot")).as("q"))
    val joined = bySource.join(broadcast(totals), "source")
      .select(col("source"), col("token"), (col("c") / col("tot")).as("p"))
      .join(q, Seq("token"))
    val m = (col("p") + col("q")) / lit(2.0)
    // p > 0 by construction (a (source, token) row exists only with c >= 1)
    val term = (col("p") * log(col("p") / m) + col("q") * log(col("q") / m)) * lit(0.5)
    // one pass over the joined frame: the JS sum, the per-source vocabulary,
    // and Σ_present q (tokens a source never emits have p=0, m=q/2, so the
    // per-source missing mass is 0.5·ln(2)·(1 − Σ_present q) — closed form,
    // no outer join) all share the same grouping key
    val present = joined.groupBy("source")
      .agg(sum(term).as("_js_present"), count(lit(1)).as("vocab"),
        sum("q").as("_qsum"))
    present
      .join(broadcast(totals), "source")
      .select(col("source"), col("tot").as("n_tokens"), col("vocab"),
        round(col("_js_present") + lit(0.5 * math.log(2.0)) * (lit(1.0) - col("_qsum")),
          6).as("js_divergence"))
      .orderBy("source")
  }

  /** q69 — Z-order layout profile over events (user × time-of-day): the
    * Morton key ops.Layout computes for multi-dimensional file clustering,
    * bucketed to its top 8 bits with per-bucket row/user counts. The oracle
    * recomputes the bit interleave in SQL (the key is engine-portable
    * arithmetic), certifying the exact layout key a 100 TB writer would
    * range-partition on. */
  def zorderBuckets(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val tod = pmod(tsMicros(ev), lit(86400000000L)) // micros within the UTC day
    val x = pmod(col("user_id"), lit(65536L))
    val y = call_function("div", tod * 65536L, lit(86400000000L))
    ev.select(graft.ops.Layout.zorder2(x, y, 16).as("z"), col("user_id"))
      .select(shiftright(col("z"), 24).as("zbucket"), col("user_id"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("zbucket")
  }

  /** q70 — heavy hitters via the mergeable Misra-Gries UDAF: global token
    * frequencies sketched in one bounded-state aggregation (width 64, map-
    * side partials + executor merges), then the exact top-10 joined back
    * against the sketch. At oracle scale the corpus vocabulary fits the
    * width, so the sketch runs in its exact mode and `sketch_exact` is
    * provably TRUE for every row — which makes the UDAF's reduce AND merge
    * paths hash-checkable by DuckDB (any lost or double count breaks
    * equality). The saturated regime's order-independent bounds are pinned
    * in HeavyHittersSpec. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val sketch = toks
      .agg(graft.expr.HeavyHitters.misraGries(col("token"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("mg_n"))
    toks.groupBy("token").agg(count(lit(1)).as("n"))
      .join(sketch, Seq("token"), "left_outer")
      .withColumn("sketch_exact", col("mg_n") === col("n"))
      .orderBy(col("n").desc, col("token")).limit(10)
      .select("token", "n", "mg_n", "sketch_exact")
  }

  /** q72 — snapshot diff (the change-data verb): orders vs a derived second
    * snapshot (every 97th key removed, every 89th status-flipped, every
    * 101st re-keyed as an addition), classified per key in one full-outer
    * join over 128-bit content digests. The oracle classifies by direct
    * column comparison — digest classification equals value classification
    * up to a 2^-128 double collision. */
  def snapshotDiffRollup(spark: SparkSession, dir: String): DataFrame = {
    val prev = table(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"), col("o_totalprice"))
    val next = prev.where(col("k") % 97 =!= 0)
      .withColumn("o_orderstatus",
        when(col("k") % 89 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .unionByName(prev.where(col("k") % 101 === 0)
        .withColumn("k", col("k") + 3000000L))
    graft.ops.Diff.snapshotDiff(prev, next, "k", Seq("o_orderstatus", "o_totalprice"))
      .groupBy("change").agg(count(lit(1)).as("n"))
      .orderBy("change")
  }

  /** q73 — data-quality gate: declarative expectations over lineitem
    * evaluated in one scan (row rules) + key-only aggregations (uniqueness),
    * reported as violations per rule. */
  def qualityReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Quality
    Quality.check(table(spark, dir, "lineitem"), Seq(
      Quality.notNull("l_orderkey"),
      Quality.inRange("l_quantity", 1, 49),
      Quality.inRange("l_discount", 0, 0.05),
      Quality.unique("l_orderkey", "l_linenumber"),
      Quality.unique("l_suppkey")))
      .orderBy("rule")
  }

  /** q112 — REFERENTIAL-INTEGRITY audit (q73's framework extended with FK
    * rules): every cross-table key relationship a pipeline publishes on,
    * checked as key-only anti joins — the parent side reduces to its
    * distinct keys (broadcastable for dimensions), the child ships key
    * columns only. Three true FKs (expect 0) plus the REVERSE probe
    * customer→orders, where a non-zero count is the real answer (customers
    * who never ordered) — the audit must prove it can count violations, not
    * just print zeros. */
  def refIntegrityReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Quality
    val orders = table(spark, dir, "orders")
    val customer = table(spark, dir, "customer")
    val nation = table(spark, dir, "nation")
    Quality.check(table(spark, dir, "lineitem"),
        Seq(Quality.refIntegrity(Seq("l_orderkey"), orders, Seq("o_orderkey"))))
      .unionByName(Quality.check(orders,
        Seq(Quality.refIntegrity(Seq("o_custkey"), customer, Seq("c_custkey")))))
      .unionByName(Quality.check(customer,
        Seq(Quality.refIntegrity(Seq("c_nationkey"), nation, Seq("n_nationkey")),
          Quality.refIntegrity(Seq("c_custkey"), orders, Seq("o_custkey")))))
      .orderBy("rule")
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q112_ref_integrity" -> (refIntegrityReport _),
    "q53_asof_join" -> (asofViewBeforeClick _),
    "q54_range_join" -> (windowRangeCounts _),
    "q55_sessionization" -> (userSessions _),
    "q56_quantiles" -> (charQuantiles _),
    "q57_top_tokens" -> (topTokensPerLang _),
    "q146_distinctive_terms" -> (distinctiveTerms _),
    "q58_stratified_sample" -> (stratifiedSample _),
    "q59_source_overlap" -> (sourceOverlap _),
    "q60_salted_join" -> (saltedJoinRollup _),
    "q61_asof_next" -> (asofNextPurchase _),
    "q62_winnow_buckets" -> (winnowBuckets _),
    "q67_bm25_topk" -> (bm25TopK _),
    "q68_repetition_stats" -> (repetitionStats _),
    "q69_zorder_buckets" -> (zorderBuckets _),
    "q70_heavy_hitters" -> (heavyHitters _),
    "q72_snapshot_diff" -> (snapshotDiffRollup _),
    "q73_quality_report" -> (qualityReport _),
    "q80_ngram_novelty" -> (ngramNovelty _),
    "q81_source_drift" -> (sourceDrift _),
    "q106_bpe_pairs" -> (bpePairs _),
    "q107_oov_rate" -> (oovRate _),
    "q108_token_ids" -> (tokenIds _),
    "q114_phrase_search" -> (phraseSearch _),
    "q115_hybrid_rrf" -> (hybridRrf _),
    "q116_conversion_funnel" -> (conversionFunnel _),
    "q129_cohort_retention" -> (cohortRetention _),
    "q130_hourly_anomalies" -> (hourlyAnomalies _),
    "q132_ewma_trend" -> (ewmaTrend _),
    "q137_rolling_active" -> (rollingActiveUsers _),
    "q140_event_transitions" -> (eventTransitions _),
    "q147_transition_latency" -> (transitionLatency _),
    "q149_weekday_seasonality" -> (weekdaySeasonality _),
    "q150_rfm_segments" -> (rfmSegments _),
    "q152_token_concentration" -> (tokenConcentration _),
    "q154_pattern_screen" -> (sessionPatternScreen _),
    "q156_retrieval_eval" -> (retrievalEval _),
    "q141_session_paths" -> (sessionPaths _),
    "q117_bpe_merges" -> (bpeInduct _),
    "q118_bpe_encode" -> (bpeEncodeReport _)
  )

  /** q58 oracle: thresholds derived from the SAME fractions as the Spark
    * side (saturated fractions render as a match-all TRUE). */
  private def q58OracleSql: String = {
    val preds = strataFractions.map { case (lang, f) =>
      Sampling.thresholdFor(f) match {
        case None     => s"(lang = '$lang')"
        case Some(hi) => s"(lang = '$lang' AND substr(md5('s1' || text), 1, 4) < '$hi')"
      }
    }.mkString(" OR ")
    s"SELECT lang, count(*) AS n, MIN(doc_id) AS first_id FROM documents " +
      s"WHERE $preds GROUP BY lang ORDER BY lang"
  }

  val oracles: Map[String, String] = Map(
    "q129_cohort_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY 1),
        |sz AS (SELECT d0, count(*)::BIGINT AS cohort_size FROM f GROUP BY 1),
        |r AS (
        |  SELECT f.d0, ud.day - f.d0 AS day_offset, count(*)::BIGINT AS retained
        |  FROM ud JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT r.d0 AS cohort_day, r.day_offset, sz.cohort_size, r.retained,
        |  (r.retained * 10000) // sz.cohort_size AS retention_bp
        |FROM r JOIN sz USING (d0)
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "q137_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS m FROM ud),
        |contrib AS (
        |  SELECT DISTINCT u, day + o AS d
        |  FROM ud CROSS JOIN range(0, 7) t(o)
        |  WHERE day + o <= (SELECT m FROM mx)),
        |wau AS (SELECT d, count(*)::BIGINT AS wau FROM contrib GROUP BY 1),
        |dau AS (SELECT day AS d, count(*)::BIGINT AS dau FROM ud GROUP BY 1)
        |SELECT w.d AS day, coalesce(dau.dau, 0) AS dau, w.wau AS wau,
        |  (coalesce(dau.dau, 0) * 10000) // w.wau AS stickiness_bp
        |FROM wau w LEFT JOIN dau USING (d) ORDER BY day""".stripMargin,
    // The packed-EWMA chain is inherently sequential, so the oracle folds
    // it with a recursive CTE stepping one day per round (the
    // Round13Queries.cdcOracleCtesFor treatment) — the previous
    // list_reduce form was latently exposed to DuckDB 1.0's full-vector
    // misfold. Base row = day 1's seeded accumulator; an event_type with
    // a single day terminates at the base row.
    "q132_ewma_trend" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, count(*)::BIGINT AS n_days,
        |    list(n ORDER BY day) AS ns
        |  FROM d GROUP BY 1),
        |f(event_type, k, acc) AS (
        |  SELECT event_type, 1::BIGINT, ns[1] * 1000000 * 64 FROM l
        |  UNION ALL
        |  SELECT f.event_type, f.k + 1,
        |    ((3 * l.ns[(f.k + 1)::INT] * 1000000 + 7 * (f.acc // 64)) // 10) * 64
        |      + f.acc % 64
        |      + CASE WHEN l.ns[(f.k + 1)::INT] * 1000000 > 2 * (f.acc // 64)
        |        THEN 1 ELSE 0 END
        |  FROM f JOIN l USING (event_type) WHERE f.k < l.n_days)
        |SELECT l.event_type AS event_type, l.n_days, f.acc // 64 AS ewma_u,
        |  f.acc % 64 AS spike_days
        |FROM f JOIN l USING (event_type) WHERE f.k = l.n_days
        |ORDER BY event_type""".stripMargin,
    "q130_hourly_anomalies" ->
      """WITH h AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, count(*)::BIGINT AS hh, sum(n)::BIGINT AS ss,
        |    sum(n * n)::BIGINT AS qq, max(n)::BIGINT AS mx
        |  FROM h GROUP BY 1)
        |SELECT h.event_type AS event_type, max(hh) AS n_hours,
        |  sum(CASE WHEN (n*hh - ss)*(n*hh - ss) > 9*(hh*qq - ss*ss)
        |      THEN 1 ELSE 0 END)::BIGINT AS hours_3s,
        |  sum(CASE WHEN (n*hh - ss)*(n*hh - ss) > 4*(hh*qq - ss*ss)
        |      THEN 1 ELSE 0 END)::BIGINT AS hours_2s,
        |  min(CASE WHEN n = mx THEN hr END) AS peak_hr,
        |  max(mx) AS peak_n
        |FROM h JOIN s USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q114_phrase_search" -> q114OracleSql,
    "q115_hybrid_rrf" -> q115OracleSql,
    "q116_conversion_funnel" -> q116OracleSql,
    "q117_bpe_merges" -> q117OracleSql,
    "q118_bpe_encode" -> q118OracleSql,
    "q112_ref_integrity" ->
      """SELECT 'ref(l_orderkey)' AS rule,
        |  (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT AS violations,
        |  (SELECT count(*) FROM lineitem)::BIGINT AS total_rows
        |UNION ALL SELECT 'ref(o_custkey)',
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT,
        |  (SELECT count(*) FROM orders)::BIGINT
        |UNION ALL SELECT 'ref(c_nationkey)',
        |  (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))::BIGINT,
        |  (SELECT count(*) FROM customer)::BIGINT
        |UNION ALL SELECT 'ref(c_custkey)',
        |  (SELECT count(*) FROM customer c WHERE c.c_custkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::BIGINT,
        |  (SELECT count(*) FROM customer)::BIGINT
        |ORDER BY rule""".stripMargin,
    "q106_bpe_pairs" ->
      """WITH toks AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w FROM documents),
        |tf AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
        |p0 AS (SELECT w, c, unnest(generate_series(1, length(w)-1)) AS i FROM tf WHERE length(w) >= 2),
        |agg AS (SELECT substr(w, i, 2) AS pair, sum(c)::BIGINT AS n FROM p0 GROUP BY 1)
        |SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q107_oov_rate" ->
      """WITH toks AS (SELECT source, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w FROM documents),
        |bs AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
        |vocab AS (SELECT w FROM (SELECT w, sum(c) AS cc FROM bs GROUP BY w)
        |          ORDER BY cc DESC, w LIMIT 64)
        |SELECT bs.source, sum(bs.c)::BIGINT AS n_tokens,
        |  sum(CASE WHEN v.w IS NULL THEN bs.c ELSE 0 END)::BIGINT AS n_oov,
        |  round(sum(CASE WHEN v.w IS NULL THEN bs.c ELSE 0 END) / sum(bs.c), 6) AS oov_rate
        |FROM bs LEFT JOIN vocab v ON bs.w = v.w
        |GROUP BY bs.source ORDER BY source""".stripMargin,
    "q108_token_ids" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(ts) AS w,
        |           unnest(generate_series(1, len(ts))) AS pos FROM tk),
        |tf AS (SELECT w, count(*) AS cc FROM toks GROUP BY w),
        |vocab AS (SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY cc DESC, w) AS INTEGER) AS id
        |          FROM (SELECT w, cc FROM tf ORDER BY cc DESC, w LIMIT 64)),
        |j AS (SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS id
        |      FROM toks t LEFT JOIN vocab v ON t.w = v.w)
        |SELECT doc_id, count(*) AS n_tokens,
        |  sum(pos * id)::BIGINT AS ids_checksum
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q81_source_drift" ->
      """WITH toks AS (SELECT source, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token FROM documents),
        |bs AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |tot AS (SELECT source, sum(c) AS tot FROM bs GROUP BY 1),
        |corp AS (SELECT token, sum(c) AS cc FROM bs GROUP BY 1),
        |qv AS (SELECT token, cc / (SELECT sum(cc) FROM corp) AS q FROM corp),
        |j AS (SELECT bs.source, bs.c / tot.tot AS p, qv.q
        |      FROM bs JOIN tot USING(source) JOIN qv USING(token)),
        |pres AS (SELECT source,
        |    sum((p * ln(p / ((p+q)/2)) + q * ln(q / ((p+q)/2))) * 0.5) AS js_p,
        |    count(*) AS vocab, sum(q) AS qsum
        |  FROM j GROUP BY source)
        |SELECT pres.source, tot.tot::BIGINT AS n_tokens, pres.vocab,
        |  round(pres.js_p + 0.5 * ln(2) * (1 - pres.qsum), 6) AS js_divergence
        |FROM pres JOIN tot USING(source) ORDER BY source""".stripMargin,
    "q80_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |grams AS (SELECT doc_id, list_distinct(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
        |  WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |  ELSE list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2], ' ')) END) AS g FROM toks),
        |ex AS (SELECT doc_id, ('0x'||substr(md5(g2),1,15))::BIGINT AS h
        |       FROM (SELECT doc_id, unnest(g) AS g2 FROM grams)),
        |fs AS (SELECT h, min(doc_id) AS fd FROM ex GROUP BY h)
        |SELECT e.doc_id, count(*) AS n_grams,
        |  sum(CASE WHEN f.fd = e.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  round(sum(CASE WHEN f.fd = e.doc_id THEN 1 ELSE 0 END) / count(*), 6) AS novelty
        |FROM ex e JOIN fs f USING(h)
        |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin,
    "q72_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT o_orderkey AS k, o_orderstatus, o_totalprice FROM orders),
        |nxt AS (
        |  SELECT k, CASE WHEN k % 89 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |         o_totalprice
        |  FROM prev WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT k + 3000000, o_orderstatus, o_totalprice FROM prev WHERE k % 101 = 0),
        |d AS (
        |  SELECT CASE
        |    WHEN p.k IS NULL THEN 'added'
        |    WHEN n.k IS NULL THEN 'removed'
        |    WHEN p.o_orderstatus = n.o_orderstatus AND p.o_totalprice = n.o_totalprice
        |      THEN 'unchanged'
        |    ELSE 'changed' END AS change
        |  FROM prev p FULL OUTER JOIN nxt n ON p.k = n.k)
        |SELECT change, count(*) AS n FROM d GROUP BY change ORDER BY change""".stripMargin,
    "q73_quality_report" ->
      """WITH row_rules AS (
        |  SELECT count(*) AS total,
        |    CAST(sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_notnull,
        |    CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 49 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 0.05 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc
        |  FROM lineitem),
        |uniq_ol AS (
        |  SELECT CAST(sum(n - 1) AS BIGINT) AS v, CAST(sum(n) AS BIGINT) AS total FROM
        |    (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        |uniq_s AS (
        |  SELECT CAST(sum(n - 1) AS BIGINT) AS v, CAST(sum(n) AS BIGINT) AS total FROM
        |    (SELECT count(*) AS n FROM lineitem GROUP BY l_suppkey))
        |SELECT rule, violations, total_rows FROM (
        |  SELECT 'not_null(l_orderkey)' AS rule, v_notnull AS violations, total AS total_rows FROM row_rules
        |  UNION ALL SELECT 'range(l_quantity)', v_qty, total FROM row_rules
        |  UNION ALL SELECT 'range(l_discount)', v_disc, total FROM row_rules
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', v, total FROM uniq_ol
        |  UNION ALL SELECT 'unique(l_suppkey)', v, total FROM uniq_s)
        |ORDER BY rule""".stripMargin,
    "q70_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |x AS (SELECT token, count(*) AS n FROM t GROUP BY token)
        |SELECT token, n, n AS mg_n, TRUE AS sketch_exact
        |FROM x ORDER BY n DESC, token LIMIT 10""".stripMargin,
    "q69_zorder_buckets" ->
      """WITH e AS (
        |  SELECT user_id,
        |    user_id % 65536 AS x,
        |    ((epoch_us(ts) % 86400000000) * 65536) // 86400000000 AS y
        |  FROM events),
        |z AS (
        |  SELECT user_id,
        |    list_sum([((x >> i) & 1) * (1::BIGINT << (2*i))
        |              + ((y >> i) & 1) * (1::BIGINT << (2*i+1)) for i in range(0,16)])::BIGINT AS z
        |  FROM e)
        |SELECT (z >> 24) AS zbucket, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    "q68_repetition_stats" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len(ts) < 2 THEN [array_to_string(ts, ' ')]
        |         ELSE [array_to_string(ts[i:i+1], ' ') for i in range(1, len(ts))]
        |    END AS grams
        |  FROM tk WHERE len(ts) > 0),
        |r AS (
        |  SELECT lang, len(grams) AS total, len(list_distinct(grams)) AS uniq,
        |    1 - len(list_distinct(grams))::DOUBLE / len(grams) AS rep
        |  FROM g)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(total) AS BIGINT) AS grams_total,
        |  CAST(sum(uniq) AS BIGINT) AS grams_uniq,
        |  round(1 - sum(uniq)::DOUBLE / sum(total), 4) AS dup_ratio,
        |  round(max(rep), 4) AS max_rep,
        |  count(*) FILTER (WHERE rep >= 0.1) AS high_rep
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q67_bm25_topk" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |st AS (SELECT count(*) AS n, avg(len(ts)) AS avgl FROM tk),
        |post AS (
        |  SELECT t.term, tk.doc_id, len(ts) AS dl, len(list_filter(ts, x -> x = t.term)) AS tf
        |  FROM tk, (SELECT unnest(['spark','table','join','hash','window']) AS term) t
        |  WHERE len(list_filter(ts, x -> x = t.term)) > 0),
        |dfq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        |scored AS (
        |  -- every literal cast to DOUBLE: DuckDB parses bare decimals as
        |  -- DECIMAL, whose exact arithmetic would diverge from Spark's IEEE
        |  -- doubles in the last ulps; with doubles the grouping below is
        |  -- bit-identical to the Spark expression
        |  SELECT post.term, post.doc_id, post.tf,
        |    ln((st.n - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE) + 1) * (post.tf * (1.2::DOUBLE + 1)) /
        |      (post.tf + 1.2::DOUBLE * (1 - 0.75::DOUBLE + 0.75::DOUBLE * post.dl / st.avgl)) AS score
        |  FROM post JOIN dfq ON post.term = dfq.term, st)
        |SELECT term, doc_id, tf, round(score, 4) AS score, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
        |  FROM scored) WHERE rnk <= 10 ORDER BY term, rnk""".stripMargin,
    "q53_asof_join" ->
      ("WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click'), " +
        "v AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'view'), " +
        "j AS (SELECT c.user_id, c.click_id, v.view_id, " +
        "ROW_NUMBER() OVER (PARTITION BY c.user_id, c.click_id ORDER BY v.tsu DESC, v.view_id DESC) AS rn " +
        "FROM c JOIN v ON c.user_id = v.user_id AND v.tsu <= c.tsu) " +
        "SELECT user_id, click_id, view_id FROM j WHERE rn = 1 ORDER BY user_id, click_id"),
    "q54_range_join" ->
      ("WITH w AS (SELECT event_type AS wtype, MIN(epoch_us(ts)) AS lo, MIN(epoch_us(ts)) + 21600000000 AS hi " +
        "FROM events GROUP BY event_type) " +
        "SELECT wtype, count(*) AS n FROM w JOIN events e ON epoch_us(e.ts) BETWEEN w.lo AND w.hi " +
        "GROUP BY wtype ORDER BY wtype"),
    "q55_sessionization" ->
      ("WITH o AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events), " +
        "l AS (SELECT user_id, tsu, event_id, LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev FROM o), " +
        "f AS (SELECT user_id, tsu, CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END AS brk, event_id FROM l), " +
        "s AS (SELECT user_id, tsu, SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f), " +
        "g AS (SELECT user_id, sid, count(*) AS n, MAX(tsu) - MIN(tsu) AS dur FROM s GROUP BY user_id, sid) " +
        "SELECT user_id, count(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events, " +
        "ROUND(AVG(n), 4) AS avg_events, CAST(MAX(dur) AS BIGINT) AS max_dur_us " +
        "FROM g GROUP BY user_id ORDER BY user_id"),
    "q140_event_transitions" ->
      ("WITH o AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type FROM events), " +
        "p AS (SELECT event_type AS src_type, " +
        "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS dst_type FROM o), " +
        "c AS (SELECT src_type, dst_type, count(*)::BIGINT AS n FROM p " +
        "WHERE dst_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT src_type, dst_type, n, " +
        "(n * 10000 // SUM(n) OVER (PARTITION BY src_type))::BIGINT AS prob_bp " +
        "FROM c ORDER BY src_type, dst_type"),
    // q147: exact interpolating quantile == Spark `percentile`; the approx
    // column surfaces only through approx_ok = TRUE (the q56 rule)
    "q147_transition_latency" ->
      ("WITH o AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type FROM events), " +
        "p AS (SELECT event_type AS src_type, " +
        "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS dst_type, " +
        "LEAD(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) - tsu AS delta_us FROM o) " +
        "SELECT src_type, dst_type, count(*)::BIGINT AS n, " +
        "ROUND(quantile_cont(delta_us, 0.5) / 1e6, 4) AS p50_s, " +
        "ROUND(quantile_cont(delta_us, 0.9) / 1e6, 4) AS p90_s, TRUE AS approx_ok " +
        "FROM p WHERE dst_type IS NOT NULL GROUP BY 1, 2 ORDER BY src_type, dst_type"),
    // q156: full BM25 self-retrieval replay — same tokenize, same
    // Lucene-style idf, the count-of-strictly-better rank, truncated
    // reciprocal-rank basis points
    "q156_retrieval_eval" ->
      """WITH tok AS (SELECT doc_id,
        |    list_append(list_filter(string_split_regex(text, '\s+'), x -> x <> ''), 'uniq' || doc_id::VARCHAR) AS ts,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS orig
        |  FROM documents),
        |st AS (SELECT count(*)::BIGINT AS n, AVG(len(ts)) AS avgl FROM tok),
        |pn AS (SELECT doc_id AS pid,
        |    list_prepend('uniq' || doc_id::VARCHAR, (list_sort(list_distinct(orig)))[1:2]) AS q
        |  FROM tok WHERE doc_id % 100 = 0),
        |pterms AS (SELECT pid, UNNEST(q) AS term FROM pn),
        |occ AS (SELECT doc_id, len(ts) AS dlen, UNNEST(ts) AS term FROM tok),
        |posts AS (SELECT term, doc_id, dlen, count(*)::BIGINT AS tf FROM occ
        |  WHERE term IN (SELECT DISTINCT term FROM pterms) GROUP BY 1, 2, 3),
        |dfq AS (SELECT term, count(*)::BIGINT AS df FROM posts GROUP BY 1),
        |tsc AS (SELECT p.term, p.doc_id,
        |    ln(((SELECT n FROM st) - df + 0.5) / (df + 0.5) + 1.0)
        |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dlen / (SELECT avgl FROM st))) AS s
        |  FROM posts p JOIN dfq USING (term)),
        |sc AS (SELECT pid, doc_id, SUM(s) AS s FROM pterms JOIN tsc USING (term) GROUP BY 1, 2),
        |tr AS (SELECT pid, s AS tscore FROM sc WHERE doc_id = pid),
        |bt AS (SELECT tr.pid, SUM(CASE WHEN sc.s > tr.tscore
        |      OR (sc.s = tr.tscore AND sc.doc_id < tr.pid) THEN 1 ELSE 0 END)::BIGINT AS nb
        |  FROM tr JOIN sc ON sc.pid = tr.pid AND sc.doc_id <> tr.pid GROUP BY 1),
        |rk AS (SELECT tr.pid, coalesce(bt.nb, 0) + 1 AS rank FROM tr LEFT JOIN bt ON tr.pid = bt.pid)
        |SELECT count(*)::BIGINT AS n_probes,
        |  SUM(CASE WHEN rank = 1 THEN 1 ELSE 0 END)::BIGINT AS hits_at_1,
        |  SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END)::BIGINT AS hits_at_10,
        |  (SUM(CASE WHEN rank <= 10 THEN 10000 // rank ELSE 0 END) // count(*))::BIGINT AS mrr_bp
        |FROM rk""".stripMargin,
    // q154: q141's sessionize CTEs with FULL paths + LIKE containment
    "q154_pattern_screen" ->
      ("WITH o AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type FROM events), " +
        "l AS (SELECT *, LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev FROM o), " +
        "s AS (SELECT user_id, tsu, event_id, event_type, " +
        "SUM(CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM l), " +
        "p AS (SELECT user_id, sid, array_to_string(list(event_type ORDER BY tsu, event_id), '>') AS path " +
        "FROM s GROUP BY 1, 2), " +
        "f AS (SELECT count(*)::BIGINT AS total, " +
        "SUM(CASE WHEN path LIKE '%view%purchase%' THEN 1 ELSE 0 END)::BIGINT AS vtp, " +
        "SUM(CASE WHEN path LIKE '%error%purchase%' THEN 1 ELSE 0 END)::BIGINT AS er, " +
        "SUM(CASE WHEN path LIKE 'signup%' THEN 1 ELSE 0 END)::BIGINT AS se, " +
        "SUM(CASE WHEN path NOT LIKE '%purchase%' AND path NOT LIKE '%signup%' THEN 1 ELSE 0 END)::BIGINT AS bo FROM p) " +
        "SELECT pattern, n_sessions, (n_sessions * 10000 // total)::BIGINT AS share_bp FROM (" +
        "SELECT 'browse_only' AS pattern, bo AS n_sessions, total FROM f " +
        "UNION ALL SELECT 'error_recovery', er, total FROM f " +
        "UNION ALL SELECT 'signup_entry', se, total FROM f " +
        "UNION ALL SELECT 'view_to_purchase', vtp, total FROM f) ORDER BY pattern"),
    // q150: mean thresholds replayed exactly (anchor·n − Σlast) // n;
    // l_quantity is integral DOUBLE so the BIGINT cast agrees cross-engine
    "q150_rfm_segments" ->
      """WITH oc AS (SELECT o_custkey AS cust, count(*)::BIGINT AS freq,
        |    max(epoch_us(o_orderdate) // 86400000000)::BIGINT AS last_day
        |  FROM orders GROUP BY 1),
        |mc AS (SELECT o_custkey AS cust, SUM(CAST(l_quantity AS BIGINT))::BIGINT AS mon
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
        |j AS (SELECT cust, freq, last_day, mon FROM oc JOIN mc USING (cust)),
        |m AS (SELECT max(last_day) AS anchor,
        |    (max(last_day) * count(*) - SUM(last_day)) // count(*) AS rbar,
        |    SUM(freq) // count(*) AS fbar, SUM(mon) // count(*) AS mbar FROM j)
        |SELECT concat(
        |    'R', CASE WHEN (SELECT anchor FROM m) - last_day <= (SELECT rbar FROM m) THEN '1' ELSE '0' END,
        |    'F', CASE WHEN freq > (SELECT fbar FROM m) THEN '1' ELSE '0' END,
        |    'M', CASE WHEN mon > (SELECT mbar FROM m) THEN '1' ELSE '0' END) AS segment,
        |  count(*)::BIGINT AS n_customers, SUM(freq)::BIGINT AS tot_orders,
        |  SUM(mon)::BIGINT AS tot_qty
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // q152: the Concentration CTE replay — grouped-weight Gini and the
    // tie-pro-rata top-1% share, one trailing // per metric
    "q152_token_concentration" ->
      """WITH tok AS (SELECT coalesce(lang, '??') AS lang,
        |    UNNEST(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT lang, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
        |h AS (SELECT lang, tf AS w, count(*)::BIGINT AS cnt FROM tf GROUP BY 1, 2),
        |c AS (SELECT lang, w, cnt,
        |    coalesce(SUM(cnt) OVER (PARTITION BY lang ORDER BY w ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_asc,
        |    coalesce(SUM(cnt) OVER (PARTITION BY lang ORDER BY w DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_desc
        |  FROM h),
        |a AS (SELECT lang, SUM(cnt)::BIGINT AS n_units, SUM(w * cnt)::BIGINT AS total_w,
        |    MAX(w)::BIGINT AS max_w,
        |    SUM(w * (cnt * cum_asc + (cnt * (cnt + 1)) // 2))::BIGINT AS s
        |  FROM c GROUP BY 1),
        |tp AS (SELECT c.lang,
        |    SUM(w * GREATEST(0, LEAST(cnt, (SELECT (n_units + 99) // 100 FROM a WHERE a.lang = c.lang) - cum_desc)))::BIGINT AS topw
        |  FROM c GROUP BY 1)
        |SELECT a.lang, n_units, total_w, max_w,
        |  (((2 * s - (n_units + 1) * total_w) * 10000) // (n_units * total_w))::BIGINT AS gini_bp,
        |  ((topw * 10000) // total_w)::BIGINT AS top1pct_bp
        |FROM a JOIN tp ON a.lang = tp.lang ORDER BY a.lang""".stripMargin,
    // q149: pure integer day-of-week — (epoch_day + 3) % 7, 0 = Monday
    "q149_weekday_seasonality" ->
      ("WITH o AS (SELECT event_type, (epoch_us(ts) // 86400000000 + 3) % 7 AS dow FROM events), " +
        "c AS (SELECT event_type, dow, count(*)::BIGINT AS n FROM o GROUP BY 1, 2) " +
        "SELECT event_type, dow, n, " +
        "(n * 7 * 10000 // SUM(n) OVER (PARTITION BY event_type))::BIGINT AS idx_bp " +
        "FROM c ORDER BY event_type, dow"),
    "q141_session_paths" ->
      ("WITH o AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type FROM events), " +
        "l AS (SELECT *, LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev FROM o), " +
        "s AS (SELECT user_id, tsu, event_id, event_type, " +
        "SUM(CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM l), " +
        "p AS (SELECT user_id, sid, " +
        "array_to_string((list(event_type ORDER BY tsu, event_id))[1:5], '>') AS path " +
        "FROM s GROUP BY 1, 2) " +
        "SELECT path, count(*)::BIGINT AS n_sessions FROM p GROUP BY 1 " +
        "ORDER BY n_sessions DESC, path LIMIT 20"),
    "q56_quantiles" ->
      ("SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 4) AS p50, " +
        "ROUND(quantile_cont(n_chars, 0.9), 4) AS p90, " +
        "ROUND(quantile_cont(n_chars, 0.99), 4) AS p99, TRUE AS approx_ok " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q57_top_tokens" ->
      ("WITH t AS (SELECT lang, UNNEST(list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS token FROM documents), " +
        "g AS (SELECT lang, token, count(*) AS df FROM t GROUP BY lang, token), " +
        "r AS (SELECT lang, token, df, CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY df DESC, token) AS INTEGER) AS rank FROM g) " +
        "SELECT lang, token, df, rank FROM r WHERE rank <= 5 ORDER BY lang, rank"),
    // q146: same tokenize, same integer lift; `//` == div (all positive)
    "q146_distinctive_terms" ->
      """WITH t AS (SELECT coalesce(lang, '??') AS lang,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |lt AS (SELECT lang, token, count(*)::BIGINT AS tf_l FROM t GROUP BY 1, 2),
        |lg AS (SELECT lang, sum(tf_l)::BIGINT AS ltot FROM lt GROUP BY 1),
        |tk AS (SELECT token, sum(tf_l)::BIGINT AS tf FROM lt GROUP BY 1),
        |tot AS (SELECT sum(tf_l)::BIGINT AS t FROM lt)
        |SELECT lang, token, tf_l, tf,
        |  (tf_l * (SELECT t FROM tot) * 10000) // (tf * ltot) AS lift_bp
        |FROM lt JOIN lg USING (lang) JOIN tk USING (token)
        |WHERE tf_l >= 5
        |ORDER BY lift_bp DESC, lang, token LIMIT 20""".stripMargin,
    "q58_stratified_sample" -> q58OracleSql,
    // exact columns replayed in SQL (same word-3-gram family as the q24/q51
    // oracles); the sketch estimate surfaces only through approx_ok = TRUE
    "q59_source_overlap" ->
      ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t FROM documents), " +
        "grams AS (SELECT doc_id, list_distinct(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[]) " +
        "WHEN len(t) < 3 THEN [array_to_string(t, ' ')] " +
        "ELSE list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2], ' ')) END) AS g FROM toks), " +
        "sg AS (SELECT DISTINCT d.source, u.gr FROM grams JOIN documents d USING (doc_id), UNNEST(grams.g) AS u(gr)), " +
        "sz AS (SELECT source, count(*) AS n FROM sg GROUP BY source), " +
        "inter AS (SELECT a.source AS srcA, b.source AS srcB, count(*) AS i FROM sg a JOIN sg b ON a.gr = b.gr AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT srcA, srcB, ROUND(CAST(i AS DOUBLE) / (za.n + zb.n - i), 4) AS exact_jaccard, TRUE AS approx_ok " +
        "FROM inter JOIN sz za ON za.source = srcA JOIN sz zb ON zb.source = srcB ORDER BY srcA, srcB"),
    // the oracle is the PLAIN join — the salt must be result-invisible
    "q60_salted_join" ->
      ("WITH dim AS (SELECT event_type AS etype, count(DISTINCT user_id) AS dim_users FROM events GROUP BY 1) " +
        "SELECT etype, count(*) AS n, ROUND(SUM(value), 4) AS sum_v, MAX(dim_users) AS dim_users " +
        "FROM (SELECT event_type AS etype, value FROM events) e JOIN dim USING (etype) " +
        "GROUP BY etype ORDER BY etype"),
    "q61_asof_next" ->
      ("WITH er AS (SELECT user_id, event_id AS error_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'error'), " +
        "pu AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'purchase'), " +
        "j AS (SELECT er.user_id, er.error_id, pu.purchase_id, " +
        "ROW_NUMBER() OVER (PARTITION BY er.user_id, er.error_id ORDER BY pu.tsu ASC, pu.purchase_id ASC) AS rn " +
        "FROM er JOIN pu ON er.user_id = pu.user_id AND pu.tsu >= er.tsu AND pu.tsu - er.tsu <= 1800000000) " +
        "SELECT user_id, error_id, purchase_id FROM j WHERE rn = 1 ORDER BY user_id, error_id")
  )
}
