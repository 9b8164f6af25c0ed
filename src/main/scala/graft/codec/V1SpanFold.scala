package graft.codec

import graft.model.Span
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Zipkin v1 annotation-row reconstruction — operator M2 (SURVEY §2.2;
  * reference mysql/.../DependencyLinkSpanIterator.java:21-187).
  *
  * Input (tall format, one row per span×annotation — the MySQL pushdown
  * query's output shape, MySQLDependenciesJob.java:185-196):
  *   trace_id_high LONG?, trace_id LONG, parent_id LONG?, id LONG,
  *   a_key STRING in (lc,ca,cs,sa,sr,ma,ms,mr,error),
  *   endpoint_service_name STRING?, a_type INT, start_ts LONG?
  *
  * Reconstruction per (trace_id, id) — conditional aggregation, NOT a
  * sorted-run fold: the reference assumes rows arrive clustered by
  * (trace_id, span_id) and silently depends on row-object reuse for
  * correctness; this implementation is order-independent by construction
  * (scalacheck-pinned). Grouping ignores trace_id_high so mixed-width
  * reports of one trace don't double-count (reference :71-76).
  *
  * Classification (DependencyLinkSpanIterator.java:127-171, reproduced):
  *  - ca defaults to the cs owner (:127);
  *  - Finagle loopback guard: if sa == ca, drop ca (:129-131);
  *  - sr       ⇒ SERVER  (local=sr, remote=ca)
  *  - else sa  ⇒ kind = CLIENT iff cs else unset; local = ca else lc; remote=sa
  *  - else cs  ⇒ SERVER  (local=ca, no remote)
  *  - else mr  ⇒ CONSUMER(local=mr, remote=ma)
  *  - else ms  ⇒ PRODUCER(local=ms, remote=ma)
  *  - error counts only from a STRING binary annotation (a_type == 6, a tag
  *    not an event — :120-122), and only when the row carries a non-empty
  *    endpoint_service_name — the reference skips key-or-value-null rows
  *    before its switch (:94 `if (key == null || value == null) continue`),
  *    so an error tag with no endpoint does NOT mark the span errored.
  *    Divergence (documented): the reference keeps the LAST error row's
  *    verdict under its input order; we count the span as errored if ANY
  *    qualifying error tag row exists (order-independent).
  */
object V1SpanFold {

  /** The annotation keys the reference's pushdown query admits
    * (MySQLDependenciesJob.java:185-198) — shared with the JDBC source. */
  val coreKeys: Seq[String] = Seq("lc", "ca", "cs", "sa", "sr", "ma", "ms", "mr", "error")

  private def svc(key: String): Column =
    max(when(col("a_key") === key && length(col("endpoint_service_name")) > 0,
      col("endpoint_service_name")))

  /** Fold tall v1 annotation rows into the linker's span projection. */
  def fold(rows: DataFrame): Dataset[Span] = {
    val spark = rows.sparkSession
    import spark.implicits._

    val agg = rows
      .groupBy(col("trace_id"), col("id"))
      .agg(
        svc("lc").as("lc"), svc("ca").as("ca"), svc("cs").as("cs"),
        svc("sa").as("sa"), svc("sr").as("sr"), svc("ma").as("ma"),
        svc("mr").as("mr"), svc("ms").as("ms"),
        max(col("a_key") === "error" && col("a_type") === 6 &&
          length(col("endpoint_service_name")) > 0).as("err"),
        max(col("parent_id")).as("parent_id"),
        min(col("start_ts")).as("start_ts"))

    // the client address is more authoritative than the client-send owner
    val ca1 = coalesce(col("ca"), col("cs"))
    // Finagle loopback guard
    val caEff = when(col("sa").isNotNull && col("sa") === ca1, lit(null).cast("string"))
      .otherwise(ca1)

    val kind = when(col("sr").isNotNull, Span.Server)
      .when(col("sa").isNotNull, when(col("cs").isNotNull, Span.Client))
      .when(col("cs").isNotNull, Span.Server)
      .when(col("mr").isNotNull, Span.Consumer)
      .when(col("ms").isNotNull, Span.Producer)

    val local = when(col("sr").isNotNull, col("sr"))
      .when(col("sa").isNotNull, coalesce(caEff, col("lc")))
      .when(col("cs").isNotNull, caEff)
      .when(col("mr").isNotNull, col("mr"))
      .when(col("ms").isNotNull, col("ms"))

    val remote = when(col("sr").isNotNull, caEff)
      .when(col("sa").isNotNull, col("sa"))
      .when(col("cs").isNotNull, lit(null).cast("string"))
      .when(col("mr").isNotNull, col("ma"))
      .when(col("ms").isNotNull, col("ma"))

    agg.select(
      format_string("%016x", col("trace_id")).as("traceId"),
      when(col("parent_id").isNotNull && col("parent_id") =!= 0,
        format_string("%016x", col("parent_id"))).as("parentId"),
      format_string("%016x", col("id")).as("id"),
      kind.as("kind"),
      col("start_ts").as("timestamp"),
      lit(null).cast("long").as("duration"),
      lit(false).as("shared"),
      local.as("localServiceName"),
      remote.as("remoteServiceName"),
      coalesce(col("err"), lit(false)).as("errorTag")
    ).as[Span]
  }

  /** Per-span time window (the reference pushes `start_ts BETWEEN` into the
    * DB; here Catalyst pushes it into the scan) applied BEFORE folding, like
    * the reference's WHERE runs before its GROUP BY. */
  def foldWindow(rows: DataFrame, loMicros: Long, hiMicros: Long): Dataset[Span] =
    fold(rows.where(col("start_ts").isNotNull &&
      col("start_ts").between(loMicros, hiMicros)))

  /** M1 — the v1 two-table ingest (SURVEY §2.2). The reference pushes
    *
    *   SELECT DISTINCT s.trace_id, s.parent_id, s.id, a.a_key,
    *          a.endpoint_service_name, a.a_type
    *   FROM zipkin_spans s LEFT OUTER JOIN zipkin_annotations a
    *     ON s.trace_id = a.trace_id AND s.id = a.span_id
    *    AND a.a_key IN ('lc','ca','cs','sa','sr','ma','ms','mr','error')
    *   WHERE s.start_ts BETWEEN lo AND hi
    *   GROUP BY s.trace_id, s.id, a.a_key, a.endpoint_service_name, a.a_type
    *
    * down to MySQL (MySQLDependenciesJob.java:185-198); this is the same
    * relation computed in Spark, so any two-table v1 store (parquet export,
    * generic JDBC) can feed the linker. The LEFT OUTER keeps annotation-less
    * spans as tree hops, exactly like the reference.
    *
    * Scale: the day filter and a_key IN (...) reach both scans (pushed
    * filters); each side shuffles once on the join key (trace_id, id); the
    * dedup aggregation and fold's groupBy cluster on subsets of that key, so
    * Catalyst reuses the join partitioning — no additional exchange until
    * the linker's trace regroup.
    */
  def fromV1Tables(
      spansT: DataFrame, annotations: DataFrame,
      loMicros: Long, hiMicros: Long): Dataset[Span] = {
    val s = spansT
      .where(col("start_ts").isNotNull && col("start_ts").between(loMicros, hiMicros))
      .select(col("trace_id"), col("parent_id"), col("id"), col("start_ts"))
    val a = annotations
      .where(col("a_key").isin(coreKeys: _*))
      .select(col("trace_id").as("a_trace_id"), col("span_id"),
        col("a_key"), col("endpoint_service_name"), col("a_type"))
    val tall = s.join(a,
        s("trace_id") === col("a_trace_id") && s("id") === col("span_id"), "left_outer")
      // reference GROUP BY (no parent_id/start_ts in the key — they are
      // span-functional); min/max keeps the dedup deterministic
      .groupBy(col("trace_id"), col("id"), col("a_key"),
        col("endpoint_service_name"), col("a_type"))
      .agg(max(col("parent_id")).as("parent_id"), min(col("start_ts")).as("start_ts"))
    fold(tall)
  }
}
