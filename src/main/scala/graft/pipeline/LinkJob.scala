package graft.pipeline

import graft.link.DependencyLinker
import graft.model.{DependencyLink, Span}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Admission semantics differ per reference backend and must be explicit
  * (SURVEY §2.3): which spans/traces of the scanned data contribute to a day. */
sealed trait Admission
object Admission {
  /** Cassandra path: a trace contributes only if every parentless span has a
    * timestamp inside the window (SpansToDependencyLinks.java:36-42). */
  case object RootInWindow extends Admission
  /** MySQL path: per-span predicate start_ts BETWEEN lo AND hi
    * (MySQLDependenciesJob.java:188-196) — pushed down before grouping. */
  case object PerSpanWindow extends Admission
  /** ES/OS path: the daily index IS the predicate; everything read is admitted
    * (ElasticsearchDependenciesJob.java:173,180). */
  case object IndexDay extends Admission
}

/** The end-to-end dependency-link pipeline, Spark-first (SURVEY §3.4):
  * declarative scan → (pushed-down) day filter → typed island
  * groupByKey(traceKey).flatMapGroups(linker) → relational
  * groupBy(parent,child).agg(sum,sum) → day-partitioned overwrite sink.
  *
  * Scale notes (100 TB posture):
  *  - the only wide ops are the trace shuffle and the tiny (|services|²)
  *    link aggregation; the link agg gets map-side partial aggregation for
  *    free from Catalyst (HashAggregate partial → Exchange → final).
  *  - span-level filters/projections stay relational so Parquet pushdown and
  *    column pruning apply before the typed island (verified via .explain —
  *    see PipelineSpec).
  *  - the result is persisted before reuse: the reference recomputed its whole
  *    lineage twice (isEmpty + save, BASELINE.md); we do not.
  */
object LinkJob {

  /** Read Zipkin JSON v2 span documents (one object per line) into the typed
    * span projection. PERMISSIVE parse: corrupt records dropped (P9 —
    * TraceIdAndJsonToDependencyLinks.java:35-44 logs & skips). A missing
    * day path yields an EMPTY dataset, matching the reference's
    * ES_INDEX_READ_MISSING_AS_EMPTY=true (ElasticsearchDependenciesJob
    * .java:66) — a day with no index is a day with no spans, not a failure. */
  def readJsonV2(spark: SparkSession, path: String): Dataset[Span] = {
    val exists = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val glob = fs.globStatus(p) // handles literal paths and day globs alike
      glob != null && glob.nonEmpty
    }
    val raw =
      if (exists) spark.read.schema(Span.jsonV2Schema).json(path)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Span.jsonV2Schema)
    fromJsonV2Shape(raw)
  }

  /** Same projection from an already-loaded DataFrame in JSON v2 nested shape
    * (e.g. parquet with localEndpoint/remoteEndpoint structs + tags map). */
  def fromJsonV2Shape(df: DataFrame): Dataset[Span] = {
    val spark = df.sparkSession
    import spark.implicits._
    df
      .where($"traceId".isNotNull && $"id".isNotNull)
      .select(
        lower($"traceId").as("traceId"),
        lower($"parentId").as("parentId"),
        lower($"id").as("id"),
        upper($"kind").as("kind"),
        $"timestamp",
        $"duration",
        coalesce($"shared", lit(false)).as("shared"),
        $"localEndpoint.serviceName".as("localServiceName"),
        $"remoteEndpoint.serviceName".as("remoteServiceName"),
        // only the presence of the "error" tag is consumed (P7)
        coalesce(map_contains_key($"tags", "error"), lit(false)).as("errorTag")
      )
      .withColumn("kind",
        when($"kind".isin(Span.Client, Span.Server, Span.Producer, Span.Consumer), $"kind"))
      .as[Span]
  }

  /** Flattened-CSV span source (header row required): columns
    * `traceId,parentId,id,kind,timestamp,duration,shared,localServiceName,
    * remoteServiceName,error` — the JSON v2 projection with endpoints and
    * the error tag pre-flattened (CSV has no nested types). An `error` cell
    * that is non-empty marks the span errored, matching the
    * only-key-presence-matters tag semantics of P7. Reuses the same
    * normalization path as every other source (fromJsonV2Shape). */
  val csvSpanSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("traceId", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("parentId", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("duration", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shared", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("localServiceName", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("remoteServiceName", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("error", org.apache.spark.sql.types.StringType)))

  def readCsvSpans(spark: SparkSession, path: String): Dataset[Span] = {
    val raw = spark.read.schema(csvSpanSchema).option("header", "true").csv(path)
    fromJsonV2Shape(raw.select(
      col("traceId"), col("parentId"), col("id"), col("kind"),
      col("timestamp"), col("duration"), col("shared"),
      struct(col("localServiceName").as("serviceName")).as("localEndpoint"),
      struct(col("remoteServiceName").as("serviceName")).as("remoteEndpoint"),
      when(col("error").isNotNull && col("error") =!= "",
        map(lit("error"), col("error"))).as("tags")))
  }

  /** UTC day window [startMicros, endMicros] for a yyyy-MM-dd day string —
    * day*1000_000 … +86399999999 (CassandraDependenciesJob.java:168-169). */
  def dayWindowMicros(day: String): (Long, Long) = {
    val d = java.time.LocalDate.parse(day)
    val start = d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    (start, start + 86399999999L)
  }

  /** Apply admission semantics for one day window. RootInWindow is expressed
    * relationally (a groupBy-derived trace verdict joined back would shuffle;
    * instead we compute the verdict inside the linker group where the trace is
    * already co-located — zero extra shuffles). */
  def admit(spans: Dataset[Span], admission: Admission, lo: Long, hi: Long): Dataset[Span] = {
    val spark = spans.sparkSession
    import spark.implicits._
    admission match {
      case Admission.PerSpanWindow =>
        // pushed to the scan by Catalyst (PushedFilters on timestamp)
        spans.filter($"timestamp".isNotNull && $"timestamp".between(lo, hi))
      case _ => spans // RootInWindow is enforced per-trace in linkSpans
    }
  }

  /** Core: spans → per-day dependency links.
    *
    * @param strict    group by stored traceId verbatim vs low-64 unification
    * @param admission which spans/traces count toward the day
    */
  /** @param maxSpansPerTrace giant-trace guard (SURVEY §4.2): traces beyond
    *   the cap keep their earliest `maxSpansPerTrace` spans (by timestamp,
    *   then id — deterministic). 0 = off (reference behavior). Salting cannot
    *   preserve tree-walk semantics, so a documented cap is the honest skew
    *   mitigation. */
  def linkSpans(
      spans: Dataset[Span],
      day: String,
      admission: Admission = Admission.IndexDay,
      strict: Boolean = false,
      maxSpansPerTrace: Int = 0
  ): Dataset[DependencyLink] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val (lo, hi) = dayWindowMicros(day)
    val admitted = admit(spans, admission, lo, hi)
    val rootWindow = admission == Admission.RootInWindow

    // typed island: one shuffle on traceKey, then the per-trace graph walk.
    // RootInWindow is enforced here, where the trace is already co-located
    // (any parentless span with a missing/out-of-window timestamp drops the
    // whole trace — SpansToDependencyLinks.java:36-42).
    admitted
      .groupByKey(s => if (strict) s.traceId else s.traceIdLow64)
      .flatMapGroups { (_, it) =>
        val all = it.toSeq
        val spansOfTrace =
          if (maxSpansPerTrace > 0 && all.size > maxSpansPerTrace)
            all.sortBy(s => (s.timestamp.getOrElse(Long.MaxValue), s.id, s.shared))
              .take(maxSpansPerTrace)
          else all
        val admitTrace = !rootWindow || spansOfTrace.forall { s =>
          s.parentId.isDefined || s.timestamp.exists(ts => ts >= lo && ts <= hi)
        }
        if (admitTrace) DependencyLinker.link(spansOfTrace)
        else Iterator.empty
      }
      .groupBy($"parent", $"child")
      .agg(sum($"callCount").as("callCount"), sum($"errorCount").as("errorCount"))
      .as[DependencyLink]
  }

  /** Sink: day-partitioned parquet with dynamic partition overwrite — the
    * idempotent re-run/upsert semantics of the reference sinks (P15-P17). */
  /** Day-partitioned dynamic-overwrite sink. `format` selects the storage
    * codec (parquet default; orc/json/csv all keep the same idempotent
    * day-overwrite semantics — the partition layout, not the codec, is what
    * makes re-runs safe). */
  def writeLinks(links: Dataset[DependencyLink], day: String, outPath: String,
      format: String = "parquet"): Unit = {
    links.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val w = links.withColumn("day", lit(java.sql.Date.valueOf(day)))
      .write.mode("overwrite").partitionBy("day").format(format)
    // csv keeps a header row — symmetric with readCsvSpans (which requires
    // one) and non-lossy for downstream consumers of the links table
    (if (format == "csv") w.option("header", "true") else w).save(outPath)
  }

  /** ES/OS-document-shaped sink parity (P16 — ElasticsearchDependenciesJob
    * .java:209-221): one JSON doc per link with deterministic
    * `id = parent|child`, so a re-run of the same day overwrites rather than
    * duplicates. Day-scoped path = daily-index naming. */
  def writeLinksAsJsonDocs(links: Dataset[DependencyLink], day: String, outPath: String): Unit =
    links.select(
      concat_ws("|", col("parent"), col("child")).as("id"),
      col("parent"), col("child"), col("callCount"), col("errorCount"))
      .write.mode("overwrite").json(s"$outPath/dependency-$day")

  /** One day end-to-end: read → link → write → return links (persisted —
    * the caller owns the cache and unpersists when done consuming). */
  def runDay(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      day: String,
      admission: Admission = Admission.IndexDay,
      strict: Boolean = false,
      outFormat: String = "parquet"
  ): Dataset[DependencyLink] = {
    val links = linkSpans(readJsonV2(spark, inPath), day, admission, strict).persist()
    if (!links.isEmpty) writeLinks(links, day, outPath, outFormat)
    links
  }
}
