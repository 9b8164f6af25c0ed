package graft.sources

import graft.model.Span
import graft.pipeline.LinkJob
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cassandra-v3-shaped span source: the token-range-partitioned read model
  * of the reference's C* ingest (cassandra3/.../CassandraDependenciesJob
  * .java:174-177 reads `keyspace.span` through the connector, which assigns
  * each Spark partition one contiguous ring token range), abstracted over a
  * fixture-backed scan — this sandbox has no live Cassandra, so the
  * transport is the swappable piece and everything around it (ring split
  * arithmetic, per-partition CQL predicates, ownership-shaped partitioning,
  * row→Span decode) is real and tested. Mirrors what [[JdbcV1Source]] did
  * for the MySQL path.
  *
  * Ring model: Cassandra's Murmur3Partitioner places each partition key at
  * a signed-64 token; a scan is parallelized by splitting the ring into
  * contiguous `(lo, hi]` ranges, each read with
  * `WHERE token(trace_id) > lo AND token(trace_id) <= hi`. [[tokenRanges]]
  * computes exactly those splits, and [[rangeCql]] renders the per-partition
  * predicate a live driver would issue. The fixture scan stands in
  * `xxhash64` for the Murmur3 token (same signed-64 space; the real token
  * comes from the cluster and never needs to be reproduced client-side) and
  * reproduces ownership with a range repartition on the token, so
  * downstream code sees the same contiguous-ownership layout a connector
  * delivers.
  *
  * Decode parity (CassandraRowToSpan.java:26-56): ts → timestamp, shared,
  * kind kept only when a valid enum value, endpoint UDTs contribute only
  * their service name, and only the presence of the `error` tag is
  * consumed. One deliberate divergence, documented: the reference truncates
  * 128-bit trace ids to the low 64 at decode and groups strict traces by
  * the RAW column; here the span keeps its full id and [[LinkJob]] applies
  * strict/low-64 grouping uniformly across every source — same link output,
  * one grouping rule. */
object CassandraV3Source {

  /** Connection surface of the reference builder (CassandraDependenciesJob
    * env names: CASSANDRA_KEYSPACE, CASSANDRA_CONTACT_POINTS,
    * CASSANDRA_LOCAL_DC, CASSANDRA_USERNAME, CASSANDRA_PASSWORD), plus the
    * scan-parallelism and paging knobs the live CQL read uses. */
  final case class CassandraV3Config(
      keyspace: String = "zipkin2",
      table: String = "span",
      numRanges: Int = 32,
      contactPoints: String = "127.0.0.1",
      localDc: String = "datacenter1",
      username: Option[String] = None,
      password: Option[String] = None,
      pageSize: Int = 5000,
      timeoutMs: Int = 10000,
      useSsl: Boolean = false)

  /** CASSANDRA_USE_SSL mirrors CassandraDependenciesJob.java:71;
    * CASSANDRA_PAGE_SIZE / CASSANDRA_TIMEOUT (millis) tune the live CQL
    * paging for a slow cluster without a code change — the ES_TIMEOUT
    * convention applied to this transport. */
  def fromEnv(env: Map[String, String], numRanges: Int = 32): CassandraV3Config =
    CassandraV3Config(
      keyspace = env.getOrElse("CASSANDRA_KEYSPACE", "zipkin2"),
      numRanges = numRanges,
      contactPoints = env.getOrElse("CASSANDRA_CONTACT_POINTS", "127.0.0.1"),
      localDc = env.getOrElse("CASSANDRA_LOCAL_DC", "datacenter1"),
      username = env.get("CASSANDRA_USERNAME").filter(_.nonEmpty),
      password = env.get("CASSANDRA_PASSWORD").filter(_.nonEmpty),
      pageSize = env.get("CASSANDRA_PAGE_SIZE").map(_.toInt).getOrElse(5000),
      timeoutMs = env.get("CASSANDRA_TIMEOUT").map(_.toInt).getOrElse(10000),
      useSsl = env.get("CASSANDRA_USE_SSL").exists(_.equalsIgnoreCase("true")))

  /** `host1:9042,host2` → [(host, port)], port defaulting to 9042 — the
    * reference's contact-point convention (CassandraDependenciesJob builder
    * parses host:port pairs the same way). */
  def contactPointList(csv: String): Seq[(String, Int)] =
    csv.split(",", -1).toSeq.filter(_.nonEmpty).map { raw =>
      raw.split(":", 2) match {
        case Array(h, p) => (h, p.toInt)
        case Array(h) => (h, 9042)
      }
    }

  /** The `zipkin2.span` table shape the decode consumes (CassandraRowToSpan
    * field reads): endpoints are UDTs carrying the service name. */
  val spanTableSchema: StructType = StructType(Seq(
    StructField("trace_id", StringType),
    StructField("parent_id", StringType),
    StructField("id", StringType),
    StructField("kind", StringType),
    StructField("ts", LongType),
    StructField("duration", LongType),
    StructField("shared", BooleanType),
    StructField("l_ep", StructType(Seq(StructField("service", StringType)))),
    StructField("r_ep", StructType(Seq(StructField("service", StringType)))),
    StructField("tags", MapType(StringType, StringType))))

  /** Contiguous `[lo, hi]` (BOTH bounds inclusive) splits of the signed-64
    * token ring — the per-partition scan bounds a live driver issues.
    * Together they cover the ring exactly: range 0 starts at Long.MinValue,
    * range n-1 ends at Long.MaxValue, and lo(i+1) = hi(i) + 1. numRanges
    * must be a power of two so the split points are exact integer
    * arithmetic and [[rangeId]] can match them with a shift. */
  def tokenRanges(numRanges: Int): Seq[(Long, Long)] = {
    require(numRanges > 0 && (numRanges & (numRanges - 1)) == 0,
      s"numRanges must be a power of two, got $numRanges")
    val width = java.lang.Long.divideUnsigned(-1L, numRanges.toLong) + 1L // 2^64 / n
    (0 until numRanges).map { i =>
      val lo = Long.MinValue + i * width
      val hi = if (i == numRanges - 1) Long.MaxValue else lo + width - 1
      (lo, hi)
    }
  }

  /** The CQL predicate for one range — what each executor's scan runs
    * against a live cluster. Both bounds inclusive, matching
    * [[tokenRanges]]: an exclusive lower bound here (the C* driver's
    * `(lo, hi]` convention, where lo is the PREVIOUS range's hi) applied
    * to these already-disjoint [lo, hi] bounds would silently skip the
    * token at every interior split point — numRanges−1 dropped tokens. */
  def rangeCql(cfg: CassandraV3Config, lo: Long, hi: Long): String =
    s"SELECT * FROM ${cfg.keyspace}.${cfg.table} " +
      s"WHERE token(trace_id) >= $lo AND token(trace_id) <= $hi"

  /** Ring coordinate of a row in the fixture-backed scan — xxhash64 stands
    * in for the cluster-side Murmur3 token (same signed-64 space, same
    * uniformity; the real value is never computed client-side). */
  def ringToken(traceId: Column): Column = xxhash64(traceId)

  /** Which of the n ring ranges owns a token: flip the sign bit so signed
    * tokens order as unsigned ring positions, then take the top log2(n)
    * bits — exact, branch-free, matches [[tokenRanges]] bounds. */
  def rangeId(token: Column, numRanges: Int): Column = {
    require(numRanges > 0 && (numRanges & (numRanges - 1)) == 0,
      s"numRanges must be a power of two, got $numRanges")
    val shift = 64 - Integer.numberOfTrailingZeros(numRanges)
    if (shift == 64) lit(0)
    else shiftrightunsigned(token.bitwiseXOR(lit(Long.MinValue)), shift).cast("int")
  }

  /** Fixture-backed token-range scan: parquet in span-table shape, laid out
    * by ring ownership — each output partition holds one contiguous token
    * span (range bounds from sampling rather than the fixed ring splits; a
    * live connector pins partitions at the source without this shuffle). */
  def scanSpanTable(spark: SparkSession, path: String, cfg: CassandraV3Config): DataFrame =
    spark.read.schema(spanTableSchema).parquet(path)
      .withColumn("_token", ringToken(col("trace_id")))
      .repartitionByRange(cfg.numRanges, col("_token"))

  /** span-table rows → typed spans, through the same normalization path as
    * every other source (LinkJob.fromJsonV2Shape), so kind validation,
    * lowercase ids and error-tag presence follow one rule. */
  def fromSpanTable(rows: DataFrame): Dataset[Span] =
    LinkJob.fromJsonV2Shape(rows.select(
      col("trace_id").as("traceId"),
      col("parent_id").as("parentId"),
      col("id"),
      col("kind"),
      col("ts").as("timestamp"),
      col("duration"),
      col("shared"),
      struct(col("l_ep.service").as("serviceName")).as("localEndpoint"),
      struct(col("r_ep.service").as("serviceName")).as("remoteEndpoint"),
      col("tags")))

  /** One scan, ready for the linker (day admission — the C* profile's
    * root-in-window — is applied by LinkJob, same as every source). */
  def spans(spark: SparkSession, path: String, cfg: CassandraV3Config): Dataset[Span] =
    fromSpanTable(scanSpanTable(spark, path, cfg).drop("_token"))

  /** LIVE token-range scan over the in-house CQL v4 client ([[CqlClient]]):
    * one ring range per Spark partition, placed at the source exactly like
    * EsSpanSource's slices — each task opens its own connection (contact
    * points tried in order), drains its range with server-side paging, and
    * closes. The per-range CQL is [[rangeCql]] verbatim, so the plan the
    * fixture path tests is the plan the live path executes; at cluster
    * scale this is the reference connector's read model
    * (CassandraDependenciesJob.java:174-177) without the driver-library
    * dependency.
    *
    * Rows are matched to the `zipkin2.span` shape BY COLUMN NAME from the
    * server's own metadata (a `SELECT *` row order is the server's
    * choice), endpoints read only their `service` UDT field
    * (CassandraRowToSpan.java:26-56), and everything funnels through the
    * same [[fromSpanTable]] normalization as the fixture scan. */
  def liveSpans(spark: SparkSession, cfg: CassandraV3Config): Dataset[Span] = {
    val points = contactPointList(cfg.contactPoints)
    require(points.nonEmpty, "CASSANDRA_CONTACT_POINTS must name at least one host")
    val ranges = tokenRanges(cfg.numRanges)
    val cfgB = cfg
    import spark.implicits._
    val rows: Dataset[C3SpanRow] =
      spark.range(0L, cfg.numRanges.toLong, 1L, cfg.numRanges).mapPartitions { ids =>
        ids.flatMap { id =>
          val i = id.toInt
          val (lo, hi) = ranges(i)
          val cql = rangeCql(cfgB, lo, hi)
          val client = connectAny(points, cfgB)
          // close on task end too: exhaustion closes eagerly below, but a
          // killed/failed task must not leak the socket until GC
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
          new Iterator[C3SpanRow] {
            private val underlying = client.queryAll(cql, cfgB.pageSize)
            private var closed = false
            override def hasNext: Boolean = {
              val h = !closed && underlying.hasNext
              if (!h && !closed) { closed = true; client.close() }
              h
            }
            override def next(): C3SpanRow = {
              val (cols, vals) = underlying.next()
              C3SpanRow.fromRow(cols, vals)
            }
          }
        }
      }
    fromSpanTable(rows.toDF().select(
      col("trace_id"), col("parent_id"), col("id"), col("kind"),
      col("ts"), col("duration"), col("shared"),
      struct(col("l_ep_service").as("service")).as("l_ep"),
      struct(col("r_ep_service").as("service")).as("r_ep"),
      col("tags")))
  }

  /** First contact point that accepts the connection+handshake wins;
    * exhausting all of them is loud, like EsSpanSource's scroll open.
    * Shared with [[graft.sinks.CqlLinkSink]] — read and write paths hold
    * identical connection semantics. */
  private[graft] def connectAny(points: Seq[(String, Int)], cfg: CassandraV3Config): CqlClient = {
    var lastErr: Throwable = null
    // default JSSE context per executor — configured by the standard
    // javax.net.ssl.* system properties, the same surface the reference's
    // driver SSL options ride on
    val ssl = if (cfg.useSsl) Some(javax.net.ssl.SSLContext.getDefault) else None
    points.foreach { case (h, p) =>
      try return new CqlClient(h, p, cfg.username, cfg.password, cfg.timeoutMs, ssl)
      catch { case e: java.io.IOException => lastErr = e }
    }
    throw new java.io.IOException(
      s"CQL connect failed on every contact point: ${points.mkString(", ")}", lastErr)
  }
}

/** One live-scan row in `zipkin2.span` shape, column-name-matched from the
  * server's metadata. Top-level so the product encoder derives. */
final case class C3SpanRow(
    trace_id: Option[String], parent_id: Option[String], id: Option[String],
    kind: Option[String], ts: Option[Long], duration: Option[Long],
    shared: Option[Boolean], l_ep_service: Option[String],
    r_ep_service: Option[String], tags: Option[Map[String, String]])

object C3SpanRow {
  def fromRow(cols: Seq[(String, Cql.CqlType)], vals: Array[Any]): C3SpanRow = {
    val byName: Map[String, Any] =
      cols.iterator.zipWithIndex.map { case ((n, _), i) => n -> vals(i) }.toMap
    def str(c: String): Option[String] =
      byName.get(c).flatMap(Option(_)).map(_.asInstanceOf[String])
    def lng(c: String): Option[Long] =
      byName.get(c).flatMap(Option(_)).map(_.asInstanceOf[Long])
    def bool(c: String): Option[Boolean] =
      byName.get(c).flatMap(Option(_)).map(_.asInstanceOf[Boolean])
    def udtService(c: String): Option[String] =
      byName.get(c).flatMap(Option(_)).flatMap {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].get("service")
          .flatMap(Option(_)).map(_.toString)
        case _ => None
      }
    def strMap(c: String): Option[Map[String, String]] =
      byName.get(c).flatMap(Option(_)).map { case m: Map[_, _] =>
        m.asInstanceOf[Map[Any, Any]].map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }
      }
    C3SpanRow(str("trace_id"), str("parent_id"), str("id"), str("kind"),
      lng("ts"), lng("duration"), bool("shared"),
      udtService("l_ep"), udtService("r_ep"), strMap("tags"))
  }
}
