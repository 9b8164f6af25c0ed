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
    * CASSANDRA_LOCAL_DC), plus the scan-parallelism knob. */
  final case class CassandraV3Config(
      keyspace: String = "zipkin2",
      table: String = "span",
      numRanges: Int = 32,
      contactPoints: String = "127.0.0.1",
      localDc: String = "datacenter1")

  def fromEnv(env: Map[String, String], numRanges: Int = 32): CassandraV3Config =
    CassandraV3Config(
      keyspace = env.getOrElse("CASSANDRA_KEYSPACE", "zipkin2"),
      numRanges = numRanges,
      contactPoints = env.getOrElse("CASSANDRA_CONTACT_POINTS", "127.0.0.1"),
      localDc = env.getOrElse("CASSANDRA_LOCAL_DC", "datacenter1"))

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

  /** Contiguous `(lo, hi]` splits of the signed-64 token ring — the
    * per-partition scan bounds a live driver issues. Together they cover
    * the ring exactly: range 0 starts at Long.MinValue (exclusive via >=
    * on the first range, see [[rangeCql]]), range n-1 ends at
    * Long.MaxValue. numRanges must be a power of two so the split points
    * are exact integer arithmetic. */
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

  /** The CQL predicate for one range — what each executor's scan would run
    * against a live cluster. First range closes the ring with >=. */
  def rangeCql(cfg: CassandraV3Config, lo: Long, hi: Long, first: Boolean): String = {
    val loOp = if (first) ">=" else ">"
    s"SELECT * FROM ${cfg.keyspace}.${cfg.table} " +
      s"WHERE token(trace_id) $loOp $lo AND token(trace_id) <= $hi"
  }

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
}
