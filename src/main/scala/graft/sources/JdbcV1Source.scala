package graft.sources

import graft.codec.V1SpanFold
import graft.model.Span
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Partitioned-JDBC config for a Zipkin v1 SQL store (the MySQL schema
  * shape). `properties` passes through to the driver (user / password /
  * driver class); credentials resolve from the reference's MYSQL_USER /
  * MYSQL_PASS env names in [[JdbcV1Config.fromEnv]]. */
final case class JdbcV1Config(
    url: String,
    spansTable: String = "zipkin_spans",
    annotationsTable: String = "zipkin_annotations",
    numPartitions: Int = 32,
    fetchSize: Int = 10000,
    properties: Map[String, String] = Map.empty)

object JdbcV1Config {
  /** Credential parity with the reference launcher (MYSQL_USER / MYSQL_PASS,
    * mysql/.../ZipkinMySQLStorage.java env surface). MYSQL_MAX_CONNECTIONS
    * (MySQLDependenciesJob.java:47) caps the partition count when SET —
    * each stride opens its own cursor, so the cap is the DBA's
    * connection-budget knob; when unset the requested parallelism stands
    * (the reference's default of 10 would silently re-serialize the
    * distributed read this source exists to provide). */
  def fromEnv(url: String, numPartitions: Int, env: Map[String, String]): JdbcV1Config =
    JdbcV1Config(url,
      numPartitions = env.get("MYSQL_MAX_CONNECTIONS") match {
        case Some(cap) => math.max(1, math.min(numPartitions, cap.toInt))
        case None => numPartitions
      },
      properties = Seq(
        env.get("MYSQL_USER").map("user" -> _),
        env.get("MYSQL_PASS").map("password" -> _)).flatten.toMap)
}

/** P-JDBC — live v1 SQL span source, the reference's MySQL ingest made
  * scan-parallel.
  *
  * The reference pushes one join query to the database and reads it through
  * a SINGLE JDBC connection (mysql/.../MySQLDependenciesJob.java:185-209 —
  * no partitionColumn, so the whole day serializes through one cursor; its
  * own docs call the job memory-bound on big days). This source keeps the
  * same pushdown join — the database resolves annotations per span via its
  * (trace_id, span_id) index, so no full annotation scan ships — but reads
  * it as `numPartitions` concurrent range queries on `start_ts` over the
  * day window: Spark's JDBC partitioner turns [lo, hi) into N strides, each
  * executor opens its own cursor, and a 1000-executor cluster drains the
  * day in parallel instead of through one connection.
  *
  * The day filter itself is applied via [[V1SpanFold.foldWindow]], whose
  * `start_ts BETWEEN` predicate Catalyst pushes into every partition's
  * WHERE — this also closes the JDBC partitioner's unbounded first/last
  * stride (Spark emits `start_ts < b1 OR start_ts IS NULL` for stride 0, so
  * without the pushed window the edge partitions would read the whole
  * table's tails).
  */
object JdbcV1Source {

  /** The reference's pushdown relation (tall rows, one per span×annotation,
    * annotation-less spans kept by the LEFT OUTER) as a partitioned JDBC
    * scan. DISTINCT/GROUP BY dedup stays in Spark — V1SpanFold.fold's
    * conditional aggregation already merges duplicates order-independently,
    * so the database only joins and ships. */
  def tallRows(spark: SparkSession, cfg: JdbcV1Config,
      loMicros: Long, hiMicros: Long): DataFrame = {
    val coreKeys = V1SpanFold.coreKeys.map(k => s"'$k'").mkString(",")
    val relation =
      s"""(SELECT s.trace_id, s.parent_id, s.id, s.start_ts,
         |        a.a_key, a.endpoint_service_name, a.a_type
         |   FROM ${cfg.spansTable} s
         |   LEFT OUTER JOIN ${cfg.annotationsTable} a
         |     ON s.trace_id = a.trace_id AND s.id = a.span_id
         |    AND a.a_key IN ($coreKeys)) AS v1_rows""".stripMargin
    val props = new java.util.Properties()
    cfg.properties.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("fetchsize", cfg.fetchSize.toString)
    spark.read.jdbc(cfg.url, relation,
      columnName = "start_ts", lowerBound = loMicros, upperBound = hiMicros,
      numPartitions = cfg.numPartitions, connectionProperties = props)
  }

  /** One day window of reconstructed spans, ready for the linker. */
  def spansWindow(spark: SparkSession, cfg: JdbcV1Config,
      loMicros: Long, hiMicros: Long): Dataset[Span] =
    V1SpanFold.foldWindow(tallRows(spark, cfg, loMicros, hiMicros), loMicros, hiMicros)
}
