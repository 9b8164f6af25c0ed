package graft.sources

import graft.codec.V1SpanFold
import graft.link.DependencyLinker
import graft.model.DependencyLink
import graft.pipeline.{Admission, LinkJob, SparkTestSession}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-JDBC v1 source round-trip against an embedded Derby database
  * (the only JDBC engine in the container's jar set) — the live-store
  * counterpart of V1SpanFoldSpec's two-table fixture test. */
class JdbcV1SourceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.get

  private val EVENT = -1
  private val STRING = 6

  /** Same day + rows as V1SpanFoldSpec's M1 test, shifted into the test
    * day's micros window so the window pushdown is exercised for real. */
  private val Day = "2025-08-11"
  private lazy val (lo, hi) = LinkJob.dayWindowMicros(Day)

  private def newDerby(): String = {
    val dir = java.nio.file.Files.createTempDirectory("derbyv1").toString
    val url = s"jdbc:derby:$dir/zipkin;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE zipkin_spans (trace_id BIGINT, parent_id BIGINT, id BIGINT, start_ts BIGINT)")
      st.executeUpdate(
        "CREATE TABLE zipkin_annotations (trace_id BIGINT, span_id BIGINT, " +
          "a_key VARCHAR(255), endpoint_service_name VARCHAR(255), a_type INT)")
      val ps = conn.prepareStatement("INSERT INTO zipkin_spans VALUES (?,?,?,?)")
      def span(traceId: Long, parentId: java.lang.Long, id: Long, ts: java.lang.Long): Unit = {
        ps.setLong(1, traceId)
        if (parentId == null) ps.setNull(2, java.sql.Types.BIGINT) else ps.setLong(2, parentId)
        ps.setLong(3, id)
        if (ts == null) ps.setNull(4, java.sql.Types.BIGINT) else ps.setLong(4, ts)
        ps.executeUpdate()
      }
      // 3-span chain inside the window + one span outside it
      span(1L, null, 10L, lo + 1000L)
      span(1L, 10L, 11L, lo + 1100L)
      span(1L, 11L, 12L, lo + 1200L)
      span(1L, 12L, 13L, hi + 999999L)
      val pa = conn.prepareStatement("INSERT INTO zipkin_annotations VALUES (?,?,?,?,?)")
      def anno(traceId: Long, spanId: Long, key: String, svc: String, typ: Int): Unit = {
        pa.setLong(1, traceId); pa.setLong(2, spanId); pa.setString(3, key)
        if (svc == null) pa.setNull(4, java.sql.Types.VARCHAR) else pa.setString(4, svc)
        pa.setInt(5, typ)
        pa.executeUpdate()
      }
      anno(1L, 10L, "cs", "frontend", EVENT)
      anno(1L, 11L, "sr", "backend", EVENT)
      anno(1L, 11L, "ca", "frontend", EVENT)
      anno(1L, 11L, "http.path", "/api", STRING) // non-core key — filtered
      anno(1L, 12L, "sr", "db", EVENT)
      anno(1L, 12L, "ca", "backend", EVENT)
      anno(1L, 12L, "error", null, STRING) // null endpoint — ignored
      anno(1L, 12L, "error", "db", STRING)
      anno(1L, 13L, "sr", "late", EVENT)
    } finally conn.close()
    url
  }

  test("partitioned JDBC read links identically to the two-table fixture path") {
    val url = newDerby()
    val cfg = JdbcV1Config(url, numPartitions = 4)
    val tall = JdbcV1Source.tallRows(spark, cfg, lo, hi)
    // the partitioner actually split the scan — N concurrent range cursors,
    // not the reference's single connection
    assert(tall.rdd.getNumPartitions == 4)

    val spans = JdbcV1Source.spansWindow(spark, cfg, lo, hi).collect().toSeq
    assert(spans.map(_.id).sorted ==
      Seq("000000000000000a", "000000000000000b", "000000000000000c"))
    assert(DependencyLinker.link(spans) == Seq(
      DependencyLink("backend", "db", 1, 1),
      DependencyLink("frontend", "backend", 1, 0)))

    // equivalence with the in-Spark two-table join on the same relations
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val props = new java.util.Properties()
    val spansT = spark.read.jdbc(url, "zipkin_spans", props)
    val annos = spark.read.jdbc(url, "zipkin_annotations", props)
    val viaTables = V1SpanFold.fromV1Tables(spansT, annos, lo, hi).collect().toSeq
    assert(spans.sortBy(_.id) == viaTables.sortBy(_.id))
  }

  test("full link job over JDBC spans matches the fixture-path links") {
    val url = newDerby()
    val cfg = JdbcV1Config(url, numPartitions = 3)
    import spark.implicits._
    val spans = JdbcV1Source.spansWindow(spark, cfg, lo, hi)
    val links = LinkJob.linkSpans(spans, Day, Admission.PerSpanWindow)
      .as[(String, String, Long, Long)].collect().toSet
    assert(links == Set(
      ("backend", "db", 1L, 1L),
      ("frontend", "backend", 1L, 0L)))
  }
}
