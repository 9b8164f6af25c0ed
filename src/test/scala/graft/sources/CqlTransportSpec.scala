package graft.sources

import graft.pipeline.{Admission, LinkJob, SparkTestSession}
import graft.sources.CassandraV3Source.CassandraV3Config
import org.scalatest.funsuite.AnyFunSuite


/** Scripted-socket spec for the CQL v4 transport — the CassandraV3Source
  * analogue of EsSpanSourceSpec's scripted cluster: the in-JVM
  * [[ScriptedCassandra]] speaks the native protocol (STARTUP/READY, SASL
  * PLAIN auth, QUERY with paging, RESULT Rows in the `zipkin2.span` shape)
  * so the handshake, the typed decode, paging continuation, auth and the
  * end-to-end token-range read are all pinned without a live Cassandra. */
class CqlTransportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val ts = 1754870400000000L // inside 2025-08-11 UTC

  test("handshake + typed decode: shuffled columns, partial UDT, null handling") {
    val rows = Seq(
      FRow(-10L, "00000000000000aa", null, "0000000000000001", "CLIENT",
        ts, 1234L, false, "frontend", "backend", Map("error" -> "500")),
      FRow(10L, "00000000000000aa", "0000000000000001", "0000000000000002", "SERVER",
        ts + 1, null, true, "backend", null, null))
    val es = new ScriptedCassandra(rows)
    try {
      val client = new CqlClient("127.0.0.1", es.port)
      try {
        val got = client.queryAll("SELECT * FROM zipkin2.span", pageSize = 100)
          .map { case (cols, vals) => C3SpanRow.fromRow(cols, vals) }.toSeq
        assert(got.size == 2)
        val first = got.find(_.id.contains("0000000000000001")).get
        assert(first.trace_id.contains("00000000000000aa") && first.parent_id.isEmpty)
        assert(first.ts.contains(ts) && first.duration.contains(1234L))
        assert(first.shared.contains(false))
        assert(first.l_ep_service.contains("frontend") && first.r_ep_service.contains("backend"))
        assert(first.tags.contains(Map("error" -> "500")))
        val second = got.find(_.id.contains("0000000000000002")).get
        assert(second.duration.isEmpty && second.r_ep_service.isEmpty && second.tags.isEmpty)
        assert(second.shared.contains(true))
      } finally client.close()
    } finally es.stop()
  }

  test("server-side paging: the continuation threads until the page is short") {
    val rows = (0 until 5).map(i => FRow(i.toLong, f"$i%016x", null, f"$i%016x",
      "CLIENT", ts, null, false, s"svc$i", null, null))
    val es = new ScriptedCassandra(rows)
    try {
      val client = new CqlClient("127.0.0.1", es.port)
      try {
        val got = client.queryAll("SELECT * FROM zipkin2.span", pageSize = 2).toSeq
        assert(got.size == 5)
        // 3 pages: 2 + 2 + 1 — each page is one QUERY round-trip
        assert(es.queries.size == 3)
      } finally client.close()
    } finally es.stop()
  }

  test("SASL PLAIN auth: correct credentials read rows, wrong ones fail loudly") {
    val rows = Seq(FRow(0L, "00000000000000aa", null, "0000000000000001",
      "CLIENT", ts, null, false, "frontend", "backend", null))
    val es = new ScriptedCassandra(rows, requireAuth = Some(("cassandra", "secret")))
    try {
      val ok = new CqlClient("127.0.0.1", es.port, Some("cassandra"), Some("secret"))
      try assert(ok.queryAll("SELECT * FROM zipkin2.span", 10).size == 1)
      finally ok.close()
      val e = intercept[java.io.IOException] {
        new CqlClient("127.0.0.1", es.port, Some("cassandra"), Some("wrong"))
      }
      assert(e.getMessage.contains("Bad credentials"), e.getMessage)
    } finally es.stop()
  }

  test("server ERROR frames surface code and message, not silence") {
    val es = new ScriptedCassandra(Seq.empty, failQueries = true)
    try {
      val client = new CqlClient("127.0.0.1", es.port)
      try {
        val e = intercept[java.io.IOException](client.query("SELECT * FROM zipkin2.span", 10))
        assert(e.getMessage.contains("0x2200") && e.getMessage.contains("unconfigured table"))
      } finally client.close()
    } finally es.stop()
  }

  test("contact points parse host:port with the 9042 default; connect fails over") {
    assert(CassandraV3Source.contactPointList("c1,c2:9043") ==
      Seq(("c1", 9042), ("c2", 9043)))
    val rows = Seq(FRow(0L, "00000000000000aa", null, "0000000000000001",
      "CLIENT", ts, null, false, "frontend", "backend", null))
    val es = new ScriptedCassandra(rows)
    try {
      // first contact point refuses (port 1); the scan must land on the second
      import spark.implicits._
      val cfg = CassandraV3Config(numRanges = 2,
        contactPoints = s"127.0.0.1:1,127.0.0.1:${es.port}", timeoutMs = 2000)
      val links = LinkJob.linkSpans(
        CassandraV3Source.liveSpans(spark, cfg), "2025-08-11", Admission.IndexDay)
        .as[(String, String, Long, Long)].collect().toSet
      assert(links == Set(("frontend", "backend", 1L, 0L)))
    } finally es.stop()
  }

  test("unhandled primitive type ids decode as raw bytes; unknown nested ids fail loudly") {
    import java.nio.ByteBuffer
    def idOf(short: Int): ByteBuffer = {
      val bb = ByteBuffer.allocate(2); bb.putShort(short.toShort); bb.flip(); bb
    }
    // decimal (0x0006) and varint (0x000E): bare [short] ids with no nested
    // metadata — a SELECT * crossing such a column must not kill the scan
    assert(Cql.readType(idOf(0x0006)) == Cql.CqlType.Blob)
    assert(Cql.readType(idOf(0x000E)) == Cql.CqlType.Blob)
    val raw = Array[Byte](1, 2, 3)
    assert(Cql.decode(Cql.CqlType.Blob, raw).asInstanceOf[Array[Byte]].toSeq == raw.toSeq)
    // an unknown collection-range id carries nested params we can't skip
    intercept[java.io.IOException](Cql.readType(idOf(0x0029)))
  }

  test("liveSpans end-to-end: one range per task, ring covered, linked like the fixture path") {
    import spark.implicits._
    // tokens placed in both halves of the ring — numRanges=2 must fan out
    // one QUERY per range and see both rows exactly once
    val rows = Seq(
      FRow(-5000000000000000000L, "00000000000000aa", null, "0000000000000001",
        "CLIENT", ts, null, false, "frontend", "backend", null),
      FRow(5000000000000000000L, "00000000000000aa", "0000000000000001", "0000000000000002",
        "SERVER", ts + 1000, null, true, "backend", null, Map("error" -> "true")))
    val es = new ScriptedCassandra(rows)
    try {
      val cfg = CassandraV3Config(numRanges = 2,
        contactPoints = s"127.0.0.1:${es.port}")
      val ds = CassandraV3Source.liveSpans(spark, cfg)
      assert(ds.rdd.getNumPartitions == 2) // scale contract: one range per task
      val links = LinkJob.linkSpans(ds, "2025-08-11", Admission.RootInWindow)
        .as[(String, String, Long, Long)].collect().toSet
      assert(links == Set(("frontend", "backend", 1L, 1L)))
      // both ring halves were scanned with the inclusive-bounds predicate
      val qs = new java.util.ArrayList(es.queries)
      val preds = (0 until qs.size).map(qs.get).filter(_.contains("token(trace_id)"))
      assert(preds.toSet.size == 2, preds)
      preds.foreach(q => assert(q.contains(">=") && q.contains("<="), q))
    } finally es.stop()
  }
}
