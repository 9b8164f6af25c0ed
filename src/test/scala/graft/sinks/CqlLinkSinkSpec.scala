package graft.sinks

import graft.model.DependencyLink
import graft.pipeline.SparkTestSession
import graft.sources.CassandraV3Source.CassandraV3Config
import graft.sources.ScriptedCassandra
import org.scalatest.funsuite.AnyFunSuite

/** Scripted-socket spec for the live Cassandra link sink — the write-side
  * twin of CqlTransportSpec: the in-JVM [[ScriptedCassandra]] answers
  * INSERTs with RESULT Void and records every statement, pinning the exact
  * CQL the reference's save issues (CassandraDependenciesJob.java:196-207)
  * without a live cluster. */
class CqlLinkSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def links(rows: (String, String, Long, Long)*) = {
    import spark.implicits._
    rows.map { case (p, c, calls, errs) => DependencyLink(p, c, calls, errs) }.toDS()
  }

  test("insertCql renders the reference's statement, errors omitted when zero") {
    assert(CqlLinkSink.insertCql("zipkin2", "2025-08-11", "frontend", "backend", 2L, 1L) ==
      "INSERT INTO zipkin2.dependency (day,parent,child,calls,errors)" +
        " VALUES ('2025-08-11','frontend','backend',2,1)")
    // errors == 0 leaves the cell UNSET (null), not 0 — the reference only
    // binds the errors column when the count is positive
    assert(CqlLinkSink.insertCql("zipkin2", "2025-08-11", "backend", "db", 3L, 0L) ==
      "INSERT INTO zipkin2.dependency (day,parent,child,calls)" +
        " VALUES ('2025-08-11','backend','db',3)")
    // single quotes in service names double — CQL's only string escape
    assert(CqlLinkSink.insertCql("zipkin2", "2025-08-11", "o'brien", "db", 1L, 0L)
      .contains("'o''brien'"))
  }

  test("writeLinks sends one INSERT per link to a scripted server, distributed") {
    val server = new ScriptedCassandra(Seq.empty)
    try {
      val cfg = CassandraV3Config(contactPoints = s"127.0.0.1:${server.port}")
      CqlLinkSink.writeLinks(
        links(("frontend", "backend", 2L, 1L), ("backend", "db", 3L, 0L)),
        "2025-08-11", cfg)
      val got = {
        val it = server.queries.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result()
      }.filter(_.startsWith("INSERT"))
      assert(got.toSet == Set(
        "INSERT INTO zipkin2.dependency (day,parent,child,calls,errors)" +
          " VALUES ('2025-08-11','frontend','backend',2,1)",
        "INSERT INTO zipkin2.dependency (day,parent,child,calls)" +
          " VALUES ('2025-08-11','backend','db',3)"))
    } finally server.stop()
  }

  test("auth reaches the write path; a server error fails the write loudly") {
    val authed = new ScriptedCassandra(Seq.empty, requireAuth = Some(("cassandra", "secret")))
    try {
      val cfg = CassandraV3Config(contactPoints = s"127.0.0.1:${authed.port}",
        username = Some("cassandra"), password = Some("secret"))
      CqlLinkSink.writeLinks(links(("a", "b", 1L, 0L)), "2025-08-11", cfg)
      val it = authed.queries.iterator()
      var sawInsert = false
      while (it.hasNext) sawInsert |= it.next().startsWith("INSERT")
      assert(sawInsert)
    } finally authed.stop()

    val failing = new ScriptedCassandra(Seq.empty, failQueries = true)
    try {
      val cfg = CassandraV3Config(contactPoints = s"127.0.0.1:${failing.port}")
      val e = intercept[org.apache.spark.SparkException] {
        CqlLinkSink.writeLinks(links(("a", "b", 1L, 0L)), "2025-08-11", cfg)
      }
      // the CQL error surfaces through the task failure, not silence
      assert(e.getCause != null || e.getMessage.contains("0x2200"))
    } finally failing.stop()
  }
}
