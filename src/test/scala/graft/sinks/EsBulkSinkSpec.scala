package graft.sinks

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.DependencyLink
import graft.pipeline.SparkTestSession
import graft.util.{EsFlavor, EsHttpTransport}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Live-transport spec in the spirit of the reference's
  * ElasticsearchDependenciesJobTest.java:47-86 (MockWebServer): an embedded
  * HTTP server traps the requests so we can assert the auth header and the
  * bulk payload shape without a real cluster. */
class EsBulkSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** (method, path, authHeader, body) of every request, in arrival order.
    * The first `failFirst` requests answer with an item-level-429 bulk
    * rejection (the backpressure shape), then `response` takes over.
    * `delayMs` sleeps before answering — the slow-cluster shape the
    * ES_TIMEOUT knob exists for. */
  private final class Recorder(response: String = """{"took":1,"errors":false,"items":[]}""",
      failFirst: Int = 0, delayMs: Long = 0L) {
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String, String)]()
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (delayMs > 0L) Thread.sleep(delayMs)
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        requests.add((ex.getRequestMethod, ex.getRequestURI.toString,
          ex.getRequestHeaders.getFirst("Authorization"), body))
        val resp = if (requests.size <= failFirst)
          """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}"""
        else response
        val out = resp.getBytes(UTF_8)
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.start()
    def host: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def linksDs: org.apache.spark.sql.Dataset[DependencyLink] = {
    import spark.implicits._
    Seq(
      DependencyLink("frontend", "backend", 2L, 1L),
      DependencyLink("backend", "db", 1L, 0L)).toDS().coalesce(1)
  }

  test("bulk write: daily index name, id=parent|child upsert action, reference doc shape") {
    val es = new Recorder()
    try {
      val conf = EsFlavor.EsConf("zipkin", Seq(es.host), None, None, nodesWanOnly = false)
      EsBulkSink.writeLinks(linksDs, "2025-08-11", conf)
      assert(es.requests.size == 1)
      val (method, path, _, body) = es.requests.peek()
      assert(method == "POST" && path == "/_bulk")
      val lines = body.trim.split("\n").toSeq
      assert(lines.size == 4) // action+doc per link
      assert(lines(0) == """{"index":{"_index":"zipkin-dependency-2025-08-11","_id":"frontend|backend"}}""")
      assert(lines(1) == """{"id":"frontend|backend","parent":"frontend","child":"backend","callCount":2,"errorCount":1}""")
      assert(lines(2) == """{"index":{"_index":"zipkin-dependency-2025-08-11","_id":"backend|db"}}""")
      assert(lines(3) == """{"id":"backend|db","parent":"backend","child":"db","callCount":1,"errorCount":0}""")
    } finally es.stop()
  }

  test("basic auth header matches the reference's Basic base64(user:pass)") {
    val es = new Recorder()
    try {
      val conf = EsFlavor.EsConf("zipkin", Seq(es.host), Some("foo"), Some("bar"), nodesWanOnly = false)
      EsBulkSink.writeLinks(linksDs, "2025-08-11", conf)
      val (_, _, auth, _) = es.requests.peek()
      val encoded = java.util.Base64.getEncoder.encodeToString("foo:bar".getBytes(UTF_8))
      assert(auth == s"Basic $encoded")
    } finally es.stop()
  }

  test("service names with quotes/backslashes/control chars stay valid JSON") {
    val lines = EsBulkSink.bulkLines("zipkin-dependency-2025-08-11",
      "svc\"quoted\\", "child\ttabbed", 1L, 0L).trim.split("\n")
    // both lines must parse as JSON and round-trip the raw names
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val action = mapper.readTree(lines(0))
    val doc = mapper.readTree(lines(1))
    assert(action.get("index").get("_id").asText() == "svc\"quoted\\|child\ttabbed")
    assert(doc.get("parent").asText() == "svc\"quoted\\")
    assert(doc.get("child").asText() == "child\ttabbed")
  }

  test("ES_DATE_SEPARATOR rewrites the daily index date stamp") {
    assert(EsBulkSink.indexName("zipkin", "2025-08-11", ".") == "zipkin-dependency-2025.08.11")
    assert(EsBulkSink.indexName("zipkin", "2025-08-11", "") == "zipkin-dependency-20250811")
  }

  test("host failover: unreachable first host falls through to the live one") {
    val es = new Recorder()
    try {
      // port 1 refuses connections; the write must land on the second host
      val conf = EsFlavor.EsConf("zipkin", Seq("http://127.0.0.1:1", es.host), None, None, false)
      EsBulkSink.writeLinks(linksDs, "2025-08-11", conf)
      assert(es.requests.size == 1)
    } finally es.stop()
  }

  test("bulk response with errors:true fails loudly; all-hosts-down fails loudly") {
    val es = new Recorder(response = """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}""")
    try {
      val conf = EsFlavor.EsConf("zipkin", Seq(es.host), None, None, false)
      val e = intercept[org.apache.spark.SparkException] {
        EsBulkSink.writeLinks(linksDs, "2025-08-11", conf, retries = 1, backoffMs = 10L)
      }
      assert(Option(e.getCause).map(_.toString).getOrElse(e.getMessage).contains("item errors"))
      // the bounded retry replayed the batch exactly retries+1 times
      assert(es.requests.size == 2)
      val down = EsFlavor.EsConf("zipkin", Seq("http://127.0.0.1:1"), None, None, false)
      val e2 = intercept[org.apache.spark.SparkException] {
        EsBulkSink.writeLinks(linksDs, "2025-08-11", down, retries = 0)
      }
      assert(Option(e2.getCause).map(_.toString).getOrElse(e2.getMessage).contains("every host"))
    } finally es.stop()
  }

  test("transient item-level 429 clears on the in-task retry; batch replay is idempotent") {
    // first bulk POST is rejected with the backpressure shape, the retry
    // succeeds — safe to replay because every action is an _id-keyed upsert
    val es = new Recorder(failFirst = 1)
    try {
      val conf = EsFlavor.EsConf("zipkin", Seq(es.host), None, None, false)
      EsBulkSink.writeLinks(linksDs, "2025-08-11", conf, retries = 2, backoffMs = 10L)
      assert(es.requests.size == 2) // reject + successful replay, then stop
      val (_, _, _, body) = es.requests.toArray.last.asInstanceOf[(String, String, String, String)]
      assert(body.contains(""""_id":"frontend|backend"""") && body.contains(""""_id":"backend|db""""))
    } finally es.stop()
  }

  test("EsConf.timeoutMs reaches the transport: a slow cluster fails under a small timeout, succeeds under a larger one") {
    val es = new Recorder(delayMs = 600L)
    try {
      // ES_TIMEOUT=150 → the 600 ms response exceeds the request timeout on
      // the transport the sink constructs, so the write fails loudly
      val tight = EsFlavor.esConf(Map("ES_HOSTS" -> es.host, "ES_TIMEOUT" -> "150"))
      val e = intercept[org.apache.spark.SparkException] {
        EsBulkSink.writeLinks(linksDs, "2025-08-11", tight, retries = 0)
      }
      assert(Option(e.getCause).map(_.toString).getOrElse(e.getMessage).contains("every host"))
      // same cluster, roomier timeout: the identical write goes through
      val roomy = EsFlavor.esConf(Map("ES_HOSTS" -> es.host, "ES_TIMEOUT" -> "5000"))
      EsBulkSink.writeLinks(linksDs, "2025-08-11", roomy)
    } finally es.stop()
  }

  test("flavor probe over the live transport: opensearch distribution detected") {
    val es = new Recorder(
      response = """{"version":{"number":"2.11.0","distribution":"opensearch"}}""")
    try {
      val transport = new EsHttpTransport()
      val hostPort = es.host.stripPrefix("http://")
      assert(EsFlavor.flavor(hostPort, url => transport.get(url)) == "opensearch")
      // unreachable host then no-distribution body -> default elasticsearch
      assert(EsFlavor.flavor("127.0.0.1:1", url => transport.get(url)) == "elasticsearch")
    } finally es.stop()
  }
}
