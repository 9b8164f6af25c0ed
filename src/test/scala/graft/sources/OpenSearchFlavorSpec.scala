package graft.sources

import graft.pipeline.{Admission, LinkJob, SparkTestSession}
import graft.util.{EsFlavor, EsHttpTransport}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** The OpenSearch backend variant, driven live end-to-end: one scripted
  * server that answers the root `"distribution"` probe the way OpenSearch
  * does (ZipkinElasticsearchStorage.java:77-128 — ES has no distribution
  * field, OS reports `version.distribution: "opensearch"`), then serves the
  * SAME scroll/_bulk API the ES path uses. Pins that the flavor sniff runs
  * over the real EsHttpTransport and that source + sink work unchanged
  * against an OS-flavored cluster — the reference's opensearch STORAGE_TYPE
  * maps to the same job for the same reason. */
class OpenSearchFlavorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def spanDoc(traceId: String, id: String, parentId: Option[String],
      kind: String, ts: Long, local: String, remote: Option[String]): String = {
    val parent = parentId.map(p => s""""parentId":"$p",""").getOrElse("")
    val rem = remote.map(r => s""","remoteEndpoint":{"serviceName":"$r"}""").getOrElse("")
    s"""{"traceId":"$traceId",$parent"id":"$id","kind":"$kind","timestamp":$ts,""" +
      s""""localEndpoint":{"serviceName":"$local"}$rem}"""
  }

  /** OpenSearch 2.x root-info shape (the probe target) + scroll + _bulk. */
  private final class ScriptedOpenSearch(index: String, docs: Seq[String]) {
    val bulkBodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val rootProbes = new java.util.concurrent.atomic.AtomicInteger(0)
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val path = ex.getRequestURI.getPath
      val out: Option[Array[Byte]] =
        if (path == "/" && ex.getRequestMethod == "GET") {
          rootProbes.incrementAndGet()
          Some(("""{"name":"node-1","cluster_name":"opensearch","version":{""" +
            """"distribution":"opensearch","number":"2.11.0",""" +
            """"build_type":"tar"},"tagline":"The OpenSearch Project"}""").getBytes(UTF_8))
        } else if (path == s"/$index/_search") {
          val hits = docs.map(d => s"""{"_id":"x","_source":$d}""").mkString(",")
          Some(s"""{"_scroll_id":"os-1","hits":{"hits":[$hits]}}""".getBytes(UTF_8))
        } else if (path == "/_search/scroll" && ex.getRequestMethod == "DELETE") {
          Some("""{"succeeded":true}""".getBytes(UTF_8))
        } else if (path == "/_search/scroll") {
          Some("""{"_scroll_id":"os-2","hits":{"hits":[]}}""".getBytes(UTF_8))
        } else if (path.endsWith("/_bulk")) {
          bulkBodies.add(body)
          Some("""{"took":3,"errors":false,"items":[]}""".getBytes(UTF_8))
        } else None
      out match {
        case Some(bytes) =>
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    def hostsCsv: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def conf: EsFlavor.EsConf =
      EsFlavor.EsConf("zipkin", Seq(hostsCsv), None, None, false)
    def stop(): Unit = server.stop(0)
  }

  test("flavor sniff over the live transport: OS distribution detected, ES default otherwise") {
    val ts = 1754870400000000L
    val os = new ScriptedOpenSearch("zipkin-span-2025-08-11",
      Seq(spanDoc("00000000000000aa", "0000000000000001", None, "CLIENT", ts,
        "frontend", Some("backend"))))
    try {
      val transport = new EsHttpTransport()
      assert(EsFlavor.flavor(os.hostsCsv, transport.get) == "opensearch")
      assert(os.rootProbes.get() >= 1) // the probe really hit the wire
      // unreachable host falls through to the next; none answering → ES
      val dead = "http://127.0.0.1:1," + os.hostsCsv
      assert(EsFlavor.flavor(dead, transport.get) == "opensearch")
      assert(EsFlavor.flavor("http://127.0.0.1:1", transport.get) == "elasticsearch")
    } finally os.stop()
  }

  test("read + link + bulk write-back against the OS-flavored server, unchanged code path") {
    val ts = 1754870400000000L
    val docs = Seq(
      spanDoc("00000000000000aa", "0000000000000001", None, "CLIENT", ts,
        "frontend", Some("backend")),
      spanDoc("00000000000000aa", "0000000000000002", Some("0000000000000001"),
        "SERVER", ts + 1, "backend", None))
    val os = new ScriptedOpenSearch("zipkin-span-2025-08-11", docs)
    try {
      import spark.implicits._
      val cfg = EsSpanSource.ScrollConfig(os.conf, slices = 1, pageSize = 10)
      val links = LinkJob.linkSpans(
        EsSpanSource.readDay(spark, cfg, "2025-08-11"), "2025-08-11", Admission.IndexDay)
        .persist()
      assert(links.as[(String, String, Long, Long)].collect().toSet ==
        Set(("frontend", "backend", 1L, 0L)))
      graft.sinks.EsBulkSink.writeLinks(links, "2025-08-11", os.conf)
      links.unpersist()
      val bulk = new java.util.ArrayList(os.bulkBodies)
      assert(bulk.size == 1)
      val body = bulk.get(0)
      // the reference's id scheme: _id = parent|child into the daily index
      assert(body.contains(""""_index":"zipkin-dependency-2025-08-11""""), body)
      assert(body.contains(""""_id":"frontend|backend""""), body)
      assert(body.contains(""""callCount":1"""), body)
    } finally os.stop()
  }
}
