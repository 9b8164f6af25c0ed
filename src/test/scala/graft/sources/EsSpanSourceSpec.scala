package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.pipeline.{Admission, LinkJob, SparkTestSession}
import graft.util.EsFlavor
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Scripted-cluster spec for the sliced-scroll span source: an embedded
  * HTTP server plays the ES search/scroll protocol so slice fan-out,
  * pagination, missing-index and decode semantics are all pinned without a
  * live cluster. */
class EsSpanSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def spanDoc(traceId: String, id: String, parentId: Option[String],
      kind: String, ts: Long, local: String, remote: Option[String]): String = {
    val parent = parentId.map(p => s""""parentId":"$p",""").getOrElse("")
    val rem = remote.map(r => s""","remoteEndpoint":{"serviceName":"$r"}""").getOrElse("")
    s"""{"traceId":"$traceId",$parent"id":"$id","kind":"$kind","timestamp":$ts,""" +
      s""""localEndpoint":{"serviceName":"$local"}$rem}"""
  }

  private def page(scrollId: String, docs: Seq[String]): String =
    s"""{"_scroll_id":"$scrollId","hits":{"hits":[${
      docs.map(d => s"""{"_id":"x","_source":$d}""").mkString(",")}]}}"""

  /** Plays: initial search per slice → page 1; one continuation → page 2;
    * next continuation → empty page. Unknown index → 404. The first
    * `failContinuations` scroll continuations answer `failStatus` (429 by
    * default — then succeed on retry) to pin the bounded in-task retry and,
    * with an ambiguous status like 500, the no-retry path. */
  private final class ScriptedEs(index: String, pages: Map[Int, Seq[Seq[String]]],
      failContinuations: Int = 0, failStatus: Int = 429) {
    val cleared = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val searchBodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val failsLeft = new java.util.concurrent.atomic.AtomicInteger(failContinuations)
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val path = ex.getRequestURI.getPath
        val out: Array[Byte] =
          if (path == "/_search/scroll" && ex.getRequestMethod == "DELETE") {
            """"scroll_id":"([^"]+)"""".r.findFirstMatchIn(body)
              .foreach(m => cleared.add(m.group(1)))
            """{"succeeded":true}""".getBytes(UTF_8)
          } else if (path == s"/$index/_search") {
            searchBodies.add(body)
            val slice = """"slice":\{"id":(\d+)""".r.findFirstMatchIn(body)
              .map(_.group(1).toInt).getOrElse(0)
            page(s"scroll-$slice-1", pages(slice).head).getBytes(UTF_8)
          } else if (path == "/_search/scroll" && failsLeft.getAndDecrement() > 0) {
            ex.sendResponseHeaders(failStatus, -1); ex.close(); return
          } else if (path == "/_search/scroll") {
            val m = """"scroll_id":"scroll-(\d+)-(\d+)"""".r.findFirstMatchIn(body).get
            val (slice, pageNo) = (m.group(1).toInt, m.group(2).toInt)
            val remaining = pages(slice).drop(pageNo)
            val docs = if (remaining.isEmpty) Seq.empty else remaining.head
            page(s"scroll-$slice-${pageNo + 1}", docs).getBytes(UTF_8)
          } else {
            ex.sendResponseHeaders(404, -1); ex.close(); return
          }
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.start()
    def conf: EsFlavor.EsConf = EsFlavor.EsConf(
      "zipkin", Seq(s"http://127.0.0.1:${server.getAddress.getPort}"), None, None, false)
    def stop(): Unit = server.stop(0)
  }

  test("spanIndex / searchBody / parsePage pure pieces") {
    assert(EsSpanSource.spanIndex("zipkin", "2025-08-11") == "zipkin-span-2025-08-11")
    assert(EsSpanSource.spanIndex("zipkin", "2025-08-11", ".") == "zipkin-span-2025.08.11")
    assert(EsSpanSource.searchBody(2, 4, 100) ==
      """{"slice":{"id":2,"max":4},"size":100,"sort":["_doc"],"query":{"match_all":{}}}""")
    assert(EsSpanSource.searchBody(0, 1, 100) ==
      """{"size":100,"sort":["_doc"],"query":{"match_all":{}}}""") // un-sliced when max=1
    val (sid, docs) = EsSpanSource.parsePage(
      page("abc", Seq("""{"traceId":"aa","id":"01"}""")))
    assert(sid.contains("abc") && docs == Seq("""{"traceId":"aa","id":"01"}"""))
    assert(EsSpanSource.parsePage("""{"hits":{"hits":[]}}""") == ((None, Seq.empty)))
  }

  test("sliced scroll read: all slices, all pages, decoded through the shared path") {
    val ts = 1754870400000000L
    val client = spanDoc("00000000000000aa", "0000000000000001", None, "CLIENT", ts, "frontend", Some("backend"))
    val server0 = spanDoc("00000000000000aa", "0000000000000002", Some("0000000000000001"), "SERVER", ts + 1, "backend", None)
    val other = spanDoc("00000000000000bb", "0000000000000003", None, "CLIENT", ts + 2, "web", Some("db"))
    val es = new ScriptedEs("zipkin-span-2025-08-11", Map(
      0 -> Seq(Seq(client), Seq(server0)), // slice 0: two pages
      1 -> Seq(Seq(other)))) // slice 1: one page
    try {
      val cfg = EsSpanSource.ScrollConfig(es.conf, slices = 2, pageSize = 10)
      val ds = EsSpanSource.readDay(spark, cfg, "2025-08-11")
      // scale contract: read parallelism == slices, one scroll per task
      assert(ds.rdd.getNumPartitions == 2)
      val spans = ds.collect()
      assert(spans.map(_.id).toSet ==
        Set("0000000000000001", "0000000000000002", "0000000000000003"))
      // both slices' scroll contexts were cleared after exhaustion
      assert(es.cleared.size == 2)
      // every initial search asked for the no-scoring scroll path
      assert(es.searchBodies.size == 2)
      es.searchBodies.forEach(b => assert(b.contains(""""sort":["_doc"]"""), b))
      import spark.implicits._
      val links = LinkJob.linkSpans(
        EsSpanSource.readDay(spark, cfg, "2025-08-11"), "2025-08-11", Admission.IndexDay)
        .as[(String, String, Long, Long)].collect().toSet
      assert(links == Set(("frontend", "backend", 1L, 0L), ("web", "db", 1L, 0L)))
    } finally es.stop()
  }

  test("transient continuation failure is retried in-task, links unchanged") {
    val ts = 1754870400000000L
    val client = spanDoc("00000000000000aa", "0000000000000001", None, "CLIENT", ts, "frontend", Some("backend"))
    val server0 = spanDoc("00000000000000aa", "0000000000000002", Some("0000000000000001"), "SERVER", ts + 1, "backend", None)
    // two pages on one slice forces a continuation; the scripted cluster
    // 429s the first continuation POST, so without the bounded in-task
    // retry the read would surface an IOException (Spark would then retry
    // the whole task — correct but the waste this retry exists to avoid)
    val es = new ScriptedEs("zipkin-span-2025-08-11",
      Map(0 -> Seq(Seq(client), Seq(server0))), failContinuations = 1)
    try {
      val cfg = EsSpanSource.ScrollConfig(es.conf, slices = 1, pageSize = 1,
        continuationRetries = 2, retryBackoffMs = 10L)
      import spark.implicits._
      val links = LinkJob.linkSpans(
        EsSpanSource.readDay(spark, cfg, "2025-08-11"), "2025-08-11", Admission.IndexDay)
        .as[(String, String, Long, Long)].collect().toSet
      assert(links == Set(("frontend", "backend", 1L, 0L)))
    } finally es.stop()
  }

  test("exhausted retries surface as an IOException, not silent truncation") {
    val ts = 1754870400000000L
    val client = spanDoc("00000000000000aa", "0000000000000001", None, "CLIENT", ts, "frontend", Some("backend"))
    val server0 = spanDoc("00000000000000aa", "0000000000000002", Some("0000000000000001"), "SERVER", ts + 1, "backend", None)
    val es = new ScriptedEs("zipkin-span-2025-08-11",
      Map(0 -> Seq(Seq(client), Seq(server0))), failContinuations = 10)
    try {
      val cfg = EsSpanSource.ScrollConfig(es.conf, slices = 1, pageSize = 1,
        continuationRetries = 1, retryBackoffMs = 10L)
      val e = intercept[Exception] {
        EsSpanSource.readDay(spark, cfg, "2025-08-11").collect()
      }
      // a dropped page would silently lose spans; the failure must propagate
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
      assert(msgs.contains("scroll continuation failed"), msgs)
    } finally es.stop()
  }

  test("retrySafe classifies definitive-no-work failures only") {
    // the server answered "not now" without executing — safe to re-send
    assert(EsSpanSource.retrySafe("HTTP 429: too many requests"))
    assert(EsSpanSource.retrySafe("HTTP 503: unavailable"))
    // the TCP connection was never established — no work happened
    assert(EsSpanSource.retrySafe("ConnectException: refused"))
    assert(EsSpanSource.retrySafe("HttpConnectTimeoutException: timed out"))
    // ambiguous: the server may have served the page (advancing the
    // forward-only cursor) before the failure — re-sending would skip it
    assert(!EsSpanSource.retrySafe("HttpTimeoutException: request timed out"))
    assert(!EsSpanSource.retrySafe("IOException: connection reset"))
    assert(!EsSpanSource.retrySafe("HTTP 500: internal error"))
    assert(!EsSpanSource.retrySafe("HTTP 502: bad gateway"))
  }

  test("ambiguous continuation failure propagates WITHOUT an in-task retry") {
    val ts = 1754870400000000L
    val client = spanDoc("00000000000000aa", "0000000000000001", None, "CLIENT", ts, "frontend", Some("backend"))
    val server0 = spanDoc("00000000000000aa", "0000000000000002", Some("0000000000000001"), "SERVER", ts + 1, "backend", None)
    // the continuation fails ONCE with 500; a (wrong) blind retry would
    // succeed and the read would complete — possibly having skipped the
    // page the cursor already advanced past. The safe behavior is to throw
    // so Spark's task retry re-reads the slice from a fresh scroll.
    val es = new ScriptedEs("zipkin-span-2025-08-11",
      Map(0 -> Seq(Seq(client), Seq(server0))), failContinuations = 1, failStatus = 500)
    try {
      val cfg = EsSpanSource.ScrollConfig(es.conf, slices = 1, pageSize = 1,
        continuationRetries = 5, retryBackoffMs = 10L)
      val e = intercept[Exception] {
        EsSpanSource.readDay(spark, cfg, "2025-08-11").collect()
      }
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
      assert(msgs.contains("scroll continuation failed"), msgs)
      assert(msgs.contains("HTTP 500"), msgs)
    } finally es.stop()
  }

  test("missing day index (404) is an empty dataset, not a failure") {
    val es = new ScriptedEs("zipkin-span-2025-08-11", Map.empty)
    try {
      val cfg = EsSpanSource.ScrollConfig(es.conf, slices = 2)
      assert(EsSpanSource.readDay(spark, cfg, "2025-08-12").isEmpty) // wrong day -> 404
    } finally es.stop()
  }
}
