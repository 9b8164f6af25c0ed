package graft.sources

import graft.model.Span
import graft.pipeline.LinkJob
import graft.util.{EsFlavor, EsHttpTransport}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Live Elasticsearch/OpenSearch span source: the read half of the
  * reference's ES backend (ElasticsearchDependenciesJob.java:180 reads the
  * daily `<index>-span-<date>` index as JSON docs through es-hadoop), over
  * the same JDK HTTP transport as [[graft.sinks.EsBulkSink]].
  *
  * Parallel read model: the sliced scroll API — slice s of N sees a
  * disjoint 1/N of the index, so N Spark tasks stream N independent
  * scrolls concurrently; that is exactly how es-hadoop maps shards to
  * Spark partitions, expressed in plain `_search` calls. Each task owns
  * one slice end-to-end (open → page → clear), so a 1000-executor cluster
  * drains a day at `slices`-way parallelism with no driver involvement
  * beyond the tiny slice-id range.
  *
  * Semantics parity:
  *  - missing day index ⇒ EMPTY dataset, not a failure (the reference sets
  *    ES_INDEX_READ_MISSING_AS_EMPTY=true, job builder :66) — a 404 on the
  *    initial search is "no spans today";
  *  - hit `_source` documents are Zipkin JSON v2 spans and flow through the
  *    same permissive decode as the file-backed path
  *    (`LinkJob.fromJsonV2Shape` via the shared schema) — corrupt docs drop;
  *  - index naming honors ES_DATE_SEPARATOR like the sink.
  */
object EsSpanSource {

  /** `zipkin` + 2025-08-11 → `zipkin-span-2025-08-11` (run() :173). */
  def spanIndex(prefix: String, day: String, dateSeparator: String = "-"): String =
    s"$prefix-span-${day.replace("-", dateSeparator)}"

  /** Scroll-read knobs. `slices` is the read parallelism (ES requires
    * max > 1 for the slice parameter; 1 = plain un-sliced scroll).
    * `continuationRetries` bounds in-task retries of a failed scroll
    * continuation POST before surfacing the IOException: without it one
    * transient 429 makes Spark's task retry re-read the whole slice. */
  final case class ScrollConfig(
      conf: EsFlavor.EsConf,
      slices: Int = 8,
      pageSize: Int = 1000,
      scrollTtl: String = "5m",
      dateSeparator: String = "-",
      continuationRetries: Int = 2,
      retryBackoffMs: Long = 200L)

  /** Initial sliced-search body. `"sort":["_doc"]` is ES's documented
    * no-scoring scroll path — hits stream in index order with relevance
    * scoring skipped entirely. */
  private[sources] def searchBody(sliceId: Int, maxSlices: Int, pageSize: Int): String = {
    val slice = if (maxSlices > 1) s""""slice":{"id":$sliceId,"max":$maxSlices},""" else ""
    s"""{${slice}"size":$pageSize,"sort":["_doc"],"query":{"match_all":{}}}"""
  }

  private[sources] def continueBody(scrollTtl: String, scrollId: String): String =
    s"""{"scroll":"$scrollTtl","scroll_id":"$scrollId"}"""

  // one mapper per JVM, not per page: ObjectMapper is thread-safe for reads
  // once constructed, and a slice can turn over thousands of pages
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Pull `_scroll_id` and the raw `_source` JSON of every hit out of a
    * search/scroll response — Jackson (shipped with Spark) rather than a
    * regex, because `_source` is a nested object. */
  private[sources] def parsePage(resp: String): (Option[String], Seq[String]) = {
    val root = mapper.readTree(resp)
    val scrollId = Option(root.get("_scroll_id")).map(_.asText())
    val hits = Option(root.get("hits")).flatMap(h => Option(h.get("hits")))
    val sources = hits match {
      case Some(arr) if arr.isArray =>
        (0 until arr.size()).flatMap(i =>
          Option(arr.get(i).get("_source")).map(_.toString))
      case _ => Seq.empty
    }
    (scrollId, sources)
  }

  /** Is a failed continuation POST safe to re-send? A scroll continuation is
    * NOT idempotent: the server advances the cursor when it serves a page,
    * so re-POSTing the same scroll_id after a failure where the page may
    * already have been served returns the NEXT page and silently drops the
    * lost one. Only failures where the server definitively did no work are
    * retryable in-task:
    *  - connect-level failures (the TCP connection was never established),
    *  - explicit rejection statuses 429/503 (the server answered "not now"
    *    without executing the search).
    * Everything else — request timeouts, mid-response resets, other HTTP
    * statuses — is ambiguous: the page may be gone from the cursor, so the
    * failure must propagate and let Spark's task retry re-read the whole
    * slice from a FRESH scroll (wasteful but lossless). The transport
    * renders failures as "HTTP <code>: …" or "<ExceptionClass>: …". */
  private[sources] def retrySafe(msg: String): Boolean =
    msg.startsWith("HTTP 429") || msg.startsWith("HTTP 503") ||
      msg.startsWith("ConnectException") || msg.startsWith("HttpConnectTimeoutException")

  /** POST with a bounded in-task retry (linear backoff) of [[retrySafe]]
    * failures only: a transient 429 / connect blip on a scroll continuation
    * would otherwise bubble an IOException that makes Spark re-run the task
    * and re-read the WHOLE slice from the start — correct, but wasteful at
    * scale. Ambiguous failures return immediately as Left so the caller
    * throws and the task-level retry (fresh scroll) keeps the read lossless. */
  private[sources] def postWithRetry(
      transport: EsHttpTransport, url: String, body: String,
      retries: Int, backoffMs: Long): Either[String, String] = {
    var last: Either[String, String] = transport.post(url, body, "application/json")
    var attempt = 0
    while (last.left.exists(retrySafe) && attempt < retries) {
      attempt += 1
      Thread.sleep(backoffMs * attempt)
      last = transport.post(url, body, "application/json")
    }
    last
  }

  /** Stream every `_source` of one slice: open the scroll on the first host
    * that answers, page until empty, then best-effort clear. A 404 on the
    * open means the day's index does not exist ⇒ empty. */
  private[sources] def scrollSlice(
      transport: EsHttpTransport, hosts: Seq[String], index: String,
      sliceId: Int, cfg: ScrollConfig): Iterator[String] = {
    val open = hosts.iterator
      .map(h => h -> transport.post(
        s"$h/$index/_search?scroll=${cfg.scrollTtl}",
        searchBody(sliceId, cfg.slices, cfg.pageSize), "application/json"))
      .collectFirst { case (h, r @ Right(_)) => h -> r
                      case (h, l @ Left(msg)) if msg.startsWith("HTTP 404") => h -> l }
    open match {
      case None => throw new java.io.IOException(
        s"ES scroll open failed on every host: ${hosts.mkString(", ")}")
      case Some((_, Left(_))) => Iterator.empty // 404: missing day index
      case Some((host, Right(first))) =>
        new Iterator[Seq[String]] {
          private var page = parsePage(first)
          private var exhausted = false
          if (page._2.isEmpty) finish() // index exists but slice is empty
          override def hasNext: Boolean = !exhausted
          override def next(): Seq[String] = {
            val out = page._2
            page._1 match {
              case Some(sid) =>
                postWithRetry(transport, s"$host/_search/scroll",
                  continueBody(cfg.scrollTtl, sid),
                  cfg.continuationRetries, cfg.retryBackoffMs) match {
                  case Right(resp) =>
                    page = parsePage(resp)
                    if (page._2.isEmpty) finish()
                  case Left(msg) => throw new java.io.IOException(
                    s"ES scroll continuation failed on $host (" +
                      (if (retrySafe(msg)) s"retries exhausted after ${cfg.continuationRetries + 1} attempts"
                       else "non-retryable: the server may already have served this page") +
                      s"): $msg")
                }
              case None => finish()
            }
            out
          }
          private def finish(): Unit = {
            exhausted = true
            // free the server-side scroll context now rather than letting it
            // pin ES heap until the TTL expires; best-effort by contract
            page._1.foreach(sid => transport.delete(
              s"$host/_search/scroll", s"""{"scroll_id":"$sid"}"""))
          }
        }.flatten
    }
  }

  /** One day of spans, read live at `slices`-way parallelism and decoded
    * through the shared normalization path. */
  def readDay(spark: SparkSession, cfg: ScrollConfig, day: String): Dataset[Span] = {
    val index = spanIndex(cfg.conf.index, day, cfg.dateSeparator)
    val hosts = cfg.conf.hosts
    val (user, pass) = (cfg.conf.username, cfg.conf.password)
    val timeoutMs = cfg.conf.timeoutMs
    val dbg = cfg.conf.debug
    val cfgB = cfg // stable reference for the closure
    // one slice id per partition, placed at the source (no shuffle; a
    // repartition(n) would hash-bucket ids and leave some tasks 2 slices
    // and others none)
    val raw: Dataset[String] = spark.range(0L, cfg.slices.toLong, 1L, cfg.slices)
      .mapPartitions { ids =>
        val transport = new EsHttpTransport(user, pass, timeoutMs, debug = dbg)
        ids.flatMap(id => scrollSlice(transport, hosts, index, id.toInt, cfgB))
      }(Encoders.STRING)
    LinkJob.fromJsonV2Shape(spark.read.schema(Span.jsonV2Schema).json(raw))
  }
}
