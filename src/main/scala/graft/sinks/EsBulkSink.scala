package graft.sinks

import graft.model.DependencyLink
import graft.util.{EsFlavor, EsHttpTransport}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Live Elasticsearch/OpenSearch sink for dependency links: the bulk-upsert
  * semantics of the reference's es-hadoop save
  * (ElasticsearchDependenciesJob.java:198-221) over the JDK HTTP transport.
  *
  *  - one doc per link in the reference's exact field order
  *    (DEPENDENCY_LINK_JSON: id, parent, child, callCount, errorCount) with
  *    deterministic `_id = parent|child`, so re-running a day OVERWRITES the
  *    prior run's value instead of duplicating (the es.mapping.id=id trick);
  *  - daily index `<prefix>-dependency-<dateStamp>` with ES_DATE_SEPARATOR
  *    honored (job ctor :152-155);
  *  - distributed write: `foreachPartition`, one transport per executor
  *    partition, docs batched into `_bulk` ndjson bodies — at cluster scale
  *    each executor streams its own partitions, no driver collect. The links
  *    frame is |services|² rows, so batches are small; the shape still
  *    matters because it is the same code path a span-scale sink would use;
  *  - host failover: each batch tries the configured hosts in order and
  *    fails loudly when none accepts — and a bulk response with
  *    `"errors":true` is an error (a silently dropped link is a wrong
  *    dependency graph, not a degraded one).
  */
object EsBulkSink {

  /** `zipkin` + 2025-08-11 + "-" → `zipkin-dependency-2025-08-11` — the
    * reference's daily link index (run() :173-174), with the date separator
    * rewrite of ES_DATE_SEPARATOR (ctor :152-155). */
  def indexName(prefix: String, day: String, dateSeparator: String = "-"): String =
    s"$prefix-dependency-${day.replace("-", dateSeparator)}"

  /** Minimal JSON string escape for service names (quotes, backslashes,
    * control characters — everything else passes through verbatim). */
  private[sinks] def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** One link → its two `_bulk` ndjson lines: the `index` action (index +
    * deterministic id) and the document source. */
  private[sinks] def bulkLines(
      index: String, parent: String, child: String,
      callCount: Long, errorCount: Long): String = {
    val id = jsonEscape(s"$parent|$child")
    s"""{"index":{"_index":"${jsonEscape(index)}","_id":"$id"}}""" + "\n" +
      s"""{"id":"$id","parent":"${jsonEscape(parent)}","child":"${jsonEscape(child)}","callCount":$callCount,"errorCount":$errorCount}""" + "\n"
  }

  /** POST one bulk body with bounded in-task retries (linear backoff): a
    * pass tries hosts in order; a pass fails when every host refuses OR the
    * accepted response reports item-level errors — the most common of which
    * is per-item 429 (es_rejected_execution, bulk-queue backpressure), which
    * a moment's backoff usually clears. Replaying the WHOLE batch is safe
    * because every action is an `_id`-keyed index (idempotent upsert);
    * exhausted retries still fail loudly — a silently dropped link is a
    * wrong dependency graph, not a degraded one. */
  private[sinks] def postBulk(
      transport: EsHttpTransport, hosts: Seq[String], body: String,
      retries: Int = 2, backoffMs: Long = 200L): Unit = {
    def onePass(): Option[String] = { // Some(error) | None = success
      val outcome = hosts.iterator.map(h => h -> transport.post(s"$h/_bulk", body))
        .collectFirst { case (h, Right(resp)) => (h, resp) }
      outcome match {
        case None =>
          Some(s"ES bulk write failed on every host: ${hosts.mkString(", ")}")
        case Some((host, resp)) if resp.replaceAll("\\s", "").contains("\"errors\":true") =>
          Some(s"ES bulk response from $host reports item errors: ${resp.take(500)}")
        case _ => None
      }
    }
    var last = onePass()
    var attempt = 0
    while (last.isDefined && attempt < retries) {
      attempt += 1
      Thread.sleep(backoffMs * attempt)
      last = onePass()
    }
    last.foreach(err => throw new java.io.IOException(
      s"$err (after ${attempt + 1} attempts)"))
  }

  /** Write one day of links to the daily index. `conf.hosts` come from
    * [[EsFlavor.parseHosts]] (`scheme://host:port`). */
  def writeLinks(
      links: Dataset[DependencyLink], day: String, conf: EsFlavor.EsConf,
      dateSeparator: String = "-", batchSize: Int = 500,
      retries: Int = 2, backoffMs: Long = 200L): Unit = {
    require(batchSize > 0, "batchSize must be positive")
    val index = indexName(conf.index, day, dateSeparator)
    val hosts = conf.hosts
    val (user, pass) = (conf.username, conf.password)
    val timeoutMs = conf.timeoutMs
    val dbg = conf.debug
    links.select(col("parent"), col("child"), col("callCount"), col("errorCount"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val transport = new EsHttpTransport(user, pass, timeoutMs, debug = dbg)
          rows.grouped(batchSize).foreach { batch =>
            val body = batch.map(r => bulkLines(index,
              r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).mkString
            postBulk(transport, hosts, body, retries, backoffMs)
          }
        }
      }
  }
}
