package graft.sinks

import graft.model.DependencyLink
import graft.sources.CassandraV3Source
import graft.sources.CassandraV3Source.CassandraV3Config
import org.apache.spark.sql.{Dataset, Row}

/** Live Cassandra sink for dependency links — the write half of the
  * `cassandra3` backend, completing read+write parity with ES (EsBulkSink)
  * over the same in-house CQL transport ([[graft.sources.CqlClient]]).
  *
  * The reference saves links with
  * `INSERT INTO <keyspace>.dependency (day,parent,child,calls,errors)`
  * (CassandraDependenciesJob.java:193-209), binding `errors` only when the
  * count is positive so a zero stays an unset (null) cell; the table's
  * primary key is (day, parent, child), so a re-run of the same day
  * OVERWRITES the prior run's value — C* upsert semantics give day-level
  * idempotence for free, same as the ES `_id = parent|child` trick.
  *
  * Two deliberate departures from the reference, both scale-side:
  *  - the reference `collect()`s the links to the driver and writes them
  *    serially through one session; this sink writes from the executors
  *    (`foreachPartition`, one connection per non-empty partition) — links
  *    are |services|² rows so either works at zipkin scale, but this is the
  *    shape a span-scale sink needs and the same pattern EsBulkSink set;
  *  - values are rendered as CQL literals instead of a prepared statement —
  *    this client deliberately has no PREPARE/EXECUTE surface
  *    (CqlTransport.scala scope note), and a per-day link write is far from
  *    any statement-cache pressure that would justify one.
  */
object CqlLinkSink {

  /** Single-quote CQL string literal; embedded quotes double ('' — CQL's
    * only string escape). */
  private[sinks] def cqlString(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** One link → its literal INSERT. `day` renders as a 'yyyy-MM-dd' date
    * literal; `errors` is OMITTED (not 0) when the count is zero, matching
    * the reference's unset bind (CassandraDependenciesJob.java:206).
    * Caveat that parity carries: a CQL unset column does NOT overwrite, so
    * re-running a day whose error count dropped to zero leaves the prior
    * run's positive `errors` cell in place — day-level idempotence is
    * exact for calls and keys but not for a disappearing error count
    * (writing errors=null instead would tombstone it; the reference
    * accepts the stale cell and so does this sink). */
  private[sinks] def insertCql(keyspace: String, day: String,
      parent: String, child: String, calls: Long, errors: Long): String = {
    val (cols, vals) =
      if (errors > 0L) (",errors", s",$errors") else ("", "")
    s"INSERT INTO $keyspace.dependency (day,parent,child,calls$cols)" +
      s" VALUES ('$day',${cqlString(parent)},${cqlString(child)},$calls$vals)"
  }

  /** Write one day's links. Each non-empty partition opens one connection
    * (contact points tried in order, like the read path) and issues its
    * INSERTs sequentially; any CQL error or transport failure throws and
    * fails the task — a silently dropped link is a wrong dependency graph. */
  def writeLinks(links: Dataset[DependencyLink], day: String,
      cfg: CassandraV3Config): Unit = {
    val points = CassandraV3Source.contactPointList(cfg.contactPoints)
    require(points.nonEmpty, "CASSANDRA_CONTACT_POINTS must name at least one host")
    val keyspace = cfg.keyspace
    links.toDF().select("parent", "child", "callCount", "errorCount")
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val client = CassandraV3Source.connectAny(points, cfg)
          try it.foreach { r =>
            client.query(
              insertCql(keyspace, day, r.getString(0), r.getString(1),
                r.getLong(2), r.getLong(3)),
              pageSize = 1)
          } finally client.close()
        }
      }
  }
}
