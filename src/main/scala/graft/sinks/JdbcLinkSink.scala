package graft.sinks

import graft.model.DependencyLink
import org.apache.spark.sql.{Dataset, Row}

/** Live SQL sink for dependency links — the write half of the MySQL
  * backend, completing live read+write parity on the third and last
  * backend (ES and Cassandra each got theirs over in-house transports; SQL
  * needs none — java.sql ships with the JDK).
  *
  * The reference saves with
  * `REPLACE INTO zipkin_dependencies (day, parent, child, call_count,
  * error_count)` through a single driver-side connection
  * (mysql/.../MySQLDependenciesJob.java:241-255); REPLACE upserts on the
  * (day, parent, child) primary key, so a re-run of the same day
  * overwrites. This sink issues the same statement, but from the
  * executors — `foreachPartition`, one connection per non-empty partition,
  * the CqlLinkSink/EsBulkSink shape.
  *
  * `REPLACE INTO` is MySQL dialect. For ANSI databases (and the embedded
  * Derby the spec drives), the `standard` dialect gets the same day-level
  * idempotence as delete-day-then-insert: the one-time day delete runs on
  * the driver BEFORE the distributed inserts (executors must not race it),
  * and each executor row is its own keyed DELETE + INSERT in one
  * connection — NOT a bare INSERT, because a failed Spark task REPLAYS its
  * whole partition, and a replayed bare INSERT dies on the
  * (day, parent, child) primary key exactly where REPLACE would have
  * upserted. Per-row delete+insert keeps the standard dialect as
  * retry-safe as the mysql one (pinned by a replayed-partition test). */
object JdbcLinkSink {

  def replaceSql(table: String): String =
    s"REPLACE INTO $table (day, parent, child, call_count, error_count) VALUES (?,?,?,?,?)"

  def insertSql(table: String): String =
    s"INSERT INTO $table (day, parent, child, call_count, error_count) VALUES (?,?,?,?,?)"

  def deleteDaySql(table: String): String = s"DELETE FROM $table WHERE day = ?"

  def deleteRowSql(table: String): String =
    s"DELETE FROM $table WHERE day = ? AND parent = ? AND child = ?"

  /** Write one day's links. `dialect` = "mysql" (REPLACE INTO, the
    * reference's statement) or "standard" (driver-side day delete, then
    * plain INSERTs). Credentials ride in `properties` (user/password),
    * resolving from the same MYSQL_USER / MYSQL_PASS env surface as the
    * JDBC source. */
  def writeLinks(links: Dataset[DependencyLink], day: String, url: String,
      properties: Map[String, String] = Map.empty,
      table: String = "zipkin_dependencies",
      dialect: String = "mysql"): Unit = {
    require(dialect == "mysql" || dialect == "standard",
      s"unknown jdbc sink dialect '$dialect' (mysql|standard)")
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val sqlDay = java.sql.Date.valueOf(day)
    if (dialect == "standard") {
      // day-overwrite semantics without REPLACE: one driver-side delete
      // before any executor inserts
      val con = java.sql.DriverManager.getConnection(url, props)
      try {
        val del = con.prepareStatement(deleteDaySql(table))
        try { del.setDate(1, sqlDay); del.executeUpdate() } finally del.close()
      } finally con.close()
    }
    val mysql = dialect == "mysql"
    links.toDF().select("parent", "child", "callCount", "errorCount")
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val con = java.sql.DriverManager.getConnection(url, props)
          try writePartition(con, table, sqlDay, it, mysql)
          finally con.close()
        }
      }
  }

  /** One partition's rows through one connection — upsert semantics under
    * task REPLAY in both dialects (REPLACE, or keyed delete+insert). */
  private[sinks] def writePartition(con: java.sql.Connection, table: String,
      sqlDay: java.sql.Date, it: Iterator[Row], mysql: Boolean): Unit = {
    val ins = con.prepareStatement(if (mysql) replaceSql(table) else insertSql(table))
    val del = if (mysql) None else Some(con.prepareStatement(deleteRowSql(table)))
    try it.foreach { r =>
      del.foreach { d =>
        d.setDate(1, sqlDay); d.setString(2, r.getString(0))
        d.setString(3, r.getString(1)); d.executeUpdate()
      }
      ins.setDate(1, sqlDay)
      ins.setString(2, r.getString(0))
      ins.setString(3, r.getString(1))
      ins.setLong(4, r.getLong(2))
      ins.setLong(5, r.getLong(3))
      ins.executeUpdate()
    } finally { del.foreach(_.close()); ins.close() }
  }
}
