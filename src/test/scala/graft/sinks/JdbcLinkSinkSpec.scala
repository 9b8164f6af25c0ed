package graft.sinks

import graft.model.DependencyLink
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Live SQL link sink against embedded Derby (the standard dialect's
  * delete-then-insert path runs for real; the mysql dialect's REPLACE INTO
  * is statement-pinned — Derby has no REPLACE). */
class JdbcLinkSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def links(rows: (String, String, Long, Long)*) = {
    import spark.implicits._
    rows.map { case (p, c, n, e) => DependencyLink(p, c, n, e) }.toDS()
  }

  private def newDerby(): String = {
    val dir = java.nio.file.Files.createTempDirectory("derbylinks").toString
    val url = s"jdbc:derby:$dir/links;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE zipkin_dependencies (day DATE, parent VARCHAR(255), " +
        "child VARCHAR(255), call_count BIGINT, error_count BIGINT, " +
        "PRIMARY KEY (day, parent, child))")
    finally conn.close()
    url
  }

  private def readAll(url: String): Set[(String, String, String, Long, Long)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT day, parent, child, call_count, error_count FROM zipkin_dependencies")
      val b = Set.newBuilder[(String, String, String, Long, Long)]
      while (rs.next()) b += ((rs.getDate(1).toString, rs.getString(2),
        rs.getString(3), rs.getLong(4), rs.getLong(5)))
      b.result()
    } finally conn.close()
  }

  test("mysql dialect renders the reference's REPLACE statement verbatim") {
    assert(JdbcLinkSink.replaceSql("zipkin_dependencies") ==
      "REPLACE INTO zipkin_dependencies (day, parent, child, call_count, error_count) VALUES (?,?,?,?,?)")
  }

  test("standard dialect: distributed insert, and a re-run overwrites the day") {
    val url = newDerby()
    JdbcLinkSink.writeLinks(
      links(("frontend", "backend", 2L, 1L), ("backend", "db", 3L, 0L)),
      "2025-08-11", url, dialect = "standard")
    assert(readAll(url) == Set(
      ("2025-08-11", "frontend", "backend", 2L, 1L),
      ("2025-08-11", "backend", "db", 3L, 0L)))
    // re-running the same day with updated counts REPLACES, not duplicates
    JdbcLinkSink.writeLinks(
      links(("frontend", "backend", 5L, 2L)), "2025-08-11", url, dialect = "standard")
    assert(readAll(url) == Set(("2025-08-11", "frontend", "backend", 5L, 2L)))
    // a different day is untouched by the overwrite
    JdbcLinkSink.writeLinks(
      links(("x", "y", 1L, 0L)), "2025-08-12", url, dialect = "standard")
    assert(readAll(url).map(_._1) == Set("2025-08-11", "2025-08-12"))
  }

  test("standard dialect survives a replayed partition (task-retry idempotence)") {
    // a failed Spark task replays its whole partition with the day delete
    // NOT re-run; a bare INSERT would die on the primary key — the keyed
    // delete+insert must land exactly one row
    import org.apache.spark.sql.Row
    val url = newDerby()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rows = Seq(Row("frontend", "backend", 2L, 1L))
      JdbcLinkSink.writePartition(conn, "zipkin_dependencies",
        java.sql.Date.valueOf("2025-08-11"), rows.iterator, mysql = false)
      JdbcLinkSink.writePartition(conn, "zipkin_dependencies",
        java.sql.Date.valueOf("2025-08-11"), rows.iterator, mysql = false)
    } finally conn.close()
    assert(readAll(url) == Set(("2025-08-11", "frontend", "backend", 2L, 1L)))
  }

  test("unknown dialect fails loudly before touching the database") {
    val e = intercept[IllegalArgumentException] {
      JdbcLinkSink.writeLinks(links(("a", "b", 1L, 0L)), "2025-08-11",
        "jdbc:derby:memory:never", dialect = "postgres")
    }
    assert(e.getMessage.contains("dialect"))
  }
}
