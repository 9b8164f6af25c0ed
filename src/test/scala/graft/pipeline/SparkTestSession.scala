package graft.pipeline

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are expensive;
  * specs must not stop() it). Mirrors the production conf: UTC, AQE on,
  * shuffle partitions sized for the box not the 200 default. */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(s)
    s
  }
}
