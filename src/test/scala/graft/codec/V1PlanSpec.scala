package graft.codec

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contract for the M1 two-table ingest: the scaladoc claims
  * the key-filter reaches both scans and the dedup + fold aggregations reuse
  * the join's (trace_id, id) partitioning — pin it. */
class V1PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("fromV1Tables: pushed filters, and no exchange between join and folds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("v1plan").toString
    Seq((1L, Option.empty[Long], 10L, 1000L)).toDF("trace_id", "parent_id", "id", "start_ts")
      .write.mode("overwrite").parquet(s"$dir/spans")
    Seq((1L, 10L, "cs", "frontend", -1)).toDF("trace_id", "span_id", "a_key", "endpoint_service_name", "a_type")
      .write.mode("overwrite").parquet(s"$dir/annos")
    val ds = V1SpanFold.fromV1Tables(
      spark.read.parquet(s"$dir/spans"), spark.read.parquet(s"$dir/annos"), 0L, 10000L)
    val p = ds.queryExecution.explainString(FormattedMode)
    // day window + key list are pushed into the parquet scans
    assert(p.contains("GreaterThanOrEqual(start_ts") && p.contains("LessThanOrEqual(start_ts"),
      s"span window must reach the scan\n$p")
    assert(p.contains("In(a_key"), s"a_key IN (...) must reach the annotation scan\n$p")
    // exchanges: one per join side only — the dedup agg and the fold agg
    // cluster on supersets of the join key, so Catalyst adds no more
    val exchanges = p.linesIterator.count(l => l.trim.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 2, s"expected exactly the 2 join-side exchanges, got $exchanges\n$p")
  }
}
