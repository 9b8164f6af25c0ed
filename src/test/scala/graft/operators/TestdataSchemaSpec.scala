package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ENGINE-side dtypes the query surface assumes for every driver
  * testdata table, so a testdata regeneration that changes a physical type
  * fails HERE with a named column instead of deep inside a query plan.
  *
  * Motivation: the round-9 regression — `events.ts` flipped from parquet
  * TIMESTAMP(NANOS) (read as long via nanosAsLong) to TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ), and every `ts DIV 1000`
  * threw DATATYPE_MISMATCH at runtime in seven registered queries while this
  * suite stayed green. [[ContractQueries.tsMicros]] now branches on the
  * dtype; this spec asserts the dtype is one of the branches it handles AND
  * that the micros it computes are epoch-sane.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def dtypes(name: String): Map[String, DataType] =
    ContractQueries.table(spark, sf, name).schema
      .fields.map(f => f.name -> f.dataType).toMap

  /** ts arithmetic works for long nanos and both timestamp flavors — and
    * nothing else. */
  test("events.ts is a dtype tsMicros handles; micros are epoch-sane UTC") {
    val ev = ContractQueries.table(spark, sf, "events")
    val t = ev.schema("ts").dataType
    assert(t == LongType || t == TimestampNTZType || t == TimestampType,
      s"events.ts read as $t — tsMicros/tsDay handle long-nanos and " +
        "TIMESTAMP_NTZ/LTZ only; extend ContractQueries.tsMicros")
    // Epoch-sane: every value in [2000-01-01, 2100-01-01) micros. A unit
    // slip (nanos-as-micros or millis-as-micros) lands 3 orders of
    // magnitude outside this window.
    val Array(lo, hi) = ev
      .agg(min(ContractQueries.tsMicros(ev)), max(ContractQueries.tsMicros(ev)))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().flatMap(t => Array(t._1, t._2))
    val y2000 = 946684800000000L
    val y2100 = 4102444800000000L
    assert(lo >= y2000 && hi < y2100,
      s"tsMicros range [$lo, $hi] outside [2000, 2100) epoch-micros — unit slip?")
  }

  test("events columns the queries select") {
    val d = dtypes("events")
    assert(d("event_id") == LongType)
    assert(d("user_id") == LongType)
    assert(d("event_type") == StringType)
    assert(d("value") == DoubleType)
    assert(d("props") == StringType)
  }

  test("documents columns the text/dedup family assumes") {
    val d = dtypes("documents")
    assert(d("doc_id") == LongType)
    assert(d("text") == StringType)
    assert(d("lang") == StringType)
    assert(d("source") == StringType)
    assert(d("n_chars") == LongType)
  }

  test("embeddings columns the ANN family assumes") {
    val d = dtypes("embeddings")
    assert(d("vec_id") == LongType)
    assert(d("embedding") == ArrayType(FloatType, containsNull = true) ||
      d("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding read as ${d("embedding")}")
    assert(d("label") == IntegerType)
  }

  test("TPC-H-ish fact/dim columns: keys integral, measures double, dates timestamp") {
    val li = dtypes("lineitem")
    assert(li("l_orderkey") == LongType)
    assert(li("l_quantity") == DoubleType)
    assert(li("l_extendedprice") == DoubleType)
    assert(li("l_shipdate") == TimestampNTZType || li("l_shipdate") == TimestampType,
      s"l_shipdate read as ${li("l_shipdate")}")
    val o = dtypes("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_totalprice") == DoubleType)
    assert(o("o_orderdate") == TimestampNTZType || o("o_orderdate") == TimestampType)
    assert(dtypes("customer")("c_custkey") == LongType)
    assert(dtypes("customer")("c_nationkey") == IntegerType)
    assert(dtypes("nation")("n_nationkey") == IntegerType)
    assert(dtypes("region")("r_regionkey") == IntegerType)
    assert(dtypes("supplier")("s_suppkey") == LongType)
    assert(dtypes("part")("p_partkey") == LongType)
  }
}
