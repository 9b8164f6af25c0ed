package graft

import graft.pipeline.Admission
import org.scalatest.funsuite.AnyFunSuite

/** Pins the env-level config surface (P20) against the reference launcher's
  * rules (ZipkinDependenciesJob.java:21-87). */
class MainSpec extends AnyFunSuite {
  private val today = "2026-08-12"

  test("backfill range parses inclusively, oldest first") {
    assert(MainConfig.parseBackfill("2025-08-10..2025-08-12") ==
      Right(Seq("2025-08-10", "2025-08-11", "2025-08-12")))
    assert(MainConfig.parseBackfill("2025-08-10..2025-08-10") == Right(Seq("2025-08-10")))
    // month boundary
    assert(MainConfig.parseBackfill("2025-01-31..2025-02-01") ==
      Right(Seq("2025-01-31", "2025-02-01")))
  }

  test("backfill rejects reversed, oversized, and malformed ranges") {
    assert(MainConfig.parseBackfill("2025-08-12..2025-08-10").isLeft)
    assert(MainConfig.parseBackfill("2024-01-01..2026-01-01").isLeft) // > 400 days
    assert(MainConfig.parseBackfill("2025-08-10").isLeft)
    assert(MainConfig.parseBackfill("2025-08-10..not-a-date").isLeft)
    assert(MainConfig.parseBackfill("2025-08-10..2025-08-11..2025-08-12").isLeft)
  }

  test("STORAGE_TYPE selects the backend profile (format + admission)") {
    // elasticsearch reaches the LIVE scroll source env-only, so the periodic
    // entrypoints (bin/graft-today) work without flags, like the reference
    val es = MainConfig.resolve(Map(), Map("STORAGE_TYPE" -> "elasticsearch"), today)
    assert(es == Right(MainConfig.Resolved(today, "es-scroll", Admission.IndexDay,
      strict = false, Nil, "WARN")))
    val my = MainConfig.resolve(Map(), Map("STORAGE_TYPE" -> "mysql"), today)
    assert(my.map(r => (r.format, r.admission)) == Right(("v1-tables", Admission.PerSpanWindow)))
    // cassandra3 likewise reaches the LIVE token-range CQL source env-only
    // (contact points from CASSANDRA_CONTACT_POINTS, like the reference)
    val cas = MainConfig.resolve(Map(), Map("STORAGE_TYPE" -> "cassandra3"), today)
    assert(cas.map(r => (r.format, r.admission)) == Right(("c3-cql", Admission.RootInWindow)))
  }

  test("unsupported STORAGE_TYPE errors with the option list") {
    val r = MainConfig.resolve(Map(), Map("STORAGE_TYPE" -> "dynamo"), today)
    assert(r.isLeft)
    assert(r.swap.exists(_.contains("Unsupported STORAGE_TYPE: dynamo")))
    assert(r.swap.exists(_.contains("cassandra3, elasticsearch, mysql")))
  }

  test("explicit flags override the storage profile") {
    val r = MainConfig.resolve(
      Map("format" -> "v1-rows", "admission" -> "index-day", "strict-trace-id" -> "true"),
      Map("STORAGE_TYPE" -> "mysql"), today)
    assert(r.map(x => (x.format, x.admission, x.strict)) ==
      Right(("v1-rows", Admission.IndexDay, true)))
  }

  test("day defaults to today UTC; malformed day rejected") {
    assert(MainConfig.resolve(Map(), Map(), today).map(_.day) == Right(today))
    assert(MainConfig.resolve(Map("day" -> "2024-02-01"), Map(), today).map(_.day) ==
      Right("2024-02-01"))
    assert(MainConfig.resolve(Map("day" -> "not-a-date"), Map(), today).isLeft)
  }

  test("SPARK_CONF parses as the reference does: k=v pairs, malformed skipped") {
    assert(MainConfig.parseSparkConf("spark.executor.memory=4g,spark.x=1") ==
      Seq("spark.executor.memory" -> "4g", "spark.x" -> "1"))
    // no '=' at all → nothing
    assert(MainConfig.parseSparkConf("garbage") == Nil)
    assert(MainConfig.parseSparkConf("") == Nil)
    // pairs with more or fewer than one '=' are skipped, valid ones kept
    assert(MainConfig.parseSparkConf("a=b,oops,c=d=e,f=g") ==
      Seq("a" -> "b", "f" -> "g"))
    // empty key/value survive (reference split keeps them)
    assert(MainConfig.parseSparkConf("a=") == Seq("a" -> ""))
    val viaEnv = MainConfig.resolve(Map(), Map("SPARK_CONF" -> "spark.y=2"), today)
    assert(viaEnv.map(_.sparkConf) == Right(Seq("spark.y" -> "2")))
  }

  test("GRAFT_LOG_LEVEL mirrors ZIPKIN_LOG_LEVEL, defaulting sanely") {
    assert(MainConfig.resolve(Map(), Map("GRAFT_LOG_LEVEL" -> "INFO"), today)
      .map(_.logLevel) == Right("INFO"))
    assert(MainConfig.resolve(Map(), Map(), today).map(_.logLevel) == Right("WARN"))
  }

  test("esEnv: --es-hosts / --es-timeout override ES_HOSTS / ES_TIMEOUT; env passes through") {
    val env = Map("ES_HOSTS" -> "envhost", "ES_TIMEOUT" -> "10000", "ES_INDEX" -> "traces")
    // no flags: env verbatim
    assert(Main.esEnv(Map.empty, env) == env)
    // flags win; untouched keys survive — and the merged map round-trips
    // through esConf so the override reaches the actual transport config
    val merged = Main.esEnv(
      Map("es-hosts" -> "clihost:9400", "es-timeout" -> "30000"), env)
    assert(merged("ES_HOSTS") == "clihost:9400" && merged("ES_TIMEOUT") == "30000")
    val conf = graft.util.EsFlavor.esConf(merged)
    assert(conf.hosts == Seq("http://clihost:9400") && conf.timeoutMs == 30000L)
    assert(conf.index == "traces")
  }

  test("GRAFT_WRITE_BACK maps STORAGE_TYPE to its backend write flag, env-only") {
    assert(Main.writeBackFlags(Map()) == Map())
    assert(Main.writeBackFlags(Map("GRAFT_WRITE_BACK" -> "1")) == Map())
    assert(Main.writeBackFlags(
      Map("GRAFT_WRITE_BACK" -> "1", "STORAGE_TYPE" -> "elasticsearch")) ==
      Map("es-bulk" -> "true"))
    assert(Main.writeBackFlags(
      Map("GRAFT_WRITE_BACK" -> "true", "STORAGE_TYPE" -> "cassandra3")) ==
      Map("cql-write" -> "true"))
    assert(Main.writeBackFlags(
      Map("GRAFT_WRITE_BACK" -> "1", "STORAGE_TYPE" -> "mysql")) ==
      Map("jdbc-write" -> "true"))
    // off stays off, whatever the storage
    assert(Main.writeBackFlags(
      Map("GRAFT_WRITE_BACK" -> "0", "STORAGE_TYPE" -> "mysql")) == Map())
    // CLI flags must win over the env mapping (rawOpts applied second)
    assert((Main.writeBackFlags(Map("GRAFT_WRITE_BACK" -> "1",
      "STORAGE_TYPE" -> "mysql")) ++ Map("jdbc-dialect" -> "standard"))
      .keySet == Set("jdbc-write", "jdbc-dialect"))
  }

  test("cassandra3 profile end-to-end through the CLI dispatch: LIVE scripted CQL → links → sink") {
    // env-only invocation parity with the reference's docker entrypoint:
    // STORAGE_TYPE=cassandra3 resolves straight to the live token-range CQL
    // source; --c3-contact-points stands in for CASSANDRA_CONTACT_POINTS
    // (dispatch reads the real sys.env, which a test must not mutate)
    val spark = graft.pipeline.SparkTestSession.get
    val ts = 1754870400000000L // inside 2025-08-11 UTC
    val rows = Seq(
      graft.sources.FRow(-42L, "00000000000000aa", null, "0000000000000001",
        "CLIENT", ts, null, false, "frontend", "backend", null),
      graft.sources.FRow(42L, "00000000000000aa", "0000000000000001", "0000000000000002",
        "SERVER", ts + 1000L, null, true, "backend", null, Map("error" -> "true")))
    val es = new graft.sources.ScriptedCassandra(rows)
    try {
      val out = java.nio.file.Files.createTempDirectory("c3-cql-cli-out").toString
      val opts = Main.parseArgs(Array(
        "--day", "2025-08-11", "--out", out, "--cql-write",
        "--c3-contact-points", s"127.0.0.1:${es.port}", "--c3-ranges", "2"))
      val resolved = MainConfig.resolve(opts,
        Map("STORAGE_TYPE" -> "cassandra3"), today).toOption.get
      assert(resolved.format == "c3-cql" && resolved.admission == Admission.RootInWindow)
      Main.dispatch(spark, opts, resolved)
      import spark.implicits._
      val links = spark.read.parquet(out)
        .select("parent", "child", "callCount", "errorCount")
        .as[(String, String, Long, Long)].collect().toSet
      assert(links == Set(("frontend", "backend", 1L, 1L)))
      // --cql-write pushed the same day's links back through the write half
      // of the transport: read+write parity on one scripted cluster
      val it = es.queries.iterator(); var inserts = List.empty[String]
      while (it.hasNext) { val q = it.next(); if (q.startsWith("INSERT")) inserts ::= q }
      assert(inserts ==
        List("INSERT INTO zipkin2.dependency (day,parent,child,calls,errors)" +
          " VALUES ('2025-08-11','frontend','backend',1,1)"))
    } finally es.stop()
  }

  test("c3 profile end-to-end through the CLI dispatch: fixture table → links → sink") {
    // the same driven-entrypoint coverage the ES and MySQL paths have: real
    // argv parse → cassandra3 profile resolve (root-in-window admission,
    // --format overriding to the token-range source) → link → parquet sink
    val spark = graft.pipeline.SparkTestSession.get
    val ts = 1754870400000000L // inside 2025-08-11 UTC
    val rows = Seq(
      org.apache.spark.sql.Row("00000000000000aa", null, "0000000000000001",
        "CLIENT", java.lang.Long.valueOf(ts), null, false,
        org.apache.spark.sql.Row("frontend"), org.apache.spark.sql.Row("backend"), null),
      org.apache.spark.sql.Row("00000000000000aa", "0000000000000001", "0000000000000002",
        "SERVER", java.lang.Long.valueOf(ts + 1000), null, true,
        org.apache.spark.sql.Row("backend"), null, Map("error" -> "true")))
    val in = java.nio.file.Files.createTempDirectory("c3-cli-fixture").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      graft.sources.CassandraV3Source.spanTableSchema)
      .write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("c3-cli-out").toString
    val opts = Main.parseArgs(Array(
      "--day", "2025-08-11", "--format", "c3-span-table",
      "--in", in, "--out", out, "--c3-ranges", "2"))
    val resolved = MainConfig.resolve(opts,
      Map("STORAGE_TYPE" -> "cassandra3"), today).toOption.get
    assert(resolved.admission == Admission.RootInWindow) // profile held
    assert(resolved.format == "c3-span-table") // explicit flag overrode json-v2
    Main.dispatch(spark, opts, resolved)
    import spark.implicits._
    val links = spark.read.parquet(out)
      .select("parent", "child", "callCount", "errorCount")
      .as[(String, String, Long, Long)].collect().toSet
    assert(links == Set(("frontend", "backend", 1L, 1L)))
    // re-run is an idempotent day overwrite, like every sink in the engine
    Main.dispatch(spark, opts, resolved)
    assert(spark.read.parquet(out).count() == 1)
  }
}
