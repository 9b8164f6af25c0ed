package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def refMorton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder2 equals the reference bit interleave") {
    val rnd = new scala.util.Random(7)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refMorton(x, y, 16), s"($x, $y)")
    }
    // spot-pin the canonical small values
    assert(refMorton(1, 0, 16) == 1L && refMorton(0, 1, 16) == 2L &&
      refMorton(1, 1, 16) == 3L)
  }

  test("zorder2 stays inside whole-stage codegen (no UDF in the key path)") {
    val df = spark.range(100).select(
      Layout.zorder2(col("id"), col("id") + 1, 16).as("z"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Project [codegen id"), s"morton key must be codegen'd\n$p")
  }

  test("bucketed tables equi-join with no shuffle and no extra sort") {
    val rnd = new scala.util.Random(5)
    val fact = (0 until 2000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "fv")
    val dim = (0 until 500).map(i => (i.toLong % 97, rnd.nextInt())).toDF("k", "dv")
    Layout.writeBucketed(fact, "bkt_fact", "k", buckets = 8)
    Layout.writeBucketed(dim, "bkt_dim", "k", buckets = 8)
    try {
      // disable broadcast so the join would otherwise need a full shuffle
      val joined = spark.table("bkt_fact")
        .hint("merge")
        .join(spark.table("bkt_dim"), "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed co-located join must plan zero exchanges\n$p")
      // multiset equality with the plain (shuffled) join
      val plain = fact.join(dim, "k")
      assert(joined.count() == plain.count())
      assert(joined.groupBy("k").count().orderBy("k").collect().toSeq ==
        plain.groupBy("k").count().orderBy("k").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_fact")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }

  test("zorderRepartition range-partitions on the morton key and keeps all rows") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 500).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
      .toDF("a", "b", "v")
    val out = Layout.zorderRepartition(df, col("a"), col("b"), partitions = 4)
    val p = out.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"range partitioning on the z key expected\n$p")
    assert(out.count() == 500 && out.columns.toSeq == Seq("a", "b", "v"))
    // locality: within each output partition the morton key is sorted, so
    // both dimensions stay range-bounded per partition far below the global
    // range — the min/max-stats pruning property
    val spans = out.withColumn("_p", spark_partition_id())
      .groupBy("_p").agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .as[(Int, Long, Long)].collect()
    assert(spans.length == 4)
    assert(spans.forall { case (_, sa, sb) => sa < 1000 && sb < 1000 })
  }

  private def tmpState(): String = java.nio.file.Files
    .createTempDirectory("layout-seq").resolve("state").toString

  test("resumeSequence shards concatenate to the one-shot global sequence") {
    val rnd = new scala.util.Random(23)
    val df = (0 until 400).map(i => (rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "id").persist()
    val keys = Seq(col("k"), col("id"))
    val state = tmpState()
    // shards in call order: k < 25 first, the rest second
    val s0 = Layout.resumeSequence(df.where(col("k") < 25), keys, state)
    val s1 = Layout.resumeSequence(df.where(col("k") >= 25), keys, state)
    val got = s0.unionByName(s1)
      .select("k", "id", "pos").as[(Long, Long, Long)].collect()
      .sortBy(_._3)
    // expected: one global row_number over (shard, k, id)
    val expected = df.as[(Long, Long)].collect()
      .sortBy { case (k, id) => (if (k < 25) 0 else 1, k, id) }
    assert(got.map(_._3).toSeq == (1L to 400L),
      "positions must be the contiguous 1..N across shards")
    assert(got.map(r => (r._1, r._2)).toSeq == expected.toSeq)
    df.unpersist()
  }

  test("sequence state: absent reads 0, advances by shard size, survives reload") {
    val state = tmpState()
    assert(Layout.loadSequenceOffset(spark, state) == 0L)
    val df = (1 to 7).map(i => (i.toLong, s"d$i")).toDF("id", "t")
    Layout.resumeSequence(df, Seq(col("id")), state).count()
    assert(Layout.loadSequenceOffset(spark, state) == 7L)
    Layout.saveSequenceOffset(spark, state, 123L)
    assert(Layout.loadSequenceOffset(spark, state) == 123L)
  }

  test("a retried shard draws a fresh block: unique positions, never overlap") {
    val state = tmpState()
    val df = (1 to 10).map(i => (i.toLong, i.toString)).toDF("id", "t")
    val first = Layout.resumeSequence(df, Seq(col("id")), state)
      .select("pos").as[Long].collect().toSet
    val retry = Layout.resumeSequence(df, Seq(col("id")), state)
      .select("pos").as[Long].collect().toSet
    assert(first == (1L to 10L).toSet)
    assert(retry == (11L to 20L).toSet,
      "state advances at call time, so a retry gets a later, disjoint block")
  }

  test("globalSequenceWithRunningTotal equals the single-window reference " +
      "and plans no single-partition exchange") {
    val rnd = new scala.util.Random(160)
    val rows = (1 to 500).map(i => (rnd.nextLong(), i.toLong, 1L + rnd.nextInt(50)))
    val df = rows.toDF("k", "id", "v")
    val got = Layout.globalSequenceWithRunningTotal(
        df, Seq(col("k"), col("id")), col("v"))
      .select("id", "pos", "cum_before").as[(Long, Long, Long)]
      .collect().sortBy(_._2)
    var cum = 0L
    val expect = rows.sortBy(r => (r._1, r._2)).zipWithIndex.map {
      case ((_, id, v), i) => val row = (id, (i + 1).toLong, cum); cum += v; row
    }
    assert(got.toSeq == expect)
    val plan = Layout.globalSequenceWithRunningTotal(
      df, Seq(col("k"), col("id")), col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"running total must stay range-partitioned\n$plan")
  }

  test("shardAssign: in-order next-fit — shards are contiguous position " +
      "ranges, each full shard reaches its budget before the last doc") {
    val rnd = new scala.util.Random(161)
    val rows = (1 to 400).map(i => (rnd.nextLong(), i.toLong, 1L + rnd.nextInt(80)))
    val budget = 300L
    val got = Layout.shardAssign(rows.toDF("k", "id", "v"),
        Seq(col("k"), col("id")), col("v"), budget)
      .select("pos", "shard", "v").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // shard ids are non-decreasing in position order (order-preserving)
    assert(got.sliding(2).forall { case Array(a, b) => a._2 <= b._2; case _ => true })
    // replay the sequential next-fit rule exactly
    var cum = 0L
    got.foreach { case (pos, shard, v) =>
      assert(shard == cum / budget, s"pos $pos")
      cum += v
    }
    // determinism: a second run hash-identical
    val again = Layout.shardAssign(rows.toDF("k", "id", "v"),
        Seq(col("k"), col("id")), col("v"), budget)
      .select("pos", "shard", "v").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == again.toSeq)
  }

  test("writeShards: one directory per shard, in-shard rows in position " +
      "order, concatenation replays the epoch order") {
    val rnd = new scala.util.Random(162)
    val rows = (1 to 200).map(i => (rnd.nextLong(), i.toLong, 1L + rnd.nextInt(40)))
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Layout.writeShards(rows.toDF("k", "id", "v"),
      Seq(col("k"), col("id")), col("v"), budget = 250L, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sortBy(_.drop(6).toInt)
    assert(dirs.nonEmpty && dirs.head == "shard=0")
    val back = spark.read.parquet(out)
      .select("shard", "pos", "id").as[(Long, Long, Long)].collect()
    // shards partition the position space into contiguous ranges
    val byShard = back.groupBy(_._1).toSeq.sortBy(_._1)
    val spans = byShard.map { case (s, rs) =>
      (s, rs.map(_._2).min, rs.map(_._2).max) }
    spans.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo2, _)) => assert(lo2 == hi + 1,
        "shard position ranges must be contiguous in shard order")
      case _ =>
    }
    assert(back.map(_._2).toSet == (1L to 200L).toSet)
  }
}
