package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Plain-Scala replay of Graph.pageRank's integer steps (Long `/` on
    * positive operands == Spark `div` == DuckDB `//`). */
  private def ref(edges: Seq[(String, String, Long)], iters: Int,
      dPct: Long = 85L, mass: Long = 1000000000L): Map[String, Long] = {
    val wsum = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = edges.map(_._1).distinct
    val base = mass / nodes.size
    val hold = (100L - dPct) * base / 100L
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val s = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((u, v, w) <- edges) s(v) += r(u) * w / wsum(u)
      r = nodes.map(n => n -> (hold + dPct * s(n) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters)
      .as[(String, Long)].collect().toMap

  test("symmetric two-node graph: ranks stay exactly at base mass forever") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L))
    val got = run(edges, 7)
    // base = 1e9/2; hold+damped of an equal split reproduces it exactly:
    // (15*5e8)/100 + (85*5e8)/100 = 75e6 + 425e6 = 5e8
    assert(got == Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("hub node outranks leaves; exact integer values match the reference") {
    // star: b trades with a and c (symmetrized), so b receives full mass
    // from both leaves but returns only half to each
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L),
      ("c", "b", 1L), ("b", "c", 1L))
    val got = run(edges, 10)
    val want = ref(edges, 10)
    assert(got == want)
    assert(got("b") > got("a") && got("a") == got("c"))
    // no mass is created; truncation may only leak it
    assert(got.values.sum <= 1000000000L)
  }

  test("weighted edges shift rank toward the heavy destination") {
    // a sends 3/4 of its damped mass to b, 1/4 to c
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L))
    val got = run(edges, 10)
    assert(got == ref(edges, 10))
    assert(got("b") > got("c"))
  }

  test("property: 40 random symmetric weighted graphs match the plain-Scala reference") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 40) {
      val n = 2 + rnd.nextInt(10)
      val nodes = (0 until n).map(i => s"n$i")
      // a random spanning chain keeps every node non-dangling, plus extras
      val undirected = (1 until n).map(i => (nodes(rnd.nextInt(i)), nodes(i))) ++
        Seq.fill(rnd.nextInt(2 * n))((nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n))))
      val pairs = undirected.filter(p => p._1 != p._2).distinct
      val edges = pairs.flatMap { case (u, v) =>
        val w = 1L + rnd.nextInt(5)
        Seq((u, v, w), (v, u, w))
      }
      val iters = 1 + rnd.nextInt(5)
      assert(run(edges, iters) == ref(edges, iters), s"case $case_ edges=$edges iters=$iters")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("re-run determinism and empty-edge rejection") {
    val edges = Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 9L))
    assert(run(edges, 5) == run(edges, 5))
    assertThrows[IllegalArgumentException] {
      Graph.pageRank(Seq.empty[(String, String, Long)].toDF("src", "dst", "w"), 3)
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
