package graft.ops

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Concentration.profile pins: grouped-weight Gini against the classic
  * per-unit formula, tie-pro-rata top-1% share, boundary regimes (perfect
  * equality, one-unit group, extreme skew), and a random-corpus property
  * replay against a plain-Scala reference. */
class ConcentrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Plain-Scala reference: sort units ascending, Gini =
    * (2·Σ i·wᵢ − (n+1)·Σw)·10000 / (n·Σw); top-k = ceil(n/100) units with
    * ties split pro-rata (groups of equal weight contribute
    * min(cnt, k − taken)·w, scanning weight groups descending). */
  private def ref(weights: Seq[Long]): (Long, Long, Long, Long, Long) = {
    val sorted = weights.sorted
    val n = sorted.size.toLong
    val t = sorted.sum
    val s = sorted.zipWithIndex.map { case (w, i) => (i + 1) * w }.sum
    val gini = (2 * s - (n + 1) * t) * 10000 / (n * t)
    val k = (n + 99) / 100
    var taken = 0L
    var topw = 0L
    for ((w, cnt) <- weights.groupBy(identity).toSeq.sortBy(-_._1)
        .map { case (w, g) => (w, g.size.toLong) }) {
      val use = math.max(0L, math.min(cnt, k - taken))
      topw += use * w
      taken += use
    }
    (n, t, sorted.max, gini, topw * 10000 / t)
  }

  private def run(weights: Seq[Long], group: String = "g")
      : (Long, Long, Long, Long, Long) = {
    val row = Concentration.profile(
        weights.map((group, _)).toDF("grp", "w"), Seq("grp"), "w")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    (row._2, row._3, row._4, row._5, row._6)
  }

  test("perfect equality: gini 0; top-1% (two units of 200 equals) holds 2/200") {
    val got = run(Seq.fill(200)(5L))
    assert(got == (200L, 1000L, 5L, 0L, 100L)) // k=2 units: 10·1e4/1000 = 100 bp
    assert(got == ref(Seq.fill(200)(5L)))
  }

  test("extreme skew: one whale among minnows concentrates gini and top share") {
    val ws = 9901L +: Seq.fill(99)(1L) // n=100, T=10000, k=1
    val got = run(ws)
    assert(got == ref(ws))
    assert(got._4 > 9000L, s"gini should be near 1, got ${got._4}")
    assert(got._5 == 9901L) // the whale IS the top 1%
  }

  test("single unit: gini exactly 0, top share exactly 10000") {
    assert(run(Seq(7L)) == (1L, 7L, 7L, 0L, 10000L))
  }

  test("tie at the top-k boundary splits pro-rata") {
    // n=300 → k=3; weights: two 10s and four 5s and 294 1s.
    // top-3 = two 10s + ONE of the tied 5s = 25
    val ws = Seq(10L, 10L) ++ Seq.fill(4)(5L) ++ Seq.fill(294)(1L)
    val got = run(ws)
    assert(got == ref(ws))
    assert(got._5 == 25L * 10000 / ws.sum)
  }

  test("property: 30 random weight multisets match the reference; groups are independent") {
    val rnd = new scala.util.Random(20260821L)
    for (case_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(400)
      val ws = Seq.fill(n)(1L + rnd.nextInt(50).toLong)
      assert(run(ws) == ref(ws), s"case $case_ n=$n")
    }
    // two groups in one frame profile independently
    val a = Seq(1L, 2L, 3L)
    val b = Seq(10L, 10L)
    val rows = Concentration.profile(
        (a.map(("a", _)) ++ b.map(("b", _))).toDF("grp", "w"), Seq("grp"), "w")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(rows("a") == ref(a) && rows("b") == ref(b))
    spark.sharedState.cacheManager.clearCache()
  }
}
