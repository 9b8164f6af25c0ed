package graft.expr

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BottomKSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def brute(xs: Seq[Long], k: Int): Seq[Long] = xs.distinct.sorted.take(k)

  test("aggregator reduce/merge equal the brute-force bottom-k") {
    val agg = new BottomKAggregator(8)
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(500)(rnd.nextLong() % 100) // heavy duplication
    // reduce-all
    val reduced = xs.foldLeft(agg.zero)(agg.reduce)
    assert(reduced.toSeq == brute(xs, 8))
    // arbitrary partition splits + merges (associativity/commutativity)
    val parts = xs.grouped(37).map(p => p.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.foldLeft(agg.zero)(agg.merge)
    assert(merged.toSeq == brute(xs, 8))
    val mergedRev = parts.reverse.foldLeft(agg.zero)(agg.merge)
    assert(mergedRev.toSeq == brute(xs, 8))
  }

  test("udaf works in a grouped aggregation with map-side partials") {
    val rows = (0 until 1000).map(i => (s"g${i % 4}", (i * 2654435761L) % 997))
    val df = rows.toDF("g", "h").repartition(8)
    val got = df.groupBy("g").agg(BottomKSketch.bottomK(col("h"), 16).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    val expect = rows.groupBy(_._1).view.mapValues(v => brute(v.map(_._2), 16)).toMap
    assert(got.view.mapValues(_.toSeq).toMap == expect)
  }

  test("jaccardEstimate is exact when the union fits the sketch") {
    val a = (1L to 30L)
    val b = (21L to 50L) // |inter|=10, |union|=50, J=0.2
    val df = Seq((brute(a, 64), brute(b, 64))).toDF("a", "b")
    val est = df.select(BottomKSketch.jaccardEstimate(col("a"), col("b"), 64).as("j"))
      .as[Double].head()
    assert(est == 0.2)
  }

  test("jaccardEstimate approximates when the union exceeds k") {
    val rnd = new scala.util.Random(9)
    val a = Seq.fill(2000)(rnd.nextLong()).distinct
    val b = a.take(1000) ++ Seq.fill(1000)(rnd.nextLong()).distinct // J ~ 1000/3000
    val trueJ = a.intersect(b).size.toDouble / a.union(b).distinct.size
    val k = 256
    val df = Seq((brute(a, k), brute(b, k))).toDF("a", "b")
    val est = df.select(BottomKSketch.jaccardEstimate(col("a"), col("b"), k).as("j"))
      .as[Double].head()
    assert(math.abs(est - trueJ) < 0.1, s"est $est vs true $trueJ")
  }
}
