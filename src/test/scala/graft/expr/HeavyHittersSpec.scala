package graft.expr

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def sketchOf(items: Seq[String], width: Int, parts: Int): Map[String, Long] =
    items.toDF("x").repartition(parts) // force multi-partition partials + merges
      .agg(HeavyHitters.misraGries(col("x"), width).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e._1"), col("e._2")).as[(String, Long)].collect().toMap

  test("exact mode: width >= distinct items makes every count exact") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c") ++ Seq("d")
    val got = sketchOf(scala.util.Random.shuffle(items), width = 8, parts = 5)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 7L, "d" -> 1L))
  }

  test("saturated mode: Misra-Gries guarantees hold for any merge order") {
    val rnd = new scala.util.Random(3)
    // one dominating item + a spread tail wider than the sketch
    val items = Seq.fill(600)("hot") ++
      (0 until 900).map(_ => s"t${rnd.nextInt(40)}")
    val width = 8
    val n = items.length.toLong
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bound = n / (width + 1)
    for (parts <- Seq(1, 4, 13)) {
      val mg = sketchOf(items, width, parts)
      assert(mg.size <= width, s"parts=$parts: width bound violated")
      mg.foreach { case (k, est) =>
        assert(est <= exact(k), s"parts=$parts: $k overestimated")
        assert(exact(k) - est <= bound, s"parts=$parts: $k error beyond N/(w+1)")
      }
      // every true heavy hitter must be present
      exact.foreach { case (k, c) =>
        if (c > bound) assert(mg.contains(k), s"parts=$parts: heavy $k missing")
      }
    }
  }
}
