package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy of the sketch estimators against exact similarity, on
  * deterministic constructed pairs (seeded hash families ⇒ reproducible). */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Two docs sharing `shared` tokens of `total` each (disjoint remainder):
    * word-1-gram jaccard = shared / (2*total - shared). */
  private def pair(shared: Int, total: Int): (String, String) = {
    val common = (0 until shared).map(i => s"common$i")
    val a = common ++ (shared until total).map(i => s"lefttok$i")
    val b = common ++ (shared until total).map(i => s"righttok$i")
    (a.mkString(" "), b.mkString(" "))
  }

  test("minhash estimate tracks exact word-gram jaccard within 0.15 (k=64)") {
    for ((shared, total) <- Seq((50, 50), (40, 50), (25, 50), (10, 50), (0, 50))) {
      val (ta, tb) = pair(shared, total)
      val exact = shared.toDouble / (2 * total - shared)
      val df = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val est = Dedup.minhashNearDups(df, "text", "doc_id",
        k = 64, bands = 16, shingle = 1, threshold = 0.0, wordGrams = true)
        .select("est_jaccard").as[Double].collect().headOption.getOrElse(0.0)
      assert(math.abs(est - exact) <= 0.15,
        s"shared=$shared: est=$est exact=$exact")
    }
  }

  test("portable minhash estimate tracks exact jaccard within 3 sigma (k=16)") {
    // the md5 double-hash family must be a sound estimator too, not just
    // engine-portable. k=16 has sd = sqrt(p(1-p)/16) ≈ 0.12 at p=0.5 —
    // bound each (deterministic, seeded) draw at 3 sigma, not a flat 0.2
    for ((shared, total) <- Seq((50, 50), (40, 50), (25, 50), (10, 50))) {
      val (ta, tb) = pair(shared, total)
      val exact = shared.toDouble / (2 * total - shared)
      val df = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val est = PortableSketch.minhashNearDups(df, "text", "doc_id",
        k = 16, bands = 8, n = 1, threshold = 0.0)
        .select("est_jaccard").as[Double].collect().headOption.getOrElse(0.0)
      val sigma = math.sqrt(exact * (1 - exact) / 16).max(0.05)
      assert(math.abs(est - exact) <= 3 * sigma,
        s"shared=$shared: est=$est exact=$exact sigma=$sigma")
    }
  }

  test("portable simhash hamming grows with dissimilarity") {
    val dists = Seq(50, 35, 15, 0).map { shared =>
      val (ta, tb) = pair(shared, 50)
      val df = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val sh = df.select(PortableSketch.simhash60(col("text"), 5).as("s"))
        .as[Long].collect()
      java.lang.Long.bitCount(sh(0) ^ sh(1))
    }
    assert(dists.head == 0, "identical docs must have identical simhash")
    assert(dists.last > dists(1), s"disjoint docs must be farthest: $dists")
    assert(dists(1) < dists(2) + 10, s"roughly monotone expected: $dists")
  }

  test("simhash hamming distance is monotone in dissimilarity") {
    val texts = Seq(1.0, 0.8, 0.5, 0.0).zipWithIndex.map { case (sim, i) =>
      val (a, b) = pair((sim * 50).toInt, 50)
      (i.toLong, a, b)
    }
    val dists = texts.map { case (i, a, b) =>
      val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val sh = df.select($"doc_id", Dedup.simhash(col("text"), shingle = 5).as("sh"))
        .as[(Long, Long)].collect().toMap
      java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    }
    assert(dists.head == 0) // identical
    assert(dists.last > dists.head)
    assert(dists(2) >= dists(1) - 3) // allow small non-monotonic wiggle
  }

  test("approx_count_distinct within rsd bounds on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val row = docs.agg(
      approx_count_distinct(col("text"), 0.02).as("a"),
      countDistinct(col("text")).as("e")).head()
    val (a, e) = (row.getLong(0), row.getLong(1))
    assert(math.abs(a - e).toDouble / e < 0.1, s"approx=$a exact=$e")
  }
}
