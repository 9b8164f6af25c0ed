package graft.expr

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused phash kernel against an independent BigInt-arithmetic
  * reference (the main kernel stays in Long — the reference would diverge
  * if the cross-multiplied products ever overflowed), plus codegen/SQL
  * reachability and null propagation. */
class PHashExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Independent formulation: per-segment mean comparison via BigInt cross
    * products over a slice, not a running Long accumulator. */
  private def ref(bytes: Array[Byte]): Long = {
    val len = bytes.length
    if (len == 0) return 0L
    val vals = bytes.map(b => (b & 0xFF).toLong)
    val total = vals.sum
    (0 until 64).foldLeft(0L) { (acc, i) =>
      val lo = (i.toLong * len / 64).toInt
      val hi = ((i + 1).toLong * len / 64).toInt
      val seg = vals.slice(lo, hi)
      if (seg.nonEmpty && BigInt(seg.sum) * len > BigInt(total) * seg.length)
        acc | (1L << (63 - i))
      else acc
    }
  }

  test("phash64 matches the BigInt reference on random payloads (incl. short + empty)") {
    val rnd = new scala.util.Random(11)
    val cases: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray, Array[Byte](0), Array[Byte](-1),
        Array.fill(63)(7.toByte), Array.fill(64)(0.toByte),
        Array.fill(65)(-1.toByte)) ++
        Seq.fill(300) {
          val n = rnd.nextInt(400)
          val a = new Array[Byte](n); rnd.nextBytes(a); a
        }
    cases.foreach { bytes =>
      assert(PHash.phash64(bytes) == ref(bytes), s"len=${bytes.length}")
    }
  }

  test("mulGt compares exactly where the in-Long cross products overflow") {
    def refGt(a: Long, b: Long, c: Long, d: Long): Boolean =
      (BigInt(a) * BigInt(b)) > (BigInt(c) * BigInt(d))
    // the old audio envelope: sums near 2^15·n with n ~ 2^27 samples
    val hot = Seq(
      (1L << 40, 1L << 30, (1L << 40) - 1, (1L << 30) + 3),
      ((1L << 40) - 1, (1L << 30) + 3, 1L << 40, 1L << 30),
      (Long.MaxValue / 3, 7L, Long.MaxValue / 7, 3L),
      (255L * (1L << 31), 1L << 31, 255L * (1L << 31), 1L << 31))
    hot.foreach { case (a, b, c, d) =>
      assert(PHash.mulGt(a, b, c, d) == refGt(a, b, c, d), s"($a,$b,$c,$d)")
    }
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val Seq(a, b, c, d) = Seq.fill(4)(rnd.nextLong() >>> 1) // nonnegative
      assert(PHash.mulGt(a, b, c, d) == refGt(a, b, c, d), s"($a,$b,$c,$d)")
    }
  }

  test("codegen, interpreted, and SQL paths agree; null propagates") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(13)
    val payloads = Seq.fill(50) {
      val a = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(a); a
    }
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val viaDf = df.select(col("id"), GraftFunctions.phash64(col("payload")))
      .as[(Long, Long)].collect().toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(viaDf(i.toLong) == PHash.phash64(p))
      val interp = PHash64(org.apache.spark.sql.catalyst.expressions.Literal(p))
        .eval(null)
      assert(interp == PHash.phash64(p))
    }
    df.createOrReplaceTempView("phash_in")
    val viaSql = spark.sql("SELECT id, graft_phash64(payload) FROM phash_in")
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaDf)
    val n = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
      .select(GraftFunctions.phash64(col("payload"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("graft_phash64any is SQL-reachable and equals the dispatch kernel") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(19)
    val payloads = Seq.fill(20) {
      val a = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(a); a
    }
    payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload").createOrReplaceTempView("phash_any_in")
    val viaSql = spark.sql(
      "SELECT id, graft_phash64any(payload) FROM phash_any_in")
      .as[(Long, Long)].collect().toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(viaSql(i.toLong) == PHashAny.phash64Any(p))
    }
  }
}
