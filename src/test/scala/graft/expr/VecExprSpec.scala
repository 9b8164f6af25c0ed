package graft.expr

import graft.ops.Similarity
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("fused dot kernel is bit-equal to the aggregate/zip_with formulation") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("a", "b")
    // bit-for-bit: both sum left-to-right in double
    val diffs = df.select(
      Similarity.dot(col("a"), col("b")).as("fused"),
      Similarity.dotBuiltin(col("a"), col("b")).as("ref"))
      .where(col("fused") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("float arrays widen implicitly and match the double computation") {
    val a = Seq(1.5f, -2.25f, 0.5f)
    val b = Seq(4.0f, 2.0f, -8.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).as[Double].head()
    assert(got == 1.5 * 4.0 + -2.25 * 2.0 + 0.5 * -8.0)
  }

  test("dot kernel runs inside whole-stage codegen") {
    // non-literal input: a literal frame constant-folds to LocalTableScan
    val df = spark.range(4)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // formatted mode marks codegen'd operators with "[codegen id : N]"
    assert(p.contains("Project [codegen id"), s"kernel must stay in codegen\n$p")
    assert(df.as[Double].collect().toSeq == Seq(8.0, 11.0, 14.0, 17.0))
  }
}
