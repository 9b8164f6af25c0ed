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

  test("optimizer rule rewrites the HOF dot pattern to the fused kernel") {
    GraftFunctions.installDotRewrite(spark) // explicit opt-in (idempotent)
    // the user-written formulation — no graft function in sight
    val df = spark.range(50)
      .select(array(col("id").cast("double"), lit(2.0), lit(-1.5)).as("a"),
        array(lit(3.0), col("id").cast("double"), lit(4.0)).as("b"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d),
        (acc, x) => acc + x).as("d"))
    val opt = hof.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot"), s"rewrite must fire\n$opt")
    assert(!opt.contains("aggregate("), s"HOF form must be gone\n$opt")
    // and the rewritten plan computes the same values as the kernel directly
    val direct = df.select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(hof.as[Double].collect().toSeq == direct.as[Double].collect().toSeq)
  }

  test("optimizer rule is NOT installed by ensureRegistered (function-only)") {
    // a fresh session with only ensureRegistered must leave user plans alone
    val clean = spark.newSession()
    GraftFunctions.ensureRegistered(clean)
    assert(!clean.experimental.extraOptimizations.contains(DotProductRewrite))
    val df = clean.range(5)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d),
        (acc, x) => acc + x).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("optimizer rule leaves nullable-element arrays alone") {
    GraftFunctions.installDotRewrite(spark)
    // if(id > 2, …, null) makes the element type containsNull = true: the
    // HOF form null-poisons such sums, so the rewrite must not fire
    val df = spark.range(5).selectExpr(
      "array(if(id > 2, cast(id as double), null), 2.0d) AS a",
      "array(3.0d, 4.0d) AS b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d),
        (acc, x) => acc + x).as("d"))
    val opt = hof.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_dot"), s"must not rewrite nullable elements\n$opt")
    // and the null-poisoning semantics are preserved
    assert(hof.as[java.lang.Double].collect().count(_ == null) == 3)
  }

  test("optimizer rule fires for SQL-text queries too") {
    GraftFunctions.installDotRewrite(spark)
    spark.range(5).selectExpr("array(cast(id as double), 2.0d) AS a",
      "array(3.0d, 4.0d) AS b").createOrReplaceTempView("vec_pairs")
    val df = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS d " +
        "FROM vec_pairs")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot"), s"SQL surface must get the kernel too\n$opt")
    assert(df.as[Double].collect().sorted.head == 8.0)
  }

  test("optimizer rule leaves non-matching folds alone") {
    GraftFunctions.installDotRewrite(spark)
    val df = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
    // a sum-of-sums, not a dot product
    val other = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), lit(0.0d),
        (acc, x) => acc + x).as("d"))
    val opt = other.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_dot"), s"must not rewrite a non-multiply lambda\n$opt")
    assert(other.as[Double].head() == 0.0 + (0.0 + 3.0) + (2.0 + 4.0))
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
