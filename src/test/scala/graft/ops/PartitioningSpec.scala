package graft.ops

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("spread widens genuinely narrow frames") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(100).repartition(1).toDF()
    assert(Partitioning.spread(narrow).rdd.getNumPartitions == target)
  }

  test("spread leaves already-parallel in-memory frames untouched") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).repartition(target).toDF()
    assert(Partitioning.spread(wide) eq wide) // no repartition inserted
  }

  test("spread: few LARGE splittable parquet files do not force a shuffle") {
    // One parquet file that Spark already splits into >= parallelism tasks
    // (via maxPartitionBytes) must pass through: file count alone is not
    // evidence of narrowness.
    val dir = java.nio.file.Files.createTempDirectory("spread-large").toString
    spark.range(0, 200000).selectExpr("id", "repeat(uuid(), 4) AS pad")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = spark.read.parquet(dir)
      assert(df.inputFiles.length < spark.sparkContext.defaultParallelism)
      assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism,
        "test premise: the single file must plan into many splits")
      assert(Partitioning.spread(df) eq df)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }
}
