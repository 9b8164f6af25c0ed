import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CdcDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/graft_fuzz14/corpora/c09/documents.parquet")
      .where(col("source") === "src4").select(col("doc_id"), col("source"), col("text"))
    val ch = graft.ops.TextOps.cdcChunks(docs, "text", Seq("doc_id"))
      .groupBy("doc_id").count().orderBy("doc_id")
    ch.collect().foreach(r => println(s"SPARKCDC ${r.getLong(0)} ${r.getLong(1)}"))
    spark.stop()
  }
}
