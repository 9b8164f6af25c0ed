package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{ContractQueries, CurationQueries, ExtendedQueries, NorthStarQueries, PipelineQueries, PortableQueries, Round12Queries, Round13Queries, SelectionQueries, TrainPrepQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the graph-edge analogue of the dependency-link pipeline — nation→nation
    * "call" edges with counts (SURVEY §2.5 Q8). */
  def entry(spark: SparkSession): DataFrame =
    ContractQueries.q08(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ContractQueries.all ++ NorthStarQueries.all ++ ExtendedQueries.all ++
      PipelineQueries.all ++ PortableQueries.all ++ CurationQueries.all ++
      SelectionQueries.all ++ Round12Queries.all ++ Round13Queries.all ++
      TrainPrepQueries.all).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    ContractQueries.oracles ++ NorthStarQueries.oracles ++
      ExtendedQueries.oracles ++ PipelineQueries.oracles ++
      PortableQueries.oracles ++ CurationQueries.oracles ++
      SelectionQueries.oracles ++ Round12Queries.oracles ++
      Round13Queries.oracles ++ TrainPrepQueries.oracles
}
