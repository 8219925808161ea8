package graft

import graft.queries.{AnnQueries, CorpusPrepQueries, MultimodalQueries, QuantizationQueries, RelationalQueries, RetrievalQueries, ServiceQueries, TextDedupQueries, VectorSearchQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory: every implemented operator
  * from SURVEY.md §2 has an entry, and (where SQL-expressible) a DuckDB
  * oracle in `oracleSql` whose expressions mirror the Spark plan op-for-op
  * so results hash-match exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact top-10 cosine k-NN — the oracle contract for the ANN engine. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearchQueries.queries("knn_cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorSearchQueries.queries ++
      TextDedupQueries.queries ++ QuantizationQueries.queries ++
      AnnQueries.queries ++ MultimodalQueries.queries ++
      CorpusPrepQueries.queries ++ ServiceQueries.queries ++ RetrievalQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ VectorSearchQueries.oracles ++
      TextDedupQueries.oracles ++ QuantizationQueries.oracles ++
      AnnQueries.oracles ++ MultimodalQueries.oracles ++
      CorpusPrepQueries.oracles ++ ServiceQueries.oracles ++ RetrievalQueries.oracles
}
