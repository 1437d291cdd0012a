package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesEstimators.queries ++
    QueriesSampleEst.queries ++ QueriesNar.queries ++
      QueriesStats.queries ++ QueriesText.queries ++ QueriesStreaming.queries ++
      QueriesCorpus.queries ++ QueriesAnalytics.queries ++ QueriesGraph.queries ++
      QueriesRelational.queries ++ QueriesPipeline.queries ++ QueriesWave6.queries ++ QueriesWave7.queries ++
      QueriesWave8.queries ++ QueriesWave9.queries ++ QueriesWave10.queries ++
      QueriesWave11.queries ++ QueriesWave12.queries ++ QueriesWave13.queries ++
      QueriesWave14.queries ++ QueriesWave15.queries ++ QueriesWave16.queries ++
      QueriesWave17.queries ++ QueriesWave18.queries ++ QueriesWave19.queries ++
      QueriesWave20.queries ++ QueriesWave21.queries ++ QueriesWave22.queries ++
      QueriesWave23.queries ++ QueriesWave24.queries ++ QueriesWave25.queries ++
      QueriesWave26.queries ++ QueriesWave27.queries ++ QueriesWave28.queries ++
      QueriesWave29.queries ++ QueriesWave30.queries ++ QueriesParity.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracleSql ++ QueriesEstimators.oracleSql ++
    QueriesSampleEst.oracleSql ++ QueriesNar.oracleSql ++
      QueriesStats.oracleSql ++ QueriesText.oracleSql ++ QueriesStreaming.oracleSql ++
      QueriesCorpus.oracleSql ++ QueriesAnalytics.oracleSql ++ QueriesGraph.oracleSql ++
      QueriesRelational.oracleSql ++ QueriesPipeline.oracleSql ++ QueriesWave6.oracleSql ++ QueriesWave7.oracleSql ++
      QueriesWave8.oracleSql ++ QueriesWave9.oracleSql ++ QueriesWave10.oracleSql ++
      QueriesWave11.oracleSql ++ QueriesWave12.oracleSql ++ QueriesWave13.oracleSql ++
      QueriesWave14.oracleSql ++ QueriesWave15.oracleSql ++ QueriesWave16.oracleSql ++
      QueriesWave17.oracleSql ++ QueriesWave18.oracleSql ++ QueriesWave19.oracleSql ++
      QueriesWave20.oracleSql ++ QueriesWave21.oracleSql ++ QueriesWave22.oracleSql ++
      QueriesWave23.oracleSql ++ QueriesWave24.oracleSql ++ QueriesWave25.oracleSql ++
      QueriesWave26.oracleSql ++ QueriesWave27.oracleSql ++ QueriesWave28.oracleSql ++
      QueriesWave29.oracleSql ++ QueriesWave30.oracleSql ++ QueriesParity.oracleSql
}
