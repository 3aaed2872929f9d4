package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries are declared as [[QuerySpec]]s in the operator modules and
  * registered here; `queries`/`oracleSql` are derived views. Each spec
  * documents which SURVEY.md §2 inventory ids it covers.
  */
object SparkEntry {

  /** Every verifiable query the engine exposes. */
  def specs: Seq[QuerySpec] =
    operators.CoreQueries.all ++
      ext.ExtQueries.all ++
      operators.SystemQueries.all ++
      operators.AnalyticsQueries.all ++
      operators.RelationalDepthQueries.all ++
      operators.PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.q09Join3.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
