package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffle data ON WRITE so repeated joins/aggregations
  * on the bucket key need no exchange at read time — the core co-location
  * tool for a 100 TB fact-fact join that recurs (e.g. lineitem ⋈ orders
  * every day). Write cost is paid once; every subsequent join saves the
  * dominant shuffle.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets, so
    * sort-merge joins skip the sort too). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * plans as a zero-exchange sort-merge join (verify: no Exchange above
    * either scan in `.explain`). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
