package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned layout: `partitionBy` on write makes predicate
  * pruning a DIRECTORY LISTING instead of a data scan — at 100 TB, a
  * `WHERE event_type = 'x'` against an event_type-partitioned table reads
  * 1/N of the files before a single row is decoded (plan shows the
  * predicate under `PartitionFilters`, not `PushedFilters`).
  *
  * Choose partition columns with bounded cardinality (status, date, type);
  * high-cardinality partitioning (user_id) creates millions of tiny files —
  * that's what bucketing (see [[Bucketing]]) is for.
  */
object PartitionedWrite {

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
