package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the ops-side half of a 100 TB table's health.
  *
  * Streaming sinks and fine-grained partitioned writes accumulate files far
  * below the ideal scan unit (128 MB-ish): each file costs a task, a footer
  * read, and a catalog entry, so a million 100 KB files makes every scan
  * scheduling-bound. `compact` rewrites a directory to ~`targetBytes` files
  * by repartitioning on byte size, atomically enough for append-only data
  * (write to a temp dir, then swap). At cluster scale the same routine runs
  * per partition directory of a partitioned table.
  */
object Compaction {

  /** Total bytes of data files directly under `dir` (non-recursive, skips
    * _SUCCESS/metadata). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
  }

  /** Rewrite the parquet directory at `dir` into ceil(bytes/targetBytes)
    * files. Returns the new file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    val bytes = dataBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir.stripSuffix("/") + "__compacting"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    dataFileCount(spark, dir)
  }
}
