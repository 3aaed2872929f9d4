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
    * files. Returns the new file count.
    *
    * Swap order is crash-safe for the data: live is renamed ASIDE first
    * (dir -> dir__old), then the compacted temp renamed in, then the old
    * copy deleted. A crash between the renames leaves both full copies on
    * disk (recover by renaming either back); at no point is the data only
    * in a temp directory. A concurrent reader can still catch the brief
    * missing-path window between the two renames — full reader isolation
    * needs a manifest/table format (the documented non-goal here). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    val bytes = dataBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir.stripSuffix("/") + "__compacting"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "__old")
    fs.delete(old, true) // stale leftover from a previous crash, if any
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(old, true)
    dataFileCount(spark, dir)
  }
}
