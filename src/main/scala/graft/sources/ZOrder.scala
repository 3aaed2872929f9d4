package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered layout — multi-dimensional data skipping.
  *
  * Sorting a table by one key gives perfect file/row-group min-max pruning
  * on that key and none on any other. Interleaving the bits of two keys
  * (Morton code) and range-partitioning on the interleave gives each file a
  * small rectangle in (a, b) space, so min-max skipping works for filters
  * on EITHER dimension — the same layout trick behind Delta/Iceberg
  * OPTIMIZE ZORDER, expressed here as pure column arithmetic (bitwise ops
  * inside whole-stage codegen, no UDF).
  *
  * Keys are first normalized to 16-bit buckets with a min/max scan (one
  * tiny aggregate), so arbitrary numeric ranges work.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (Morton magic). */
  private def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit-bucketized columns: bits of `a` at even
    * positions, bits of `b` at odd. */
  def mortonCode(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Write `df` to `dir` as `numFiles` parquet files z-ordered on numeric
    * columns (`colA`, `colB`): normalize both to 16-bit buckets, range-
    * partition on the Morton code, sort within partitions. Each output file
    * then covers a small rectangle of the key space. */
  def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    val r = df.agg(
      min(colA).cast("double"), max(colA).cast("double"),
      min(colB).cast("double"), max(colB).cast("double")).collect()(0)
    val (aLo, aHi, bLo, bHi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) / lit(hi - lo) * 65535.0).cast("long")
    val z = mortonCode(bucket(col(colA), aLo, aHi), bucket(col(colB), bLo, bHi))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }
}
