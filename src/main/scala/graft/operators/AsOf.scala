package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join composed from built-ins.
  *
  * Spark has no native as-of join; the scalable composition is
  * union-tag-window rather than a range join: tag both inputs, union,
  * window per key ordered by time, and carry the running "latest right-side
  * time so far" onto each left row. One shuffle on the key, no pair
  * explosion — the shape that survives 100 TB (a naive
  * `left.join(right, lts >= rts)` range join is quadratic per key).
  *
  * At-equal-times semantics: the right row sorts BEFORE the left row
  * (`_side` ascending), so a right event at exactly t matches a left event
  * at t ("before or at").
  */
object AsOf {

  /** For each `left` row, the most recent `right` timestamp ≤ its own,
    * per join key. Returns `left.*` plus `asofCol` (null when no prior
    * right row exists). Uses max-over-running-window, exact because time
    * is the ordering key (the running max of matched times IS the latest). */
  def lastTimestampBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, asofCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_side", lit(1))
    val r = right.select(keys.map(col) :+ col(tsCol): _*).withColumn("_side", lit(0))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*).unionByName(l)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofCol, max(when(col("_side") === 0, col(tsCol))).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col(asofCol): _*)
  }

  /** Convenience: as-of with a tolerance — matches older than `tolerance`
    * seconds are nulled out (the usual as-of-join contract). */
  def lastTimestampWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, asofCol: String, toleranceSec: Long): DataFrame =
    lastTimestampBefore(left, right, keys, tsCol, asofCol)
      .withColumn(asofCol,
        when(col(tsCol).cast("long") - col(asofCol).cast("long") <= toleranceSec, col(asofCol)))
}
