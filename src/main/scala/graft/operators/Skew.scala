package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for when AQE's runtime skew-join splitting isn't
  * enough (e.g. one key holds 30% of 100 TB — no split of a single shuffle
  * partition fixes a single hot KEY).
  *
  * Salting strategy: the aggregation helpers salt ROUND-ROBIN per row
  * (`pmod(monotonically_increasing_id(), saltFactor)`), not by hashing a
  * data column — a hash of the measure column collapses back to one bucket
  * when the hot key's values are constant or low-cardinality, which is
  * exactly the straggler the salt exists to kill. Round-robin guarantees
  * uniform fan-out regardless of data values. For decomposable aggregates
  * (sum/count/min/max) the final result is algebraically independent of
  * WHICH salt a row gets, so the partition-layout-dependent id is safe:
  * any assignment merges to the same answer, and a retried task recomputes
  * its whole partition from a deterministic scan. `saltedJoin` keeps a
  * caller-chosen deterministic salt because join output ROWS carry the salt
  * through the shuffle.
  */
object Skew {

  /** Two-phase salted aggregation: spread each hot key over `saltFactor`
    * partial groups, aggregate, then merge. Correct for decomposable
    * aggregates (sum/count/min/max). For plain sum/count Spark's partial
    * aggregation already does this map-side; the salt matters when the
    * first shuffle itself must spread a hot key (e.g. collecting per-key
    * structures downstream). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_psum").as("sum_value"), sum("_pcnt").as("n"))
  }

  /** Two-phase salted pivot-average for a skewed grouping key: pivoting
    * `groupBy(key).pivot(p).avg(v)` shuffles every row of a hot key into
    * one reducer. Phase 1 aggregates (key, salt) × pivot-value partial
    * sums+counts — the hot key spreads over `saltFactor` reducers and the
    * pivot happens there; phase 2 merges `saltFactor` tiny partial rows per
    * key and divides. Output schema matches the direct pivot-avg
    * (`{pivotValue}` columns), NULL where a (key, pivotValue) cell has no
    * rows. Averages are decomposable (sum, count), which is what makes the
    * two-phase form algebraically exact. */
  def saltedPivotAvg(df: DataFrame, key: String, pivotCol: String,
      pivotValues: Seq[String], valueCol: String, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val partial = salted
      .groupBy(col(key), col("_salt"))
      .pivot(pivotCol, pivotValues)
      .agg(sum(valueCol).as("s"), count(valueCol).as("c"))
    val merged = partial.groupBy(col(key)).agg(
      sum(s"${pivotValues.head}_s").as(s"${pivotValues.head}_s"),
      pivotValues.tail.flatMap(v => Seq(sum(s"${v}_s").as(s"${v}_s"))) ++
        pivotValues.map(v => sum(s"${v}_c").as(s"${v}_c")): _*)
    merged.select(col(key) +: pivotValues.map(v =>
      (col(s"${v}_s") / col(s"${v}_c")).as(v)): _*)
  }

  /** Salted join for a skewed LEFT side against a moderate RIGHT side:
    * left rows get a deterministic salt in [0, saltFactor); the right side
    * is replicated saltFactor times (explode), so each (key, salt) bucket
    * co-locates. Use when the right side is too big to broadcast outright
    * but replication×saltFactor is still cheap relative to the hot key. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, saltBy: Column): DataFrame = {
    val saltedLeft = left.withColumn("_salt", pmod(xxhash64(saltBy), lit(saltFactor)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<long>")))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
