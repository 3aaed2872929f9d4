package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for when AQE's runtime skew-join splitting isn't
  * enough (e.g. one key holds 30% of 100 TB — no split of a single shuffle
  * partition fixes a single hot KEY).
  *
  * Both helpers use DETERMINISTIC salts (hash of stable columns, not
  * rand()), so results are reproducible and retried tasks stay consistent.
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
      pmod(xxhash64(col(valueCol)), lit(saltFactor)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_psum").as("sum_value"), sum("_pcnt").as("n"))
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
