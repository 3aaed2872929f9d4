package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim

/** Manual bloom-filter semi-join pruning — the hand-held version of Spark's
  * `InjectRuntimeFilter`, for the shapes the optimizer rule can NOT see.
  *
  * The automatic rule only fires on equi-join keys inside one query plan,
  * gated by catalog size estimates. It cannot help when the filtering side
  * is a separately-computed frame (a curated id list, yesterday's delta, an
  * aggregate over another table), when the same filter should be REUSED
  * across several queries, or when stats are missing and the thresholds
  * veto it. This operator builds the bloom explicitly — a distributed
  * `bloom_filter_agg(xxhash64(key))` aggregate, never a driver-side
  * collect — and applies it as a scalar-subquery `might_contain` predicate
  * on the big side's SCAN, before the shuffle.
  *
  * At 100 TB the economics: the bloom is a few MB regardless of input size
  * (one tiny aggregate + broadcast of the scalar-subquery result), while
  * the shuffle it prunes is the dominant cost of the join. A 1% bloom
  * false-positive rate means the exchange carries ~selectivity + 1% of the
  * fact table instead of all of it; the trailing exact semi join only pays
  * for rows that survived the bloom — results are exactly the semi join,
  * bloom or no bloom.
  */
object BloomPrune {

  /** One-row frame holding `bloom_filter_agg(xxhash64(key))` over `df` —
    * the binary sketch of the key set, built distributed (partial sketches
    * merge associatively; only the few-MB bitmap reaches the driver as the
    * scalar-subquery value). */
  def bloomOf(df: DataFrame, key: Column, expectedItems: Long): DataFrame =
    df.select(graftshim.toColumn(
      new BloomFilterAggregate(graftshim.toExpression(xxhash64(key)), expectedItems)
        .toAggregateExpression()).as("bloom"))

  /** Exact `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)`,
    * with a bloom of `small`'s keys applied to `big` BEFORE the join
    * shuffle. False positives are removed by the exact semi join; false
    * negatives are impossible (bloom guarantee), so the result equals the
    * plain semi join. */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long): DataFrame = {
    graft.functions.Registry.register(big.sparkSession)
    val bloom = bloomOf(small, col(smallKey), expectedItems)
    big
      .filter(call_function("might_contain", bloom.scalar(), xxhash64(col(bigKey))))
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }
}
