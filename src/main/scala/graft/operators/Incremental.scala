package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a pre-aggregated table current
  * by merging each new delta's PARTIAL aggregates, never re-scanning the
  * full history.
  *
  * The contract is decomposability: count/sum/min/max partials merge by
  * (sum, sum, min, max); avg is maintained as sum+count and derived at read
  * time. The merge itself is just union + re-aggregate on the key — Spark's
  * own partial-aggregation plan shape, applied ACROSS snapshots instead of
  * across partitions, so the plan is one shuffle of |base keys| + |delta|
  * rows regardless of how much raw history the base summarizes.
  *
  * At 100 TB this is the difference between a daily job that costs
  * O(today's data) and one that costs O(all data ever): the base aggregate
  * is a few GB of keys, the delta is one day's partial, and the merged
  * output overwrites the base (or lands as a new graft-store snapshot —
  * see [[graft.sources.v2.GraftStoreOps]] — which also gives rollback).
  * Non-decomposable aggregates (exact distinct, median) need sketch
  * partials instead: HLL/CountMin/MisraGries (q46/q72/q85) merge the same
  * way.
  */
object Incremental {

  /** Merge aggregate partials that share `keys` and the decomposable
    * aggregate columns named in `sums`/`mins`/`maxs`. Both inputs must
    * already be aggregated to one row per key (the function re-aggregates,
    * so a violated precondition still yields correct totals — it just
    * means the "base" wasn't actually pre-aggregated). */
  def mergePartials(base: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String], mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val aggs = sums.map(c => sum(c).as(c)) ++
      mins.map(c => min(c).as(c)) ++ maxs.map(c => max(c).as(c))
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
