package graft.ext

import graft.functions.MisraGriesAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-items via sketch-then-recount — the standard two-pass
  * heavy-hitters pattern for corpora too large to group-by-count outright.
  *
  * Pass 1: a Misra-Gries summary ([[MisraGriesAgg]]) folds the corpus into
  * O(k) candidates per partition and O(k) total after merge — the shuffle
  * carries summaries, not rows. With k ≥ 2/phi the summary provably
  * contains every item of frequency ≥ phi·n (error ≤ n/(k+1) < phi·n/2).
  *
  * Pass 2: the ≤ k candidates broadcast back over the corpus for an exact
  * recount of just those items; the phi·n threshold is applied to exact
  * counts. Result: exactly the items with count ≥ phi·n, with exact counts
  * — deterministic regardless of partitioning or merge order, at two scans
  * and zero corpus-wide shuffles (the recount aggregates ≤ k distinct keys).
  */
object HeavyHitters {

  /** Items of `c` with frequency ≥ phi·n, with exact counts. */
  def frequentItems(df: DataFrame, c: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, "phi must be in (0,1)")
    val k = math.max(16, math.ceil(2.0 / phi).toInt)
    val spark = df.sparkSession
    import spark.implicits._
    val first = ensureParallelism(df.select(col(c)))
      .agg(MisraGriesAgg(col(c), k).as("cands"), count(col(c)).as("n"))
      .collect()(0)
    val cands = first.getSeq[String](0)
    val n = first.getLong(1)
    val candsDf = cands.toDF(c)
    // Threshold in EXACT decimal arithmetic: 0.005 is not representable in
    // binary doubles, so a count exactly on the phi·n boundary (n divisible
    // by 1/phi) could flip inclusion vs a decimal-arithmetic engine.
    // BigDecimal(phi.toString) is the exact short decimal the caller wrote;
    // BIGINT >= DECIMAL comparison is exact on both Spark and DuckDB.
    val thr = new java.math.BigDecimal(phi.toString)
      .multiply(new java.math.BigDecimal(n))
    df.join(broadcast(candsDf), Seq(c))
      .groupBy(c)
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= lit(thr))
  }
}
