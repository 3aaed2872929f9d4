package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Single-pass column profiler — the data-quality entry point of a corpus
  * pipeline (null rates, cardinalities, ranges per column).
  *
  * Scale design: ONE aggregation over the input computes every statistic
  * for every requested column (count / nulls / exact distinct / min / max),
  * then a `stack` unpivots the single result row into one row per column —
  * the corpus is scanned once regardless of how many columns are profiled.
  *
  * Cardinality mode: `exact = true` uses `countDistinct`, which is precise
  * but pays a Catalyst Expand fan-out — the scan output is multiplied by
  * the number of distinct columns before the shuffle, the profiler's cost
  * center and the first thing to fall over on a wide table at 100 TB.
  * `exact = false` swaps in `approx_count_distinct` (HLL++, rsd 2%): no
  * Expand, one pass, constant memory per column — the mode to use at full
  * scale; keep exact for oracle-scale validation.
  *
  * Fractional min/max are rendered with a fixed `%.2f` so the output is
  * engine-portable (naive double→string formatting differs across engines).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // extrema are computed on the NATIVE type (string min of doubles would
    // be lexicographic), then rendered portably
    def render(c: org.apache.spark.sql.Column, name: String) = fieldType(name) match {
      case DoubleType | FloatType => format_string("%.2f", c)
      case _ => c.cast("string")
    }
    def distinctAgg(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), 0.02)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg(c).as(s"${c}__distinct"),
        render(min(col(c)), c).as(s"${c}__min"),
        render(max(col(c)), c).as(s"${c}__max"))
    }
    // small files scan as one partition; the Expand-based multi-distinct
    // is CPU-bound, so guarantee parallelism before it
    val wide = ensureParallelism(df).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n, n_null, n_distinct, min_s, max_s)")
  }
}
