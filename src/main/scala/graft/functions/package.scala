package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface of the engine (SURVEY.md §2.7).
  *
  * Everything here is either a composition of `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd by Catalyst) or a native custom `Expression`
  * ([[functions.ParseFractionalOdds]]). No Scala closures / UDFs — a UDF is an
  * optimization barrier (no pushdown through it, boxing per row), which is
  * disqualifying at 100 TB scale.
  */
package object functions {

  /** F1 (reference `DAO/ImpalaCon.py:95-99`) as pure column composition:
    * `"a/b"` → `(a+b)/2`, plain decimal → itself, junk → NULL.
    * Same semantics as [[ParseFractionalOdds]]; kept as the
    * always-works-everywhere form (e.g. inside `spark.sql` strings via
    * `selectExpr` it inlines without registry work).
    */
  def parseOddsCompose(c: Column): Column = {
    val asDouble = try_cast_double(c)
    val a = try_cast_double(split(c, "/").getItem(0))
    val b = try_cast_double(split(c, "/").getItem(1))
    when(c.contains("/"), (a + b) / lit(2.0)).otherwise(asDouble)
  }

  /** F1 via the native codegen'd expression — preferred in hot paths. */
  def parseOdds(c: Column): Column = ParseFractionalOdds(c)

  /** ANSI-safe string→double: NULL instead of throwing under
    * `spark.sql.ansi.enabled=true` (the Spark 4 default). */
  def try_cast_double(c: Column): Column = c.try_cast("double")

  /** F2 (reference `XGBoost/Predictor.py:30`): win/draw/loss → '3'/'1'/'0',
    * off-vocabulary → NULL. Output is a *string* digit, faithfully. */
  def encodeFlat(c: Column): Column =
    when(c === "Win", "3").when(c === "Draw", "1").when(c === "Loss", "0")

  /** F3 (reference `XGBoost/Predictor.py:31`): Under/Over → '0'/'1'. */
  def encodeOverUnder(c: Column): Column =
    when(c === "Under", "0").when(c === "Over", "1")

  /** Engine-stable rounding for cross-engine comparison: averages, ratios,
    * and percentile midpoints of short-decimal inputs land EXACTLY on the
    * round-half boundary (e.g. 0.7 × 0.8215 = 0.57505), where Spark and
    * DuckDB round differently. A +1e-9 nudge (≫ double ULP, ≪ the rounding
    * gap) pushes boundary values consistently up in both engines; off-lattice
    * values are unaffected. The oracle SQL applies the same nudge. */
  def roundStable(c: Column, scale: Int): Column = round(c + lit(1e-9), scale)

  /** F9 (reference `XGBoost/Predictor.py:185-186`): deterministic pivoted
    * feature column name `{value}_{flag}_{company}`. */
  def pivotColName(value: String, flag: Int, company: String): String =
    s"${value}_${flag}_${company}"
}
