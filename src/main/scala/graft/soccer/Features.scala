package graft.soccer

import graft.functions.{encodeFlat, encodeOverUnder, parseOdds}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature engineering reproducing the reference's E1/E2 dataflow
  * (`XGBoost/Predictor.py:36-122`) as lazy distributed transformations.
  *
  * Every stage the reference ran as an Impala SQL string or a driver-side
  * pandas call is a Catalyst-planned DataFrame op here:
  *  - game-list lookup (`DAO/ImpalaCon.py:33-62`) → filters (P1/P2)
  *  - collect+IN-list (`Predictor.py:201-208`) → left-semi join (J5)
  *  - top-10 companies (`Predictor.py:210-225`) → agg + TakeOrdered (A1)
  *  - pandas pivot_table mean (`Predictor.py:174-187`) → groupBy.pivot (A2)
  *  - fractional-odds coercion in the DAO (`ImpalaCon.py:95-99`) → the
  *    native ParseFractionalOdds expression, applied to odds columns only
  *    (documented divergence: the reference applied it blanket to any
  *    cell containing '/', which would mangle dates like 2019/08/10)
  *  - index left-join + dropna (`Predictor.py:47-52`) → join + na.drop (J1/P7)
  */
object Features {

  val oddsValueCols: Seq[String] = Seq(
    "final_win", "final_draw", "final_lose", "initial_win", "initial_draw", "initial_lose")
  val ouValueCols: Seq[String] = Seq(
    "initial_over", "initial_line", "initial_under", "final_over", "final_line", "final_under")

  /** P2: games where `name` played at home (hg=0) or away (hg=1)
    * (`DAO/ImpalaCon.py:50-55`). */
  def gamesForTeam(gameRecord: DataFrame, name: String, hg: Int): DataFrame = {
    val side: Column = if (hg == 0) col("host_team") else col("guest_team")
    gameRecord.filter(side === name).select("id")
  }

  /** A1: top-n bookmakers by row count, deterministic tie-break on name
    * (the reference's bare `limit 10` was tie-unstable). */
  def topCompanies(odds: DataFrame, n: Int = 10): Seq[String] =
    odds.groupBy("odds_company").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("odds_company").asc)
      .limit(n)
      .collect().map(_.getString(0)).toSeq

  /** A2 + F1 + F9: parse odds values (fractional-mean coercion), pivot by
    * company with the EXPLICIT top-n list (no distinct-discovery job), mean
    * over duplicate (id, company) rows, reference column naming
    * `{value}_{hg}_{company}` (`Predictor.py:185-186`). */
  def pivotFeatures(odds: DataFrame, companies: Seq[String], valueCols: Seq[String], hg: Int): DataFrame = {
    val parsed = odds.select(
      col("id") +: col("odds_company") +:
        valueCols.map(c => parseOdds(col(c)).as(c)): _*)
    val aggs = valueCols.map(c => avg(c).as(c))
    val pivoted = parsed
      .groupBy("id")
      .pivot("odds_company", companies)
      .agg(aggs.head, aggs.tail: _*)
    // Spark names multi-agg pivot columns "{company}_{value}"; re-alias to
    // the reference's "{value}_{hg}_{company}" scheme. The company list is
    // known here, so match each column against it (longest company first)
    // rather than splitting on '_' — a bookmaker named "Bet_365" must not
    // be mis-parsed as company "Bet" + value "365_...".
    val byLength = companies.sortBy(-_.length)
    val renamed = pivoted.columns.map {
      case "id" => col("id")
      case c =>
        val comp = byLength.find(co => c.startsWith(co + "_")).getOrElse(
          throw new IllegalStateException(s"pivot column '$c' matches no known company"))
        val value = c.drop(comp.length + 1)
        pivoted(c).as(s"${value}_${hg}_$comp")
    }
    pivoted.select(renamed: _*)
  }

  /** A3 + F2/F3: one label row per game — distinct(id, encoded labels)
    * (`Predictor.py:189-199`). String-digit outputs, faithfully. */
  def labels(gameRecord: DataFrame): DataFrame =
    gameRecord.select(
      col("id"),
      encodeFlat(col("win_draw_lose")).as("flat"),
      encodeOverUnder(col("total_overunder")).as("overunder"))
      .distinct()

  /** E1 assembly for the win/draw/loss model: J5 semi-join on the team's
    * games, pivot features, J1 left join labels, P7 dropna. */
  def flatTrainingSet(gameRecord: DataFrame, odds: DataFrame,
      teamName: String, hg: Int, topN: Int = 10): DataFrame = {
    val games = gamesForTeam(gameRecord, teamName, hg)
    val teamOdds = odds.join(games, Seq("id"), "left_semi")
    val companies = topCompanies(teamOdds, topN)
    pivotFeatures(teamOdds, companies, oddsValueCols, hg)
      .join(labels(gameRecord).select("id", "flat"), Seq("id"), "left")
      .na.drop("any")
  }

  /** E1 assembly for the over/under model: two odds tables, J2 3-way join
    * (`Predictor.py:63-86`). */
  def overUnderTrainingSet(gameRecord: DataFrame, odds: DataFrame, overUnder: DataFrame,
      teamName: String, hg: Int, topN: Int = 10): DataFrame = {
    val games = gamesForTeam(gameRecord, teamName, hg)
    val teamOdds = odds.join(games, Seq("id"), "left_semi")
    val teamOu = overUnder.join(games, Seq("id"), "left_semi")
    val oddsFeat = pivotFeatures(teamOdds, topCompanies(teamOdds, topN), oddsValueCols, hg)
    val ouFeat = pivotFeatures(teamOu, topCompanies(teamOu, topN), ouValueCols, hg)
    oddsFeat
      .join(ouFeat, Seq("id"), "left")
      .join(labels(gameRecord).select("id", "overunder"), Seq("id"), "left")
      .na.drop("any")
  }

  /** E2 inference features: recency filter (P4: `cast(id as int) > cutoff`,
    * `Predictor.py:129`) + pivot over a FIXED company list — the training
    * pivot columns, not whatever survives the filter (fixes the reference's
    * train/predict feature-drift bug, SURVEY.md §3 E2). */
  def inferenceFeatures(odds: DataFrame, companies: Seq[String], valueCols: Seq[String],
      hg: Int, idCutoff: Int): DataFrame =
    pivotFeatures(
      odds.filter(col("id").try_cast("int") > idCutoff),
      companies, valueCols, hg)
}
