package graft.soccer

import org.apache.spark.sql.types._

/** Typed schemas for the five reference tables (`SQL/DDL_SQL:1-56`).
  *
  * Naming resolves the reference's DDL-vs-code conflicts (SURVEY.md §1.3):
  * DDL names win (`host_team`/`guest_team`/`odds_company`/`win_draw_lose`);
  * the code aliases (`host_t`, `odd_comp`, `flat`) are applied at the query
  * boundary where the reference used them. All columns are StringType at
  * ingest, faithful to the all-STRING Kudu DDL — numeric semantics are
  * applied by explicit (try_)casts at feature boundaries (§1.2).
  */
object Schemas {

  private def strings(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** `team_list` (`DDL_SQL:1-5`), PK (team_id). */
  val teamList: StructType = strings("team_id", "name")

  /** `game_record` (`DDL_SQL:7-20`), PK (id). */
  val gameRecord: StructType = strings(
    "id", "league", "game_date", "game_time", "host_team", "full_score",
    "guest_team", "half_score", "asia_odds", "total_overunder", "win_draw_lose")

  /** `game_record_url` (`DDL_SQL:22-32`), PK (id). */
  val gameRecordUrl: StructType = strings(
    "id", "host_homepage", "game_record_page", "guest_homepage", "analysis_page",
    "asia_odds_page", "euro_odds_page", "overunder_odds_page")

  /** `game_odds` (`DDL_SQL:34-44`), PK (id, odds_company). Positional value
    * columns named as the reference reads them (`XGBoost/Predictor.py:237`). */
  val gameOdds: StructType = strings(
    "id", "odds_company", "final_win", "final_draw", "final_lose",
    "initial_win", "initial_draw", "initial_lose")

  /** `game_overunder` (`DDL_SQL:46-56`), PK (id, odds_company). */
  val gameOverUnder: StructType = strings(
    "id", "odds_company", "initial_over", "initial_line", "initial_under",
    "final_over", "final_line", "final_under")
}
