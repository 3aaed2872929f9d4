package graft.soccer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade mirroring the reference's entry points
  * (`XGBoost/Predictor.py:36-172`): a user of SoccerPredictor switches to
  * this object and keeps their workflow — train per (team, home/away),
  * persist keyed models, batch-predict recent games.
  *
  * Tables load from a directory of parquet files named like the reference's
  * Kudu tables (`team_list`, `game_record`, `game_odds`, `game_overunder`).
  */
class SoccerPredictor(spark: SparkSession, dataDir: String, modelDir: String) {

  private def table(name: String): DataFrame =
    spark.read.parquet(s"$dataDir/$name")

  /** E1: `Predictor.train_flat(team_id, hg)` — returns held-out accuracy. */
  def trainFlat(teamName: String, teamId: String, hg: Int, maxIter: Int = 100): Double = {
    val ts = Features.flatTrainingSet(table("game_record"), table("game_odds"), teamName, hg)
    val res = SoccerMl.train(ts, "flat", multiclass = true, maxIter = maxIter)
    SoccerMl.save(res.model, SoccerMl.modelPath(modelDir, teamId, hg, "flat"))
    res.accuracy
  }

  /** E1: `Predictor.train_overunder(team_id, hg)`. */
  def trainOverUnder(teamName: String, teamId: String, hg: Int, maxIter: Int = 100): Double = {
    val ts = Features.overUnderTrainingSet(
      table("game_record"), table("game_odds"), table("game_overunder"), teamName, hg)
    val res = SoccerMl.train(ts, "overunder", multiclass = false, maxIter = maxIter)
    SoccerMl.save(res.model, SoccerMl.modelPath(modelDir, teamId, hg, "overunder"))
    res.accuracy
  }

  /** E2: `Predictor.predict_flat()` — recent games (`cast(id as int) >
    * cutoff`, reference `Predictor.py:129`), pivoted over the TRAINING
    * company list persisted in the model's assembler (no feature drift). */
  def predictFlat(teamId: String, hg: Int, idCutoff: Int = 1600000): DataFrame = {
    val model = SoccerMl.load(SoccerMl.modelPath(modelDir, teamId, hg, "flat"))
    val companies = trainedCompanies(model)
    val feats = Features.inferenceFeatures(
      table("game_odds"), companies, Features.oddsValueCols, hg, idCutoff)
      .na.drop("any")
    SoccerMl.predict(model, feats)
  }

  /** The company list the model was trained with, recovered from the
    * persisted VectorAssembler's input columns (`{value}_{hg}_{company}`). */
  private[soccer] def trainedCompanies(model: org.apache.spark.ml.PipelineModel): Seq[String] = {
    val assembler = model.stages.collectFirst {
      case a: org.apache.spark.ml.feature.VectorAssembler => a
    }.getOrElse(throw new IllegalStateException("model has no VectorAssembler stage"))
    // input cols are "{value}_{hg}_{company}" — strip the known value-col
    // prefix + the hg digit instead of splitting on '_', so company names
    // containing underscores (e.g. "Bet_365") round-trip intact
    val knownValues = (Features.oddsValueCols ++ Features.ouValueCols).sortBy(-_.length)
    assembler.getInputCols.toSeq
      .map { c =>
        knownValues.find(v => c.startsWith(v + "_")) match {
          case Some(v) =>
            val rest = c.drop(v.length + 1) // "{hg}_{company}"
            rest.dropWhile(_.isDigit).stripPrefix("_")
          case None =>
            throw new IllegalStateException(s"feature column '$c' matches no known value column")
        }
      }
      .distinct
  }
}
