package graft.soccer

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, OneVsRest}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML lifecycle (SURVEY.md §2.8, reference `XGBoost/Predictor.py:89-172`):
  * gradient-boosted classification over the pivoted odds features.
  *
  * Parity mapping:
  *  - M1 `train_test_split(test_size=0.6, random_state=2)` →
  *    `randomSplit(Array(0.4, 0.6), seed=2)` (yes, 60% held OUT, faithful
  *    to the reference's quirky split).
  *  - M2 `XGBClassifier(max_depth=2, n_estimators=100, lr=0.1)` →
  *    `GBTClassifier(maxDepth=2, maxIter, stepSize=0.1)` in a `Pipeline`
  *    after `VectorAssembler`; Spark GBT is binary-only so the 3-class
  *    win/draw/loss model wraps it in `OneVsRest` (capability, not
  *    algorithm, is the parity bar — both are depth-2 boosted trees).
  *  - M3 `model.score` → MulticlassClassificationEvaluator(accuracy).
  *  - M4 `model.predict` → `model.transform` (distributed, no collect).
  *  - M5 `'{team}_{hg}_{kind}'` artifact keys → PipelineModel directories.
  *
  * The feature column list is captured inside the persisted pipeline
  * (VectorAssembler.inputCols), fixing the reference's train/predict
  * feature-drift bug (SURVEY.md §3 E2).
  */
object SoccerMl {

  val trainFraction: Array[Double] = Array(0.4, 0.6) // test_size=0.6
  val seed: Long = 2L

  /** Build the boosted pipeline over `featureCols` predicting string-digit
    * `labelCol`. `multiclass=true` wraps GBT in OneVsRest. */
  def pipeline(featureCols: Seq[String], labelCol: String,
      multiclass: Boolean, maxIter: Int = 100): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("label")
      .setStringOrderType("alphabetAsc") // deterministic label index
      .setHandleInvalid("skip") // rows with labels unseen at fit time drop at transform
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setMaxDepth(2).setMaxIter(maxIter).setStepSize(0.1)
      .setLabelCol("label").setFeaturesCol("features").setSeed(seed)
    val learner =
      if (multiclass) new OneVsRest().setClassifier(gbt)
        .setLabelCol("label").setFeaturesCol("features")
      else gbt
    new Pipeline().setStages(Array(indexer, assembler, learner))
  }

  case class TrainResult(model: PipelineModel, accuracy: Double, nTrain: Long, nTest: Long)

  /** M1+M2+M3: split, fit, score. */
  def train(features: DataFrame, labelCol: String, multiclass: Boolean,
      maxIter: Int = 100): TrainResult = {
    val Array(train, test) = features.randomSplit(trainFraction, seed)
    val model = pipeline(
      features.columns.filterNot(c => c == "id" || c == labelCol).toSeq,
      labelCol, multiclass, maxIter).fit(train)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(model.transform(test))
    TrainResult(model, acc, train.count(), test.count())
  }

  /** M4: distributed batch predict; returns id + predicted label index.
    * Skips the label-indexer stage — inference features carry no labels
    * (the reference's E2 path), so only assembler + learner apply. */
  def predict(model: PipelineModel, features: DataFrame): DataFrame =
    model.stages
      .filterNot(_.isInstanceOf[org.apache.spark.ml.feature.StringIndexerModel])
      .foldLeft(features)((df, stage) => stage.transform(df))
      .select(col("id"), col("prediction"))

  /** M5: artifact key `{team}_{hg}_{kind}` → directory. */
  def modelPath(baseDir: String, teamId: String, hg: Int, kind: String): String =
    s"$baseDir/${teamId}_${hg}_$kind"

  def save(model: PipelineModel, path: String): Unit = model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)
}
