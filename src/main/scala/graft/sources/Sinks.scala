package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sources & sinks (SURVEY.md §2.1).
  *
  * The reference's write model is Kudu upsert-by-primary-key, one SQL
  * round-trip per row (`Spider/GameSpider.py:187-202`). On an append-only
  * columnar store the same semantics are batch merge + key resolution —
  * no per-row round trips, one shuffle on the key.
  */
object Sinks {

  /** S3: upsert semantics — merge `updates` into `existing` by `keys`,
    * newer rows (higher `versionCol`) win; within a version, updates beat
    * existing. Plans as union + window rank on the key partition: a single
    * hash shuffle on the PK, the distributed equivalent of Kudu's
    * tablet-side upsert (or Delta MERGE where available). */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val tagged = existing.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** S3 whitelist guard (`GameSpider.py:193-196`): refuse unknown tables. */
  def guardedWrite(df: DataFrame, table: String, allowed: Set[String], path: String): Unit = {
    require(allowed.contains(table), s"table '$table' not in whitelist $allowed")
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/$table")
  }

  /** S8: the reference's Excel dump (`Predictor.py:132,159`) → headered CSV
    * (the faithful-capability columnar-text sink). */
  def csvSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Latest-version view of an append-only keyed table (dedup-on-read:
    * the read-side half of upsert-by-PK on immutable storage). */
  def latestByKey(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}

/** Ingest-boundary readers for pre-scraped files (S4-S7): scraping itself
  * (Selenium/Chrome) is an external concern; the engine ingests its output.
  */
object ScrapeIngest {

  /** S5's in-row regex (`analysis/(\d+)`, `GameSpider.py:95-97`) applied
    * distributed; S6's positional zip of Live/Initial odds rows replaced by
    * a keyed equi-join on (game_id, odds_company) (J4 — by-position zip is
    * fragile under reordering; keys are not). */
  def joinLiveInitial(live: DataFrame, initial: DataFrame): DataFrame =
    live.join(initial, Seq("id", "odds_company"), "inner")

  /** Read a pre-scraped CSV of game records with the reference schema. */
  def readGameRecords(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true")
      .schema(graft.soccer.Schemas.gameRecord)
      .csv(path)

  /** P10 (`GameSpider.py:88,174,182`): keep only rows whose split array has
    * exactly the expected arity — scraped rows with missing cells drop out
    * distributed instead of crashing a parse. */
  def filterValidRows(df: DataFrame, arrCol: String, expectedLen: Int): DataFrame =
    df.filter(size(col(arrCol)) === expectedLen)

  /** Extract the numeric match id from an analysis-page URL column. */
  def withMatchId(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("match_id", regexp_extract(col(urlCol), "analysis/(\\d+)", 1))

  /** Quarantine-style permissive CSV ingestion: malformed rows (wrong
    * arity, unparseable cells under the typed schema) land in a corrupt-
    * record column instead of failing the job — at web-scrape scale some
    * fraction of rows is ALWAYS malformed, and one bad line must not kill
    * a 100 TB load. Returns the parsed frame with a `_corrupt` column;
    * split with [[splitCorrupt]] to route the quarantine to a dead-letter
    * sink while clean rows continue. */
  def readCsvPermissive(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(withCorrupt)
      .csv(path)
  }

  /** (clean rows without the corrupt column, quarantined raw lines).
    * Spark refuses queries that reference ONLY the corrupt-record column of
    * a raw file scan (the parser would have to re-run ambiguously), so the
    * parsed frame is cached first — callers unpersist either half once the
    * dead-letter write and the main pipeline have consumed them. */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (cached.filter(col("_corrupt").isNull).drop("_corrupt"),
      cached.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw_line")))
  }
}
