package graft.soccer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic soccer-domain fixtures (FIXTURES.md §A): ~24 games ×
  * 12 bookmakers with fractional odds, duplicate (id, company) rows (so the
  * pivot's mean is observable), off-vocabulary labels, NULL odds cells, and
  * ids straddling the reference's 1.5M/1.6M recency cutoffs.
  */
object Fixtures {

  private val teams = Seq(
    "19" -> "Arsenal", "20" -> "Chelsea", "21" -> "Liverpool", "22" -> "Everton")

  private val companies =
    (1 to 12).map(i => s"Comp$i") // Comp1 most prolific … Comp12 least

  def teamList(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(teams.map { case (id, n) => Row(id, n) }),
      Schemas.teamList)

  /** 60 games: Arsenal alternates home/away vs the other teams. */
  def gameRecord(spark: SparkSession): DataFrame = {
    val rng = new scala.util.Random(42)
    val rows = (0 until 60).map { i =>
      val id = (1490000 + i * 10000).toString // straddles 1.5M and 1.6M cutoffs
      val home = if (i % 2 == 0) "Arsenal" else teams(1 + i % 3)._2
      val away = if (i % 2 == 0) teams(1 + i % 3)._2 else "Arsenal"
      val flat = (i % 8) match {
        case 7 => "Postponed" // off-vocabulary → NULL label
        case k if k % 3 == 0 => "Win"
        case k if k % 3 == 1 => "Draw"
        case _ => "Loss"
      }
      val ou = if (i % 11 == 10) "Void" else if (rng.nextBoolean()) "Over" else "Under"
      val asia = if (i % 3 == 0) "0.5/1" else f"${rng.nextInt(3) * 0.25}%.2f"
      Row(id, "Premier League", f"2019-08-${10 + i % 20}%02d", "19:30",
        home, s"${i % 4}-${i % 3}", away, s"${i % 2}-${i % 2}", asia, ou, flat)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.gameRecord)
  }

  /** Odds rows: Comp1-Comp10 cover every game (so post-pivot dropna keeps
    * most rows, like the reference's dense bookmaker data), Comp11/Comp12
    * cover a third (stay outside top-10), Comp1 has duplicate (id, company)
    * rows (pivot mean observable), Comp2..Comp10 tie on count (tie-break
    * observable), fractional strings and rare NULLs sprinkled in. */
  def gameOdds(spark: SparkSession): DataFrame = {
    val rng = new scala.util.Random(43)
    val rows = for {
      i <- 0 until 60
      (comp, ci) <- companies.zipWithIndex
      if ci < 10 || (i + ci) % 3 == 0
      dup <- 0 to (if (ci == 0 && i % 4 == 0) 1 else 0) // duplicates for Comp1
    } yield {
      val id = (1490000 + i * 10000).toString
      def v(): String =
        if (rng.nextInt(300) == 0) null
        else if (rng.nextInt(6) == 0) f"${1.5 + rng.nextInt(3) * 0.25}%.2f/${2.0 + rng.nextInt(2) * 0.5}%.2f"
        else f"${1.2 + rng.nextDouble() * 2}%.2f"
      val _ = dup
      Row(id, comp, v(), v(), v(), v(), v(), v())
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.gameOdds)
  }

  def gameOverUnder(spark: SparkSession): DataFrame = {
    val rng = new scala.util.Random(44)
    val rows = for {
      i <- 0 until 60
      (comp, ci) <- companies.zipWithIndex
      if ci < 10 || (i + ci) % 3 == 0
    } yield {
      val id = (1490000 + i * 10000).toString
      def v(): String =
        if (rng.nextInt(300) == 0) null else f"${0.8 + rng.nextDouble()}%.2f"
      def line(): String = if (i % 3 == 0) "2.5/3" else "2.5"
      Row(id, comp, v(), line(), v(), v(), line(), v())
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.gameOverUnder)
  }
}
