package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    val q = ext.TextAnalysis.withQuality(ext.ensureParallelism(docs), "text")
    noop(q); time("quality only")(noop(q))
    val l = ext.TextAnalysis.withLangId(ext.ensureParallelism(docs), "text")
    noop(l); time("langid only")(noop(l))
    val ql = ext.TextAnalysis.withLangId(ext.TextAnalysis.withQuality(ext.ensureParallelism(docs), "text"), "text")
    noop(ql); time("quality+langid")(noop(ql))
    val filt = ql.filter(col("quality_score") >= 0.2 && col("pred_lang") === "en")
      .withColumn("fp", md5(ext.normText(col("text"))))
    noop(filt); time("+filter+fp")(noop(filt))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy(col("doc_id").asc)
    val kept = filt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    noop(kept); time("+window")(noop(kept))
    val q52 = ext.ExtQueries.q52Curation.fn(spark, d)
    noop(q52); time("q52 full")(noop(q52))
    spark.stop()
  }
}
