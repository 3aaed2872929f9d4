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
    val all = Tables.documents(spark, d)
      .withColumn("toks", ext.tokens(ext.normText(col("text"))))
      .withColumn("sh", ext.shingleSql("toks", 5))
    val bench = all.filter(col("doc_id") % 50 === 0)
    val train = all.filter(col("doc_id") % 50 =!= 0)
    time("shingles only")(all.select(col("doc_id"), size(col("sh"))).write.format("noop").mode("overwrite").save())
    val benchShingles = bench.select(explode(col("sh")).as("g")).distinct()
    time("bench shingles count")(println(benchShingles.count()))
    val trainShingles = train.select(col("doc_id"), col("source"), explode(col("sh")).as("g"))
    time("train shingles count")(println(trainShingles.count()))
    val contaminated = trainShingles
      .join(broadcast(benchShingles), Seq("g"), "left_semi")
      .select("doc_id").distinct()
    time("semi join + distinct")(println(contaminated.count()))
    val out = train.join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_clean"))
    time("anti join agg")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
