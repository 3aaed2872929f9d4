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
    val e = Tables.embeddings(spark, d)
    time("count raw")(e.count())
    time("count raw again")(e.count())
    val b = ext.Similarity.withLshBucket(e, 8, 64).select("vec_id", "lsh_bucket")
    time("plan b")(b.queryExecution.executedPlan)
    time("bucket only count")(b.count())
    time("bucket only count2")(b.count())
    val withSize = b.join(b.groupBy("lsh_bucket").agg(count(lit(1)).as("bucket_size")), Seq("lsh_bucket"))
    time("join count")(withSize.count())
    time("join count2")(withSize.count())
    // custom TopK vs window row_number, steady state (2nd run each)
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, d)
    def windowTopK() = li.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, col("l_orderkey").asc)))
      .filter(col("rn") <= 5).drop("rn")
    def customTopK() = plans.TopK.perGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true)), 5)
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    noop(windowTopK()); noop(customTopK())
    time("window topk per suppkey")(noop(windowTopK()))
    time("custom topk per suppkey")(noop(customTopK()))
    spark.stop()
  }
}
