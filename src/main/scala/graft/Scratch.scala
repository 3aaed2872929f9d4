package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // force-enable runtime bloom filters with tiny thresholds so local-scale
      // plans show what a 100TB plan would do
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d).filter(col("o_totalprice") > 450000)
    // disable broadcast so the join is a shuffle join (runtime filter target)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    j.explain("formatted")
    println("---- optimized ----")
    println(j.queryExecution.optimizedPlan.toString.take(4000))
    spark.stop()
  }
}
