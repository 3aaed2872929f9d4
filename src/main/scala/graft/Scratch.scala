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
    val orders = Tables.orders(spark, d)
    println("[scratch] orders partitions: " + orders.rdd.getNumPartitions)
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val p1 = ext.Profiler.profile(orders, cols)
    noop(p1); time("profile as-is")(noop(p1))
    val p2 = ext.Profiler.profile(ext.ensureParallelism(orders), cols)
    noop(p2); time("profile repartitioned")(noop(p2))
    val p3 = ext.Profiler.profile(orders.coalesce(1), Seq("o_orderkey"))
    noop(p3); time("profile single col")(noop(p3))
    spark.stop()
  }
}
