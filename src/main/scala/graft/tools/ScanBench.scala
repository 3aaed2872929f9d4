package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: graft-store SCAN throughput micro-benchmark — full-width and
  * narrow-projection reads over an sf0.1-lineitem-sized table, the
  * feedback loop for reader/decoder optimization (run before and after,
  * compare rows/s). */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_scanbench"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_tax")
      .repartition(8)
      .write.format("graft-store").mode("overwrite").save(dir)
    val n = spark.read.format("graft-store").load(dir).count()
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val reps = 5
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      val s = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[scanbench] $label: $s%.3f s  (${n / s / 1e6}%.2f M rows/s)")
    }
    val src = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_tax")
      .repartition(8).cache()
    src.count() // materialize the cache so write timing isolates the sink
    time("write 9-col table")(
      src.write.format("graft-store").mode("overwrite").save(dir + "_w"))
    src.unpersist()
    val df = spark.read.format("graft-store").load(dir)
    time("full-width agg")(
      df.agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)),
        sum("l_tax"), max("l_linestatus"), max("l_returnflag"),
        sum("l_orderkey"), sum("l_partkey"), sum("l_suppkey")).collect())
    time("narrow 2-col agg")(
      df.agg(sum("l_quantity"), sum("l_suppkey")).collect())
    time("filter + narrow")(
      df.filter(col("l_returnflag") === "R")
        .agg(sum("l_extendedprice")).collect())
    spark.stop()
  }
}
