package graft.sources.v2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PhaseDbg2 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $n ${(System.nanoTime()-t0)/1e9}%.3f"); r
    }
    for (sf <- Seq("/root/testdata/sf0.1", "/tmp/sfx1"); rd <- 1 to 2) {
      val path = s"/tmp/graft_store_q183dbg"
      val fsPath = new org.apache.hadoop.fs.Path(path)
      fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(fsPath, true)
      val ev = t(s"$sf-src$rd") { graft.Tables.events(spark, sf).select("ts", "event_type", "value").localCheckpoint(true) }
      t(s"$sf-write$rd") {
        ev.coalesce(2).write.format("graft-store")
          .option("partitionBy", "days(ts)").mode("overwrite").save(path)
      }
      t(s"$sf-read$rd") {
        spark.read.format("graft-store").load(path)
          .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-17 00:00:00").cast("timestamp"))
          .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      }
      println(s"$sf files=" + GraftStoreFormat.readLatestManifest(path,
        spark.sparkContext.hadoopConfiguration).get.files.size)
      ev.unpersist()
    }
    spark.stop()
  }
}
