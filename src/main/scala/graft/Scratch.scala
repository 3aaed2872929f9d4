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
    // (a) batch: minhash + banding only
    val docs = Tables.documents(spark, d)
    val banded = streaming.StreamingNearDup.bandedStream(docs, "doc_id", "text", 64, 8, 3)
    time("batch banding warm")(banded.write.format("noop").mode("overwrite").save())
    time("batch banding")(banded.write.format("noop").mode("overwrite").save())
    // (b) streaming run, default state store
    def runStreaming(label: String): Unit = time(label) {
      operators.SystemQueries.q63StreamNearDup.fn(spark, d).count()
    }
    runStreaming("stream neardup 1")
    runStreaming("stream neardup 2")
    // (c) with fewer shuffle partitions for state
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    runStreaming("stream neardup p8")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
