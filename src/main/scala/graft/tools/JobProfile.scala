package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev measurement tool (optimization guide §1): run one or more declared
  * queries and break the wall-clock into Spark jobs/stages — job count,
  * per-job wall, task-time sum, shuffle bytes — so "where does the time
  * go" is answered by data, not guesswork. Jobs with no description show
  * the callsite. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.JobProfile q231_mview_mixed_chain"
  *
  * Prints per-query: total wall, job count, a per-job table (sorted by
  * wall), and a driver-gap figure (wall not covered by any running job —
  * planning/commit/FS time on the driver).
  */
object JobProfile {
  private case class JobRow(id: Int, desc: String, startNs: Long,
                            var endNs: Long = 0L,
                            var tasks: Int = 0,
                            var taskTimeMs: Long = 0L,
                            var shuffleReadB: Long = 0L,
                            var shuffleWriteB: Long = 0L)

  private class Rec extends SparkListener {
    val jobs = mutable.LinkedHashMap[Int, JobRow]()
    val stageToJob = mutable.Map[Int, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .filter(_.nonEmpty)
        .orElse(e.stageInfos.lastOption.map(_.name)) // "count at Foo.scala:12"
        .getOrElse("")
      jobs(e.jobId) = JobRow(e.jobId, desc, System.nanoTime())
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.endNs = System.nanoTime())
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += si.numTasks
          j.taskTimeMs += si.taskMetrics.executorRunTime
          j.shuffleReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shuffleWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.getOrElse("SPARK_GRAFT_PROFILE_WARMUP", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rec = new Rec
    spark.sparkContext.addSparkListener(rec)
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q231_mview_mixed_chain")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      (1 to warm).foreach { _ =>  // warmup: codegen + JIT, untimed
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      rec.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallNs = System.nanoTime() - t0
      spark.catalog.clearCache()
      // give the (async) listener bus a moment to drain late stage events
      Thread.sleep(1000)
      val rows = rec.jobs.values.toSeq
      val jobNs = rows.map(r => math.max(0L, r.endNs - r.startNs)).sum
      println(f"%n===== $name  wall=${wallNs / 1e9}%.3f s  jobs=${rows.size}  " +
        f"job-wall-sum=${jobNs / 1e9}%.3f s  driver-gap=${(wallNs - jobNs) / 1e9}%.3f s")
      println(f"${"job"}%4s ${"gap_s"}%7s ${"wall_s"}%8s ${"tasks"}%6s " +
        f"${"taskTime_s"}%11s ${"shufR_MB"}%9s ${"shufW_MB"}%9s  desc")
      // chronological with the DRIVER GAP before each job (planning, FS,
      // commit work between actions) — gap attribution is the point
      var prevEnd = t0
      rows.sortBy(_.startNs).foreach { r =>
        val gap = (r.startNs - prevEnd) / 1e9
        prevEnd = math.max(prevEnd, r.endNs)
        println(f"${r.id}%4d $gap%7.3f ${(r.endNs - r.startNs) / 1e9}%8.3f " +
          f"${r.tasks}%6d ${r.taskTimeMs / 1e3}%11.3f " +
          f"${r.shuffleReadB / 1e6}%9.2f ${r.shuffleWriteB / 1e6}%9.2f  " +
          f"${r.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
