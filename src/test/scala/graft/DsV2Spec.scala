package graft

import graft.sources.v2.SynthSource
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSourceV2 source: correctness of generated rows, partition
  * planning, and — the scale-critical part — that filter pushdown narrows
  * the GENERATED range and column pruning reaches the reader. */
class DsV2Spec extends AnyFunSuite with SparkTestBase {

  private def synth(rows: Long, parts: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString(";")

  test("generates deterministic rows matching the row function") {
    val rows = synth(100, 4).orderBy("id").collect()
    assert(rows.length === 100)
    val r42 = rows(42)
    assert(r42.getLong(0) === 42L)
    assert(r42.getInt(1) === SynthSource.bucketOf(42))
    assert(r42.getString(2) === SynthSource.categoryOf(42))
    assert(r42.getDouble(3) === SynthSource.valueOf(42))
  }

  test("plans the requested number of input partitions, contiguous coverage") {
    val df = synth(1000, 8)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 1000)
    // ids are a partition-local ascending sequence; union covers [0, 1000)
    assert(df.agg(min("id"), max("id"), countDistinct("id")).collect()(0)
      .toSeq === Seq(0L, 999L, 1000L))
  }

  test("id-range filters are pushed into the scan (generation narrowed)") {
    val df = synth(100000, 8).filter(col("id") >= 90000L && col("id") < 95000L)
    val desc = scanDescription(df)
    assert(desc.contains("ids=[90000,95000)"), desc)
    assert(df.count() === 5000)
    // equality pushes to a single-id range
    val one = synth(100000, 8).filter(col("id") === 1234L)
    assert(scanDescription(one).contains("ids=[1234,1235)"), scanDescription(one))
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(1234L))
  }

  test("non-id predicates stay as residuals and still evaluate correctly") {
    val df = synth(10000, 4).filter(col("id") >= 5000L && col("category") === "c3")
    assert(scanDescription(df).contains("ids=[5000,10000)"), scanDescription(df))
    val got = df.count()
    val expected = (5000L until 10000L).count(_ % 7 == 3)
    assert(got === expected)
  }

  test("column pruning reaches the reader (pruned schema in scan)") {
    val df = synth(1000, 2).select("category")
    val desc = scanDescription(df)
    assert(desc.contains("cols=category"), desc)
    assert(!desc.contains("value"), desc)
    assert(df.distinct().count() === 7)
  }

  test("empty range after contradictory pushdown yields zero partitions") {
    val df = synth(1000, 8).filter(col("id") >= 900L && col("id") < 100L)
    assert(df.count() === 0)
  }
}
