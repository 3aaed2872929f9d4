package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("TopK.perGroup equals the window row_number form") {
    val custom = TopK.perGroup(li,
      Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)),
      k = 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val viaWindow = li
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    assert(custom.count() === viaWindow.count())
    assert(custom.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(custom).count() === 0)
  }

  test("plan: two-phase custom exec, no Window, sort only over pruned data") {
    val df = TopK.perGroup(li, Seq("l_returnflag"), Seq(("l_quantity", true)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window"), plan)
    // the final phase's spillable sort sits ABOVE the exchange: it sorts
    // the k·groups·partitions survivors, never the input (no sort below
    // the exchange / above the scan)
    val sortIdx = plan.indexOf("Sort ")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(sortIdx >= 0 && exchangeIdx >= 0, plan)
    assert(sortIdx < exchangeIdx, s"sort must be above the exchange:\n$plan")
    assert(plan.indexOf("Sort ", sortIdx + 1) === -1, s"exactly one sort:\n$plan")
  }

  test("partial-phase flush bound: tiny flushRows still yields exact results") {
    // many groups per partition × low flush threshold → the partial phase
    // flushes repeatedly mid-stream; extra partial survivors must be
    // re-pruned by the final phase to the identical answer
    import spark.implicits._
    val n = 100000
    val df = (0 until n).map(i => ((i * 2654435761L % 9973L), i.toLong, (i % 7).toDouble))
      .toDF("g", "id", "v")
    spark.conf.set("spark.graft.topk.flushRows", "1000")
    try {
      val custom = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 3)
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      assert(custom.count() === viaWindow.count())
      assert(custom.exceptAll(viaWindow).count() === 0)
      assert(viaWindow.exceptAll(custom).count() === 0)
    } finally spark.conf.unset("spark.graft.topk.flushRows")
  }

  test("auto-rewrite: window row_number<=k + drop(rn) becomes TopKPerGroup") {
    TopK.enableAutoRewrite(spark)
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val idiom = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .drop("rn")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    // and it still computes the right answer
    val direct = TopK.perGroup(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    assert(idiom.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(idiom).count() === 0)
  }

  test("auto-rewrite does NOT fire when rn stays in the output (q13 shape)") {
    TopK.enableAutoRewrite(spark)
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_orderkey").asc)
    val keepsRank = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_returnflag", "l_orderkey", "rn")
    val plan = keepsRank.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("TopKPerGroup"), plan.take(1500))
    assert(keepsRank.count() === 9) // 3 groups x 3
  }

  test("auto-rewrite does NOT fire above spark.graft.topk.maxK (memory gate)") {
    TopK.enableAutoRewrite(spark)
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_orderkey").asc)
    def idiom = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50).drop("rn")
      .select("l_returnflag", "l_orderkey")
    spark.conf.set("spark.graft.topk.maxK", "10")
    try {
      val gated = idiom.queryExecution.executedPlan.toString
      assert(!gated.contains("TopKPerGroup"), gated.take(1500))
      assert(gated.contains("Window") || gated.contains("WindowGroupLimit"), gated.take(1500))
    } finally spark.conf.unset("spark.graft.topk.maxK")
    // default bound (1000) lets k=50 through
    val open = idiom.queryExecution.executedPlan.toString
    assert(open.contains("TopKPerGroup"), open.take(1500))
  }

  test("handles ties, k larger than group, and empty input") {
    val tiny = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = TopK.perGroup(tiny, Seq("g"), Seq(("v", true)), 10)
    assert(got.count() === 4) // k > group size keeps everything
    val top1 = TopK.perGroup(tiny, Seq("g"), Seq(("v", true)), 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(top1 === Map("a" -> 1, "b" -> 9))
    val empty = TopK.perGroup(tiny.filter(col("v") > 100), Seq("g"), Seq(("v", true)), 2)
    assert(empty.count() === 0)
  }
}
