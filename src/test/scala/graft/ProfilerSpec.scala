package graft

import graft.ext.Profiler
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite with SparkTestBase {

  test("profiles nulls, distincts and native-typed extrema in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(10L), Some("b"), Some(2.5)),
      (Some(2L), None, Some(10.25)),
      (None, Some("a"), None),
      (Some(10L), Some("a"), Some(-1.0)))
      .toDF("k", "s", "v")
    val got = Profiler.profile(df, Seq("k", "s", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("k") === ((3L, 1L, 2L, "2", "10")))   // numeric min, not lexicographic "10" < "2"
    assert(got("s") === ((3L, 1L, 2L, "a", "b")))
    assert(got("v") === ((3L, 1L, 3L, "-1.00", "10.25")))
  }

  test("approx mode: cardinalities within HLL tolerance, no Expand fan-out") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong % 500, s"s${i % 137}", i.toDouble))
      .toDF("k", "s", "v")
    val got = Profiler.profile(df, Seq("k", "s", "v"), exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // rsd = 0.02; allow 3 sigma
    assert(math.abs(got("k") - 500L) <= 500 * 0.06, got)
    assert(math.abs(got("s") - 137L) <= 137 * 0.06 + 1, got)
    assert(math.abs(got("v") - 2000L) <= 2000 * 0.06, got)
    // the whole point of the mode: exact multi-distinct pays an Expand
    // (scan output × distinct columns before the shuffle); approx must not
    val exactPlan = Profiler.profile(df, Seq("k", "s", "v"))
      .queryExecution.optimizedPlan.toString
    val approxPlan = Profiler.profile(df, Seq("k", "s", "v"), exact = false)
      .queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan)
    assert(!approxPlan.contains("Expand"), approxPlan)
  }

  test("single scan: one aggregate over the input, no per-column jobs") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = Profiler.profile(df, Seq("a", "b")).queryExecution.optimizedPlan.toString
    // exactly one Aggregate chain over one scan of the local relation
    assert(plan.linesIterator.count(_.trim.startsWith("+- LocalRelation")) +
      plan.linesIterator.count(_.trim.startsWith("LocalRelation")) <= 1, plan)
  }
}
