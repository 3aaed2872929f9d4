package graft

import graft.operators.{BloomPrune, Incremental, Scd2}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table-maintenance operators: SCD2 version chains across multiple
  * batches, incremental partial merges vs full recompute, and bloom
  * pruning vs the plain semi join. */
class MaintenanceSpec extends AnyFunSuite with SparkTestBase {

  test("Scd2: two batches build a correct version chain") {
    import spark.implicits._
    val dim0 = Seq((1L, "gold"), (2L, "silver"))
      .toDF("id", "tier")
      .select(col("id"), col("tier"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    // batch 1: id=1 changes, id=3 appears, id=2 update is identical (no-op)
    val u1 = Seq((1L, "platinum"), (2L, "silver"), (3L, "bronze")).toDF("id", "tier")
    val dim1 = Scd2.merge(dim0, u1, "id", Seq("tier"), batchId = 1L)
    // batch 2: id=1 reverts to gold
    val u2 = Seq((1L, "gold")).toDF("id", "tier")
    val dim2 = Scd2.merge(dim1, u2, "id", Seq("tier"), batchId = 2L)

    val rows = dim2.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(rows === Set(
      (1L, "gold", 0L, 1L, false),      // closed by batch 1
      (1L, "platinum", 1L, 2L, false),  // closed by batch 2
      (1L, "gold", 2L, -1L, true),      // current
      (2L, "silver", 0L, -1L, true),    // identical update was a no-op
      (3L, "bronze", 1L, -1L, true)))   // inserted by batch 1
    // exactly one current row per key
    val dupCurrent = dim2.filter(col("is_current")).groupBy("id")
      .count().filter(col("count") > 1).count()
    assert(dupCurrent === 0)
  }

  test("Scd2: replaying the same batch is idempotent") {
    import spark.implicits._
    val dim0 = Seq((1L, "a")).toDF("id", "v")
      .select(col("id"), col("v"), lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))
    val u = Seq((1L, "b")).toDF("id", "v")
    val once = Scd2.merge(dim0, u, "id", Seq("v"), 1L)
    val twice = Scd2.merge(once, u, "id", Seq("v"), 2L)
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).count() === 0)
  }

  test("Scd2: null attribute values compare null-safely") {
    import spark.implicits._
    val dim0 = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "v")
      .select(col("id"), col("v"), lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))
    // id=1: null -> null is a no-op; id=2: x -> null is a real change
    val u = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "v")
    val merged = Scd2.merge(dim0, u, "id", Seq("v"), 1L)
    assert(merged.count() === 3) // id=1 untouched, id=2 closed + new null version
    assert(merged.filter(col("id") === 2 && col("is_current")).collect()(0).isNullAt(1))
  }

  test("Incremental.mergePartials equals full recompute for any split") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    // double sums are compared ROUNDED, exactly as the operator contract
    // states (q91): partial-merge changes double summation order, so raw
    // bit equality is not part of the contract — cents-rounded equality is
    def finish(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderpriority"), col("n"), round(col("s"), 2).as("s"),
        col("mn"), col("mx"))
    val full = finish(orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"),
        min("o_orderdate").as("mn"), max("o_orderdate").as("mx")))
    for (m <- Seq(2, 3, 7)) {
      def part(p: Int) = orders.filter(pmod(col("o_orderkey"), lit(m)) === p)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"),
          min("o_orderdate").as("mn"), max("o_orderdate").as("mx"))
      val merged = finish((1 until m).foldLeft(part(0)) { (acc, p) =>
        Incremental.mergePartials(acc, part(p), Seq("o_orderpriority"),
          sums = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"))
      })
      assert(merged.exceptAll(full).count() === 0, s"split mod $m diverged")
      assert(full.exceptAll(merged).count() === 0, s"split mod $m diverged")
    }
  }

  test("BloomPrune.semiJoin equals the plain left-semi join") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d).filter(col("o_totalprice") > 200000)
    val pruned = BloomPrune.semiJoin(li, ord, "l_orderkey", "o_orderkey", 10000L)
    val plain = li.join(
      ord.select(col("o_orderkey").as("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_semi")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).count() === 0)
  }
}
