package graft

import graft.functions.{KllBuffer, KllQuantilesAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL-style quantile sketch: rank-error guarantees across distributions,
  * partitionings, and the local buffer in isolation. */
class KllSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** True rank error of each estimate against the sorted data. A repeated
    * value occupies the whole rank interval [#{x < v}, #{x <= v}]/n — any p
    * inside it is error 0 (on few-distinct data no value can land closer). */
  private def rankErrors(data: Seq[Double], ests: Seq[Double]): Seq[Double] = {
    val sorted = data.sorted
    val n = sorted.size.toDouble
    ps.zip(ests).map { case (p, est) =>
      val lo = sorted.count(_ < est) / n
      val hi = sorted.count(_ <= est) / n
      if (p >= lo && p <= hi) 0.0 else math.min(math.abs(p - lo), math.abs(p - hi))
    }
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Double] =
    df.agg(KllQuantilesAgg(col("x"), ps, k).as("q"))
      .collect()(0).getSeq[Double](0)

  test("rank error < 2% on uniform, skewed, and few-distinct data (k=200)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      "uniform" -> Seq.fill(50000)(rnd.nextDouble()),
      "lognormal-ish" -> Seq.fill(50000)(math.exp(rnd.nextGaussian() * 2)),
      "few distinct" -> Seq.fill(50000)((rnd.nextInt(10) + 1).toDouble),
      "sorted input" -> (1 to 50000).map(_.toDouble))
    cases.foreach { case (name, data) =>
      val ests = sketch(data.toDF("x").repartition(8), 200)
      val errs = rankErrors(data, ests)
      assert(errs.forall(_ <= 0.02), s"$name rank errors: $errs")
    }
  }

  test("estimates are identical to 1 partition vs 32 partitions within rank bound") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(20000)(rnd.nextGaussian())
    val e1 = sketch(data.toDF("x").coalesce(1), 128)
    val e32 = sketch(data.toDF("x").repartition(32), 128)
    // merge order may legitimately change the estimate VALUES; both must
    // stay inside the rank bound (that is the sketch's actual contract)
    assert(rankErrors(data, e1).forall(_ <= 0.02))
    assert(rankErrors(data, e32).forall(_ <= 0.02))
  }

  test("grouped aggregation: per-group sketches independent and in-bound") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 30000).map { i =>
      val g = i % 3
      (s"g$g", rnd.nextDouble() * (g + 1) * 100)
    }
    val df = rows.toDF("g", "x").repartition(16)
    val out = df.groupBy("g").agg(KllQuantilesAgg(col("x"), ps, 200).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val data = grp.map(_._2)
      assert(rankErrors(data, out(g)).forall(_ <= 0.02), s"group $g")
    }
  }

  test("nulls and NaNs are skipped; small inputs exact") {
    val df = Seq[java.lang.Double](1.0, null, 2.0, Double.NaN, 3.0).toDF("x")
    val ests = df.agg(KllQuantilesAgg(col("x"), Seq(0.0, 0.5, 1.0), 64).as("q"))
      .collect()(0).getSeq[Double](0)
    // 3 valid values, buffer far below capacity → exact order statistics
    assert(ests(1) === 2.0)
    assert(ests(2) === 3.0)
  }

  test("local buffer preserves total weight exactly through compactions") {
    val buf = new KllBuffer(16)
    val rnd = new scala.util.Random(11)
    (1 to 100000).foreach(_ => buf.insert(rnd.nextDouble()))
    assert(buf.count === 100000L)
    val totalWeight = buf.levels.zipWithIndex
      .map { case (lv, l) => lv.length.toLong * (1L << l) }.sum
    assert(totalWeight === 100000L)
    // sketch stays small: O(k log(n/k)) items, nowhere near n
    assert(buf.levels.map(_.length).sum < 16 * 2 * 16)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = KllQuantilesAgg(
      org.apache.spark.sql.graftshim.toExpression(col("x")), ps, 32)
    val buf = new KllBuffer(32)
    val rnd = new scala.util.Random(5)
    (1 to 5000).foreach(_ => buf.insert(rnd.nextDouble() * 1000))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.count === buf.count)
    assert(back.levels.map(_.toSeq) === buf.levels.map(_.toSeq))
    assert(back.quantiles(ps.toArray).toSeq === buf.quantiles(ps.toArray).toSeq)
  }
}
