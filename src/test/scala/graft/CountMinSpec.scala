package graft

import graft.functions.CountMinAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch guarantees under adversarial partitioning. */
class CountMinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val depth = 4
  private val width = 256

  // deterministic zipf-ish corpus: item i appears ~1000/i times
  private lazy val corpus = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    .toDF("token")

  private def sketchOf(parts: Int): Seq[Long] =
    corpus.repartition(parts)
      .agg(CountMinAgg(col("token"), depth, width).as("sk"))
      .collect()(0).getSeq[Long](0)

  test("sketch is bit-identical under any partitioning (merge = add)") {
    val s1 = sketchOf(1)
    assert(s1.length === depth * width)
    assert(sketchOf(7) === s1)
    assert(sketchOf(13) === s1)
  }

  test("estimates never undercount, for every distinct item") {
    val sk = sketchOf(5)
    val bad = corpus.groupBy("token").agg(count(lit(1)).as("n_exact"))
      .filter(CountMinAgg.estimate(sk, col("token"), depth, width) < col("n_exact"))
      .count()
    assert(bad === 0L)
  }

  test("probe hash chain matches update hash chain exactly (zero-collision case)") {
    // single distinct item, wide sketch: every depth row holds the exact
    // count in exactly one counter — the probe must find it. A probe/update
    // hash mismatch would land on an empty counter and estimate 0.
    val one = Seq.fill(1000)("only").toDF("token")
    val sk = one.agg(CountMinAgg(col("token"), depth, 4096).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk.count(_ != 0L) === depth) // one hot counter per row
    val est = one.limit(1)
      .select(CountMinAgg.estimate(sk, col("token"), depth, 4096).as("e"))
      .collect()(0).getLong(0)
    assert(est === 1000L)
  }

  test("overshoot bounded by collisions: estimate - exact <= 3n/width here") {
    val n = corpus.count()
    val bound = math.ceil(3.0 * n / width).toLong
    val sk = sketchOf(5)
    val over = corpus.groupBy("token").agg(count(lit(1)).as("n_exact"))
      .filter(CountMinAgg.estimate(sk, col("token"), depth, width) - col("n_exact") > lit(bound))
      .count()
    assert(over === 0L)
  }

  test("SQL surface: cms_sketch registered and usable in spark.sql") {
    graft.functions.Registry.register(spark)
    corpus.createOrReplaceTempView("cms_corpus")
    val sk = spark.sql(s"SELECT cms_sketch(token, $depth, $width) FROM cms_corpus")
      .collect()(0).getSeq[Long](0)
    assert(sk === sketchOf(3))
  }
}
