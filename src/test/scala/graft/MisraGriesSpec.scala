package graft

import graft.ext.HeavyHitters
import graft.functions.MisraGriesAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite with SparkTestBase {

  /** Skewed corpus: items h0..h4 are heavy (1000+ each), t0..t999 are a
    * long tail of singletons-to-rare items. */
  private def skewed = {
    import spark.implicits._
    val heavy = (0 until 5).flatMap(i => Seq.fill(1000 + i * 100)(s"h$i"))
    val tail = (0 until 1000).flatMap(i => Seq.fill(1 + i % 3)(s"t$i"))
    scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(heavy ++ tail).toDF("item")
  }

  test("summary contains every true heavy hitter (superset guarantee, across partitions)") {
    val df = skewed.repartition(8) // forces partial/merge + serde through the shuffle
    val cands = df.agg(MisraGriesAgg(col("item"), 64).as("c"))
      .collect()(0).getSeq[String](0).toSet
    (0 until 5).foreach(i => assert(cands.contains(s"h$i"), s"h$i missing from $cands"))
    assert(cands.size <= 64)
  }

  test("two-pass frequentItems equals exact group-by HAVING, any partitioning") {
    val df = skewed
    val n = df.count()
    val phi = 0.05
    def exact = df.groupBy("item").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences").cast("double") >= lit(phi) * lit(n.toDouble))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    Seq(1, 4, 16).foreach { p =>
      val got = HeavyHitters.frequentItems(df.repartition(p), "item", phi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === exact, s"partitioning $p")
    }
  }

  test("mg_topk is callable from SQL via the registry (analyzer wraps the aggregate)") {
    graft.functions.Registry.register(spark)
    skewed.createOrReplaceTempView("mg_items")
    val cands = spark.sql("SELECT mg_topk(item, 64) AS c FROM mg_items")
      .collect()(0).getSeq[String](0).toSet
    (0 until 5).foreach(i => assert(cands.contains(s"h$i"), cands.toString))
  }

  test("null inputs are ignored; empty input yields empty summary") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("item")
    val cands = withNulls.agg(MisraGriesAgg(col("item"), 4).as("c"))
      .collect()(0).getSeq[String](0)
    assert(cands.toSet === Set("a", "b"))
    val empty = Seq.empty[String].toDF("item")
      .agg(MisraGriesAgg(col("item"), 4).as("c")).collect()(0).getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("property sweep: superset guarantee holds for random streams, splits and merge orders") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { trial =>
      val k = 4 + rnd.nextInt(40)
      val nItems = 200 + rnd.nextInt(2000)
      // zipf-ish: item id = floor of pareto draw → few hot items, long tail
      val stream = Seq.fill(nItems)(s"i${(1.0 / math.pow(rnd.nextDouble().max(1e-9), 0.7)).toInt}")
      val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)
      // random partitioning + random merge order, exactly like a shuffle
      val parts = stream.grouped(1 + rnd.nextInt(stream.size)).toSeq
      val summaries = parts.map { p =>
        p.foldLeft(agg.createAggregationBuffer()) { (buf, item) =>
          agg.update(buf, InternalRow(UTF8String.fromString(item)))
        }
      }
      val merged = rnd.shuffle(summaries).reduceLeft { (a, b) =>
        // serde through the shuffle, as execution would
        agg.merge(a, agg.deserialize(agg.serialize(b)))
      }
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val mustHave = counts.filter(_._2 > nItems.toDouble / (k + 1)).keys
      val got = merged.keySet.map(_.toString)
      mustHave.foreach { item =>
        assert(got.contains(item),
          s"trial $trial: heavy item $item (${counts(item)}/$nItems, k=$k) lost; got $got")
      }
      assert(merged.size <= k, s"trial $trial: summary exceeded k=$k")
    }
  }

  test("k bounds the summary size even under adversarial distinct-heavy input") {
    import spark.implicits._
    val allDistinct = (0 until 5000).map(i => s"u$i").toDF("item").repartition(8)
    val cands = allDistinct.agg(MisraGriesAgg(col("item"), 10).as("c"))
      .collect()(0).getSeq[String](0)
    assert(cands.size <= 10)
  }
}
