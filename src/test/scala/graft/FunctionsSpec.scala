package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F1-F3 scalar semantics (reference `DAO/ImpalaCon.py:95-99`,
  * `XGBoost/Predictor.py:30-31`) — unit + property tests. */
class FunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def parseOne(s: String): Option[Double] = {
    val r = Seq(s).toDF("v").select(parseOdds(col("v")).as("p")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("F1: fractional odds 'a/b' -> (a+b)/2") {
    assert(parseOne("0.5/1").contains(0.75))
    assert(parseOne("1.8/1.9").contains(1.85))
    assert(parseOne("2.05").contains(2.05))
  }

  test("F1: multi-slash takes first two parts like Python split (date mangling preserved)") {
    // the reference would coerce a date cell too: (2019+8)/2
    assert(parseOne("2019/08/10").contains(1013.5))
  }

  test("F1: malformed input -> NULL (reference keeps original; typed column can't)") {
    assert(parseOne("abc").isEmpty)
    assert(parseOne("a/b").isEmpty)
    assert(parseOne("1.5/").isEmpty) // Python IndexError -> pass
    assert(parseOne("").isEmpty)
  }

  test("F1: custom Expression and column-composition forms agree") {
    val inputs = Seq("0.5/1", "3/2", "x", "2.5", "1/2/3", "", "7/")
    val df = inputs.toDF("v")
      .select(parseOdds(col("v")).as("a"), parseOddsCompose(col("v")).as("b"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch for row $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("F1 property: random a/b always averages (seeded sweep)") {
    val rng = new scala.util.Random(7)
    val cases = Seq.fill(50)((rng.nextDouble() * 200 - 100, rng.nextDouble() * 200 - 100))
    val strs = cases.map { case (a, b) => f"$a%.3f/$b%.3f" }
    val expected = strs.map { s =>
      val Array(a, b) = s.split("/"); (a.toDouble + b.toDouble) / 2
    }
    val got = strs.toDF("v").select(parseOdds(col("v")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
  }

  test("F2/F3: label encodings with NULL off-vocabulary") {
    val rows = Seq("Win", "Draw", "Loss", "Postponed", "Over", "Under")
      .toDF("v")
      .select(encodeFlat(col("v")).as("flat"), encodeOverUnder(col("v")).as("ou"))
      .collect()
    assert(rows.map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("3"), Some("1"), Some("0"), None, None, None))
    assert(rows.map(r => Option(r.getString(1))).toSeq ===
      Seq(None, None, None, None, Some("1"), Some("0")))
  }

  test("F9: pivot column naming") {
    assert(pivotColName("final_win", 0, "Comp1") === "final_win_0_Comp1")
  }

  test("DotProduct matches HOF aggregate fold and nulls on length mismatch") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0), Seq(2.0))).toDF("a", "b")
    val got = df.select(DotProduct(col("a"), col("b")).as("d")).collect()
    assert(got(0).getDouble(0) === 32.0)
    assert(got(1).getDouble(0) === 2.0)
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d")).collect()
    assert(mismatch(0).isNullAt(0))
  }

  test("native expressions stay inside whole-stage codegen (no fallback)") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(parseOdds(concat_ws("/", col("l_linenumber"), col("l_suppkey"))).as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected WholeStageCodegen span:\n$plan")
    val sketch = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(DotProduct(typedLit(Seq(1.0, 2.0)), typedLit(Seq(3.0, 4.0))).as("d"),
        SimHashBits(split(col("text"), " "), 60).as("sh"))
    val plan2 = sketch.queryExecution.executedPlan.toString
    assert(plan2.contains("*("), s"expected WholeStageCodegen span:\n$plan2")
  }

  test("hash60 equals the SQL conv(substring(md5,1,15),16,10) derivation") {
    val strs = Seq("abc", "", "shingle one two", "0:x")
    val viaSql = strs.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val viaJvm = strs.map { s =>
      md.reset(); md.update(s.getBytes("UTF-8"))
      graft.functions.SketchSupport.hash60(md)
    }
    assert(viaSql.toSeq === viaJvm)
  }

  test("Hash60Array equals the per-element transform(md5 conv) HOF chain") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "", "x")),
      (2L, Seq.empty[String])).toDF("id", "sh")
    val got = df.select(col("id"),
        graft.functions.Hash60Array(col("sh")).as("h"),
        expr("transform(sh, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint))").as("ref"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
      s"row ${r.getLong(0)} diverged"))
  }

  test("WinnowMins/WinnowExtents equal the slice+array_min HOF windows") {
    // ties (leftmost-min), short arrays (< w -> empty), strictly
    // decreasing and increasing runs
    val arrays = Seq(
      Seq(5L, 3L, 3L, 7L, 1L, 9L, 2L, 2L),
      Seq(1L, 2L, 3L),                      // shorter than the window
      Seq(4L, 4L, 4L, 4L),                  // all ties
      Seq(9L, 8L, 7L, 6L, 5L, 4L),
      Seq.empty[Long])
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "h")
    val mins = df.select(col("id"),
        graft.functions.WinnowMins(col("h"), 4).as("got"),
        expr("""IF(size(h) >= 4,
          | transform(sequence(0, size(h) - 4), i -> array_min(slice(h, i + 1, 4))),
          | array())""".stripMargin).as("ref"))
      .collect()
    mins.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
      s"winnow_mins diverged on id ${r.getLong(0)}"))
    val ext = df.select(col("id"),
        graft.functions.WinnowExtents(col("h"), 4).as("got"),
        expr("""IF(size(h) >= 4,
          | transform(sequence(0, size(h) - 4), i -> struct(
          |   i + array_position(slice(h, i + 1, 4), array_min(slice(h, i + 1, 4))) AS pos,
          |   array_min(slice(h, i + 1, 4)) AS fp)),
          | array())""".stripMargin).as("ref"))
      .selectExpr("id",
        "transform(got, s -> concat(s.pos, ':', s.fp)) AS g",
        "transform(ref, s -> concat(s.pos, ':', s.fp)) AS r")
      .collect()
    ext.foreach(r => assert(r.getSeq[String](1) === r.getSeq[String](2),
      s"winnow_extents diverged on id ${r.getLong(0)}"))
  }

  test("winnow kernels stay inside whole-stage codegen") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.functions.WinnowMins(
        graft.functions.Hash60Array(split(col("text"), " ")), 4).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected WholeStageCodegen span:\n$plan")
  }
}
