package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")), // no prior right row
    (4L, 10L, ts("2024-01-01 11:00:00"))  // exactly at a right row
  ).toDF("event_id", "user_id", "ts")

  private val right = Seq(
    (10L, ts("2024-01-01 09:30:00")),
    (10L, ts("2024-01-01 11:00:00")),
    (20L, ts("2024-01-01 09:30:00"))
  ).toDF("user_id", "ts")

  test("lastTimestampBefore: latest right ts at-or-before each left row per key") {
    val got = AsOf.lastTimestampBefore(left, right, Seq("user_id"), "ts", "asof")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3)).map(_.toString)).toMap
    assert(got(1L).contains("2024-01-01 09:30:00.0"))
    assert(got(2L).contains("2024-01-01 11:00:00.0"))
    assert(got(3L).isEmpty) // right row is later than left
    assert(got(4L).contains("2024-01-01 11:00:00.0")) // equal ts matches
  }

  test("lastTimestampWithin nulls out matches older than tolerance") {
    val got = AsOf.lastTimestampWithin(left, right, Seq("user_id"), "ts", "asof", toleranceSec = 1800)
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(got(1L).isDefined)  // 30 min gap, within tolerance
    assert(got(2L).isEmpty)    // 60 min gap, outside
    assert(got(4L).isDefined)  // 0 gap
  }

  test("SQL registry: parse_odds / dot_product / minhash_sig / simhash_bits callable from SQL") {
    graft.functions.Registry.register(spark)
    val r = spark.sql(
      """SELECT parse_odds('0.5/1') AS p,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  size(minhash_sig(array('a b c', 'b c d'), 4)) AS k,
        |  length(simhash_bits(array('x', 'y'), 60)) AS b""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 0.75)
    assert(r.getDouble(1) === 11.0)
    assert(r.getInt(2) === 4)
    assert(r.getInt(3) === 60)
  }
}
