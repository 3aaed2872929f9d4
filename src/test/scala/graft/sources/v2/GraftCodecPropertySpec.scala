package graft.sources.v2

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep for the graft-store row codec: rows of every supported
  * type — including the adversarial corners (empty/huge/multibyte strings,
  * extreme longs, NaN/±Inf/-0.0, null-dense rows) — must round-trip the
  * length-framed binary format bit-exactly. The codec underlies every
  * store feature (snapshots, SPJ, skipping), so this is the foundation
  * the rest stands on. Seeded sweep, the FunctionsSpec pattern. */
class GraftCodecPropertySpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("ts", TimestampType), StructField("dt", DateType)))

  private val evilChars = "Å愛é\n\t|:%x \\\"".toCharArray

  private def genString(rng: scala.util.Random): String = rng.nextInt(4) match {
    case 0 => ""
    case 1 => rng.alphanumeric.take(rng.nextInt(40)).mkString
    case 2 => Array.fill(rng.nextInt(20))(evilChars(rng.nextInt(evilChars.length))).mkString
    case _ => "x" * 10000
  }

  private def orNull(rng: scala.util.Random, v: => Any): Any =
    if (rng.nextInt(4) == 0) null else v

  private def genRow(rng: scala.util.Random): Seq[Any] = Seq(
    orNull(rng, rng.nextInt(3) match {
      case 0 => Long.MinValue; case 1 => Long.MaxValue; case _ => rng.nextLong()
    }),
    orNull(rng, rng.nextInt()),
    orNull(rng, rng.nextInt(5) match {
      case 0 => Double.NaN; case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity; case 3 => -0.0
      case _ => rng.nextDouble() * 1e300
    }),
    orNull(rng, if (rng.nextInt(4) == 0) Float.NaN else rng.nextFloat() * 1e30f),
    orNull(rng, rng.nextBoolean()),
    orNull(rng, UTF8String.fromString(genString(rng))),
    orNull(rng, rng.nextLong()),
    orNull(rng, rng.nextInt()))

  test("row codec round-trips arbitrary rows bit-exactly") {
    val rng = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val rows = Seq.fill(20)(genRow(rng))
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      rows.foreach(r => GraftStoreFormat.writeRow(out, InternalRow.fromSeq(r), schema))
      out.flush()
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      val back = Iterator.continually(GraftStoreFormat.readRow(in, schema))
        .takeWhile(_ != null).map(_.toSeq).toList
      assert(back.size === rows.size)
      back.zip(rows).foreach { case (got, want) =>
        got.zip(want).zipWithIndex.foreach { case ((g, w), idx) =>
          (g, w) match {
            case (gd: Double, wd: Double) =>
              assert(java.lang.Double.doubleToRawLongBits(gd)
                === java.lang.Double.doubleToRawLongBits(wd), s"field $idx")
            case (gf: Float, wf: Float) =>
              assert(java.lang.Float.floatToRawIntBits(gf)
                === java.lang.Float.floatToRawIntBits(wf), s"field $idx")
            case _ => assert(g === w, s"field $idx")
          }
        }
      }
    }
  }

  test("stat wire format round-trips arbitrary strings") {
    val rng = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      // 64-char writer cap doesn't apply here: the wire format itself must
      // survive anything the writer chooses to put in it
      val stats = (0 until rng.nextInt(6)).map(_ =>
        rng.nextInt(32) -> (genString(rng), genString(rng))).toMap
      assert(GraftStoreFormat.statsFromString(
        GraftStoreFormat.statsToString(stats)) === stats)
    }
  }
}
