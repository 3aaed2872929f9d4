package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable quantile sketch buffer: levelled compaction in the KLL/MRL
  * style (Karnin-Lang-Liberty '16; Manku-Rajagopalan-Lindsay '98). Level l
  * holds values of weight 2^l; a full level is sorted and every other
  * element promoted one level up (weight doubling), alternating the kept
  * offset between compactions — the DETERMINISTIC variant of KLL's coin
  * flip (no RNG in an aggregate buffer: results must be stable across
  * retries and speculative attempts). An odd element stays behind at its
  * level, so total weight always equals the exact input count.
  */
private[graft] final class KllBuffer(val cap: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(new ArrayBuffer[Double])
  var count: Long = 0L
  var flips: Long = 0L

  def insert(v: Double): Unit = {
    levels(0) += v
    count += 1
    if (levels(0).length >= 2 * cap) compact(0)
  }

  /** Sort level l, leave one element behind if odd, promote alternate
    * elements to level l+1; cascade if that overflows. */
  def compact(l: Int): Unit = {
    val lv = levels(l)
    if (lv.length < 2) return
    val arr = lv.toArray
    java.util.Arrays.sort(arr)
    lv.clear()
    val even = arr.length - (arr.length % 2)
    if (even < arr.length) lv += arr(arr.length - 1) // odd max stays, weight preserved
    if (levels.length <= l + 1) levels += new ArrayBuffer[Double]
    val off = (flips % 2).toInt
    flips += 1
    var i = off
    while (i < even) { levels(l + 1) += arr(i); i += 2 }
    val capUp = if (l + 1 == 0) 2 * cap else cap
    if (levels(l + 1).length >= capUp) compact(l + 1)
  }

  def merge(other: KllBuffer): Unit = {
    var l = 0
    while (l < other.levels.length) {
      if (levels.length <= l) levels += new ArrayBuffer[Double]
      levels(l) ++= other.levels(l)
      l += 1
    }
    count += other.count
    flips += other.flips
    l = 0
    while (l < levels.length) {
      val capHere = if (l == 0) 2 * cap else cap
      if (levels(l).length >= capHere) compact(l)
      l += 1
    }
  }

  /** Quantile estimates at `probs`: weighted rank walk over the sketch's
    * (value, 2^level) pairs. */
  def quantiles(probs: Array[Double]): Array[Double] = {
    var total = 0
    levels.foreach(total += _.length)
    if (total == 0) return probs.map(_ => Double.NaN)
    val vals = new Array[Double](total)
    val wts = new Array[Long](total)
    var j = 0
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      val lv = levels(l)
      var i = 0
      while (i < lv.length) { vals(j) = lv(i); wts(j) = w; j += 1; i += 1 }
      l += 1
    }
    // sort (value, weight) pairs by value
    val idx = (0 until total).toArray.map(i => (vals(i), wts(i))).sortBy(_._1)
    probs.map { p =>
      val target = p * count
      var cum = 0L
      var i = 0
      var ans = idx(total - 1)._1
      var found = false
      while (i < total && !found) {
        cum += idx(i)._2
        if (cum >= target) { ans = idx(i)._1; found = true }
        i += 1
      }
      ans
    }
  }
}

/** KLL-style quantile sketch as a native [[TypedImperativeAggregate]] —
  * the third custom-aggregate family alongside [[MisraGriesAgg]]
  * (frequent items) and [[CountMinAgg]] (point counts): rank/quantile
  * queries.
  *
  * Guarantee shape: with per-level capacity k, rank error is
  * O(log(n/k)/k) — at k=200 over millions of rows the observed rank error
  * is well under 1%. Deterministic compaction (alternating offset, no
  * RNG) makes the result a pure function of per-partition input order, so
  * retried tasks reproduce their buffers exactly. The estimate SET can
  * depend on merge order (like every mergeable quantile summary), so the
  * hash-checkable query pattern is the q46/q72 one: emit the EXACT
  * percentiles plus booleans asserting the sketch landed within its rank
  * bound — see q107.
  *
  * Scale shape: each partition folds its rows into an O(k log(n/k))
  * buffer, the shuffle moves only serialized sketches (a few KiB), and
  * the final merge is linear in sketch size. Contrast exact percentile:
  * a full sort (or Spark's own `percentile`, which buffers every distinct
  * value per group). eval returns `array<double>` — one estimate per
  * requested probability.
  */
case class KllQuantilesAgg(
    child: Expression,
    probs: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with UnaryLike[Expression] {

  require(k >= 8, "kll_quantiles requires k >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "kll_quantiles probabilities must be in [0,1]")

  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Number].doubleValue()
      if (!java.lang.Double.isNaN(d)) buf.insert(d)
    }
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KllBuffer): Any =
    new GenericArrayData(buf.quantiles(probs.toArray).map(_.asInstanceOf[AnyRef]))

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.cap)
    out.writeLong(buf.count)
    out.writeLong(buf.flips)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.count = in.readLong()
    buf.flips = in.readLong()
    val nLevels = in.readInt()
    var l = 0
    while (l < nLevels) {
      if (buf.levels.length <= l) buf.levels += new ArrayBuffer[Double]
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}

object KllQuantilesAgg {
  /** Column-API entry: `kll_quantiles(col, probs, k)` aggregate →
    * array<double> of quantile estimates, one per probability. */
  def apply(c: Column, probs: Seq[Double], k: Int): Column =
    graftshim.toColumn(
      KllQuantilesAgg(graftshim.toExpression(c), probs, k).toAggregateExpression())
}
