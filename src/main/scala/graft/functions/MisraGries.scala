package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native
  * [[TypedImperativeAggregate]] — the engine's custom-AGGREGATE extension
  * category (alongside its custom scalar Expressions and custom physical
  * operator).
  *
  * Semantics: maintains at most `k` (item, count) counters over a string
  * column. Guarantee (Misra-Gries '82): every item with true frequency
  * > n/(k+1) is PRESENT in the final summary; counters underestimate by at
  * most n/(k+1). Merge uses the mergeable-summaries construction (Agarwal
  * et al. '12): sum counters, then subtract the (k+1)-th largest count and
  * drop non-positives — the error bound adds up to still n/(k+1) overall.
  *
  * Scale shape: each partition folds its rows into an O(k) map (partial
  * aggregation), the shuffle moves only serialized O(k) summaries, and the
  * final merge is O(k log k). Contrast with exact group-by-count: a full
  * shuffle of the corpus keyed by item. The summary's item SET can depend
  * on merge order (only the superset guarantee is order-independent), so
  * exact pipelines re-count the ≤ k candidates in a cheap second pass —
  * see [[graft.ext.HeavyHitters]].
  *
  * eval returns the candidate items sorted lexicographically
  * (`array<string>`); counts are deliberately not exposed — they are
  * lower-bound estimates and downstream exact recount is the documented
  * pattern.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "mg_topk requires k > 0")

  override def prettyName: String = "mg_topk"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // clone: the UTF8String may point into a reused row buffer
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item.clone(), 1L)
      case None =>
        // classic MG: a non-resident item decrements every counter
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (it, c) => if (c <= 0) dead += it }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (it, c) => buf.update(it, buf.getOrElse(it, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, keep positives (≤ k survive)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace((_, c) => c - sub)
      buf.foreach { case (it, c) => if (c <= 0) dead += it }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val items = buf.keys.toArray
    java.util.Arrays.sort(items, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(items.map(_.asInstanceOf[AnyRef]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, c) =>
      val bytes = it.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** Column-API entry: `mg_topk(col, k)` aggregate → array<string> of
    * candidate heavy hitters. */
  def apply(c: Column, k: Int): Column =
    graftshim.toColumn(
      MisraGriesAgg(graftshim.toExpression(c), k).toAggregateExpression())
}
