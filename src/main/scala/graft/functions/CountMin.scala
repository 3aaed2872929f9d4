package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Count-min sketch (Cormode & Muthukrishnan '05) as a native
  * [[TypedImperativeAggregate]] — the second custom-aggregate alongside
  * [[MisraGriesAgg]], covering the other classic frequency-sketch family
  * (per-item count ESTIMATES, where Misra-Gries gives candidate SETS).
  *
  * Buffer: a flat `depth × width` Long counter matrix. Update hashes the
  * item once per row r with Spark's own xxhash64 chain
  * (`seed 42 → hashInt(r) → hashBytes(item)`), so the probe side can be the
  * plain SQL `xxhash64(lit(r), col)` — see [[CountMinAgg.estimate]], a pure
  * Catalyst expression over the sketch as a literal array.
  *
  * Guarantees: estimate(x) ≥ true count ALWAYS (counters only ever add);
  * estimate(x) ≤ true count + ε·n with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. Because merge is elementwise addition
  * — commutative and associative with no pruning step — the final sketch is
  * BIT-IDENTICAL under any partitioning or merge order (stronger than
  * Misra-Gries, whose surviving SET is order-sensitive), which is what makes
  * CMS-based queries hash-checkable end to end.
  *
  * Scale shape: each partition folds its rows into the fixed O(depth·width)
  * matrix; the shuffle moves one serialized matrix per partition, never
  * rows. depth=4 × width=2048 is 64 KiB — constant regardless of corpus
  * size.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, "cms_sketch: depth must be in [1,16]")
  require(width > 0, "cms_sketch: width must be > 0")

  override def prettyName: String = "cms_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    var r = 0
    while (r < depth) {
      // exactly Spark's xxhash64(lit(r), item) chain: int arg, then bytes
      val seeded = XXH64.hashInt(r, 42L)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seeded)
      buf(r * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
      r += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box(_).asInstanceOf[AnyRef]))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  /** Column-API aggregate entry: `cms_sketch(col, depth, width)` →
    * array<long> of depth×width counters. */
  def apply(c: Column, depth: Int, width: Int): Column =
    graftshim.toColumn(
      CountMinAgg(graftshim.toExpression(c), depth, width).toAggregateExpression())

  /** Point estimate of `c`'s frequency from a materialized sketch, as a
    * pure codegen expression (min over the depth rows of the counter each
    * row's hash lands on). The hash here is the SQL `xxhash64(r, c)` —
    * by construction identical to what [[CountMinAgg.update]] incremented,
    * so `estimate(sketch, x) ≥ exact(x)` holds as an engine-checkable
    * invariant. The sketch ships as one literal array (64 KiB at 4×2048),
    * broadcast with the plan — no join, no shuffle to probe. */
  def estimate(sketch: Seq[Long], c: Column, depth: Int, width: Int): Column = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    val lit_ = typedLit(sketch)
    val rows = (0 until depth).map { r =>
      element_at(lit_, (lit(r.toLong * width) + pmod(xxhash64(lit(r), c), lit(width.toLong))).cast("int") + 1)
    }
    if (rows.length == 1) rows.head else least(rows: _*)
  }
}
