package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions.
  *
  * The sketch math (MinHash, SimHash, dot products) is definable with Spark's
  * higher-order functions, but HOF lambdas evaluate INTERPRETED — one boxed
  * expression-tree walk per array element. For K×|shingles| md5 calls per
  * document that interpretation dominated runtime ~10×. These expressions
  * keep the same engine-portable semantics (md5-derived 60-bit hashes, see
  * `graft.ext` package doc) but run the inner loop as compiled Java: one
  * static call per row from generated code (`doGenCode`), zero per-element
  * interpretation.
  */
object SketchSupport {
  /** 60-bit positive hash = first 15 hex digits of md5, as the SQL
    * `cast(conv(substring(md5(x),1,15),16,10) as bigint)` computes it:
    * big-endian first 8 bytes, dropping the 16th nibble. */
  @inline def hash60(md: MessageDigest): Long = {
    val d = md.digest()
    val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    h >>> 4
  }

  /** Same value as [[hash60]] but the digest lands in a caller-owned
    * buffer — `MessageDigest.digest()` otherwise allocates a fresh 16-byte
    * array per call, and the minhash kernel makes K×|shingles| calls per
    * row (the hottest allocation site of the whole dedup pipeline). */
  @inline private def hash60Into(md: MessageDigest, d: Array[Byte]): Long = {
    md.digest(d, 0, 16)
    val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    h >>> 4
  }

  private val localMd = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val localDigestBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))
  // the "k:" hash-prefix byte tables, built once per K (they were built per
  // ROW before — numHashes small byte arrays + string formats per document)
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixesFor(numHashes: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(numHashes,
      k => Array.tabulate(k)(i => s"$i:".getBytes("UTF-8")))

  /** MinHash signature over a shingle array: sig[k] = min over shingles of
    * hash60(md5(k + ":" + shingle)); null entries when the array is empty. */
  def minHashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(new Array[java.lang.Long](numHashes))
    val md = localMd.get()
    val buf = localDigestBuf.get()
    val mins = Array.fill(numHashes)(java.lang.Long.MAX_VALUE)
    val prefixes = prefixesFor(numHashes)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).getBytes
      var k = 0
      while (k < numHashes) {
        md.reset()
        md.update(prefixes(k))
        md.update(s)
        val h = hash60Into(md, buf)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): AnyRef))
  }

  /** SimHash bit-string over a token array (multiset semantics): bit j is
    * '1' iff sum over tokens of ±1 (by bit j of hash60(md5(token))) > 0. */
  def simHashBits(toks: ArrayData, bits: Int): UTF8String = {
    val md = localMd.get()
    val buf = localDigestBuf.get()
    val acc = new Array[Int](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val h = hash60Into(md, buf)
      var j = 0
      while (j < bits) {
        acc(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(bits)
    var j = 0
    while (j < bits) { sb.append(if (acc(j) > 0) '1' else '0'); j += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Dot product of two double arrays, left-to-right accumulation (same
    * fold order as `aggregate(zip_with(..))` and DuckDB's dot). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  /** Per-element 60-bit hash of a string array — the compiled form of
    * `transform(arr, x -> cast(conv(substring(md5(x),1,15),16,10) as bigint))`
    * (see [[hash60]] for the bit-equality argument): one digest into a
    * thread-local buffer per element, no hex-string materialization, no
    * per-element lambda interpretation. Null elements map to null. */
  def hash60Array(arr: ArrayData): ArrayData = {
    val md = localMd.get()
    val buf = localDigestBuf.get()
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        out(i) = java.lang.Long.valueOf(hash60Into(md, buf))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-window minima of a bigint array — winnowing's inner loop
    * (Schleimer et al., SIGMOD '03), the compiled single pass equal to
    * `IF(size(h) >= w, transform(sequence(0, size(h)-w),
    *    i -> array_min(slice(h, i+1, w))), array())`:
    * no per-window slice allocation, no lambda interpretation. Minima
    * skip null elements exactly as `array_min` does (an all-null window
    * yields a null entry); fewer than w elements yields the empty array. */
  def winnowMins(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var best = Long.MaxValue
      var seen = false
      var j = i
      while (j < i + w) {
        if (!h.isNullAt(j)) {
          val v = h.getLong(j)
          if (!seen || v < best) { best = v; seen = true }
        }
        j += 1
      }
      out(i) = if (seen) java.lang.Long.valueOf(best) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** POSITIONAL winnowing window pass: per window, the struct
    * `(pos = i + array_position(slice(h,i+1,w), min), fp = min)` with the
    * LEFTMOST occurrence of the window minimum — the compiled form of the
    * 3-slice + 2×array_min + array_position HOF chain, one pass total.
    * `pos` is 1-based absolute (bestIndex + 1), matching the SQL identity
    * i + (bestIndex - i + 1). An all-null window yields (null, null)
    * exactly as the HOF chain does. */
  def winnowExtents(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var best = Long.MaxValue
      var bestAt = -1
      var j = i
      while (j < i + w) {
        if (!h.isNullAt(j)) {
          val v = h.getLong(j)
          if (bestAt < 0 || v < best) { best = v; bestAt = j }
        }
        j += 1
      }
      out(i) =
        if (bestAt < 0)
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](null, null))
        else
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any]((bestAt + 1).toLong, java.lang.Long.valueOf(best)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(shingles, K)` → array<bigint> of K minima. */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    SketchSupport.minHashSig(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SketchSupport.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.minHashSig($c, $numHashes);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, numHashes: Int): Column =
    graftshim.toColumn(MinHashSignature(graftshim.toExpression(c), numHashes))
}

/** `simhash_bits(tokens, bits)` → bit-string of length `bits`. */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(v: Any): Any =
    SketchSupport.simHashBits(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SketchSupport.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.simHashBits($c, $bits);")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(c: Column, bits: Int): Column =
    graftshim.toColumn(SimHashBits(graftshim.toExpression(c), bits))
}

/** `dot_product(array<double>, array<double>)` → double (null on length
  * mismatch or null input). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchSupport.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SketchSupport.getClass.getName.stripSuffix("$")
    val boxed = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = $cls.dot($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    graftshim.toColumn(DotProduct(graftshim.toExpression(a), graftshim.toExpression(b)))
}

/** `hash60_array(array<string>)` → array<bigint>: per-element
  * `cast(conv(substring(md5(x),1,15),16,10) as bigint)`, compiled. */
case class Hash60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "hash60_array"

  override def nullSafeEval(v: Any): Any =
    SketchSupport.hash60Array(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SketchSupport.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hash60Array($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Hash60Array =
    copy(child = newChild)
}

object Hash60Array {
  def apply(c: Column): Column =
    graftshim.toColumn(Hash60Array(graftshim.toExpression(c)))
}

/** `winnow_mins(array<bigint>, w)` → array<bigint> of per-window minima. */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(v: Any): Any =
    SketchSupport.winnowMins(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SketchSupport.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.winnowMins($c, $w);")
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowMins {
  def apply(c: Column, w: Int): Column =
    graftshim.toColumn(WinnowMins(graftshim.toExpression(c), w))
}

/** `winnow_extents(array<bigint>, w)` → array<struct<pos:bigint,fp:bigint>>
  * of per-window (leftmost-min position, min) pairs. */
case class WinnowExtents(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = true),
    StructField("fp", LongType, nullable = true))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_extents"

  override def nullSafeEval(v: Any): Any =
    SketchSupport.winnowExtents(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SketchSupport.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.winnowExtents($c, $w);")
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowExtents =
    copy(child = newChild)
}

object WinnowExtents {
  def apply(c: Column, w: Int): Column =
    graftshim.toColumn(WinnowExtents(graftshim.toExpression(c), w))
}
