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
