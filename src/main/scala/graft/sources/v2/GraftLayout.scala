package graft.sources.v2

import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Physical layout declared by a graft-store table's `#partition=` header:
  * a LIST of partition transforms, Iceberg's partition-spec model. Each
  * element is either
  *
  *   - an IDENTITY transform (a bare column name) — one file per value
  *     (Hive-style). Right for low-cardinality keys; the writer fails
  *     loudly past 1000 combinations/task;
  *   - a BUCKET transform `bucket(n,col)` — one file per
  *     `murmur3(value) mod n` bucket. This is the HIGH-CARDINALITY
  *     storage-partitioned-join path: a 10^9-key join co-locates on n
  *     buckets instead of 10^9 directories, and two tables bucketed
  *     (same n, join key) join with ZERO exchange on either side.
  *
  * Composites mix freely — `date,bucket(8,key)` is the canonical
  * lakehouse layout (time-partitioned + key-bucketed): files group by
  * (date value, bucket id), so date predicates prune AND key joins
  * co-locate. The header string is the canonical serialized form,
  * compared by the append layout guard after parse → render
  * normalization. */
private[v2] sealed trait PartSpec {
  /** Every table column this transform reads (identity: one; bucket: 1+). */
  def cols: Seq[String]
  def render: String
}
private[v2] case class IdentitySpec(col: String) extends PartSpec {
  override def cols: Seq[String] = Seq(col)
  override def render: String = col
}
/** `bucket(n, a[, b, ...])`: one file per murmur3 bucket of the column
  * tuple. Multi-column buckets (Hive-bucketing style) co-locate a
  * COMPOSITE join key at bounded file count — `bucket(16, a, b)` is 16
  * files where `bucket(4,a),bucket(4,b)` would be 16 as a grid with each
  * single-key equality only pruning one axis. */
private[v2] case class BucketSpec(n: Int, bucketCols: Seq[String]) extends PartSpec {
  require(n > 0, s"graft-store: bucket count must be positive, got $n")
  require(bucketCols.nonEmpty, "graft-store: bucket spec needs at least one column")
  override def cols: Seq[String] = bucketCols
  override def render: String = s"bucket($n,${bucketCols.mkString(",")})"
}
private[v2] object BucketSpec {
  /** Single-column convenience (the overwhelmingly common call shape). */
  def apply(n: Int, col: String): BucketSpec = BucketSpec(n, Seq(col))
}

/** Temporal transform `years|months|days|hours(col)` over date/timestamp
  * columns — the Iceberg temporal partition family, the canonical
  * lakehouse layout for event streams (`days(ts)` alone, or
  * `days(ts),bucket(8,key)` for time + key co-location). The derived
  * value is UNITS SINCE EPOCH (Iceberg's convention): days/hours divide
  * the internal representation directly, months/years go through
  * calendar arithmetic. Crucially the transform is MONOTONIC
  * non-decreasing in the source value, so RANGE predicates on the raw
  * column project through to ranges on partition values — `ts >= A AND
  * ts < B` prunes files by day without touching stats. */
private[v2] case class TemporalSpec(unit: String, col: String) extends PartSpec {
  require(GraftTransform.Units.contains(unit),
    s"graft-store: unknown temporal unit '$unit'")
  override def cols: Seq[String] = Seq(col)
  override def render: String = s"$unit($col)"
}

/** `truncate(w, col)` — Iceberg's truncate transform: numeric values
  * floor to a multiple of `w` (monotonic ⇒ range predicates project),
  * strings keep their first `w` characters (prefix grouping for id-like
  * keys). */
private[v2] case class TruncateSpec(w: Long, col: String) extends PartSpec {
  require(w >= 1, s"graft-store: truncate width must be >= 1, got $w")
  override def cols: Seq[String] = Seq(col)
  override def render: String = s"truncate($w,$col)"
}

/** Shared transform evaluation — ONE definition for the write-side
  * router, the scan's partition-value pruning, and (for ranges) the
  * predicate projection, so every component agrees bit-for-bit. */
private[v2] object GraftTransform {
  val Units: Set[String] = Set("years", "months", "days", "hours")
  val MicrosPerHour = 3600000000L
  val MicrosPerDay = 86400000000L

  /** Derived units-since-epoch of one NON-NULL internal value
    * (DateType ⇒ Int epoch days, TimestampType ⇒ Long micros). */
  def temporal(unit: String, dt: DataType, v: Any): Long = {
    val days: Long = dt match {
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        unit match {
          case "hours" => return Math.floorDiv(micros, MicrosPerHour)
          case "days" => return Math.floorDiv(micros, MicrosPerDay)
          case _ => Math.floorDiv(micros, MicrosPerDay)
        }
      case DateType =>
        val d = v.asInstanceOf[Int].toLong
        unit match {
          case "days" => return d
          case _ => d
        }
      case other => throw new UnsupportedOperationException(
        s"graft-store: temporal layout unsupported for ${other.simpleString}")
    }
    val ld = java.time.LocalDate.ofEpochDay(days)
    unit match {
      case "months" => (ld.getYear - 1970) * 12L + (ld.getMonthValue - 1)
      case "years" => ld.getYear - 1970L
      case u => throw new IllegalStateException(u) // hours/days returned above
    }
  }

  def truncLong(v: Long, w: Long): Long = Math.floorDiv(v, w) * w
  def truncString(s: UTF8String, w: Long): UTF8String =
    s.substring(0, math.min(w, Int.MaxValue).toInt)

  def supportsTemporal(unit: String, dt: DataType): Boolean = dt match {
    case TimestampType => true
    case DateType => unit != "hours" // sub-day units of a date are meaningless
    case _ => false
  }
  def supportsTruncate(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }
}

private[v2] case class GraftLayout(specs: Seq[PartSpec]) {
  require(specs.nonEmpty, "graft-store: empty partition layout")
  def render: String = specs.map(_.render).mkString(",")
  def columns: Seq[String] = specs.flatMap(_.cols)
}

private[v2] object GraftLayout {
  private val BucketRe = """(?i)bucket\s*\(\s*(\d+)\s*,\s*([^)]+)\)""".r
  private val TemporalRe = """(?i)(years|months|days|hours)\s*\(\s*([^\s),]+)\s*\)""".r
  private val TruncateRe = """(?i)truncate\s*\(\s*(\d+)\s*,\s*([^\s),]+)\s*\)""".r

  /** Split on commas NOT inside parentheses (bucket(8,k) is one token). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb.append('(')
      case ')' => depth -= 1; sb.append(')')
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  def parse(s: String): GraftLayout =
    GraftLayout(splitTop(s.trim).map {
      case BucketRe(n, colList) =>
        // limit -1 keeps trailing empty tokens: "bucket(4,a,)" must trip
        // the require below, not silently become bucket(4,a)
        val cs = colList.split(",", -1).map(_.trim).toSeq
        require(cs.nonEmpty && cs.forall(c => c.nonEmpty && !c.exists(_.isWhitespace)),
          s"graft-store: cannot parse bucket column list '$colList'")
        BucketSpec(n.toInt, cs)
      case TemporalRe(unit, col) => TemporalSpec(unit.toLowerCase, col)
      case TruncateRe(w, col) => TruncateSpec(w.toLong, col)
      case other if other.toLowerCase.matches("""bucket\s*\(.*""") =>
        // a malformed bucket CALL must not silently become an identity
        // layout on a column literally named "bucket(...)" — bucket(8)
        // (no column) and bucket(x,a) (non-numeric count) land here. A
        // plain column that merely STARTS with "bucket" (bucket_tier) is
        // a legitimate identity column and falls through
        throw new IllegalArgumentException(
          s"graft-store: cannot parse bucket spec '$other' — expected " +
            "bucket(<n>,<col>[,<col>...])")
      case other if other.toLowerCase
          .matches("""(years|months|days|hours|truncate)\s*\(.*""") =>
        // same discipline for the transform calls: malformed must fail,
        // a plain column named days_total is identity and falls through
        throw new IllegalArgumentException(
          s"graft-store: cannot parse partition transform '$other' — expected " +
            "years|months|days|hours(<col>) or truncate(<w>,<col>)")
      case col => IdentitySpec(col)
    })
}

/** The bucket hash — ONE definition shared by the write-side router, the
  * scan's partition-value typing, and the catalog's V2 `bucket` function,
  * so every component that ever computes a bucket id agrees bit-for-bit
  * (a writer/function mismatch would silently break storage-partitioned
  * joins when Spark re-shuffles one side with the V2 function).
  *
  * Int/date values widen to long before hashing so `bucket(n, int_col)`
  * and `bucket(n, bigint_col)` agree on equal keys — joins routinely
  * compare int keys against bigint keys. Strings hash their UTF-8 bytes.
  * Null hashes to NO bucket (the caller keeps a dedicated null partition);
  * equi-joins never match nulls, so a null partition never co-locates
  * with anything and that is correct. */
object GraftBucket {
  import scala.util.hashing.MurmurHash3
  private val Seed = 0x5f5e1f3

  /** Raw (pre-mod) murmur3 of one value — the building block both the
    * single-column bucket (mod n directly, byte-stable with every manifest
    * ever written) and the multi-column combine below share. */
  private def rawLong(v: Long): Int = {
    val bytes = new Array[Byte](8)
    var i = 0
    while (i < 8) { bytes(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    MurmurHash3.bytesHash(bytes, Seed)
  }
  private def rawString(v: UTF8String): Int = MurmurHash3.bytesHash(v.getBytes, Seed)
  private def raw(v: Any, dt: DataType): Int = dt match {
    case LongType | TimestampType => rawLong(v.asInstanceOf[Long])
    case IntegerType | DateType => rawLong(v.asInstanceOf[Int].toLong)
    case StringType => rawString(v.asInstanceOf[UTF8String])
    case other => throw new UnsupportedOperationException(
      s"graft-store: bucket layout unsupported for type $other")
  }

  def ofLong(v: Long, n: Int): Int = math.floorMod(rawLong(v), n)
  def ofString(v: UTF8String, n: Int): Int = math.floorMod(rawString(v), n)

  /** Bucket id for a non-null value of the given type. */
  def of(v: Any, dt: DataType, n: Int): Int = math.floorMod(raw(v, dt), n)

  /** Multi-column bucket id over a value TUPLE (null elements hash to a
    * fixed sentinel — a composite equi-join never matches a null element,
    * so where those rows land cannot break co-location, and keeping them
    * in ordinary buckets avoids a null-partition explosion across the
    * column combinations). Ordered mix: bucket(n, a, b) ≠ bucket(n, b, a)
    * by construction, matching the declared spec's column order. */
  def ofTuple(vs: Seq[Option[(Any, DataType)]], n: Int): Int = {
    var h = Seed
    vs.foreach { ov =>
      h = MurmurHash3.mix(h, ov.map { case (v, dt) => raw(v, dt) }.getOrElse(0))
    }
    math.floorMod(MurmurHash3.finalizeHash(h, vs.length), n)
  }

  def supports(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | IntegerType | DateType | StringType => true
    case _ => false
  }
}

/** The `bucket(n, col)` V2 function exposed through [[GraftCatalog]]'s
  * FunctionCatalog face. This is the piece that makes BUCKETED
  * storage-partitioned joins plannable: a scan reporting
  * `KeyGroupedPartitioning(bucket(n, col))` is only usable once Catalyst
  * can resolve the named transform to a bound function
  * (V2ScanPartitioningAndOrdering resolves it against the relation's
  * function catalog — exactly how Iceberg's bucket SPJ works), and the
  * SPJ compatibility check then matches both sides on the function's
  * `canonicalName` + bucket count. `produceResult` delegates to
  * [[GraftBucket]] so a runtime evaluation (e.g. Spark hashing the
  * un-partitioned side of a join into our buckets) lands rows in exactly
  * the buckets the writer used. */
private[v2] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col[, col...]): murmur3 bucket id in [0, n) — graft-store bucket layout"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket expects (numBuckets int, value[, value...]), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be int, got ${inputType.fields(0).dataType.simpleString}")
    val dts = inputType.fields.drop(1).map(_.dataType).toSeq
    dts.foreach(dt => require(GraftBucket.supports(dt),
      s"bucket: unsupported value type ${dt.simpleString}"))
    if (dts.length == 1) new GraftBoundBucket(dts.head)
    else new GraftBoundMultiBucket(dts)
  }
}

/** Bound multi-column bucket: hashes the argument TUPLE with the same
  * ordered-mix combine the write router uses ([[GraftBucket.ofTuple]]),
  * null elements included (sentinel hash) — so a runtime evaluation lands
  * rows in exactly the files the writer routed them to. */
private[v2] class GraftBoundMultiBucket(dts: Seq[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = (IntegerType +: dts).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket.${dts.length}"
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val vs = dts.zipWithIndex.map { case (dt, j) =>
      val i = j + 1
      if (input.isNullAt(i)) None
      else Some(((dt match {
        case LongType | TimestampType => input.getLong(i)
        case IntegerType | DateType => input.getInt(i)
        case StringType => input.getUTF8String(i)
        case _ => throw new UnsupportedOperationException(dt.simpleString)
      }): Any, dt))
    }
    Int.box(GraftBucket.ofTuple(vs, n))
  }
}

private[v2] class GraftBoundBucket(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // canonicalName ignores the value type: int and bigint keys hash alike
  // (GraftBucket widens), so bucket(n, int_col) and bucket(n, long_col)
  // are genuinely the same partitioning and may SPJ against each other
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = true
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val v: Any = dt match {
      case LongType | TimestampType => input.getLong(1)
      case IntegerType | DateType => input.getInt(1)
      case StringType => input.getUTF8String(1)
      case _ => throw new UnsupportedOperationException(dt.simpleString)
    }
    Int.box(GraftBucket.of(v, dt, n))
  }
}

/** Per-file BLOOM FILTER for point-lookup file skipping — the sidecar
  * index behind a table's `bloomCols` option (Iceberg's Puffin blobs /
  * Delta's bloom filter indexes, re-expressed for the graft-store
  * manifest). Min/max stats prune range-clustered columns; a bloom prunes
  * equality lookups on HIGH-CARDINALITY, UNSORTED columns (ids, uuids,
  * join keys written in arrival order) where every file's [min,max] spans
  * the whole domain and stats skip nothing.
  *
  * Contract: `mightContain == false` is DEFINITE absence (safe to skip
  * the file); `true` means "read it". A false positive therefore costs a
  * file read, never a wrong answer. Hashing follows [[GraftBucket]]'s
  * widening rules (int==bigint on equal keys, strings hash UTF-8 bytes),
  * with k probe positions derived Kirsch–Mitzenmacher style from two
  * independent 32-bit murmurs: g_i = h1 + i*h2 (mod m).
  *
  * Sizing: m defaults to 2^17 bits (16 KiB) per column per file — at the
  * ~16k rows/file the default file sizing produces, that is ~8 bits/key
  * (k=5, ~2% fpp); larger files degrade fpp gracefully (skipping weakens,
  * correctness is untouched). */
object GraftBloomFilter {
  val DefaultBits: Int = 1 << 17
  val K: Int = 5
  private val Seed1 = 0x9747b28c
  private val Seed2 = 0x1b873593

  import scala.util.hashing.MurmurHash3

  private def bytesOf(v: Any, dt: DataType): Option[Array[Byte]] = (dt, v) match {
    // internal (writer-side) representations
    case (LongType | TimestampType, l: java.lang.Long) => Some(longBytes(l))
    case (IntegerType | DateType, i: java.lang.Integer) => Some(longBytes(i.toLong))
    case (StringType, s: UTF8String) => Some(s.getBytes)
    // external (filter-side) representations, widened identically
    case (LongType | IntegerType, n: java.lang.Number) => Some(longBytes(n.longValue))
    case (StringType, s: String) => Some(UTF8String.fromString(s).getBytes)
    case (DateType, d: java.sql.Date) =>
      Some(longBytes(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong))
    case (DateType, d: java.time.LocalDate) => Some(longBytes(d.toEpochDay))
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(longBytes(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)))
    case (TimestampType, t: java.time.Instant) =>
      Some(longBytes(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t)))
    case _ => None
  }
  private def longBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }

  /** (h1, h2) probe seeds of one value, or None for unhashable shapes
    * (those columns simply never participate in bloom skipping). */
  def hashes(v: Any, dt: DataType): Option[(Int, Int)] =
    bytesOf(v, dt).map(b => (MurmurHash3.bytesHash(b, Seed1), MurmurHash3.bytesHash(b, Seed2)))

  def supports(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | IntegerType | DateType | StringType => true
    case _ => false
  }

  def set(bits: Array[Long], h: (Int, Int)): Unit = {
    val m = bits.length * 64
    var i = 0
    while (i < K) {
      val pos = math.floorMod(h._1 + i * h._2, m)
      bits(pos >> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], h: (Int, Int)): Boolean = {
    val m = bits.length * 64
    var i = 0
    while (i < K) {
      val pos = math.floorMod(h._1 + i * h._2, m)
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBase64(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }
  def fromBase64(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}
