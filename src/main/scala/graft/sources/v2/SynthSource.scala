package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 deterministic synthetic-corpus source (`graft-synth`).
  *
  * Purpose at 100 TB scale: generate arbitrarily large, fully deterministic
  * test/benchmark corpora with ZERO storage and ZERO scan I/O — every row is
  * a pure function of its `id`. The source demonstrates (and its spec
  * asserts) the full DSv2 integration surface:
  *
  *   - `planInputPartitions`: `parts` independent id-ranges → every executor
  *     generates its slice in parallel, no driver materialization;
  *   - `SupportsPushDownRequiredColumns`: unreferenced columns are never
  *     generated (column pruning reaches the source);
  *   - `SupportsPushDownFilters`: range predicates on `id` narrow the
  *     generated id-interval itself — a filter `id >= N` produces a scan
  *     that *generates* only `[N, hi)` instead of generating-then-dropping.
  *     Pushed id-filters are exact, so Spark re-evaluates nothing for them;
  *     all other predicates stay post-scan residuals.
  *
  * Options: `rows` (default 1000), `parts` (default 8).
  *
  * Schema: id LONG, bucket INT, category STRING, value DOUBLE where
  * bucket = id % 32, category = 'c' || (id % 7),
  * value = (id * 2654435761) % 10000 / 100.0 — arithmetic chosen to be
  * exactly reproducible in any engine with 64-bit integers (the DuckDB
  * oracle replicates it over `range()`).
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Row function — the single source of truth for column values. */
  def bucketOf(id: Long): Int = (id % 32).toInt
  def categoryOf(id: Long): String = "c" + (id % 7)
  def valueOf(id: Long): Double = ((id * 2654435761L) % 10000L) / 100.0
}

private[v2] class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows rows, $parts parts)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

private[v2] class SynthScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.schema

  /** id-range filters are absorbed EXACTLY into [lo, hi); everything else is
    * returned as a residual for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    absorbed.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                 => ()
    }
    pushed = absorbed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SynthScan(lo, math.max(lo, hi), parts, required)
}

private[v2] class SynthScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth ids=[$lo,$hi) parts=$parts cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val p = math.min(parts.toLong, n).toInt
    // contiguous ranges, remainder spread over the first partitions
    val base = n / p; val rem = n % p
    var start = lo
    (0 until p).map { i =>
      val len = base + (if (i < rem) 1L else 0L)
      val part = SynthRange(start, start + len)
      start += len
      part: InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

private[v2] case class SynthRange(lo: Long, hi: Long) extends InputPartition

private[v2] class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRange]
    // pre-resolve column generators for the pruned schema only — pruned-away
    // columns are never computed
    val gens: Array[Long => Any] = required.fields.map { f =>
      f.name match {
        case "id"       => (id: Long) => id
        case "bucket"   => (id: Long) => SynthSource.bucketOf(id)
        case "category" => (id: Long) => UTF8String.fromString(SynthSource.categoryOf(id))
        case "value"    => (id: Long) => SynthSource.valueOf(id)
        case other      => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    new PartitionReader[InternalRow] {
      private var cur = r.lo - 1
      override def next(): Boolean = { cur += 1; cur < r.hi }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
