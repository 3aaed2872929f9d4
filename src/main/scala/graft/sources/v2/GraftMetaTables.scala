package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES for graft-store, addressed through the
  * catalog as `cat.` + "tbl$history" / "tbl$files": snapshot log and
  * current file inventory as queryable DataFrames. Both are driver-side
  * manifest reads (metadata is O(snapshots + files), never data bytes), so
  * they surface as [[LocalScan]]s — Spark plans them as LocalTableScan,
  * no executor round trip for information that already sits on the
  * driver. This is the SQL face of [[GraftStoreOps.history]] /
  * [[GraftStoreOps.snapshotFiles]]. */
private[v2] object GraftMetaTables {

  val historySchema: StructType = StructType(Seq(
    StructField("snapshot", IntegerType, nullable = false),
    StructField("millis", LongType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("partition", StringType),
    StructField("cluster", StringType),
    StructField("txn", StringType)))

  val filesSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    // physical column count; null = full table width (see GraftFileEntry)
    StructField("ncols", IntegerType),
    StructField("part_vals", StringType)))

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  def history(path: String, conf: Configuration): Table = {
    val rows = GraftStoreFormat.listManifests(path, conf).zipWithIndex.map {
      case (p, i) =>
        val m = GraftStoreFormat.readManifestFile(path, conf, p)
        InternalRow(i, m.millis, m.files.size, m.files.map(_.rows).sum,
          m.partitionCol.map(utf8).orNull, m.clusterCols.map(utf8).orNull,
          m.txn.map(utf8).orNull)
    }
    new GraftLocalTable(s"graft_history($path)", historySchema, rows.toArray)
  }

  def files(path: String, conf: Configuration): Table = {
    val rows = GraftStoreFormat.readLatestManifest(path, conf)
      .map(_.files).getOrElse(Seq.empty).map { e =>
        InternalRow(utf8(e.name), e.rows,
          e.ncols.map(Int.box).orNull,
          e.partVals.map(vs => utf8(GraftStoreFormat.partValsToString(vs))).orNull)
      }
    new GraftLocalTable(s"graft_files($path)", filesSchema, rows.toArray)
  }

  val segmentsSchema: StructType = StructType(Seq(
    StructField("segment", StringType, nullable = false),
    StructField("n_entries", LongType, nullable = false)))

  /** `tbl$segments`: the HEAD manifest's chunk references (empty below the
    * segmentation threshold) — visibility into the O(churn) commit
    * economics of segmented manifests. */
  def segments(path: String, conf: Configuration): Table = {
    val ms = GraftStoreFormat.listManifests(path, conf)
    // entry counts ride the @seg lines — one raw body read of the head
    val rows =
      if (ms.isEmpty) Seq.empty
      else {
        val in = GraftStoreFormat.fs(path, conf).open(ms.last)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        body.split("\n").filter(_.startsWith("@seg\t")).toSeq.map { l =>
          val parts = l.split("\t")
          InternalRow(utf8(parts(1)), parts(2).toLong)
        }
      }
    new GraftLocalTable(s"graft_segments($path)", segmentsSchema, rows.toArray)
  }

  val refsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // "tag" | "branch"
    StructField("seq", LongType, nullable = false),
    StructField("fork_seq", LongType))) // null for tags

  /** `tbl$refs`: the head's named refs — tags and branches with their
    * pinned seqs (the SQL face of tagSnapshot/createBranch state). */
  def refs(path: String, conf: Configuration): Table = {
    val rows = GraftStoreFormat.readLatestManifest(path, conf)
      .map(_.refs).getOrElse(Map.empty).toSeq.sortBy(_._1).map { case (n, r) =>
        InternalRow(utf8(n), utf8(if (r.branch) "branch" else "tag"),
          r.seq, if (r.branch) Long.box(r.forkSeq) else null)
      }
    new GraftLocalTable(s"graft_refs($path)", refsSchema, rows.toArray)
  }

  /** `tbl$deletes`: the head snapshot's live delete files of BOTH kinds —
    * the merge-on-read read debt, queryable (Iceberg's
    * `all_delete_files`). `kind` = position|equality; position rows carry
    * the covering name range, equality rows the scope seq + key columns. */
  val deletesSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("min_target", StringType),
    StructField("max_target", StringType),
    StructField("scope_seq", LongType),
    StructField("key_cols", StringType)))

  val partitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("spec_id", IntegerType),
    StructField("n_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  /** `tbl$partitions` (Iceberg's `partitions` metadata table): the head
    * snapshot's files grouped by their EXPLICIT partition values —
    * per-partition file counts and row counts straight from the manifest,
    * zero data reads. The operational questions it answers at 100 TB:
    * which partitions are skewed, which buckets collect small files
    * (compaction targets), whether a spec evolution left mixed layouts
    * (`spec_id` column). Unpartitioned files group under "". */
  def partitions(path: String, conf: Configuration): Table = {
    // human-readable partition rendering (not the manifest's sigil
    // encoding): values comma-joined, null partition values as "null"
    def render(vs: Seq[Option[String]]): String =
      vs.map(_.getOrElse("null")).mkString(",")
    val rows = GraftStoreFormat.readLatestManifest(path, conf)
      .map(_.files).getOrElse(Seq.empty)
      .groupBy(e => (e.partVals.map(render).getOrElse(""), e.specId))
      .toSeq.sortBy(_._1.toString)
      .map { case ((pv, spec), es) =>
        InternalRow(utf8(pv), spec.map(Int.box).orNull,
          es.size.toLong, es.map(_.rows).sum)
      }
    new GraftLocalTable(s"graft_partitions($path)", partitionsSchema, rows.toArray)
  }

  def deletes(path: String, conf: Configuration): Table = {
    val m = GraftStoreFormat.readLatestManifest(path, conf)
    val pos = m.map(_.deletes).getOrElse(Seq.empty).map { d =>
      InternalRow(utf8(d.name), utf8("position"), d.rows,
        utf8(d.minTarget), utf8(d.maxTarget), null, null)
    }
    val eq = m.map(_.eqDeletes).getOrElse(Seq.empty).map { d =>
      InternalRow(utf8(d.name), utf8("equality"), d.rows,
        null, null, Long.box(d.seq), utf8(d.keyCols.mkString(",")))
    }
    new GraftLocalTable(s"graft_deletes($path)", deletesSchema, (pos ++ eq).toArray)
  }
}

/** A read-only table whose content is a driver-local row array. */
private[v2] class GraftLocalTable(tableName: String, tableSchema: StructType,
    content: Array[InternalRow]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = tableSchema
        // NB: the field must not be named `rows` — inside this anonymous
        // class an unqualified `rows` resolves to the method itself and
        // recurses forever (found the hard way: a spinning planner)
        override def rows(): Array[InternalRow] = content
        override def description(): String = tableName
      }
    }
}
