package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException, NoSuchViewException, TableAlreadyExistsException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, StagedTable, StagingTableCatalog, Table, TableCatalog, TableChange, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Catalog surface for graft-store: maps `catalog.ident` to the table
  * directory `<base>/<ident>` and hands Spark a [[GraftStoreTable]].
  *
  * The point of the catalog is SQL-native TIME TRAVEL: Spark's grammar
  * already parses `SELECT ... FROM cat.tbl VERSION AS OF n` and
  * `TIMESTAMP AS OF ts` and routes them to `loadTable(ident, version)` /
  * `loadTable(ident, timestampMicros)` — implementing those two overloads
  * (feeding the existing `snapshot` / `asOfMillis` read options) completes
  * the SQL surface with ZERO parser extension, the same wiring Delta and
  * Iceberg use. Enable with:
  *
  * {{{
  *   spark.sql.catalog.graft       = graft.sources.v2.GraftCatalog
  *   spark.sql.catalog.graft.base  = /warehouse/graft
  * }}}
  *
  * The snapshot pin resolved here is PINNED into the table (wins over any
  * reader option), so an optimizer re-plan cannot re-point a time-travel
  * relation at the head. DDL rides the format's own commit protocol — the
  * manifest CAS is the transaction layer (CREATE = seq-0 commit, CTAS/RTAS
  * stage through [[StagingTableCatalog]], ALTER loops OCC) — so there is
  * no second, racing metadata root. SQL views persist as files under
  * `<base>/_views` ([[ViewCatalog]]).
  *
  * The catalog is ALSO a [[FunctionCatalog]] exposing the `bucket`
  * transform function — the missing piece for BUCKETED storage-partitioned
  * joins: a scan reporting `KeyGroupedPartitioning(bucket(n, col))` only
  * becomes plannable once Catalyst can resolve the named transform against
  * the relation's function catalog (V2ScanPartitioningAndOrdering), and
  * path-loaded relations (`spark.read.format(...)`) have none — so bucket
  * SPJ reads MUST come through `SELECT ... FROM <cat>.<tbl>`. Identity
  * layouts need no function and work either way. */
class GraftCatalog extends TableCatalog with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with FunctionCatalog with ViewCatalog {
  private var catName: String = _
  private var base: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    base = Option(options.get("base")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog requires spark.sql.catalog.$name.base=<dir> (tables at <dir>/<ident>)"))
  }
  override def name(): String = catName

  private def conf = SparkSession.active.sparkContext.hadoopConfiguration

  private def pathOf(ident: Identifier): String =
    (base +: (ident.namespace() :+ ident.name())).mkString("/")

  /** The storage directory an identifier resolves to — the parser-level
    * MATERIALIZED VIEW DDL needs the path for [[GraftMview]] calls. */
  private[v2] def tablePath(ident: Identifier): String = pathOf(ident)

  private def load(ident: Identifier, pinned: Map[String, String]): Table = {
    val path = pathOf(ident)
    val m = GraftStoreFormat
      .selectManifest(path, conf, new CaseInsensitiveStringMap(pinned.asJava))
      .getOrElse(throw new NoSuchTableException(ident))
    // schema comes from the PINNED snapshot's manifest: an old snapshot may
    // predate a schema-changing overwrite and must read with its own schema.
    // Column DEFAULTS surface as field metadata so Spark's own
    // ResolveDefaultColumns fills them into INSERTs that omit the column —
    // the manifest stays the durable home, the metadata is a projection.
    val schema = m.fieldMeta.filter(_.defaults.nonEmpty).map { fm =>
      StructType(m.schema.fields.zipWithIndex.map { case (f, i) =>
        fm.defaults.get(fm.ids(i)) match {
          case Some(enc) =>
            val sql = org.apache.spark.sql.catalyst.expressions.Literal(
              GraftStoreFormat.defaultFromString(f.dataType, enc), f.dataType).sql
            f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putString("CURRENT_DEFAULT", sql)
              .putString("EXISTS_DEFAULT", sql).build())
          case None => f
        }
      })
    }.getOrElse(m.schema)
    new GraftStoreTable(path, schema, pinned)
  }

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata tables: `tbl$history` / `tbl$files` resolve
    // to driver-local snapshot-log / file-inventory tables (SQL needs the
    // name backquoted: SELECT ... FROM cat.`tbl$history`)
    val name = ident.name()
    val dollar = name.lastIndexOf('$')
    if (dollar > 0) {
      val basePath = pathOf(Identifier.of(ident.namespace(), name.substring(0, dollar)))
      if (GraftStoreFormat.listManifests(basePath, conf).isEmpty)
        throw new NoSuchTableException(ident)
      name.substring(dollar + 1) match {
        case "history" => GraftMetaTables.history(basePath, conf)
        case "files" => GraftMetaTables.files(basePath, conf)
        case "deletes" => GraftMetaTables.deletes(basePath, conf)
        case "refs" => GraftMetaTables.refs(basePath, conf)
        case "segments" => GraftMetaTables.segments(basePath, conf)
        case "partitions" => GraftMetaTables.partitions(basePath, conf)
        case _ => throw new NoSuchTableException(ident)
      }
    } else load(ident, Map.empty)
  }

  /** `VERSION AS OF <n>`: n is the 0-based snapshot index. */
  /** `VERSION AS OF n` (numeric = 0-based snapshot index) or
    * `VERSION AS OF 'name'` (a TAG from [[GraftStoreOps.tagSnapshot]],
    * resolved through the `ref` read option against the head's ref
    * table — Iceberg's named-ref time travel). */
  override def loadTable(ident: Identifier, version: String): Table =
    if (version.nonEmpty && version.forall(_.isDigit))
      load(ident, Map("snapshot" -> version))
    else load(ident, Map("ref" -> version))

  /** `TIMESTAMP AS OF <ts>`: Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, Map("asOfMillis" -> (timestamp / 1000L).toString))

  /** A directory is a TABLE iff it holds manifests directly; a directory
    * without them is a NAMESPACE (it holds table directories). One
    * discriminator serves listTables, listNamespaces and dropNamespace. */
  private def isTableDir(p: org.apache.hadoop.fs.Path): Boolean =
    GraftStoreFormat.listManifests(p.toString, conf).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new org.apache.hadoop.fs.Path((base +: namespace.toSeq).mkString("/"))
    val f = GraftStoreFormat.fs(base, conf)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftStoreFormat.listManifests(pathOf(ident), conf).nonEmpty

  // ---- SupportsNamespaces: namespaces are directories under `base` ----
  private def nsPath(ns: Array[String]): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path((base +: ns.toSeq).mkString("/"))

  override def namespaceExists(ns: Array[String]): Boolean = {
    if (ns.isEmpty) return true // the default namespace always exists
    val f = GraftStoreFormat.fs(base, conf)
    val p = nsPath(ns)
    f.exists(p) && f.getFileStatus(p).isDirectory && !isTableDir(p)
  }

  override def listNamespaces(): Array[Array[String]] = {
    val f = GraftStoreFormat.fs(base, conf)
    val root = new org.apache.hadoop.fs.Path(base)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root)
      .filter(s => s.isDirectory && !isTableDir(s.getPath) &&
        !s.getPath.getName.startsWith("_")) // `_views` etc. are reserved
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(parent: Array[String]): Array[Array[String]] = {
    if (parent.isEmpty) return listNamespaces()
    if (!namespaceExists(parent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        parent)
    val f = GraftStoreFormat.fs(base, conf)
    f.listStatus(nsPath(parent))
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => parent :+ s.getPath.getName)
  }

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(ns)
    val m = new util.HashMap[String, String]()
    m.put(org.apache.spark.sql.connector.catalog.SupportsNamespaces.PROP_LOCATION,
      nsPath(ns).toString)
    m
  }

  /** `CREATE NAMESPACE cat.ns`: a directory — nothing else to durably
    * declare (namespace properties beyond location are not retained and
    * fail loudly rather than silently dropping). */
  override def createNamespace(ns: Array[String],
      properties: util.Map[String, String]): Unit = {
    val meaningful = properties.asScala.keys.filterNot(k =>
      k == org.apache.spark.sql.connector.catalog.SupportsNamespaces.PROP_LOCATION ||
        k == org.apache.spark.sql.connector.catalog.SupportsNamespaces.PROP_COMMENT ||
        k == org.apache.spark.sql.connector.catalog.SupportsNamespaces.PROP_OWNER)
    require(meaningful.isEmpty,
      s"graft catalog: unsupported namespace properties ${meaningful.mkString(", ")}")
    if (namespaceExists(ns) || isTableDir(nsPath(ns)))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(ns)
    GraftStoreFormat.fs(base, conf).mkdirs(nsPath(ns))
  }

  override def alterNamespace(ns: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  /** `DROP NAMESPACE [CASCADE]`: refuse to drop a non-empty namespace
    * without CASCADE (the SQL contract); CASCADE removes the directory —
    * tables, history and all. */
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(ns)
    if (!cascade && (listTables(ns).nonEmpty || listNamespaces(ns).nonEmpty))
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        ns, "namespace is not empty")
    GraftStoreFormat.fs(base, conf).delete(nsPath(ns), true)
  }

  // ---- SQL DDL lifecycle --------------------------------------------
  // Earlier rounds rejected catalog-side CREATE ("a second, racing
  // metadata root"); the racing-root concern dissolves once CREATE is
  // itself a seq-0 manifest commit through the SAME CAS protocol every
  // write uses — there is exactly one root, the manifest line, and the
  // create is one more OCC participant. This completes the SQL story:
  // CREATE / CTAS / RTAS / DROP / RENAME alongside the existing INSERT,
  // REPLACE WHERE, DELETE/UPDATE/MERGE, ALTER, and time travel.

  /** SQL partition transforms → the manifest layout string (the same
    * family the path-based `partitionBy` option parses). */
  private def layoutOf(partitions: Array[Transform]): Option[String] = {
    import org.apache.spark.sql.connector.expressions.{Expression => CExpr, Literal => CLit, NamedReference}
    def col(e: CExpr): String = e match {
      case r: NamedReference =>
        require(r.fieldNames.length == 1,
          s"graft catalog: nested partition column ${r.describe} unsupported")
        r.fieldNames.head
      case other => throw new IllegalArgumentException(
        s"graft catalog: unsupported transform argument ${other.describe}")
    }
    if (partitions.isEmpty) None
    else Some(partitions.map { t =>
      (t.name.toLowerCase(java.util.Locale.ROOT), t.arguments.toSeq) match {
        case ("identity", Seq(r)) => col(r)
        case ("bucket", (n: CLit[_]) +: refs) if refs.nonEmpty =>
          s"bucket(${n.value},${refs.map(col).mkString(",")})"
        case (u @ ("years" | "months" | "days" | "hours"), Seq(r)) => s"$u(${col(r)})"
        case ("truncate", Seq(n: CLit[_], r)) => s"truncate(${n.value},${col(r)})"
        case ("truncate", Seq(r, n: CLit[_])) => s"truncate(${n.value},${col(r)})"
        case _ => throw new IllegalArgumentException(
          s"graft catalog: unsupported partition transform ${t.describe} — " +
            "identity, bucket(n, cols...), years/months/days/hours(col) and " +
            "truncate(w, col) are supported")
      }
    }.mkString(","))
  }

  /** CREATE/REPLACE TABLE properties → (graft-known properties, user
    * properties). Spark's reserved keys pass through silently; known keys
    * (check/dmlMode/clusterBy/bloomCols) configure the table; anything
    * else persists as a USER property in the manifest (`#props=`) —
    * Iceberg/Delta's arbitrary-TBLPROPERTIES contract — except keys that
    * would shadow the derived read-only surface, which fail loudly. */
  private def tablePropsOf(properties: util.Map[String, String])
      : (Map[String, String], Map[String, String]) = {
    val reserved = Set("provider", "location", "comment", "owner", "external",
      "is_managed_location", "path", "transient_lastddltime")
    val known = Set("check", "dmlmode", "clusterby", "bloomcols")
    val knownOut = Map.newBuilder[String, String]
    val userOut = Map.newBuilder[String, String]
    properties.asScala.foreach { case (k, v) =>
      val kl = k.toLowerCase(java.util.Locale.ROOT)
      if (known.contains(kl)) knownOut += kl -> v
      else if (reserved.contains(kl) || kl.startsWith("option.")) ()
      else {
        require(!GraftCatalog.derivedPropKeys.contains(kl),
          s"graft catalog: table property '$k' is derived read-only state")
        userOut += k -> v
      }
    }
    (knownOut.result(), userOut.result())
  }

  /** Validate schema/layout/properties and build the empty table manifest. */
  private def emptyManifestFor(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : GraftManifest = {
    schema.fields.foreach(f => require(GraftStoreFormat.codecSupports(f.dataType),
      s"graft catalog: column '${f.name}' has codec-unsupported type " +
        s"${f.dataType.simpleString}"))
    val layout = layoutOf(partitions).map(s => GraftLayout.parse(s).render)
    layout.foreach(l => GraftLayout.parse(l).columns.foreach(c =>
      require(schema.fieldNames.contains(c),
        s"graft catalog: partition column '$c' not in the table schema")))
    val (props, userProps) = tablePropsOf(properties)
    props.get("dmlmode").foreach(m => require(m == "cow" || m == "mor",
      s"graft catalog: dmlMode must be 'cow' or 'mor', got '$m'"))
    require(layout.isEmpty || !props.contains("clusterby"),
      "graft catalog: clusterBy and PARTITIONED BY are mutually exclusive layouts")
    // CHECK must at least compile against the schema — an unparseable
    // constraint must fail at CREATE, not at the first write
    props.get("check").foreach(c => GraftCheck.compile(schema, c))
    // `CREATE TABLE (c INT DEFAULT 5)`: Spark encodes the default's SQL
    // text into field metadata — evaluate it to a literal, record it in
    // field metadata (the durable home, same as ALTER ADD ... DEFAULT),
    // and persist a CLEAN schema (the DDL line carries no metadata)
    val defaulted = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (!f.metadata.contains("EXISTS_DEFAULT")) None
      else Some(i -> evalDefaultSql(f.metadata.getString("EXISTS_DEFAULT"), f.dataType))
    }.collect { case (i, Some(enc)) => i -> enc }.toMap
    val cleanSchema = StructType(schema.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    val fm =
      if (defaulted.isEmpty) None
      else {
        val ids = schema.indices.toSeq
        Some(GraftFieldMeta(
          cleanSchema.fields.toSeq.zipWithIndex.map { case (f, i) => (i, f.name, f.dataType) },
          ids, Seq(ids), defaults = defaulted))
      }
    GraftManifest(cleanSchema, Seq.empty,
      partitionCol = layout, clusterCols = props.get("clusterby"),
      check = props.get("check"), dml = props.get("dmlmode"),
      bloomCols = props.get("bloomcols"), fieldMeta = fm, props = userProps)
  }

  /** Evaluate a default's SQL text to its value at `dt`, encoded for the
    * manifest; None = the default is literally NULL (same as no default).
    * Only constant literals are supported — a non-foldable default fails
    * loudly at DDL time, never silently at read time. */
  private def evalDefaultSql(sql: String, dt: org.apache.spark.sql.types.DataType)
      : Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val parsed = SparkSession.active.sessionState.sqlParser.parseExpression(sql)
    val lit = parsed match {
      case l: Literal => l
      case other => throw new IllegalArgumentException(
        s"graft catalog: only constant literal DEFAULTs are supported, got '$sql'")
    }
    if (lit.value == null) return None
    val casted = Cast(lit, dt, Some("UTC"), evalMode =
      org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI).eval(null)
    require(casted != null, s"graft catalog: DEFAULT '$sql' does not fit ${dt.simpleString}")
    Some(GraftStoreFormat.defaultToString(dt, casted))
  }

  /** Column DEFAULT values are a declared capability: without it Spark
    * rejects `DEFAULT` clauses in DDL before they ever reach the catalog. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** `CREATE TABLE cat.t (...) PARTITIONED BY (...)`: a seq-0 empty
    * manifest commit — the table exists atomically from that CAS on,
    * with layout and properties declared for every future write. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (viewExists(ident))
      throw new ViewAlreadyExistsException(ident) // one name, one object
    val m = emptyManifestFor(ident, schema, partitions, properties)
    if (!GraftStoreFormat.commitManifest(path, conf, m, 0L))
      throw new TableAlreadyExistsException(ident) // lost the create race
    new GraftStoreTable(path, schema)
  }

  /** Staged CTAS/RTAS ([[StagingTableCatalog]]): the staged table's FIRST
    * write publishes the seq-0 (create) or truncating (replace) manifest —
    * which IS the atomic publication point, so the table/new contents only
    * ever appear fully populated; there is no empty-visible window and no
    * partial replace. Abort of a staged CREATE removes the debris; abort
    * of a staged REPLACE leaves the old table untouched (nothing was
    * committed). */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    staged(ident, schema, partitions, properties, replace = false)
  }
  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    staged(ident, schema, partitions, properties, replace = true)
  }
  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    staged(ident, schema, partitions, properties, replace = tableExists(ident))

  private def staged(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String],
      replace: Boolean): StagedTable = {
    // validate schema/layout/properties NOW (stage time), commit nothing
    val m = emptyManifestFor(ident, schema, partitions, properties)
    val inject = Map.newBuilder[String, String]
    m.partitionCol.foreach(inject += "partitionBy" -> _)
    m.clusterCols.foreach(inject += "clusterBy" -> _)
    m.check.foreach(inject += "check" -> _)
    m.dml.foreach(inject += "dmlMode" -> _)
    m.bloomCols.foreach(inject += "bloomCols" -> _)
    new GraftStagedTable(pathOf(ident), schema, m, inject.result(), replace, conf)
  }

  /** `DROP TABLE cat.t`: remove the table directory — manifests, data,
    * sidecars, history. Managed-table semantics (the catalog owns the
    * path); time travel does not survive a DROP, by design. */
  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (!tableExists(ident)) false
    else {
      // dead names must not serve from the parsed-manifest cache if a
      // same-named table is later recreated (coarse-mtime filesystems
      // can collide the (length, mtime) key guard)
      GraftStoreFormat.invalidateTable(path)
      GraftStoreFormat.fs(path, conf)
        .delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }

  /** `ALTER TABLE cat.a RENAME TO cat.b`: a directory rename — atomic on
    * HDFS-like filesystems, metadata-only always (manifests reference
    * files by RELATIVE name, so contents need no rewrite). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val oldPath = pathOf(oldIdent)
    val newPath = pathOf(newIdent)
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val f = GraftStoreFormat.fs(oldPath, conf)
    require(f.rename(new org.apache.hadoop.fs.Path(oldPath),
        new org.apache.hadoop.fs.Path(newPath)),
      s"graft catalog: rename $oldPath -> $newPath failed")
  }
  /** SQL DDL on the manifest, metadata-only:
    *
    *   - `ALTER TABLE cat.t ADD COLUMNS (c TYPE)` — additive schema
    *     evolution as one commit: the row codec is positional, so existing
    *     files become PREFIXES of the widened schema (re-listed with their
    *     physical width `ncols`; the reader null-extends) — the SQL face of
    *     the `mergeSchema=true` append path, with zero data involved.
    *     Added columns must be top-level, trailing, nullable, and of a
    *     codec-supported type; anything non-additive (drop/rename/retype/
    *     reposition) fails loudly — it would decode old files wrongly.
    *   - `ALTER TABLE cat.t SET TBLPROPERTIES ('check'='<expr>')` —
    *     declare the table's CHECK constraint. EXISTING rows are validated
    *     first (one scan, count of violators — Delta's ADD CONSTRAINT
    *     semantics: a constraint the data already violates must not
    *     declare); `UNSET TBLPROPERTIES ('check')` clears it.
    *
    * OCC-retried like every commit; `txn`/`cdc` are per-commit and clear. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange._
    val path = pathOf(ident)
    val spark = SparkSession.active
    // CHECK validation memo: the full-table violation scan runs ONCE per
    // distinct (expr, visible data) state, not once per OCC retry — a CAS
    // loss to a metadata-only commit (property set, spec evolution) re-enters
    // the loop with identical visible data and must stay metadata-only. The
    // signature covers everything that changes which rows the scan sees:
    // schema, live files, and MOR delete masks.
    var checkValidated: String = null
    var done = false
    while (!done) {
      val head = GraftStoreFormat.listManifests(path, conf)
      val m = GraftStoreFormat.readHead(path, conf, head)
        .getOrElse(throw new NoSuchTableException(ident))
      val origWidth = m.schema.length
      var schema = m.schema
      var files = m.files
      var check = m.check
      var dml = m.dml
      var fieldMeta = m.fieldMeta
      var uprops = m.props
      // materialize field-id metadata (first RENAME/DROP): ids become the
      // ordinals of the schema as it stands, the lone recorded layout.
      // Every existing file is an ordinal prefix by construction (history
      // was purely additive until now), frozen by stamping its physical
      // width — [[GraftFieldMeta]] documents the invariant
      def materializedFieldMeta(): GraftFieldMeta = fieldMeta.getOrElse {
        files = files.map(e => e.copy(ncols = e.ncols.orElse(Some(schema.length))))
        val ids = schema.indices.toSeq
        val fm = GraftFieldMeta(
          schema.fields.toSeq.zipWithIndex.map { case (f, i) => (i, f.name, f.dataType) },
          ids, Seq(ids))
        fieldMeta = Some(fm)
        fm
      }
      // a column woven into the table's OTHER metadata cannot be renamed
      // or dropped in place: layout/constraint/eq-delete references are by
      // NAME and would silently dangle
      def requireUnreferenced(col: String, what: String): Unit = {
        def inList(s: String): Boolean =
          s.split(",").map(_.trim).contains(col)
        // `cols` covers every transform kind (identity, bucket, temporal,
        // truncate) — no per-kind match to fall out of date
        require(!m.partitionCol.exists(p =>
            GraftLayout.parse(p).specs.exists(_.cols.contains(col))),
          s"graft catalog: cannot $what column $col — it is part of the " +
            "table's partition layout (re-layout first)")
        require(!m.partitionSpecs.exists(_.filter(_.nonEmpty).exists(s =>
            GraftLayout.parse(s).specs.exists(_.cols.contains(col)))),
          s"graft catalog: cannot $what column $col — it appears in the " +
            "partition-spec history")
        require(!m.clusterCols.exists(inList),
          s"graft catalog: cannot $what column $col — it is a declared " +
            "cluster column (re-cluster first)")
        require(!check.exists { c =>
            // referenced iff the parsed constraint names the column
            // (case-insensitive, like Spark's default resolution)
            spark.sessionState.sqlParser.parseExpression(c).collect {
              case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
                a.nameParts.last
            }.exists(_.equalsIgnoreCase(col))
          },
          s"graft catalog: cannot $what column $col — the CHECK constraint " +
            "references it (drop the constraint first)")
        require(!m.eqDeletes.exists(_.keyCols.contains(col)),
          s"graft catalog: cannot $what column $col — live equality deletes " +
            "key on it (purgeDeletes first)")
      }
      changes.foreach {
        case add: AddColumn =>
          require(add.fieldNames().length == 1,
            "graft catalog: nested column additions are unsupported")
          val colName = add.fieldNames()(0)
          require(!schema.fieldNames.contains(colName),
            s"graft catalog: column $colName already exists")
          require(add.isNullable,
            "graft catalog: added columns must be nullable (existing rows hold no value)")
          require(add.position() == null,
            "graft catalog: column positions are unsupported (the codec is " +
              "positional; new columns append)")
          require(GraftStoreFormat.codecSupports(add.dataType()),
            s"graft catalog: unsupported column type ${add.dataType().simpleString}")
          // `ADD COLUMN ... DEFAULT <lit>`: Spark ships the EVALUATED V2
          // literal; existing rows will READ the default (backfill-free —
          // readers substitute it where the column is physically absent),
          // so the default must live in durable field metadata
          val defEnc: Option[String] = Option(add.defaultValue()).flatMap { d =>
            val lit = d.getValue
            require(lit != null,
              "graft catalog: only constant-foldable literal DEFAULTs are supported")
            if (lit.value == null) None // DEFAULT NULL == plain nullable add
            else {
              require(lit.dataType == add.dataType(),
                s"graft catalog: DEFAULT type ${lit.dataType.simpleString} does " +
                  s"not match column type ${add.dataType().simpleString}")
              Some(GraftStoreFormat.defaultToString(add.dataType(), lit.value))
            }
          }
          // a DEFAULT needs the field-id layer (its durable home) — plain
          // adds stay lazy, preserving prefix semantics until first needed
          if (defEnc.isDefined) materializedFieldMeta()
          // existing files keep their PRE-widening width (first record wins
          // through repeated evolutions)
          files = files.map(e => e.copy(ncols = e.ncols.orElse(Some(origWidth))))
          schema = schema.add(colName, add.dataType(), nullable = true)
          // id-evolved table: the added column takes a fresh, never-reused
          // id and the widened id list becomes the new current layout
          fieldMeta = fieldMeta.map { fm =>
            val id = fm.nextId
            val newIds = fm.ids :+ id
            fm.copy(fields = fm.fields :+ ((id, colName, add.dataType())),
              ids = newIds, layouts = fm.layouts :+ newIds,
              defaults = fm.defaults ++ defEnc.map(id -> _))
          }
        case rn: RenameColumn =>
          require(rn.fieldNames().length == 1,
            "graft catalog: nested column renames are unsupported")
          val old = rn.fieldNames()(0)
          val nw = rn.newName()
          val t = schema.fieldNames.indexOf(old)
          require(t >= 0, s"graft catalog: no such column $old")
          require(!schema.fieldNames.contains(nw),
            s"graft catalog: column $nw already exists")
          requireUnreferenced(old, "RENAME")
          // Iceberg-style rename: METADATA-ONLY. Field ids pin decode
          // positions, so only the DDL name (and the id table's display
          // name) changes — zero data files touched, old files keep
          // reading through their recorded layouts
          val fm = materializedFieldMeta()
          val id = fm.ids(t)
          fieldMeta = Some(fm.copy(fields = fm.fields.map {
            case (fid, _, dt) if fid == id => (fid, nw, dt)
            case f => f
          }))
          schema = StructType(
            schema.fields.updated(t, schema.fields(t).copy(name = nw)))
        case del: DeleteColumn =>
          require(del.fieldNames().length == 1,
            "graft catalog: nested column drops are unsupported")
          val colName = del.fieldNames()(0)
          val t = schema.fieldNames.indexOf(colName)
          require(t >= 0, s"graft catalog: no such column $colName")
          require(schema.length > 1,
            "graft catalog: cannot drop a table's only column")
          requireUnreferenced(colName, "DROP")
          // Iceberg-style drop: METADATA-ONLY. The field's id leaves the
          // logical schema and the shrunk id list becomes the new current
          // layout; the id stays in the field table (its TYPE is what
          // lets readers seek past the dropped bytes in old files) and is
          // never reused. Zero data files touched — the column's bytes
          // are reclaimed lazily as rewrites (compaction, COW DML)
          // rewrite files under the current layout
          val fm = materializedFieldMeta()
          val newIds = fm.ids.patch(t, Nil, 1)
          fieldMeta = Some(fm.copy(ids = newIds, layouts = fm.layouts :+ newIds))
          schema = StructType(schema.fields.patch(t, Nil, 1))
        case upd: UpdateColumnType =>
          require(upd.fieldNames().length == 1,
            "graft catalog: nested column retypes are unsupported")
          val colName = upd.fieldNames()(0)
          val t = schema.fieldNames.indexOf(colName)
          require(t >= 0, s"graft catalog: no such column $colName")
          val oldT = schema.fields(t).dataType
          val newT = upd.newDataType()
          if (oldT != newT) {
            val widens = (oldT, newT) match {
              case (IntegerType, LongType) => true
              case (FloatType, DoubleType) => true
              // decimal PRECISION widening at the SAME scale (Iceberg's
              // decimal promotion): stats strings re-parse losslessly
              // (unscaled-integer text at one shared scale) and values are
              // identical. Within one codec width (p<=18, or both wide)
              // the wire bytes are unchanged too; CROSSING 18 changes the
              // wire width, which the written-type layout layer already
              // handles — pre-widening files decode 8-byte at their
              // recorded type and re-wrap at the declared precision,
              // exactly like int→bigint
              case (d1: org.apache.spark.sql.types.DecimalType,
                    d2: org.apache.spark.sql.types.DecimalType) =>
                d1.scale == d2.scale && d2.precision > d1.precision
              case _ => false
            }
            require(widens,
              s"graft catalog: cannot retype column $colName from " +
                s"${oldT.simpleString} to ${newT.simpleString} — only the " +
                "safe promotions int→bigint, float→double and " +
                "decimal(p,s)→decimal(p2>p,s) alter in place (Iceberg's " +
                "widening set for this codec); other retypes need an " +
                "overwrite")
            // Widening preserves VALUES, but metadata that cached narrow
            // ENCODINGS does not follow automatically — refuse where a
            // stale encoding would lie:
            //  - equality-delete key stores decode at CURRENT table types,
            //    so a store written at the narrow type would mis-decode;
            //  - float layout/cluster references: partition values and
            //    min/max stats are float STRINGS whose double re-parse is
            //    a different number (0.1f ≠ 0.1d) — pruning, SPJ keys and
            //    CHECK replays would silently drift. Int strings re-parse
            //    as long losslessly (and bucket ids hash int-as-long by
            //    design), so int→bigint stays legal even on layout columns.
            require(!m.eqDeletes.exists(_.keyCols.contains(colName)),
              s"graft catalog: cannot retype column $colName — live " +
                "equality deletes key on it (purgeDeletes first)")
            if (oldT == FloatType) requireUnreferenced(colName, "retype")
            val fm = materializedFieldMeta()
            val id = fm.ids(t)
            // stamp the OLD type onto every pre-existing layout containing
            // the field (first record wins — those eras' bytes really are
            // the narrow encoding), then re-record the current id list as
            // a fresh override-free layout for post-widening writers
            val padded = fm.layouts.indices.map(i =>
              fm.layoutTypes.lift(i).getOrElse(Map.empty[Int, DataType]))
            val stamped = padded.zip(fm.layouts).map { case (o, lay) =>
              if (lay.contains(id) && !o.contains(id)) o + (id -> oldT) else o
            }
            // float→double additionally STRIPS the column's per-file
            // min/max stats on pre-widening files: a float stat string
            // re-parsed as double is a different number, so skipping and
            // min/max pushdown would be wrong. Losing stats is the honest
            // cost (skipping declines, pushdown declines — answers stay
            // exact); compaction restores them at the wide type. Int stats
            // are exact decimal integers and re-parse losslessly — kept.
            if (oldT == FloatType) files = files.map { e =>
              val p = e.layoutId match {
                case Some(li) => fm.layouts(li).indexOf(id)
                case None => if (id < e.ncols.getOrElse(0)) id else -1
              }
              if (p < 0) e else e.copy(stats = e.stats - p)
            }
            // a defaulted column widens its DEFAULT too: re-encode the
            // stored value at the wide type (exact for both promotions —
            // the VALUE widens, not its decimal string re-parse)
            val reDefaults = fm.defaults.get(id) match {
              case Some(enc) =>
                val wide: Any = GraftStoreFormat.defaultFromString(oldT, enc) match {
                  case i: Int => i.toLong
                  case f: Float => f.toDouble
                  case other => other
                }
                fm.defaults + (id -> GraftStoreFormat.defaultToString(newT, wide))
              case None => fm.defaults
            }
            fieldMeta = Some(GraftFieldMeta(
              fm.fields.map { case (fid, n, dt) =>
                if (fid == id) (fid, n, newT) else (fid, n, dt) },
              fm.ids, fm.layouts :+ fm.ids, stamped :+ Map.empty, reDefaults))
            schema = StructType(
              schema.fields.updated(t, schema.fields(t).copy(dataType = newT)))
          }
        case set: SetProperty if set.property() == "check" =>
          GraftCheck.compile(schema, set.value()) // analyzable against the schema
          // Delta ADD CONSTRAINT semantics: existing rows must already
          // satisfy it — one scan, proportional to the table, explicit;
          // skipped on an OCC retry whose visible data is unchanged
          val sig = set.value() + "\u0000" + m.schema.json + "\u0000" +
            m.files.map(_.name).mkString(",") + "\u0000" +
            m.deletes.map(_.name).mkString(",") + "\u0000" +
            m.eqDeletes.map(_.name).mkString(",")
          if (checkValidated != sig) {
            val violations = spark.read.format("graft-store").load(path)
              .filter(s"NOT coalesce((${set.value()}), true)").count()
            require(violations == 0L,
              s"graft catalog: $violations existing rows violate CHECK '${set.value()}'")
            checkValidated = sig
          }
          check = Some(set.value())
        case rm: RemoveProperty if rm.property() == "check" =>
          check = None
        // row-level DML storage mode (Delta's enableDeletionVectors knob in
        // spirit): flipping cow<->mor is metadata-only — existing position
        // deletes stay live either way (reads always apply them; only
        // FUTURE DML picks its strategy by this property)
        case set: SetProperty if set.property() == "dmlMode" =>
          require(set.value() == "cow" || set.value() == "mor",
            s"graft catalog: dmlMode must be 'cow' or 'mor', got '${set.value()}'")
          dml = Some(set.value())
        case rm: RemoveProperty if rm.property() == "dmlMode" =>
          dml = None
        // anything else is a USER property: persisted in the manifest
        // (`#props=`), inherited by every commit, surfaced by SHOW
        // TBLPROPERTIES — Iceberg/Delta's arbitrary-properties contract.
        // Keys shadowing the read-only derived surface are refused so a
        // stored value can never contradict the real table state.
        case set: SetProperty =>
          require(!GraftCatalog.derivedPropKeys.contains(
            set.property().toLowerCase(java.util.Locale.ROOT)),
            s"graft catalog: property '${set.property()}' is derived table " +
              "state, not settable (check/dmlMode alter in place; layout " +
              "is fixed at CREATE)")
          uprops = uprops + (set.property() -> set.value())
        case rm: RemoveProperty =>
          uprops = uprops - rm.property()
        case other =>
          throw new UnsupportedOperationException(
            s"graft catalog: unsupported table change $other — trailing " +
              "nullable ADD COLUMN, RENAME COLUMN, DROP COLUMN, widening " +
              "ALTER COLUMN TYPE (int→bigint, float→double; field-id " +
              "evolution) and the 'check'/'dmlMode' properties alter in " +
              "place; other retypes/repositions need an overwrite")
      }
      done = GraftStoreFormat.commitManifest(path, conf,
        m.copy(schema = schema, files = files, check = check, dml = dml,
          fieldMeta = fieldMeta, props = uprops,
          txn = None, cdc = None, dropCdc = Seq.empty),
        GraftStoreFormat.nextSeq(head))
    }
    loadTable(ident)
  }
  // ---- ProcedureCatalog: `CALL cat.system.<proc>(...)` maintenance ----
  private lazy val procedures = new GraftProcedures(base)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.length == 1 && namespace(0).equalsIgnoreCase("system"))
      procedures.list.map(Identifier.of(namespace, _))
    else Array.empty
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace().length == 1 &&
      ident.namespace()(0).equalsIgnoreCase("system")
    (if (ok) procedures.load(ident.name()) else None).getOrElse(
      throw new RuntimeException(
        s"graft catalog: no procedure $ident (known: " +
          s"system.${procedures.list.mkString(", system.")})"))
  }

  // ---- ViewCatalog: CREATE/DROP/SHOW VIEW persisted under <base>/_views ----
  // A view is one TEXT FILE at `<base>/_views/<ns...>/<name>` (same
  // ident→path convention as tables, under a reserved root the namespace
  // listing hides): header lines carry the resolution context Spark's
  // analyzer needs (defining catalog+namespace, declared schema, query
  // column names/aliases), the remainder is the query SQL verbatim.
  // Creation is tmp-write + rename — the same atomic-publish discipline
  // as manifests, so two racing CREATE VIEWs cannot interleave — and the
  // files survive any session: a fresh catalog instance re-reads them.
  private def viewPath(ident: Identifier): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      (s"$base/_views" +: (ident.namespace() :+ ident.name()).toSeq).mkString("/"))

  override def listViews(namespace: String*): Array[Identifier] = {
    val f = GraftStoreFormat.fs(base, conf)
    val dir = new org.apache.hadoop.fs.Path((s"$base/_views" +: namespace).mkString("/"))
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isFile)
      .map(s => Identifier.of(namespace.toArray, s.getPath.getName))
  }

  override def viewExists(ident: Identifier): Boolean = {
    val f = GraftStoreFormat.fs(base, conf)
    val p = viewPath(ident)
    f.exists(p) && f.getFileStatus(p).isFile
  }

  // list fields: each element escStat'd (escapes the ',' joiner), "" = empty
  private def encList(xs: Seq[String]): String =
    xs.map(x => GraftStoreFormat.escStat(if (x == null) "" else x)).mkString(",")
  private def decList(s: String): Array[String] =
    if (s.isEmpty) Array.empty
    else s.split(",", -1).map(GraftStoreFormat.unescStat)

  override def loadView(ident: Identifier): View = {
    val f = GraftStoreFormat.fs(base, conf)
    val p = viewPath(ident)
    if (!f.exists(p) || !f.getFileStatus(p).isFile) throw new NoSuchViewException(ident)
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = body.split("\n", -1)
    def hdr(k: String): String = lines.find(_.startsWith(s"#$k="))
      .map(_.stripPrefix(s"#$k=")).getOrElse("")
    val queryStart = lines.indexWhere(!_.startsWith("#"))
    GraftView(ident,
      query = lines.drop(queryStart).mkString("\n"),
      viewCatalog = GraftStoreFormat.unescStat(hdr("catalog")),
      viewNamespace = decList(hdr("namespace")),
      viewSchema = org.apache.spark.sql.types.DataType
        .fromJson(GraftStoreFormat.unescStat(hdr("schema"))).asInstanceOf[StructType],
      queryCols = decList(hdr("querycols")),
      aliases = decList(hdr("aliases")),
      comments = decList(hdr("comments")),
      props = decList(hdr("props")).map { kv =>
        val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
      }.toMap)
  }

  private def writeView(p: org.apache.hadoop.fs.Path, info: ViewInfo): Unit = {
    val f = GraftStoreFormat.fs(base, conf)
    f.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(s"$base/_views/_tmp",
      java.util.UUID.randomUUID().toString.take(12))
    val out = f.create(tmp, true)
    try out.write(
      (s"#catalog=${GraftStoreFormat.escStat(info.currentCatalog())}\n" +
        s"#namespace=${encList(info.currentNamespace().toSeq)}\n" +
        s"#schema=${GraftStoreFormat.escStat(info.schema().json)}\n" +
        s"#querycols=${encList(info.queryColumnNames().toSeq)}\n" +
        s"#aliases=${encList(info.columnAliases().toSeq)}\n" +
        s"#comments=${encList(info.columnComments().toSeq)}\n" +
        s"#props=${encList(info.properties().asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" })}\n" +
        info.sql()).getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, p)) {
      f.delete(tmp, false)
      throw new ViewAlreadyExistsException(
        Identifier.of(p.getParent.toString.split("/").dropWhile(_ != "_views").drop(1),
          p.getName))
    }
  }

  override def createView(info: ViewInfo): View = {
    if (viewExists(info.ident())) throw new ViewAlreadyExistsException(info.ident())
    if (tableExists(info.ident()))
      throw new TableAlreadyExistsException(info.ident())
    writeView(viewPath(info.ident()), info)
    loadView(info.ident())
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val v = loadView(ident).asInstanceOf[GraftView]
    var props = v.props
    changes.foreach {
      case set: ViewChange.SetProperty => props = props + (set.property() -> set.value())
      case rm: ViewChange.RemoveProperty => props = props - rm.property()
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported view change $other")
    }
    val f = GraftStoreFormat.fs(base, conf)
    val p = viewPath(ident)
    f.delete(p, false)
    writeView(p, new ViewInfo(ident, v.query, v.viewCatalog, v.viewNamespace,
      v.viewSchema, v.queryCols, v.aliases, v.comments, props.asJava))
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean = {
    val f = GraftStoreFormat.fs(base, conf)
    val p = viewPath(ident)
    f.exists(p) && f.getFileStatus(p).isFile && f.delete(p, false)
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent)) throw new NoSuchViewException(oldIdent)
    if (viewExists(newIdent)) throw new ViewAlreadyExistsException(newIdent)
    val f = GraftStoreFormat.fs(base, conf)
    f.mkdirs(viewPath(newIdent).getParent)
    if (!f.rename(viewPath(oldIdent), viewPath(newIdent)))
      throw new ViewAlreadyExistsException(newIdent)
  }

  // ---- FunctionCatalog: the `bucket` transform (see GraftBucketFunction)
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(namespace, "bucket")) else Array.empty
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().isEmpty && ident.name().equalsIgnoreCase("bucket"))
      GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** A staged CTAS/RTAS table ([[StagingTableCatalog]]): routes the staged
  * write through the normal table surface with the DECLARED layout and
  * properties injected as write options (the CTAS query's own options
  * cannot know them), forcing truncate for REPLACE. The data write's
  * manifest commit IS the atomic publication point — seq-0 CAS for
  * create, the truncating commit for replace — so the table never shows
  * an empty-visible or half-replaced state. */
private[v2] class GraftStagedTable(path: String, schema0: StructType,
    emptyManifest: GraftManifest, inject: Map[String, String], replace: Boolean,
    conf: org.apache.hadoop.conf.Configuration)
    extends GraftStoreTable(path, schema0) with StagedTable {
  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new util.HashMap[String, String](info.options)
    inject.foreach { case (k, v) => merged.put(k, v) }
    val wrapped = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = new CaseInsensitiveStringMap(merged)
      override def queryId(): String = info.queryId()
      override def schema(): StructType = info.schema()
      override def rowIdSchema(): java.util.Optional[StructType] = info.rowIdSchema()
      override def metadataSchema(): java.util.Optional[StructType] = info.metadataSchema()
    }
    val b = super.newWriteBuilder(wrapped)
    if (replace)
      b.asInstanceOf[org.apache.spark.sql.connector.write.SupportsTruncate].truncate()
    else b
  }
  /** The staged write already published through the commit protocol; the
    * empty-manifest commit here is a backstop so even a pathological
    * zero-commit stage still materializes the declared table. */
  override def commitStagedChanges(): Unit =
    if (GraftStoreFormat.listManifests(path, conf).isEmpty)
      require(GraftStoreFormat.commitManifest(path, conf, emptyManifest, 0L),
        s"graft catalog: staged create lost a concurrent-create race at $path")
  /** Abort of a staged CREATE removes the debris; abort of a staged
    * REPLACE touches nothing (the truncating commit is all-or-nothing, so
    * the old table is intact; `_tmp` scraps fall to removeOrphans). */
  override def abortStagedChanges(): Unit =
    if (!replace)
      try GraftStoreFormat.fs(path, conf)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      catch { case _: Throwable => () }
}

/** A persisted SQL view ([[org.apache.spark.sql.connector.catalog.View]]):
  * the query text plus the resolution context Spark's analyzer replays it
  * under — the DEFINING catalog and namespace (a view over `t` must keep
  * meaning the `t` its author saw, regardless of the reader's current
  * catalog), the declared output schema, and the query/alias column
  * names. Pure data; analysis happens in Spark's ViewResolution. */
private[v2] object GraftCatalog {
  /** Property keys whose values are DERIVED read-only table state on the
    * `properties()` surface — a user property may not shadow them. */
  val derivedPropKeys: Set[String] = Set("provider", "location", "partition",
    "clusterby", "bloomcols", "numfiles", "numrows", "refs")
}

private[v2] case class GraftView(ident: Identifier, query: String,
    viewCatalog: String, viewNamespace: Array[String], viewSchema: StructType,
    queryCols: Array[String], aliases: Array[String], comments: Array[String],
    props: Map[String, String]) extends View {
  override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
  override def currentCatalog(): String = viewCatalog
  override def currentNamespace(): Array[String] = viewNamespace
  override def schema(): StructType = viewSchema
  override def queryColumnNames(): Array[String] = queryCols
  override def columnAliases(): Array[String] = aliases
  override def columnComments(): Array[String] = comments
  override def properties(): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    props.asJava
  }
}
