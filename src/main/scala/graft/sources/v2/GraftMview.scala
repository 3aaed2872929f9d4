package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** MATERIALIZED VIEWS with CDC-driven INCREMENTAL refresh.
  *
  * An MV is a REAL graft-store table (reads hit the precomputed rows
  * through the ordinary catalog/scan path — the materialized fast path by
  * construction, no resolution magic) whose manifest carries the view
  * metadata in user properties (`#props=`): the definition, the source
  * table, and the REFRESH WATERMARK — the source snapshot the contents
  * are exactly as-of.
  *
  * The definition must be the canonical maintainable shape
  * `SELECT g..., count(*)/count(1) AS n [, sum(x) AS s ...] FROM t
  * [WHERE p] GROUP BY g...` — single source table, grouping on plain
  * columns, DISTRIBUTIVE aggregates only (count/sum). One `count(*)` is
  * REQUIRED: it is the group-liveness column (a group whose count reaches
  * zero leaves the view — the standard IVM device; without it, deletions
  * could strand empty groups). min/max ARE supported: groups that saw
  * only inserts since the watermark maintain via least/greatest against
  * the stored value; groups touched by any removal RESCAN from the
  * (pinned) source scoped to just those group keys — churn-groups cost,
  * never table cost. avg is refused with guidance (= sum/count
  * downstream); distinct aggregates are refused.
  *
  * Refresh is O(churn), not O(table): [[GraftStoreOps.signedChanges]]
  * yields +1/-1 row deltas reading only files whose membership or delete
  * coverage changed between the watermark and the head — no keyed join,
  * no key column needed, because distributive aggregation cancels
  * carried-identical rows by algebra. Deltas aggregate to per-group
  * adjustments; the adjusted groups merge with their CURRENT stored
  * values; and [[GraftStoreOps.replaceByKeyMor]] publishes changed-group
  * rows, vanished-group deletes, AND the advanced watermark as ONE
  * merge-on-read commit — a torn refresh cannot exist, and a crash
  * before the commit leaves the old view fully intact. Initial
  * materialization and refresh both PIN the source snapshot first and
  * compute against it (`snapshot` read option), so a concurrent source
  * commit can never make the stamped watermark lie.
  *
  * At 100 TB this is the difference between re-running a full aggregation
  * pipeline per refresh and paying for the day's churn: the refresh cost
  * tracks ingest volume, not table size. */
object GraftMview {

  /** One output column of the view: a group key or an aggregate. */
  private[v2] sealed trait ColSpec { def out: String }
  private[v2] case class GroupCol(src: String, out: String) extends ColSpec
  private[v2] case class CountCol(out: String) extends ColSpec
  private[v2] case class SumCol(src: String, out: String) extends ColSpec
  private[v2] case class MinCol(src: String, out: String) extends ColSpec
  private[v2] case class MaxCol(src: String, out: String) extends ColSpec

  private def enc(s: String): String = GraftStoreFormat.escStat(s)
  private def dec(s: String): String = GraftStoreFormat.unescStat(s)

  private[v2] def encodeCols(cols: Seq[ColSpec]): String = cols.map {
    case GroupCol(s, o) => s"g:${enc(s)}:${enc(o)}"
    case CountCol(o) => s"c::${enc(o)}"
    case SumCol(s, o) => s"s:${enc(s)}:${enc(o)}"
    case MinCol(s, o) => s"m:${enc(s)}:${enc(o)}"
    case MaxCol(s, o) => s"x:${enc(s)}:${enc(o)}"
  }.mkString(";")

  private[v2] def decodeCols(s: String): Seq[ColSpec] =
    s.split(";", -1).toSeq.map { p =>
      val Array(k, a, b) = p.split(":", 3)
      k match {
        case "g" => GroupCol(dec(a), dec(b))
        case "c" => CountCol(dec(b))
        case "s" => SumCol(dec(a), dec(b))
        case "m" => MinCol(dec(a), dec(b))
        case "x" => MaxCol(dec(a), dec(b))
      }
    }

  /** Recognize the maintainable shape on the ANALYZED plan; loud,
    * actionable errors otherwise. Returns (source path, filter SQL,
    * ordered column specs). */
  private def recognize(plan: LogicalPlan): (String, Option[String], Seq[ColSpec]) = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"graft mview: $why — the maintainable shape is SELECT <group cols>, " +
        "count(*) AS n [, sum/min/max(col) ...] FROM <graft table> " +
        "[WHERE p] GROUP BY <group cols> (avg = sum/count downstream)")
    val agg = plan match {
      case a: Aggregate => a
      case _ => fail("the definition must be a single GROUP BY aggregate")
    }
    // child chain: Filter? over the (aliased) source relation
    def source(p: LogicalPlan, cond: Option[Expression])
        : (Option[Expression], DataSourceV2Relation) = p match {
      case SubqueryAlias(_, c) => source(c, cond)
      case Filter(c2, c) =>
        if (cond.isDefined) fail("more than one WHERE layer")
        source(c, Some(c2))
      case r: DataSourceV2Relation => (cond, r)
      case other => fail(s"unsupported input ${other.nodeName} (single graft " +
        "table, optional WHERE only — no joins/subqueries)")
    }
    val (cond, rel) = source(agg.child, None)
    val path = rel.table match {
      case _: GraftStoreTable => rel.table.properties().get("location")
      case t => fail(s"source ${t.name()} is not a graft-store table")
    }
    cond.foreach { c =>
      if (!c.deterministic) fail("non-deterministic WHERE predicate")
      if (c.references.exists(a => !rel.output.exists(_.exprId == a.exprId)))
        fail("WHERE references columns outside the source table")
    }
    val groupIds = agg.groupingExpressions.map {
      case a: AttributeReference => a.exprId
      case other => fail(s"GROUP BY on expression '${other.sql}' (plain columns only)")
    }.toSet
    def stripCast(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => stripCast(c)
      case _ => e
    }
    val cols = agg.aggregateExpressions.map {
      case a: AttributeReference if groupIds.contains(a.exprId) =>
        GroupCol(a.name, a.name)
      case Alias(a: AttributeReference, nm) if groupIds.contains(a.exprId) =>
        GroupCol(a.name, nm)
      case Alias(ae: AggregateExpression, nm) =>
        if (ae.isDistinct) fail(s"DISTINCT aggregate in '$nm'")
        if (ae.filter.isDefined) fail(s"FILTER clause in aggregate '$nm'")
        ae.aggregateFunction match {
          case c: Count if c.children.forall(_.foldable) => CountCol(nm)
          case c: Count => fail(s"count(col) in '$nm' (use count(*); " +
            "count(col) skips nulls and is not sign-maintainable as stored)")
          case s: Sum => stripCast(s.child) match {
            case a: AttributeReference => SumCol(a.name, nm)
            case other => fail(s"sum over expression '${other.sql}' in '$nm' " +
              "(plain column sums only)")
          }
          // min/max are NOT sign-maintainable under removals, but they ARE
          // under pure inserts (least/greatest against the stored value);
          // refresh takes the fast path when a group saw only inserts and
          // RESCANS just the removal-touched groups otherwise
          case m: Min => stripCast(m.child) match {
            case a: AttributeReference => MinCol(a.name, nm)
            case other => fail(s"min over expression '${other.sql}' in '$nm'")
          }
          case m: Max => stripCast(m.child) match {
            case a: AttributeReference => MaxCol(a.name, nm)
            case other => fail(s"max over expression '${other.sql}' in '$nm'")
          }
          case other => fail(s"aggregate ${other.prettyName} in '$nm'")
        }
      case other => fail(s"unsupported select item '${other.sql}' (every " +
        "aggregate needs an alias; group columns may be renamed)")
    }
    if (!cols.exists(_.isInstanceOf[GroupCol])) fail("at least one group column required")
    if (!cols.exists(_.isInstanceOf[CountCol]))
      fail("a count(*) column is required (the group-liveness column)")
    // serialize the predicate UNQUALIFIED: it re-applies by name to the
    // delta frame, where the defining catalog.table qualifier means nothing
    (path, cond.map(_.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql), cols)
  }

  /** The view's aggregation, built from the RECOGNIZED specs (never by
    * re-executing user SQL — the recognized form IS the definition). */
  private def aggregate(src: DataFrame, filterSql: Option[String],
      cols: Seq[ColSpec]): DataFrame = {
    val filtered = filterSql.fold(src)(f => src.filter(expr(f)))
    val groups = cols.collect { case GroupCol(s, o) => col(s).as(o) }
    val aggs = cols.collect {
      case CountCol(o) => count(lit(1)).as(o)
      case SumCol(s, o) => sum(col(s)).as(o)
      case MinCol(s, o) => min(col(s)).as(o)
      case MaxCol(s, o) => max(col(s)).as(o)
    }
    filtered.groupBy(groups: _*).agg(aggs.head, aggs.tail: _*)
      .select(cols.map(c => col(c.out)): _*)
  }

  private def wmProps(src: String, filterSql: Option[String], cols: Seq[ColSpec],
      sql: String, idx: Int, name: String): Map[String, String] =
    Map("graft.mv" -> "true", "graft.mv.source" -> src,
      "graft.mv.cols" -> encodeCols(cols), "graft.mv.query" -> sql,
      "graft.mv.watermark" -> idx.toString, "graft.mv.wmname" -> name) ++
      filterSql.map("graft.mv.filter" -> _)

  /** CREATE: recognize, pin the source head, materialize at that
    * snapshot, and publish table + metadata + watermark as the creating
    * commit. Returns (rows materialized, watermark snapshot). */
  def create(spark: SparkSession, mvPath: String, sql: String): (Long, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    require(GraftStoreFormat.readLatestManifest(mvPath, conf).isEmpty,
      s"graft mview: a table already exists at $mvPath")
    val (srcPath, filterSql, cols) =
      recognize(spark.sql(sql).queryExecution.analyzed)
    val ms = GraftStoreFormat.listManifests(srcPath, conf)
    require(ms.nonEmpty, s"graft mview: source $srcPath has no snapshots")
    val headIdx = ms.size - 1
    val pinned = spark.read.format("graft-store")
      .option("snapshot", headIdx).load(srcPath)
    val df = aggregate(pinned, filterSql, cols).localCheckpoint(true)
    val n = df.count()
    df.write.format("graft-store").option("dmlMode", "mor")
      .option("setProps",
        wmProps(srcPath, filterSql, cols, sql, headIdx, ms(headIdx).getName)
          .toSeq.sortBy(_._1)
          .map { case (k, v) => s"${enc(k)}:${enc(v)}" }.mkString(","))
      .mode("overwrite").save(mvPath)
    (n, headIdx)
  }

  /** CONTINUOUS maintenance: a Structured Streaming TRIGGER that runs an
    * incremental [[refresh]] after every micro-batch of new source
    * commits. The stream carries no state of its own — each refresh
    * reads the churn between the DURABLE watermark and the source head
    * and publishes atomically, so a replayed batch (restart, crash) is a
    * no-op by construction: exactly-once effect without touching the
    * checkpoint's semantics. The batch DataFrame itself is never
    * executed — the stream is pure commit-notification plumbing; the
    * refresh does its own (churn-proportional) reads. */
  def streamRefresh(spark: SparkSession, mvPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val props = GraftStoreOps.tableProps(spark, mvPath)
    require(props.get("graft.mv").contains("true"),
      s"graft mview: $mvPath is not a materialized view")
    val srcPath = props("graft.mv.source")
    spark.readStream.format("graft-store").load(srcPath)
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, mvPath); ()
      }
      .start()
  }

  /** REFRESH: no-op if the watermark is the head; INCREMENTAL (signed
    * deltas -> changed-group merge -> one replace-by-key commit) when the
    * watermark snapshot is still retained; FULL recompute (overwrite,
    * still pinned + atomically stamped) when it expired or on
    * `forceFull`. Returns (mode, groups changed, groups deleted, new
    * watermark). */
  def refresh(spark: SparkSession, mvPath: String,
      forceFull: Boolean = false): (String, Long, Long, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val props = GraftStoreOps.tableProps(spark, mvPath)
    require(props.get("graft.mv").contains("true"),
      s"graft mview: $mvPath is not a materialized view")
    val srcPath = props("graft.mv.source")
    val filterSql = props.get("graft.mv.filter")
    val cols = decodeCols(props("graft.mv.cols"))
    val wm = props("graft.mv.watermark").toInt
    val ms = GraftStoreFormat.listManifests(srcPath, conf)
    require(ms.nonEmpty, s"graft mview: source $srcPath has no snapshots")
    val headIdx = ms.size - 1
    // the stored watermark is valid iff the manifest it indexed is STILL
    // the same file (expiry renumbers nothing, it deletes — a vanished or
    // shifted name means the delta base is gone)
    val wmValid = wm < ms.size && ms(wm).getName == props("graft.mv.wmname")
    if (wmValid && wm == headIdx && !forceFull) return ("noop", 0L, 0L, wm)
    val newProps = wmProps(srcPath, filterSql, cols,
      props("graft.mv.query"), headIdx, ms(headIdx).getName)
    if (forceFull || !wmValid) {
      val pinned = spark.read.format("graft-store")
        .option("snapshot", headIdx).load(srcPath)
      val df = aggregate(pinned, filterSql, cols).localCheckpoint(true)
      val n = df.count()
      df.write.format("graft-store").option("dmlMode", "mor")
        .option("setProps", newProps.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${enc(k)}:${enc(v)}" }.mkString(","))
        .mode("overwrite").save(mvPath)
      return ("full", n, 0L, headIdx)
    }
    // ---- incremental ----
    val signed = GraftStoreOps.signedChanges(spark, srcPath, wm, headIdx)
    val d = filterSql.fold(signed)(f => signed.filter(expr(f)))
    val groupOuts = cols.collect { case g: GroupCol => g }
    val liveOut = cols.collectFirst { case CountCol(o) => o }.get
    val hasMinMax =
      cols.exists(c => c.isInstanceOf[MinCol] || c.isInstanceOf[MaxCol])
    val deltaAggs: Seq[org.apache.spark.sql.Column] = cols.collect {
      case CountCol(o) => sum(col("_sign")).as(s"${o}_d")
      case SumCol(c2, o) => sum(col(c2) * col("_sign")).as(s"${o}_d")
      // extremes over the INSERTED rows only: the fast least/greatest
      // path's input (removal-touched groups rescan instead)
      case MinCol(c2, o) => min(when(col("_sign") > 0, col(c2))).as(s"${o}_i")
      case MaxCol(c2, o) => max(when(col("_sign") > 0, col(c2))).as(s"${o}_i")
    } ++ (if (!hasMinMax) Seq.empty else Seq(
      // did ANY row leave this group? (carried-identical rows in rewritten
      // files appear as -1/+1 pairs and flag conservatively — correct,
      // just a wider rescan on mask-churned files)
      max(when(col("_sign") < 0, 1).otherwise(0)).as("_rm")))
    val deltas = d
      .groupBy(groupOuts.map(g => col(g.src).as(g.out)): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .localCheckpoint(true)
    // RESCAN the removal-touched groups from the PINNED head: the only
    // exact source of a post-removal extreme. Scoped by a semi join on
    // the group keys — churn-groups cost, with layout/stats/bloom pruning
    // participating like any keyed scan.
    val rescanned: Option[DataFrame] =
      if (!hasMinMax) None
      else {
        val keys = deltas.filter(col("_rm") === 1)
          .select(groupOuts.map(g => col(g.out).as(g.src)): _*)
        val pinned = spark.read.format("graft-store")
          .option("snapshot", headIdx).load(srcPath)
        val mmAggs: Seq[org.apache.spark.sql.Column] = cols.collect {
          case MinCol(c2, o) => min(col(c2)).as(s"${o}_r")
          case MaxCol(c2, o) => max(col(c2)).as(s"${o}_r")
        }
        Some(filterSql.fold(pinned)(f => pinned.filter(expr(f)))
          .join(keys, groupOuts.map(_.src), "left_semi")
          .groupBy(groupOuts.map(g => col(g.src).as(g.out)): _*)
          .agg(mmAggs.head, mmAggs.tail: _*))
      }
    val mvSchema = spark.read.format("graft-store").load(mvPath).schema
    def zero(dt: DataType) = lit(0).cast(dt)
    val base = spark.read.format("graft-store").load(mvPath)
    // right-outer on the delta side: only CHANGED groups participate —
    // the merge is O(changed groups), the rest of the view is untouched
    val joined0 = base.join(deltas, groupOuts.map(_.out), "right_outer")
    val joined = rescanned.fold(joined0)(r =>
      joined0.join(r, groupOuts.map(_.out), "left_outer"))
    val merged = joined
      .select(groupOuts.map(g => col(g.out)) ++ cols.collect {
        case CountCol(o) =>
          (coalesce(col(o), lit(0L)) + coalesce(col(s"${o}_d"), lit(0L)))
            .cast(LongType).as(o)
        case SumCol(_, o) =>
          (coalesce(col(o), zero(mvSchema(o).dataType))
            + coalesce(col(s"${o}_d"), zero(mvSchema(o).dataType)))
            .cast(mvSchema(o).dataType).as(o)
        // removal-touched group: the rescanned exact extreme; otherwise
        // least/greatest(stored, inserted) — both skip nulls, so new
        // groups (no stored) and no-insert groups fall out right
        case MinCol(_, o) =>
          when(col("_rm") === 1, col(s"${o}_r"))
            .otherwise(least(col(o), col(s"${o}_i")))
            .cast(mvSchema(o).dataType).as(o)
        case MaxCol(_, o) =>
          when(col("_rm") === 1, col(s"${o}_r"))
            .otherwise(greatest(col(o), col(s"${o}_i")))
            .cast(mvSchema(o).dataType).as(o)
      }: _*)
      .localCheckpoint(true)
    val survivors = merged.filter(col(liveOut) > 0L)
      .select(cols.map(c => col(c.out)): _*)
    val vanished = merged.filter(col(liveOut) <= 0L).count()
    val keys = merged.select(groupOuts.map(g => col(g.out)): _*)
    val (nUp, nKeys) = GraftStoreOps.replaceByKeyMor(
      spark, mvPath, survivors, groupOuts.map(_.out), keys, newProps)
    // nKeys == 0 (no effective churn): replaceByKeyMor still stamped the
    // advanced watermark as a metadata-only commit
    ("incremental", nUp, vanished, headIdx)
  }
}
