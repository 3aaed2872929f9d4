package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BinaryComparison, Cast, Expression, In, InSet, IsNotNull, KnownNotNull, NamedExpression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import scala.jdk.CollectionConverters._

/** TRANSPARENT MATERIALIZED-VIEW REWRITE (the classic warehouse
  * optimization, Oracle/Calcite "materialized view rewrite"): a query
  * that aggregates a graft table is served from a REGISTERED, FRESH
  * materialized view of the same shape — the user keeps writing queries
  * against the base table and silently reads precomputed rows.
  *
  * Discovery is O(1) per aggregate: [[GraftMview.create]] stamps the
  * SOURCE table with `_mvdeps.d/` pointer files (metadata-only, NOT a
  * commit), so the rule never enumerates a catalog — it follows the
  * pointers and inspects each candidate's own metadata. A stale pointer
  * (dropped MV directory) just fails the lookup and is skipped.
  *
  * The rewrite fires ONLY when it is provably exact:
  *
  *   - the MV is FRESH: its stored watermark(s) name the source's (or
  *     both join sources') CURRENT head manifest — same
  *     snapshot-isolation guarantee as reading the base directly;
  *   - the query aggregates the MV's source shape: the single source
  *     table, or the same INNER equi-join (same two tables, same key
  *     pairs, either order) for a join view;
  *   - grouping is the MV's group set (stored rows project straight
  *     through) or a PROPER SUBSET of it including the empty set (the
  *     ROLLUP rewrite: stored finer groups re-aggregate — counts sum,
  *     min/max nest, avg and the variance family recombine EXACTLY from
  *     their internal moment columns);
  *   - the query's WHERE decomposes into [the MV's own WHERE] AND
  *     [residual conjuncts over MV GROUP columns]: every MV-filter
  *     conjunct must appear (semantically) in the query — so the MV is
  *     never missing rows the query needs — and what remains applies to
  *     the stored rows BEFORE any re-aggregation. Join-key IsNotNull
  *     conjuncts (inferred by the optimizer) are implied by the inner
  *     equi-join itself and ignored;
  *   - every output derives from a stored MV column with IDENTICAL
  *     result types; aggregates carry no DISTINCT/FILTER.
  *
  * The MV's stored filter text re-analyzes against the query's own
  * relation attributes (parse → analyze → constant-fold), so both sides
  * compare post-coercion — `o_orderkey < 8000` matches whether the 8000
  * arrived as an int literal or a folded bigint cast.
  *
  * The replacement re-aliases stored columns to the original output's
  * exprIds (names, types, and — via [[KnownNotNull]] where the original
  * was non-nullable — nullability all preserved, the optimizer-rule
  * contract).
  *
  * At 100 TB this turns the dashboard aggregate — and its WHERE'd and
  * drilled-down variants — from full fact-table scans into reads of a
  * few thousand precomputed rows: combined with CDC-driven incremental
  * refresh, the end-to-end cost of a standing aggregate family is churn
  * at refresh time plus O(groups) at query time. Opt out with
  * `spark.graft.mv.rewrite=false`. */
class GraftMviewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.mv.rewrite").forall(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case _ => e
  }

  /** What the query aggregates: graft relation(s), every filter conjunct
    * between the aggregate and the scan(s) (WHEREs pushed below the join
    * included — for an inner join they commute with it), and the
    * equi-join key pairs (empty for a single table). */
  private case class QuerySource(rels: Seq[DataSourceV2Relation],
      paths: Seq[String], conjs: Seq[Expression], joinKeys: Seq[(String, String)])

  /** Peel attribute-only Projects and Filters, accumulating conjuncts. */
  private def peel(p: LogicalPlan): (Seq[Expression], LogicalPlan) = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => peel(c)
    case Filter(cond, c) =>
      val (cs, base) = peel(c)
      (splitConjunctivePredicates(cond) ++ cs, base)
    case other => (Nil, other)
  }

  /** Only a PLAIN read of the table head is servable: a relation carrying
    * any read option beyond `path` (snapshot/time-travel pins, CDC
    * ranges) asks for something other than the current head — the MV's
    * freshness gate speaks only for the head, so serving a pinned read
    * from it would silently time-travel the answer (the MV machinery's
    * own pinned recomputes flow through this same optimizer). */
  private def graftRel(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftStoreTable] &&
        r.options.keySet().asScala.forall(_.equalsIgnoreCase("path")) =>
      Some(r)
    case _ => None
  }

  private def pathOf(rel: DataSourceV2Relation): String =
    rel.table.properties().get("location")

  private def extractSource(child: LogicalPlan): Option[QuerySource] =
    peel(child) match {
      case (conjs, r: DataSourceV2Relation) if graftRel(r).isDefined =>
        Some(QuerySource(Seq(r), Seq(pathOf(r)), conjs, Nil))
      case (conjs, j: Join) if j.joinType == Inner && j.condition.isDefined =>
        val (lc, lbase) = peel(j.left)
        val (rc, rbase) = peel(j.right)
        for {
          lrel <- graftRel(lbase)
          rrel <- graftRel(rbase)
          keys <- eqKeyPairs(j.condition.get, lrel, rrel)
        } yield QuerySource(Seq(lrel, rrel), Seq(pathOf(lrel), pathOf(rrel)),
          conjs ++ lc ++ rc, keys)
      case _ => None
    }

  /** Plain equi-key conjunction → (leftName, rightName) pairs; anything
    * else in the ON condition makes the join unservable. */
  private def eqKeyPairs(cond: Expression, l: DataSourceV2Relation,
      r: DataSourceV2Relation): Option[Seq[(String, String)]] = {
    val lIds = l.output.map(_.exprId).toSet
    val rIds = r.output.map(_.exprId).toSet
    val pairs = splitConjunctivePredicates(cond).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: AttributeReference, b: AttributeReference) =>
        if (lIds.contains(a.exprId) && rIds.contains(b.exprId)) a.name -> b.name
        else if (rIds.contains(a.exprId) && lIds.contains(b.exprId)) b.name -> a.name
        else return None
      case _ => return None
    }
    Some(pairs)
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val qs = extractSource(agg.child).getOrElse(return None)
    val conf = spark.sparkContext.hadoopConfiguration
    val deps = qs.paths.flatMap(p => GraftStoreFormat.readMvDeps(p, conf)).distinct
    if (deps.isEmpty) return None
    // the sources' CURRENT heads: freshness is name-exact (expiry
    // deletes, never renumbers — a matching name IS the same snapshot)
    val heads = qs.paths.map { p =>
      GraftStoreFormat.listManifests(p, conf).lastOption
        .map(_.getName).getOrElse(return None)
    }
    val groupAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    deps.view.flatMap { mvPath =>
      tryOne(agg, groupAttrs, qs, heads, mvPath)
    }.headOption
  }

  /** The MV's stored filter text, re-analyzed against the query's own
    * relation attributes and constant-folded — the same coercion path
    * the query's WHERE went through, so conjuncts compare semantically. */
  private def analyzedFilter(txt: String, out: Seq[Attribute])
      : Option[Seq[Expression]] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(txt)
      val folded = org.apache.spark.sql.catalyst.optimizer.ConstantFolding(
        spark.sessionState.analyzer.execute(Filter(parsed, LocalRelation(out))))
      folded match {
        case Filter(c, _) => Some(splitConjunctivePredicates(c))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def tryOne(agg: Aggregate, groupAttrs: Seq[AttributeReference],
      qs: QuerySource, heads: Seq[String], mvPath: String): Option[LogicalPlan] = {
    import GraftMview._
    val conf = spark.sparkContext.hadoopConfiguration
    val mvManifest = GraftStoreFormat.readLatestManifest(mvPath, conf)
      .getOrElse(return None) // stale pointer: MV dropped
    val p = mvManifest.props
    if (!p.get("graft.mv").contains("true")) return None
    // source-shape match: single table, or the same join in either order
    (qs.paths, p.get("graft.mv.source2")) match {
      case (Seq(s1), None) =>
        if (p.get("graft.mv.source") != Some(s1)) return None
        if (p.get("graft.mv.wmname") != Some(heads.head)) return None // STALE
      case (Seq(q1, q2), Some(m2)) =>
        val m1 = p("graft.mv.source")
        val sw = if (q1 == m1 && q2 == m2) false
          else if (q1 == m2 && q2 == m1) true
          else return None
        val (h1, h2) = if (sw) (heads(1), heads.head) else (heads.head, heads(1))
        if (p.get("graft.mv.wmname") != Some(h1)) return None // STALE
        if (p.get("graft.mv.wmname2") != Some(h2)) return None // STALE
        // key pairs must match as a set, normalized to (source, source2)
        val mvKeys = p("graft.mv.keys").split(";", -1).toSeq.map { kv =>
          val Array(a, b) = kv.split(":", 2)
          GraftStoreFormat.unescStat(a) -> GraftStoreFormat.unescStat(b)
        }.toSet
        val qKeys = (if (sw) qs.joinKeys.map(_.swap) else qs.joinKeys).toSet
        if (qKeys != mvKeys) return None
      case _ => return None
    }
    val cols = decodeCols(p.getOrElse("graft.mv.cols", return None))
    // group-set containment: an EXACT match projects stored rows; a
    // PROPER SUBSET (including the empty set — a global aggregate)
    // re-aggregates the finer view's stored columns, the classic rollup
    // rewrite — count sums counts, avg/variance recombine from their
    // internal moment columns, min/max nest
    val mvGroups = cols.collect { case g: GroupCol => g }
    val qNames = groupAttrs.map(_.name)
    if (qNames.distinct.size != qNames.size) return None
    val exact = qNames.toSet == mvGroups.map(_.src).toSet &&
      qNames.size == mvGroups.size
    val rollup = !exact && qNames.toSet.subsetOf(mvGroups.map(_.src).toSet)
    if (!exact && !rollup) return None
    // ---- filter containment ----------------------------------------
    // join-key IsNotNull conjuncts (inferred by the optimizer) are
    // implied by the inner equi-join itself
    val keyNames: Set[String] =
      qs.joinKeys.flatMap(k => Seq(k._1, k._2)).toSet
    val qConjs = qs.conjs.filterNot {
      case IsNotNull(a: AttributeReference) => keyNames.contains(a.name)
      case _ => false
    }
    if (qConjs.exists(c => !c.deterministic ||
        c.exists(_.isInstanceOf[PlanExpression[_]]))) return None
    val allOut: Seq[Attribute] = qs.rels.flatMap(_.output)
    val mvConjs: Seq[Expression] = p.get("graft.mv.filter") match {
      case None => Nil
      case Some(txt) => analyzedFilter(txt, allOut).getOrElse(return None)
    }
    // every MV-filter conjunct must appear in the query, or the MV may
    // be missing rows the query needs
    if (!mvConjs.forall(m => qConjs.exists(_.semanticEquals(m))))
      return None
    val residual0 = qConjs.filterNot(q => mvConjs.exists(_.semanticEquals(q)))
    // IsNotNull(a) is implied when a matched MV conjunct is a
    // null-intolerant predicate over a — the stored rows already exclude
    // NULL a
    val residual = residual0.filterNot {
      case IsNotNull(a: AttributeReference) => mvConjs.exists(m =>
        m.references.contains(a) && (m.isInstanceOf[BinaryComparison] ||
          m.isInstanceOf[In] || m.isInstanceOf[InSet]))
      case _ => false
    }
    // the MV relation: its DSv2 table, full stored schema
    val mvRel = DataSourceV2Relation.create(
      new GraftStoreTable(mvPath, mvManifest.schema), None, None)
    def mvAttr(out: String): AttributeReference =
      mvRel.output.collectFirst {
        case a: AttributeReference if a.name == out => a
      }.get
    // residual conjuncts apply to stored rows BEFORE re-aggregation, so
    // they may only touch MV GROUP columns (any group column of the
    // finer view — not just the query's grouping)
    def convFilter(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        mvGroups.find(_.src == a.name).map(g => mvAttr(g.out))
      case other =>
        val kids = other.children.map(convFilter)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val residualMapped: Seq[Expression] =
      residual.map(c => convFilter(c).getOrElse(return None))
    // ---- output mapping --------------------------------------------
    // one aggregate call -> its stored MV column, result-type-IDENTICAL
    // (e.g. decimal avg's internal division type can differ from Average's
    // declared type — then no rewrite)
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val mapped = ae.aggregateFunction match {
        case c: Count if c.children.forall(_.foldable) =>
          cols.collectFirst { case CountCol(o) => mvAttr(o) }
        case c: Count if c.children.size == 1 =>
          stripCast(c.children.head) match {
            case a: AttributeReference =>
              cols.collectFirst { case CountNNCol(s, o) if s == a.name => mvAttr(o) }
            case _ => None
          }
        case s: Sum => stripCast(s.child) match {
          case a: AttributeReference =>
            cols.collectFirst { case SumCol(s2, o) if s2 == a.name => mvAttr(o) }
          case _ => None
        }
        case v: Average => stripCast(v.child) match {
          case a: AttributeReference =>
            cols.collectFirst { case AvgCol(s2, o) if s2 == a.name => mvAttr(o) }
          case _ => None
        }
        case m: Min => stripCast(m.child) match {
          case a: AttributeReference =>
            cols.collectFirst { case MinCol(s2, o) if s2 == a.name => mvAttr(o) }
          case _ => None
        }
        case m: Max => stripCast(m.child) match {
          case a: AttributeReference =>
            cols.collectFirst { case MaxCol(s2, o) if s2 == a.name => mvAttr(o) }
          case _ => None
        }
        case v: org.apache.spark.sql.catalyst.expressions.aggregate.CentralMomentAgg =>
          val kind = v match {
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.VarianceSamp => "vs"
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.VariancePop => "vp"
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.StddevSamp => "ds"
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.StddevPop => "dp"
            case _ => ""
          }
          if (kind.isEmpty) None
          else stripCast(v.child) match {
            case a: AttributeReference => cols.collectFirst {
              case VarCol(s2, o, k) if s2 == a.name && k == kind => mvAttr(o)
            }
            case _ => None
          }
        case _ => None
      }
      mapped.filter(_.dataType == ae.dataType)
    }
    // rollup form: one aggregate call over the BASE -> a re-aggregation
    // over the finer view's stored columns. All arithmetic is typed by
    // hand (this runs post-analysis); anything that cannot reproduce the
    // original result type exactly falls through to "no rewrite".
    def mapAggRollup(ae: AggregateExpression): Option[Expression] = {
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Coalesce, Divide, GreaterThan, Greatest, Literal, Multiply, Sqrt, Subtract, Cast => CCast}
      import org.apache.spark.sql.types.DoubleType
      if (ae.isDistinct || ae.filter.isDefined) return None
      def sumOf(out: String): Expression = Sum(mvAttr(out)).toAggregateExpression()
      def srcOf(child: Expression): Option[String] = stripCast(child) match {
        case a: AttributeReference => Some(a.name)
        case _ => None
      }
      def momentExpr(o: String, kind: String): Expression = {
        val sS = sumOf(s"__s_$o")
        val qS = sumOf(s"__q_$o")
        val nS = sumOf(s"__n_$o")
        val nD = CCast(nS, DoubleType)
        val m2 = Greatest(Seq(
          Subtract(qS, Divide(Multiply(sS, sS), nD)), Literal(0.0)))
        val inner = kind match {
          case "vs" | "ds" => CaseWhen(Seq((GreaterThan(nS, Literal(1L)),
            Divide(m2, Subtract(nD, Literal(1.0))))), None)
          case _ => CaseWhen(Seq((GreaterThan(nS, Literal(0L)),
            Divide(m2, nD))), None)
        }
        if (kind == "ds" || kind == "dp") Sqrt(inner) else inner
      }
      val mapped: Option[Expression] = ae.aggregateFunction match {
        case c: Count if c.children.forall(_.foldable) =>
          cols.collectFirst { case CountCol(o) =>
            Coalesce(Seq(sumOf(o), Literal(0L))) } // count of nothing is 0
        case c: Count if c.children.size == 1 =>
          srcOf(c.children.head).flatMap(nm => cols.collectFirst {
            case CountNNCol(s2, o) if s2 == nm =>
              Coalesce(Seq(sumOf(o), Literal(0L))) })
        case s: Sum => srcOf(s.child).flatMap(nm => cols.collectFirst {
          case SumCol(s2, o) if s2 == nm => sumOf(o) })
        case v: Average => srcOf(v.child).flatMap(nm => cols.collectFirst {
          case AvgCol(s2, o) if s2 == nm =>
            val nS = sumOf(s"__n_$o")
            CaseWhen(Seq((GreaterThan(nS, Literal(0L)),
              Divide(CCast(sumOf(s"__s_$o"), DoubleType),
                CCast(nS, DoubleType)))), None) })
        case m: Min => srcOf(m.child).flatMap(nm => cols.collectFirst {
          case MinCol(s2, o) if s2 == nm =>
            Min(mvAttr(o)).toAggregateExpression() })
        case m: Max => srcOf(m.child).flatMap(nm => cols.collectFirst {
          case MaxCol(s2, o) if s2 == nm =>
            Max(mvAttr(o)).toAggregateExpression() })
        case v: org.apache.spark.sql.catalyst.expressions.aggregate.CentralMomentAgg =>
          val kind = v match {
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.VarianceSamp => "vs"
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.VariancePop => "vp"
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.StddevSamp => "ds"
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.StddevPop => "dp"
            case _ => ""
          }
          if (kind.isEmpty) None
          else srcOf(v.child).flatMap(nm => cols.collectFirst {
            case VarCol(s2, o, k) if s2 == nm && k == kind => momentExpr(o, kind) })
        case _ => None
      }
      mapped.filter(_.dataType == ae.dataType)
    }
    // convert an output expression TREE: aggregate calls and group columns
    // become stored MV columns; any other reference to the source makes
    // the expression unservable. Handles post-aggregation arithmetic like
    // `round(sum(x), 2)` — the MV column slots in where the call was.
    def conv(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        if (exact) mapAgg(ae) else mapAggRollup(ae)
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        mvGroups.find(_.src == a.name).map(g => mvAttr(g.out))
      case _: AttributeReference => None // bare source column: unservable
      case other =>
        val kids = other.children.map(conv)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val projected: Seq[NamedExpression] = agg.aggregateExpressions.map { orig =>
      val replacement = orig match {
        case a: AttributeReference => conv(a)
        case Alias(child, _) => conv(child)
        case _ => None
      }
      replacement match {
        case Some(r) if r.dataType == orig.dataType =>
          val guarded = if (!orig.nullable && r.nullable) KnownNotNull(r) else r
          Alias(guarded, orig.name)(exprId = orig.exprId)
        case _ => return None
      }
    }
    val mvChild: LogicalPlan =
      if (residualMapped.isEmpty) mvRel
      else Filter(residualMapped.reduce(
        org.apache.spark.sql.catalyst.expressions.And(_, _)), mvRel)
    logInfo(s"graft mview rewrite: serving aggregate over " +
      qs.paths.mkString(" JOIN ") +
      (if (exact) " " else " (ROLLED UP) ") +
      (if (residualMapped.nonEmpty) "(residual WHERE) " else "") +
      s"from fresh MV $mvPath")
    if (exact) Some(Project(projected, mvChild))
    else {
      val groupingOut = groupAttrs.map(a =>
        mvAttr(mvGroups.find(_.src == a.name).get.out))
      Some(Aggregate(groupingOut, projected, mvChild))
    }
  }
}
