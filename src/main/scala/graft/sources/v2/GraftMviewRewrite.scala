package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, KnownNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** TRANSPARENT MATERIALIZED-VIEW REWRITE (the classic warehouse
  * optimization, Oracle/Calcite "materialized view rewrite"): a query
  * that aggregates a graft table is served from a REGISTERED, FRESH
  * materialized view of the same shape — the user keeps writing queries
  * against the base table and silently reads precomputed rows.
  *
  * Discovery is O(1) per aggregate: [[GraftMview.create]] stamps the
  * SOURCE table's user properties with a `graft.mv.dependents` pointer
  * list (a metadata-only commit), so the rule never enumerates a catalog
  * — it reads the source relation's (cached) manifest, follows the
  * pointers, and inspects each candidate's own metadata. A stale pointer
  * (dropped MV directory) just fails the lookup and is skipped.
  *
  * The rewrite fires ONLY when it is provably exact:
  *
  *   - the MV is FRESH: its stored watermark names the source's CURRENT
  *     head manifest — same snapshot-isolation guarantee as reading the
  *     base table directly;
  *   - the query is a bare single-table aggregate (no WHERE — a filtered
  *     MV or query never matches in this phase), grouping on exactly the
  *     MV's group columns, each output deriving from a stored MV column
  *     (count(*) → liveness count, sum/min/max/avg/count(col) → their
  *     specs) with IDENTICAL result types;
  *   - aggregates carry no DISTINCT/FILTER.
  *
  * The replacement is a Project over the MV's DSv2 relation that
  * re-aliases stored columns to the original output's exprIds (names,
  * types, and — via [[KnownNotNull]] where the original was non-nullable
  * — nullability all preserved, the optimizer-rule contract).
  *
  * At 100 TB this turns the dashboard aggregate from a full fact-table
  * scan into a read of a few thousand precomputed rows — combined with
  * the CDC-driven incremental refresh, the end-to-end cost of a standing
  * aggregate is churn at refresh time plus O(groups) at query time.
  * Opt out with `spark.graft.mv.rewrite=false`. */
class GraftMviewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.mv.rewrite").forall(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, rel: DataSourceV2Relation, _)
          if rel.table.isInstanceOf[GraftStoreTable] =>
        rewrite(agg, rel).getOrElse(agg)
      // column pruning may already have inserted a pure attribute
      // projection between the aggregate and the relation — transparent
      case agg @ Aggregate(_, _, Project(projList, rel: DataSourceV2Relation), _)
          if rel.table.isInstanceOf[GraftStoreTable] &&
            projList.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(agg, rel).getOrElse(agg)
    }
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case _ => e
  }

  private def rewrite(agg: Aggregate, rel: DataSourceV2Relation)
      : Option[LogicalPlan] = {
    val srcPath = rel.table.properties().get("location")
    val conf = spark.sparkContext.hadoopConfiguration
    val deps = GraftStoreFormat.readMvDeps(srcPath, conf)
    if (deps.isEmpty) return None
    // the source's CURRENT head: freshness is name-exact (expiry deletes,
    // never renumbers — a matching name IS the same committed snapshot)
    val srcHead = GraftStoreFormat.listManifests(srcPath, conf).lastOption
      .map(_.getName).getOrElse(return None)

    val groupAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }

    deps.view.flatMap { mvPath =>
      tryOne(agg, groupAttrs, mvPath, srcPath, srcHead)
    }.headOption
  }

  private def tryOne(agg: Aggregate, groupAttrs: Seq[AttributeReference],
      mvPath: String, srcPath: String, srcHead: String): Option[LogicalPlan] = {
    import GraftMview._
    val conf = spark.sparkContext.hadoopConfiguration
    val mvManifest = GraftStoreFormat.readLatestManifest(mvPath, conf)
      .getOrElse(return None) // stale pointer: MV dropped
    val p = mvManifest.props
    if (!p.get("graft.mv").contains("true")) return None
    if (p.get("graft.mv.source") != Some(srcPath)) return None
    if (p.contains("graft.mv.source2")) return None // join MVs: not in this phase
    if (p.contains("graft.mv.filter")) return None // filtered MVs: not in this phase
    if (p.get("graft.mv.wmname") != Some(srcHead)) return None // STALE: refresh first
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
    // the MV relation: its DSv2 table, full stored schema
    val mvRel = DataSourceV2Relation.create(
      new GraftStoreTable(mvPath, mvManifest.schema), None, None)
    def mvAttr(out: String): AttributeReference =
      mvRel.output.collectFirst {
        case a: AttributeReference if a.name == out => a
      }.get
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
      import org.apache.spark.sql.types.{DoubleType, LongType}
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
    logInfo(s"graft mview rewrite: serving aggregate over $srcPath " +
      (if (exact) "" else "(ROLLED UP) ") + s"from fresh MV $mvPath")
    if (exact) Some(Project(projected, mvRel))
    else {
      val groupingOut = groupAttrs.map(a =>
        mvAttr(mvGroups.find(_.src == a.name).get.out))
      Some(Aggregate(groupingOut, projected, mvRel))
    }
  }
}
