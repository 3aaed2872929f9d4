package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, BinaryComparison, Cast, EqualTo, Expression, In, InSet, IsNotNull, KnownNotNull, NamedExpression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LocalRelation, LogicalPlan, Project}
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
  *     pairs, either order) for a join view — or, the EAGER-AGGREGATION
  *     JOIN-BACK (Yan & Larson, VLDB'95): a single-table MV whose group
  *     set covers the fact side's join keys serves a fact⋈dim aggregate
  *     as MV⋈dim, re-aggregated (see [[tryJoinBack]]);
  *   - grouping is the MV's group set (stored rows project straight
  *     through) or a PROPER SUBSET of it including the empty set (the
  *     ROLLUP rewrite: stored finer groups re-aggregate — counts sum,
  *     min/max nest, avg and the variance family recombine EXACTLY from
  *     their internal moment columns). DISTINCT aggregates over a view
  *     GROUP column roll up as the same distinct aggregate over the
  *     stored key column (the view holds each combination once, and
  *     DISTINCT dedupes across stored rows anyway);
  *   - the query's WHERE decomposes into [the MV's own WHERE] AND
  *     [residual conjuncts over MV GROUP columns]: every MV-filter
  *     conjunct must appear (semantically) in the query or be IMPLIED
  *     by a strictly tighter predicate on the same column — a tighter
  *     literal range, an IN-list subset, `= v` with v in the view's
  *     IN-list, or an IN-list whose every element satisfies the view's
  *     range — so the MV is never missing rows the query needs — and
  *     what remains applies to the stored rows BEFORE any
  *     re-aggregation. Join-key IsNotNull conjuncts (inferred by the
  *     optimizer) are implied by the inner equi-join itself and ignored;
  *   - every output derives from a stored MV column with IDENTICAL
  *     result types. An aggregate's FILTER (WHERE p) is served when p
  *     maps onto view GROUP columns: the predicate attaches to the
  *     internal re-aggregation calls (forcing the re-aggregation form
  *     even at the exact group set) — the view partitions the source by
  *     its group set, so filtering whole stored rows IS filtering the
  *     source rows. HAVING needs no machinery at all: the analyzer
  *     plants it as a Filter ABOVE the aggregate, which simply applies
  *     to the served rows.
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
  * At 100 TB this turns the dashboard aggregate — and its WHERE'd,
  * drilled-down, and dimension-joined variants — from full fact-table
  * scans into reads of a few thousand precomputed rows: combined with
  * CDC-driven incremental refresh, the end-to-end cost of a standing
  * aggregate family is churn at refresh time plus O(groups) at query
  * time. Opt out with `spark.graft.mv.rewrite=false`. */
class GraftMviewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.mv.rewrite").forall(_.toBoolean)

  /** Probe-cache TTL ([[GraftStoreFormat.probeMv]]): same-JVM commits
    * invalidate instantly regardless; the TTL only bounds how long a
    * CROSS-PROCESS commit can keep serving the pre-commit snapshot.
    * 0 disables caching (every plan re-lists the filesystem). */
  private def probeTtlMs: Long =
    spark.conf.getOption("spark.graft.mv.probeCacheMs").map(_.toLong)
      .getOrElse(2000L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }
  }

  /** GROUPING SETS / CUBE / ROLLUP served from MVs: the analyzer lowers
    * `GROUP BY GROUPING SETS(…)` into `Aggregate(keys :+ gid,
    * Expand(one projection per member, Project(child.output ++ key
    * aliases, source)))` — the Expand replicates every source row once
    * per member with the member's absent keys NULLed and a literal
    * grouping id. Semantically that aggregate IS the UNION of the
    * members' individual aggregates (each a plain GROUP BY over the same
    * source, with absent keys published as typed NULLs and the gid as a
    * constant), so each member re-enters the ordinary [[rewrite]] path —
    * exact, rollup, mixed, join-back, calendar coarsening, whatever
    * serves — and the whole query is replaced ONLY when EVERY member
    * serves (an un-servable member would re-scan the source anyway, and
    * splitting one Expand scan into k scans is a pessimization unless all
    * k avoid the source).
    *
    * Aggregate arguments follow Spark's grouping-sets semantics
    * unchanged: the analyzer substitutes grouping keys INSIDE aggregate
    * calls with the (per-member nulled) expand attributes, so a member
    * where that key is absent computes `count(NULL) = 0` / `sum(NULL) =
    * NULL` — folded here to the same constants before the member is
    * served (a null argument must never map onto a stored column:
    * `count(NULL)` is NOT `count(*)`).
    *
    * At 100 TB this is the BI drill-down payoff: the cube over (a, b)
    * reads the (a, b)-grain view's O(groups) rows once per member —
    * never one fact scan per grouping-set member. */
  private def tryGroupingSets(agg: Aggregate,
      expand: org.apache.spark.sql.catalyst.plans.logical.Expand)
      : Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val out = expand.output
    val gidIdx = out.indexWhere(
      _.name == org.apache.spark.sql.catalyst.expressions.VirtualColumn.groupingIdName)
    if (gidIdx < 0) return None
    val gidAttr = out(gidIdx)
    val posOf: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Int] =
      out.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    // the aggregate's grouping must be exactly expand-output attributes
    // with the gid among them (the grouping-sets lowering); anything else
    // is some other Expand consumer — leave it alone
    val groupAttrs: Seq[Attribute] = agg.groupingExpressions.map {
      case a: AttributeReference if posOf.contains(a.exprId) => a
      case _ => return None
    }
    if (!groupAttrs.exists(_.exprId == gidAttr.exprId)) return None
    val keyAttrs = groupAttrs.filterNot(_.exprId == gidAttr.exprId)
    val keyIdx: Set[Int] = keyAttrs.map(a => posOf(a.exprId)).toSet
    // pass-through sanity: every NON-key, non-gid output position must
    // carry the identical pass-through attribute in EVERY projection —
    // the grouping-sets shape; anything else (a distinct-agg Expand, a
    // future exotic consumer) refuses
    if (expand.projections.isEmpty) return None
    val passOk = out.indices.forall { i =>
      keyIdx.contains(i) || i == gidIdx ||
        expand.projections.forall(p => p(i).semanticEquals(out(i)))
    }
    if (!passOk) return None
    val members: Seq[Aggregate] = expand.projections.map { p =>
      p(gidIdx) match { case _: Literal => () case _ => return None }
      val subst: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
          Expression] =
        (keyAttrs.map(a => a.exprId -> p(posOf(a.exprId))) :+
          (gidAttr.exprId -> p(gidIdx))).toMap
      val mGroups: Seq[Expression] = keyAttrs.flatMap { a =>
        p(posOf(a.exprId)) match {
          case Literal(null, _) => None // absent from this member
          case e => Some(e)
        }
      }
      def foldNullAgg(ae: AggregateExpression): Option[Expression] = {
        import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Count, Max, Min, Sum}
        val argsNull = ae.aggregateFunction.children.exists {
          case Literal(null, _) => true
          case Cast(Literal(null, _), _, _, _) => true
          case _ => false
        }
        if (!argsNull) return Some(ae)
        ae.aggregateFunction match {
          case _: Count => Some(Literal(0L))
          case _: Sum | _: Average | _: Min | _: Max |
              _: org.apache.spark.sql.catalyst.expressions.aggregate
                .CentralMomentAgg =>
            Some(Literal(null, ae.dataType))
          case _ => None // unmodeled null-argument aggregate: refuse
        }
      }
      val mAggs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
        val t0 = ne.transformUp {
          case a: AttributeReference if subst.contains(a.exprId) =>
            subst(a.exprId)
        }
        val t = t0.transformUp {
          case ae: AggregateExpression =>
            foldNullAgg(ae).getOrElse(return None)
        }
        t match {
          case n: NamedExpression => n
          case e => Alias(e, ne.name)(exprId = ne.exprId)
        }
      }
      Aggregate(mGroups, mAggs, expand.child)
    }
    val served: Seq[LogicalPlan] =
      members.map(m => rewrite(m).getOrElse(return None))
    // Union takes its output (the original exprIds) from the FIRST child;
    // later children re-alias fresh so no two branches share an exprId
    val branches = served.head +: served.tail.map(p =>
      Project(p.output.map(a => Alias(a, a.name)()), p))
    logInfo(s"graft mview rewrite: serving GROUPING SETS " +
      s"(${members.size} members) as a union of MV-served aggregates")
    Some(org.apache.spark.sql.catalyst.plans.logical.Union(branches))
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case _ => e
  }

  /** What the query aggregates: graft relation(s), every filter conjunct
    * between the aggregate and the scan(s) (WHEREs pushed below the joins
    * included — for inner joins they commute), and the cross-relation
    * equi-join attribute pairs (empty for a single table). Any number of
    * relations: a flattened INNER-join tree. */
  private case class QuerySource(rels: Seq[DataSourceV2Relation],
      paths: Seq[String], conjs: Seq[Expression],
      pairs: Seq[(AttributeReference, AttributeReference)],
      leftSides: Set[Int] = Set.empty, full: Boolean = false) {
    /** Any LEFT OUTER step → chain semantics. */
    def leftOuter: Boolean = leftSides.nonEmpty
    /** Key pairs as names normalized to (rels(0), rels(1)) — the
      * two-relation exact-join-view match. */
    def joinKeys: Seq[(String, String)] = {
      val lIds = rels.head.outputSet
      pairs.map { case (a, b) =>
        if (lIds.contains(a)) a.name -> b.name else b.name -> a.name
      }
    }
    /** Which relation owns this attribute, if any. */
    def sideOf(a: Attribute): Option[Int] =
      rels.indexWhere(_.outputSet.contains(a)) match {
        case -1 => None
        case i => Some(i)
      }
  }

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

  /** Flatten an arbitrary INNER-equi-join tree of graft relations,
    * accumulating every filter conjunct and every cross-relation key
    * pair. Anything non-inner, non-equi, or non-graft refuses. */
  private def flatten(p: LogicalPlan): Option[(Seq[DataSourceV2Relation],
      Seq[Expression], Seq[(AttributeReference, AttributeReference)])] = {
    val (conjs, base) = peel(p)
    base match {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        for {
          (lr, lc, lp) <- flatten(j.left)
          (rr, rc, rp) <- flatten(j.right)
          ps <- eqAttrPairs(j.condition.get,
            lr.flatMap(_.output).map(_.exprId).toSet,
            rr.flatMap(_.output).map(_.exprId).toSet)
        } yield (lr ++ rr, conjs ++ lc ++ rc, lp ++ rp ++ ps)
      case r: DataSourceV2Relation if graftRel(r).isDefined =>
        Some((Seq(r), conjs, Nil))
      case _ => None
    }
  }

  private def extractSource(child0: LogicalPlan): Option[QuerySource] = {
    // A RIGHT JOIN B IS B LEFT JOIN A (symmetric equi-ON; resolution is
    // by exprId): flip right-outer queries into the left-chain machinery
    // so they serve from the (flip-normalized) maintained views
    val child = child0.transformUp {
      case j: Join if j.joinType ==
          org.apache.spark.sql.catalyst.plans.RightOuter =>
        j.copy(left = j.right, right = j.left,
          joinType = org.apache.spark.sql.catalyst.plans.LeftOuter)
    }
    val (topConjs, base) = peel(child)
    base match {
      // FULL OUTER shape: exactly two bare graft relations (filters
      // peeled from BELOW either side do not commute — both sides
      // null-extend — so any sub-join conjunct refuses)
      case j: Join if j.joinType ==
          org.apache.spark.sql.catalyst.plans.FullOuter &&
          j.condition.isDefined =>
        val (lc, lbase) = peel(j.left)
        val (rc, rbase) = peel(j.right)
        if (lc.nonEmpty || rc.nonEmpty) return None
        for {
          lr <- graftRel(lbase)
          rr <- graftRel(rbase)
          ps <- eqAttrPairs(j.condition.get,
            lr.output.map(_.exprId).toSet, rr.output.map(_.exprId).toSet)
          paths = Seq(pathOf(lr), pathOf(rr))
          if paths.distinct.size == 2
        } yield QuerySource(Seq(lr, rr), paths, topConjs, ps, full = true)
      // CHAIN shape (the tree contains a LEFT OUTER anywhere): a
      // LEFT-DEEP chain of bare graft relations with INNER and LEFT
      // OUTER steps mixed (fact ⟕ d1 ⋈ d2 ⟕ … — the shapes
      // [[GraftMview]] maintains). Filters peeled from below any RIGHT
      // side, or between chain levels, do NOT commute with the view's
      // above-join WHERE (they change which rows null-extend) — refuse;
      // filters at the chain's bottom-left (the fact) commute (a left
      // join is row-local in its left argument) and pool with the
      // above-join conjuncts.
      case j: Join if j.condition.isDefined && {
          def hasLeft(p0: LogicalPlan): Boolean = p0 match {
            case jj: Join => jj.joinType ==
              org.apache.spark.sql.catalyst.plans.LeftOuter ||
              hasLeft(jj.left) || hasLeft(jj.right)
            case Project(_, c) => hasLeft(c)
            case Filter(_, c) => hasLeft(c)
            case _ => false
          }
          hasLeft(j)
        } =>
        def walk(p: LogicalPlan): Option[(Seq[DataSourceV2Relation],
            Seq[Expression], Seq[(AttributeReference, AttributeReference)],
            Seq[Boolean])] =
          p match {
            case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
              walk(c)
            case jj: Join if (jj.joinType ==
                org.apache.spark.sql.catalyst.plans.LeftOuter ||
                jj.joinType == Inner) && jj.condition.isDefined =>
              val (rc, rbase) = peel(jj.right)
              if (rc.nonEmpty) None
              else for {
                lwr <- walk(jj.left)
                rr <- graftRel(rbase)
                ps <- eqAttrPairs(jj.condition.get,
                  lwr._1.flatMap(_.output).map(_.exprId).toSet,
                  rr.output.map(_.exprId).toSet)
              } yield (lwr._1 :+ rr, lwr._2, lwr._3 ++ ps, lwr._4 :+
                (jj.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter))
            case other =>
              val (bc, base) = peel(other)
              graftRel(base).map(r => (Seq(r), bc,
                Seq.empty[(AttributeReference, AttributeReference)],
                Seq.empty[Boolean]))
          }
        walk(j).flatMap { case (rels, factConjs, ps, types) =>
          val paths = rels.map(pathOf)
          if (paths.distinct.size != paths.size) None
          else Some(QuerySource(rels, paths, topConjs ++ factConjs, ps,
            types.zipWithIndex.collect { case (true, x) => x + 1 }.toSet))
        }
      case _ =>
        flatten(child).flatMap { case (rels, conjs, pairs) =>
          val paths = rels.map(pathOf)
          // a self-join makes path-based MV matching ambiguous: refuse
          if (paths.distinct.size != paths.size) None
          else Some(QuerySource(rels, paths, conjs, pairs))
        }
    }
  }

  /** Plain equi-key conjunction → attribute pairs with the left-subtree
    * attribute first; anything else in the ON condition makes the join
    * unservable. */
  private def eqAttrPairs(cond: Expression, lIds: Set[
      org.apache.spark.sql.catalyst.expressions.ExprId], rIds: Set[
      org.apache.spark.sql.catalyst.expressions.ExprId])
      : Option[Seq[(AttributeReference, AttributeReference)]] = {
    val pairs = splitConjunctivePredicates(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (lIds.contains(a.exprId) && rIds.contains(b.exprId)) (a, b)
        else if (rIds.contains(a.exprId) && lIds.contains(b.exprId)) (b, a)
        else return None
      case _ => return None
    }
    Some(pairs)
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // GROUPING SETS / CUBE / ROLLUP arrive as Aggregate over Expand
    // (possibly behind a column-pruning Project): decompose into members
    // and serve each through this same entry — see [[tryGroupingSets]]
    def expandOf(p: LogicalPlan)
        : Option[org.apache.spark.sql.catalyst.plans.logical.Expand] =
      p match {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => Some(e)
        case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
          expandOf(c)
        case _ => None
      }
    expandOf(agg.child) match {
      case Some(e) => return tryGroupingSets(agg, e)
      case None => ()
    }
    val (groupExprs, aggExprs, aggChild) = inlineGroupingProjects(agg)
    val qs = extractSource(aggChild).getOrElse(return None)
    val conf = spark.sparkContext.hadoopConfiguration
    // one cached probe per source path: (dependent views, current head).
    // Freshness stays name-exact (expiry deletes, never renumbers — a
    // matching name IS the same snapshot); the cache only elides the
    // filesystem listing, not the comparison
    val probes = qs.paths.map(p => GraftStoreFormat.probeMv(p, conf, probeTtlMs))
    val deps = probes.flatMap(_._1).distinct
    if (deps.isEmpty) return None
    val heads = probes.map(_._2.getOrElse(return None))
    // grouping may be plain columns OR deterministic expressions (the
    // calendar-MV shape): matching is semantic, per candidate view
    if (groupExprs.exists(!_.deterministic)) return None
    deps.view.flatMap { mvPath =>
      tryOne(agg, groupExprs, aggExprs, qs, heads, mvPath).orElse(
        tryDcountRollup(groupExprs, aggExprs, qs, heads, mvPath))
    }.headOption
  }

  /** COUNT(DISTINCT) ROLLUP through the dup-count companion: a query
    * grouping COARSER than the view (including the global aggregate)
    * cannot re-sum the stored per-group distinct counts (a value living
    * in many fine groups would double-count), but RE-DISTINCTING the
    * per-(group, value) companion pairs is exact — the companion holds
    * each surviving (group…, value) exactly once. Served as
    * `view ⟕ companion` on the group keys (null-safe), so a group whose
    * values are all NULL — zero companion pairs — still publishes its 0,
    * then `Aggregate(coarse keys, count(DISTINCT __dv))` on top.
    *
    * Gates: the query matches the view's source shape EXACTLY (the
    * single table, or the same join — tables, key pairs, per-side join
    * types), fresh (every side's watermark AND the companion's own
    * stamped watermark — a companion mid-migration never serves);
    * every aggregate output is a distinct count over the SAME tracked
    * column (any other aggregate would be inflated by the per-value
    * replication); grouping is a subset of the view's keys; the usual
    * WHERE containment with residuals on group columns. At scale this
    * turns `count(DISTINCT user) BY region` over a (region, day)-grained
    * view into a join of two O(groups·values) stored tables — never a
    * fact scan. */
  private def tryDcountRollup(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], qs: QuerySource, heads: Seq[String],
      mvPath: String): Option[LogicalPlan] = {
    import GraftMview._
    val conf = spark.sparkContext.hadoopConfiguration
    val mvManifest = GraftStoreFormat.probeLatestManifest(mvPath, conf, probeTtlMs)
      .getOrElse(return None)
    val p = mvManifest.props
    if (!p.get("graft.mv").contains("true")) return None
    // EXACT source-shape match (the companion partitions the view's own
    // joined relation): the single table, or the same N-way join — same
    // tables, same key-pair set, same per-side join types (ordered, for
    // left chains) — with every side fresh
    def fresh(i: Int, path: String): Boolean = {
      val sfx = if (i == 0) "" else (i + 1).toString
      val qi = qs.paths.indexOf(path)
      qi >= 0 && p.get(s"graft.mv.wmname$sfx").contains(heads(qi))
    }
    def joinShapeOk(paths: Seq[String], keys: Seq[(Int, String, Int, String)],
        lefts: Set[Int], mvFull: Boolean): Boolean = {
      if (qs.full != mvFull) return false
      if (qs.paths.toSet != paths.toSet || qs.paths.size != paths.size)
        return false
      if (lefts != qs.leftSides) return false
      if (lefts.nonEmpty && qs.paths != paths) return false // orientation
      if (!paths.zipWithIndex.forall { case (path, i) => fresh(i, path) })
        return false // STALE
      val mvPos: Map[String, Int] = paths.zipWithIndex.toMap
      val qKeys: Set[(Int, String, Int, String)] = qs.pairs.map { case (a, b) =>
        val ia = mvPos(qs.paths(qs.sideOf(a).getOrElse(return false)))
        val ib = mvPos(qs.paths(qs.sideOf(b).getOrElse(return false)))
        if (ia < ib) (ia, a.name, ib, b.name) else (ib, b.name, ia, a.name)
      }.toSet
      qKeys == keys.toSet
    }
    GraftMview.decodeSource(p) match {
      case GraftMview.SingleSrc(s1) =>
        if (qs.paths != Seq(s1) || qs.leftSides.nonEmpty || qs.full)
          return None
        if (!fresh(0, s1)) return None // STALE
      case GraftMview.JoinSrc(paths, keys, lefts) =>
        if (!joinShapeOk(paths, keys, lefts, mvFull = false)) return None
      case GraftMview.FullSrc(paths, keys) =>
        if (!joinShapeOk(paths, keys, Set.empty, mvFull = true)) return None
    }
    val cols = decodeCols(p.getOrElse("graft.mv.cols", return None))
    val mm = new MvMapping(cols, DataSourceV2Relation.create(
      new GraftStoreTable(mvPath, mvManifest.schema), None, None))
    val allOut: Seq[Attribute] = qs.rels.flatMap(_.output)
    val keyOf: Map[GraftMview.GroupCol, Expression] = mm.mvGroups.flatMap(g =>
      mm.keyExprFor(g, allOut).map(g -> _)).toMap
    val matchedGroups: Seq[GraftMview.GroupCol] = groupExprs.map { qe =>
      mm.mvGroups.find(g => keyOf.get(g).exists(_.semanticEquals(qe)))
        .getOrElse(return None)
    }
    if (matchedGroups.distinct.size != matchedGroups.size) return None
    def dcOf(ae: AggregateExpression): Option[DCountCol] =
      if (!ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case c: Count if c.children.size == 1 =>
          stripCast(c.children.head) match {
            case a: AttributeReference =>
              cols.collectFirst { case d @ DCountCol(s2, _) if s2 == a.name => d }
            case _ => None
          }
        case _ => None
      }
    // every aggregate call in the output must be a distinct count over
    // ONE tracked column (its companion is the only relation joined in)
    var dcUsed = Set.empty[DCountCol]
    aggExprs.foreach(_.foreach {
      case ae: AggregateExpression => dcOf(ae) match {
        case Some(d) => dcUsed += d
        case None => return None
      }
      case _ => ()
    })
    if (dcUsed.size != 1) return None
    val dcol = dcUsed.head
    val cp = s"$mvPath/_dck_${dcol.out}"
    val cpManifest = GraftStoreFormat.probeLatestManifest(cp, conf, probeTtlMs)
      .getOrElse(return None)
    // the companion stamps (snapshot, manifest-name) for EVERY source
    val expectedWm = {
      val nSrc = GraftMview.decodeSource(p) match {
        case GraftMview.SingleSrc(_) => 1
        case GraftMview.JoinSrc(ps, _, _) => ps.size
        case GraftMview.FullSrc(ps, _) => ps.size
      }
      (0 until nSrc).map { i =>
        val sfx = if (i == 0) "" else (i + 1).toString
        s"${p.getOrElse(s"graft.mv.watermark$sfx", return None)}:" +
          GraftStoreFormat.escStat(
            p.getOrElse(s"graft.mv.wmname$sfx", return None))
      }.mkString(",")
    }
    if (!cpManifest.props.get("graft.dck.wms").contains(expectedWm))
      return None // companion behind or mid-migration: never serve
    val cpRel = DataSourceV2Relation.create(
      new GraftStoreTable(cp, cpManifest.schema), None, None)
    def cAttr(n: String): Option[AttributeReference] = cpRel.output.collectFirst {
      case a: AttributeReference if a.name == n => a }
    val dvAttr = cAttr("__dv").getOrElse(return None)
    // WHERE containment: residuals apply to view group columns.
    // Inner-implied join-key IsNotNull conjuncts drop for pure-inner
    // shapes; left shapes keep every conjunct (same rule as tryOne)
    val qConjs = usableConjs(qs.conjs,
      if (qs.leftOuter) Set.empty
      else qs.pairs.flatMap(pr => Seq(pr._1.name, pr._2.name)).toSet)
      .getOrElse(return None)
    val mvConjs: Seq[Expression] = p.get("graft.mv.filter") match {
      case None => Nil
      case Some(txt) => analyzedFilter(txt, allOut).getOrElse(return None)
    }
    val residual = containFilters(qConjs, mvConjs).getOrElse(return None)
    val residualMapped: Seq[Expression] =
      residual.map(c => mm.convFilter(c, keyOf).getOrElse(return None))
    val viewChild: LogicalPlan =
      if (residualMapped.isEmpty) mm.mvRel
      else Filter(residualMapped.reduce(And(_, _)), mm.mvRel)
    val joinCond: Expression = mm.mvGroups.map(g =>
      org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
        mm.mvAttr(g.out), cAttr(g.out).getOrElse(return None)): Expression)
      .reduce(And(_, _))
    val joined: LogicalPlan = Join(viewChild, cpRel,
      org.apache.spark.sql.catalyst.plans.LeftOuter, Some(joinCond),
      JoinHint.NONE)
    def conv(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        dcOf(ae).map(_ =>
          Count(dvAttr).toAggregateExpression(isDistinct = true))
      case e2 if mm.matchedKey(e2, keyOf).isDefined => mm.matchedKey(e2, keyOf)
      case _: AttributeReference => None
      case other =>
        val kids = other.children.map(conv)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val projected: Seq[NamedExpression] = aggExprs.map { orig =>
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
    val groupingOut: Seq[Expression] = matchedGroups.map(g => mm.mvAttr(g.out))
    logInfo(s"graft mview rewrite: serving count(DISTINCT ${dcol.src}) " +
      s"rollup from fresh MV $mvPath dup-count companion")
    Some(Aggregate(groupingOut, projected, joined))
  }

  /** The optimizer (PullOutGroupingExpressions) pulls complex grouping
    * expressions into a `Project(... AS _groupingexpression)` under the
    * Aggregate; inline those back ([[GraftMview.inlineGroupingProjects]])
    * so the calendar-bucket shape is visible for semantic matching. */
  private def inlineGroupingProjects(agg: Aggregate)
      : (Seq[Expression], Seq[NamedExpression], LogicalPlan) = {
    val a = GraftMview.inlineGroupingProjects(agg)
    (a.groupingExpressions, a.aggregateExpressions, a.child)
  }

  /** An expression-key's stored SQL text, re-analyzed against the query's
    * own relation attributes and constant-folded — the group-key analogue
    * of [[analyzedFilter]], so both sides compare post-coercion. */
  private def analyzedExpr(txt: String, out: Seq[Attribute])
      : Option[Expression] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(txt)
      val folded = org.apache.spark.sql.catalyst.optimizer.ConstantFolding(
        spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, "__k")()), LocalRelation(out))))
      folded match {
        case Project(Seq(Alias(e, _)), _) => Some(e)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

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

  /** Typed literal comparator shared by [[litImplies]] and
    * [[excludesDisjunct]]: None when the (type, value) shapes are not
    * comparable — the callers stay conservative. */
  private def litCmp(t: org.apache.spark.sql.types.DataType, x: Any, y: Any)
      : Option[Int] = {
    import org.apache.spark.sql.types.{ByteType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampType}
    (t, x, y) match {
      case (ByteType | ShortType | IntegerType | LongType | DateType |
            TimestampType, a: Number, b: Number) =>
        Some(java.lang.Long.compare(a.longValue(), b.longValue()))
      case (FloatType | DoubleType, a: Number, b: Number) =>
        Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case (_: org.apache.spark.sql.types.DecimalType,
            a: org.apache.spark.sql.types.Decimal,
            b: org.apache.spark.sql.types.Decimal) =>
        Some(a.toJavaBigDecimal.compareTo(b.toJavaBigDecimal))
      case (StringType, a: org.apache.spark.unsafe.types.UTF8String,
            b: org.apache.spark.unsafe.types.UTF8String) =>
        Some(a.compareTo(b))
      case _ => None
    }
  }

  /** Does query conjunct `q` IMPLY view conjunct `m`? Decided only for
    * single-column predicates against foldable literals on the SAME
    * attribute and type — `a >= 15` implies `a >= 10`, `a = 7` implies
    * `a > 5`, `a IN (1, 2)` implies `a IN (1, 2, 3)`, `a = 2` implies
    * `a IN (1, 2)`, `a IN (2, 4)` implies `a <= 5`. Anything undecidable
    * is a conservative false (no rewrite). All recognized predicate forms
    * are null-intolerant over `a`, so the implication carries SQL
    * three-valued semantics for free: rows where `a` is NULL satisfy
    * neither side (NULL literals in an IN list keep no extra rows and
    * drop out of the value sets). */
  private def litImplies(q: Expression, m: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampType}
    // normalize to (attr, op, literal) with the attr on the left
    def bound(e: Expression): Option[(AttributeReference, String, Any)] = e match {
      case GreaterThan(a: AttributeReference, Literal(v, _)) => Some((a, ">", v))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => Some((a, ">=", v))
      case LessThan(a: AttributeReference, Literal(v, _)) => Some((a, "<", v))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => Some((a, "<=", v))
      case EqualTo(a: AttributeReference, Literal(v, _)) => Some((a, "=", v))
      case GreaterThan(Literal(v, _), a: AttributeReference) => Some((a, "<", v))
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => Some((a, "<=", v))
      case LessThan(Literal(v, _), a: AttributeReference) => Some((a, ">", v))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => Some((a, ">=", v))
      case EqualTo(Literal(v, _), a: AttributeReference) => Some((a, "=", v))
      case _ => None
    }
    // the attribute's non-null IN-list values (In pre-optimization,
    // InSet after OptimizeIn — the query side may arrive as either)
    def inVals(e: Expression): Option[(AttributeReference, Seq[Any])] = e match {
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some((a, vs.map(_.asInstanceOf[Literal].value).filter(_ != null)))
      case InSet(a: AttributeReference, hs) =>
        Some((a, hs.toSeq.filter(_ != null)))
      case _ => None
    }
    def cmp(t: DataType, x: Any, y: Any): Option[Int] = litCmp(t, x, y)
    def satisfies(t: DataType, v: Any, op: String, w: Any): Boolean =
      v != null && cmp(t, v, w).exists(c => op match {
        case ">" => c > 0
        case ">=" => c >= 0
        case "<" => c < 0
        case "<=" => c <= 0
        case "=" => c == 0
      })
    def sameCol(a: AttributeReference, b: AttributeReference): Boolean =
      a.exprId == b.exprId && a.dataType == b.dataType
    (bound(q), inVals(q), bound(m), inVals(m)) match {
      // range ⟹ range (with = as the degenerate point range)
      case (Some((qa, qo, qv)), _, Some((ma, mo, mvv)), _) if sameCol(qa, ma) =>
        cmp(qa.dataType, qv, mvv).exists(c => (qo, mo) match {
          case (">", ">") | (">=", ">=") | (">", ">=") => c >= 0
          case (">=", ">") | ("=", ">") => c > 0
          case ("=", ">=") => c >= 0
          case ("<", "<") | ("<=", "<=") | ("<", "<=") => c <= 0
          case ("<=", "<") | ("=", "<") => c < 0
          case ("=", "<=") => c <= 0
          case _ => false
        })
      // = v ⟹ IN (…) when v is in the view's list
      case (Some((qa, "=", qv)), _, _, Some((ma, ms))) if sameCol(qa, ma) =>
        ms.exists(w => satisfies(qa.dataType, qv, "=", w))
      // IN ⟹ IN when the query's value set ⊆ the view's (an empty
      // post-NULL-drop query list keeps nothing — trivially implied)
      case (_, Some((qa, qset)), _, Some((ma, ms))) if sameCol(qa, ma) =>
        qset.forall(v => ms.exists(w => satisfies(qa.dataType, v, "=", w)))
      // IN ⟹ range when every listed value satisfies the bound
      case (_, Some((qa, qset)), Some((ma, mo, mvv)), _) if sameCol(qa, ma) =>
        qset.forall(v => satisfies(qa.dataType, v, mo, mvv))
      case _ => false
    }
  }

  /** Calendar-unit nesting rank for `date_trunc` formats: unit A nests
    * inside unit B (truncating to B after truncating to A equals
    * truncating to B directly) iff rank(A) < rank(B) and neither is WEEK.
    * WEEK is the one non-nesting unit — a week straddles month/quarter/
    * year boundaries — so it only COARSENS (query side) from day-or-finer
    * stored keys and never serves as the finer (view) unit of a
    * coarsening. None for unrecognized formats (conservative). */
  private def truncRank(fmt: Expression): Option[Int] = fmt match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String, _) =>
      s.toString.toLowerCase(java.util.Locale.ROOT) match {
        case "microsecond" => Some(0)
        case "millisecond" => Some(1)
        case "second" => Some(2)
        case "minute" => Some(3)
        case "hour" => Some(4)
        case "day" | "dd" => Some(5)
        case "week" => Some(weekRank)
        case "month" | "mon" | "mm" => Some(6)
        case "quarter" => Some(7)
        case "year" | "yyyy" | "yy" => Some(8)
        case _ => None
      }
    case _ => None
  }
  private val weekRank = 100 // off the nesting chain — see truncRank

  /** FUNCTIONAL-DEPENDENCY CALENDAR COARSENING: the query groups by a
    * DETERMINISTIC MONOTONE RE-BUCKETING of a stored expression key — a
    * YEAR bucket over a month-grain `date_trunc` key, `year(d)` /
    * `quarter(d)` / `month(d)` over the same — which is not a group
    * SUBSET (the classic rollup gate) but a functional dependency: every
    * stored fine bucket maps to exactly one coarse bucket, so grouping
    * the stored rows by `f(stored key)` and re-aggregating is the
    * ordinary rollup algebra with one extra scalar applied to the key.
    * Returns the served grouping expression over the stored key column,
    * or None when `qe` is not a recognized re-bucketing of `viewKey`.
    *
    * Soundness of each recognized pair rests on unit NESTING:
    * `date_trunc(U, date_trunc(V, x)) = date_trunc(U, x)` whenever V
    * nests in U (both interpreted in the SAME session zone — the stored
    * key text re-analyzes under the query session, so both sides carry
    * the query session's zone), and `year/quarter/month(cast(x AS date))`
    * are invariant under any finer-than-their-unit truncation of x. */
  private def coarsenOf(qe: Expression, viewKey: Expression,
      storedAttr: AttributeReference): Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{Month, Quarter, TruncTimestamp, Year}
    import org.apache.spark.sql.types.DateType
    val (vFmt, vChild, vTz) = viewKey match {
      case TruncTimestamp(f, c, tz) => (f, c, tz)
      case _ => return None
    }
    val vRank = truncRank(vFmt).getOrElse(return None)
    if (vRank == weekRank) return None // week nests in nothing coarser
    // the date-typed view of the stored key for year/quarter/month —
    // the cast zone is the key's own zone (consistent bucketing)
    def asDate: Expression = Cast(storedAttr, DateType, vTz)
    // compare the date-typed child the analyzer wrapped (year(ts) arrives
    // as Year(Cast(ts, date))) against the view key's truncated column
    def sameCol(c: Expression): Boolean =
      stripCast(c).semanticEquals(stripCast(vChild))
    qe match {
      case TruncTimestamp(qFmt, qChild, qTz)
          if qTz == vTz && sameCol(qChild) =>
        val qRank = truncRank(qFmt).getOrElse(return None)
        // week coarsens day-or-finer keys; otherwise strict chain nesting
        if (qRank == weekRank) {
          if (vRank <= 5) Some(TruncTimestamp(qFmt, storedAttr, vTz)) else None
        } else if (qRank > vRank) Some(TruncTimestamp(qFmt, storedAttr, vTz))
        else None
      case Year(c) if sameCol(c) && vRank <= 7 => Some(Year(asDate))
      case Quarter(c) if sameCol(c) && vRank <= 7 => Some(Quarter(asDate))
      case Month(c) if sameCol(c) && vRank <= 6 => Some(Month(asDate))
      case _ => None
    }
  }

  /** Column-mapping helpers bound to ONE candidate MV: its decoded column
    * specs and its relation. Shared by the exact-shape, rollup, and
    * join-back paths — the re-aggregation algebra is identical whether
    * the stored partials are coarsened (rollup) or replicated by a
    * dimension join (join-back). */
  private class MvMapping(val cols: Seq[GraftMview.ColSpec],
      val mvRel: DataSourceV2Relation) {
    import GraftMview._

    val mvGroups: Seq[GroupCol] = cols.collect { case g: GroupCol => g }

    def mvAttr(out: String): AttributeReference =
      mvRel.output.collectFirst {
        case a: AttributeReference if a.name == out => a
      }.get

    /** The stored attribute for a PLAIN source group column name, if
      * grouped (expression keys match semantically via [[keyExprFor]]). */
    def groupAttrFor(srcName: String): Option[AttributeReference] =
      mvGroups.find(g => !g.isExpr && g.src == srcName).map(g => mvAttr(g.out))

    /** The source-side expression a group column stores, resolved against
      * the given source attributes: the attribute itself for a plain
      * column, the re-parsed+analyzed expression for an expression key. */
    def keyExprFor(g: GroupCol, srcOut: Seq[Attribute]): Option[Expression] =
      if (!g.isExpr) srcOut.collectFirst {
        case a: AttributeReference if a.name == g.src => a
      } else analyzedExpr(g.src, srcOut)

    /** The stored-column expression serving `e`: the stored attribute
      * whose key expression semantically equals `e` (the device that lets
      * outputs and residual filters name a calendar bucket
      * (`date_trunc('month', ts)`) and read the stored key column
      * instead), or — the coarsening extension — a recognized calendar
      * re-bucketing applied to a stored key ([[coarsenOf]]:
      * `date_trunc('year', ts)` over a month-grain key). */
    def matchedKey(e: Expression, keyOf: Map[GroupCol, Expression])
        : Option[Expression] =
      matchedGroup(e, keyOf).map(_._2)

    /** [[matchedKey]] with the matched view group attached — the group
      * matcher proper. Exact matches win over coarsenings (an exact match
      * projects the stored column; a coarsening always re-aggregates). */
    def matchedGroup(e: Expression, keyOf: Map[GroupCol, Expression])
        : Option[(GroupCol, Expression)] = {
      val exact = mvGroups.collectFirst {
        case g if keyOf.get(g).exists(_.semanticEquals(e)) =>
          g -> (mvAttr(g.out): Expression)
      }
      exact.orElse(mvGroups.flatMap { g =>
        keyOf.get(g).flatMap(k => coarsenOf(e, k, mvAttr(g.out)))
          .map(g -> _)
      }.headOption)
    }

    /** Filter conversion: residual conjuncts apply to stored rows BEFORE
      * re-aggregation, so they may only touch MV GROUP columns (any group
      * column of the finer view — not just the query's grouping), by name
      * or as a semantically-matched key expression subtree. */
    def convFilter(e: Expression,
        keyOf: Map[GroupCol, Expression]): Option[Expression] = {
      val hit = matchedKey(e, keyOf)
      if (hit.isDefined) hit
      else e match {
        case a: AttributeReference => groupAttrFor(a.name)
        case other =>
          val kids = other.children.map(convFilter(_, keyOf))
          if (kids.exists(_.isEmpty)) None
          else Some(other.withNewChildren(kids.map(_.get)))
      }
    }

    /** EXACT-group form: one aggregate call -> its stored MV column,
      * result-type-IDENTICAL (e.g. decimal avg's internal division type
      * can differ from Average's declared type — then no rewrite). */
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.isDefined) return None
      if (ae.isDistinct) {
        // a STORED exact distinct count serves the same call verbatim at
        // the exact group set (distinct counts never roll up — coarser
        // groupings go through mapAggRollup's distinct-over-key path)
        val mappedD = ae.aggregateFunction match {
          case c: Count if c.children.size == 1 =>
            stripCast(c.children.head) match {
              case a: AttributeReference =>
                cols.collectFirst { case DCountCol(s2, o) if s2 == a.name =>
                  mvAttr(o) }
              case _ => None
            }
          case _ => None
        }
        return mappedD.filter(_.dataType == ae.dataType)
      }
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
          val kind = varKind(v)
          if (kind.isEmpty) None
          else stripCast(v.child) match {
            case a: AttributeReference => cols.collectFirst {
              case VarCol(s2, o, k) if s2 == a.name && k == kind => mvAttr(o)
            }
            case _ => None
          }
        // the query's sketch build reads the STORED sketch (base64 text
        // on disk — the codec speaks strings — decoded in place):
        // hll_sketch_estimate around it then reproduces the estimate
        case h: org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg =>
          stripCast(h.left) match {
            case a: AttributeReference => cols.collectFirst {
              case HllCol(s2, o, lgk) if s2 == a.name && lgk == h.lgConfigK =>
                org.apache.spark.sql.catalyst.expressions.UnBase64(
                  mvAttr(s"__h_$o"))
            }
            case _ => None
          }
        case _ => None
      }
      mapped.filter(_.dataType == ae.dataType)
    }

    private def varKind(
        v: org.apache.spark.sql.catalyst.expressions.aggregate.CentralMomentAgg): String =
      v match {
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.VarianceSamp => "vs"
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.VariancePop => "vp"
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.StddevSamp => "ds"
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.StddevPop => "dp"
        case _ => ""
      }

    /** RE-AGGREGATION form: one aggregate call over the BASE -> a
      * re-aggregation over the finer view's stored columns. All
      * arithmetic is typed by hand (this runs post-analysis); anything
      * that cannot reproduce the original result type exactly falls
      * through to "no rewrite". Serves both the rollup rewrite (coarser
      * grouping over stored rows) and the join-back rewrite (stored rows
      * replicated by a dimension join) — the algebra is the same. */
    def mapAggRollup(ae: AggregateExpression,
        keyOf: Map[GroupCol, Expression]): Option[Expression] = {
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Coalesce, Divide, GreaterThan, Greatest, Literal, Multiply, Sqrt, Subtract, Cast => CCast}
      import org.apache.spark.sql.types.DoubleType
      // FILTER (WHERE p) decomposes like the residual WHERE: p must map
      // onto view GROUP columns, and then the SAME predicate attaches to
      // every internal re-aggregation call — the view partitions the
      // source exactly by its group set, so filtering whole stored rows
      // before re-summing IS filtering the underlying source rows. A
      // predicate over a collapsed (non-group) column cannot be expressed
      // against stored rows and refuses the rewrite.
      val reFilter: Option[Expression] = ae.filter match {
        case None => None
        case Some(f) =>
          if (!f.deterministic ||
              f.exists(_.isInstanceOf[PlanExpression[_]])) return None
          Some(convFilter(f, keyOf).getOrElse(return None))
      }
      def srcOf(child: Expression): Option[String] = stripCast(child) match {
        case a: AttributeReference => Some(a.name)
        case _ => None
      }
      if (ae.isDistinct) {
        // DISTINCT over a view GROUP column: the finer view stores every
        // surviving (group…) combination exactly once, and DISTINCT
        // dedupes across the re-aggregated rows anyway — so the same
        // distinct aggregate over the stored key column is exact. This is
        // how count(DISTINCT dim) rolls up from a dim-including MV.
        def storedKey(child: Expression): Option[AttributeReference] =
          child match {
            case a: AttributeReference => groupAttrFor(a.name)
            case _ => None
          }
        val mappedD: Option[Expression] = ae.aggregateFunction match {
          case c: Count if c.children.size == 1 =>
            storedKey(c.children.head)
              .map(x => Count(x).toAggregateExpression(true, reFilter))
          case s: Sum =>
            storedKey(s.child)
              .map(x => Sum(x).toAggregateExpression(true, reFilter))
          case v: Average =>
            storedKey(v.child)
              .map(x => Average(x).toAggregateExpression(true, reFilter))
          case _ => None
        }
        return mappedD.filter(_.dataType == ae.dataType)
      }
      def sumOf(out: String): Expression =
        Sum(mvAttr(out)).toAggregateExpression(false, reFilter)
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
            Min(mvAttr(o)).toAggregateExpression(false, reFilter) })
        case m: Max => srcOf(m.child).flatMap(nm => cols.collectFirst {
          case MaxCol(s2, o) if s2 == nm =>
            Max(mvAttr(o)).toAggregateExpression(false, reFilter) })
        case v: org.apache.spark.sql.catalyst.expressions.aggregate.CentralMomentAgg =>
          val kind = varKind(v)
          if (kind.isEmpty) None
          else srcOf(v.child).flatMap(nm => cols.collectFirst {
            case VarCol(s2, o, k) if s2 == nm && k == kind => momentExpr(o, kind) })
        // stored sketches re-union (register max): idempotent and
        // replication-insensitive, so the SAME mapping is exact for
        // rollups AND the join-back replication — the estimate equals a
        // full rebuild's bit-for-bit
        case h: org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg =>
          srcOf(h.left).flatMap(nm => cols.collectFirst {
            case HllCol(s2, o, lgk) if s2 == nm && lgk == h.lgConfigK =>
              new org.apache.spark.sql.catalyst.expressions.aggregate
                .HllUnionAgg(org.apache.spark.sql.catalyst.expressions
                  .UnBase64(mvAttr(s"__h_$o")))
                .toAggregateExpression(false, reFilter)
          })
        case _ => None
      }
      mapped.filter(_.dataType == ae.dataType)
    }
  }

  /** Drop join-key IsNotNull conjuncts (inferred by the optimizer — the
    * inner equi-join itself implies them) and refuse non-deterministic or
    * subquery-bearing predicates. */
  private def usableConjs(conjs: Seq[Expression],
      keyNames: Set[String]): Option[Seq[Expression]] = {
    val kept = conjs.filterNot {
      case IsNotNull(a: AttributeReference) => keyNames.contains(a.name)
      case _ => false
    }
    if (kept.exists(c => !c.deterministic ||
        c.exists(_.isInstanceOf[PlanExpression[_]]))) None
    else Some(kept)
  }

  /** Filter containment: every MV conjunct appears in (or is implied by)
    * the query's; returns the residual query conjuncts, with inferred
    * IsNotNull conjuncts dropped when a matched null-intolerant MV
    * conjunct already excludes NULLs of that column. */
  private def containFilters(qConjs: Seq[Expression], mvConjs: Seq[Expression])
      : Option[Seq[Expression]] = {
    if (!mvConjs.forall(m => qConjs.exists(q =>
        q.semanticEquals(m) || litImplies(q, m))))
      return None
    val residual0 = qConjs.filterNot(q => mvConjs.exists(_.semanticEquals(q)))
    Some(residual0.filterNot {
      case IsNotNull(a: AttributeReference) => mvConjs.exists(m =>
        m.references.contains(a) && (m.isInstanceOf[BinaryComparison] ||
          m.isInstanceOf[In] || m.isInstanceOf[InSet]))
      case _ => false
    })
  }

  private def tryOne(agg: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      qs: QuerySource, heads: Seq[String], mvPath: String): Option[LogicalPlan] = {
    import GraftMview._
    val conf = spark.sparkContext.hadoopConfiguration
    val mvManifest = GraftStoreFormat.probeLatestManifest(mvPath, conf, probeTtlMs)
      .getOrElse(return None) // stale pointer: MV dropped
    val p = mvManifest.props
    if (!p.get("graft.mv").contains("true")) return None
    // join-TYPE matching: a LEFT OUTER view carries null-extended rows an
    // inner-join query must never see, and an inner view LACKS the
    // null-extended rows an exact-shape left-join query needs — the
    // EXACT-shape paths serve only their own kind (per-branch checks
    // below; a left match is additionally ORIENTED: left joins are not
    // symmetric, so the query's (left, right) table order must equal the
    // view's). The JOIN-BACK path is different: an INNER-grain MV *can*
    // serve a left-shape SUPERSET query (the left steps rebuild around
    // the stored groups — see [[tryJoinBack]]), while a LEFT view must
    // never join-back at all (its null-extended groups would be rebuilt
    // under the wrong join types/orientation).
    val mvLefts: Set[Int] = GraftMview.decodeSource(p) match {
      case GraftMview.JoinSrc(_, _, ls) => ls
      case _ => Set.empty
    }
    val mvLeft = mvLefts.nonEmpty
    val mvFull = GraftMview.decodeSource(p).isInstanceOf[GraftMview.FullSrc]
    // FULL OUTER serves FULL OUTER only (both sides carry null-extended
    // rows no other shape shares); it is symmetric, so table order is
    // free — the key-pair normalization below covers both orders
    if (mvFull != qs.full) return None
    // source-shape match: single table, or the same N-way join (any
    // order). A query joining MORE relations than the MV covers — a join
    // query over a single-table MV, or a query whose join SUPERSET
    // includes a 2-table join MV — goes to the (eager-aggregation)
    // join-back path: MV ⋈ uncovered dims, re-aggregated.
    val mvSrcPaths: Seq[String] = GraftMview.decodeSource(p) match {
      case GraftMview.SingleSrc(s1) => Seq(s1)
      case GraftMview.JoinSrc(ps, _, _) => ps
      case GraftMview.FullSrc(ps, _) => ps
    }
    // per-MV-side freshness: wmname<i> must equal the CURRENT head of the
    // same path on the query side (heads is parallel to qs.paths)
    def fresh(i: Int, path: String): Boolean = {
      val sfx = if (i == 0) "" else (i + 1).toString
      val qi = qs.paths.indexOf(path)
      qi >= 0 && p.get(s"graft.mv.wmname$sfx").contains(heads(qi))
    }
    if (mvSrcPaths.size == 1) {
      if (qs.paths.size >= 2) {
        if (!qs.paths.contains(mvSrcPaths.head)) return None
        return tryJoinBack(groupExprs, aggExprs, qs, heads, mvPath, mvManifest)
      }
      if (qs.paths != mvSrcPaths) return None
      if (qs.leftSides.nonEmpty) return None // unreachable: 1 table, no joins
      if (!fresh(0, mvSrcPaths.head)) return None // STALE
    } else if (qs.paths.toSet == mvSrcPaths.toSet &&
        qs.paths.size == mvSrcPaths.size) {
      // exact shape: the join-type sets must match side-for-side
      if (mvLefts != qs.leftSides) return None
      // left-outer orientation: fact and dim must sit on the same sides
      if (mvLeft && qs.paths != mvSrcPaths) return None
      // exact join-shape match, N-way: every side fresh, and the query's
      // key-pair set must equal the MV's, normalized to MV side indices
      if (!mvSrcPaths.zipWithIndex.forall { case (path, i) => fresh(i, path) })
        return None // STALE
      val mvKeys: Set[(Int, String, Int, String)] =
        (GraftMview.decodeSource(p): @unchecked) match {
          case GraftMview.JoinSrc(_, ks, _) => ks.toSet
          case GraftMview.FullSrc(_, ks) => ks.toSet
        }
      val mvPos: Map[String, Int] = mvSrcPaths.zipWithIndex.toMap
      val qKeys: Set[(Int, String, Int, String)] = qs.pairs.map { case (a, b) =>
        val ia = mvPos(qs.paths(qs.sideOf(a).getOrElse(return None)))
        val ib = mvPos(qs.paths(qs.sideOf(b).getOrElse(return None)))
        if (ia < ib) (ia, a.name, ib, b.name) else (ib, b.name, ia, a.name)
      }.toSet
      if (qKeys != mvKeys) return None
    } else if (mvSrcPaths.size == 2 && qs.paths.size > 2 &&
        mvSrcPaths.toSet.subsetOf(qs.paths.toSet)) {
      // a LEFT OUTER view never join-backs: its stored groups carry
      // null-extended rows whose join types/orientation the superset
      // query need not share — comparing positional left-index SETS
      // across different table orderings proves nothing. Inner views
      // only (tryJoinBack re-checks — belt and braces).
      if (mvLeft) return None
      return tryJoinBack(groupExprs, aggExprs, qs, heads, mvPath, mvManifest)
    } else return None
    val cols = decodeCols(p.getOrElse("graft.mv.cols", return None))
    val mm = new MvMapping(cols, DataSourceV2Relation.create(
      new GraftStoreTable(mvPath, mvManifest.schema), None, None))
    // group-set containment, decided SEMANTICALLY: each query grouping
    // expression (a plain column or a calendar-style expression) must
    // match a DISTINCT view group key — the stored attribute for a plain
    // column, the re-parsed+analyzed text for an expression key. An EXACT
    // match (every view key matched) projects stored rows; a PROPER
    // SUBSET (including the empty set — a global aggregate)
    // re-aggregates the finer view's stored columns, the classic rollup
    // rewrite — count sums counts, avg/variance recombine from their
    // internal moment columns, min/max nest
    val allOut: Seq[Attribute] = qs.rels.flatMap(_.output)
    val keyOf: Map[GraftMview.GroupCol, Expression] = mm.mvGroups.flatMap(g =>
      mm.keyExprFor(g, allOut).map(g -> _)).toMap
    // each query grouping expression matches a view key exactly (stored
    // attribute) or as a recognized calendar COARSENING of one (served
    // expression over the stored key — see [[coarsenOf]]); two query keys
    // may legitimately coarsen the SAME view key to different grains
    // (year + quarter over a month key), so distinctness is decided on
    // the served expressions, not the matched view groups
    val matchedPairs: Seq[(GraftMview.GroupCol, Expression)] =
      groupExprs.map(qe => mm.matchedGroup(qe, keyOf).getOrElse(return None))
    if (matchedPairs.map(_._2.canonicalized).distinct.size
        != matchedPairs.size) return None
    val matchedGroups: Seq[GraftMview.GroupCol] = matchedPairs.map(_._1)
    // an aggregate carrying FILTER (WHERE …) needs the re-aggregation
    // form even at the exact group set — the predicate applies per
    // stored row, which a straight projection cannot express; the
    // re-aggregation over the full key set is value-identical. A
    // coarsened key match is never exact (it re-buckets stored rows).
    val hasAggFilter = aggExprs.exists(_.exists {
      case ae: AggregateExpression => ae.filter.isDefined
      case _ => false })
    val exact = matchedGroups.distinct.size == mm.mvGroups.size &&
      matchedPairs.forall(_._2.isInstanceOf[AttributeReference]) &&
      !hasAggFilter
    // ---- filter containment ----------------------------------------
    // inferred join-key IsNotNull conjuncts are implied by an INNER
    // equi-join and droppable; a LEFT or FULL OUTER join implies neither
    // side (rows with NULL keys survive, null-extended), so for outer
    // shapes every IsNotNull is a real predicate and stays residual
    val qConjs = usableConjs(qs.conjs,
      if (qs.leftOuter || qs.full) Set.empty
      else qs.pairs.flatMap(pr => Seq(pr._1.name, pr._2.name)).toSet)
      .getOrElse(return None)
    val mvConjs: Seq[Expression] = p.get("graft.mv.filter") match {
      case None => Nil
      case Some(txt) => analyzedFilter(txt, allOut).getOrElse(return None)
    }
    // every MV-filter conjunct must appear in the query — or be IMPLIED
    // by one (a strictly tighter predicate on the same column: the
    // query's `day >= 15` implies the view's `day >= 10`, so the view is
    // not missing any row the query needs and the tighter bound simply
    // becomes a residual). Otherwise the MV alone lacks needed rows —
    // the MIXED-ROLLUP path then tries serving as [MV slice] ∪ [partial
    // aggregate of the complement rows of the view's own relation].
    val residual = containFilters(qConjs, mvConjs) match {
      case Some(r) => r
      case None =>
        // only the EXACT-shape branches reach here (join-back returned
        // earlier), so the mixed plan's complement partitions the very
        // relation the view aggregates — single table or the same join
        return tryMixedRollup(aggExprs, qs, mm, keyOf, matchedPairs,
          qConjs, mvConjs, mvPath)
    }
    val residualMapped: Seq[Expression] =
      residual.map(c => mm.convFilter(c, keyOf).getOrElse(return None))
    // ---- output mapping --------------------------------------------
    // convert an output expression TREE: aggregate calls and group keys
    // (plain columns or semantically-matched key expressions) become
    // stored MV columns; any other reference to the source makes the
    // expression unservable. Handles post-aggregation arithmetic like
    // `round(sum(x), 2)` — the MV column slots in where the call was.
    def conv(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        if (exact) mm.mapAgg(ae) else mm.mapAggRollup(ae, keyOf)
      case e2 if mm.matchedKey(e2, keyOf).isDefined => mm.matchedKey(e2, keyOf)
      case _: AttributeReference => None // bare source column: unservable
      case other =>
        val kids = other.children.map(conv)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val projected: Seq[NamedExpression] = aggExprs.map { orig =>
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
      if (residualMapped.isEmpty) mm.mvRel
      else Filter(residualMapped.reduce(And(_, _)), mm.mvRel)
    logInfo(s"graft mview rewrite: serving aggregate over " +
      qs.paths.mkString(" JOIN ") +
      (if (exact) " " else " (ROLLED UP) ") +
      (if (residualMapped.nonEmpty) "(residual WHERE) " else "") +
      s"from fresh MV $mvPath")
    if (exact) Some(Project(projected, mvChild))
    else {
      // rollup grouping: the served key expressions — stored attributes
      // for exact key matches, re-bucketing expressions for coarsenings
      val groupingOut: Seq[Expression] = matchedPairs.map(_._2)
      Some(Aggregate(groupingOut, projected, mvChild))
    }
  }

  /** ¬coalesce(m, false) for ONE null-intolerant view conjunct, built
    * PUSHABLE: the flipped bound OR IsNull(col) — both translate to DSv2
    * source filters, so the residual base scan of a mixed-rollup plan
    * file-skips the view-covered range. (The naive `NOT(coalesce(p,
    * false))` is correct but opaque to pushdown — the complement scan
    * would read every file.) None for shapes we can't flip — the caller
    * falls back to the opaque form, correct but unpruned. */
  private def complementConj(m: Expression): Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or}
    m match {
      case GreaterThan(a: AttributeReference, l: Literal) =>
        Some(Or(LessThanOrEqual(a, l), IsNull(a)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        Some(Or(LessThan(a, l), IsNull(a)))
      case LessThan(a: AttributeReference, l: Literal) =>
        Some(Or(GreaterThanOrEqual(a, l), IsNull(a)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        Some(Or(GreaterThan(a, l), IsNull(a)))
      case EqualTo(a: AttributeReference, l: Literal) =>
        Some(Or(Not(EqualTo(a, l)), IsNull(a)))
      case GreaterThan(l: Literal, a: AttributeReference) => // l > a ⇔ a < l
        Some(Or(GreaterThanOrEqual(a, l), IsNull(a)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        Some(Or(GreaterThan(a, l), IsNull(a)))
      case LessThan(l: Literal, a: AttributeReference) =>
        Some(Or(LessThanOrEqual(a, l), IsNull(a)))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        Some(Or(LessThan(a, l), IsNull(a)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        Some(Or(Not(EqualTo(a, l)), IsNull(a)))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(Or(Not(In(a, vs)), IsNull(a)))
      case InSet(a: AttributeReference, hs) =>
        Some(Or(Not(InSet(a, hs)), IsNull(a)))
      case _ => None
    }
  }

  /** Does single disjunct `d` EXCLUDE every row satisfying view conjunct
    * `m`? (I.e., d ∧ m is unsatisfiable.) Decided for the shapes the
    * mixed-rollup complement generates — IsNull on m's column, a negated
    * copy/superset of m, disjoint literal bounds/IN-lists — plus
    * whatever the optimizer folds them into (In↔InSet, dropped IsNull on
    * non-nullable columns). Conservative false when undecidable. */
  private def excludesDisjunct(d: Expression, m: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, IsNull, LessThan, LessThanOrEqual, Literal, Not}
    def vals(e: Expression): Option[(AttributeReference, Set[Any])] = e match {
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some((a, vs.map(_.asInstanceOf[Literal].value).filter(_ != null).toSet))
      case InSet(a: AttributeReference, hs) => Some((a, hs.filter(_ != null)))
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null =>
        Some((a, Set(v)))
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null =>
        Some((a, Set(v)))
      case _ => None
    }
    def bnd(e: Expression): Option[(AttributeReference, String, Any)] = e match {
      case GreaterThan(a: AttributeReference, Literal(v, _)) => Some((a, ">", v))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => Some((a, ">=", v))
      case LessThan(a: AttributeReference, Literal(v, _)) => Some((a, "<", v))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => Some((a, "<=", v))
      case GreaterThan(Literal(v, _), a: AttributeReference) => Some((a, "<", v))
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => Some((a, "<=", v))
      case LessThan(Literal(v, _), a: AttributeReference) => Some((a, ">", v))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => Some((a, ">=", v))
      case _ => None
    }
    def meets(t: org.apache.spark.sql.types.DataType, v: Any, op: String,
        w: Any): Boolean =
      v != null && litCmp(t, v, w).exists(c => op match {
        case ">" => c > 0
        case ">=" => c >= 0
        case "<" => c < 0
        case "<=" => c <= 0
      })
    d match {
      // NULL rows never satisfy a null-intolerant single-column m
      case IsNull(a: AttributeReference)
          if m.references.toSeq.map(_.exprId) == Seq(a.exprId) &&
            (bnd(m).isDefined || vals(m).isDefined) => true
      // a negated copy — or a negated SUPERSET IN-list — of m
      case Not(x) if x.semanticEquals(m) => true
      case Not(x) =>
        (vals(x), vals(m)) match {
          case (Some((a, s)), Some((b, s2))) =>
            a.exprId == b.exprId && a.dataType == b.dataType && s2.subsetOf(s)
          case _ => false
        }
      case _ =>
        (vals(d), bnd(d), vals(m), bnd(m)) match {
          // disjoint value sets on the same column
          case (Some((a, s)), _, Some((b, s2)), _)
              if a.exprId == b.exprId && a.dataType == b.dataType =>
            s.intersect(s2).isEmpty
          // every d-value fails m's bound
          case (Some((a, s)), _, _, Some((b, op, w)))
              if a.exprId == b.exprId && a.dataType == b.dataType =>
            s.forall(v => !meets(a.dataType, v, op, w))
          // every m-value fails d's bound
          case (_, Some((a, op, w)), Some((b, s2)), _)
              if a.exprId == b.exprId && a.dataType == b.dataType =>
            s2.forall(v => !meets(a.dataType, v, op, w))
          // disjoint ranges on the same column
          case (_, Some((a, qo, qv)), _, Some((b, mo, mvv)))
              if a.exprId == b.exprId && a.dataType == b.dataType =>
            litCmp(a.dataType, qv, mvv).exists { c =>
              (qo, mo) match {
                case (">", "<") | (">", "<=") | (">=", "<") => c >= 0
                case (">=", "<=") => c > 0
                case ("<", ">") | ("<", ">=") | ("<=", ">") => c <= 0
                case ("<=", ">=") => c < 0
                case _ => false
              }
            }
          case _ => false
        }
    }
  }

  /** A copy of a query relation carrying a MARKER OPTION: the complement
    * side of a mixed plan must never itself be served from a view.
    * Without this, two views with OVERLAPPING WHEREs ping-pong: view A's
    * complement scan is re-served from view B (with B's complement
    * appended), whose complement re-serves from A, … — each optimizer
    * iteration wraps another Union until max-iterations (and a plan too
    * deep to execute). [[graftRel]] admits only path-only reads, so the
    * extra key permanently opts the scan out of rewrite matching; the
    * scan builder ignores unknown options. */
  private def complementRel(r: DataSourceV2Relation): DataSourceV2Relation = {
    val m = new java.util.HashMap[String, String](r.options)
    m.put("graft.mv.complement", "true")
    r.copy(options = new org.apache.spark.sql.util.CaseInsensitiveStringMap(m))
  }

  /** Rebuild the query's own join from its flattened pieces — left-deep
    * in index order for left chains (each step's ON references earlier
    * rels only, and left joins do not commute), greedy by connectivity
    * for pure-inner shapes; a redundant inner cycle pair survives as an
    * equality filter. Single relation passes through. */
  private def rebuildQueryJoin(qs: QuerySource): Option[LogicalPlan] = {
    if (qs.rels.size == 1) return Some(qs.rels.head)
    if (qs.full) {
      val cond = qs.pairs.map { case (a, b) => EqualTo(a, b): Expression }
        .reduce(And(_, _))
      return Some(Join(qs.rels(0), qs.rels(1),
        org.apache.spark.sql.catalyst.plans.FullOuter, Some(cond),
        JoinHint.NONE))
    }
    var current: LogicalPlan = qs.rels.head
    var inIds = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      qs.rels.head.output)
    var remaining = (1 until qs.rels.size).toList
    var pending = qs.pairs.toList
    while (remaining.nonEmpty) {
      val next =
        if (qs.leftOuter) remaining.head
        else remaining.find(i => pending.exists { case (a, b) =>
          val dIds = qs.rels(i).outputSet
          (inIds.contains(a) && dIds.contains(b)) ||
            (inIds.contains(b) && dIds.contains(a))
        }).getOrElse(return None)
      val dIds = qs.rels(next).outputSet
      val (here, later) = pending.partition { case (a, b) =>
        (inIds.contains(a) && dIds.contains(b)) ||
          (inIds.contains(b) && dIds.contains(a))
      }
      if (here.isEmpty) return None
      val cond = here.map { case (a, b) => EqualTo(a, b): Expression }
        .reduce(And(_, _))
      val jt: org.apache.spark.sql.catalyst.plans.JoinType =
        if (qs.leftSides.contains(next))
          org.apache.spark.sql.catalyst.plans.LeftOuter
        else Inner
      current = Join(current, qs.rels(next), jt, Some(cond), JoinHint.NONE)
      inIds = inIds ++ qs.rels(next).outputSet
      remaining = remaining.filterNot(_ == next)
      pending = later
    }
    if (pending.isEmpty) Some(current)
    else if (qs.leftOuter) None // chain pairs are all consumed in-step
    else Some(Filter(pending.map { case (a, b) => EqualTo(a, b): Expression }
      .reduce(And(_, _)), current))
  }

  private def splitDisjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.Or(a, b) =>
      splitDisjuncts(a) ++ splitDisjuncts(b)
    case other => Seq(other)
  }

  /** MIXED-ROLLUP plan: the query's WHERE is WIDER than the view's — the
    * view alone lacks rows — but the covered slice still serves from
    * stored groups, and only the COMPLEMENT comes from the base:
    *
    *   Aggregate(query groups, rollup algebra,
    *     Union(
    *       Project(needed stored cols, Filter(residual, view)),
    *       Aggregate(view group keys∩needed, partials in the stored
    *         shape, Filter(q ∧ ¬coalesce(view WHERE, false), base))))
    *
    * Exactness: {p_q} = {p_q ∧ p_mv} ⊎ {p_q ∧ ¬coalesce(p_mv, false)}
    * (three-valued: a NULL p_mv row is not in the view and lands in the
    * complement). The view side keeps a query conjunct as a group-column
    * residual or DROPS it when the view's own WHERE implies it (reverse
    * [[litImplies]]); the base side computes partials with the SAME
    * functions the view stores (types must match exactly — schema drift
    * refuses), so the top-level rollup algebra cannot tell the sides
    * apart. Distinct-over-group-key works too: the base side then groups
    * by that key, so the union carries real key values to dedupe.
    *
    * At 100 TB this is the rolling-window payoff: a view pinned to the
    * archived range serves the archive from O(groups) rows while the
    * query's fresh tail scans ONLY the complement files — the pushable
    * complement (see [[complementConj]]) keeps the covered range
    * entirely unread on the base side. */
  private def tryMixedRollup(aggExprs: Seq[NamedExpression], qs: QuerySource,
      mm: MvMapping, keyOf: Map[GraftMview.GroupCol, Expression],
      matchedPairs: Seq[(GraftMview.GroupCol, Expression)],
      qConjs: Seq[Expression],
      mvConjs: Seq[Expression], mvPath: String): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.Union
    if (mvConjs.isEmpty) return None // no WHERE to complement
    val baseOut: Seq[Attribute] = qs.rels.flatMap(_.output)
    // IDEMPOTENCE + DEGENERACY: this rule runs in a fixed-point batch,
    // and the plan it emits contains a base-side Aggregate over the
    // source with exactly this wider-than-view shape — its WHERE carries
    // the view's complement. Detect that SEMANTICALLY (the complement
    // mutates under later rules: In→InSet, IsNull folded on non-nullable
    // columns): a query conjunct all of whose disjuncts provably exclude
    // some view conjunct makes the view slice EMPTY — refusing is both
    // the loop-breaker and the right answer (such a query wants only
    // non-covered rows).
    if (qConjs.exists { q =>
      splitDisjuncts(q).forall(dd => mvConjs.exists(m => excludesDisjunct(dd, m)))
    }) return None
    // view side: each query conjunct is either implied by the view's
    // WHERE (every stored row already satisfies it — drop) or maps onto
    // group columns (residual on stored rows)
    val mvResidual: Seq[Expression] = qConjs.flatMap { q =>
      if (mvConjs.exists(m => m.semanticEquals(q) || litImplies(m, q))) None
      else Some(mm.convFilter(q, keyOf).getOrElse(return None))
    }
    // output mapping: rollup algebra ONLY — a straight projection cannot
    // mix with base-side partials
    def conv(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mm.mapAggRollup(ae, keyOf)
      case e2 if mm.matchedKey(e2, keyOf).isDefined => mm.matchedKey(e2, keyOf)
      case _: AttributeReference => None
      case other =>
        val kids = other.children.map(conv)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val projected: Seq[NamedExpression] = aggExprs.map { orig =>
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
    // served key expressions: stored attributes, or calendar coarsenings
    // OVER stored attributes — the complement side below still groups at
    // VIEW grain (the stored key columns), and this top-level Aggregate
    // re-buckets both sides identically
    val groupingOut: Seq[Expression] = matchedPairs.map(_._2)
    // the union carries exactly the stored columns the rollup reads
    val refs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      projected.flatMap(_.references) ++ groupingOut)
    val needed: Seq[AttributeReference] = mm.mvRel.output.collect {
      case a: AttributeReference if refs.contains(a) => a
    }
    // the complement partitions the view's OWN relation: the single
    // table, or the query's join rebuilt with its own per-step types
    // (the exact-shape gate upstream guarantees they coincide). The
    // filter sits ABOVE the join, exactly where the view's WHERE sits.
    // Relations carry the complement marker (see [[complementRel]]).
    val baseRel = rebuildQueryJoin(
      qs.copy(rels = qs.rels.map(complementRel))).getOrElse(return None)
    val baseSide = complementPartialAgg(mm, needed, baseOut, baseRel,
      qConjs, mvConjs).getOrElse(return None)
    val mvChild: LogicalPlan =
      if (mvResidual.isEmpty) mm.mvRel
      else Filter(mvResidual.reduce(And(_, _)), mm.mvRel)
    val union = Union(Project(needed, mvChild), baseSide)
    logInfo(s"graft mview rewrite: serving aggregate over ${qs.paths.head} " +
      s"as MIXED plan — fresh MV $mvPath slice ∪ complement base scan")
    Some(Aggregate(groupingOut, projected, union))
  }

  /** The COMPLEMENT side of a mixed plan: partial aggregates in the
    * stored-column shape over `Filter(conjs ∧ ¬coalesce(view WHERE,
    * false), baseRel)`, grouped by every view group key present in
    * `needed` — the same functions the view itself stores, so the
    * re-aggregation above the Union cannot tell stored rows from
    * complement partials. Distinct-over-key works because the base side
    * groups by (and carries) the real key values. None when a needed
    * column cannot be rebuilt from base rows or its type drifted. */
  private def complementPartialAgg(mm: MvMapping,
      needed: Seq[AttributeReference], baseOut: Seq[Attribute],
      baseRel: LogicalPlan, conjs: Seq[Expression],
      mvConjs: Seq[Expression]): Option[LogicalPlan] = {
    import GraftMview._
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, Literal, Multiply, Not, Or}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Count => ACount, Max => AMax, Min => AMin, Sum => ASum}
    import org.apache.spark.sql.types.DoubleType
    def src(name: String): Option[AttributeReference] = baseOut.collectFirst {
      case a: AttributeReference if a.name == name => a }
    def partial(n: String): Option[Expression] = mm.cols.flatMap {
      case CountCol(o) if o == n =>
        Some(ACount(Literal(1)).toAggregateExpression())
      case CountNNCol(s, o) if o == n =>
        src(s).map(a => ACount(a).toAggregateExpression())
      case SumCol(s, o) if o == n =>
        src(s).map(a => ASum(a).toAggregateExpression())
      case SumCol(s, o) if s"__nn_$o" == n =>
        src(s).map(a => ACount(a).toAggregateExpression())
      case AvgCol(s, o) if s"__s_$o" == n =>
        src(s).map(a => ASum(a).toAggregateExpression())
      case AvgCol(s, o) if s"__n_$o" == n =>
        src(s).map(a => ACount(a).toAggregateExpression())
      case VarCol(s, o, _) if s"__s_$o" == n =>
        src(s).map(a => ASum(Cast(a, DoubleType)).toAggregateExpression())
      case VarCol(s, o, _) if s"__q_$o" == n =>
        src(s).map(a => ASum(Multiply(
          Cast(a, DoubleType), Cast(a, DoubleType))).toAggregateExpression())
      case VarCol(s, o, _) if s"__n_$o" == n =>
        src(s).map(a => ACount(a).toAggregateExpression())
      case MinCol(s, o) if o == n =>
        src(s).map(a => AMin(a).toAggregateExpression())
      case MaxCol(s, o) if o == n =>
        src(s).map(a => AMax(a).toAggregateExpression())
      case _ => None
    }.headOption
    val keyForOut: Map[String, Expression] = mm.mvGroups.flatMap { g =>
      (if (!g.isExpr) src(g.src): Option[Expression]
       else analyzedExpr(g.src, baseOut)).map(g.out -> _)
    }.toMap
    val baseCols: Seq[(NamedExpression, Boolean)] = needed.map { a =>
      keyForOut.get(a.name) match {
        case Some(k) =>
          if (k.dataType != a.dataType) return None
          (Alias(k, a.name)(), true)
        case None =>
          val e = partial(a.name).getOrElse(return None)
          if (e.dataType != a.dataType) return None // schema drift: refuse
          (Alias(e, a.name)(), false)
      }
    }
    val baseKeys = baseCols.collect { case (Alias(k, _), true) => k }
    val complement: Expression = {
      val per = mvConjs.map(complementConj)
      if (per.forall(_.isDefined)) per.flatten.reduce(Or(_, _))
      else Not(Coalesce(Seq(mvConjs.reduce(And(_, _)), Literal(false))))
    }
    val baseCond = (conjs :+ complement).reduce(And(_, _))
    Some(Aggregate(baseKeys, baseCols.map(_._1), Filter(baseCond, baseRel)))
  }

  /** EAGER-AGGREGATION JOIN-BACK (Yan & Larson, "Eager Aggregation and
    * Lazy Aggregation", VLDB 1995 — here through a materialized view): an
    * MV covering a SUBSET of the query's joined relations — a
    * single-table fact MV, or a two-table join MV inside a wider join —
    * serves the aggregate as `MV ⋈ <uncovered dims>`, re-aggregated,
    * provided every covered-side join key OUT of the covered set is an
    * MV GROUP column.
    *
    * Soundness: the MV partitions the covered relation (or covered join)
    * exactly by its group set, which includes every outbound join key —
    * so the equi-joins to the uncovered dims replicate whole stored
    * groups per matching dim-combination row, exactly as they replicate
    * the underlying covered rows. Re-aggregating replicated partials is
    * the SAME algebra as the rollup rewrite (counts and sums re-sum,
    * min/max nest, avg and the variance family recombine from their
    * moments, DISTINCT-over-group-key dedupes), so
    * [[MvMapping.mapAggRollup]] is reused unchanged. NULL join keys agree
    * by construction: the MV stores the NULL-key group, and the rewritten
    * inner equi-joins drop it — just as the original joins drop the
    * NULL-key covered rows. For a join MV inside a wider join, the
    * query's key pairs BETWEEN the covered tables must equal the MV's
    * own key set (and both its watermarks must be fresh).
    *
    * Gates beyond the single-table path: covered-side conjuncts follow
    * the usual containment/residual rules against the MV's WHERE;
    * dim-only conjuncts stay on their dim scan; dim-dim conjuncts (and
    * any redundant cycle key pair) land in a filter above the rebuilt
    * join (they commute with inner joins); a conjunct or aggregate
    * mixing covered and uncovered sides refuses. Aggregates must
    * reference ONLY covered columns (checked by exprId, not name — a dim
    * column that happens to share a tracked column's name must not
    * silently serve). Only the MV's own source(s) need the freshness
    * gate: the dims are read through the query's own relation nodes,
    * untouched.
    *
    * LEFT-shape queries (fact ⟕ dim chains, INNER steps mixed in —
    * `XGBoost/Predictor.py:47,74` is this shape) serve from the same
    * INNER-grain MV: the rebuild replays the chain in its original
    * (index) order with each step's own join type, so a stored group
    * either replicates per matching dim row or passes through ONCE
    * null-extended — exactly how the underlying covered rows behave,
    * because the outbound key is a group column (uniform per group).
    * Gates: the covered side must never sit on a null-PRODUCING side;
    * conjuncts on a LEFT-joined dim stay ABOVE the rebuilt join (they do
    * not commute below it); IsNotNull conjuncts are kept (under a left
    * join they are real predicates). A LEFT OUTER *view* never
    * join-backs at all.
    *
    * At 100 TB this is the star-schema payoff: ONE fact-side MV serves
    * the whole family of dimension-joined aggregates — segment, region,
    * calendar rollups, snowflaked dim chains, and their left-outer
    * variants — each as a join of O(groups) stored rows to the dims,
    * never a fact scan. */
  private def tryJoinBack(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      qs: QuerySource, heads: Seq[String], mvPath: String,
      mvManifest: GraftManifest): Option[LogicalPlan] = {
    import GraftMview._
    // join-back grouping stays on plain attributes (an expression over a
    // covered column cannot ride the stored key through the dim joins)
    val groupAttrs: Seq[AttributeReference] = groupExprs.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val p = mvManifest.props
    val cols = decodeCols(p.getOrElse("graft.mv.cols", return None))
    val mvSrc = p.getOrElse("graft.mv.source", return None)
    // which query relations the MV covers, in MV source order
    val covered: Seq[Int] = p.get("graft.mv.source2") match {
      case None =>
        val i = qs.paths.indexOf(mvSrc)
        if (i < 0) return None else Seq(i)
      case Some(s2) =>
        val i1 = qs.paths.indexOf(mvSrc)
        val i2 = qs.paths.indexOf(s2)
        if (i1 < 0 || i2 < 0) return None else Seq(i1, i2)
    }
    if (covered.size == qs.rels.size) return None // nothing to join back
    // a LEFT or FULL OUTER view never join-backs (the caller gates this
    // too — belt and braces): its stored groups carry null-extended rows
    // whose join types/orientation the superset query need not share.
    // Full-outer QUERIES never join-back either: both sides null-produce.
    if (qs.full) return None
    GraftMview.decodeSource(p) match {
      case GraftMview.JoinSrc(_, _, ls) if ls.nonEmpty => return None
      case _: GraftMview.FullSrc => return None
      case _ => ()
    }
    // LEFT-shape queries (fact ⟕ dim chains, possibly mixed with INNER
    // steps): servable from an INNER-grain MV PROVIDED the covered side
    // is never on a null-PRODUCING side — a covered rel entering the
    // chain via LEFT OUTER (or the covered pair's internal step being
    // LEFT) would null-extend rows the stored groups lack. The covered
    // side being the chain's preserved prefix is exactly the Yan-Larson
    // algebra with left-extension: each stored group either replicates
    // per matching dim row or passes through ONCE null-extended —
    // identical to how the underlying covered rows behave, because the
    // outbound join key is a group column (uniform per group).
    if (covered.exists(qs.leftSides.contains)) return None
    // freshness of every covered source
    if (p.get("graft.mv.wmname") != Some(heads(covered.head))) return None
    if (covered.size > 1 &&
        p.get("graft.mv.wmname2") != Some(heads(covered(1)))) return None
    val coveredSet = covered.toSet
    val coveredIds = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      covered.flatMap(i => qs.rels(i).output))
    val mm = new MvMapping(cols, DataSourceV2Relation.create(
      new GraftStoreTable(mvPath, mvManifest.schema), None, None))
    // ---- key-pair classification -------------------------------------
    // internal (both ends covered): must equal the join MV's own key set;
    // outbound (one end covered): the covered end must be an MV GROUP
    // column — the replication-soundness condition; external (dim-dim):
    // pass through to the rebuilt join.
    // every pair end is owned by some relation (eqAttrPairs checked)
    val classified: Seq[((AttributeReference, AttributeReference),
        Boolean, Boolean, Int)] = qs.pairs.map { pr =>
      val sa = qs.sideOf(pr._1).getOrElse(return None)
      val sb = qs.sideOf(pr._2).getOrElse(return None)
      (pr, coveredSet.contains(sa), coveredSet.contains(sb), sa)
    }
    val internal = classified.collect { case (pr, true, true, sa) => (pr, sa) }
    if (covered.size == 1 && internal.nonEmpty) return None
    if (covered.size > 1) {
      val mvKeys = p("graft.mv.keys").split(";", -1).toSeq.map { kv =>
        val Array(a, b) = kv.split(":", 2)
        GraftStoreFormat.unescStat(a) -> GraftStoreFormat.unescStat(b)
      }.toSet
      // normalize each internal pair to (source, source2) column names
      val qKeys = internal.map { case ((a, b), sa) =>
        if (sa == covered.head) a.name -> b.name else b.name -> a.name
      }.toSet
      if (qKeys != mvKeys) return None
    }
    // outbound pairs normalized to (coveredAttr, dimAttr); each covered
    // end must map to a stored group column
    val outbound: Seq[(AttributeReference, AttributeReference)] =
      classified.collect {
        case (pr, true, false, _) => pr
        case ((a, b), false, true, _) => (b, a)
      }
    outbound.foreach { case (cv, _) =>
      if (mm.groupAttrFor(cv.name).isEmpty) return None
    }
    val external = classified.collect { case (pr, false, false, _) => pr }
    // ---- conjunct split: covered side vs dims -------------------------
    // inferred join-key IsNotNull conjuncts are inner-implied and
    // droppable for pure-inner queries; under a LEFT step an IsNotNull
    // is a REAL predicate (it can convert the left join to inner), so
    // left shapes keep every conjunct — same rule as the exact path
    val qConjs = usableConjs(qs.conjs,
      if (qs.leftOuter) Set.empty
      else qs.pairs.flatMap(pr => Seq(pr._1.name, pr._2.name)).toSet)
      .getOrElse(return None)
    val (rConjs, rest) = qConjs.partition(_.references.subsetOf(coveredIds))
    val (mixed, dimConjs) =
      rest.partition(_.references.exists(coveredIds.contains))
    if (mixed.nonEmpty) return None // a cross-side predicate: unservable
    val factOut: Seq[Attribute] = covered.flatMap(i => qs.rels(i).output)
    val mvConjs: Seq[Expression] = p.get("graft.mv.filter") match {
      case None => Nil
      case Some(txt) => analyzedFilter(txt, factOut).getOrElse(return None)
    }
    val (residual, needsComplement) = containFilters(rConjs, mvConjs) match {
      case Some(r) => (r, false)
      case None =>
        // MIXED JOIN-BACK: the covered-side WHERE is WIDER than the
        // view's — serve [MV slice ∪ complement covered-side partials]
        // ⋈ dims, the rolling-window pattern on a star join. Same
        // partition + idempotence discipline as [[tryMixedRollup]]:
        // implied conjuncts drop from the view slice, the complement
        // scan takes q ∧ ¬coalesce(p_mv, false), and a query already
        // carrying the complement refuses (degenerate AND the
        // fixed-point loop-breaker).
        if (mvConjs.isEmpty) return None
        if (rConjs.exists(q2 => splitDisjuncts(q2).forall(dd =>
          mvConjs.exists(m => excludesDisjunct(dd, m))))) return None
        (rConjs.filterNot(q2 => mvConjs.exists(m =>
          m.semanticEquals(q2) || litImplies(m, q2))), true)
    }
    // residuals may also name an expression key (a calendar bucket the
    // covered-side MV grouped by): resolve keys against the covered outputs
    val keyOf: Map[GraftMview.GroupCol, Expression] = mm.mvGroups.flatMap(g =>
      mm.keyExprFor(g, factOut).map(g -> _)).toMap
    val residualMapped: Seq[Expression] =
      residual.map(c => mm.convFilter(c, keyOf).getOrElse(return None))
    // ---- grouping: covered keys map to stored columns, dim-side pass --
    val groupingOut: Seq[Expression] = groupAttrs.map { a =>
      if (coveredIds.contains(a)) mm.groupAttrFor(a.name).getOrElse(return None)
      else if (qs.rels.exists(_.outputSet.contains(a))) a
      else return None
    }
    // ---- output mapping: the rollup algebra over MV ⋈ dims ------------
    def conv(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        // covered-only aggregates (count(*) included: no references) — a
        // dim or mixed aggregate cannot come from the stored partials
        if (ae.references.subsetOf(coveredIds)) mm.mapAggRollup(ae, keyOf)
        else None
      case a: AttributeReference if coveredIds.contains(a) =>
        if (groupAttrs.exists(_.exprId == a.exprId)) mm.groupAttrFor(a.name)
        else None
      case a: AttributeReference =>
        if (groupAttrs.exists(_.exprId == a.exprId)) Some(a) else None
      case other =>
        val kids = other.children.map(conv)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val projected: Seq[NamedExpression] = aggExprs.map { orig =>
      val replacement = orig match {
        case a: AttributeReference => conv(a)
        case Alias(child, _) => conv(child)
        case _ => None
      }
      replacement match {
        case Some(r) if r.fastEquals(orig) => orig // untouched dim column
        case Some(r) if r.dataType == orig.dataType =>
          val guarded = if (!orig.nullable && r.nullable) KnownNotNull(r) else r
          Alias(guarded, orig.name)(exprId = orig.exprId)
        case _ => return None
      }
    }
    // ---- rebuild the join: MV, then each dim greedily by connectivity --
    // a covered attribute in a join condition reads from its stored column
    def mapAttr(a: AttributeReference): AttributeReference =
      if (coveredIds.contains(a)) mm.groupAttrFor(a.name).get else a
    val mvChild0: LogicalPlan =
      if (residualMapped.isEmpty) mm.mvRel
      else Filter(residualMapped.reduce(And(_, _)), mm.mvRel)
    val mvChild: LogicalPlan =
      if (!needsComplement) mvChild0
      else {
        // the union carries the stored columns the rebuilt plan reads:
        // outputs, grouping keys, and the mapped join-condition attrs
        val refs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
          projected.flatMap(_.references) ++
            groupingOut.flatMap(_.references) ++
            (outbound ++ external).flatMap { case (x, y) =>
              Seq(mapAttr(x), mapAttr(y)) })
        val needed = mm.mvRel.output.collect {
          case a: AttributeReference if refs.contains(a) => a }
        // the covered relation, rebuilt from the query's own rel nodes
        // (marked: a complement scan never re-serves — see complementRel)
        val coveredRel: LogicalPlan =
          if (covered.size == 1) complementRel(qs.rels(covered.head))
          else Join(complementRel(qs.rels(covered.head)),
            complementRel(qs.rels(covered(1))), Inner,
            Some(internal.map { case ((a2, b2), _) =>
              EqualTo(a2, b2): Expression }.reduce(And(_, _))), JoinHint.NONE)
        val part = complementPartialAgg(mm, needed, factOut, coveredRel,
          rConjs, mvConjs).getOrElse(return None)
        org.apache.spark.sql.catalyst.plans.logical.Union(
          Project(needed, mvChild0), part)
      }
    val dimIdxs = qs.rels.indices.filterNot(coveredSet.contains)
    // a conjunct on a LEFT-joined dim does NOT commute below the join
    // (filtering the dim leaf changes which rows null-extend): hold it
    // ABOVE the rebuilt join — exactly where the original query's WHERE
    // sat. Inner-dim conjuncts push into their dim leaf as always.
    val leftDimIds = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      qs.leftSides.toSeq.flatMap(i => qs.rels(i).output))
    val (pushDim, heldDim) = dimConjs.partition(
      c => !c.references.exists(leftDimIds.contains))
    val dimLeaf: Map[Int, LogicalPlan] = dimIdxs.map { i =>
      val rel = qs.rels(i)
      val cs = pushDim.filter(_.references.subsetOf(rel.outputSet))
      i -> (if (cs.isEmpty) rel else Filter(cs.reduce(And(_, _)), rel))
    }.toMap
    // dim-dim conjuncts spanning relations go above the rebuilt join,
    // as do the held left-dim conjuncts
    val crossDim = pushDim.filterNot(c =>
      dimIdxs.exists(i => c.references.subsetOf(qs.rels(i).outputSet))) ++
      heldDim
    val joinable = outbound ++ external // internal pairs are baked into the MV
    var current: LogicalPlan = mvChild
    var inIds = coveredIds
    var remaining = dimIdxs.toList
    var pending = joinable.toList
    while (remaining.nonEmpty) {
      // left-shape queries rebuild in CHAIN (index) order: left joins do
      // not commute freely, and the original is a left-deep chain whose
      // step i references only earlier rels — so index order always has
      // every ON operand in scope and preserves the original
      // associativity. Pure-inner queries keep the greedy connectivity
      // order (inner joins commute).
      val next =
        if (qs.leftOuter) remaining.head
        else remaining.find(i => pending.exists { case (a, b) =>
          val dIds = qs.rels(i).outputSet
          (inIds.contains(a) && dIds.contains(b)) ||
            (inIds.contains(b) && dIds.contains(a))
        }).getOrElse(return None) // disconnected join graph: unservable
      val dIds = qs.rels(next).outputSet
      val (here, later) = pending.partition { case (a, b) =>
        (inIds.contains(a) && dIds.contains(b)) ||
          (inIds.contains(b) && dIds.contains(a))
      }
      if (here.isEmpty) return None // disconnected join graph: unservable
      val cond = here.map { case (a, b) =>
        EqualTo(mapAttr(a), mapAttr(b)): Expression
      }.reduce(And(_, _))
      val jt: org.apache.spark.sql.catalyst.plans.JoinType =
        if (qs.leftSides.contains(next))
          org.apache.spark.sql.catalyst.plans.LeftOuter
        else Inner
      current = Join(current, dimLeaf(next), jt, Some(cond), JoinHint.NONE)
      inIds = inIds ++ qs.rels(next).outputSet
      remaining = remaining.filterNot(_ == next)
      pending = later
    }
    // a cycle's redundant key pair (both ends joined through other dims)
    // survives as an equality filter — same semantics under an inner
    // join. Above a LEFT step that filter would drop null-extended rows;
    // chain pairs are all consumed at their own step, so a leftover here
    // means a shape we did not model: refuse.
    if (qs.leftOuter && pending.nonEmpty) return None
    val topConjs = crossDim ++ pending.map { case (a, b) =>
      EqualTo(mapAttr(a), mapAttr(b)): Expression
    }
    val joined: LogicalPlan =
      if (topConjs.isEmpty) current
      else Filter(topConjs.reduce(And(_, _)), current)
    logInfo(s"graft mview rewrite: serving the " +
      s"${qs.paths.mkString(" JOIN ")} aggregate from fresh MV $mvPath " +
      s"JOIN-BACK to ${dimIdxs.size} dim(s)" +
      (if (residualMapped.nonEmpty) " (residual WHERE)" else ""))
    Some(Aggregate(groupingOut, projected, joined))
  }
}
