package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the standard top-k-per-group idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).filter($"rn" <= k).drop("rn") }}}
  *
  * into [[TopKPerGroupNode]] — users keep writing the universal window
  * pattern and transparently get the bounded-heap two-phase operator
  * (no per-group sort, k·groups shuffle volume).
  *
  * The match is deliberately narrow (rewrites must never be wrong):
  *  - the Window computes exactly ONE expression, a bare `row_number()`;
  *  - the filter is a simple `rn <= k` / `rn < k` / flipped literal form;
  *  - the projection above DROPS rn (nothing downstream reads the rank —
  *    if the user keeps rn, e.g. q13's running-rank output, no rewrite);
  *  - the partition spec is non-empty (global top-k already plans well as
  *    TakeOrderedAndProject).
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** Extract k from `rn ◇ literal` shapes; k = max rank KEPT. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** Plan-choice gate: [[TopKPerGroupExec]] is memory-safe at any k (its
    * partial phase flushes at `spark.graft.topk.flushRows` held rows, its
    * final phase streams over a spill-capable sort of the pruned data), but
    * at large k per-row heap admission churn loses to the window path's
    * single sort and the shuffle-volume win evaporates (k·groups approaches
    * n). The rewrite fires only for k up to this bound (default 1000). */
  val MaxKKey = "spark.graft.topk.maxK"
  private def maxK: Int =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(MaxKKey, "1000").toInt

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      val refsRn = projectList.exists(_.references.contains(rn))
      rankBound(cond, rn) match {
        case Some(k) if k > 0 && k <= maxK && !refsRn =>
          // by the time user rules run, Spark's InferWindowGroupLimit has
          // usually inserted a WindowGroupLimit (sort-based group pruning)
          // below the Window — absorb it, our operator subsumes the limit
          val realChild = child match {
            case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
            case other => other
          }
          Project(projectList, TopKPerGroupNode(partitionSpec, orderSpec, k, realChild))
        case _ => p
      }
  }
}
