package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim

/** Custom whole-operator: top-k rows per group — the (c) tier of the
  * extension ladder (LogicalPlan + Strategy + SparkPlan).
  *
  * Why not compose it? The built-in form —
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — SORTS every
  * group completely: a full shuffle of all rows, then an O(n log n) sort per
  * partition, to keep k of them. This operator keeps a bounded k-element
  * heap per group in BOTH phases:
  *
  *   partial (map-side): each input partition reduces to ≤ k rows per group
  *     it has seen — like partial aggregation, the shuffle then moves at
  *     most k·groups·partitions rows, not n;
  *   final: after a hash shuffle on the group key, merge the survivors with
  *     the same bounded heaps.
  *
  * Memory is O(groups-per-partition × k), never O(rows); no sort ever runs.
  * At 100 TB the shuffle reduction is the difference between moving
  * terabytes and moving megabytes.
  *
  * Output contract: the top-k SET per group (row order within a group is
  * not defined — pair with a total tie-breaking `orderBy` list for
  * deterministic results, as any top-k needs anyway).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val partialExec = TopKPerGroupExec(g, o, k, planLater(child), partial = true)
      TopKPerGroupExec(g, o, k, partialExec, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsB = groupExprs.map(BindReferences.bindReference(_, childOutput))
    val orderExprsB = orderExprs.map(so =>
      so.copy(child = BindReferences.bindReference(so.child, childOutput)))
    val kLocal = k
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupExprsB, childOutput)
      // full SortOrder-aware comparator (null ordering + direction)
      val ordering: Ordering[InternalRow] =
        new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(orderExprsB)
      // per group: bounded heap with the WORST kept row on top (reverse
      // ordering), so admission tests and evictions are O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (rows.hasNext) {
        val row = rows.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** API entry point. */
object TopK {

  /** Enable the automatic window→TopK rewrite on a session built without
    * [[graft.GraftExtensions]] (which injects both pieces via conf). */
  def enableAutoRewrite(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
    }
  }
  /** Top-k rows per group ordered by `orderBy` columns (name, ascending) —
    * ascending=false for largest-first. Columns resolve by name against the
    * input's analyzed output (already-resolved attributes; the analyzer
    * needn't look inside the custom node). Registers the planner strategy
    * on the session idempotently.
    *
    * MEMORY CONTRACT: execution holds O(groups-per-partition × k) boxed rows
    * on the JVM heap and never spills (unlike Spark's sort-based window
    * path). Intended for small k (top-10s/100s/1000s). For very large k or
    * pathological group cardinality per partition, prefer the window idiom —
    * the automatic rewrite ([[graft.plans.RewriteWindowTopK]]) enforces this
    * with its `spark.graft.topk.maxK` bound (default 1000); this direct API
    * trusts the caller. */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    graftshim.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr(_)), sortOrders, k, analyzed))
  }
}
