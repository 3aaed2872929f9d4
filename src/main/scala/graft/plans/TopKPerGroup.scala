package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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
  * partition, to keep k of them. This operator prunes FIRST:
  *
  *   partial (map-side): each input partition reduces to ≤ k rows per group
  *     it has seen, via bounded k-element heaps — like partial aggregation,
  *     the shuffle then moves at most k·groups·partitions rows, not n.
  *     Heap state is HARD-BOUNDED: when the held-row count reaches
  *     `spark.graft.topk.flushRows` (default 1 Mi rows), the current
  *     survivors are FLUSHED to the output and the heaps reset — emitting
  *     extra partial rows is always correct (the final phase re-prunes), so
  *     a partition with pathological group cardinality degrades to slightly
  *     more shuffle volume instead of OOM;
  *   final: after a hash shuffle on the group key, the operator REQUIRES a
  *     (group, order) child ordering — Spark satisfies it with its
  *     spill-capable Tungsten external sort over the already-pruned
  *     survivors — and then streams the first k rows of each group run with
  *     O(1) state. No unbounded structure exists in either phase.
  *
  * The only sort in the plan runs over partial-pruned data
  * (k·groups·map-partitions rows, typically orders of magnitude below n),
  * and it spills; the input itself is never sorted. At 100 TB the shuffle
  * reduction is the difference between moving terabytes and moving
  * megabytes.
  *
  * Output contract: the top-k SET per group (pair with a total tie-breaking
  * `orderBy` list for deterministic results, as any top-k needs anyway);
  * rows arrive grouped and ordered as a bonus of the final phase.
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

  private def groupedOrdering: Seq[SortOrder] =
    groupExprs.map(SortOrder(_, Ascending)) ++ orderExprs

  /** Final phase: ask for (group, order)-sorted input — EnsureRequirements
    * plants Spark's spillable SortExec over the pruned shuffle output, and
    * this operator becomes a streaming group-run limit. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(groupedOrdering)

  /** The final phase preserves the sorted group runs it consumes. */
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupedOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsB = groupExprs.map(BindReferences.bindReference(_, childOutput))
    val orderExprsB = orderExprs.map(so =>
      so.copy(child = BindReferences.bindReference(so.child, childOutput)))
    val kLocal = k
    val isPartial = partial
    val flushRows = conf.getConfString("spark.graft.topk.flushRows", "1048576").toLong
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupExprsB, childOutput)
      if (isPartial) partialIterator(rows, groupProj, orderExprsB, kLocal, flushRows)
      else finalIterator(rows, groupProj, kLocal)
    }, preservesPartitioning = true)
  }

  /** Map-side pruning with a hard memory bound: bounded per-group heaps
    * (worst kept row on top, admission/eviction O(log k)); at `flushRows`
    * held rows, drain everything to the output and reset. */
  private def partialIterator(
      rows: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      orderExprsB: Seq[SortOrder],
      kLocal: Int,
      flushRows: Long): Iterator[InternalRow] = new Iterator[InternalRow] {
    private val ordering: Ordering[InternalRow] =
      new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(orderExprsB)
    private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    private var held = 0L
    private var drain: Iterator[InternalRow] = Iterator.empty

    private def snapshotAndClear(): Iterator[InternalRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow](held.toInt)
      heaps.values().forEach(h => h.forEach(r => out += r))
      heaps.clear(); held = 0L
      out.iterator
    }
    private def refill(): Unit = {
      while (!drain.hasNext && rows.hasNext) {
        val row = rows.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(row.copy()); held += 1
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
        if (held >= flushRows) drain = snapshotAndClear()
      }
      if (!drain.hasNext && !rows.hasNext && !heaps.isEmpty) drain = snapshotAndClear()
    }
    override def hasNext: Boolean = { if (!drain.hasNext) refill(); drain.hasNext }
    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException("empty iterator")
      drain.next()
    }
  }

  /** Reduce-side streaming limit over (group, order)-sorted input: count a
    * run per group key, emit its first k rows. O(1) state. */
  private def finalIterator(
      rows: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      kLocal: Int): Iterator[InternalRow] = new Iterator[InternalRow] {
    private var prevKey: UnsafeRow = _
    private var emitted = 0
    private var pending: InternalRow = _

    private def findNext(): InternalRow = {
      while (rows.hasNext) {
        val row = rows.next()
        val key = groupProj(row)
        if (prevKey == null || key != prevKey) { prevKey = key.copy(); emitted = 0 }
        if (emitted < kLocal) { emitted += 1; return row }
      }
      null
    }
    override def hasNext: Boolean = {
      if (pending == null) pending = findNext()
      pending != null
    }
    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException("empty iterator")
      val r = pending; pending = null; r
    }
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
    * MEMORY CONTRACT: the partial phase holds at most
    * `spark.graft.topk.flushRows` rows (default 1 Mi) before flushing
    * survivors downstream; the final phase streams over a spill-capable
    * sort of the pruned shuffle data with O(1) state. Neither phase can
    * OOM on group cardinality. The `spark.graft.topk.maxK` rewrite gate
    * (default 1000) remains as the plan-choice heuristic: for very large k
    * the window form's single sort tends to beat two-phase heap churn. */
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
