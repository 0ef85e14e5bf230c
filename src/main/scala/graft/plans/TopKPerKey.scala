package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Per-key top-k as a whole custom operator — the last rung of the
  * custom-operator ladder (logical node + planner `SparkStrategy` +
  * physical `SparkPlan`, injected via `SparkSessionExtensions`), for the
  * semantics Spark plans worst at scale: "the k best rows of every
  * group".
  *
  * The built-in spellings both do more work than the answer needs:
  * a rank window sorts EVERY row of every group (full shuffle + per-key
  * sort of the whole input), and `TakeOrderedAndProject` only handles the
  * global (keyless) case. This operator generalizes
  * `TakeOrderedAndProject`'s bounded-heap trick to keyed data:
  *
  *  - **partial phase** (pre-shuffle, map-side): each task folds its rows
  *    into one bounded k-heap per key it sees — at most `keys_in_task × k`
  *    candidate rows leave the scan, the rest are cut before the exchange
  *    (the same partial/final shape as a two-phase aggregate);
  *  - **exchange**: Spark inserts a hash repartition on the keys because
  *    the final node declares `ClusteredDistribution(keys)` — AQE still
  *    owns partition counts / skew handling;
  *  - **final phase**: merge the per-task candidates with the same
  *    heaps; emit each key's k rows in sort order.
  *
  * Never a full sort anywhere — the plan contains no SortExec; per-task
  * state is bounded by (distinct keys in task × k) rows, the same memory
  * class as the hash aggregate the window form would need anyway.
  * `order` must be a TOTAL order (add a unique tiebreak column) or the
  * kept set at the boundary is nondeterministic — same contract as
  * `row_number`.
  *
  * The typed-aggregate twin ([[graft.functions.TopKAgg]]) covers the
  * "top ids only" projection; this operator returns the WHOLE row, which
  * an aggregate buffer cannot without packing the row into the buffer.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** `df`'s top `k` rows per `keyCols` group under `orderBy` (use `.desc`
    * / `.asc` Columns; include a unique tiebreak for determinism). */
  def apply(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    val sorts = orderBy.map(c => Bridge.eagerExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keyCols.map(c => Bridge.eagerExpression(df(c))), sorts, k,
        df.queryExecution.analyzed))
  }
}

/** Filter pushdown THROUGH [[TopKPerKey]]: a deterministic predicate that
  * references only bare key attributes is constant within every group, so
  * it commutes with per-key top-k — filtering groups after the heaps ≡
  * filtering their rows before. Relocating it below the node lets the
  * fixed-point operator-optimization batch keep pushing it all the way
  * into the scan (`PushedFilters` on parquet), so pruned groups never
  * reach the heaps at all. Predicates over non-key columns must NOT move:
  * they would change which rows compete for the k slots. */
object TopKFilterPushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{AttributeSet, SubqueryExpression}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, t: TopKPerKey)
        if cond.deterministic && !SubqueryExpression.hasSubquery(cond) &&
          f.references.subsetOf(AttributeSet(
            t.keys.collect { case a: Attribute => a })) =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Plans [[TopKPerKey]] as final-over-partial [[TopKPerKeyExec]]; the
  * exchange between them comes from EnsureRequirements, not from here. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, finalPhase = true,
        TopKPerKeyExec(keys, order, k, finalPhase = false,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k physical operator (see [[TopKPerKey]]). */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, finalPhase: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (!finalPhase) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrder, limit, attrs) = (keys, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      val ord = RowOrdering.create(sortOrder, attrs)
      // max-heap on the kept set: head = current worst of the best k,
      // so each new row needs one comparison in the common reject path
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with the reused projection row; copy the key only on
        // first sight — a per-row key copy would allocate on every input
        // row of the scan, the operator's hottest path
        val probeKey = keyProj(row)
        val heap = heaps.get(probeKey) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(probeKey.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) => heap.dequeueAll.reverse }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def simpleString(maxFields: Int): String = {
    val phase = if (finalPhase) "final" else "partial"
    s"TopKPerKeyExec($phase, k=$k, keys=${keys.mkString(",")}, " +
      s"order=${order.mkString(",")})"
  }
}
