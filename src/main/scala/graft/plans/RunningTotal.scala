package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.DoubleType

/** The custom-operator ladder, rung (c): a whole-operator node —
  * logical plan + planner strategy + physical exec, injected through
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.functions.GraftExtensions]]) — for the DISTRIBUTED RUNNING
  * TOTAL, the one primitive Spark's surface cannot express without
  * either a single-partition window (`sum().over(Window.orderBy(...))`
  * funnels ALL data through one reducer) or an extra full-data shuffle
  * (`partitionBy(spark_partition_id())`).
  *
  * Physics: the exec DECLARES `OrderedDistribution(sortOrder)` as its
  * required child distribution, so EnsureRequirements plants the range
  * exchange + sort that a total order needs anyway — and nothing else.
  * `doExecute` then runs the classic two-phase scan over the SAME
  * shuffle output (stage reuse: job 1 reads the sorted partitions for
  * per-partition sums — O(#partitions) driver data — job 2 streams them
  * again adding each partition's exclusive offset). Rows stay
  * `InternalRow`/Tungsten end to end — no `.rdd` deserialization to
  * GenericRow, no codegen barrier for downstream operators, pruning and
  * reuse see a normal unary node.
  *
  * Null `valueCol` cells contribute 0 to the total (document-level token
  * counts and AUC indicator columns — the callers — are never null; the
  * choice matches SQL SUM's null-skipping).
  */
case class RunningTotalPlan(child: LogicalPlan, sortOrder: Seq[SortOrder],
                            value: Attribute, outAttr: AttributeReference)
  extends UnaryNode {
  // outAttr is a constructor FIELD, not a derived val: plan transforms
  // copy() the node, and a regenerated AttributeReference would change
  // exprId under the feet of downstream references
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): RunningTotalPlan =
    copy(child = newChild)
}

case class RunningTotalExec(child: SparkPlan, sortOrder: Seq[SortOrder],
                            value: Attribute, outAttr: Attribute)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(sortOrder))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrder)
  override def outputOrdering: Seq[SortOrder] = sortOrder
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val idx = child.output.indexWhere(_.exprId == value.exprId)
    require(idx >= 0, s"running_total: value column $value not in child output")
    val sorted = child.execute()
    // job 1: per-partition sums — the exchange below us is materialized
    // shuffle state, so this extra pass re-reads shuffle files, not the
    // source (and the sort re-runs only per partition)
    val partSums = sorted.mapPartitions { it =>
      var s = 0.0
      it.foreach(r => if (!r.isNullAt(idx)) s += r.getDouble(idx))
      Iterator.single(s)
    }.collect()
    val offsets = partSums.scanLeft(0.0)(_ + _)
    val childOutput = child.output
    val attrs = output
    sorted.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      val proj = UnsafeProjection.create(attrs.map(_.dataType).toArray)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        if (!r.isNullAt(idx)) acc += r.getDouble(idx)
        extra.update(0, acc)
        proj(joined(r, extra))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RunningTotalExec =
    copy(child = newChild)
}

/** Planner rule: RunningTotalPlan -> RunningTotalExec. */
object RunningTotalStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RunningTotalPlan(child, order, value, outAttr) =>
      RunningTotalExec(planLater(child), order, value, outAttr) :: Nil
    case _ => Nil
  }
}

object RunningTotal {
  /** Append `out` = inclusive running total of `valueCol` (cast to
    * double) under the total order `sortCols`. The public seam
    * [[graft.ops.Ordinals.withRunningTotal]] delegates here.
    *
    * NONDETERMINISTIC sort expressions (a `rand(seed)` shuffle/tie-break
    * key — the Balancing trims use one) are materialized as projected
    * columns before the custom node: CheckAnalysis permits
    * nondeterminism in Project/Filter/Sort but rejects it in custom
    * operators (INVALID_NON_DETERMINISTIC_EXPRESSIONS). Materializing
    * also pins the value — the sort key is evaluated once per row, not
    * once per consumer. */
  def apply(df: org.apache.spark.sql.DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
            valueCol: String, out: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    var prepped = df.withColumn("__rt_v",
      org.apache.spark.sql.functions.col(valueCol).cast(DoubleType))
    // (materialized-column-name, original sort expression) per sort key:
    // every sort key that is not a plain column reference is projected —
    // determinism can't be judged pre-analysis (functions arrive as
    // UnresolvedFunction, which reports deterministic), and a
    // materialized key costs nothing the range sort wouldn't evaluate
    val pieces = sortCols.map(GraftBridge.expr).zipWithIndex.map { case (e, i) =>
      val child = e match { case so: SortOrder => so.child; case x => x }
      child match {
        case _: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute |
             _: org.apache.spark.sql.catalyst.expressions.Attribute => (None, e)
        case _ =>
          val nm = s"__rt_s$i"
          prepped = prepped.withColumn(nm, GraftBridge.column(child))
          (Some(nm), e)
      }
    }
    val analyzed = prepped.queryExecution.analyzed
    val valAttr = analyzed.output.find(_.name == "__rt_v").get
    val order = pieces.map {
      case (Some(nm), e) =>
        val attr = analyzed.output.find(_.name == nm).get
        e match {
          case so: SortOrder => so.copy(child = attr)
          case _ => SortOrder(attr, Ascending)
        }
      case (None, e) => e match {
        case so: SortOrder =>
          so.withNewChildren(so.children.map(resolve(analyzed, _))).asInstanceOf[SortOrder]
        case x => SortOrder(resolve(analyzed, x), Ascending)
      }
    }
    val outAttr = AttributeReference(out, DoubleType, nullable = false)()
    val matCols = pieces.collect { case (Some(nm), _) => nm }
    matCols.foldLeft(
        GraftBridge.ofRows(spark, RunningTotalPlan(analyzed, order, valAttr, outAttr))
          .drop("__rt_v"))((d, nm) => d.drop(nm))
  }

  private def resolve(plan: LogicalPlan,
                      e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e transform {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        plan.output.find(_.name == u.name).getOrElse(
          throw new IllegalArgumentException(s"running_total: cannot resolve ${u.name}"))
    }
}
