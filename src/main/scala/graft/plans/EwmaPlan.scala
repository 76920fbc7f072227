package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** EWMA as a first-class Catalyst operator (SURVEY.md §3 tier (c)).
  *
  * The recurrence e_t = α·x_t + (1-α)·e_{t-1} cannot be expressed by window
  * functions without O(n²) prefix materialization, and the mapPartitions
  * formulation (TimeSeriesOps.ewma) hides its distribution requirements
  * from the optimizer — it repartitions unconditionally. This operator
  * instead *declares* `requiredChildDistribution` (clustered by key) and
  * `requiredChildOrdering` (key, time), so EnsureRequirements inserts a
  * shuffle/sort only when the child isn't already partitioned that way —
  * chained per-key operators run shuffle-free (see EwmaPlanSpec).
  */
case class EwmaNode(keyAttr: Attribute, orderAttrs: Seq[Attribute],
                    valueAttr: Attribute, alpha: Double,
                    child: LogicalPlan,
                    // constructor param so plan transforms (copy) keep the
                    // exprId stable — a body val would mint a new one per copy
                    ewmaAttr: AttributeReference =
                      AttributeReference("ewma", DoubleType, nullable = false)())
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ ewmaAttr
  // demand every child column: the node re-emits them all, so nothing may
  // be pruned from beneath it
  override def references: AttributeSet = AttributeSet(child.output)
  override def producedAttributes: AttributeSet = AttributeSet(ewmaAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class EwmaExec(keyAttr: Attribute, orderAttrs: Seq[Attribute],
                    valueAttr: Attribute, alpha: Double,
                    outputAttrs: Seq[Attribute],
                    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = outputAttrs
  override def references: AttributeSet = AttributeSet(child.output)
  override def producedAttributes: AttributeSet = AttributeSet(outputAttrs.last :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyAttr)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((keyAttr +: orderAttrs).map(a => SortOrder(a, Ascending)))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // resolve positions against the actual child output (robust to
    // optimizer-introduced projections)
    val kIdx = child.output.indexWhere(_.exprId == keyAttr.exprId)
    val vIdx = child.output.indexWhere(_.exprId == valueAttr.exprId)
    require(kIdx >= 0 && vIdx >= 0,
      s"ewma key/value not found in child output: ${child.output}")
    val a = alpha
    val types = child.output.map(_.dataType)
    val nFields = types.length
    child.execute().mapPartitions({ it =>
      var curKey: Any = null
      var acc = 0.0
      var first = true
      it.map { raw =>
        val row = raw.copy() // unsafe rows are buffer-reused upstream
        val k = row.get(kIdx, types(kIdx))
        val x = row.getDouble(vIdx)
        if (first || k != curKey) { curKey = k; acc = x; first = false }
        else acc = acc * (1.0 - a) + x * a
        val out = new GenericInternalRow(nFields + 1)
        var i = 0
        while (i < nFields) { out.update(i, row.get(i, types(i))); i += 1 }
        out.setDouble(nFields, acc)
        out: InternalRow
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object EwmaStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ EwmaNode(k, o, v, a, child, _) =>
      EwmaExec(k, o, v, a, n.output, planLater(child)) :: Nil
    case _ => Nil
  }
}

object Ewma {
  /** Lazy strategy installation shared by the native-plan entry points
    * (this and [[AsofJoin]]): consult the session PLANNER, not just
    * `experimental.extraStrategies` — a GraftExtensions-configured
    * session already carries the strategies via injectPlannerStrategy,
    * and appending a second copy would make the planner generate
    * duplicate candidates for every native node. */
  private[plans] def installStrategy(spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit =
    if (!spark.sessionState.planner.strategies.contains(s))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ s

  /** Append an `ewma` column via the native operator. Installs the planner
    * strategy into the session on first use (idempotent). */
  def apply(df: DataFrame, key: String, order: Seq[String], valueCol: String,
            alpha: Double): DataFrame = {
    val spark = df.sparkSession
    installStrategy(spark, EwmaStrategy)
    val lp = org.apache.spark.sql.graftbridge.PlanBridge.logicalPlan(df)
    def attr(name: String): Attribute = lp.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))
    val node = EwmaNode(attr(key), order.map(attr), attr(valueCol), alpha, lp)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }
}
