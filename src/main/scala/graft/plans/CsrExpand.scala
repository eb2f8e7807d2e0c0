package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** CSR message expansion as a WHOLE-OPERATOR custom plan — SURVEY.md §4.6,
  * the (c) path of the custom-operator preference order: LogicalPlan +
  * Rule[LogicalPlan] + SparkStrategy + SparkPlan, injectable via
  * SparkSessionExtensions.
  *
  * Semantics: over rows carrying a packed adjacency row (dsts: array<long>,
  * ps: array<double>) already joined with vertex state (rank: double), emit
  * one (dst, c = p·rank) message per neighbor — exactly
  * `explode(zip_with(dsts, ps, (d, p) -> struct(d, p * rank)))`, minus its
  * costs: zip_with is CodegenFallback (evicts the projection from
  * whole-stage codegen) and materializes an intermediate array of structs
  * per vertex before Generate re-explodes it. The physical operator walks
  * the two arrays once and writes each message straight into a reused
  * UnsafeRow.
  *
  * The operator is NARROW (per-partition), so the iteration's partitioning
  * contract is untouched: em⋈state needs no exchange, expansion is local,
  * the message groupBy stays the round's only shuffle.
  */
case class CsrExpand(child: LogicalPlan, override val output: Seq[Attribute])
    extends UnaryNode {

  /** The three child columns the operator consumes — declared so the
    * optimizer (incl. [[CsrExpandPruning]]) sees real references and never
    * prunes them away under the node. */
  @transient override lazy val references: AttributeSet =
    AttributeSet(child.output.filter(a => CsrExpand.Needed(a.name)))

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): CsrExpand =
    copy(child = newChild)
}

object CsrExpand {
  val Needed: Set[String] = Set("dsts", "ps", "rank")

  /** Output attributes are minted ONCE here; `copy` during plan transforms
    * must keep the same expression ids or parent references break. */
  def apply(child: LogicalPlan): CsrExpand = new CsrExpand(child, Seq(
    AttributeReference("dst", LongType, nullable = false)(),
    AttributeReference("c", DoubleType, nullable = false)()))
}

/** Physical operator: one pass over (dsts, ps, rank), messages written into
  * a reused UnsafeRow (safe: consumers process a row before pulling the
  * next — the same contract codegen'd operators rely on). */
case class CsrExpandExec(override val output: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode {

  // the output attrs are minted by this node, not consumed from the child —
  // without this, QueryPlan counts the constructor's Seq[Attribute] as
  // references and renders the node with the missing-input "!" marker
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val dstsIdx = child.output.indexWhere(_.name == "dsts")
    val psIdx = child.output.indexWhere(_.name == "ps")
    val rankIdx = child.output.indexWhere(_.name == "rank")
    require(dstsIdx >= 0 && psIdx >= 0 && rankIdx >= 0,
      s"CsrExpandExec needs dsts/ps/rank in child output, got ${child.output.map(_.name)}")
    child.execute().mapPartitions({ it =>
      val writer = new UnsafeRowWriter(2)
      it.flatMap { row =>
        val dsts = row.getArray(dstsIdx)
        val ps = row.getArray(psIdx)
        val rank = row.getDouble(rankIdx)
        val n = math.min(dsts.numElements(), ps.numElements())
        (0 until n).iterator.map { i =>
          writer.reset()
          writer.write(0, dsts.getLong(i))
          writer.write(1, ps.getDouble(i) * rank)
          writer.getRow
        }
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): CsrExpandExec =
    copy(child = newChild)
}

/** Plans [[CsrExpand]] → [[CsrExpandExec]]. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CsrExpand(child, output) => CsrExpandExec(output, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Column pruning for the custom node: built-in ColumnPruning doesn't know
  * it, so without this the child join would materialize every column (e.g.
  * the join key) just to have CsrExpand ignore it. */
object CsrExpandPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case e @ CsrExpand(child, _) if child.output.size > e.references.size =>
      e.copy(child = Project(child.output.filter(e.references.contains), child))
  }
}

/** `spark.sql.extensions=graft.plans.GraftSparkExtensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GraftStrategy)
    ext.injectOptimizerRule(_ => CsrExpandPruning)
  }
}

object GraftPlans {
  /** Runtime injection for sessions built without the extensions config —
    * idempotent. */
  def install(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GraftStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GraftStrategy
    if (!exp.extraOptimizations.contains(CsrExpandPruning))
      exp.extraOptimizations = exp.extraOptimizations :+ CsrExpandPruning
  }

  /** `joined` must carry dsts/ps/rank (packed adjacency ⋈ state); returns
    * the (dst, c) message stream via the custom operator. */
  def expandMessages(joined: DataFrame): DataFrame = {
    install(joined.sparkSession)
    org.apache.spark.sql.graft.PlanBridge.ofRows(
      joined.sparkSession, CsrExpand(joined.queryExecution.analyzed))
  }
}
