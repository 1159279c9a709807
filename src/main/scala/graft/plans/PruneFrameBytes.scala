package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Length, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{SplitFrameSizes, SplitFrames}

/** Custom optimizer rule (the `Rule[LogicalPlan]` extension point,
  * SURVEY §2.11): when a query expands media into frames with
  * [[SplitFrames]] but provably consumes only `length(frame)` — frame
  * COUNTS and SIZES, never the bytes — rewrite the generator to
  * [[SplitFrameSizes]], which emits sizes by integer arithmetic with
  * zero byte copies.
  *
  * Why a rule and not a smarter query: the decision needs the
  * enclosing Project — the generator itself can't know its output is
  * only measured. This is the media analogue of column pruning: the
  * `frame` column is "pruned" INSIDE the generator, before it is ever
  * materialized. On a media corpus the payload slice-copy is the
  * entire cost of the expansion, so profile/statistics queries
  * (`SELECT count(*), avg(length(frame)) ...`) run without touching
  * payload bytes beyond the scan itself.
  *
  * Installed via `SparkSessionExtensions.injectOptimizerRule`
  * (builder path) or `GraftExtensions.register` (existing session) —
  * both route through the session's extra-optimizations hook, so the
  * rewrite applies to SQL (`LATERAL VIEW split_frames(...)`) and
  * DataFrame plans alike.
  */
object PruneFrameBytes extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        g @ Generate(sf: SplitFrames, _, _, _, generatorOutput, _))
        if generatorOutput.length == 2 &&
          onlyMeasured(projectList, frameAttr = generatorOutput(1)) =>
      val frameAttr = generatorOutput(1)
      val sizeAttr = AttributeReference(
        "frame_bytes", IntegerType, nullable = false)()
      val newGenerate = g.copy(
        generator = SplitFrameSizes(sf.payload, sf.frameBytes, sf.everyNth),
        generatorOutput = Seq(generatorOutput.head, sizeAttr))
      val newProjectList = projectList.map(_.transform {
        case Length(a: Attribute) if a.exprId == frameAttr.exprId => sizeAttr
      }.asInstanceOf[NamedExpression])
      Project(newProjectList, newGenerate)
  }

  /** True iff every reference to `frameAttr` in the project list sits
    * directly under `length(...)` — i.e. the bytes themselves are
    * never consumed.
    */
  private def onlyMeasured(
      projectList: Seq[NamedExpression], frameAttr: Attribute): Boolean = {
    val referencesFrame = projectList.exists(_.references.contains(frameAttr))
    def bareUses(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e match {
        case Length(a: Attribute) if a.exprId == frameAttr.exprId => 0
        case a: Attribute if a.exprId == frameAttr.exprId => 1
        case other => other.children.map(bareUses).sum
      }
    referencesFrame && projectList.map(bareUses(_)).sum == 0
  }
}
