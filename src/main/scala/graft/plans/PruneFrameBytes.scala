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
    // outer == false only: LATERAL VIEW OUTER null-pads missing rows
    // through Generate.qualifiedGeneratorOutput's nullability widening,
    // which the freshly-minted non-nullable sizeAttr would defeat
    // (a null slot read as 0 / IsNull folded to false)
    case p @ Project(projectList,
        g @ Generate(sf: SplitFrames, _, false, _, generatorOutput, _))
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
    * never consumed. A project list that never references the frame at
    * all (pure counts: `SELECT doc_id, frame_idx`) qualifies too — the
    * rewrite is equally safe and saves the most.
    */
  private def onlyMeasured(
      projectList: Seq[NamedExpression], frameAttr: Attribute): Boolean = {
    def bareUses(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e match {
        case Length(a: Attribute) if a.exprId == frameAttr.exprId => 0
        case a: Attribute if a.exprId == frameAttr.exprId => 1
        case other => other.children.map(bareUses).sum
      }
    projectList.map(bareUses(_)).sum == 0
  }
}
