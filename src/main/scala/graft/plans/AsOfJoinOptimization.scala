package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst integration for the custom [[AsOfJoin]] node: the built-in
  * PushDownPredicates / ColumnPruning rules only know Spark's own
  * operators, so without this rule a `.where(...)` or narrow
  * `.select(...)` written ABOVE an as-of join would leave the parquet
  * scans reading every row and every column. Injected into the main
  * operator-optimization fixed point (GraftExtensions), so pushed
  * filters keep sinking through the standard rules until they reach
  * `PushedFilters` in the scan, and the inserted child Projects
  * collapse into `ReadSchema` pruning.
  *
  * What is safe to move:
  *  - Filter conjuncts referencing only LEFT attributes push below the
  *    node: the join picks each left row's match independently, so
  *    dropping left rows early never changes another row's result.
  *    (In outer mode a left conjunct is still safe — it references no
  *    right attribute, so it evaluates identically before the join.)
  *  - RIGHT-side conjuncts must NOT push: filtering the right side
  *    changes WHICH row is "the greatest ≤ t" (a filtered-out match
  *    would re-expose an older row), and in outer mode null-extended
  *    rows exist only above the join. They stay above.
  *  - Column pruning: each child keeps its attributes that are either
  *    referenced above the node or used by the node itself (keys,
  *    time, tie-break). Both are safe in all modes.
  */
object AsOfJoinOptimization extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {

    // --- left-only predicate pushdown ---------------------------------
    case f @ Filter(cond, j: AsOfJoin) =>
      val (leftOnly, rest) = splitConjuncts(cond).partition { c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet)
      }
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // --- column pruning through the node ------------------------------
    case p @ Project(exprs, j: AsOfJoin)
        if (j.outputSet -- p.references -- selfReferences(j)).nonEmpty =>
      val used = p.references ++ selfReferences(j)
      val newLeft = prune(j.left, used)
      val newRight = prune(j.right, used)
      Project(exprs, j.copy(left = newLeft, right = newRight))
  }

  private def selfReferences(j: AsOfJoin): AttributeSet =
    AttributeSet(j.leftKeys.flatMap(_.references) ++
      j.rightKeys.flatMap(_.references) ++
      j.leftTime.references ++ j.rightTime.references ++
      j.rightTieBreak.flatMap(_.references))

  private def prune(child: LogicalPlan, used: AttributeSet): LogicalPlan = {
    val kept = child.output.filter(used.contains)
    if (kept.length == child.output.length) child else Project(kept, child)
  }
}
