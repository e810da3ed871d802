package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: algebraic simplification of the library's
  * native expressions.
  *
  * `graft_cosine(x, x)` — self-similarity — is identically 1.0 for any
  * non-null, non-zero vector, so the O(dim) loop is replaced with a
  * null-propagating constant. This shows up in practice when a
  * generated pipeline joins a table to itself and scores all pairs
  * including the diagonal; the rule removes the per-row vector work
  * before whole-stage codegen ever sees it. (ConstantFolding cannot do
  * this: the argument is a column, not a literal.)
  *
  * Null semantics preserved: NULL input → NULL output, exactly like the
  * evaluated expression.
  */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.semanticEquals(r) && l.deterministic =>
        if (l.nullable)
          If(IsNull(l), Literal(null, DoubleType), Literal(1.0)): Expression
        else Literal(1.0)
    }
}
