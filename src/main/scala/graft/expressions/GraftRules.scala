package graft.expressions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: algebraic simplification of the library's
  * native expressions.
  *
  * `graft_cosine(x, x)` — self-similarity — reduces to a single-pass
  * single-accumulator [[SelfCosine]] (≈3× less arithmetic, one array
  * read instead of two). This shows up when a pipeline joins a table to
  * itself and scores all pairs including the diagonal. The rewrite is
  * bit-exact in every case: SelfCosine reproduces the diagonal
  * arithmetic `na / sqrt(na * na)` — 1.0 for normal vectors, NaN for
  * zero/empty vectors, null for null, identical under/overflow
  * behavior — so enabling the extension can never change results.
  * (ConstantFolding cannot help here: the argument is a column, not a
  * literal.)
  */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.semanticEquals(r) && l.deterministic =>
        SelfCosine(l)
    }
}
