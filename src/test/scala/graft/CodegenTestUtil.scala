package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared codegen assertions for the custom-join specs.
  *
  * The `*(n)` plan marker is assigned at PLANNING time, so it cannot
  * prove a generated stage actually compiles — a Janino error makes
  * WholeStageCodegenExec fall back to the interpreted path silently
  * (the failure mode of the AQE skew rewrite's parenthesized nodeName,
  * which leaked into generated identifiers until the execs pinned an
  * identifier-safe freshNamePrefix). These helpers recompile the
  * generated stage source directly so such a regression fails a spec
  * instead of hiding in a slower board.
  */
object CodegenTestUtil {

  /** All whole-stage-codegen stages of the EXECUTED plan, descending
    * through AQE boundaries (TreeNode.collect stops at QueryStageExec,
    * a leaf wrapping its materialized plan).
    */
  def codegenStages(df: DataFrame): Seq[WholeStageCodegenExec] = {
    def walk(p: SparkPlan): Seq[WholeStageCodegenExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case w: WholeStageCodegenExec => w +: w.children.flatMap(walk)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Asserts at least one codegen stage satisfies `inStage` on some
    * node of its subtree, and that EVERY such stage's generated source
    * compiles. Call after an action so the AQE plan is final.
    */
  def assertStageCompiles(df: DataFrame)(
      inStage: PartialFunction[SparkPlan, Unit]): Unit = {
    val stages = codegenStages(df)
      .filter(_.collectFirst(inStage.andThen(_ => ())).isDefined)
    assert(stages.nonEmpty,
      "operator not inside a whole-stage-codegen stage:\n" +
        df.queryExecution.executedPlan)
    for (w <- stages) {
      val (_, src) = w.doCodeGen()
      // throws CompileException on any identifier/shape regression
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(src): Unit
    }
  }
}
