package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CdcCuts, CosineSimilarity, FreqSketch, GraftPairs, GraftTriples, LshBuckets, NormText, RollHash, SelfCosineRule, TokenSpans}

/** Session extensions for the graft engine: registers the library's
  * native Catalyst expressions as SQL functions, so they are available
  * in `expr(...)`/`spark.sql(...)` on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (see GraftSession).
  *
  * Injected functions (vs. UDFs) keep the hot loops inside whole-stage
  * codegen — the registry builder hands Catalyst the raw Expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_cosine expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_lsh_buckets expects 3 arguments, got ${children.length}")
        LshBuckets(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "graft_cdc_cuts"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_cdc_cuts expects 3 arguments, got ${children.length}")
        CdcCuts(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "graft_freq_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_freq_sketch expects 2 arguments, got ${children.length}")
        new FreqSketch(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_norm_text"),
      new ExpressionInfo(classOf[NormText].getName, "graft_norm_text"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_norm_text expects 1 argument, got ${children.length}")
        NormText(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_token_spans"),
      new ExpressionInfo(classOf[TokenSpans].getName, "graft_token_spans"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_token_spans expects 2 arguments, got ${children.length}")
        TokenSpans(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pairs"),
      new ExpressionInfo(classOf[GraftPairs].getName, "graft_pairs"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_pairs expects 1 argument, got ${children.length}")
        GraftPairs(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_triples"),
      new ExpressionInfo(classOf[GraftTriples].getName, "graft_triples"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_triples expects 1 argument, got ${children.length}")
        GraftTriples(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_roll_hash"),
      new ExpressionInfo(classOf[RollHash].getName, "graft_roll_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_roll_hash expects 1 argument, got ${children.length}")
        RollHash(children.head)
      }))
    // table-valued function: SQL-text surface for the native as-of
    // join (see plans/AsOfSqlSurface.scala)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.AsOfSqlSurface.FUNCTION_NAME),
      new ExpressionInfo(graft.plans.UnresolvedAsOfJoin.getClass.getName,
        graft.plans.AsOfSqlSurface.FUNCTION_NAME),
      (children: Seq[Expression]) => graft.plans.AsOfSqlSurface.build(children)))
    ext.injectResolutionRule(_ => graft.plans.ResolveGraftAsOfJoin)
    // table-valued function: SQL-text surface for the native range
    // join (see plans/RangeSqlSurface.scala)
    ext.injectTableFunction((
      FunctionIdentifier(graft.plans.RangeSqlSurface.FUNCTION_NAME),
      new ExpressionInfo(graft.plans.UnresolvedRangeJoin.getClass.getName,
        graft.plans.RangeSqlSurface.FUNCTION_NAME),
      (children: Seq[Expression]) => graft.plans.RangeSqlSurface.build(children)))
    ext.injectResolutionRule(_ => graft.plans.ResolveGraftRangeJoin)
    ext.injectOptimizerRule(_ => SelfCosineRule)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinOptimization)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    // AQE runtime skew splitting for the native as-of join (Spark's
    // OptimizeSkewedJoin rewrites only SMJ/SHJ) — see
    // org.apache.spark.sql.graft.AsOfSkewMitigation
    ext.injectQueryStageOptimizerRule(_ =>
      org.apache.spark.sql.graft.AsOfSkewMitigation)
  }
}
