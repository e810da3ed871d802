package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** SQL-text surface for the native range join — the same
  * TVF-placeholder-resolution pattern as [[AsOfSqlSurface]], so BOTH
  * native join operators are reachable from pure SQL text (the
  * reference's consumers are SQL-driven; an operator only Scala can
  * reach is half-shipped):
  *
  * {{{
  * SELECT * FROM graft_range_join(
  *   'purch', 'errs',        -- left/right table or view names
  *   'user_id', 'e_user_id', -- key columns (comma-separated lists)
  *   'win_lo', 'win_hi',     -- left interval bound columns
  *   'e_ts',                 -- right time column
  *   'outer')                -- options: outer ('' = none)
  * }}}
  *
  * The function builds [[UnresolvedRangeJoin]] over two
  * `UnresolvedRelation`s; [[ResolveGraftRangeJoin]] (injected
  * resolution rule) lowers it to the native [[RangeJoin]] once both
  * children resolve, applying exactly [[RangeJoinOps.rangeJoin]]'s
  * contract — session-resolver lookup, duplicate-name rejection,
  * right re-alias on exprId overlap. From there RangeJoinStrategy and
  * the codegen'd exec take over, so the SQL form plans IDENTICALLY to
  * the Scala form (asserted by RangeSqlSpec, gated by q530).
  */
object RangeSqlSurface {

  val FUNCTION_NAME = "graft_range_join"

  private def stringArg(e: Expression, pos: Int): String = {
    require(e.foldable && e.dataType ==
        org.apache.spark.sql.types.StringType,
      s"$FUNCTION_NAME: argument ${pos + 1} must be a string literal, " +
        s"got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$FUNCTION_NAME: argument ${pos + 1} is null")
    v.asInstanceOf[UTF8String].toString
  }

  private def splitList(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** The `Seq[Expression] => LogicalPlan` builder handed to
    * injectTableFunction.
    */
  def build(children: Seq[Expression]): LogicalPlan = {
    require(children.length == 7 || children.length == 8,
      s"$FUNCTION_NAME expects 7 or 8 arguments " +
        s"(leftTable, rightTable, leftKeys, rightKeys, loCol, hiCol, " +
        s"rightTime[, options]), got ${children.length}")
    val strArgs = children.zipWithIndex.map {
      case (e, i) => stringArg(e, i)
    }
    val opts = splitList(strArgs.lift(7).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT))
    val known = Set("outer", "broadcast", "merge")
    val bad = opts.filterNot(known)
    require(bad.isEmpty,
      s"$FUNCTION_NAME: unknown option(s) ${bad.mkString(", ")}; " +
        s"valid: ${known.toSeq.sorted.mkString(", ")}")
    require(!(opts.contains("broadcast") && opts.contains("merge")),
      s"$FUNCTION_NAME: 'broadcast' and 'merge' are mutually exclusive")
    val broadcastHint =
      if (opts.contains("broadcast")) Some(true)
      else if (opts.contains("merge")) Some(false)
      else None
    def rel(name: String): LogicalPlan =
      UnresolvedRelation(name.split('.').toSeq.map(_.trim))
    UnresolvedRangeJoin(
      rel(strArgs(0)), rel(strArgs(1)),
      splitList(strArgs(2)), splitList(strArgs(3)),
      strArgs(4), strArgs(5), strArgs(6),
      leftOuter = opts.contains("outer"),
      broadcastHint = broadcastHint)
  }
}

/** Placeholder node emitted by the `graft_range_join` TVF: column
  * names are still strings, children still `UnresolvedRelation`s.
  * Never survives analysis — [[ResolveGraftRangeJoin]] lowers it to
  * [[RangeJoin]]; if it can't (missing table), `resolved = false`
  * fails analysis with the standard unresolved-relation error.
  */
final case class UnresolvedRangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeyNames: Seq[String],
    rightKeyNames: Seq[String],
    loName: String,
    hiName: String,
    rightTimeName: String,
    leftOuter: Boolean,
    broadcastHint: Option[Boolean]) extends BinaryNode {

  require(leftKeyNames.length == rightKeyNames.length,
    s"${RangeSqlSurface.FUNCTION_NAME}: key list arity mismatch " +
      s"($leftKeyNames vs $rightKeyNames)")
  require(leftKeyNames.nonEmpty,
    s"${RangeSqlSurface.FUNCTION_NAME}: at least one key column required")

  override lazy val resolved: Boolean = false

  override def output: Seq[Attribute] = Nil

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedRangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (injected via injectResolutionRule): lowers
  * [[UnresolvedRangeJoin]] to the native [[RangeJoin]] once both
  * children are resolved — the same contract as
  * [[RangeJoinOps.rangeJoin]].
  */
object ResolveGraftRangeJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRangeJoin if u.childrenResolved =>
        val resolver = conf.resolver
        val lPlan = u.left
        var rPlan = u.right
        val dupNames = lPlan.output.map(_.name)
          .filter(ln => rPlan.output.exists(ra => resolver(ra.name, ln)))
        require(dupNames.isEmpty,
          s"${RangeSqlSurface.FUNCTION_NAME}: rename right-side columns " +
            s"first, duplicates: $dupNames")
        if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
          rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
        }
        def resolve(p: LogicalPlan, name: String): Attribute = {
          val hits = p.output.filter(a => resolver(a.name, name))
          require(hits.length == 1,
            s"${RangeSqlSurface.FUNCTION_NAME}: column '$name' is " +
              s"${if (hits.isEmpty) "missing" else "ambiguous"} in " +
              s"${p.output.map(_.name)}")
          hits.head
        }
        RangeJoin(
          lPlan, rPlan,
          u.leftKeyNames.map(resolve(lPlan, _)),
          u.rightKeyNames.map(resolve(rPlan, _)),
          resolve(lPlan, u.loName),
          resolve(lPlan, u.hiName),
          resolve(rPlan, u.rightTimeName),
          u.leftOuter,
          u.broadcastHint)
    }
}
