package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** SQL-text surface for the native as-of join: a table-valued function
  * `graft_asof_join(...)` registered through
  * `SparkSessionExtensions.injectTableFunction` (GraftExtensions), so
  * pure-SQL clients — the reference's consumers are SQL-text driven —
  * can reach the whole-operator rung without Scala:
  *
  * {{{
  * SELECT * FROM graft_asof_join(
  *   'facts', 'dim',            -- left/right table or view names
  *   'user_id', 'd_user_id',    -- key columns (comma-separated lists)
  *   'ts', 'state_ts',          -- time columns
  *   'd_event_id',              -- right tie-break list ('' = none)
  *   'outer',                   -- options: forward,strict,outer,
  *                              --          broadcast,merge ('' = none)
  *   604800000000)              -- tolerance µs (omit the arg = none)
  * }}}
  *
  * The function builds [[UnresolvedAsOfJoin]] — a placeholder binary
  * node over two `UnresolvedRelation`s — and [[ResolveGraftAsOfJoin]]
  * (an injected resolution rule) lowers it to the native [[AsOfJoin]]
  * once both children are resolved, applying exactly the Scala API's
  * contract: session-resolver name lookup, no duplicate column names
  * across sides, and right-side re-aliasing for self-joins. From there
  * the standard path takes over (AsOfJoinOptimization pushdown/pruning,
  * AsOfJoinStrategy merge-vs-broadcast pick), so the SQL form plans
  * IDENTICALLY to the Scala form — asserted by AsOfSqlSpec and gated
  * by q520 (the SQL twin of q512, same oracle hash).
  */
object AsOfSqlSurface {

  val FUNCTION_NAME = "graft_asof_join"

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
    require(children.length == 8 || children.length == 9,
      s"$FUNCTION_NAME expects 8 or 9 arguments " +
        s"(leftTable, rightTable, leftKeys, rightKeys, leftTime, " +
        s"rightTime, tieBreak, options[, toleranceUs]), " +
        s"got ${children.length}")
    val strArgs = children.take(8).zipWithIndex.map {
      case (e, i) => stringArg(e, i)
    }
    val tol = children.lift(8).map { e =>
      require(e.foldable && (e.dataType ==
          org.apache.spark.sql.types.LongType ||
          e.dataType == org.apache.spark.sql.types.IntegerType),
        s"$FUNCTION_NAME: tolerance must be an integer literal, got ${e.sql}")
      val v = e.eval()
      require(v != null, s"$FUNCTION_NAME: tolerance is null")
      v.asInstanceOf[Number].longValue()
    }
    val opts = splitList(strArgs(7).toLowerCase(java.util.Locale.ROOT))
    val known = Set("forward", "strict", "outer", "broadcast", "merge")
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
    UnresolvedAsOfJoin(
      rel(strArgs(0)), rel(strArgs(1)),
      splitList(strArgs(2)), splitList(strArgs(3)),
      strArgs(4), strArgs(5), splitList(strArgs(6)),
      tol,
      leftOuter = opts.contains("outer"),
      forward = opts.contains("forward"),
      strict = opts.contains("strict"),
      broadcastHint = broadcastHint)
  }
}

/** Placeholder node emitted by the `graft_asof_join` TVF: column names
  * are still strings and the children still `UnresolvedRelation`s.
  * Never survives analysis — [[ResolveGraftAsOfJoin]] lowers it to
  * [[AsOfJoin]]; if it can't (missing table), `resolved = false` fails
  * analysis with the standard unresolved-relation error.
  */
final case class UnresolvedAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeyNames: Seq[String],
    rightKeyNames: Seq[String],
    leftTimeName: String,
    rightTimeName: String,
    tieBreakNames: Seq[String],
    toleranceUs: Option[Long],
    leftOuter: Boolean,
    forward: Boolean,
    strict: Boolean,
    broadcastHint: Option[Boolean]) extends BinaryNode {

  require(leftKeyNames.length == rightKeyNames.length,
    s"${AsOfSqlSurface.FUNCTION_NAME}: key list arity mismatch " +
      s"($leftKeyNames vs $rightKeyNames)")
  require(leftKeyNames.nonEmpty,
    s"${AsOfSqlSurface.FUNCTION_NAME}: at least one key column required")

  override lazy val resolved: Boolean = false

  override def output: Seq[Attribute] = Nil

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (injected via injectResolutionRule): lowers
  * [[UnresolvedAsOfJoin]] to the native [[AsOfJoin]] once both children
  * are resolved — the same contract as `AsOf.asofJoin` (session
  * resolver, duplicate-name rejection, right-side re-alias on exprId
  * overlap for self-joins).
  */
object ResolveGraftAsOfJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedAsOfJoin if u.childrenResolved =>
        val resolver = conf.resolver
        val lPlan = u.left
        var rPlan = u.right
        val dupNames = lPlan.output.map(_.name)
          .filter(ln => rPlan.output.exists(ra => resolver(ra.name, ln)))
        require(dupNames.isEmpty,
          s"${AsOfSqlSurface.FUNCTION_NAME}: rename right-side columns " +
            s"first, duplicates: $dupNames")
        if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
          rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
        }
        def resolve(p: LogicalPlan, name: String): Attribute = {
          val hits = p.output.filter(a => resolver(a.name, name))
          require(hits.length == 1,
            s"${AsOfSqlSurface.FUNCTION_NAME}: column '$name' is " +
              s"${if (hits.isEmpty) "missing" else "ambiguous"} in " +
              s"${p.output.map(_.name)}")
          hits.head
        }
        AsOfJoin(
          lPlan, rPlan,
          u.leftKeyNames.map(resolve(lPlan, _)),
          u.rightKeyNames.map(resolve(rPlan, _)),
          resolve(lPlan, u.leftTimeName),
          resolve(rPlan, u.rightTimeName),
          u.tieBreakNames.map(resolve(rPlan, _)),
          u.toleranceUs,
          u.leftOuter,
          u.forward,
          u.strict,
          u.broadcastHint)
    }
}
