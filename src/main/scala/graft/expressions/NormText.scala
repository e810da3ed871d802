package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the dedup-family content normalization.
  *
  * `graft_norm_text(text)` ≡ `trim(regexp_replace(regexp_replace(
  * lower(text), '[^a-z0-9 ]', ''), ' +', ' '))` — the normalize step
  * in front of every exact-dedup content key (q17, q467, q499/q506's
  * chunk keys, the streaming exact-dedup twin) — computed in ONE pass
  * over the code points with a single output buffer: lowercase, keep
  * [a-z0-9 ], collapse space runs, trim. The regex formulation builds
  * FIVE intermediate strings per document (lower, two replaces, trim,
  * plus regex-internal churn); under 32 concurrent scan tasks that
  * allocation rate is memory-bandwidth/GC-bound — measured at the sf3
  * canary (q467): 2-task layout 24 cpu-s, 32-task layout 113 cpu-s
  * for the SAME work, wall WORSE with 16× more cores. The single-pass
  * form removes the churn so the scan actually scales with cores.
  *
  * Unicode contract: per-code-point `Character.toLowerCase`, then the
  * [a-z0-9 ] filter. This matches the regex pipeline's result even
  * for special-casing edges — multi-char lowercase expansions (e.g.
  * İ → i + combining dot) differ only in characters the filter drops
  * anyway — and NormTextSpec pins equality on the fixture corpus and
  * the edge strings (İ, ß/ẞ, ligatures, tabs — note '\t' is NOT a
  * space: the regex class drops it, so does this).
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_norm_text expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_norm_text"

  override protected def nullSafeEval(t: Any): Any =
    NormText.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.expressions.NormText.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {
  /** One pass: lowercase per code point, keep [a-z0-9 ], collapse
    * space runs, trim. Static forwarder shared by the interpreted and
    * generated paths.
    */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        if (pendingSpace && out.length() > 0) out.append(' ')
        pendingSpace = false
        out.append(lc.toChar)
      } else if (lc == ' ') {
        pendingSpace = true
      }
      // every other code point is dropped, exactly like [^a-z0-9 ]
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
