package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct n-token span projection of
  * the repeated-spans family (q151 and its streaming worklist twin).
  *
  * `graft_token_spans(text, n)` ≡ `array_distinct(transform(
  * sequence(1, size(parts) - n + 1), i -> array_join(slice(parts, i,
  * n), ' ')))` with `parts = split(text, ' ')` — and returns an empty
  * array where the old formulation's guard (`size(parts) >= n`)
  * filtered the row out, so callers keep the same `where`. The HOF
  * form materializes the token array, then builds each span by
  * slice+join (≈ n× text duplication per document, every lambda
  * interpreted). The key identity this expression exploits: splitting
  * on a SINGLE SPACE and re-joining with a single space reproduces
  * the original character run — consecutive spaces become empty
  * tokens and rejoin to the same spaces — so the i-th n-token span IS
  * `text.substring(start(i), end(i + n - 1))`. One pass finds the
  * token boundaries, each span is one substring, distinctness comes
  * from a per-row hash set. O(total span bytes) with no regex, no
  * interpreted lambdas, no token-array materialization.
  *
  * Split semantics match Spark's `split(text, ' ')` (Java split with
  * limit −1): interior AND trailing empty tokens are kept — pinned by
  * TokenSpansSpec on multi-space/trailing-space edges.
  */
case class TokenSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable) TypeCheckResult.TypeCheckFailure(
          "graft_token_spans: n must be a constant")
        else right.eval() match {
          // n < 1 is a caller error, not a data condition — reject at
          // analysis time instead of IndexOutOfBounds at runtime
          case n: java.lang.Integer if n < 1 =>
            TypeCheckResult.TypeCheckFailure(
              s"graft_token_spans: n must be >= 1, got $n")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_token_spans expects (string, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_token_spans"

  override protected def nullSafeEval(t: Any, n: Any): Any =
    TokenSpans.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.expressions.TokenSpans.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSpans =
    copy(left = newLeft, right = newRight)
}

object TokenSpans {
  /** One boundary pass + one substring per span; static forwarder
    * shared by the interpreted and generated paths.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // defensive twin of the analysis-time n >= 1 check (direct callers)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val s = text.toString
    // token start offsets under single-space split (limit -1): token i
    // spans [starts(i), ends(i)); an empty trailing token exists when
    // the text ends with a space — exactly Spark's split semantics
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = 0
    starts += 0
    while (p < s.length) {
      if (s.charAt(p) == ' ') {
        ends += p
        starts += p + 1
      }
      p += 1
    }
    ends += s.length
    val nTok = starts.length
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= nTok) {
      seen.add(s.substring(starts(i), ends(i + n - 1))): Unit
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(out)
  }
}
