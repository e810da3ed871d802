package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined-chunking cut points.
  *
  * `graft_cdc_cuts(text, window, mask)` returns the 1-based END offsets
  * (in code points) of every `window`-length substring whose polynomial
  * rolling hash is ≡ 0 (mod `mask`) — the Karp–Rabin gear of a CDC
  * store (q166): cut where the CONTENT says so, so an insertion shifts
  * one chunk instead of re-aligning every fixed block after it.
  *
  * The per-position hash is `Σ cp(i+j)·B^(window-1-j) mod P` over code
  * points (B = 31, P = 1048573); this expression computes all positions
  * in ONE rolling pass per document — O(n) total, replacing the
  * explode-then-md5 formulation whose per-position `md5(substring(...))`
  * cost O(n) string builds and digests per document (the round-5 bench's
  * #3 query). At 100 TB the cut scan is a narrow map over every corpus
  * byte, so it must be a single fused pass inside whole-stage codegen,
  * not an interpreted per-position projection. The DuckDB oracle
  * evaluates the SAME polynomial non-rolled (eight ord() terms per
  * position, exact int64 — no overflow: cp·B^7 mod-bounded terms sum
  * below 2^44), so cut sets still hash-match exactly.
  */
case class CdcCuts(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_cdc_cuts: window and mask must be constants")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_cuts expects (string, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_cdc_cuts"

  override protected def nullSafeEval(t: Any, w: Any, m: Any): Any =
    CdcCuts.compute(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, m) =>
      s"${ev.value} = graft.expressions.CdcCuts.compute($t, $w, $m);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CdcCuts =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcCuts {
  /** Modulus: largest prime below 2^20 — keeps every intermediate of
    * both the rolling update and the oracle's 8-term direct sum far
    * inside int64. */
  val P = 1048573L

  /** Base of the polynomial hash. */
  val B = 31L

  /** The oracle-side constants: B^k mod P, k = 0..7 (window 8). */
  val Pow: Array[Long] =
    Array(1L, 31L, 961L, 29791L, 923521L, 317680L, 410923L, 155737L)

  /** One rolling pass over the text's code points; called from both the
    * interpreted path and the generated code (static forwarder). */
  def compute(text: UTF8String, window: Int, mask: Int): ArrayData = {
    val s = text.toString
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var k = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(k) = cp
      k += 1
      ci += Character.charCount(cp)
    }
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    if (n >= window && window >= 1 && mask >= 1) {
      var bw1 = 1L // B^(window-1) mod P
      var j = 0
      while (j < window - 1) { bw1 = bw1 * B % P; j += 1 }
      var h = 0L
      var i = 0
      while (i < window) { h = (h * B + cps(i)) % P; i += 1 }
      if (h % mask == 0) out += window.toLong
      var start = 1
      while (start <= n - window) {
        h = ((h - cps(start - 1) * bw1 % P) % P + P) % P
        h = (h * B + cps(start + window - 1)) % P
        if (h % mask == 0) out += (start + window).toLong
        start += 1
      }
    }
    new GenericArrayData(out.result())
  }
}
