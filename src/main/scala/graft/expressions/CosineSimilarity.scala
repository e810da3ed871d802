package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two vectors
  * (array&lt;float&gt; or array&lt;double&gt;, mixed allowed — float elements are
  * widened to double exactly as an explicit cast would).
  *
  * Fuses dot product and both norms into a single pass over the arrays
  * (one loop, three accumulators) and participates in whole-stage codegen
  * — this is the hot inner loop of the similarity/ANN operators
  * (ops/Similarity.scala, ops/Dedup.scala q21), where a per-pair lambda
  * chain (`aggregate`/`zip_with`, interpreted HOFs) would dominate the
  * runtime. At 100 TB the candidate-verify stage evaluates this O(pairs)
  * times, so it must be codegen'd, not interpreted. The double-array
  * overload serves the centroid-routing family (q34/q78/q80/q102/q134/
  * q220/q247/q258/q260): codebook centroids are double-valued means, and
  * routing evaluates query × |codes| cosines per row.
  *
  * Semantics are bit-identical to three sequential left folds over the
  * double-widened elements — `dot / sqrt(na * nb)` — which is exactly
  * what the DuckDB oracle computes via `list_reduce` (and what the
  * interpreted `cosFoldSpark` HOF form computed before these sites
  * migrated), so results hash-match the oracle exactly. Elements are
  * assumed non-null (the embeddings fixture guarantees it); lengths may
  * differ, the shorter prefix is used.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => vecOk(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getX =
        if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY =
        if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $x = $getX;
        |  final double $y = $getY;
        |  $dot += $x * $y;
        |  $na += $x * $x;
        |  $nb += $y * $y;
        |}
        |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `graft_cosine(x, x)` after SelfCosineRule: 1.0 for any vector with a
  * non-zero norm, NaN for zero/empty vectors, null for null — the
  * binary expression's exact diagonal arithmetic (dot==na), but one
  * array pass with one accumulator instead of two passes and three.
  * Accepts the same float/double element types as the binary form.
  */
case class SelfCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_self_cosine expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_self_cosine"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = isFloat
    var na = 0.0
    var i = 0
    while (i < x.numElements()) {
      val xi = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      na += xi * xi
      i += 1
    }
    // identical arithmetic to the binary expression's diagonal (dot==na):
    // 1.0 normally, NaN for zero norm, and the same ±Inf behavior at
    // norm under/overflow — bit-exact with the unrewritten plan
    na / math.sqrt(na * na)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val na = ctx.freshName("na")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val getX =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        |double $na = 0.0;
        |for (int $i = 0; $i < $a.numElements(); $i++) {
        |  final double $x = $getX;
        |  $na += $x * $x;
        |}
        |${ev.value} = $na / java.lang.Math.sqrt($na * $na);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)
}
