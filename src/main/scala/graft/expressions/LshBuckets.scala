package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: random-hyperplane LSH bucket signature.
  *
  * `graft_lsh_buckets(embedding, planes, planesPerTable)` computes, for
  * a float vector and a constant plane matrix of `T × planesPerTable`
  * hyperplanes (given flat, as `array<array<double>>`), the `T` bucket
  * ids `sum_p (dot(plane[t*ppt+p], embedding) >= 0 ? 1<<p : 0)` — i.e.
  * the sign-bit signature of each hash table — in ONE fused loop that
  * participates in whole-stage codegen.
  *
  * This replaces the interpreted `transform(planes, w -> aggregate(...))`
  * HOF chain that ops/Similarity.scala q23 used: those lambdas evaluate
  * outside codegen, and at 24 planes × 64 dims per corpus row they were
  * the slowest stage in the bench. The `planes` argument is a foldable
  * literal, so after constant folding the generated code reads it as a
  * pre-built reference object — per-row work is exactly the
  * `planes × dim` multiply-adds and nothing else. At 100 TB the
  * signature stage is a narrow map over the whole corpus, so it must be
  * codegen'd, not interpreted.
  *
  * Arithmetic is the same sequential left fold (`acc + w[d] * x[d]`,
  * d ascending) as the previous HOF form and the DuckDB oracle's
  * `list_reduce`, so bucket assignments are bit-identical and results
  * still hash-match the oracle exactly.
  */
case class LshBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _),
          IntegerType) =>
        if (third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_lsh_buckets: planesPerTable must be a constant")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_buckets expects (array<float>, array<array<double>>, " +
          s"int), got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  override protected def nullSafeEval(e: Any, p: Any, ppt: Any): Any = {
    val x = e.asInstanceOf[ArrayData]
    val planes = p.asInstanceOf[ArrayData]
    val perTable = ppt.asInstanceOf[Int]
    val nTables = planes.numElements() / perTable
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var q = 0
      while (q < perTable) {
        val w = planes.getArray(t * perTable + q)
        val n = math.min(w.numElements(), x.numElements())
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += w.getDouble(d) * x.getFloat(d).toDouble
          d += 1
        }
        if (dot >= 0.0) bucket |= 1 << q
        q += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, p, ppt) => {
      val nTables = ctx.freshName("nTables")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val q = ctx.freshName("q")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val bucket = ctx.freshName("bucket")
      s"""
        |final int $nTables = $p.numElements() / $ppt;
        |final int[] $out = new int[$nTables];
        |for (int $t = 0; $t < $nTables; $t++) {
        |  int $bucket = 0;
        |  for (int $q = 0; $q < $ppt; $q++) {
        |    final org.apache.spark.sql.catalyst.util.ArrayData $w =
        |      $p.getArray($t * $ppt + $q);
        |    final int $n = java.lang.Math.min($w.numElements(), $e.numElements());
        |    double $dot = 0.0;
        |    for (int $d = 0; $d < $n; $d++) {
        |      $dot += $w.getDouble($d) * (double) $e.getFloat($d);
        |    }
        |    if ($dot >= 0.0) $bucket |= 1 << $q;
        |  }
        |  $out[$t] = $bucket;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LshBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}
