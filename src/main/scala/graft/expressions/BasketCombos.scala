package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native Catalyst expressions for the basket-combination family
  * (q158 co-purchase pairs, q181 triples): all ordered 2-/3-element
  * combinations of a sorted long array.
  *
  * `graft_pairs(parts)` ≡ `flatten(transform(parts, (x, i) ->
  * transform(slice(parts, i + 2, size(parts)), y -> struct(x, y))))`
  * and `graft_triples(parts)` is the analogous i<j<k nesting. The HOF
  * forms run interpreted (lambdas are outside whole-stage codegen) and
  * allocate O(b²)/O(b³) slice copies per basket; measured on the sf0.1
  * board the triple enumeration alone burned 21 executor-CPU-seconds
  * (q181). These expressions emit the same struct rows from one tight
  * loop over the input array — no slices, no lambda dispatch — and are
  * callable from the generated code path (static forwarder, same
  * pattern as [[TokenSpans]]).
  *
  * Element order matches the HOF form exactly: lexicographic by
  * position (i ascending, then j, then k), which over the sorted
  * distinct baskets is lexicographic by value — downstream groupBys
  * are order-insensitive anyway.
  */
abstract class BasketCombos extends UnaryExpression {
  protected def arity: Int
  protected def fieldNames: Seq[String]

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(fieldNames.map(f => StructField(f, LongType, nullable = false))),
    containsNull = false)
}

case class GraftPairs(child: Expression) extends BasketCombos {
  override protected def arity: Int = 2
  override protected def fieldNames: Seq[String] = Seq("part_a", "part_b")
  override def prettyName: String = "graft_pairs"

  override protected def nullSafeEval(arr: Any): Any =
    BasketCombos.pairs(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BasketCombos.pairs($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftPairs =
    copy(child = newChild)
}

case class GraftTriples(child: Expression) extends BasketCombos {
  override protected def arity: Int = 3
  override protected def fieldNames: Seq[String] = Seq("p1", "p2", "p3")
  override def prettyName: String = "graft_triples"

  override protected def nullSafeEval(arr: Any): Any =
    BasketCombos.triples(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BasketCombos.triples($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftTriples =
    copy(child = newChild)
}

object BasketCombos {
  /** All (i < j) combinations as struct rows; one preallocated array,
    * no slice copies. Static forwarder shared by the interpreted and
    * generated paths. */
  def pairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val xs = arr.toLongArray()
    val out = new Array[Any](n * (n - 1) / 2)
    var w = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(w) = InternalRow(xs(i), xs(j))
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All (i < j < k) combinations as struct rows. */
  def triples(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val xs = arr.toLongArray()
    val out = new Array[Any](n * (n - 1) * (n - 2) / 6)
    var w = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var k = j + 1
        while (k < n) {
          out(w) = InternalRow(xs(i), xs(j), xs(k))
          w += 1
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
