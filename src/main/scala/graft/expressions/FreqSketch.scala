package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — `graft_freq_sketch(key, k)`.
  *
  * The deepest rung of the custom-operator ladder this library uses for
  * aggregation: unlike the typed `Aggregator`s (TopK, KMV), a
  * TypedImperativeAggregate participates in Catalyst's aggregation
  * framework directly — ObjectHashAggregateExec runs map-side PARTIAL
  * updates against the raw object buffer (one mutable HashMap per
  * group, zero per-row serialization), serializes once per partition
  * at the partial→shuffle boundary, and merges sketches on the reduce
  * side. The shuffle therefore carries ≤ k counters per partition
  * instead of the input rows — the property that makes corpus-wide
  * heavy-hitter detection a fixed-width pass at 100 TB.
  *
  * Algorithm (public literature):
  *   - Update is classic Misra–Gries with k counters (MG'82): increment
  *     a tracked key; insert if a slot is free; otherwise decrement ALL
  *     counters by 1 and drop zeros (amortized O(1): each global
  *     decrement is paid for by k+1 prior increments).
  *   - Merge is the mergeable-summaries form (Agarwal, Cormode,
  *     Huang, Phillips, Wei, Yi — PODS'12): add counters pointwise;
  *     if more than k survive, subtract the (k+1)-th largest counter
  *     value from every counter and drop the non-positives.
  *
  * Guarantees (the contract q509 builds on, spec-checked in
  * FreqSketchSpec over random streams and random merge trees):
  *   - underestimate only:  est(x) ≤ true(x);
  *   - bounded deficit:     true(x) − est(x) ≤ n / (k+1)  (n = total
  *     updates across all merged sketches);
  *   - ⇒ every key with true(x) > n/(k+1) is PRESENT in the summary.
  *
  * Estimated counts depend on merge order (only the bound is
  * order-independent), so gated queries never emit `est` — they use the
  * summary as a guaranteed-superset CANDIDATE set and re-count exactly
  * (see q509), which is the standard two-pass exact-heavy-hitters
  * shape.
  *
  * Null keys are ignored (SQL aggregate convention). Output is
  * `array<struct<token string, est bigint>>` sorted by (est desc,
  * token asc) for a deterministic display order.
  */
case class FreqSketch(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  def this(child: Expression, k: Expression) = this(child, k, 0, 0)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType) {
      return TypeCheckResult.TypeCheckFailure(
        s"graft_freq_sketch: key must be STRING, got ${left.dataType.sql}")
    }
    val integral = right.dataType == IntegerType ||
      right.dataType == LongType || right.dataType == ShortType ||
      right.dataType == ByteType
    if (!integral) {
      return TypeCheckResult.TypeCheckFailure(
        s"graft_freq_sketch: k must be integral, got ${right.dataType.sql}")
    }
    if (!right.foldable) {
      return TypeCheckResult.TypeCheckFailure(
        "graft_freq_sketch: k must be a constant")
    }
    if (k < 1) {
      return TypeCheckResult.TypeCheckFailure(
        s"graft_freq_sketch: k must be >= 1, got $k")
    }
    TypeCheckResult.TypeCheckSuccess
  }

  /** Counter budget; foldable by contract (checked above). */
  lazy val k: Int = right.eval(null) match {
    case null => -1
    case n: Number => n.intValue()
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v == null) return buf
    // UTF8String may alias reused row memory — materialize to String.
    val key = v.asInstanceOf[UTF8String].toString
    FreqSketch.mgUpdate(buf, key, k)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) =>
      a.update(key, a.getOrElse(key, 0L) + c)
    }
    if (a.size > k) {
      // Subtract the (k+1)-th largest counter value, drop non-positives.
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      a.filterInPlace((_, c) => c > cut)
      a.mapValuesInPlace((_, c) => c - cut)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (key, c) => (-c, key) }
      .map { case (key, c) =>
        InternalRow(UTF8String.fromString(key), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.update(new String(arr, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_freq_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqSketch =
    copy(left = newLeft, right = newRight)
}

object FreqSketch {
  /** One Misra–Gries update step — THE algorithm, shared by the batch
    * aggregate above and the streaming shard sketch
    * (DocStream.heavyHitterSketch) so the two paths cannot drift:
    * increment a tracked key; insert if a slot is free; otherwise
    * globally decrement (dropping counters that would hit zero —
    * filter BEFORE decrement keeps the map minimal), which "consumes"
    * the untracked arrival.
    */
  def mgUpdate(m: scala.collection.mutable.HashMap[String, Long],
      key: String, k: Int): Unit =
    m.get(key) match {
      case Some(c) => m.update(key, c + 1L)
      case None if m.size < k => m.update(key, 1L)
      case None =>
        m.filterInPlace((_, c) => c > 1L)
        m.mapValuesInPlace((_, c) => c - 1L)
    }
}
