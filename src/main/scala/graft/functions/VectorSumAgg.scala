package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of `array<float>` vectors — the centroid-update
  * primitive (k-means Lloyd step, mean pooling of embeddings).
  *
  * One hash aggregate with map-side partial sums replaces the
  * posexplode → groupBy(cid, dim) → collect_list reassembly plan
  * (which shuffles n×dim rows); this shuffles one dim-length buffer
  * per (group × partition). At 100 TB that is the difference between
  * a dim-times-larger shuffle and a centroid-table-sized one.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "graft_vecsum"
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum requires array<float>, got ${other.simpleString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length >= n) buf else {
      val grown = new Array[Double](n)
      System.arraycopy(buf, 0, grown, 0, buf.length)
      grown
    }
    var i = 0
    while (i < n) { acc(i) += arr.getFloat(i); i += 1 }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(off: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

/** Element-wise EXACT sum of `array<long>` vectors — the integer
  * pooling primitive (SIF weighted pooling, any micro-unit vector
  * accumulation).
  *
  * Same shuffle shape as [[VectorSum]]: one hash aggregate with
  * map-side partial buffers, one dim-length array per (group ×
  * partition) instead of one per input row — the fix for the
  * collect_list + fold plan, whose every input row ships its whole
  * array through the group-by shuffle with no partial aggregation.
  *
  * Overflow is LOUD: sums go through Math.addExact, so an int64
  * overflow throws ArithmeticException instead of wrapping silently
  * into a corrupted embedding (integer-exact pipelines depend on
  * these sums being trustworthy in any aggregation order).
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "graft_vecsum_long"
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum_long requires array<bigint>, got ${other.simpleString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length >= n) buf else {
      val grown = new Array[Long](n)
      System.arraycopy(buf, 0, grown, 0, buf.length)
      grown
    }
    var i = 0
    while (i < n) { acc(i) = Math.addExact(acc(i), arr.getLong(i)); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) = Math.addExact(big(i), small(i)); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}
