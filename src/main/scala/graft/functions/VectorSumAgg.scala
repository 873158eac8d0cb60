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
