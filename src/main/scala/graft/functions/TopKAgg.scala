package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap entry: total order (dist asc, id asc) — deterministic
  * tie-breaking the reference lacks (TODO admitted at
  * /root/reference/utils_grid_search.py:84). */
private[graft] final class TopKBuffer(val k: Int) {
  // max-heap on (dist, id): head is the WORST of the kept k, so an
  // incoming better candidate evicts it in O(log k).
  val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(1, k),
    new java.util.Comparator[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    })

  def insert(dist: Double, id: Long): Unit = {
    if (heap.size < k) heap.add((dist, id))
    else {
      val worst = heap.peek()
      if (dist < worst._1 || (dist == worst._1 && id < worst._2)) {
        heap.poll(); heap.add((dist, id))
      }
    }
  }

  /** Early-abandon threshold for scan loops feeding this heap: any
    * candidate whose distance is strictly above this is rejected by
    * `insert` no matter its id (ties at the bound still compare ids,
    * so callers must only abandon on STRICTLY greater — the
    * `Knn.distBounded` contract). */
  def bound: Double =
    if (heap.size < k) Double.PositiveInfinity else heap.peek()._1

  def mergeFrom(other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); insert(e._1, e._2) }
    this
  }

  /** Entries sorted (dist asc, id asc). */
  def sorted: Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](heap.size)
    heap.toArray(arr)
    java.util.Arrays.sort(arr, new java.util.Comparator[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    arr
  }
}

/** Per-group top-k aggregate: keeps the k smallest (dist, id) pairs.
  *
  * The Spark-native replacement for the reference's per-query
  * `argpartition` + `argsort` top-k (utils_grid_search.py:923-928) and
  * the key to the brute-force k-NN plan (SURVEY §2.3 J1): with
  * `groupBy(qid).agg(graft_topk(k, dist, id))`, Catalyst runs this as
  * ObjectHashAggregate with a PARTIAL pass per partition (map-side
  * bounded heaps, O(k) state per query) and a FINAL merge after a
  * shuffle of only q×k rows per partition — never materializing the
  * n×q cross product. This is what survives a 100-TB scale-up where a
  * window-sort over all pairs would not.
  *
  * Output: array<struct<id long, dist double>> sorted (dist asc, id asc).
  * For similarity (descending) ranking, pass the negated score.
  */
case class TopKSmallest(
    k: Int,
    ord: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(ord, payload)
  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires (double, bigint) inputs, got " +
        s"${ord.dataType.simpleString} / ${payload.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = ord.eval(input)
    val p = payload.eval(input)
    if (d != null && p != null) {
      buf.insert(d.asInstanceOf[Double], p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = a.mergeFrom(b)

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (dist, id) =>
      InternalRow(id, dist)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.sorted
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (d, id) => bb.putDouble(d); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), payload = newChildren(1))
}
