package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a single narrow expression.
  *
  * The IVF coarse quantizer (the Spark-native analog of the reference's
  * index-build partitioning, /root/reference/cuvs_bench_grid_search_v3
  * .py:197-207) needs `argmin_c sqdist(vec, centroid_c)` per row. Doing
  * that relationally (crossJoin with the centroid table + groupBy(id))
  * shuffles n x C rows — catastrophic at scale. This expression holds
  * the (small) centroid matrix as a referenced constant, so assignment
  * is a per-row loop inside whole-stage codegen: zero shuffle, zero
  * join, O(C x dim) per row.
  *
  * Tie-break: strict `<` keeps the lowest centroid id — identical to
  * `min(struct(dist, cid))` semantics, deterministic.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def prettyName: String = "graft_nearest_centroid"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var best = -1; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(x.numElements(), cen.length)
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - cen(i).toDouble
        acc += d * d; i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cenRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cen = ctx.freshName("cen")
      s"""
         |int $best = -1; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cenRef.length; $c++) {
         |  float[] $cen = $cenRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cen.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double)$a.getFloat($i) - (double)$cen[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Top-`nprobe` nearest centroids of a vector, ordered by (dist, cid)
  * asc — the probe-ranking step of IVF search as one narrow expression
  * (no crossJoin against the centroid table, no aggregate, no
  * shuffle). Returns array<int> of cell ids. Selection is a bounded
  * insertion into two parallel local arrays (nprobe is small); for the
  * workloads in SURVEY §6 the whole probe phase is q x C x dim flops
  * inside whole-stage codegen. */
case class NearestCells(child: Expression, centroids: Array[Array[Float]],
    nprobe: Int) extends UnaryExpression {
  override def prettyName: String = "graft_nearest_cells"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def np: Int = math.min(nprobe, centroids.length)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val ids = new Array[Int](np)
    val ds = new Array[Double](np)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(x.numElements(), cen.length)
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - cen(i).toDouble
        acc += d * d; i += 1
      }
      // bounded insertion sort: strict < keeps lowest cid on ties
      if (filled < np || acc < ds(filled - 1)) {
        var p = math.min(filled, np - 1)
        while (p > 0 && ds(p - 1) > acc) {
          if (p < np) { ds(p) = ds(p - 1); ids(p) = ids(p - 1) }
          p -= 1
        }
        ds(p) = acc; ids(p) = c
        if (filled < np) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(ids, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s"$self.nullSafeEval($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
