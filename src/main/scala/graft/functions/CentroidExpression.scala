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
