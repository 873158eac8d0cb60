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
  *
  * Hot-loop shape (this is n × C × dim flops at index-build time — the
  * dominant build cost at scale): the input is copied to a local
  * `float[]` ONCE per row (instead of C × dim virtual `getFloat`
  * calls through ArrayData), and the per-centroid scan early-abandons
  * in 16-dim blocks — once the partial sum reaches the best distance
  * so far the centroid cannot win (the sum only grows, and the final
  * test is strict `<`), so skipping it is EXACT, same argmin and same
  * tie-break. On clustered data most centroids die after one block.
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
    val x = v.asInstanceOf[ArrayData].toFloatArray()
    var best = -1; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(x.length, cen.length)
      var acc = 0.0; var i = 0
      var dead = false
      while (i < n && !dead) {
        val lim = math.min(i + 16, n)
        while (i < lim) {
          val d = x(i).toDouble - cen(i).toDouble
          acc += d * d; i += 1
        }
        dead = acc >= bestD
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cenRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cen = ctx.freshName("cen")
      s"""
         |float[] $x = $a.toFloatArray();
         |int $best = -1; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cenRef.length; $c++) {
         |  float[] $cen = $cenRef[$c];
         |  int $n = java.lang.Math.min($x.length, $cen.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; ) {
         |    int $lim = java.lang.Math.min($i + 16, $n);
         |    for (; $i < $lim; $i++) {
         |      double $d = (double)$x[$i] - (double)$cen[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc >= $bestD) break;
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
    val x = v.asInstanceOf[ArrayData].toFloatArray()
    val ids = new Array[Int](np)
    val ds = new Array[Double](np)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(x.length, cen.length)
      // early abandon against the current worst of the kept top-np
      // (exact: a partial sum >= thr can only grow, and the insertion
      // test below is strict <) — same blocked scan as NearestCentroid
      val thr = if (filled < np) Double.MaxValue else ds(np - 1)
      var acc = 0.0; var i = 0
      var dead = false
      while (i < n && !dead) {
        val lim = math.min(i + 16, n)
        while (i < lim) {
          val d = x(i).toDouble - cen(i).toDouble
          acc += d * d; i += 1
        }
        dead = acc >= thr
      }
      // bounded insertion sort: strict < keeps lowest cid on ties
      if (!dead && (filled < np || acc < ds(filled - 1))) {
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
