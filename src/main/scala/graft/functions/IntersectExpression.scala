package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `size(array_intersect(a, b))` fused into one counting pass — the
  * exact-Jaccard verify kernel of the MinHash-LSH dedup (round 21,
  * guide §4 "prefer built-in/codegen expressions" + §1.2-step-2
  * per-task work).
  *
  * For non-primitive element types (the shingle arrays are
  * array<string>), Spark's ArrayIntersect runs an INTERPRETED
  * Function2 per row (`evalIntersect`): a boxed scala HashSet build,
  * an ArrayBuffer of matches, and a GenericArrayData result that
  * `size` immediately reduces to its length — the intersection array
  * itself is pure allocation. This expression computes the same count
  * directly: one reusable-per-thread HashSet build over the smaller
  * side is not possible (dedup semantics need b's distinct set), so it
  * builds one java.util.HashSet over b and streams a through it,
  * REMOVING matches so duplicate elements of a count once — exactly
  * array_intersect's dedup semantics. No result array, no boxing of
  * primitives (elements are UTF8String already), no per-row
  * GenericArrayData.
  *
  * Bit-exact equivalence with `size(array_intersect(a, b))`:
  *  - null array on either side → null (null-intolerant), matching
  *    array_intersect's null propagation through size under
  *    spark.sql.legacy.sizeOfNull=false (the engine never runs legacy).
  *  - duplicate elements count once (HashSet.remove-on-match = the
  *    result-array dedup).
  *  - a null ELEMENT present in both arrays counts exactly once
  *    (array_intersect keeps one null in that case).
  * Pinned against the declarative chain on adversarial arrays (dups,
  * null slots, empties) in OptimizationParitySpec.
  */
case class IntersectCardinality(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def count(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    val bSet = new java.util.HashSet[UTF8String](
      math.max(8, (nb * 4) / 3))
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else bSet.add(b.getUTF8String(i))
      i += 1
    }
    var cnt = 0
    var nullCounted = false
    val na = a.numElements()
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else if (bSet.remove(a.getUTF8String(i))) {
        cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectCount", this,
      classOf[IntersectCardinality].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.count($a, $b)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression) = copy(left = l, right = r)
}
