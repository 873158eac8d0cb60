package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a space-separated text, in one pass.
  *
  * Replaces the declarative split+transform+element_at formulation:
  * there, the split() child expression is re-evaluated for every
  * lambda element (~3n splits per row — observed 9s for 5000 docs),
  * because higher-order functions don't share subexpressions with
  * their argument. Here: one tokenize, one sliding join, one dedup.
  * Semantics identical to
  * `array_distinct(transform(seq, i -> concat_ws(' ', l[i..i+n-1])))`
  * with l = split(text, ' '), so the SQL oracle is unchanged.
  */
case class NGramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def prettyName: String = "graft_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    shingle(v.asInstanceOf[UTF8String])

  def shingle(text: UTF8String): GenericArrayData = {
    // split(text, ' ') semantics incl. empty tokens from runs of spaces
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this,
      classOf[NGramShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.shingle($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
