package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row occurrence counts of a FIXED term list over a token array,
  * in one pass: out[i] = count of tokens equal to terms(i), as double.
  *
  * Bit-identical to the declarative
  * `transform(termsLit, t -> size(filter(toks, x -> x === t)))`
  * (exact string equality, null elements never match), which scans the
  * token array once PER TERM — O(|terms|·L) UTF8String compares per
  * row. The frozen-BM25 stream scorer carries every standing query's
  * term union (~250 terms at the pack's 52 standing queries), making
  * that transform the dominant per-doc cost (r20 profile: stream_bm25
  * taskTime ≈ 7 s at sf0.1, mostly this counting). Here the term list
  * is hashed ONCE per task and each token is one map lookup — O(L).
  */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_term_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), i)
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    counts(v.asInstanceOf[ArrayData])

  def counts(toks: ArrayData): GenericArrayData = {
    val out = new Array[Double](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val idx = index.get(toks.getUTF8String(i))
        if (idx != null) out(idx.intValue()) += 1.0
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCounts", this,
      classOf[TermCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
