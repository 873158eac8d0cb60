package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
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

/** Membership probe against a pre-built Bloom filter — a codegen'd
  * boolean expression (no black-box UDF). `putString` and
  * `mightContainBinary` agree on UTF-8 bytes, so probing with the
  * UTF8String's bytes matches filters built from the string column by
  * `DataFrameStatFunctions.bloomFilter`. The filter rides the task
  * binary via the expression's reference object — at 10 bits/element
  * a 10^9-element filter is ~1.2 GB; past broadcast comfort, fall
  * back to the exact join the caller verifies with anyway. */
case class BloomMightContain(child: Expression,
    bf: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def prettyName: String = "graft_bloom_contains"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Gopher-family repetition signals of a space-separated text in ONE
  * pass: struct(n_tokens, top_unigram_frac, top_bigram_frac,
  * dup_trigram_frac). Semantics are bit-identical to the declarative
  * explode(1..3-grams) → count → per-k max/sum formulation (which the
  * SQL oracle still uses), but all occurrences of one document are
  * counted inside the row — no gram explosion, no shuffle of
  * (doc, k, gram) rows at all. The declarative plan spent ~15 s on
  * 5 000 sf0.1 docs across three hash aggregates of ~3n string rows;
  * this is a linear scan.
  *
  * Fractions are unrounded raw doubles (max_count/total computed as
  * long→double division, exactly as the aggregate plan produced) —
  * callers apply their own rounding.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_repetition"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_unigram_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    stats(v.asInstanceOf[UTF8String])

  def stats(text: UTF8String): InternalRow = {
    // split(text, ' ') semantics incl. empty tokens from runs of spaces
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    // per-k counting: gram -> occurrence count (int[] cell avoids
    // Integer boxing churn on the update path)
    def counts(n: Int): java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]]((len + 1) * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= len - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val cell = m.computeIfAbsent(sb.toString, _ => new Array[Int](1))
        cell(0) += 1
        i += 1
      }
      m
    }
    def maxFrac(n: Int): Double = {
      if (len < n) return 0.0
      var maxc = 0L
      val it = counts(n).values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c > maxc) maxc = c }
      maxc.toDouble / (len - n + 1).toDouble
    }
    def dupFrac(n: Int): Double = {
      if (len < n) return 0.0
      var dup = 0L
      val it = counts(n).values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c >= 2) dup += c }
      dup.toDouble / (len - n + 1).toDouble
    }
    new GenericInternalRow(Array[Any](
      len.toLong, maxFrac(1), maxFrac(2), dupFrac(3)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetition", this,
      classOf[RepetitionStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
