package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-quantization expressions.
  *
  * Reference: sign-binarize + bit-pack at
  * /root/reference/utils_grid_search.py:651-654 (`(vectors > 0)` then
  * `np.packbits`) and the `bitwise_hamming` metric for binary-quantized
  * search (utils_grid_search.py:433-434). Bit order matches
  * `np.packbits`: element i lands in byte i/8, most-significant bit
  * first, so ground-truth files produced by the reference pipeline
  * remain comparable.
  */

/** `array<float>` → packed sign bits as `binary` (ceil(n/8) bytes). */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_packbits"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (x.getFloat(i) > 0f) out(i >> 3) = (out(i >> 3) | (0x80 >> (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[($n + 7) / 8];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getFloat($i) > 0f) $out[$i >> 3] |= (byte)(0x80 >> ($i & 7));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Popcount(xor) Hamming distance over two packed-bit `binary` values. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_hamming"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary inputs")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]; val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0; var i = 0
    while (i < n) { acc += Integer.bitCount((x(i) ^ y(i)) & 0xff); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an `array<string>` token column.
  *
  * Spark-native document fingerprint for near-duplicate detection: each
  * token is xxhash64-hashed; per bit position the +1/-1 votes are
  * summed; the sign pattern forms the fingerprint. Near-duplicate
  * documents differ in few bits (compare with `graft_hamming64`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = hash(v.asInstanceOf[ArrayData])

  def hash(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.numElements()) {
      val s = toks.getUTF8String(t)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L; var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  // Delegates to the interpreted hash: runs once per document, not per
  // dimension — not a codegen hot loop like the distance kernels.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.hash($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Hamming distance between two 64-bit fingerprints (longs). */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_hamming64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint inputs")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
