package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** fp16 storage codec.
  *
  * The reference stores vectors as float16 (2× space:
  * /root/reference/download_dataset/utils.py:138-139 `astype(np.
  * float16)`; `_fp16.npy` suffix, utils_grid_search.py:364-365) and
  * promotes to fp32 for compute (:394-400). Spark SQL has no half
  * type, so the engine ships an explicit codec: `array<float>` ⇄
  * IEEE-754 binary16 packed into a `binary` column (2 bytes/dim,
  * little-endian). Encode-then-decode reproduces exactly the
  * `np.float16` round-trip the reference applies to every stored
  * vector.
  *
  * JDK 17 has no Float.floatToFloat16 (added in 20); the conversion is
  * implemented bit-level with round-to-nearest-even, matching IEEE and
  * NumPy.
  */
object Fp16 {
  /** Bulk little-endian byte→short decode into `out[off, off+len)`:
    * one ByteBuffer view `get` per row instead of per-element shift
    * assembly (r19 — the graph tier's packed replica-build-from-disk
    * measured 0.97–1.39x fp32 with the per-element loop; the bulk
    * get is the vectorizable form). Bit-identical to
    * `((b(2j+1) & 0xff) << 8) | (b(2j) & 0xff)` — the packed layout
    * stores binary16 little-endian (Fp16Encode's order). */
  def bytesToShorts(b: Array[Byte], out: Array[Short], off: Int,
      len: Int): Unit =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().get(out, off, len)

  /** Bulk packed-bytes → fp32 row: the shorts decode in one view get,
    * then one LUT-free `fromHalf` pass (the ragged fallback shape). */
  def bytesToFloats(b: Array[Byte]): Array[Float] = {
    val n = b.length / 2
    val tmp = new Array[Short](n)
    bytesToShorts(b, tmp, 0, n)
    val v = new Array[Float](n)
    var j = 0
    while (j < n) { v(j) = fromHalf(tmp(j)); j += 1 }
    v
  }

  /** fp32 → binary16 bits, round-to-nearest-even (IEEE 754). */
  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp = (bits >>> 23) & 0xff
    val mant = bits & 0x7fffff
    if (exp == 0xff) { // Inf / NaN
      (sign | 0x7c00 | (if (mant != 0) 0x200 | (mant >>> 13) else 0)).toShort
    } else {
      val e = exp - 127 + 15
      if (e >= 0x1f) (sign | 0x7c00).toShort // overflow -> Inf
      else if (e <= 0) {
        if (e < -10) sign.toShort // underflow -> signed zero
        else { // subnormal half
          val m = (mant | 0x800000) >>> (1 - e)
          // round to nearest even on the 13 dropped bits
          val r = (m >>> 13) + (if ((m & 0x1fff) > 0x1000 ||
            ((m & 0x1fff) == 0x1000 && ((m >>> 13) & 1) == 1)) 1 else 0)
          (sign | r).toShort
        }
      } else {
        val r = (mant >>> 13) + (if ((mant & 0x1fff) > 0x1000 ||
          ((mant & 0x1fff) == 0x1000 && ((mant >>> 13) & 1) == 1)) 1 else 0)
        val out = (sign | (e << 10) | 0) + r // mantissa carry may bump exp
        out.toShort
      }
    }
  }

  /** binary16 bits → fp32. */
  def fromHalf(h: Short): Float = {
    val sign = (h & 0x8000) << 16
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign
        else { // subnormal: normalize
          var e = -1; var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 0x1f) sign | 0x7f800000 | (mant << 13)
      else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }
}

/** `array<float>` → packed binary16 (`binary`, 2 bytes/dim LE). */
case class Fp16Encode(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_fp16_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])
  def encode(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val h = Fp16.toHalf(x.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fp16enc", this, classOf[Fp16Encode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** packed binary16 → `array<float>`. */
case class Fp16Decode(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_fp16_decode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = decode(v.asInstanceOf[Array[Byte]])
  def decode(b: Array[Byte]): ArrayData =
    new GenericArrayData(Fp16.bytesToFloats(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fp16dec", this, classOf[Fp16Decode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
