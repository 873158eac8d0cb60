package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First `nHex` hex digits of md5(input) as an unsigned long — the
  * fused, bit-identical form of the engine's portable ranking/bucket
  * hash `conv(substring(md5(x), 1, nHex), 16, 10).cast("long")`.
  *
  * That declarative chain pays, per row: a MessageDigest.getInstance
  * lookup (commons-codec allocates a fresh digest per call), a 32-char
  * hex String + UTF8String round trip, a substring copy, conv's
  * base-16 parse into a decimal string, and a final string→long cast.
  * This expression reuses one MessageDigest per thread and folds the
  * first 4·nHex digest bits straight into a long — same value for
  * every input (the first nHex hex chars ARE the leading 4·nHex bits
  * of the digest, big-endian), null-for-null, so every oracle that
  * replays the conv/substring/md5 SQL stays byte-identical.
  * Profiled in round 20: the conv chain dominated the single-split
  * feature-hash stages (corpus_dsir and friends) at sf0.1.
  *
  * nHex must be 1..15: 15 hex chars = 60 bits, always non-negative in
  * a signed 64-bit long — the same bound the conv-based call sites
  * relied on (13 for the 52-bit double-exact rank/bucket hash, 15 for
  * the 60-bit portable SimHash/winnow token hash). */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15,
    s"graft_md5_prefix: nHex must be in 1..15, got $nHex")

  override def prettyName: String = "graft_md5_prefix"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    prefix(v.asInstanceOf[UTF8String])

  def prefix(s: UTF8String): Long = {
    val md = Md5PrefixLong.digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5prefix", this,
      classOf[Md5PrefixLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.prefix($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object Md5PrefixLong {
  /** One digest per thread: MessageDigest is not thread-safe and
    * getInstance("MD5") per row is the cost this expression removes. */
  private[functions] val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}

/** First `nHex` hex digits of md5(input) as a lowercase hex STRING —
  * the fused form of `substring(md5(x), 1, nHex)` for keys wider than
  * a long (the 104-bit gram fingerprints of crossDocSpanDedup /
  * crossDocNgramCoverage). Byte-identical output; same digest-reuse
  * and no-intermediate-hex-String win as Md5PrefixLong. */
case class Md5PrefixStr(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex >= 1 && nHex <= 32,
    s"graft_md5_prefix_str: nHex must be in 1..32, got $nHex")

  override def prettyName: String = "graft_md5_prefix_str"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    prefix(v.asInstanceOf[UTF8String])

  private[this] final val hexDigits = "0123456789abcdef".getBytes

  def prefix(s: UTF8String): UTF8String = {
    val md = Md5PrefixLong.digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    val out = new Array[Byte](nHex)
    var i = 0
    while (i < nHex) {
      val b = digest(i >> 1) & 0xff
      out(i) = hexDigits(if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5prefixstr", this,
      classOf[Md5PrefixStr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.prefix($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
