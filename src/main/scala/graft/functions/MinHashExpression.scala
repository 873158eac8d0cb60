package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over a shingle set — one row per document.
  *
  * Each shingle is hashed ONCE (xxhash64 of its UTF-8 bytes); the k
  * hash-family members are derived by universal hashing
  * h_i = a_i * h + b_i over 2^64 (odd multipliers from a seeded PRNG)
  * — the standard trick that replaces k string hashes per shingle with
  * one hash + k multiply-adds (~100× cheaper signatures at equal LSH
  * quality). Deterministic across partitions and sessions.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)

  override def prettyName: String = "graft_minhash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // seeded family constants (a odd, b arbitrary) — fixed at plan time
  @transient private lazy val (as, bs) = {
    val rng = new java.util.SplittableRandom(42L)
    val a = Array.fill(numHashes)(rng.nextLong() | 1L)
    val b = Array.fill(numHashes)(rng.nextLong())
    (a, b)
  }

  override def nullSafeEval(v: Any): Any = sig(v.asInstanceOf[ArrayData])

  def sig(shingles: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.numElements()) {
      val u = shingles.getUTF8String(s)
      val h = XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var i = 0
      while (i < numHashes) {
        val v = as(i) * h + bs(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this,
      classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sig($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Single-pass LSH band hashes over a minhash signature: band b's
  * hash is byte-identical to Spark's
  * `xxhash64(slice(sig, b*r + 1, r), b)` — seed 42, fold
  * XXH64.hashLong over the slice elements in order, then hash the
  * band index as an int — but computed in ONE primitive loop instead
  * of an interpreted ArrayTransform + Slice + HashExpression tree per
  * band (stack-sampling showed that tree dominating the LSH banding
  * stage at 1M+ docs). The swap is pinned byte-exact by
  * HashPropertySpec, so candidate sets (and the streaming bucket
  * twin, which shares `Dedup.bandHashes`) are unchanged. */
case class LshBandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands > 0)

  override def prettyName: String = "graft_lsh_bands"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // nullable elements are ACCEPTED at analysis (a signature table
    // persisted to parquet reads back containsNull=true — the stated
    // 100-TB persist-then-band workflow) but an actual null slot fails
    // loudly at eval: Spark's xxhash64 SKIPS nulls, so hashing around
    // one would silently diverge from the pinned semantics
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = hashes(v.asInstanceOf[ArrayData])

  def hashes(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    // r = 0 would hash every doc to the constant per-band seed (an
    // all-pairs cross join downstream); a non-dividing length would
    // silently drop trailing elements — fail loudly instead
    require(n >= bands && n % bands == 0,
      s"$prettyName: signature length $n must be a positive multiple of bands=$bands")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var i = b * r
      val end = i + r
      while (i < end) {
        if (sig.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null signature slot at index $i — minhash " +
            "signatures are never null-valued; a null here means the " +
            "persisted table is corrupt")
        h = XXH64.hashLong(sig.getLong(i), h); i += 1
      }
      out(b) = XXH64.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshbands", this,
      classOf[LshBandHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.hashes($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
