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
