package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fp16Decode, Fp16Encode, LshBandHashes, MinHashSignature,
  PackSignBits, SimHash64}
import graft.operators.Knn

/** Seeded-random algebraic properties of the portable hash/codec
  * expressions — the identities the LSH banding, fingerprinting, and
  * fp16/binary storage paths RELY on but example-based tests can't pin
  * exhaustively. Pure expression-level checks (no Spark jobs): each
  * property runs hundreds of randomized trials under a fixed seed. */
class HashPropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(7)

  private def arr(tokens: Seq[String]): ArrayData =
    new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])

  private def randTokens(n: Int): List[String] =
    List.fill(n)(rng.alphanumeric.take(1 + rng.nextInt(8)).mkString)

  private val nullArr = Literal.create(null, ArrayType(StringType))
  private val mh = MinHashSignature(nullArr, 128)
  private val sh = SimHash64(nullArr)
  private def longs(a: ArrayData): Seq[Long] = a.toLongArray().toSeq

  test("minhash is a set function: duplicate + order invariant") {
    // the LSH band join is only sound if the signature depends on the
    // shingle SET — not on multiplicity or array order
    for (_ <- 1 to 300) {
      val toks = randTokens(1 + rng.nextInt(30))
      val noisy = rng.shuffle(toks ++ toks.take(rng.nextInt(toks.size + 1)))
      assert(longs(mh.sig(arr(noisy))) == longs(mh.sig(arr(toks.distinct))))
    }
  }

  test("minhash of a union is the elementwise min of the signatures") {
    // the mergeability that lets 100-TB signatures build map-side and
    // combine without revisiting the shingles
    for (_ <- 1 to 300) {
      val a = randTokens(1 + rng.nextInt(20))
      val b = randTokens(1 + rng.nextInt(20))
      val u = longs(mh.sig(arr(a ++ b)))
      val merged = longs(mh.sig(arr(a))).zip(longs(mh.sig(arr(b))))
        .map { case (x, y) => math.min(x, y) }
      assert(u == merged)
    }
  }

  test("simhash is order invariant (votes sum over the bag)") {
    for (_ <- 1 to 300) {
      val toks = randTokens(1 + rng.nextInt(30))
      assert(sh.hash(arr(rng.shuffle(toks))) == sh.hash(arr(toks)))
    }
  }

  test("fp16 encode is idempotent and within the half-precision bound") {
    val enc = Fp16Encode(nullArr); val dec = Fp16Decode(nullArr)
    for (_ <- 1 to 300) {
      val xs = Array.fill(1 + rng.nextInt(64))(
        (rng.nextFloat() - 0.5f) * 200f)
      val once = enc.encode(new GenericArrayData(xs))
      val back = dec.decode(once).toFloatArray()
      // binary16 round-to-nearest: relative error <= 2^-11 for normal
      // values; generated range stays far from the subnormal/overflow
      // edges so the plain relative bound applies
      xs.zip(back).foreach { case (x, y) =>
        assert(math.abs(y - x) <= math.max(math.abs(x), 1e-3f) / 2048.0 + 1e-7)
      }
      val twice = enc.encode(dec.decode(once))
      assert(java.util.Arrays.equals(once, twice))
    }
  }

  test("packed hamming equals the sign-mismatch count (all dims)") {
    // ties ann_hamming_fixed's two lowerings together: the packed
    // popcount path (exactHamming / the codegen HammingDistance) and
    // the scalar per-dim path the graph build uses
    val pack = PackSignBits(Literal.create(null,
      ArrayType(org.apache.spark.sql.types.FloatType)))
    for (_ <- 1 to 300) {
      val n = 1 + rng.nextInt(130) // crosses byte boundaries + tail bits
      def vec = Array.fill(n)(
        if (rng.nextInt(5) == 0) 0f else (rng.nextFloat() - 0.5f).toFloat)
      val a = vec; val b = vec
      val pa = pack.nullSafeEval(new GenericArrayData(a)).asInstanceOf[Array[Byte]]
      val pb = pack.nullSafeEval(new GenericArrayData(b)).asInstanceOf[Array[Byte]]
      assert(Knn.hammingBytes(pa, pb).toDouble ==
        Knn.scalarDistance("hamming", a, b))
    }
  }

  test("lsh band hashes equal Spark's xxhash64(slice(sig, b*r+1, r), b)") {
    // the banding swap is only sound byte-exact: candidate sets and
    // the streaming bucket twin both key on these values
    import org.apache.spark.sql.catalyst.expressions.{Literal => L, XxHash64}
    import org.apache.spark.sql.types.{ArrayType => AT, LongType}
    for (_ <- 1 to 200) {
      val bands = Seq(1, 2, 4, 8, 16, 32, 64)(rng.nextInt(7))
      val r = 1 + rng.nextInt(4)
      val sig = Array.fill(bands * r)(rng.nextLong())
      val got = LshBandHashes(L.create(null, AT(LongType)), bands)
        .hashes(new GenericArrayData(sig)).toLongArray()
      for (b <- 0 until bands) {
        val slice = java.util.Arrays.copyOfRange(sig, b * r, b * r + r)
        val expected = XxHash64(Seq(
          L.create(new GenericArrayData(slice), AT(LongType, false)),
          L(b)), 42L).eval(null).asInstanceOf[Long]
        assert(got(b) == expected,
          s"band $b of $bands (r=$r): ${got(b)} != $expected")
      }
    }
  }

  test("lsh band hashes fail loudly on non-dividing signature lengths") {
    // r = 0 would hash every doc to the constant per-band seed (an
    // all-pairs cross join downstream); a non-dividing length would
    // silently weaken LSH by dropping trailing elements
    import org.apache.spark.sql.catalyst.expressions.{Literal => L}
    import org.apache.spark.sql.types.{ArrayType => AT, LongType}
    val e = LshBandHashes(L.create(null, AT(LongType)), 64)
    intercept[IllegalArgumentException] {
      e.hashes(new GenericArrayData(Array.fill(32)(1L))) // 32 < 64 bands
    }
    intercept[IllegalArgumentException] {
      e.hashes(new GenericArrayData(Array.fill(100)(1L))) // 100 % 64 != 0
    }
    // nullable ELEMENT TYPE is accepted at analysis (a signature table
    // persisted to parquet reads back containsNull=true — the stated
    // persist-then-band workflow)...
    val nullable = LshBandHashes(L.create(null,
      AT(LongType, containsNull = true)), 4)
    assert(nullable.checkInputDataTypes().isSuccess)
    // ...but an actual null SLOT fails loudly at eval (Spark's xxhash64
    // skips nulls — hashing around one would silently diverge from the
    // pinned semantics), while non-null data keeps the pinned hashes
    intercept[IllegalArgumentException] {
      nullable.hashes(new GenericArrayData(
        Array[Any](1L, null, 3L, 4L)))
    }
    val clean = Array.fill(8)(7L)
    assert(nullable.hashes(new GenericArrayData(clean.map(x => x: Any))) ==
      LshBandHashes(L.create(null, AT(LongType)), 4)
        .hashes(new GenericArrayData(clean)))
  }

  test("distBounded contract: exact at/below the bound, one-sided above") {
    // the NSW beam search and diversity selection rely on exactly
    // this: a return <= bound is the bit-exact distance (so tie-breaks
    // see true values), and a return > bound implies the true distance
    // is also > bound (so an abandon can only ever skip a node the
    // full computation would have rejected)
    for (_ <- 1 to 500) {
      val n = 1 + rng.nextInt(200) // crosses the 16/64-dim block edges
      val a = Array.fill(n)((rng.nextFloat() - 0.5f) * 4f)
      val b = Array.fill(n)((rng.nextFloat() - 0.5f) * 4f)
      for (metric <- Seq("sqeuclidean", "dot", "cosine", "hamming")) {
        val code = Knn.metricCode(metric)
        val exact = Knn.scalarDistance(metric, a, b)
        // bounds straddling the exact value, incl. the tie bound itself
        for (bound <- Seq(Double.PositiveInfinity, exact, exact * 0.5,
            exact * 2, exact - 1e-3, exact + 1e-3, 0.0)) {
          val got = Knn.distBounded(code, a, b, bound)
          if (got <= bound) assert(got == exact,
            s"$metric: return $got <= bound $bound must be exact ($exact)")
          else assert(exact > bound,
            s"$metric: return $got > bound $bound but exact $exact <= bound")
          // the flat views must return bit-identical values — embed
          // both rows mid-array to exercise nonzero offsets
          val flat = Array.fill(3)(rng.nextFloat()) ++ a ++
            Array.fill(2)(rng.nextFloat())
          assert(Knn.distBoundedFlat(code, flat, 3, n, b, bound) == got,
            s"$metric: flat twin diverged at bound $bound")
          val fb = Array.fill(5)(rng.nextFloat()) ++ b
          assert(Knn.distBoundedSlices(code, flat, 3, n, fb, 5, n,
            bound) == got,
            s"$metric: two-offset slices diverged at bound $bound")
        }
      }
    }
  }
}
