package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fp16

/** fp16 codec vs NumPy golden values (np.float16 cast of np.float32)
  * — the exact transform the reference applies to stored vectors. */
class Fp16Spec extends AnyFunSuite {

  // (fp32 input, expected binary16 bits, expected fp32 after round-trip)
  private val golden: Seq[(Float, Int, Float)] = Seq(
    (0.0f, 0x0000, 0.0f),
    (-0.0f, 0x8000, -0.0f),
    (1.0f, 0x3c00, 1.0f),
    (-1.5f, 0xbe00, -1.5f),
    (0.1f, 0x2e66, 0.099975586f),
    (3.14159f, 0x4248, 3.140625f),
    (65504.0f, 0x7bff, 65504.0f),
    (70000.0f, 0x7c00, Float.PositiveInfinity),
    (6.1e-05f, 0x03ff, 6.097555e-05f),
    (5.96e-08f, 0x0001, 5.9604645e-08f),
    (1e-09f, 0x0000, 0.0f),
    (-2.718f, 0xc170, -2.71875f),
    (0.33333334f, 0x3555, 0.33325195f),
    (123.456f, 0x57b7, 123.4375f))

  test("toHalf matches numpy float16 bits") {
    golden.foreach { case (f, bits, _) =>
      assert((Fp16.toHalf(f) & 0xffff) == bits, s"toHalf($f)")
    }
  }

  test("fromHalf matches numpy float32 promotion") {
    golden.foreach { case (f, bits, back) =>
      val got = Fp16.fromHalf(bits.toShort)
      assert(java.lang.Float.floatToIntBits(got) ==
        java.lang.Float.floatToIntBits(back), s"fromHalf(0x$bits%04x) for $f")
    }
  }

  test("round trip is idempotent (seeded sweep)") {
    val rng = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val f = java.lang.Float.intBitsToFloat(rng.nextInt())
      if (!f.isNaN) {
        val once = Fp16.fromHalf(Fp16.toHalf(f))
        val twice = Fp16.fromHalf(Fp16.toHalf(once))
        assert(java.lang.Float.floatToIntBits(once) ==
          java.lang.Float.floatToIntBits(twice), s"input $f")
      }
    }
  }

  test("encode/decode as columns over testdata embeddings") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Tables.load(spark, TestSpark.sf, "embeddings").limit(100)
    val rt = df.select($"vec_id", $"embedding",
      GraftFunctions.fp16Decode(GraftFunctions.fp16Encode($"embedding"))
        .as("rt"))
    val rows = rt.collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](1); val b = r.getSeq[Float](2)
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) =>
        // fp16 relative error bound 2^-11 for normal range
        assert(math.abs(x - y) <= math.max(math.abs(x) * 4.9e-4f, 6.2e-5f),
          s"vec ${r.getLong(0)}: $x -> $y")
      }
    }
  }
}
