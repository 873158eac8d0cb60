package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.call_function

import graft.functions._

/** Registration + typed Column wrappers for the engine's native
  * Catalyst expressions. Registering through the session's
  * FunctionRegistry keeps every function visible to Catalyst (codegen,
  * constant folding, null propagation) and usable from both the Column
  * DSL (via `call_function`) and `spark.sql`.
  */
object GraftFunctions {

  private def foldableInt(e: Expression, fn: String): Int = e match {
    case lit if lit.foldable =>
      lit.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$fn: first argument must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn: first argument (k) must be a literal")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_sqdist", es => VectorSqDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", es => VectorDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cosine", es => VectorCosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_norm", es => VectorNorm(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_packbits", es => PackSignBits(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hamming", es => HammingDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash", es => SimHash64(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hamming64", es => HammingDistance64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_shingles",
      es => NGramShingles(es(0), foldableInt(es(1), "graft_shingles")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      es => MinHashSignature(es(0), foldableInt(es(1), "graft_minhash")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_lsh_bands",
      es => LshBandHashes(es(0), foldableInt(es(1), "graft_lsh_bands")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_vecsum", es => VectorSum(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_vecsum_long", es => VectorSumLong(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_fp16_encode", es => Fp16Encode(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_fp16_decode", es => Fp16Decode(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_topk",
      es => TopKSmallest(foldableInt(es(0), "graft_topk"), es(1), es(2)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nearest_centroid",
      es => NearestCentroid(es(0), foldableMatrix(es(1), "graft_nearest_centroid")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nearest_centroid2",
      es => NearestCentroidTwoLevel(es(0),
        foldableMatrix(es(1), "graft_nearest_centroid2"),
        foldableMatrix(es(2), "graft_nearest_centroid2"),
        foldableIntMatrix(es(3), "graft_nearest_centroid2"),
        foldableInt(es(4), "graft_nearest_centroid2")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_repetition", es => RepetitionStats(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nearest_cells",
      es => NearestCells(es(0), foldableMatrix(es(1), "graft_nearest_cells"),
        foldableInt(es(2), "graft_nearest_cells")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_term_counts",
      es => TermCounts(es(0), foldableStringSeq(es(1), "graft_term_counts")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_md5_prefix",
      es => Md5PrefixLong(es(0), foldableInt(es(1), "graft_md5_prefix")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_md5_prefix_str",
      es => Md5PrefixStr(es(0), foldableInt(es(1), "graft_md5_prefix_str")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_intersect_count",
      es => IntersectCardinality(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nearest_cells2",
      es => NearestCellsTwoLevel(es(0),
        foldableMatrix(es(1), "graft_nearest_cells2"),
        foldableMatrix(es(2), "graft_nearest_cells2"),
        foldableIntMatrix(es(3), "graft_nearest_cells2"),
        foldableInt(es(4), "graft_nearest_cells2"),
        foldableInt(es(5), "graft_nearest_cells2")),
      "built-in")
  }

  /** Evaluate a foldable array<array<float>> literal to a JVM matrix
    * (the centroid table baked into NearestCentroid's codegen). */
  private def foldableMatrix(e: Expression, fn: String): Array[Array[Float]] = {
    require(e.foldable, s"$fn: centroid matrix must be a literal")
    import org.apache.spark.sql.catalyst.util.ArrayData
    val outer = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { c =>
      val inner = outer.getArray(c)
      Array.tabulate(inner.numElements())(i => inner.getFloat(i))
    }
  }

  /** Evaluate a foldable array<string> literal to a Seq[String] (the
    * fixed term list baked into TermCounts). */
  private def foldableStringSeq(e: Expression, fn: String): Seq[String] = {
    require(e.foldable, s"$fn: term list must be a literal")
    import org.apache.spark.sql.catalyst.util.ArrayData
    val arr = e.eval().asInstanceOf[ArrayData]
    Seq.tabulate(arr.numElements())(i => arr.getUTF8String(i).toString)
  }

  /** Evaluate a foldable array<array<int>> literal to a JVM int matrix
    * (the super→member-cid lists of the two-level quantizer). */
  private def foldableIntMatrix(e: Expression, fn: String): Array[Array[Int]] = {
    require(e.foldable, s"$fn: member matrix must be a literal")
    import org.apache.spark.sql.catalyst.util.ArrayData
    val outer = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { g =>
      val inner = outer.getArray(g)
      Array.tabulate(inner.numElements())(i => inner.getInt(i))
    }
  }

  // Column-DSL wrappers (resolve through the active session's registry).
  def sqDist(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def norm(a: Column): Column = call_function("graft_norm", a)
  def packBits(a: Column): Column = call_function("graft_packbits", a)
  def hamming(a: Column, b: Column): Column = call_function("graft_hamming", a, b)
  def simHash(a: Column): Column = call_function("graft_simhash", a)
  def hamming64(a: Column, b: Column): Column = call_function("graft_hamming64", a, b)
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_shingles", text, lit(n))
  }
  def minHash(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_minhash", shingles, lit(numHashes))
  }
  def lshBands(sig: Column, bands: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_lsh_bands", sig, lit(bands))
  }
  def vecSum(a: Column): Column = call_function("graft_vecsum", a)
  /** One-pass fixed-term occurrence counts — see TermCounts. */
  def termCounts(toks: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.functions.typedlit
    call_function("graft_term_counts", toks, typedlit(terms))
  }
  /** Fused `conv(substring(md5(x), 1, nHex), 16, 10).cast("long")` —
    * bit-identical, see Md5PrefixLong. */
  def md5Prefix(text: Column, nHex: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_md5_prefix", text, lit(nHex))
  }
  /** Fused `substring(md5(x), 1, nHex)` — byte-identical, see
    * Md5PrefixStr. */
  def md5PrefixStr(text: Column, nHex: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_md5_prefix_str", text, lit(nHex))
  }
  def vecSumLong(a: Column): Column = call_function("graft_vecsum_long", a)
  /** Fused `size(array_intersect(a, b))` — identical count, no
    * intersection-array materialization; see IntersectCardinality. */
  def intersectCount(a: Column, b: Column): Column =
    call_function("graft_intersect_count", a, b)
  def repetition(text: Column): Column = call_function("graft_repetition", text)

  /** Bloom-filter membership probe. The filter object cannot be a SQL
    * literal, so the expression is registered (capturing the filter)
    * and resolved immediately — re-registration on the next call is
    * fine because resolution happens at analysis time. */
  def bloomMightContain(spark: SparkSession, text: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", es => BloomMightContain(es(0), bf), "built-in")
    call_function("graft_bloom_contains", text)
  }
  def fp16Encode(a: Column): Column = call_function("graft_fp16_encode", a)
  def fp16Decode(a: Column): Column = call_function("graft_fp16_decode", a)

  /** Snap every element of a float-array column to the 2^-7 grid
    * (floor(v·128 + 0.5)/128). Every multiple of 1/128 with |v| < 16
    * is exactly representable in IEEE binary16, so values snapped by
    * this helper round-trip LOSSLESSLY through the Fp16 codec — the
    * basis of the fp16 oracle queries (knn_fp16, hbin_roundtrip). Any
    * SQL mirror must use the identical floor(x*128+0.5)/128 formula. */
  def fp16Grid(a: Column): Column =
    org.apache.spark.sql.functions.transform(a, v =>
      (org.apache.spark.sql.functions.floor(v.cast("double") * 128.0 + 0.5)
        / 128.0).cast("float"))
  def topK(k: Int, ord: Column, payload: Column): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_topk", lit(k), ord, payload)
  }
  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    call_function("graft_nearest_centroid", vec,
      typedlit(centroids.map(_.toSeq).toSeq))
  }
  def nearestCentroid2(vec: Column, supers: Array[Array[Float]],
      centroids: Array[Array[Float]], members: Array[Array[Int]],
      wSuper: Int = 1): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("graft_nearest_centroid2", vec,
      typedlit(supers.map(_.toSeq).toSeq),
      typedlit(centroids.map(_.toSeq).toSeq),
      typedlit(members.map(_.toSeq).toSeq), lit(wSuper))
  }
  def nearestCells(vec: Column, centroids: Array[Array[Float]],
      nprobe: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("graft_nearest_cells", vec,
      typedlit(centroids.map(_.toSeq).toSeq), lit(nprobe))
  }
  def nearestCells2(vec: Column, supers: Array[Array[Float]],
      centroids: Array[Array[Float]], members: Array[Array[Int]],
      wSuper: Int, nprobe: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("graft_nearest_cells2", vec,
      typedlit(supers.map(_.toSeq).toSeq),
      typedlit(centroids.map(_.toSeq).toSeq),
      typedlit(members.map(_.toSeq).toSeq), lit(wSuper), lit(nprobe))
  }
}
