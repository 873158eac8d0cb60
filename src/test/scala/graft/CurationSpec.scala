package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-9 curation additions: CCNet-style perplexity filtering,
  * cross-doc duplicated-n-gram coverage, DSIR importance weights,
  * SemDeDup keep-farthest-from-centroid collapse. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lmScore: hand-computed unigram add-one LM, buckets on rounded ppl") {
    val docs = Seq((1L, "a a a b"), (2L, "c")).toDF("doc_id", "text")
    // counts: a=3 b=1 c=1; N=5, V=3 -> p(a)=4/8, p(b)=p(c)=2/8
    val got = TextAnalysis.lmScore(docs, headPpl = 2.5, tailPpl = 3.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4))))
      .toMap
    val nll1 = -(3 * math.log(0.5) + math.log(0.25)) / 4.0
    assert(got(1L)._1 == 4L)
    assert(math.abs(got(1L)._2 - nll1) < 1e-6)
    assert(math.abs(got(1L)._3 - math.exp(nll1)) < 1e-4)
    assert(got(1L)._4 == "head") // ppl ~2.3784 <= 2.5
    assert(got(2L)._1 == 1L && got(2L)._3 == 4.0 && got(2L)._4 == "tail")
  }

  test("lmScore: unseen-term path scores p = 1/(N+V)") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    // score docs containing a term absent from the same-corpus LM is
    // impossible by construction (LM trained on the scored corpus);
    // the left-join path is still exercised through coalesce — pin
    // the smoothed minimum: every p >= 1/(N+V), so ppl <= N+V
    val got = TextAnalysis.lmScore(train, 1.0, 2.0).collect()
    got.foreach(r => assert(r.getDouble(3) <= 4.0 + 1e-9)) // N=2,V=2
  }

  test("crossDocNgramCoverage: dup windows, overlap counted once, zeros") {
    val docs = Seq(
      (1L, "x y z w"),   // grams: "x y","y z","z w" — "x y" is cross-doc
      (2L, "x y q"),     // grams: "x y","y q"
      (3L, "p q r"),     // no shared gram
      (4L, "x y x y")    // "x y" twice: covered = all 4 positions, once
    ).toDF("doc_id", "text")
    val cov = TextAnalysis.crossDocNgramCoverage(docs, n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(cov(1L) == ((4L, 2L, 0.5)))
    assert(cov(2L)._1 == 3L && cov(2L)._2 == 2L &&
      math.abs(cov(2L)._3 - 2.0 / 3) < 1e-5)
    assert(cov(3L) == ((3L, 0L, 0.0)))
    assert(cov(4L) == ((4L, 4L, 1.0)))
  }

  test("crossDocNgramCoverage: doc shorter than n has zero coverage") {
    val docs = Seq((1L, "a"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val cov = TextAnalysis.crossDocNgramCoverage(docs, n = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cov(1L) == 0.0 && cov(2L) == 1.0 && cov(3L) == 1.0)
  }

  test("dsirWeights: target-like docs outweigh raw-like docs; feature count") {
    val docs = Seq(
      (1L, "the cat sat", true), (2L, "the dog ran", true),
      (3L, "zz qq ww", false), (4L, "rr ss tt", false),
      (5L, "the cat ran", false), // target-like features, raw split
      (6L, "zz qq uu", false)     // raw-like
    ).toDF("doc_id", "text", "tgt")
    val w = Corpus.dsirWeights(docs, isTarget = col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // n_features = tokens + adjacent bigrams
    assert(w(1L)._1 == 5L)
    // the target-like raw doc must score above the raw-like raw doc
    assert(w(5L)._2 > w(6L)._2,
      s"target-like ${w(5L)._2} should outweigh raw-like ${w(6L)._2}")
    // determinism under repartitioning
    val again = Corpus.dsirWeights(docs.repartition(5), col("tgt"), 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == w.map { case (k, v) => k -> v._2 })
  }

  test("crossDocSpanDedup: first occurrence survives, covered spans cut") {
    val docs = Seq(
      (1L, "a b c d e"),       // keeper of "a b c"
      (2L, "x a b c y"),       // loses positions 1-3 -> "x y"
      (3L, "p q r p q r")      // within-doc repeat: "p q r" at 0 and 3
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocSpanDedup(docs, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a b c d e", 5L, 0L)))
    assert(got(2L) == (("x y", 5L, 3L)))
    assert(got(3L) == (("p q r", 6L, 3L)))
  }

  test("crossDocSpanDedup: fully-duplicated doc drops out") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.crossDocSpanDedup(docs, n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a b c")) // doc 2 vanished entirely
  }

  test("lmScoreFrozen: full vocab equals lmScore; capped vocab floors OOV") {
    val docs = Seq((1L, "a a a b"), (2L, "c")).toDF("doc_id", "text")
    val model = TextAnalysis.trainLm(docs, maxVocab = 100)
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getString(4)))).toMap
    val frozen = snap(TextAnalysis.lmScoreFrozen(docs, model, 2.5, 3.5))
    val batch = snap(TextAnalysis.lmScore(docs, 2.5, 3.5))
    frozen.keys.foreach { k =>
      assert(math.abs(frozen(k)._1 - batch(k)._1) < 1e-9)
      assert(frozen(k)._3 == batch(k)._3)
    }
    // maxVocab=1 keeps only 'a'; an unseen term scores the smoothed
    // floor 1/(N+V) = 1/8 -> ppl exactly 8
    val capped = TextAnalysis.trainLm(docs, maxVocab = 1)
    assert(capped.counts.keySet == Set("a"))
    val oov = TextAnalysis.lmScoreFrozen(
      Seq((9L, "zzz")).toDF("doc_id", "text"), capped, 1.0, 2.0).head()
    assert(math.abs(oov.getDouble(3) - 8.0) < 1e-6)
  }

  test("exactQuantiles equals the value-buffering percentile aggregate") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val qs = Seq(0.0, 0.1, 0.5, 0.95, 1.0)
    val got = Corpus.exactQuantiles(docs, "n_chars", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exp = docs.selectExpr(
      qs.zipWithIndex.map { case (q, i) =>
        s"round(percentile(n_chars, $q), 6) AS p$i"
      }: _*).head()
    qs.zipWithIndex.foreach { case (q, i) =>
      assert(math.abs(got(q) - exp.getDouble(i)) < 1e-9,
        s"q=$q got ${got(q)} expected ${exp.getDouble(i)}")
    }
    // partition-count independence
    val again = Corpus.exactQuantiles(docs.repartition(7), "n_chars", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("encodeTokens: vocab ids, UNK fallback, unkId collision guard") {
    val docs = Seq((1L, "a b z a")).toDF("doc_id", "text")
    val got = TextAnalysis.encodeTokens(docs, Map("a" -> 1, "b" -> 2))
      .head()
    assert(got.getSeq[Int](1) == Seq(1, 2, 0, 1))
    assert(got.getLong(2) == 4L && got.getLong(3) == 1L)
    intercept[IllegalArgumentException] {
      TextAnalysis.encodeTokens(docs, Map("a" -> 0))
    }
    // trainVocab ranks by count desc then term: 'a' (2 occ) gets id 1
    val v = TextAnalysis.trainVocab(docs, vocabSize = 2)
    assert(v == Map("a" -> 1, "b" -> 2))
  }

  test("dsirWeights native twin: same feature counts, deterministic") {
    val docs = Seq((1L, "a b c", true), (2L, "x y", false))
      .toDF("doc_id", "text", "tgt")
    def run(native: Boolean) =
      Corpus.dsirWeights(docs, col("tgt"), 64, nativeHash = native)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
    val p = run(false); val nv = run(true)
    // bucketing changes weights, never the feature counts
    assert(p.view.mapValues(_._1).toMap == nv.view.mapValues(_._1).toMap)
    assert(nv == Corpus.dsirWeights(docs.repartition(3), col("tgt"), 64,
      nativeHash = true).collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap)
  }

  test("semDedup: keeper is farthest-from-centroid, singletons kept") {
    val vecs = Seq(
      (1L, Array(1f, 0f)),  // near-dup pair {1,2}: cosine = 1.0
      (2L, Array(2f, 0f)),  // farther from centroid -> the keeper
      (3L, Array(0f, 5f))   // orthogonal: singleton, kept
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0, Array(0f, 0f))).toDF("cid", "centroid")
    val got = Dedup.semDedup(vecs, centroids, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((1L, 2L, 0L))) // cluster 1, keeper 2, dropped
    assert(got(2L) == ((1L, 2L, 1L))) // the keeper
    assert(got(3L) == ((3L, 3L, 1L))) // singleton keeps itself
  }

  test("semDedup: the multiprobe default finds a boundary-straddling " +
      "near-dup pair that single assignment structurally misses") {
    val vecs = Seq(
      (1L, Array(5.1f, 4.9f)), // primary cell c0, second c1
      (2L, Array(4.9f, 5.1f))  // primary cell c1, second c0 — cosine
                               // ~0.999 with vec 1, but different
                               // primary cells
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0, Array(10f, 0f)), (1, Array(0f, 10f)), (2, Array(-10f, -10f))
    ).toDF("cid", "centroid")
    // nassign = 1: the pair straddles the c0/c1 boundary — unfindable
    val single = Dedup.semDedup(vecs, centroids, threshold = 0.9,
        nassign = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(single(1L) == 1L && single(2L) == 1L) // both kept: no pair
    // the default (nassign = 2): both vectors also carry their second
    // cell, the pair shares one, the cluster forms — the 5M-measured
    // 1.64% boundary miss rate this default exists to recover
    val multi = Dedup.semDedup(vecs, centroids, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    assert(multi(1L)._1 == 1L && multi(2L)._1 == 1L) // one cluster
    assert(multi(1L)._2 + multi(2L)._2 == 1L) // exactly one keeper
  }

  test("semDedup: keeper tie at equal centroid distance breaks to min id") {
    val vecs = Seq(
      (7L, Array(3f, 0f)), (9L, Array(3f, 0f)) // identical vectors
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0, Array(0f, 0f))).toDF("cid", "centroid")
    val got = Dedup.semDedup(vecs, centroids, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(7L) == 7L && got(9L) == 7L)
  }

  test("lmScoreBigram: hand-computed add-one bigram model with <s>") {
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    // bc: (<s>,a)=2 (a,b)=3 (b,a)=1; cc: <s>=2 a=3 b=1; V=|{a,b}|=2
    val got = TextAnalysis.lmScoreBigram(docs, headPpl = 1.3,
        tailPpl = 2.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(4)))).toMap
    val nll2 = -(math.log(3.0 / 4.0) + math.log(4.0 / 5.0)) / 2.0
    assert(got(2L)._1 == 2L)
    assert(math.abs(got(2L)._2 - nll2) < 1e-6)
    // doc 2's ppl = exp(nll2) ~ 1.291 -> head at the 1.3 cutoff
    assert(got(2L)._3 == "head")
    val nll1 = -(math.log(3.0 / 4.0) + 2 * math.log(4.0 / 5.0) +
      math.log(2.0 / 3.0)) / 4.0
    assert(math.abs(got(1L)._2 - nll1) < 1e-6)
  }

  test("minKProb: hand-computed micro-nat sums of the lowest-k tokens") {
    // counts: a=3 b=1 c=1; N=5, V=3 -> p(a)=4/8, p(b)=p(c)=2/8
    val docs = Seq((1L, "a a a b"), (2L, "c")).toDF("doc_id", "text")
    val aMicro = math.round(math.log(0.5) * 1e6)       // -693147
    val bMicro = math.round(math.log(0.25) * 1e6)      // -1386294
    val got = TextAnalysis.minKProb(docs, kPct = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: sorted micros [b, a, a, a], k = ceil(4*0.5) = 2
    assert(got(1L) == ((4L, 2L, bMicro + aMicro)))
    // doc 2: single token, k = 1
    assert(got(2L) == ((1L, 1L, bMicro)))
  }

  test("cms: upper bound on every term, row sums conserve occurrences") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val sketch = TextAnalysis.cmsSketch(docs, depth = 4, width = 256).cache()
    val terms = docs
      .select(explode(TextAnalysis.whitespaceTokens(col("text"))).as("term"))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val est = TextAnalysis.cmsEstimate(sketch, exact.select("term"),
      depth = 4, width = 256)
    val joined = est.join(exact, "term")
      .select(col("term"), col("cms_count"), col("n_exact")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"CMS under-estimated ${r.getString(0)}"))
    // every hash row holds exactly one increment per occurrence
    val totalOcc = terms.count()
    val rowSums = sketch.groupBy("r").agg(sum("c").as("s"))
      .collect().map(r => r.getLong(1))
    assert(rowSums.length == 4 && rowSums.forall(_ == totalOcc))
    sketch.unpersist()
  }

  test("cms: sketches of disjoint halves merge cell-wise to the whole") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val whole = TextAnalysis.cmsSketch(docs, depth = 2, width = 128)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def half(pred: org.apache.spark.sql.Column) =
      TextAnalysis.cmsSketch(docs.filter(pred), depth = 2, width = 128)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = half(col("doc_id") % 2 === 0)
    val b = half(col("doc_id") % 2 =!= 0)
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }
}
