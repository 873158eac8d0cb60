package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Knn, Retrieval, TextAnalysis}

/** BM25 lexical retrieval, reciprocal-rank fusion, and the binary
  * shortlist + exact re-rank path — hand-computed fixtures,
  * partitioning invariance, and exact-equivalence pins. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def bm25Ref(tf: Double, df: Double, dl: Double, n: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

  test("bm25: hand-computed scores on a three-doc corpus") {
    // corpus: d1 = "cat dog", d2 = "cat cat fish", d3 = "bird"
    // N = 3, avgdl = (2 + 3 + 1) / 3 = 2.0
    // df: cat=2, dog=1, fish=1, bird=1
    val docs = Seq((1L, "cat dog"), (2L, "cat cat fish"), (3L, "bird"))
      .toDF("doc_id", "text")
    val qs = Seq((100L, "cat fish")).toDF("qid", "q_text")
    val got = Retrieval.bm25TopK(docs, qs, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = 3.0; val avgdl = 2.0
    val d2 = BigDecimal(bm25Ref(2, 2, 3, n, avgdl) +
      bm25Ref(1, 1, 3, n, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = BigDecimal(bm25Ref(1, 2, 2, n, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d2 matches cat(tf=2) + fish(tf=1); d1 matches cat only; d3 none
    assert(got.toSeq == Seq((1L, 2L, d2), (2L, 1L, d1)))
  }

  test("bm25: repeated query terms count once (distinct-term query)") {
    val docs = Seq((1L, "cat dog"), (2L, "dog dog")).toDF("doc_id", "text")
    val once = Retrieval.bm25TopK(docs,
      Seq((9L, "dog")).toDF("qid", "q_text"), k = 2).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSet
    val twice = Retrieval.bm25TopK(docs,
      Seq((9L, "dog dog")).toDF("qid", "q_text"), k = 2).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(once == twice)
  }

  test("bm25: rank invariants and partition independence on testdata") {
    val docs = Tables.load(spark, sf, "documents")
    val qs = docs.filter(col("doc_id") % 19 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ",
          slice(TextAnalysis.whitespaceTokens(col("text")), 1, 5))
          .as("q_text"))
    val rows = Retrieval.bm25TopK(docs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val base = rows.toSet
    assert(base.nonEmpty)
    // per query: contiguous ranks 1..5, scores non-increasing, and
    // the (score desc, doc_id asc) tie-break honored. (NOT asserting
    // the probe doc wins its own prefix query: with common-word
    // prefixes, BM25's length normalization legitimately prefers
    // shorter docs containing the same terms.)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq)
      byRank.sliding(2).foreach {
        case Array((_, _, id1, s1), (_, _, id2, s2)) =>
          assert(s1 > s2 || (s1 == s2 && id1 < id2))
        case _ =>
      }
    }
    val repart = Retrieval.bm25TopK(docs.repartition(7), qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(repart == base)
  }

  test("bm25TopKShuffled equals the broadcast lowering bit-for-bit") {
    val docs = Tables.load(spark, sf, "documents")
    val qs = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ",
          slice(TextAnalysis.whitespaceTokens(col("text")), 1, 5))
          .as("q_text"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // The exact pin can in principle flap on a last-ulp midpoint: a
    // pre-rounding sum within one ulp of a 0.5e-6 rounding midpoint
    // may round differently across the two lowerings' sum orders
    // (documented at Retrieval.bm25ScoreFrozen). When the sets
    // differ, classify before failing: disagreements confined to the
    // same (qid, rank, doc) with |score delta| <= 1e-6 are a midpoint
    // flap (report, don't fail); anything else is a real lowering bug.
    def assertEquivalent(got: Set[(Long, Long, Long, Double)],
        want: Set[(Long, Long, Long, Double)], label: String): Unit = {
      if (got == want) return
      val gotByKey = got.map(t => (t._1, t._2, t._3) -> t._4).toMap
      val wantByKey = want.map(t => (t._1, t._2, t._3) -> t._4).toMap
      assert(gotByKey.keySet == wantByKey.keySet,
        s"$label: rank sets differ — a real lowering bug, not rounding: " +
          s"only-got=${(gotByKey.keySet -- wantByKey.keySet).take(5)} " +
          s"only-want=${(wantByKey.keySet -- gotByKey.keySet).take(5)}")
      val maxDelta = gotByKey.map { case (k, v) =>
        math.abs(v - wantByKey(k)) }.max
      assert(maxDelta <= 1e-6,
        s"$label: score deltas exceed the last-ulp midpoint band " +
          s"(max $maxDelta > 1e-6) — a real lowering bug, not rounding")
      info(s"$label: bit-exact pin flapped on a last-ulp rounding " +
        s"midpoint (max score delta $maxDelta <= 1e-6); ranks identical")
    }
    val broadcastPath = key(Retrieval.bm25TopK(docs, qs, k = 5))
    assert(broadcastPath.nonEmpty)
    assertEquivalent(key(Retrieval.bm25TopKShuffled(docs, qs, k = 5)),
      broadcastPath, "shuffled vs broadcast")
    // partition independence of the shuffled lowering
    assertEquivalent(key(Retrieval.bm25TopKShuffled(docs.repartition(7),
      qs.repartition(5), k = 5)), broadcastPath, "repartitioned shuffled")
  }

  test("bm25ScoreFrozen: equals the batch ranker's score relation") {
    val docs = Tables.load(spark, sf, "documents")
    val qs = docs.filter(col("doc_id") % 19 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ",
          slice(TextAnalysis.whitespaceTokens(col("text")), 1, 5))
          .as("q_text"))
    val model = Retrieval.trainBm25Frozen(docs, qs)
    val frozen = Retrieval.bm25ScoreFrozen(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // k >= corpus size -> the batch ranker emits the whole candidate
    // relation; scores must agree pairwise at the shared 6dp rounding
    val n = docs.count().toInt
    val batch = Retrieval.bm25TopK(docs, qs, k = n)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(frozen == batch)
  }

  test("trainBm25Frozen guards its driver-sized standing-query budget") {
    val docs = Tables.load(spark, sf, "documents")
    val qs = docs.filter(col("doc_id") % 19 === 0)
      .select(col("doc_id").as("qid"), col("text").as("q_text"))
    val nQs = qs.count()
    assert(nQs > 2)
    val e = intercept[IllegalArgumentException] {
      Retrieval.trainBm25Frozen(docs, qs, maxQueries = 2)
    }
    assert(e.getMessage.contains("bm25TopKShuffled"),
      "the guard must point at the distributed lowering")
    // at the budget boundary it trains normally
    assert(Retrieval.trainBm25Frozen(docs, qs, maxQueries = nQs)
      .queries.nonEmpty)
  }

  test("sifEmbed: local integer-pool replay and partition independence") {
    val docs = Seq((1L, "c r"), (2L, "c"), (3L, "c s s"))
      .toDF("doc_id", "text")
    // term vectors from the same primitive the operator uses
    val vints = Seq("c", "r", "s").toDF("term")
      .select(col("term"),
        graft.operators.Ingest.portableHashInts(col("term"), 4).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // df: c=3 r=1 s=1, N=3 -> w(c)=1e6, w(r)=w(s)=3e6
    def w(df: Long) = math.round(1000000.0 * 3.0 / df)
    def pool(terms: Seq[(String, Long)], n: Long): Seq[Float] =
      (0 until 4).map { j =>
        val s = terms.map { case (t, df) => vints(t)(j) * w(df) }.sum
        (s.toDouble / 1000000000000.0 / n.toDouble).toFloat
      }
    val expected = Map(
      1L -> pool(Seq("c" -> 3L, "r" -> 1L), 2),
      2L -> pool(Seq("c" -> 3L), 1),
      3L -> pool(Seq("c" -> 3L, "s" -> 1L, "s" -> 1L), 3))
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Retrieval.sifEmbed(d, dim = 4)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toSeq)
        .toMap
    assert(run(docs) == expected)
    assert(run(docs.repartition(5)) == expected)
  }

  test("sifEmbed: hoisted-hash + VectorSumLong plan equals the legacy " +
      "per-occurrence collect_list pooling on testdata") {
    import graft.operators.{Ingest, Retrieval, TextAnalysis}
    val docs = Tables.load(spark, sf, "documents")
    val dim = 16
    // legacy formulation (pre-round-10): per-occurrence hash vectors,
    // collect_list + zip_with fold pooling — kept here as the
    // semantic pin for the rewritten operator
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      explode(TextAnalysis.whitespaceTokens(col("text"))).as("term"))
    val dfreq = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    val legacy = toks
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"),
        transform(Ingest.portableHashInts(col("term"), dim), h =>
          h * round(lit(1000000.0) * col("_n").cast("double") /
            col("df").cast("double")).cast("long")).as("wv"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(collect_list(col("wv")),
          typedlit(Seq.fill(dim)(0L)),
          (acc, v) => zip_with(acc, v, (a, b) => a + b)).as("_pool"))
      .select(col("doc_id"), col("n_tokens"),
        transform(col("_pool"), p =>
          (p.cast("double") / 1000000000000.0 /
            col("n_tokens").cast("double")).cast("float"))
          .as("embedding"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toSeq)).toSet
    assert(key(Retrieval.sifEmbed(docs, dim)) == key(legacy))
  }

  test("sifEmbed pooling overflow is loud, not silent") {
    // the pooling aggregate must refuse to wrap: Math.addExact throws
    val overflowing = Seq((1L, Seq(Long.MaxValue)), (1L, Seq(1L)))
      .toDF("doc_id", "wv")
    val e = intercept[Exception] {
      overflowing.groupBy("doc_id")
        .agg(GraftFunctions.vecSumLong(col("wv")).as("p"))
        .collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $e")
  }

  test("sifEmbed: lowered microScale stays within float tolerance " +
      "of the default") {
    import graft.operators.Retrieval
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val a = Retrieval.sifEmbed(docs, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b = Retrieval.sifEmbed(docs, dim = 8, microScale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (id, va) =>
      va.zip(b(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= math.abs(x).max(1e-6f) * 1e-3f,
          s"doc $id: $x vs $y")
      }
    }
  }

  test("rrf: hand case with one-sided members and id tie-break") {
    // query 1: sparse ranks a=1, b=2; dense ranks b=1, c=2.
    //   b: 1/62 + 1/61;  a: 1/61;  c: 1/62  ->  order b, a, c
    val sparse = Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("qid", "rank", "doc_id")
    val dense = Seq((1L, 1L, 20L), (1L, 2L, 30L)).toDF("qid", "rank", "doc_id")
    val got = Retrieval.rrfFuse(sparse, dense, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 20L, 1.0 / 62 + 1.0 / 61),
      (2L, 10L, 1.0 / 61),
      (3L, 30L, 1.0 / 62)))
    // symmetric ranks fuse to EQUAL scores -> id asc breaks the tie
    val s2 = Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("qid", "rank", "doc_id")
    val d2 = Seq((1L, 1L, 20L), (1L, 2L, 10L)).toDF("qid", "rank", "doc_id")
    val tied = Retrieval.rrfFuse(s2, d2, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tied.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("binary rerank: total shortlist equals exact search bit-for-bit") {
    val emb = Tables.load(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("q_embedding"))
    val data = emb.filter(col("vec_id") % 50 =!= 0)
    val n = data.count().toInt
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(key(Knn.binaryRerank(data, qs, 10, nCandidates = n)) ==
      key(Knn.exact(data, qs, 10)))
  }

  test("binary rerank: shortlist is by hamming, re-rank is exact") {
    val emb = Tables.load(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("q_embedding"))
    val data = emb.filter(col("vec_id") % 100 =!= 0)
    val got = Knn.binaryRerank(data, qs, 5, nCandidates = 40)
    // declarative twin: hamming top-40 ids, then exact distances over
    // the candidate set only, re-ranked (dist, id)
    val cand = Knn.exactHamming(data, qs, 40)
      .select(col("qid"), col("neighbor_id"))
    val gathered = data
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(cand, "neighbor_id")
      .join(qs.select(col("qid"), col("q_embedding")), "qid")
    val twin = Knn.topKFrom(gathered, 5,
      Knn.distance("sqeuclidean", col("embedding"), col("q_embedding")),
      col("neighbor_id"), col("qid"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(key(got) == key(twin))
  }
}
