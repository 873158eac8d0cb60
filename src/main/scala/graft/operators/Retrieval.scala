package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Lexical and hybrid retrieval over the document corpus: Okapi BM25
  * top-k and reciprocal-rank fusion of two rankers.
  *
  * The reference serves pure dense retrieval (filtered vector search,
  * cuvs_bench_grid_search_v3.py); a production training-data /
  * retrieval pipeline pairs that dense tier with a lexical BM25 tier
  * and fuses the two rankings (hybrid search). Both operators here
  * are deterministic and SQL-oracle-reproducible.
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval (Robertson et al., TREC-3): for each
    * query, the `k` highest-scoring documents under
    *
    *   score(q, d) = sum over distinct query terms t of
    *     ln(1 + (N - df + 0.5) / (df + 0.5)) *
    *     tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    *
    * Determinism/portability: the per-(query, doc) score is rounded
    * to 6dp BEFORE ranking (the `domainCap` pattern), so the top-k
    * cut and tie-break (score desc, doc_id asc) cannot flap between
    * engines on last-ulp sum-order differences.
    *
    * Scale design (100 TB): term statistics reduce through map-side-
    * combined hash aggregates — (doc, term) tf partials, then per-term
    * df totals. The corpus-sized tf relation is pruned by a BROADCAST
    * join with the (small, by contract) query-term table before any
    * further work; per-term df for the matched vocabulary and the
    * 1-row corpus stats also broadcast. The only shuffle after the tf
    * aggregate carries matched (qid, doc) partial scores into the
    * per-query bounded-heap top-k (`graft_topk` — q × k rows out, no
    * window sort over all candidates).
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text",
      qidCol: String = "qid",
      qtextCol: String = "q_text"): DataFrame = {
    require(k > 0, s"bm25TopK: k must be positive, got $k")
    GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextAnalysis.whitespaceTokens(col(textCol)).as("_toks"))
    val tf = toks
      .select(col("doc_id"), size(col("_toks")).cast("double").as("_dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      // _dl is functionally dependent on doc_id, so first() is exact
      .agg(count(lit(1)).cast("double").as("tf"), first(col("_dl")).as("dl"))
    val qterms = queries.select(col(qidCol).cast("long").as("qid"),
      explode(array_distinct(TextAnalysis.whitespaceTokens(col(qtextCol))))
        .as("term"))
    // df over the FULL corpus vocabulary, then pruned to the matched
    // terms so the relation that reaches the score join is
    // query-sized, not vocabulary-sized
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .join(broadcast(qterms.select("term").distinct()), "term")
    // N and avgdl folded in as a broadcast 1-row aggregate (integer
    // sums — engine-exact); an eager count() here would launch a
    // separate corpus scan at DataFrame-construction time
    val stats = toks.agg(count(lit(1)).cast("double").as("_n"),
      (sum(size(col("_toks")).cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("_avgdl"))
    // IEEE-commutativity note: the SQL oracle writes `k1 * (...)` and
    // `b * dl`; Column's arithmetic only takes Doubles on the right,
    // so the factors are flipped here — multiplication is commutative
    // in IEEE, the doubles are bit-identical
    val termScore =
      log(lit(1.0) + (col("_n") - col("df") + 0.5) / (col("df") + 0.5)) *
        col("tf") * (k1 + 1.0) /
        (col("tf") +
          (lit(1.0 - b) + col("dl") * b / col("_avgdl")) * k1)
    val scored = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(termScore), 6).as("score"))
    scored
      .groupBy(col("qid"))
      .agg(GraftFunctions.topK(k, -col("score"), col("doc_id")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "nn")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("nn.id").as("doc_id"), (-col("nn.dist")).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two rank
    * lists: fused(q, d) = Σ_lists 1 / (kRrf + rank(q, d)), summed over
    * the lists that contain d; top-`k` per query by (fused desc, id).
    *
    * Both inputs are (qid, rank, id-col) relations — the shape every
    * ranker in this engine emits (`Knn.exact`, `bm25TopK`,
    * `AnnIvf.search*`). With exactly two rankers the fused score is
    * ONE IEEE addition of two exact divisions — bit-identical across
    * engines, so no rounding is needed anywhere.
    *
    * Scale design (100 TB): inputs are already top-N-per-query (q × N
    * rows, not corpus-sized); the fusion is one co-keyed full-outer
    * join on (qid, id) and the final cut is the bounded-heap top-k —
    * no window over the corpus, nothing broadcast-unsafe.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      k: Int,
      kRrf: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"rrfFuse: k must be positive, got $k")
    require(kRrf > 0, s"rrfFuse: kRrf must be positive, got $kRrf")
    GraftFunctions.register(a.sparkSession)
    def side(df: DataFrame, rank: String) = df.select(
      col("qid").cast("long").as("qid"),
      col(idCol).cast("long").as("id"),
      col("rank").cast("long").as(rank))
    val fused = side(a, "rank_a")
      .join(side(b, "rank_b"), Seq("qid", "id"), "full_outer")
      .select(col("qid"), col("id"),
        (coalesce(lit(1.0) / (col("rank_a") + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / (col("rank_b") + kRrf), lit(0.0))).as("rrf"))
    fused
      .groupBy(col("qid"))
      .agg(GraftFunctions.topK(k, -col("rrf"), col("id")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "nn")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("nn.id").as(idCol), (-col("nn.dist")).as("rrf_score"))
  }
}
