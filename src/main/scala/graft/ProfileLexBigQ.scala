package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** A/B harness for the LARGE-QUERY BM25 lowerings — the lexical
  * analog of `ProfileBigQ`:
  * `runMain graft.ProfileLexBigQ [nDocs] [nQueries]`
  *
  * `bm25TopK` broadcasts the query-term relation twice (the
  * pre-aggregation prune and the scoring join) — fine for standing
  * query sets, a wall for a pipeline that scores millions of queries.
  * `bm25TopKShuffled` keeps nothing query-sized anywhere (full-corpus
  * tf + term-keyed sort-merge scoring join). This main measures what
  * the distributed lowering costs/buys at query volumes where both
  * still run locally, and asserts the two agree on a sampled subset
  * (full bit-equality is pinned in RetrievalSpec and the
  * text_bm25_bigq driver oracle). */
object ProfileLexBigQ {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val nQ = args.lift(1).map(_.toInt).getOrElse(100000)
    val vocab = 50000
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the DedupScaleBench corpus (shared generator) — ~60 tokens/doc
    // over a 50K vocabulary
    val docs = SynthData.plantedDocs(spark, n, vocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val (_, genSec) = time { docs.count() }
    println(f"[plexq] generated $n docs in $genSec%.1fs")

    // queries: every ceil(n/nQ)-th doc asks with its first 3 tokens —
    // deterministic, and the term set covers most of the vocabulary
    // (the regime where the broadcast path's prune stops helping)
    val step = math.max(1, n / nQ)
    val queries = docs.filter(col("doc_id") % step === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("q_text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nQActual = queries.count()
    println(s"[plexq] query table: $nQActual queries (3-token prefixes)")

    val (nBroadcast, bSec) = time {
      Retrieval.bm25TopK(docs, queries, k).count()
    }
    println(f"[plexq] broadcast lowering (bm25TopK):        $bSec%7.1fs " +
      f"-> $nBroadcast rows ${nQActual / bSec}%.0f q/s")

    val (nShuffled, sSec) = time {
      Retrieval.bm25TopKShuffled(docs, queries, k).count()
    }
    println(f"[plexq] shuffled lowering (bm25TopKShuffled): $sSec%7.1fs " +
      f"-> $nShuffled rows ${nQActual / sSec}%.0f q/s")

    // sampled agreement (full equality is spec/oracle-pinned)
    val sample = col("qid") % 997 === 0
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.filter(sample).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val agree = canon(Retrieval.bm25TopK(docs, queries, k)) ==
      canon(Retrieval.bm25TopKShuffled(docs, queries, k))
    println(s"[plexq] sampled agreement: $agree")
    require(agree, "lowerings disagree on the sampled subset")
    spark.stop()
  }
}
