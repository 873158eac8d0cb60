package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Sessions, TextAnalysis}

/** Gap-based sessionization, TF-IDF ranking, and weighted-mix
  * sampling — hand-computable fixtures plus partitioning invariance. */
class SessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessionize splits on gap > threshold, per user") {
    // user 1: events at 0s, 100s, 2000s (gap 1900 > 600 -> new session)
    // user 2: single event
    val events = Seq(
      (10L, ts(0L), 1L, 1.0),
      (11L, ts(100L), 1L, 2.0),
      (12L, ts(2000L), 1L, 4.0),
      (20L, ts(50L), 2L, 8.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Sessions.sessionize(events, gapSec = 600L)
      .select($"user_id", $"event_id", $"session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L),
      (2L, 20L, 1L)))
  }

  test("sessionSummary rolls up counts, spans, and exact value totals") {
    val events = Seq(
      (10L, ts(0L), 1L, 1.5),
      (11L, ts(100L), 1L, 2.25),
      (12L, ts(2000L), 1L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Sessions.sessionSummary(events, gapSec = 600L)
      .orderBy($"session_idx")
      .select($"session_idx", $"n_events", $"duration_sec", $"sum_value")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 100L, 3.75), (2L, 1L, 0L, 4.0)))
  }

  test("sessionize is partition-count independent") {
    val events = Tables.load(spark, sf, "events")
    val a = Sessions.sessionize(events.repartition(1), 21600L)
    val b = Sessions.sessionize(events.repartition(7), 21600L)
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("tfIdf ranks rarer terms above common ones at equal tf") {
    // "rare" appears in 1 of 3 docs, "common" in all 3; doc 1 has both
    // once -> rare scores 3x common and ranks first
    val docs = Seq(
      (1L, "rare common"),
      (2L, "common other"),
      (3L, "common filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, topK = 2,
        docFilter = col("doc_id") === 1)
      .orderBy($"rank")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, "rare", 1L, 1L, 3.0),
      (2L, "common", 1L, 3L, 1.0)))
  }

  test("tfIdf tie at equal score breaks by term ascending") {
    val docs = Seq((1L, "bb aa")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, topK = 2)
      .orderBy($"rank").collect().map(_.getString(2))
    assert(got.toSeq == Seq("aa", "bb"))
  }

  test("weightedMix honors quotas and picks the stratified-rank prefix") {
    val docs = Tables.load(spark, sf, "documents")
    val weights = Map("en" -> 0.6, "de" -> 0.4)
    val mix = Corpus.weightedMix(docs, weights, budget = 20L)
    val counts = mix.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = docs.filter($"lang".isin("en", "de")).groupBy($"lang")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == math.min(12L, avail("en")))
    assert(counts("de") == math.min(8L, avail("de")))
    // quota picks are a prefix of the stratified ordering: the k-per-
    // stratum sampler over the same rank must contain every mix pick
    val strat = Corpus.stratifiedSample(docs, "lang", k = 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val picks = mix.select($"lang", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(picks.subsetOf(strat))
    // deterministic across partitioning
    val again = Corpus.weightedMix(docs.repartition(5), weights, 20L)
      .select($"lang", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == picks)
  }
}
