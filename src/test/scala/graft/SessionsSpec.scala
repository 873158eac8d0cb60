package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Corpus, Sessions, TextAnalysis}

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

  test("asof join carries the latest right row at or before each left ts") {
    // key 1: rights at t=10 (id 100), t=20 (ids 200, 201 — tie, max id
    // wins), t=40; lefts at t=5 (no match), t=20 (inclusive -> 201),
    // t=30 (carry 201), t=50 (-> 400)
    val left = Seq((1L, 5L, 90L), (1L, 20L, 91L), (1L, 30L, 92L),
      (1L, 50L, 93L), (2L, 10L, 94L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 20L, 201L),
      (1L, 40L, 400L))
      .toDF("k", "t", "rid")
    val got = AsOf.join(left, right, "k", "t",
        payload = Seq("rid"), leftKeep = Seq("lid"), rightTieCol = "rid")
      .collect() // columns: (k, t, lid, asof_rid)
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(got == Map(90L -> None, 91L -> Some(201L), 92L -> Some(201L),
      93L -> Some(400L), 94L -> None))
  }

  test("asof join is partition-count independent") {
    val e = Tables.load(spark, sf, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    val l = e.filter($"event_type" === "purchase")
    val r = e.filter($"event_type" === "view")
      .select($"user_id", $"ts_us", $"event_id".as("vid"))
    def run(lp: org.apache.spark.sql.DataFrame) =
      AsOf.join(lp, r, "user_id", "ts_us",
        payload = Seq("vid"), leftKeep = Seq("event_id"),
        rightTieCol = "vid").collect().toSet
    assert(run(l.repartition(1)) == run(l.repartition(7)))
  }

  test("vocabTopK ranks by occurrence count with doc counts") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c b"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopK(docs, k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // a: 3 occurrences in 2 docs; b and c tie at 2 -> 'b' by term asc
    assert(got.toSeq == Seq((1L, "a", 3L, 2L), (2L, "b", 2L, 2L)))
  }

  test("oovRate counts occurrences outside the top-N vocabulary") {
    val docs = Seq(
      (1L, "a a b x"),   // vocab {a, b}: 'x' oov -> 1/4
      (2L, "a c c b"),   // 'c' ties 'b' at 2 but loses the 100-cut? k=2
      (3L, "y z")        // fully oov
    ).toDF("doc_id", "text")
    // counts: a=3, c=2, b=2, x=1, y=1, z=1; top-2 = a (3), b (tie 2,
    // term asc beats c)
    val got = TextAnalysis.oovRate(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 1L, 0.25)))
    assert(got(2L) == ((4L, 2L, 0.5)))   // both c occurrences oov
    assert(got(3L) == ((2L, 2L, 1.0)))
  }

  test("asof null payload field does not blend with an older right row") {
    // right at t=10 has (a=1); right at t=20 has (a=null, b=9); the
    // carried payload must be the t=20 ROW — a=null, not a=1
    val left = Seq((1L, 30L, 90L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some(1L), Some(2L)),
      (1L, 20L, None: Option[Long], Some(9L)))
      .toDF("k", "t", "a", "b")
    val r = AsOf.join(left, right, "k", "t",
      payload = Seq("a", "b"), leftKeep = Seq("lid"), rightTieCol = "b")
      .head()
    assert(r.isNullAt(3), s"a must be null (the true match's field): $r")
    assert(r.getLong(4) == 9L)
  }

  test("sessionize matches a brute-force reference on random events") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 400).map(i =>
      (i.toLong, ts(rnd.nextInt(5000).toLong), rnd.nextInt(6).toLong))
    val gap = 300L
    val got = Sessions.sessionize(
        events.toDF("event_id", "ts", "user_id"), gap)
      .collect().map(r => (r.getLong(1)) -> (r.getLong(0), r.getLong(3)))
      .toMap // event_id -> (user_id, session_idx)
    val expected = events.groupBy(_._3).flatMap { case (uid, evs) =>
      val sorted = evs.map(e => (e._2.getTime / 1000L, e._1))
        .sortBy(identity)
      var idx = 0L; var last = Long.MinValue
      sorted.map { case (sec, eid) =>
        if (last == Long.MinValue || sec - last > gap) idx += 1
        last = sec
        eid -> (uid, idx)
      }
    }.toMap
    assert(got == expected)
  }

  test("asof matches a brute-force reference on seeded random streams") {
    val rnd = new scala.util.Random(42)
    // small key/ts domains force heavy collisions (equal ts across
    // sides, duplicate right ts, empty keys)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, i.toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, (1000 + i).toLong))
    val got = AsOf.join(left.toDF("k", "t", "lid"),
        right.toDF("k", "t", "rid"),
        "k", "t", payload = Seq("rid"), leftKeep = Seq("lid"),
        rightTieCol = "rid")
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    // brute force: per left row, the right row with max (t, rid)
    // among t <= left.t on the same key
    val expected = left.map { case (k, t, lid) =>
      val m = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (m.isEmpty) None else Some(m.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got == expected)
  }

  test("weightedMix quota is the floor of the EXACT budget x weight") {
    // 10 x 0.7: the double product is 6.999…, naive truncation gives 6
    val docs = Tables.load(spark, sf, "documents")
    val mix = Corpus.weightedMix(docs, Map("en" -> 0.7), budget = 10L)
    assert(mix.count() == 7L)
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
