package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming shapes: the windowed streaming aggregation must agree
  * with its batch twin (q15) when the stream is fully drained. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("streaming windowed counts == batch windowed counts") {
    val stream = StreamingOps.readEventStream(spark, sf)
    assert(stream.isStreaming)
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .select($"hour_epoch", $"event_type", $"n").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.load(spark, sf, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp($"hour"), $"event_type", $"n").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static join enriches streamed rows") {
    val stream = StreamingOps.readEventStream(spark, sf)
      .select($"event_id", $"user_id", $"event_type")
    val dim = Seq(("click", 1.0), ("view", 0.5)).toDF("event_type", "weight")
    val q = StreamingOps.streamStaticJoin(stream, dim, "event_type")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("enriched").count()
      val expected = Tables.load(spark, sf, "events")
        .filter($"event_type".isin("click", "view")).count()
      assert(n == expected)
    } finally q.stop()
  }
}
