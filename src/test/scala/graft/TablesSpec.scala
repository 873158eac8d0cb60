package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events.ts unit normalization (Tables.eventsTsPlan): the
  * generator has written TIMESTAMP(NANOS) in some rounds and
  * TIMESTAMP(MICROS) in others, and both vintages must load to the
  * same µs timestamps, batch and stream. The current testdata carries
  * µs (covered by every events query + SessionsSpec); the ns branch is
  * pinned here against a fixture whose ts column reads back as LONG —
  * the exact shape the nanosAsLong reader flag produces for ns files.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("eventsTsPlan: LONG-typed ts (the TIMESTAMP(NANOS) vintage) is ns -> µs integer-divided") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_ns").toString
    // 1.7e18 ns-scale values: `/` double division would land up to
    // ~256 ns off (53-bit mantissa), so an exactness check at this
    // magnitude pins the integer `div`
    val ns = 1700000000123456789L
    Seq((1L, ns, 7L, "click", 1.0, "{}"),
      (2L, ns + 999L, 7L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val (forced, toMicros) = Tables.eventsTsPlan(spark, dir)
    assert(forced("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    val got = spark.read.schema(forced).parquet(s"$dir/events.parquet")
      .withColumn("us", unix_micros(timestamp_micros(toMicros)))
      .select("event_id", "us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === ns / 1000L)
    assert(got(2L) === (ns + 999L) / 1000L) // truncation, not rounding
  }

  test("eventsTsPlan: the shipped testdata (µs vintage) round-trips raw int64 micros") {
    val sf = TestSpark.sf
    val (forced, toMicros) = Tables.eventsTsPlan(spark, sf)
    assert(forced("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    // batch loader vs a direct forced-long read must agree exactly
    val viaLoad = Tables.load(spark, sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val direct = spark.read.schema(forced).parquet(s"$sf/events.parquet")
      .select(col("event_id"), toMicros.as("us"))
    assert(viaLoad.exceptAll(direct).isEmpty && direct.exceptAll(viaLoad).isEmpty)
  }
}
