package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale techniques: salted skew joins and bucketed co-located joins.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of rows share one key — the classic hot-key shape
    val large = spark.range(20000)
      .select($"id",
        when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999L)).as("k"))
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "v")
    val plain = large.join(small, "k").select($"id", $"v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(large, small, "k", "id", 8)
      .select($"id", $"v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.size == 20000)
  }

  test("salt spreads a hot key across reducers") {
    val large = spark.range(1000).select($"id", lit(7L).as("k"))
    val saltCounts = Skew.withSalt(large, "id", 8)
      .groupBy($"_salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "hot key must land in all salt buckets")
    assert(saltCounts.max < 1000, "no single bucket holds everything")
  }

  test("bucketed tables join without an exchange") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val sf = TestSpark.sf
    Tables.load(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.load(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b").join(spark.table("orders_b"),
      $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the sort-merge join reads both bucketed layouts with
    // no shuffle exchange in the plan
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    val expected = Tables.load(spark, sf, "lineitem").join(
      Tables.load(spark, sf, "orders"),
      $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("knn handles empty inputs without failure") {
    val data = SparkEntry.dataDf(spark, TestSpark.sf)
    val queries = SparkEntry.queriesDf(spark, TestSpark.sf)
    // empty data side -> zero result rows, not an error
    val emptyData = graft.operators.Knn.exact(
      data.filter(lit(false)), queries, 10)
    assert(emptyData.count() == 0)
    // empty query side -> zero result rows
    val emptyQ = graft.operators.Knn.exact(
      data, queries.filter(lit(false)), 10)
    assert(emptyQ.count() == 0)
  }
}
