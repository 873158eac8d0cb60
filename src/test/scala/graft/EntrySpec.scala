package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry returns rows; every declared query
  * runs at sf0.001 and every oracle key has a matching query. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("all queries run at sf0.001 and return rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    // q05 (anti join) may legitimately be empty at tiny scale; all else must produce rows
    assert(empty.filterNot(_ == "q05_anti_join").isEmpty,
      s"queries with empty results: $empty")
  }
}
