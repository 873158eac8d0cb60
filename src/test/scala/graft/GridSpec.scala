package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, GridSearch}

/** Grid-search runner + analytics determinism. */
class GridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private lazy val results = AnnQueries.gridResults(spark, sf)

  test("grid produces one row per pruned combo") {
    assert(results.count() == GridSearch.defaultGrid.size)
    assert(results.filter($"nprobe" > $"npartitions").count() == 0)
  }

  test("recall deterministic and monotone in nprobe per npartitions") {
    val byPart = results.select($"npartitions", $"nprobe", $"recall")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    byPart.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-9),
        s"recall not monotone: ${rows.toSeq}")
    }
    // full probe = exact
    val full = results.filter($"nprobe" === $"npartitions")
      .select($"recall").collect().map(_.getDouble(0))
    assert(full.forall(r => math.abs(r - 1.0) < 1e-9))
  }

  test("pareto frontier strictly improves recall along nprobe") {
    val f = Analytics.paretoFrontier(
      results.select($"algo", $"npartitions", $"nprobe", $"recall"),
      Seq("algo", "npartitions"), "nprobe", "recall")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
    f.values.foreach { rows =>
      val s = rows.sortBy(_._2)
      assert(s.sliding(2).forall(p => p.length < 2 || p(0)._3 < p(1)._3))
    }
  }

  test("n_candidates grows with nprobe (cost knob is real)") {
    val rows = results.filter($"npartitions" === 16)
      .select($"nprobe", $"n_candidates").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(rows.sliding(2).forall(p => p.length < 2 || p(0)._2 < p(1)._2),
      s"candidates not increasing: ${rows.toSeq}")
  }
}
