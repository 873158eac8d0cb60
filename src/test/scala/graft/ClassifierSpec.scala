package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

/** Integer-quantized logistic-regression training: distributed GD
  * must equal a local replay exactly, improve on the prior, and be
  * partitioning-independent. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def half(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Local replay of the integer-quantized full-batch GD. */
  private def refTrain(feats: Seq[(Long, Long, Long, Long)], n: Long,
      steps: Int, lr: Double): Map[Long, Long] = {
    var w = Map.empty[Long, Long]
    for (_ <- 1 to steps) {
      val z = feats.groupBy(f => (f._1, f._2)).map { case ((d, y), fs) =>
        (d, y, fs.map(f => f._4 * w.getOrElse(f._3, 0L)).sum)
      }
      val r = z.map { case (d, y, zm) =>
        d -> (half(1.0 / (1.0 + math.exp(-(zm.toDouble / 1000000.0)))
          * 1000000.0) - y * 1000000L)
      }.toMap
      val g = feats.groupBy(_._3).map { case (b, fs) =>
        b -> fs.map(f => f._4 * r(f._1)).sum
      }
      w = w ++ g.map { case (b, gm) =>
        b -> (w.getOrElse(b, 0L) - half(gm.toDouble * lr / n))
      }
    }
    w
  }

  private def markerGate: org.apache.spark.sql.Column = {
    val markers = graft.operators.TextAnalysis.langMarkers
      .toMap.apply("en")
    size(filter(split(col("text"), " "),
      x => x.isin(markers: _*))) >= 3
  }

  test("trainLogistic equals the local integer-GD replay exactly") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Classifier.trainLogistic(docs, markerGate, buckets = 64,
      steps = 5, lr = 0.2)
    // rebuild the feature relation locally with the same md5 buckets
    val feats = docs
      .select(col("doc_id"), markerGate.cast("long").as("y"),
        explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"), col("y"),
        (conv(substring(md5(col("term")), 1, 13), 16, 10).cast("long")
          % 64).as("bucket"))
      .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("x"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val expected = refTrain(feats, docs.count(), steps = 5, lr = 0.2)
    assert(got == expected)
  }

  test("training separates the classes and is partition-independent") {
    val docs = Tables.load(spark, sf, "documents")
    val model = Classifier.trainLogistic(docs, markerGate,
      buckets = 256, steps = 40, lr = 0.05)
    val scored = Classifier.logisticScore(docs, model, markerGate)
    val n = scored.count()
    val nCorrect = scored.filter(col("correct") === 1L).count()
    val majority = math.max(docs.filter(markerGate).count(),
      docs.filter(!markerGate).count())
    // 40 GD steps must beat always-guess-majority by a real margin
    assert(nCorrect > majority, s"$nCorrect correct of $n")
    val model2 = Classifier.trainLogistic(docs.repartition(7),
      markerGate, buckets = 256, steps = 40, lr = 0.05)
    assert(model2 == model)
  }

  test("sampled training: deterministic pick set, near-full accuracy") {
    val docs = Tables.load(spark, sf, "documents")
    val full = Classifier.trainLogistic(docs, markerGate,
      buckets = 256, steps = 40, lr = 0.05)
    val sampled = Classifier.trainLogistic(docs, markerGate,
      buckets = 256, steps = 40, lr = 0.05, sampleBudget = Some(250))
    // determinism: the md5-rank sample must not depend on layout
    val sampled2 = Classifier.trainLogistic(docs.repartition(7),
      markerGate, buckets = 256, steps = 40, lr = 0.05,
      sampleBudget = Some(250))
    assert(sampled2 == sampled)
    // a budget >= the corpus degenerates to full-batch exactly
    val all = Classifier.trainLogistic(docs, markerGate,
      buckets = 256, steps = 40, lr = 0.05,
      sampleBudget = Some(docs.count().toInt + 10))
    assert(all == full)
    // accuracy delta: full-corpus scoring with the sampled model must
    // be within 10 points of the full-batch model's accuracy (stated
    // delta for a 256-parameter model trained on 250 docs)
    def acc(m: Map[Long, Long]): Double = {
      val scored = Classifier.logisticScore(docs, m, markerGate)
      scored.filter(col("correct") === 1L).count().toDouble /
        scored.count()
    }
    val (af, as) = (acc(full), acc(sampled))
    assert(as >= af - 0.10, s"sampled acc $as vs full acc $af")
  }
}
