package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Knn, NswGraph, Recall, Serving}

/** FILTERED small-batch serving point (round-14, the companion of
  * ProfileSmallBatch): the reference's actual product scenario is
  * FILTERED 100-query closed-loop batches (filter_config.yaml buckets
  * × params_config.yaml:23 batch size) — this measures
  * `Serving.serveFilteredLocalExplained` at exactly that shape, every
  * branch of the measured dispatch rule fully in-process:
  *
  *   low  bucket (keeps 83.63%) → graph over-fetch on the local
  *        unfiltered graph replica
  *   high bucket (keeps 15.61%) → resident pre-filter scan of the
  *        probed cells (IvfPrefilterResident)
  *   mid  bucket (keeps  0.77%) → exact scan over the survivors
  *        (recall 1.0 by construction; survivor list resolved once
  *        per call)
  *
  * Selectivity rides as a hint (the job-path convention for known
  * brackets — the reference's are fixed); one no-hint point records
  * the per-call counting cost. Fixture matches ScaleBench's filtered
  * section: 5M×64 mixture, rating_m on the {0, 0.001, …, 9.999} grid
  * reproducing the reference's exact selectivities, 1024 cells,
  * two-level assign, m=16/efC=64 graphs, k=10.
  *
  * usage: runMain graft.ProfileLocalFiltered [nVectors] [nQueries] [nCells]
  */
object ProfileLocalFiltered {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val nQ = args.lift(1).map(_.toInt).getOrElse(100000)
    val nCells = args.lift(2).map(_.toInt).getOrElse(1024)
    val dim = 64
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the unfiltered corpus with the reference-selectivity rating grid
    val data = SynthData.mixtureVectors(spark, n, "vec_id", "embedding", dim)
      .withColumn("rating_m",
        pmod(xxhash64(col("vec_id"), lit(888)), lit(10000))
          .cast("double") / 1000.0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val queries = SynthData.mixtureVectors(spark, nQ, "qid", "q_embedding",
      dim).cache()
    data.count(); queries.count()
    val centroids = AnnIvf.train(
      data.sample(math.min(1.0, 200000.0 / n), 44), nCells, iterations = 2)
    val indexed = AnnIvf.indexTwoLevel(data, AnnIvf.trainSupers(centroids),
      centroids, wSuper = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    indexed.count()
    val (graphRep, gSec) = time {
      val g = NswGraph.buildIndex(indexed, m = 16, efConstruction = 64)
      val s = NswGraph.servableIndex(g)
      s.count()
      val r = NswGraph.localReplica(s, centroids)
      s.unpersist()
      r
    }
    val (flatRep, fSec) = time {
      val c = AnnIvf.servableCells(indexed, attrCol = Some("rating_m"))
      c.count()
      val r = AnnIvf.localCellReplica(c, centroids)
      c.unpersist()
      r
    }
    println(f"[plf] n=$n graph build+replica $gSec%.1fs; flat " +
      f"replica $fSec%.1fs (${flatRep.size} rows, ${flatRep.nCells} cells)")

    val qArr = queries.select(col("qid").cast("long"), col("q_embedding"))
      .as[(Long, Array[Float])].collect()
    val qSample = queries.orderBy(xxhash64(col("qid"), lit(7))).limit(200)
      .cache()
    qSample.count()
    val sampleArr = qSample.select(col("qid").cast("long"),
      col("q_embedding")).as[(Long, Array[Float])].collect()

    // warm the kernels + JIT
    Serving.serveFilteredLocalExplained(flatRep, Some(graphRep),
      qArr.take(5000), k, _ < 8.363, selectivity = Some(0.8363))
    Serving.serveFilteredLocalExplained(flatRep, Some(graphRep),
      qArr.take(5000), k, _ < 1.561, selectivity = Some(0.1561))

    Seq(("low", 8.363, 0.8363), ("high", 1.561, 0.1561),
        ("mid", 0.077, 0.0077)).foreach { case (nm, thr, sel) =>
      val pred: Double => Boolean = _ < thr
      val truth = Knn.exact(data.filter(col("rating_m") < thr), qSample,
        k).cache()
      truth.count()
      // recall + dispatched branch on the sample
      val (strat, sRows) = Serving.serveFilteredLocalExplained(flatRep,
        Some(graphRep), sampleArr, k, pred, nprobe = 4, efSearch = 32,
        selectivity = Some(sel))
      val sDf = spark.createDataset(sRows.toSeq)
        .toDF("qid", "rank", "neighbor_id", "dist")
      val r = Recall.ofRanked(sDf, truth).head()
      val recall = r.getDouble(r.fieldIndex("recall"))
      Seq(100, 1000).foreach { bs =>
        val secs = (1 to 2).map { _ =>
          val (_, s) = time {
            var off = 0
            while (off < qArr.length) {
              val batch = java.util.Arrays.copyOfRange(qArr, off,
                math.min(off + bs, qArr.length))
              Serving.serveFilteredLocalExplained(flatRep, Some(graphRep),
                batch, k, pred, nprobe = 4, efSearch = 32,
                selectivity = Some(sel))
              off += bs
            }
          }
          s
        }
        val best = secs.min
        println(f"[plf] LOCAL filtered $nm%-4s (${strat.name}%-22s) " +
          f"batch=$bs%5d: ${qArr.length} queries in $best%7.3fs = " +
          f"${qArr.length / best}%9.1f qps recall@10=$recall%.4f " +
          f"(passes ${secs.map(x => f"$x%.3f").mkString("/")})")
      }
      // the no-hint cost: one call at batch=100 measuring the per-call
      // selectivity counting pass (deployments with known brackets
      // pass the hint and never pay this)
      val (_, noHint) = time {
        Serving.serveFilteredLocalExplained(flatRep, Some(graphRep),
          qArr.take(100), k, pred, nprobe = 4, efSearch = 32)
      }
      println(f"[plf]   $nm%-4s no-hint single 100-query call: " +
        f"$noHint%6.3fs (includes the one-pass attr count)")
      // the mid bucket's dial: lowering `extreme` routes the same
      // predicate to the resident PREFILTER at a wider probe set —
      // recall 1.0 is then empirical (the survivors concentrate in
      // the probed cells) instead of constructive, for ~5-10x the
      // exact scan's throughput; the measured crossover a deployment
      // chooses per bucket
      if (nm == "mid") {
        val (pStrat, pRows) = Serving.serveFilteredLocalExplained(
          flatRep, Some(graphRep), sampleArr, k, pred, nprobe = 16,
          efSearch = 32, selectivity = Some(sel), extreme = 0.001)
        val pDf = spark.createDataset(pRows.toSeq)
          .toDF("qid", "rank", "neighbor_id", "dist")
        val pr = Recall.ofRanked(pDf, truth).head()
        val pRecall = pr.getDouble(pr.fieldIndex("recall"))
        Seq(100, 1000).foreach { bs =>
          val secs = (1 to 2).map { _ =>
            val (_, s) = time {
              var off = 0
              while (off < qArr.length) {
                val batch = java.util.Arrays.copyOfRange(qArr, off,
                  math.min(off + bs, qArr.length))
                Serving.serveFilteredLocalExplained(flatRep,
                  Some(graphRep), batch, k, pred, nprobe = 16,
                  efSearch = 32, selectivity = Some(sel),
                  extreme = 0.001)
                off += bs
              }
            }
            s
          }
          val best = secs.min
          println(f"[plf] LOCAL filtered $nm%-4s (${pStrat.name}%-22s) " +
            f"np=16 batch=$bs%5d: ${qArr.length} queries in $best%7.3fs " +
            f"= ${qArr.length / best}%9.1f qps recall@10=$pRecall%.4f " +
            f"(passes ${secs.map(x => f"$x%.3f").mkString("/")})")
        }
      }
      truth.unpersist()
    }
    spark.stop()
  }
}
