package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Knn, Recall, Serving, Sharded}

/** FILTERED multi-shard serving point (round-17, the companion of
  * ProfileSharded): the reference's filtered product scenario served
  * through K per-shard ATTR-BUILT flat replicas — the pre-filter
  * (strong) and exact (extreme) dispatch branches fanned per shard
  * and merged per query (`Sharded.serveFilteredShardedExplained`).
  * Fixture matches ProfileLocalFiltered (rating_m on the reference's
  * selectivity grid, hinted selectivity, k=10), so the single-replica
  * bucket rows measured there are the direct comparators. No graph
  * shards here: the mid/high buckets dispatch to the flat tier; the
  * low bucket's graph branch is covered by the unfiltered sharded
  * profile + the single-replica filtered rows.
  *
  * Both fan shapes are measured per point: SEQUENTIAL (the honest
  * one-box total-work number) and PARFAN (K threads — the in-process
  * approximation of the deployment's parallel fan-out; identical
  * rows, ShardedSpec).
  *
  * usage: runMain graft.ProfileShardedFiltered [nVectors] [nShards]
  *          [nQueries] [cellsPerShard] [nprobes]
  * `nprobes` = comma list of per-shard nprobe dials (default "4,2" —
  * np4 matches the single replica's recall class at 2x its probed
  * rows; np2 is the iso-scan-work dial: K shards x np2 cells of n/K/C
  * rows = the single replica's np4 x n/C' row budget).
  */
object ProfileShardedFiltered {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000000)
    val nShards = args.lift(1).map(_.toInt).getOrElse(4)
    val nQ = args.lift(2).map(_.toInt).getOrElse(100000)
    val cellsPerShard = args.lift(3).map(_.toInt).getOrElse(1024)
    val nprobes: Seq[Int] = args.lift(4)
      .map(_.split(',').toSeq.map(_.toInt)).getOrElse(Seq(4, 2))
    // "ablate" (r18): also measure each point with the cross-shard
    // bound warming DISABLED (the graft.noSharedBounds property — the
    // r17 cold-bounds behavior) back-to-back in the SAME JVM, so the
    // warming's effect separates from host window drift. Rows are
    // identical either way (ShardedSpec pure-pruning pin).
    val ablate = args.lift(5).contains("ablate")
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
    // this profile measures EXPLICITLY pinned probers (flat vs
    // two-level as separate shapes) — keep the r19 auto dial out
    // of its baselines
    graft.operators.Serving.autoTwoLevelEnabled = false
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val data = SynthData.mixtureVectors(spark, n, "vec_id", "embedding", dim)
      .withColumn("rating_m",
        pmod(xxhash64(col("vec_id"), lit(888)), lit(10000))
          .cast("double") / 1000.0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val queries = SynthData.mixtureVectors(spark, nQ, "qid", "q_embedding",
      dim).cache()
    data.count(); queries.count()

    val flatShards = (0 until nShards).map { s =>
      val slice = data.filter(col("vec_id") % nShards === s)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val sliceN = slice.count()
      val (rep, buildSec) = time {
        val cents = AnnIvf.train(
          slice.sample(math.min(1.0, 200000.0 * nShards / n), 44 + s),
          cellsPerShard, iterations = 2)
        val cells = AnnIvf.servableCells(
          AnnIvf.indexTwoLevel(slice, AnnIvf.trainSupers(cents), cents,
            wSuper = 4),
          attrCol = Some("rating_m"))
        cells.count()
        val r = AnnIvf.localCellReplica(cells, cents)
        cells.unpersist()
        r
      }
      slice.unpersist()
      println(f"[pshardf] shard $s: $sliceN rows, flat replica " +
        f"$buildSec%.1fs (${rep.approxBytes / 1e6}%.0f MB, " +
        f"${rep.nCells} cells)")
      rep
    }
    println(f"[pshardf] total flat decoded across $nShards shards: " +
      f"${flatShards.map(_.approxBytes).sum / 1e6}%.0f MB")

    val qArr = queries.select(col("qid").cast("long"), col("q_embedding"))
      .as[(Long, Array[Float])].collect()
    val qSample = queries.orderBy(xxhash64(col("qid"), lit(7))).limit(200)
      .cache()
    qSample.count()
    val sampleArr = qSample.select(col("qid").cast("long"),
      col("q_embedding")).as[(Long, Array[Float])].collect()

    def measureLoop(bs: Int)(call: Array[(Long, Array[Float])] => Unit)
        : (Double, Double, Double) = ProfileStats.closedLoop(qArr, bs)(call)

    // warm
    Sharded.serveFilteredShardedExplained(flatShards, None,
      qArr.take(5000), k, _ < 1.561, nprobe = 4, efSearch = 32,
      selectivity = Some(0.1561))

    Seq(("high", 1.561, 0.1561), ("mid", 0.077, 0.0077)).foreach {
      case (nm, thr, sel) =>
        val pred: Double => Boolean = _ < thr
        val truth = Knn.exact(data.filter(col("rating_m") < thr),
          qSample, k).cache()
        truth.count()
        nprobes.foreach { np =>
          val (strat, sRows) = Sharded.serveFilteredShardedExplained(
            flatShards, None, sampleArr, k, pred, nprobe = np,
            efSearch = 32, selectivity = Some(sel))
          val df = spark.createDataset(sRows.toSeq)
            .toDF("qid", "rank", "neighbor_id", "dist")
          val rr = Recall.ofRanked(df, truth).head()
          val recall = rr.getDouble(rr.fieldIndex("recall"))
          // sanity: sharded parfan == sharded sequential on the sample
          val (_, pRows) = Sharded.serveFilteredShardedExplained(
            flatShards, None, sampleArr, k, pred, nprobe = np,
            efSearch = 32, selectivity = Some(sel),
            parallelShards = Some(true))
          require(pRows.toSeq == sRows.toSeq, "parfan diverged")
          Seq(100, 1000).foreach { bs =>
            val (sQps, sAvg, sP99) = measureLoop(bs) { batch =>
              Sharded.serveFilteredShardedExplained(flatShards, None,
                batch, k, pred, nprobe = np, efSearch = 32,
                selectivity = Some(sel), parallelShards = Some(false))
            }
            val (pQps, pAvg, pP99) = measureLoop(bs) { batch =>
              Sharded.serveFilteredShardedExplained(flatShards, None,
                batch, k, pred, nprobe = np, efSearch = 32,
                selectivity = Some(sel), parallelShards = Some(true))
            }
            println(f"[pshardf] SHARDED filtered $nm%-4s np$np " +
              f"(${strat.name}%-22s) batch=$bs%5d: seq $sQps%9.1f qps " +
              f"(lat $sAvg%.2f/$sP99%.2f) | parfan $pQps%9.1f qps " +
              f"(lat $pAvg%.2f/$pP99%.2f) recall@10=$recall%.4f")
            if (ablate) {
              System.setProperty("graft.noSharedBounds", "1")
              try {
                val (nQps, nAvg, nP99) = measureLoop(bs) { batch =>
                  Sharded.serveFilteredShardedExplained(flatShards, None,
                    batch, k, pred, nprobe = np, efSearch = 32,
                    selectivity = Some(sel), parallelShards = Some(false))
                }
                val (npQps, _, _) = measureLoop(bs) { batch =>
                  Sharded.serveFilteredShardedExplained(flatShards, None,
                    batch, k, pred, nprobe = np, efSearch = 32,
                    selectivity = Some(sel), parallelShards = Some(true))
                }
                println(f"[pshardf] NOBOUNDS filtered $nm%-4s np$np " +
                  f"batch=$bs%5d: seq $nQps%9.1f qps " +
                  f"(lat $nAvg%.2f/$nP99%.2f) | parfan $npQps%9.1f qps " +
                  f"(warm-vs-cold seq ${sQps / nQps}%.2fx " +
                  f"parfan ${pQps / npQps}%.2fx)")
              } finally System.clearProperty("graft.noSharedBounds")
            }
          }
        }
        truth.unpersist()
    }
    spark.stop()
  }
}
