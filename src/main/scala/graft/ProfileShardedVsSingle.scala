package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Knn, Recall, Serving, Sharded}

/** SAME-JVM sharded-vs-single comparator (round-18): the iso-work
  * ratio headline (K shards at np2 vs one replica at np4) was
  * measured across separate JVMs/windows in r17-r18, so host drift
  * between runs (±20% this hardware) dominates the second decimal.
  * This harness holds BOTH serving tiers in one process — the single
  * 20M flat replica (2048 cells) and its 4×5M shard twin (1024
  * cells/shard) — and measures each point INTERLEAVED A-B-A (single,
  * sharded, single again), so every ratio is bracketed by its own
  * comparator readings minutes apart on the same warm JVM.
  *
  * usage: runMain graft.ProfileShardedVsSingle [nVectors] [nShards]
  *          [nQueries] [cellsPerShard] [twolevel]
  * (single-replica cells = nShards × cellsPerShard / 2 and single
  * np = nShards × shard np / 2 — probed rows per query still match
  * exactly because the single replica's cells hold 2× the rows of a
  * shard's, so half the probes scan the same row count).
  * `twolevel` additionally measures BOTH tiers with the two-level
  * local prober (wSuper=4 — the sqrt-C argmin, the r18 lever for the
  * argmin-dominated mid bucket) as extra A-B-A points with their own
  * recalls.
  */
object ProfileShardedVsSingle {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000000)
    val nShards = args.lift(1).map(_.toInt).getOrElse(4)
    val nQ = args.lift(2).map(_.toInt).getOrElse(100000)
    val cellsPerShard = args.lift(3).map(_.toInt).getOrElse(1024)
    val twoLevel = args.lift(4).contains("twolevel")
    val npShard = 2
    val npSingle = npShard * nShards / 2 // np4 at the default shape
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

    def buildFlat(slice: org.apache.spark.sql.DataFrame, cells: Int,
        seed: Int, sampleFrac: Double)
        : (AnnIvf.LocalCellReplica, Array[Array[Float]]) = {
      val cents = AnnIvf.train(
        slice.sample(math.min(1.0, sampleFrac), seed),
        cells, iterations = 2)
      val supers = AnnIvf.trainSupers(cents)
      val cc = AnnIvf.servableCells(
        AnnIvf.indexTwoLevel(slice, supers, cents, wSuper = 4),
        attrCol = Some("rating_m"))
      cc.count()
      val r = AnnIvf.localCellReplica(cc, cents)
      cc.unpersist()
      (r, AnnIvf.collectMatrix(supers, "sid", "centroid"))
    }

    val ((single, singleSup), sSec) = time { buildFlat(data,
      nShards * cellsPerShard / 2, 44, 200000.0 / n) }
    println(f"[psvs] single replica: ${single.approxBytes / 1e6}%.0f MB, " +
      f"${single.nCells} cells ($sSec%.1fs)")
    val built = (0 until nShards).map { s =>
      val slice = data.filter(col("vec_id") % nShards === s)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      slice.count()
      val ((rep, sup), bSec) = time { buildFlat(slice, cellsPerShard,
        44 + s, 200000.0 * nShards / n) }
      slice.unpersist()
      println(f"[psvs] shard $s: ${rep.approxBytes / 1e6}%.0f MB, " +
        f"${rep.nCells} cells ($bSec%.1fs)")
      (rep, sup)
    }
    val shards = built.map(_._1)
    // two-level probers (wSuper=4): one per tier, built from each
    // quantizer's own supers/members
    val singleProber = AnnIvf.twoLevelProberLocal(singleSup,
      single.centroidMatrix,
      AnnIvf.memberLists(singleSup, single.centroidMatrix),
      wSuper = 4, nprobe = npSingle)
    val shardProbers = built.map { case (rep, sup) =>
      AnnIvf.twoLevelProberLocal(sup, rep.centroidMatrix,
        AnnIvf.memberLists(sup, rep.centroidMatrix),
        wSuper = 4, nprobe = npShard)
    }

    val qArr = queries.select(col("qid").cast("long"), col("q_embedding"))
      .as[(Long, Array[Float])].collect()
    val qSample = queries.orderBy(xxhash64(col("qid"), lit(7))).limit(200)
      .cache()
    qSample.count()
    val sampleArr = qSample.select(col("qid").cast("long"),
      col("q_embedding")).as[(Long, Array[Float])].collect()

    // warm both tiers
    Serving.serveFilteredLocalExplained(single, None, qArr.take(5000), k,
      _ < 1.561, nprobe = npSingle, selectivity = Some(0.1561))
    Sharded.serveFilteredShardedExplained(shards, None, qArr.take(5000),
      k, _ < 1.561, nprobe = npShard, selectivity = Some(0.1561))

    Seq(("mid", 0.077, 0.0077), ("high", 1.561, 0.1561)).foreach {
      case (nm, thr, sel) =>
        val pred: Double => Boolean = _ < thr
        val truth = Knn.exact(data.filter(col("rating_m") < thr),
          qSample, k).cache()
        truth.count()
        def recallOf(rows: Sharded.Rows): Double = {
          val df = spark.createDataset(rows.toSeq)
            .toDF("qid", "rank", "neighbor_id", "dist")
          val r = Recall.ofRanked(df, truth).head()
          r.getDouble(r.fieldIndex("recall"))
        }
        val rSingle = recallOf(Serving.serveFilteredLocalExplained(
          single, None, sampleArr, k, pred, nprobe = npSingle,
          selectivity = Some(sel))._2)
        val rSharded = recallOf(Sharded.serveFilteredShardedExplained(
          shards, None, sampleArr, k, pred, nprobe = npShard,
          selectivity = Some(sel))._2)
        println(f"[psvs] $nm%-4s recall@10: single np$npSingle " +
          f"$rSingle%.4f | sharded np$npShard/shard $rSharded%.4f")
        if (twoLevel) {
          val r2Single = recallOf(Serving.serveFilteredLocalExplained(
            single, None, sampleArr, k, pred, nprobe = npSingle,
            selectivity = Some(sel), proberOverride = singleProber)._2)
          val r2Sharded = recallOf(Sharded.serveFilteredShardedExplained(
            shards, None, sampleArr, k, pred, nprobe = npShard,
            selectivity = Some(sel), probers = Some(shardProbers))._2)
          println(f"[psvs] $nm%-4s recall@10 TWOLEVEL(w4): single " +
            f"$r2Single%.4f | sharded $r2Sharded%.4f")
        }
        Seq(100, 1000).foreach { bs =>
          def singlePass(): Double = ProfileStats.closedLoop(qArr, bs) {
            batch => Serving.serveFilteredLocalExplained(single, None,
              batch, k, pred, nprobe = npSingle, selectivity = Some(sel))
          }._1
          def shardedPass(): Double = ProfileStats.closedLoop(qArr, bs) {
            batch => Sharded.serveFilteredShardedExplained(shards, None,
              batch, k, pred, nprobe = npShard, selectivity = Some(sel),
              parallelShards = Some(true))
          }._1
          // A-B-A interleave: the sharded reading is bracketed by two
          // single-replica readings minutes apart on the same JVM
          val a1 = singlePass()
          val b = shardedPass()
          val a2 = singlePass()
          val aMean = (a1 + a2) / 2
          println(f"[psvs] $nm%-4s batch=$bs%5d: single $a1%9.1f / " +
            f"$a2%9.1f qps (mean $aMean%9.1f) | sharded parfan " +
            f"$b%9.1f qps | iso-work ratio ${b / aMean}%.3f")
          if (twoLevel) {
            def single2Pass(): Double = ProfileStats.closedLoop(qArr, bs) {
              batch => Serving.serveFilteredLocalExplained(single, None,
                batch, k, pred, nprobe = npSingle,
                selectivity = Some(sel), proberOverride = singleProber)
            }._1
            def sharded2Pass(): Double = ProfileStats.closedLoop(qArr, bs) {
              batch => Sharded.serveFilteredShardedExplained(shards, None,
                batch, k, pred, nprobe = npShard,
                selectivity = Some(sel), parallelShards = Some(true),
                probers = Some(shardProbers))
            }._1
            val t1 = single2Pass()
            val t = sharded2Pass()
            val t2 = single2Pass()
            val tMean = (t1 + t2) / 2
            println(f"[psvs] $nm%-4s batch=$bs%5d TWOLEVEL(w4): single " +
              f"$t1%9.1f / $t2%9.1f qps (mean $tMean%9.1f) | sharded " +
              f"parfan $t%9.1f qps | iso-work ratio ${t / tMean}%.3f | " +
              f"sharded 2lvl-vs-flat ${t / b}%.2fx")
          }
        }
        truth.unpersist()
    }
    spark.stop()
  }
}
