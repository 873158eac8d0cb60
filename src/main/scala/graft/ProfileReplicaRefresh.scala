package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, NswGraph}

/** Incremental local-replica refresh at serving scale (round-16, the
  * r14 verdict's item 6): a graph append/delete used to force a FULL
  * replica rebuild — a corpus-wide re-collect measured at 12.5–14.7 s
  * for the 5M×64 serving fixture (BENCH_scale_r14.json
  * resident_footprints.local_replica) — even when the batch touched
  * one cell. `NswGraph.refreshLocalReplica` re-reads ONLY the touched
  * cells' partition-pruned directories (ids returned by
  * `appendToGraphIndex`/`deleteFromGraphIndex`), shares every
  * untouched cell's decoded arrays with the old replica, and is
  * double-buffered (the old replica serves until the swap). This
  * harness measures, on the serving fixture:
  *
  *   - the FULL rebuild (read → servable → localReplica) — the
  *     baseline every refresh used to pay
  *   - refresh after a SINGLE-CELL append (~n/cells rows into one
  *     cid) — the steady-state trickle a serving deployment sees
  *   - refresh after a SPREAD append (rows landing across many cells)
  *     — the worst case, bounded by the rebuild
  *   - row-identity of the refreshed replica vs a fresh rebuild on a
  *     query sample (the bit-level pin lives in NswSpec; this
  *     re-checks it at scale)
  *
  * usage: runMain graft.ProfileReplicaRefresh [nVectors] [nCells]
  * (SPARK_DRIVER_MEM=48g for the 5M point, like ScaleBench.)
  */
object ProfileReplicaRefresh {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val nCells = args.lift(1).map(_.toInt).getOrElse(1024)
    val dim = 64
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

    val vecs = SynthData.mixtureVectors(spark, n, "vec_id", "embedding",
        dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    vecs.count()
    // hold out ~100K rows as the append pool; the base index covers
    // the rest (same holdout pattern as ProfileMaint)
    val base = vecs.filter($"vec_id" % 50 =!= 7)
    val pool = vecs.filter($"vec_id" % 50 === 7).limit(100000).cache()
    pool.count()
    val centroids = AnnIvf.train(
      base.sample(math.min(1.0, 200000.0 / n), 42), nCells,
      iterations = 2)
    val supers = AnnIvf.trainSupers(centroids).cache(); supers.count()
    val indexed = AnnIvf.indexTwoLevel(base, supers, centroids,
      wSuper = 4)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_prefresh").toString
    val (_, wSec) = time {
      NswGraph.writeGraphIndex(
        NswGraph.buildIndex(indexed, m = 16, efConstruction = 64),
        s"$tmp/idx")
    }
    println(f"[prefresh] n=$n cells=$nCells build+write $wSec%.1fs")

    def fullReplica(): (NswGraph.LocalReplica, Double) = time {
      val idx = NswGraph.servableIndex(
        NswGraph.readGraphIndex(spark, s"$tmp/idx"))
      try NswGraph.localReplica(idx, centroids) finally idx.unpersist()
    }
    // warm once (parquet footers, codegen), then the measured rebuild
    fullReplica()
    val (rep0, rebuildSec) = fullReplica()
    println(f"[prefresh] FULL replica rebuild: $rebuildSec%.2fs " +
      f"(${rep0.approxBytes / 1e6}%.0f MB decoded, " +
      f"${rep0.cells.length} cells)")

    // SINGLE-CELL append: the pool rows that assign to one cid —
    // under the TWO-LEVEL quantizer, the same expression
    // appendToGraphIndex routes the batch through (flat assignment
    // disagrees on boundary rows and would smear the batch)
    val assigned = AnnIvf.assignTwoLevel(pool, supers, centroids,
      wSuper = 4).cache()
    val oneCid = assigned.groupBy("cid").count()
      .orderBy(desc("count"), asc("cid")).head().getInt(0)
    val oneCell = pool.join(assigned.filter($"cid" === oneCid)
      .select("vec_id"), "vec_id").cache()
    val nOne = oneCell.count()
    val (touched1, a1Sec) = time {
      NswGraph.appendToGraphIndex(oneCell, centroids, s"$tmp/idx",
        m = 16, efConstruction = 64, supers = Some(supers), wSuper = 4)
    }
    val (rep1, r1Sec) = time {
      NswGraph.refreshLocalReplica(spark, s"$tmp/idx", rep0, touched1)
    }
    println(f"[prefresh] SINGLE-CELL append ($nOne rows -> " +
      f"${touched1.length} cell): append $a1Sec%.2fs, refresh " +
      f"$r1Sec%.3fs (${rebuildSec / r1Sec}%.0fx faster than rebuild)")

    // SPREAD append: the remaining pool rows, landing across cells
    val spread = pool.join(oneCell.select("vec_id"), Seq("vec_id"),
      "left_anti").cache()
    val nSpread = spread.count()
    val (touchedS, aSSec) = time {
      NswGraph.appendToGraphIndex(spread, centroids, s"$tmp/idx",
        m = 16, efConstruction = 64, supers = Some(supers), wSuper = 4)
    }
    val (rep2, rSSec) = time {
      NswGraph.refreshLocalReplica(spark, s"$tmp/idx", rep1, touchedS)
    }
    println(f"[prefresh] SPREAD append ($nSpread rows -> " +
      f"${touchedS.length} cells): append $aSSec%.2fs, refresh " +
      f"$rSSec%.2fs (rebuild $rebuildSec%.2fs)")

    // row-identity at scale: refreshed chain == fresh rebuild on a
    // 100-query sample (bit-level pin in NswSpec)
    val qArr = SynthData.mixtureVectors(spark, 100, "qid", "q_embedding",
      dim).select($"qid".cast("long"), $"q_embedding")
      .as[(Long, Array[Float])].collect()
    val (fresh, _) = fullReplica()
    val a = NswGraph.searchLocalQueries(rep2, qArr, 10, 4, 64)
    val b = NswGraph.searchLocalQueries(fresh, qArr, 10, 4, 64)
    require(a.toSeq == b.toSeq && a.nonEmpty,
      "refreshed replica diverged from the fresh rebuild")
    println(f"[prefresh] row-identity refreshed==fresh on 100 queries: OK")
    spark.stop()
  }
}
