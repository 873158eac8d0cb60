package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Dedup}

/** SemDeDup at scale with PLANTED boundary near-dups: measures the
  * single-assign vs multi-probe embedding near-dup pass at the 5M
  * shape (r12 verdict task 5 — `dedup_embed_multiprobe` existed only
  * at pack scale).
  *
  * Corpus: the shared seeded mixture vectors plus one planted TWIN for
  * every 50th base row (twin = base + a small deterministic
  * perturbation, cosine ≈ 0.9999 — far above the natural same-cluster
  * similarity of ~0.94, so a high threshold isolates the planted
  * pairs). Twin ids are base id + n, making recovery countable
  * exactly: a planted pair is recovered iff (id, id + n) appears in
  * the output.
  *
  * What the multi-probe point shows: a twin this close still lands in
  * its leader's cell MOST of the time, but a fraction of leaders sit
  * near a cell boundary where the perturbation flips the argmin —
  * those pairs are missed BY CONSTRUCTION at nassign=1 and recovered
  * at nassign=2 (each row assigned to its 2 nearest cells; a
  * straddling pair shares at least one). Work grows ~nassign²/C per
  * candidate pair; both passes stay bucketed — never all-pairs.
  *
  * usage: runMain graft.SemDedupScale [nBase] [nCells] [threshold]
  * (SPARK_DRIVER_MEM=48g, run alone like ScaleBench)
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nCells = args.lift(1).map(_.toInt).getOrElse(16384)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.995)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = SynthData.mixtureVectors(spark, n, "vec_id", "embedding")
    // deterministic twin: +-0.005 per dimension, hash-signed — tiny
    // against the ~4.8 vector norm, so cos(base, twin) ~ 0.99998
    val twins = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + n).as("vec_id"),
        transform(col("embedding"),
          (x, j) => (x + (pmod(xxhash64(col("vec_id"), j, lit(99)),
            lit(1001L)).cast("double") / 500.0 - 1.0) * 0.005f)
            .cast("float")).as("embedding"))
    val corpus = base.unionByName(twins)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nPlanted = n / 50
    val (nRows, genSec) = time { corpus.count() }
    println(f"[sdscale] corpus $nRows rows ($nPlanted planted twin " +
      f"pairs) in $genSec%.1fs")

    val (centroids, trainSec) = time {
      val c = AnnIvf.train(
        corpus.sample(math.min(1.0, 400000.0 / n), 42), nCells,
        iterations = 1)
      c.count(); c
    }
    println(f"[sdscale] trained $nCells centroids in $trainSec%.1fs")

    def recovered(pairs: org.apache.spark.sql.DataFrame): Long =
      pairs.filter(col("id_b") === col("id_a") + n &&
        col("id_a") % 50 === 0).count()

    val (single, singleSec) = time {
      val p = Dedup.embeddingNearPairsBucketed(corpus, centroids,
        threshold).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      p.count(); p
    }
    val singlePairs = single.count()
    val singleRec = recovered(single)
    println(f"[sdscale] single-assign: $singleSec%.1fs -> $singlePairs " +
      f"pairs, planted recovered $singleRec/$nPlanted " +
      f"(${100.0 * singleRec / nPlanted}%.2f%%)")
    single.unpersist()

    val (multi, multiSec) = time {
      val p = Dedup.embeddingNearPairsMultiProbe(corpus, centroids,
        threshold, nassign = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      p.count(); p
    }
    val multiPairs = multi.count()
    val multiRec = recovered(multi)
    println(f"[sdscale] multi-probe nassign=2: $multiSec%.1fs -> " +
      f"$multiPairs pairs, planted recovered $multiRec/$nPlanted " +
      f"(${100.0 * multiRec / nPlanted}%.2f%%); boundary pairs " +
      f"recovered over single-assign: ${multiRec - singleRec} " +
      f"(work ratio measured ${multiSec / singleSec}%.2fx, " +
      f"nassign^2 bound 4x)")
    multi.unpersist()
    spark.stop()
  }
}
