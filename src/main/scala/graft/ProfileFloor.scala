package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, NswGraph}

/** Decompose the resident graph serve's PER-CALL floor at the 5M
  * shape: the beam kernels themselves account for ~0.04 core-adjusted
  * seconds of a measured ~0.66 s beam stage (ProfileBeam: ~60 µs/beam
  * at ef=32 × 20K beams / 32 threads), so most of the call is
  * something else. Time each layer separately:
  *
  *   empty    — schedule 32 tasks over the cached RDD, do nothing
  *   iterate  — consume the partition iterators (cache readback)
  *   bcast    — + fetch the broadcast probe struct per task
  *   beams    — + run every beam, discard results (no DataFrame)
  *   beams+df — the real servablePartialsProbed (adds toDF encoding)
  *   full     — + the topKFrom merge (the complete serve call)
  *
  * usage: runMain graft.ProfileFloor [nVectors] [nQueries] [nCells]
  */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val nQ = args.lift(1).map(_.toInt).getOrElse(10000)
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pfloor] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }

    val data = SynthData.mixtureVectors(spark, n, "vec_id", "embedding", dim)
      .withColumn("rating",
        (pmod(xxhash64(col("vec_id"), lit(777)), lit(10)) / 2.0))
      .filter(col("rating") < 4.0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val queries = SynthData.mixtureVectors(spark, nQ, "qid", "q_embedding",
      dim).cache()
    data.count(); queries.count()
    val centroids = AnnIvf.train(
      data.sample(math.min(1.0, 200000.0 / n), 42), nCells, iterations = 2)
    val indexed = AnnIvf.indexTwoLevel(data, AnnIvf.trainSupers(centroids),
      centroids, wSuper = 4)
    val graphs = NswGraph.buildIndex(indexed, m = 16, efConstruction = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    graphs.count()
    val servable = NswGraph.servableIndex(graphs)
    servable.count()

    val probed = NswGraph.probeQueries(centroids, queries, 2)
    // warm every layer once
    servable.foreachPartition(_ => ())
    NswGraph.searchServableProbed(servable, probed, k, 32).count()

    (1 to 3).foreach { i =>
      time(s"empty 32-task job #$i") {
        servable.sparkContext.runJob(servable,
          (_: Iterator[NswGraph.ServableCell]) => 0)
      }
      time(s"iterate cached partitions #$i") {
        servable.map(_.cid).count()
      }
      locally {
        val bc = spark.sparkContext.broadcast(probed)
        time(s"iterate + broadcast fetch #$i") {
          servable.mapPartitions { it =>
            val p = bc.value
            Iterator.single(it.size + p.length)
          }.count()
        }
        bc.destroy()
      }
      time(s"beams only, results discarded #$i") {
        NswGraph.servableBeamCount(servable, probed, k, 32)
      }
      time(s"beams + toDF (partials stage) #$i") {
        NswGraph.servablePartialsProbed(servable, probed, k, 32).count()
      }
      time(s"full serve (partials + merge) #$i") {
        NswGraph.searchServableProbed(servable, probed, k, 32).count()
      }
    }
    spark.stop()
  }
}
