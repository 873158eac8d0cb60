package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Sub-stage timing of the MinHash-LSH dedup pass at the
  * DedupScaleBench corpus scale (perf triage for the 2M+ bottleneck —
  * the full-pipeline number alone can't say whether signatures, the
  * band self-join, or the verify join dominates).
  *
  * Usage: runMain graft.ProfileLsh [nDocs]
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val vocab = 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[plsh] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    // the DedupScaleBench corpus (shared generator — cannot drift)
    val docs = SynthData.plantedDocs(spark, n, vocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    time("generate")(docs.count())

    val withSh = docs.select(col("doc_id"),
      Dedup.shinglesOf(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    time("shingles (cache build)")(withSh.count())

    val sig = withSh
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 128).as("sig"))
      .cache()
    time("minhash signatures (cache build)")(sig.count())

    // the pipeline's own collapse stage (shared helper — cannot drift)
    val groups = Dedup.sigCollapseGroups(sig).cache()
    time("sig-collapse groups (cache build)")(groups.count())

    val reps = sig.join(
      groups.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    val banded = Dedup.bandHashes(reps, 128, 64).cache()
    time("band hashes over reps (cache build)")(banded.count())

    val repCands = Dedup.candidatesOf(banded).cache()
    val nrc = time("rep-candidate bucket pairs + distinct")(repCands.count())
    println(s"[plsh] rep candidates: $nrc")

    val cross = repCands
      .join(groups.select(col("rep").as("doc_a"), col("members").as("ms_a")), "doc_a")
      .join(groups.select(col("rep").as("doc_b"), col("members").as("ms_b")), "doc_b")
      .select(explode(col("ms_a")).as("a"), col("ms_b"))
      .select(col("a"), explode(col("ms_b")).as("b"))
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"))
    val within = groups.filter(size(col("members")) > 1)
      .select(col("members").as("ids"))
      .select(explode(Dedup.pairsOfSorted(col("ids"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    val candidates = cross.unionByName(within).cache()
    val nc = time("expansion (cross + within)")(candidates.count())
    println(s"[plsh] candidates: $nc")

    val candIds = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id")))
      .distinct()
    val shSets = withSh.select(col("doc_id"), col("sh"))
      .join(candIds, Seq("doc_id"), "left_semi")
      .cache()
    time("verify-side semi-join (cache build)")(shSets.count())

    val verified = candidates
      .join(shSets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shSets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= 0.7)
    val np = time("verify join (exact jaccard)")(verified.count())
    println(s"[plsh] verified pairs: $np")
    spark.stop()
  }
}
