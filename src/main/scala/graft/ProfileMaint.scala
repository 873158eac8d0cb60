package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AnnIvf

/** Wall-clock for the persisted-index MAINTENANCE ops at serving
  * scale: build a clustered index over n synthetic vectors, then time
  * append (one micro-batch), compact (fold the append files), delete
  * (a retraction batch), and stats — the lifecycle a long-lived
  * serving deployment runs continuously. The claim under test: every
  * op touches ONLY the cells its batch lands in, so cost tracks the
  * batch (cells touched × cell size), not the corpus.
  *
  * Usage: runMain graft.ProfileMaint [n] [cells] [batch]
  * (SPARK_DRIVER_MEM=48g for the 5M point, like ScaleBench.)
  */
object ProfileMaint {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val cells = args.lift(1).map(_.toInt).getOrElse(2048)
    val batch = args.lift(2).map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pmaint] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val dim = 64
    val vecs = SynthData.mixtureVectors(spark, n, "vec_id", "embedding",
        dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    vecs.count()
    val base = vecs.filter($"vec_id" % 100 =!= 7) // hold out the append batch
    val appendBatch = vecs.filter($"vec_id" % 100 === 7)
      .limit(batch).cache()
    val nAppend = appendBatch.count()

    val centroids = time(s"train ($cells cells)") {
      val c = AnnIvf.train(base.sample(math.min(1.0, 200000.0 / n), 42),
        numCentroids = cells, iterations = 2).cache()
      c.count(); c
    }
    // two-level assignment past 512 cells, like ScaleBench (and the
    // same parity contract for the append batch)
    val supers =
      if (cells >= 512) Some(AnnIvf.trainSupers(centroids).cache())
      else None
    supers.foreach(_.count())
    def assigned(df: org.apache.spark.sql.DataFrame) =
      supers.fold(AnnIvf.index(df, centroids))(sup =>
        AnnIvf.indexTwoLevel(df, sup, centroids))
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint").toString
    time(s"build + clustered write ($n rows)") {
      AnnIvf.writeIndex(assigned(base), s"$tmp/idx")
    }
    val touchedByAppend = time(f"append ($nAppend rows)") {
      AnnIvf.appendToIndex(appendBatch, centroids, s"$tmp/idx",
        supers = supers)
    }
    // the hinted cycle: append's returned cells feed compaction
    // directly, so candidate discovery never walks the full tree
    val folded = time(
      s"compact (hinted, ${touchedByAppend.length} candidate cells)") {
      AnnIvf.compactIndex(spark, s"$tmp/idx",
        cells = Some(touchedByAppend.toSeq))
    }
    println(s"[pmaint]   cells folded: $folded")
    // LOCALIZED retraction (the realistic shape — one source's docs
    // cluster into few cells): every id of 20 small cells, run BOTH
    // ways on disjoint cell sets in the same window. Unhinted pays
    // the corpus-wide (cid, id) discovery scan; the cid-hint path
    // (the documented retraction default — streamingIndexDelete
    // plumbs it) reads only the named cells, so its cost must track
    // the touched fraction with no full-scan floor.
    val smallCells = spark.read.parquet(s"$tmp/idx")
      .groupBy($"cid").count().orderBy($"count", $"cid")
      .limit(40).collect().map(_.getInt(0))
    val (cellsPlain, cellsHint) = smallCells.splitAt(20)
    val localIds = spark.read.parquet(s"$tmp/idx")
      .filter($"cid".isin(cellsPlain.toSeq: _*)).select($"vec_id").cache()
    val nLocal = localIds.count()
    val nDelL = time(f"delete localized unhinted ($nLocal ids, 20 cells)") {
      AnnIvf.deleteFromIndex(spark, s"$tmp/idx", localIds)
    }
    println(s"[pmaint]   rows deleted (localized unhinted): $nDelL")
    val hintIds = spark.read.parquet(s"$tmp/idx")
      .filter($"cid".isin(cellsHint.toSeq: _*))
      .select($"cid", $"vec_id").cache()
    val nHint = hintIds.count()
    val nDelH = time(f"delete localized cid-hinted ($nHint ids, 20 cells)") {
      AnnIvf.deleteFromIndex(spark, s"$tmp/idx", hintIds)
    }
    println(s"[pmaint]   rows deleted (localized hinted): $nDelH")
    // then the SPREAD worst case: a uniform batch touches ~every cell,
    // so the rewrite degenerates to corpus-sized — the honest bound
    val delIds = appendBatch.select($"vec_id").cache()
    delIds.count()
    val nDel = time(f"delete spread ($nAppend ids, ~all cells)") {
      AnnIvf.deleteFromIndex(spark, s"$tmp/idx", delIds)
    }
    println(s"[pmaint]   rows deleted (spread): $nDel")
    // TOMBSTONE alternative for the same spread shape (VERDICT r11
    // task 7): recording the batch is O(batch) — no cell rewritten,
    // no term scaling with total cells — and the masked serve pays
    // one broadcast anti-join; the physical fold happens later at
    // compaction where its full pass is amortized over every batch
    val tombIds = vecs.filter($"vec_id" % 100 === 9)
      .limit(batch).select($"vec_id").cache()
    val nTombIds = tombIds.count()
    val nTomb = time(f"tombstone spread ($nTombIds ids, ~all cells)") {
      AnnIvf.tombstone(spark, s"$tmp/idx", tombIds)
    }
    println(s"[pmaint]   ids tombstoned: $nTomb")
    val queries = SynthData.mixtureVectors(spark, 1000, "qid",
      "q_embedding", dim).cache()
    queries.count()
    (1 to 2).foreach { i =>
      time(s"searchPersisted masked (1000 q, nprobe=4) #$i") {
        AnnIvf.searchPersisted(spark, s"$tmp/idx", centroids, queries,
          10, nprobe = 4).count()
      }
    }
    (1 to 2).foreach { i =>
      time(s"searchPersisted no-mask (1000 q, nprobe=4) #$i") {
        AnnIvf.searchPersisted(spark, s"$tmp/idx", centroids, queries,
          10, nprobe = 4, honorTombstones = false).count()
      }
    }
    val nFold = time(f"foldTombstones ($nTombIds ids)") {
      AnnIvf.foldTombstones(spark, s"$tmp/idx")
    }
    println(s"[pmaint]   rows folded out: $nFold")
    // r13: the LARGE-ACCUMULATION fold. The side-table is the union
    // of every batch since the last fold — past `broadcastLimit`
    // (default 1M ids) foldTombstones routes through
    // deleteFromIndexShuffled: shuffle-join discovery + aggregate
    // counts, nothing id-set-sized broadcast or collected per cell.
    // A/B on DISJOINT 1.2M-id accumulations in one window: the auto
    // (shuffled) route vs the broadcast+collect_set fast-path forced
    // past its contract.
    val bigA = vecs.filter($"vec_id" % 4 === 1).limit(1200000)
      .select($"vec_id").cache()
    val nBigA = bigA.count()
    time(f"tombstone $nBigA ids (accumulation A)") {
      AnnIvf.tombstone(spark, s"$tmp/idx", bigA)
    }
    val nFoldA = time("foldTombstones 1.2M (auto -> shuffled)") {
      AnnIvf.foldTombstones(spark, s"$tmp/idx")
    }
    println(s"[pmaint]   rows folded (shuffled route): $nFoldA")
    val bigB = vecs.filter($"vec_id" % 4 === 2).limit(1200000)
      .select($"vec_id").cache()
    val nBigB = bigB.count()
    time(f"tombstone $nBigB ids (accumulation B)") {
      AnnIvf.tombstone(spark, s"$tmp/idx", bigB)
    }
    val nFoldB = time("foldTombstones 1.2M (forced broadcast)") {
      AnnIvf.foldTombstones(spark, s"$tmp/idx",
        broadcastLimit = Long.MaxValue)
    }
    println(s"[pmaint]   rows folded (broadcast route): $nFoldB")
    val stats = time("stats (column-pruned scan + FS listing)") {
      AnnIvf.indexStats(spark, s"$tmp/idx")
        .agg(sum($"n_rows"), max($"n_files"), count(lit(1))).head()
    }
    println(s"[pmaint]   rows=${stats.getLong(0)} maxFiles=${stats.getLong(1)} " +
      s"cells=${stats.getLong(2)}")
    spark.stop()
  }
}
