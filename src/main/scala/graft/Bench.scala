package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds at the
  * target scale factor.
  *
  * Methodology: every query first runs once at the (tiny) warmup scale
  * factor so Janino-compiled codegen classes are JIT-compiled before
  * measurement — the measured numbers are steady-state engine cost,
  * not first-invocation compiler latency (the reference likewise warms
  * its search loops before timing, cuvs_bench_grid_search_v3.py:
  * 245-265). Queries are measured in sorted-name order on the target
  * SF, SPARK_GRAFT_PASSES (default 2) passes each, best-of reported —
  * this host's wall-clock varies ±3x run-to-run, and a single cold
  * sample is dominated by that noise, not engine cost. Disable warmup
  * with SPARK_GRAFT_WARMUP=0.
  *
  * Failure handling: a pass that throws is EXCLUDED from the per-query
  * min (a fast failure must not report as a fast success); a query
  * failing every pass reports -1 and its error lands in an "errors"
  * JSON field.
  *
  * Cache policy: the grid_* and ann_* packs intentionally share state
  * within their pack (one sweep / one oracle — the reference likewise
  * post-processes one CSV and computes ground truth once per run).
  * Whenever the measured query's name-prefix group changes, all spark
  * caches and the shared pack state are dropped, so caches built by
  * one query never subsidize an unrelated one and per-operator cache
  * leaks don't accumulate across the 60-query pack.
  */
object Bench {

  /** The cross-round drift factor: MEDIAN of the per-component
    * current/prior calibration-probe ratios (components where either
    * side is missing or failed, <= 0, are dropped), falling back to
    * the scalar calib ratio when no component pairs survive, and to
    * -1 when neither is available. A true median — even length
    * averages the middle pair; taking the upper-middle would bias the
    * drift factor high (r14 ADVICE; pinned in BenchSpec). */
  private[graft] def calibDrift(cur: Seq[Double], prev: Seq[Double],
      curScalar: Double, prevScalar: Double): Double = {
    val ratios = cur.zip(prev)
      .collect { case (c, p) if c > 0 && p > 0 => c / p }
    if (ratios.nonEmpty) {
      val s = ratios.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    } else if (curScalar > 0 && prevScalar > 0) curScalar / prevScalar
    else -1.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val doWarmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0" &&
      new java.io.File(warmupDir).isDirectory && warmupDir != sfDir
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=name1,name2 restricts the pack (iteration aid;
    // the driver never sets it, so recorded benches measure the full
    // pack minus the fixed exclusion list below)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    // the *_native bench twins exist to contrast the seeded-xxhash
    // lowerings with their md5-portable oracle variants; that contrast
    // is pinned in ScalaTest and recorded in BENCH_r01-r05, and their
    // ~82 chars of names are what pushes the pack's JSON line past
    // the consumer's tail window — excluded from the measured pack so
    // every remaining query keeps sub-second resolution
    // ... and the temp-dir index-IO correctness twins (*_persist,
    // ann_ivf_serve, ann_ivfpq_fixed): they re-measure the same search
    // path as ann_ivf_fixed / ann_nsw_fixed plus temp-dir parquet IO
    // (their value is the CORRECTNESS row Verify produces), and their
    // names would push the pack's line to integer-second resolution
    // ... likewise the component-coverage rows (config parse, CSV
    // round trip, category gate, error-row pass-through): pure
    // correctness surfaces whose compute is already measured by the
    // queries they borrow from
    // ... and ann_hamming_fixed (ann_nsw_fixed's graph path with the
    // hamming fine distance — the hamming cost is already measured by
    // ann_hamming_recall) and stream_dedup (its keyed-state shape is
    // measured by stream_curate)
    val benchExcluded = Set("dedup_simhash_native",
      "dedup_simhash_pairs_native", "text_winnow_native",
      "corpus_dsir_native",
      // ann_ivf_tombstone(_resident): ann_ivf_delete's side-table
      // twins — same write + serve shapes as queries already measured
      // (searchPersisted / ann_ivf_serve_resident), value is the
      // CORRECTNESS row; the masked-serve overhead is measured in the
      // scale record
      "ann_ivf_persist", "ann_ivf_delete", "ann_ivf_stats",
      "ann_ivf_tombstone", "ann_ivf_tombstone_resident",
      "ann_nsw_persist", "ann_ivf_serve",
      // ann_nsw_tombstone: ann_nsw_serve's resident shape plus
      // temp-dir IO + the mask read — value is the CORRECTNESS row
      "ann_nsw_tombstone",
      // serve_small_batch: ann_nsw_serve's build + the driver-local
      // replica serve, whose serving cost is milliseconds — the pack
      // row would re-measure the graph build; the local tier's
      // throughput is measured in the scale record (ProfileSmallBatch)
      "serve_small_batch",
      // serve_local_filtered / serve_local_mild / serve_local_tombstone:
      // the serve_auto_* / ann_nsw_tombstone fixtures through the
      // in-process dispatcher — same exclusion rationale; the local
      // tiers' throughput is measured in the scale record
      "serve_local_filtered", "serve_local_mild", "serve_local_tombstone",
      // serve_local_bitset: serve_local_filtered's id-set twin (same
      // fixture + one distributed id collect) — the id-set route's
      // throughput is measured in the scale record (ProfileLocalFiltered)
      "serve_local_bitset",
      "ann_ivfpq_fixed", "ann_ivfpq_residual", "ann_hamming_fixed",
      "stream_dedup",
      "config_grid", "csv_roundtrip", "ingest_categories", "grid_errors",
      // orc_roundtrip: jsonl_roundtrip's IO twin over the second
      // columnar format — same digest projection, value is the
      // CORRECTNESS row
      "orc_roundtrip",
      // dedup_keep_best: dedup_clusters' component closure plus one
      // max_by aggregate — the closure cost is already measured there
      "dedup_keep_best",
      // dedup_lsh_persist: dedup_minhash_lsh's persist twin (same
      // signature/band/verify compute + temp-dir parquet IO) — the
      // ann_ivf_persist exclusion policy applies verbatim
      "dedup_lsh_persist",
      // corpus_classifier: 40 sequential GD steps = 40 driver round
      // trips (~38s at sf0.1, >90% fixed per-step latency, data-size
      // independent at these sf) — its value is the CORRECTNESS row
      // pinning the whole training trajectory; the per-step shapes
      // (hash joins + map-side-combined aggregates) are measured by
      // the corpus_* and dedup_* queries
      "corpus_classifier",
      // serve_auto_mild/extreme: dispatch-branch correctness twins —
      // mild re-measures ann_nsw_fixed's graph build plus the
      // overfetch window, extreme re-measures knn_exact_mid plus an
      // unused index build; serve_auto_strong stays in-pack as the
      // dispatcher's measured representative (selectivity counts +
      // routing + the pre-filter serve)
      "serve_auto_mild", "serve_auto_extreme",
      // serve_auto_tombstone: serve_auto_strong's dispatch shape plus
      // temp-dir index IO + the mask refresh — its value is the
      // CORRECTNESS row; the masked-serve cost is measured in the
      // scale record
      "serve_auto_tombstone")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only match {
        case Some(set) => set.contains(n) // explicit ONLY wins
        case None      => !benchExcluded.contains(n)
      } }

    def group(name: String): String = name.takeWhile(_ != '_')
    def clearShared(): Unit = {
      AnnQueries.clearGridCache()
      AnnQueries.clearAnnCache()
      DedupQueries.clearPairsCache()
      spark.catalog.clearCache()
    }

    if (doWarmup) {
      queries.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count()
        catch { case _: Throwable => () }
      }
      clearShared()
    }

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left((e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("")).take(160))
      }
    }

    // WINDOW CALIBRATION: this host's wall-clock drifts by large
    // near-uniform factors between measurement windows (round 11's
    // pack total moved 1.41x with every query, including untouched
    // relational ones, moving by the same factor). One fixed,
    // never-changing query — q01_pricing_summary, a pure relational
    // scan+aggregate untouched since round 1 — is timed FIRST, best of
    // 3, and recorded as calib_sec in both JSON outputs. Comparing
    // calib_sec across rounds separates window drift (calib moves by
    // the same factor as the pack) from a real regression (pack moves,
    // calib doesn't).
    val calibSec: Double = SparkEntry.queries.get("q01_pricing_summary")
      .map { fn =>
        val samples = (1 to 3).flatMap(_ => timeOnce(fn).toOption)
        clearShared()
        if (samples.nonEmpty) samples.min else -1.0
      }.getOrElse(-1.0)
    // CALIBRATION VECTOR (round 13's lesson: one cheap scan query can
    // read ~1.0 while the pack's per-query median runs 1.13x — a
    // sub-second probe measures the scheduler floor more than the
    // sustained window). Three probes spanning the regimes the pack
    // actually exercises, each best-of-3, each a FIXED synthetic
    // independent of the pack (so they never change when queries do):
    //   scan    — q01_pricing_summary (calib_sec above, kept for
    //             cross-round continuity with r12/r13 records)
    //   shuffle — 4M-row hash groupBy into 100K keys (exchange-bound)
    //   cpu     — 20M-row sin/sqrt aggregate, no shuffle (codegen
    //             arithmetic throughput)
    // calib_vs_prev is the MEDIAN of the per-component ratios against
    // the newest PRIOR round's vector — uniform window drift moves
    // all three, a scheduler-floor artifact moves only one, so the
    // median can no longer be fooled the way the r13 scalar was.
    def bestOf3(f: => Unit): Double = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { f; (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }.filter(_ > 0)
      if (samples.nonEmpty) samples.min else -1.0
    }
    import org.apache.spark.sql.functions._
    val calibShuffle = bestOf3 {
      spark.range(4000000L)
        .select(pmod(xxhash64(col("id")), lit(100000)).as("k"), col("id"))
        .groupBy("k").agg(sum("id"), count(lit(1))).count()
    }
    val calibCpu = bestOf3 {
      spark.range(20000000L)
        .select(sum(sqrt(abs(sin(col("id") * lit(1e-7)))))).head()
    }
    val calibVec = Seq(calibSec, calibShuffle, calibCpu)
    // LONG CALIBRATION VECTOR (r16): the A/B experiment
    // (BENCH_scale_r16.json pack_calibration) showed the sub-second
    // probes above swing ±13-22% between BACK-TO-BACK runs of an
    // identical engine — spread as large as the drift they measure,
    // which is how r15's calib_vs_prev read 0.79 against a per-query
    // pack median of 1.02. These probes run SECONDS each (8-20× the
    // rows; best-of-2 — at this duration a second sample is
    // confirmation, not noise-hunting), so their spread amortizes the
    // scheduler floor the short probes sit on. Emitted alongside the
    // legacy vector (whose cross-round continuity reaches back to
    // r12); `calib_long_vs_prev` becomes load-bearing once a prior
    // round carries the long vector (-1 until then — r16 is first).
    def bestOf2(f: => Unit): Double = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { f; (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }.filter(_ > 0)
      if (samples.nonEmpty) samples.min else -1.0
    }
    // -1 when the query key is absent (r16 ADVICE): a foreach over a
    // missing key would time a no-op and record a near-zero but
    // POSITIVE wall as a valid component, silently poisoning
    // calib_long_vs_prev medians in later rounds — calibDrift's c>0
    // guard filters -1 correctly
    val calibScanLong = // 3 back-to-back q01 executions
      SparkEntry.queries.get("q01_pricing_summary") match {
        case None => -1.0
        case Some(fn) =>
          bestOf2 { (1 to 3).foreach(_ => fn(spark, sfDir).count()) }
      }
    clearShared()
    val calibShuffleLong = bestOf2 {
      spark.range(32000000L)
        .select(pmod(xxhash64(col("id")), lit(800000)).as("k"), col("id"))
        .groupBy("k").agg(sum("id"), count(lit(1))).count()
    }
    val calibCpuLong = bestOf2 {
      spark.range(400000000L)
        .select(sum(sqrt(abs(sin(col("id") * lit(1e-7)))))).head()
    }
    val calibVecLong = Seq(calibScanLong, calibShuffleLong, calibCpuLong)
    // CROSS-ROUND NORMALIZATION: the newest PRIOR round's committed
    // calibration (BENCH_r*.json) gives this window's drift factor —
    // calib_vs_prev > 1 means THIS window is slower; dividing the
    // pack total by it is the window-normalized comparison. PRIOR
    // means strictly before the round in flight: VERDICT.md's header
    // names the last judged round, so files numbered past it are THIS
    // round's own re-runs and comparing against them would read ~1.0
    // and erase the drift signal (r13 ADVICE).
    val currentRound: Int = {
      try {
        val v = new java.io.File("VERDICT.md")
        if (v.isFile) {
          val head = new String(java.nio.file.Files.readAllBytes(v.toPath),
            java.nio.charset.StandardCharsets.UTF_8).linesIterator
            .take(1).mkString
          """round\s+(\d+)""".r.findFirstMatchIn(head)
            .map(_.group(1).toInt + 1).getOrElse(Int.MaxValue)
        } else Int.MaxValue
      } catch { case _: Throwable => Int.MaxValue }
    }
    val (prevCalib: Double, prevVec: Seq[Double],
         prevVecLong: Seq[Double]) = {
      val rxScalar = """"calib_sec"\s*:\s*([0-9.]+)""".r
      val rxVec = """"calib_vec"\s*:\s*\[([^\]]*)\]""".r
      val rxVecLong = """"calib_vec_long"\s*:\s*\[([^\]]*)\]""".r
      val files = Option(new java.io.File(".").listFiles()).getOrElse(Array())
        .filter { f =>
          f.getName.matches("BENCH_r\\d+\\.json") &&
            f.getName.replaceAll("\\D", "").toInt < currentRound
        }
        .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
      files.reverseIterator.flatMap { f =>
        try {
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          def vecOf(rx: scala.util.matching.Regex): Seq[Double] =
            rx.findFirstMatchIn(text)
              .map(_.group(1).split(',').toSeq
                .map(_.trim.toDouble)).getOrElse(Seq.empty)
          rxScalar.findFirstMatchIn(text).map(_.group(1).toDouble).map(
            s => (s, vecOf(rxVec), vecOf(rxVecLong)))
        } catch { case _: Throwable => None }
      }.find(_._1 > 0)
        .getOrElse((-1.0, Seq.empty[Double], Seq.empty[Double]))
    }
    val calibVsPrev: Double =
      calibDrift(calibVec, prevVec, calibSec, prevCalib)
    // no scalar fallback: the long drift either comes from a prior
    // long vector or reads -1 (mixing in the short-probe scalar would
    // reintroduce the noise this vector exists to escape)
    val calibLongVsPrev: Double =
      calibDrift(calibVecLong, prevVecLong, -1.0, -1.0)

    // each pass is a full cold run of the pack (shared pack state and
    // spark caches dropped at every group boundary), so the per-query
    // min is a real end-to-end execution, not a cache readback
    val perPass: Seq[Map[String, Either[String, Double]]] =
      (1 to passes).map { _ =>
        val m = queries.zipWithIndex.map { case ((name, fn), i) =>
          val r = timeOnce(fn)
          val nextGroup = queries.lift(i + 1).map(q => group(q._1))
          if (!nextGroup.contains(group(name))) clearShared()
          name -> r
        }.toMap
        m
      }
    val results = queries.map { case (name, _) =>
      val samples = perPass.map(_(name))
      val ok = samples.collect { case Right(t) => t }
      val sec = if (ok.nonEmpty) ok.min else -1.0
      (name, sec, samples.collectFirst { case Left(e) => e })
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    def fmt(v: Double, dec: Int): String = {
      // trim trailing zeros ("0.30"->"0.3", "2.00"->"2") — same
      // resolution, shorter line; JSON numbers stay valid
      val s = s"%.${dec}f".format(v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val sfName = new java.io.File(sfDir).getName
    val rawErrs = results.collect { case (k, _, Some(e)) => (k, e) }
    val allErrs = rawErrs.map { case (k, e) =>
      s"\"" + k + "\":\"" + esc(e.take(120)) + "\"" }
    // FULL per-query detail goes to a repo file (the pack outgrew any
    // stdout budget at ~100 measured queries): committed alongside the
    // round artifacts, it carries what the compact line cannot
    val fullQs = results.map { case (k, v, _) =>
      s"\"" + k + "\":" + fmt(v, 2) }.mkString("{", ",", "}")
    val fullErrField =
      if (allErrs.isEmpty) "" else allErrs.mkString(",\"errors\":{", ",", "}")
    val calibVecJson = calibVec.map(fmt(_, 3)).mkString("[", ",", "]")
    val calibVecLongJson =
      calibVecLong.map(fmt(_, 3)).mkString("[", ",", "]")
    val calibFields =
      s""""calib_sec":${fmt(calibSec, 3)},"calib_vec":$calibVecJson,"calib_vs_prev":${fmt(calibVsPrev, 3)},"calib_vec_long":$calibVecLongJson,"calib_long_vs_prev":${fmt(calibLongVsPrev, 3)}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec",$calibFields,"queries":$fullQs$fullErrField,"sf":"$sfName"}"""
    try {
      val out = new java.io.PrintWriter("BENCH_full.json")
      try out.println(fullLine) finally out.close()
    } catch { case _: Throwable => () } // detail file is best-effort
    // The consumer keeps EXACTLY the last 2000 chars of stdout
    // (measured: every recorded tail is 2000 chars), and the build
    // tool's trailing success line ("[success] Total time: ...",
    // ~74 chars + newlines) eats from that window. r9's lesson: even
    // integer-resolution full maps no longer fit, and a cut line
    // parses as nothing — so the LAST stdout line is now a compact
    // digest GUARANTEED to fit: totals + the most expensive queries
    // (time desc) greedily up to a hard budget, the rest summarized
    // in an "omitted" count. The total always covers every query.
    val budget = 1400 // chars for the queries map — leaves ample slack
                      // (r16: trimmed 100 for the long-calib fields)
    val byCost = results.sortBy { case (_, v, _) => -v }
    val included = {
      var used = 2 // braces
      byCost.takeWhile { case (k, v, _) =>
        val entry = k.length + fmt(v, 2).length + 4
        if (used + entry <= budget) { used += entry; true } else false
      }
    }
    val compactQs = included
      .map { case (k, v, _) => s"\"" + k + "\":" + fmt(v, 2) }
      .mkString("{", ",", "}")
    // compact error field: truncate the RAW message before escaping
    // and quoting (a .take on the finished fragment could drop the
    // closing quote or cut an escape sequence mid-way — the compact
    // line must parse precisely when a query errored)
    val errField = if (rawErrs.isEmpty) ""
      else rawErrs.take(1)
        .map { case (k, e) => s"\"" + k + "\":\"" + esc(e.take(60)) + "\"" }
        .mkString(",\"errors\":{", ",", "}")
    val omitted = results.length - included.length
    val line =
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec",$calibFields,"queries":$compactQs,"omitted":$omitted,"n_queries":${results.length}$errField,"sf":"$sfName"}"""
    // stdout carries ONLY the compact line: a >2000-char full line
    // would leave a truncated JSON fragment in the tail window ahead
    // of it (the full detail lives in BENCH_full.json)
    println(line)
    spark.stop()
  }
}
