package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Memory accounting for the RESIDENT serving tiers
  * (`AnnIvf.servableCells`, `NswGraph.servableIndex`).
  *
  * Why this exists: a resident tier pins the DECODED corpus as
  * deserialized JVM objects. `MEMORY_ONLY` on an object RDD silently
  * EVICTS under pressure and recomputes through the lineage on the
  * next touch — at serving scale that is the worst failure mode: no
  * error, but every eviction re-pays the full decode inside a latency-
  * sensitive query. So the build estimates the decoded footprint
  * up front (rows × dim × 4 bytes of floats + per-row structure
  * overhead) against the executors' free storage memory and:
  *
  *  - fits comfortably (≤ `safetyFraction` of free storage) →
  *    `MEMORY_ONLY`, the intended resident contract;
  *  - does not fit → `MEMORY_AND_DISK` with a LOUD warning — spilled
  *    blocks are read back from local disk instead of recomputed
  *    (bounded, predictable degradation), and the operator tells you
  *    to size executors up or shrink the tier.
  *
  * Callers that know better pass `storage = Some(level)` and skip the
  * estimate entirely. The decision function is pure and unit-tested
  * apart from the engine (ResidentSpec); `cachedBytes` reports the
  * tier's ACTUAL footprint after materialization for the scale
  * record's decoded-size accounting.
  */
object Resident {

  /** Free driver-heap bytes for the local-replica build guards,
    * measured AFTER a GC hint: right after an index build's Spark
    * jobs the heap is full of uncollected garbage and the
    * instantaneous reading under-reports free memory by whole
    * gigabytes (measured: a 48 GB driver read 8.5 GB free and
    * spuriously refused a 6.4 GB replica an identical session had
    * just built with headroom). One System.gc() is cheap relative to
    * the once-per-build collect it guards, and a guard that can fail
    * on garbage is not a guard on occupancy. */
  private[operators] def freeHeapAfterGc(): Long = {
    System.gc()
    val rt = Runtime.getRuntime
    rt.maxMemory() - (rt.totalMemory() - rt.freeMemory())
  }

  /** Free storage memory summed across EXECUTORS. The raw
    * `getExecutorMemoryStatus` map includes the driver's block
    * manager; in cluster mode the driver caches no tier partitions,
    * so counting its headroom would inflate the budget and let
    * `chooseLevel` pick MEMORY_ONLY for a tier that does not fit on
    * the executors — re-creating the silent eviction-recompute the
    * guard exists to prevent. The driver entry is excluded whenever
    * any other block manager is registered; in local mode the driver
    * IS the executor and its entry is the budget. (The sum still
    * assumes partitions spread ~evenly; a pathologically skewed tier
    * can overfill one executor while the sum says it fits — the 0.7
    * safety margin in `chooseLevel` absorbs moderate skew, and
    * callers with known-skewed tiers should pass an explicit
    * `storage` level.) */
  def freeStorageBytes(spark: SparkSession): Long = {
    val status = spark.sparkContext.getExecutorMemoryStatus
    val driverKey =
      try org.apache.spark.SparkEnv.get.blockManager.blockManagerId.hostPort
      catch { case scala.util.control.NonFatal(_) => null }
    executorFreeBytes(status.toMap, driverKey)
  }

  /** The pure budget fold (unit-tested apart from the engine): sum
    * free storage over non-driver entries; if the driver is the ONLY
    * block manager (local mode), its budget is the budget. */
  private[graft] def executorFreeBytes(
      status: Map[String, (Long, Long)], driverKey: String): Long = {
    val execs = status.filter { case (k, _) => k != driverKey }
    val useful = if (execs.nonEmpty) execs else status
    useful.values.map(_._2).foldLeft(0L)(_ + _)
  }

  /** Decoded footprint of a flat vector tier: per row one long id,
    * one int cid, dim floats, optionally one double attr; plus a
    * per-row share of array-object overhead (the ragged fallback
    * stores one Array[Float] object per row — 16B header + 8B
    * reference dominate the non-flat shape, so the estimate charges
    * them always, erring safe). */
  def estimateFlatBytes(rows: Long, dim: Int, withAttrs: Boolean): Long = {
    val perRow = 8L + 4L + 4L * dim + (if (withAttrs) 8L else 0L) + 24L
    rows * perRow
  }

  /** Decoded footprint of a CSR graph tier: the flat-vector estimate
    * plus 4 bytes per adjacency edge and 4 per CSR offset. */
  def estimateGraphBytes(rows: Long, dim: Int, edges: Long): Long =
    estimateFlatBytes(rows, dim, withAttrs = false) + 4L * edges + 4L * rows

  /** The pure guard decision: MEMORY_ONLY iff the estimate fits in
    * `safetyFraction` of free storage (the margin covers the object
    * headers/JVM slack the estimate cannot see), else MEMORY_AND_DISK.
    * `freeBytes <= 0` (no executor registered yet) falls back to
    * MEMORY_AND_DISK — the safe default when the budget is unknown. */
  def chooseLevel(estBytes: Long, freeBytes: Long,
      safetyFraction: Double = 0.7): StorageLevel =
    if (freeBytes > 0 && estBytes <= (freeBytes * safetyFraction).toLong)
      StorageLevel.MEMORY_ONLY
    else StorageLevel.MEMORY_AND_DISK

  /** `chooseLevel` against the live session, with the loud warning
    * the fallback contract requires. Returns (level, estBytes). */
  private[operators] def autoLevel(spark: SparkSession, estBytes: Long,
      what: String): StorageLevel = {
    val free = freeStorageBytes(spark)
    val level = chooseLevel(estBytes, free)
    if (level != StorageLevel.MEMORY_ONLY)
      println(s"[graft] $what: decoded tier estimate " +
        s"${estBytes / (1 << 20)} MiB exceeds the resident budget " +
        s"(${(free * 0.7).toLong / (1 << 20)} MiB = 70% of free storage " +
        s"memory $free B) — persisting MEMORY_AND_DISK; spilled blocks " +
        "re-read from local disk instead of re-decoding. Size executor " +
        "storage memory to the decoded corpus for full resident speed, " +
        "or pass storage = Some(level) to override.")
    level
  }

  /** ACTUAL cached footprint of a materialized RDD (memory + disk
    * bytes and the partition counts), from the block-manager's
    * storage info — the number the scale record reports next to qps.
    * Returns (memBytes, diskBytes, cachedPartitions, totalPartitions). */
  def cachedBytes(rdd: org.apache.spark.rdd.RDD[_])
      : (Long, Long, Int, Int) =
    rdd.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
      .map(i => (i.memSize, i.diskSize, i.numCachedPartitions,
        rdd.getNumPartitions))
      .getOrElse((0L, 0L, 0, rdd.getNumPartitions))
}
