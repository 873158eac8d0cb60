package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism restorer for CPU-heavy narrow pipelines over small
  * inputs (r20 optimization round).
  *
  * A parquet scan smaller than one input split is ONE task, and every
  * downstream narrow stage (explode + hash + aggregate-partial chains)
  * then serializes on a single core — profiled at sf0.1: corpus_dsir
  * ran 38 tasks with taskTime ≈ wall (zero effective parallelism,
  * ~11 s of single-core md5/conv work over a 584 KB file). A parquet
  * file with one row group cannot be split by the reader, so
  * files.maxPartitionBytes / minPartitionNum cannot help; the only way
  * to spread the work is an explicit round-robin exchange.
  *
  * Scale guard: the repartition happens ONLY when the optimizer's size
  * estimate says the whole relation is below one default split
  * (spark.sql.files.maxPartitionBytes) — i.e. exactly the regime
  * where the scan degenerates to ~1 task. At 100 TB the estimate is
  * far past the threshold and this is the identity, so no corpus-sized
  * shuffle is ever introduced. The exchanged bytes are by construction
  * sub-split-sized.
  *
  * Result invariance: callers apply this only where row-to-partition
  * placement cannot affect output — per-row expressions, per-doc
  * aggregates whose groups ride one input row (explode keeps a row's
  * children in its partition), and integer/order-free sums. The
  * oracle pack re-verifies every such query.
  */
object Spread {
  def cpu(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val threshold = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size <= threshold)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }
}
