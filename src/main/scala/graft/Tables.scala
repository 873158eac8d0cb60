package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table access for the driver-generated testdata
  * (TESTDATA.md). All engine queries read through here so the parquet
  * scan options stay consistent (vectorized reader, pushdown on).
  *
  * The reference loads its vector table from sharded .npy files
  * (/root/reference/utils_grid_search.py:342-420); the Spark-native
  * equivalent is a columnar parquet scan with column pruning and
  * predicate pushdown handled by Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which the Spark parquet
    // reader rejects by default; read nanos as long and convert. The
    // ns -> µs step MUST be integer division: `/` on longs is double
    // division, and ~1.7e18 ns exceeds a double's 53-bit exact range,
    // so it lands up to ~256 ns off and can flip the µs (observed as
    // an off-by-one against the DuckDB oracle).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
  }

  /** Register all engine functions and return a loader bound to `dir`.
    * Called at the top of every SparkEntry query so the functions are
    * available regardless of which session the driver hands us. */
  def bound(spark: SparkSession, dir: String): String => DataFrame = {
    GraftFunctions.register(spark)
    name => load(spark, dir, name)
  }
}
