package graft.sources

import java.io.{DataOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed-binary vector file source/sink — SURVEY §2.1 S4.
  *
  * The reference stores matrices as `.fbin`/`.hbin`/`.ibin`/`.u8bin`
  * files: a 2×uint32 little-endian header (rows, dims) followed by the
  * row-major matrix (/root/reference/utils_grid_search.py:716-789,
  * write_bin :791-795). This module converts between that layout and
  * DataFrames, the "convert to parquet once" path the survey
  * recommends over a bespoke DataSource V2.
  *
  * Scale shape: READ parallelizes over files (one task per shard —
  * the reference's own sharding, utils.py:143-200, yields many files);
  * inside a task the decode is a single ByteBuffer sweep. WRITE is
  * `foreachPartition` — one shard per Spark partition, written from
  * the executor, no driver collect. Row ids are `base + offset` so
  * positional identity (the reference's implicit row-id-as-identity)
  * becomes an explicit stable id column.
  */
object FbinIO {

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Read a directory of `.fbin` shards (or a single file). Shards are
    * processed in lexicographic name order (the reference's sorted
    * file listing, utils_grid_search.py:378); ids are globally
    * consecutive across shards in that order. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val f = new File(path)
    val shards =
      if (f.isDirectory)
        f.listFiles((_, n) => n.endsWith(".fbin")).sortBy(_.getName)
      else Array(f)
    // header scan is driver-side (8 bytes/file) to compute id bases
    val withBases = shards.scanLeft(("", 0L, 0, 0L)) { case ((_, _, _, acc), sf) =>
      val hdr = ByteBuffer.wrap(readHeader(sf)).order(ByteOrder.LITTLE_ENDIAN)
      val rows = Integer.toUnsignedLong(hdr.getInt(0))
      val dims = hdr.getInt(4)
      (sf.getAbsolutePath, rows, dims, acc + rows)
    }.drop(1).map { case (p, rows, dims, cum) => (p, rows, dims, cum - rows) }
    spark.sparkContext
      .parallelize(withBases.toSeq, math.max(withBases.length, 1))
      .flatMap { case (file, rows, dims, base) =>
        val bytes = Files.readAllBytes(Paths.get(file))
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(8)
        val fb = bb.asFloatBuffer()
        (0L until rows).iterator.map { r =>
          val v = new Array[Float](dims)
          fb.get(v)
          (base + r, v)
        }
      }
      .toDF("vec_id", "embedding")
  }

  /** Write one `.fbin` shard per Spark partition under `dir`
    * (`part-00000.fbin`, …) plus nothing else — the header carries the
    * shape, as in the reference's write_bin. Rows are written in
    * (vec_id) order within each range partition, so the shard
    * sequence reproduces a globally sorted matrix. */
  def write(df: DataFrame, dir: String, dim: Int,
      numShards: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    Files.createDirectories(Paths.get(dir))
    val shards = if (numShards > 0) numShards
      else math.max(df.rdd.getNumPartitions, 1)
    df.select(col(idCol).cast("long"), col(vecCol))
      .repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(col(idCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.map(r =>
          r.getSeq[Float](1).toArray).toArray
        val out = new DataOutputStream(new FileOutputStream(
          new File(dir, f"part-$pid%05d.fbin")))
        try {
          val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          hdr.putInt(rows.length).putInt(dim)
          out.write(hdr.array())
          val buf = ByteBuffer.allocate(4 * dim).order(ByteOrder.LITTLE_ENDIAN)
          rows.foreach { v =>
            buf.clear()
            var i = 0
            while (i < dim) { buf.putFloat(if (i < v.length) v(i) else 0f); i += 1 }
            out.write(buf.array())
          }
        } finally out.close()
      }
  }

  private def readHeader(f: File): Array[Byte] = {
    val in = Files.newInputStream(f.toPath)
    try in.readNBytes(8) finally in.close()
  }
}
