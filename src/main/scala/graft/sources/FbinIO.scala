package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Fp16

/** Typed-binary vector file source/sink — SURVEY §2.1 S4.
  *
  * The reference stores matrices as typed binary files: a 2×uint32
  * little-endian header (rows, dims) followed by the row-major matrix,
  * with the element dtype carried by the file extension —
  * `.fbin` float32, `.hbin` float16, `.ibin` int32, `.u8bin` uint8,
  * `.i8bin` int8 (/root/reference/utils_grid_search.py:716-789
  * dtype_from_filename/memmap_bin_file, write_bin :791-795). This
  * module converts between that layout and DataFrames — the "convert
  * to parquet once" path the survey recommends over a bespoke
  * DataSource V2. Float dtypes surface as ARRAY<FLOAT> (`.hbin`
  * decodes through the same IEEE binary16 codec as the Fp16
  * expressions); integral dtypes surface as ARRAY<INT> (Spark has no
  * unsigned types — `.u8bin` values land as 0..255 ints).
  *
  * All IO goes through the Hadoop FileSystem API, so paths resolve
  * against any configured filesystem (local, `hdfs://`, object
  * stores) — executors never assume a shared POSIX mount.
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

  /** Element dtypes, keyed by the reference's file suffixes. */
  sealed abstract class Dtype(val suffix: String, val itemBytes: Int,
      val integral: Boolean)
  case object F32 extends Dtype(".fbin", 4, integral = false)
  case object F16 extends Dtype(".hbin", 2, integral = false)
  case object I32 extends Dtype(".ibin", 4, integral = true)
  case object U8 extends Dtype(".u8bin", 1, integral = true)
  case object I8 extends Dtype(".i8bin", 1, integral = true)

  val dtypes: Seq[Dtype] = Seq(F32, F16, I32, U8, I8)

  /** utils_grid_search.py:716-730 dtype_from_filename. */
  def dtypeFromName(name: String): Dtype =
    dtypes.find(d => name.endsWith(d.suffix)).getOrElse(
      throw new IllegalArgumentException(s"unsupported extension: $name"))

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  private def fileSystem(path: String): FileSystem =
    new HPath(path).getFileSystem(new Configuration())

  /** Read a directory of typed-binary shards (or a single file); the
    * dtype comes from the file extension. Shards are processed in
    * lexicographic name order (the reference's sorted file listing,
    * utils_grid_search.py:378); ids are globally consecutive across
    * shards in that order. Output: (vec_id LONG, embedding
    * ARRAY<FLOAT> | ARRAY<INT>). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = fileSystem(path)
    val p = new HPath(path)
    val shardPaths: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => dtypes.exists(d => f.getName.endsWith(d.suffix)))
          .sortBy(_.getName).map(_.toString).toSeq
      else Seq(p.toString)
    require(shardPaths.nonEmpty, s"no typed-binary shards under $path")
    val dts = shardPaths.map(dtypeFromName).distinct
    require(dts.length == 1, s"mixed dtypes under $path: $dts")
    val dt = dts.head
    // header scan is driver-side (8 bytes/file) to compute id bases
    val withBases = shardPaths.scanLeft(("", 0L, 0, 0L)) {
      case ((_, _, _, acc), sp) =>
        val in = fs.open(new HPath(sp))
        val hb = try in.readNBytes(8) finally in.close()
        val hdr = ByteBuffer.wrap(hb).order(ByteOrder.LITTLE_ENDIAN)
        val rows = Integer.toUnsignedLong(hdr.getInt(0))
        val dims = hdr.getInt(4)
        (sp, rows, dims, acc + rows)
    }.drop(1).map { case (sp, rows, dims, cum) => (sp, rows, dims, cum - rows) }
    val rdd = spark.sparkContext
      .parallelize(withBases, math.max(withBases.length, 1))
      .map { case (file, rows, dims, base) =>
        val hp = new HPath(file)
        val efs = hp.getFileSystem(new Configuration())
        val in = efs.open(hp)
        val bytes = try in.readAllBytes() finally in.close()
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(8)
        (rows, dims, base, bb)
      }
    if (dt.integral)
      rdd.flatMap { case (rows, dims, base, bb) =>
        (0L until rows).iterator.map { r =>
          val v = new Array[Int](dims)
          var i = 0
          dt match {
            case I32 => val ib = bb.asIntBuffer()
              ib.position((r * dims).toInt)
              ib.get(v)
            case U8 => while (i < dims) {
              v(i) = bb.get(8 + (r * dims).toInt + i) & 0xff; i += 1 }
            case I8 => while (i < dims) {
              v(i) = bb.get(8 + (r * dims).toInt + i).toInt; i += 1 }
            case _ => throw new IllegalStateException
          }
          (base + r, v)
        }
      }.toDF("vec_id", "embedding")
    else
      rdd.flatMap { case (rows, dims, base, bb) =>
        (0L until rows).iterator.map { r =>
          val v = new Array[Float](dims)
          var i = 0
          dt match {
            case F32 => val fb = bb.asFloatBuffer()
              fb.position((r * dims).toInt)
              fb.get(v)
            case F16 => val sb = bb.asShortBuffer()
              while (i < dims) {
                v(i) = Fp16.fromHalf(sb.get((r * dims).toInt + i)); i += 1 }
            case _ => throw new IllegalStateException
          }
          (base + r, v)
        }
      }.toDF("vec_id", "embedding")
  }

  /** Write one typed-binary shard per Spark partition under `dir`
    * (`part-00000<suffix>`, …) — the header carries the shape, as in
    * the reference's write_bin. Rows are written in (vec_id) order
    * within each range partition, so the shard sequence reproduces a
    * globally sorted matrix. Float dtypes expect ARRAY<FLOAT> input
    * (`.hbin` encodes through the Fp16 codec, round-to-nearest-even);
    * integral dtypes expect ARRAY<INT> (values are truncated to the
    * dtype's low bits, as numpy astype does). */
  def write(df: DataFrame, dir: String, dim: Int,
      numShards: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dtype: Dtype = F32): Unit = {
    fileSystem(dir).mkdirs(new HPath(dir))
    val shards = if (numShards > 0) numShards
      else math.max(df.rdd.getNumPartitions, 1)
    val dt = dtype
    val elemCast = if (dt.integral) "array<int>" else "array<float>"
    df.select(col(idCol).cast("long"), col(vecCol).cast(elemCast))
      .repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(col(idCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val shard = new HPath(dir, f"part-$pid%05d${dt.suffix}")
        val out = shard.getFileSystem(new Configuration()).create(shard, true)
        try {
          val rows = (if (dt.integral) it.map(_.getSeq[Int](1).toArray)
            else it.map(_.getSeq[Float](1).toArray)).toArray
          val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          hdr.putInt(rows.length).putInt(dim)
          out.write(hdr.array())
          val buf = ByteBuffer.allocate(dt.itemBytes * dim)
            .order(ByteOrder.LITTLE_ENDIAN)
          rows.foreach { v =>
            buf.clear()
            var i = 0
            while (i < dim) {
              (dt, v) match {
                case (F32, fv: Array[Float]) =>
                  buf.putFloat(if (i < fv.length) fv(i) else 0f)
                case (F16, fv: Array[Float]) =>
                  buf.putShort(Fp16.toHalf(if (i < fv.length) fv(i) else 0f))
                case (I32, iv: Array[Int]) =>
                  buf.putInt(if (i < iv.length) iv(i) else 0)
                case (U8, iv: Array[Int]) =>
                  buf.put((if (i < iv.length) iv(i) else 0).toByte)
                case (I8, iv: Array[Int]) =>
                  buf.put((if (i < iv.length) iv(i) else 0).toByte)
                case _ => throw new IllegalStateException
              }
              i += 1
            }
            out.write(buf.array())
          }
        } finally out.close()
      }
  }
}
