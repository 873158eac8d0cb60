package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query overhead triage (r20): runs named queries under a
  * SparkListener that counts jobs / stages / tasks and sums executor
  * task time, so wall-clock can be split into "cluster work" vs
  * "driver + scheduling + planning overhead". The sf0.1 tables are
  * tiny (~500 docs / ~5K vectors), so any query whose wall far
  * exceeds its summed task time is bound by fixed engine overhead —
  * the thing to shave — rather than data work.
  *
  * usage: runMain graft.ProfileQuery [sfDir] query [query ...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty && args.head.startsWith("/")) args.head
      else "/root/testdata/sf0.1"
    val names = (if (args.nonEmpty && args.head.startsWith("/")) args.drop(1)
      else args).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0)
    val gcTimeMs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { m =>
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"unknown query: $n")
        case Some(fn) =>
          // pass 0 = cold (codegen compile etc.), pass 1-2 = steady
          (0 to 2).foreach { pass =>
            jobs = 0; stages = 0; tasks = 0
            taskTimeMs.set(0); gcTimeMs.set(0)
            val t0 = System.nanoTime()
            val rows = fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            // let straggler listener events drain
            Thread.sleep(300)
            println(f"$n%-28s pass=$pass wall=$wall%7.2fs jobs=$jobs%3d " +
              f"stages=$stages%4d tasks=$tasks%5d " +
              f"taskTime=${taskTimeMs.get / 1e3}%8.2fs " +
              f"gc=${gcTimeMs.get / 1e3}%6.2fs rows=$rows")
            AnnQueries.clearGridCache()
            AnnQueries.clearAnnCache()
            DedupQueries.clearPairsCache()
            spark.catalog.clearCache()
          }
      }
    }
    spark.stop()
  }
}
