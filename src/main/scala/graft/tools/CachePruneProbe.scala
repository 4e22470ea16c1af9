package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.SyntheticWeb

/** Probe: does a range predicate on `url` prune cached batches of the
  * synthetic pages table (InMemoryTableScan partition-batch pruning)?
  * Prints bytes read by a bounded scan vs the full scan.
  */
object CachePruneProbe {
  def main(args: Array[String]): Unit = {
    val cpus = 8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nPages = 100000L
    val nHosts = 16
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 256, 4)
      .union(SyntheticWeb.robotsPages(spark, nHosts)).toDF().cache()
    pages.count()

    @volatile var bytes = 0L
    @volatile var rows = 0L
    @volatile var taskMs = 0L
    @volatile var tasks = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        bytes += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
        rows += sc.stageInfo.taskMetrics.inputMetrics.recordsRead
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
        tasks += sc.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(label: String)(f: => Long): Unit = {
      bytes = 0L; rows = 0L; taskMs = 0L; tasks = 0L
      val t0 = System.nanoTime()
      val n = f
      val w = (System.nanoTime() - t0) / 1e6
      Thread.sleep(1500)
      println(f"$label%-28s n=$n%8d  read ${bytes / 1048576}%6d MB ${rows}%9d blk  task ${taskMs}%7d ms/${tasks}%4d  wall $w%7.0f ms")
    }

    // full scan baseline (html forced: sum of lengths touches every blob)
    measure("full-count")(pages.count())
    measure("full-html-bytes")(
      pages.select(sum(length(col("html")))).head().getLong(0))
    // a narrow url range (one host's page prefix)
    val lo = SyntheticWeb.pageUrl(3, 100)
    val hi = SyntheticWeb.pageUrl(3, 200)
    for (_ <- 1 to 2) {
      measure("range-count") {
        pages.filter(col("url") >= lo && col("url") <= hi).count()
      }
      measure("range-html-bytes") {
        pages.filter(col("url") >= lo && col("url") <= hi)
          .select(sum(length(col("html")))).head().getLong(0)
      }
    }
    println("---- plan ----")
    pages.filter(col("url") >= lo && col("url") <= hi)
      .queryExecution.executedPlan.toString.linesIterator.take(20)
      .foreach(println)
    spark.stop()
  }
}
