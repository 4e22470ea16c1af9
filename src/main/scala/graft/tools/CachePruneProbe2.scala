package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.SyntheticWeb

/** Does a url-range filter prune cached batches? Builds the bench's pages
  * cache layout, runs a 1/8-range filter + broadcast join + count, and
  * reports the stage input bytes via a listener — the direct check for the
  * multi-round fetch-scan pruning claim.
  */
object CachePruneProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 50000
    val pages = SyntheticWeb.pagesFast(spark, n.toLong, 16, 256, 4)
      .union(SyntheticWeb.robotsPages(spark, 16)).toDF()
      .repartitionByRange(256, col("url"))
      .sortWithinPartitions("url")
      .cache()
    pages.count()
    val urls = pages.select($"url").as[String].orderBy($"url").collect()
    val (lo, hi) = (urls(0), urls(urls.length / 8))
    val inBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        inBytes.addAndGet(e.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })
    val filtered = pages.filter($"url" >= lo && $"url" <= hi)
      .select($"url", $"html")
    val cnt = filtered.count()
    Thread.sleep(1000)
    println(s"range rows=$cnt of ${urls.length}; input MB=${inBytes.get / 1048576}")
    println(filtered.queryExecution.executedPlan.toString.take(800))
    // wall-time check: full-scan length-sum vs range-filtered length-sum —
    // if batch pruning works the filtered pass is ~8x faster
    def timeIt(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%6.3fs  sum=$r")
    }
    timeIt("full") {
      pages.select($"url", $"html").agg(sum(length($"url"))).as[Long].head()
    }
    timeIt("range") {
      filtered.agg(sum(length($"url"))).as[Long].head()
    }
    timeIt("rangeHtml") {
      filtered.agg(sum(length($"html"))).as[Long].head()
    }
    timeIt("fullHtml") {
      pages.select($"url", $"html").agg(sum(length($"html"))).as[Long].head()
    }
    spark.stop()
  }
}
