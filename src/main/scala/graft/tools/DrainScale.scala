package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.frontier.{CrawlEngine, FrontierEntry}
import graft.tables.SyntheticWeb

/** Evidence tool for the frontier-drain scale claim: politeness + priority
  * drain time must be SUBLINEAR in frontier size at fixed round size (the
  * round-1 full-frontier window sorted the hottest host's entire share every
  * round; the two-phase bounded-heap top-k only keeps budget rows per host
  * per partition). Prints one JSON line with drain seconds at 1× and 10×
  * frontier sizes on identical hardware.
  */
object DrainScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val budget = 1000
    val roundSize = 10000
    val nHosts = 16

    def frontier(n: Long) = {
      val cuts = SyntheticWeb.fastCuts(n, nHosts)
      val bc = spark.sparkContext.broadcast(cuts)
      spark.range(0, n, 1, 64).map { i =>
        val c = bc.value
        var host = java.util.Arrays.binarySearch(c, i)
        if (host < 0) host = -host - 2
        if (host >= nHosts) host = nHosts - 1
        CrawlEngine.entry(SyntheticWeb.pageUrl(host, i - c(host)),
          depth = (i % 7).toInt, round = 0, numBuckets = 32)
      }.persist()
    }

    def timeDrain(fr: org.apache.spark.sql.Dataset[FrontierEntry]): Double = {
      fr.count() // materialize the cache outside the timed section
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val eligible = CrawlEngine.topKPerHost(fr, budget)
        val drainKeys = eligible
          .select($"url_hash", $"priority", $"depth", $"url")
          .orderBy(desc("priority"), asc("depth"), asc("url"))
          .limit(roundSize)
          .select($"url_hash")
        val n = eligible.join(drainKeys, Seq("url_hash"), "left_semi").count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(n == roundSize, s"drained $n != $roundSize")
        if (sec < best) best = sec
      }
      best
    }

    // order-fair: 1x, 10x, then 1x again (best) — the first measured size
    // otherwise pays residual JIT alone
    val f1 = frontier(100000L)
    val s1a = timeDrain(f1)
    val f10 = frontier(1000000L)
    val s10 = timeDrain(f10)
    f10.unpersist()
    val s1 = math.min(s1a, timeDrain(f1))
    f1.unpersist()
    println(f"""{"drain_sec_100k":$s1%.3f,"drain_sec_1m":$s10%.3f,"ratio_10x":${s10 / s1}%.2f,"budget":$budget,"round_size":$roundSize}""")
    spark.stop()
  }
}
