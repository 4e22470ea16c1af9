package graft.tools

import org.apache.spark.sql.SparkSession
import graft.frontier.{CrawlConfig, CrawlEngine}
import graft.tables.SyntheticWeb

/** Interleaved A/B of the seen-probe strategies (broadcast expression vs
  * co-partitioned cogroup) on the SAME session + input: the sandbox host
  * throttles CPU in multi-minute bursts, so back-to-back single runs are not
  * comparable — alternating passes hit both variants with the same budget.
  * Bootstrap is built once and copied per run (the bench's timedRun shape).
  */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nPages = sys.env.getOrElse("GRAFT_PROF_PAGES", "100000").toInt
    val rounds = sys.env.getOrElse("GRAFT_PROF_ROUNDS", "8").toInt
    val passes = sys.env.getOrElse("GRAFT_PROF_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nHosts = 16
    val weight = sys.env.getOrElse("SPARK_GRAFT_PAGE_WEIGHT", "4").toInt
    val pages = SyntheticWeb.pagesFast(spark, nPages.toLong, nHosts, 256,
      weight).union(SyntheticWeb.robotsPages(spark, nHosts)).toDF()
      .repartitionByRange(256, org.apache.spark.sql.functions.col("url"))
      .sortWithinPartitions("url")
      .cache()
    pages.count()
    val cuts = SyntheticWeb.fastCuts(nPages.toLong, nHosts)
    val cutsBc = spark.sparkContext.broadcast(cuts)
    val seeds = spark.range(0, nPages.toLong, 1, cpus * 2).map { i =>
      val c = cutsBc.value
      var host = java.util.Arrays.binarySearch(c, i)
      if (host < 0) host = -host - 2
      if (host >= nHosts) host = nHosts - 1
      SyntheticWeb.pageUrl(host, i - c(host))
    }
    val hostMax = (1 until (nHosts + 1)).map(h => cuts(h) - cuts(h - 1)).max.toInt
    val base = CrawlConfig(numBuckets = cpus, hostBudgetPerRound = hostMax,
      roundSize = (nPages + rounds - 1) / rounds, maxRounds = rounds + 2,
      lineageDetail = false)
    val cfgs = sys.env.getOrElse("GRAFT_AB_MODE", "probe") match {
      case "roundcost" => Seq( // seen cache + count-first vs the old shape
        "new" -> base,
        "old" -> base.copy(seenCacheLimitBytes = 0L, idleCountFirst = false))
      case _ => Seq(
        "broadcast" -> base,
        "cogroup" -> base.copy(broadcastFilterLimitBytes = 0L))
    }

    // warm both code paths (JIT + codegen), untimed
    for ((_, cfg) <- cfgs)
      CrawlEngine.run(spark, pages, seeds.limit(5000),
        cfg.copy(roundSize = 1000, maxRounds = 7),
        graft.util.TempDirs.create("graft-ab-warm-").toString,
        collectOutputs = false)

    // one bootstrap, copied per timed run
    val bootDir = graft.util.TempDirs.create("graft-ab-boot-")
    CrawlEngine.run(spark, pages, seeds, base.copy(maxRounds = 0),
      bootDir.toString, collectOutputs = false)

    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      val s = java.nio.file.Files.walk(src)
      try s.forEach { p =>
        val q = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
        else java.nio.file.Files.copy(p, q,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally s.close()
    }

    val best = scala.collection.mutable.Map.empty[String, Double]
    for (p <- 1 to passes; (label, cfg) <- cfgs) {
      val stateDir = graft.util.TempDirs.create(s"graft-ab-$label-")
      copyTree(bootDir, stateDir)
      val t0 = System.nanoTime()
      CrawlEngine.run(spark, pages, seeds, cfg, stateDir.toString,
        collectOutputs = false)
      val sec = (System.nanoTime() - t0) / 1e9
      graft.util.TempDirs.deleteRecursively(stateDir)
      println(f"pass $p $label%-10s ${sec}%6.2f s  (${nPages / sec}%.0f urls/s)")
      if (!best.contains(label) || sec < best(label)) best(label) = sec
    }
    for ((label, sec) <- best.toSeq.sortBy(_._1))
      println(f"BEST $label%-10s ${sec}%6.2f s  (${nPages / sec}%.0f urls/s)")
    spark.stop()
  }
}
