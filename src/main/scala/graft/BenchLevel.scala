package graft

import org.apache.spark.sql.SparkSession
import graft.frontier.{CrawlConfig, CrawlEngine}
import graft.tables.SyntheticWeb

/** One parallelism level of the north-rule benchmark: a local[cpus] session
  * over the synthetic Common-Crawl-style pages table, with the untimed setup
  * (input cache, JIT warm crawl, v0 bootstrap snapshot) paid once in
  * `setup()` and each timed trial resuming from a filesystem copy of the
  * bootstrap. Used two ways: in-process by [[Bench]] (legacy fallback) and as
  * the body of [[BenchWorker]], the per-level child JVM that the forked bench
  * protocol pins to `cpus` physical cores (`taskset` +
  * `-XX:ActiveProcessorCount`) so a level models a real N-core executor node
  * — GC, JIT and IO threads included — instead of N Spark task slots on a
  * 32-core machine.
  */
final class BenchLevel(cpus: Int, nPages: Int, nHosts: Int) {

  private var spark: SparkSession = _
  private var pages: org.apache.spark.sql.DataFrame = _
  private var cfg: CrawlConfig = _
  private var bootDir: java.nio.file.Path = _
  private var seedDs: Int => org.apache.spark.sql.Dataset[String] = _

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(src)
    try s.forEach { p =>
      val q = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
      else java.nio.file.Files.copy(p, q,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally s.close()
  }

  /** `aqe = false` for the crawl sessions: at bounded round sizes every
    * join the round runs is explicitly broadcast (drain keys, fetch keys,
    * robots) or statically planned, and AQE's per-exchange stage
    * materialization adds ~15 driver jobs per round — pure scheduling
    * latency at this scale (measured: ~25% of multi-round wall). Production
    * rounds above `broadcastDrainLimit` want AQE back on for skew handling;
    * the engine itself is config-neutral (specs run with AQE on).
    */
  /** @param bootHint reuse/populate this directory for the v0 bootstrap
    *   snapshot (the in-proc fallback caches it across interleaved passes;
    *   a forked worker lives for the whole schedule so it passes None)
    * @param skipWarm the JIT warm crawl is JVM-wide — later in-proc passes
    *   in the same JVM skip it
    */
  def setup(bootHint: Option[java.nio.file.Path] = None,
      skipWarm: Boolean = false): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sp = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
      .getOrCreate()
    spark = sp
    import sp.implicits._
    val weight = sys.env.getOrElse("SPARK_GRAFT_PAGE_WEIGHT", "4").toInt
    // robots.txt rows live IN the pages table (the engine's default robots
    // source) — rules are crawled data, not driver config.
    // 256 slices, FIXED across parallelism levels (identical input layout at
    // every level), url-range layout (the Iceberg sort_order(url) analog) so
    // the engine's drain-range predicate prunes cached batches via min/max
    // stats — see Bench for the full rationale.
    pages = SyntheticWeb.pagesFast(sp, nPages.toLong, nHosts, 256,
      weight).union(SyntheticWeb.robotsPages(spark, nHosts)).toDF()
      .repartitionByRange(256, org.apache.spark.sql.functions.col("url"))
      .sortWithinPartitions("url")
      .cache()
    pages.count() // materialize input outside the timed section
    // seed the frontier with every page url (measures drain+extract, not
    // graph discovery latency); host-major layout mirror of pagesFast.
    // Seeds are a DATASET derived executor-side — nothing frontier-sized
    // ever materializes on the driver or ships inside task closures.
    val cuts = SyntheticWeb.fastCuts(nPages.toLong, nHosts)
    val cutsBc = sp.sparkContext.broadcast(cuts)
    val nh = nHosts
    val nSlices = cpus * 2
    seedDs = (n: Int) => sp.range(0, n.toLong, 1, nSlices).map { i =>
      val c = cutsBc.value
      var host = java.util.Arrays.binarySearch(c, i)
      if (host < 0) host = -host - 2
      if (host >= nh) host = nh - 1
      SyntheticWeb.pageUrl(host, i - c(host))
    }
    // politeness budget = the largest host's frontier share (host0's 30%):
    // small enough that the two-phase per-host top-k actually executes, large
    // enough that one round still drains the whole frontier — the metric
    // measures drain+extract, not multi-round scheduling latency
    val hostMax = (1 until (nHosts + 1)).map(h => cuts(h) - cuts(h - 1)).max.toInt
    cfg = CrawlConfig(numBuckets = cpus, hostBudgetPerRound = hostMax,
      roundSize = nPages, maxRounds = 1, lineageDetail = false)
    // JIT warmup: an untimed crawl through the same code path — 10k pages,
    // or the first timed trial pays residual compilation (observed ~7%).
    if (!skipWarm) {
      val warm = math.min(10000, nPages)
      CrawlEngine.run(spark, pages, seedDs(warm), cfg.copy(roundSize = warm),
        graft.util.TempDirs.create("graft-warm-").toString,
        collectOutputs = false)
    }
    // bootstrap the v0 frontier snapshot ONCE, OUTSIDE the timed section
    // (the metric is drain+extract of an EXISTING frontier table —
    // production resumes from a committed snapshot, not seed ingestion);
    // each trial resumes from a cheap filesystem COPY of it
    bootDir = bootHint.getOrElse(
      graft.util.TempDirs.create(s"graft-bench-boot-$cpus-"))
    val empty = !java.nio.file.Files.exists(bootDir) || {
      val s = java.nio.file.Files.list(bootDir)
      try !s.findFirst().isPresent finally s.close()
    }
    if (empty) {
      java.nio.file.Files.createDirectories(bootDir)
      CrawlEngine.run(spark, pages, seedDs(nPages), cfg.copy(maxRounds = 0),
        bootDir.toString, collectOutputs = false)
    }
  }

  private def timedRun(runCfg: CrawlConfig): (Double, Long) = {
    val stateDir = graft.util.TempDirs.create(s"graft-bench-$cpus-")
    copyTree(bootDir, stateDir)
    val t0 = System.nanoTime()
    val stats = CrawlEngine.run(spark, pages, seedDs(nPages), runCfg,
      stateDir.toString, collectOutputs = false)
    val sec = (System.nanoTime() - t0) / 1e9
    graft.util.TempDirs.deleteRecursively(stateDir)
    (nPages / sec, stats.extractedRows)
  }

  /** ONE maximal round — the drain+extract kernel. Returns (urls/sec, extracted). */
  def runSingle(): (Double, Long) = timedRun(cfg)

  /** The SAME pages drained over `rounds` fetch-schedule rounds — per-round
    * commit amortization, fold policy and frontier compaction inside the
    * timed window, the way a real crawl pays them.
    */
  def runMulti(rounds: Int): Double =
    timedRun(cfg.copy(roundSize = (nPages + rounds - 1) / rounds,
      maxRounds = rounds + 2))._1

  def close(): Unit = if (spark != null) spark.stop()
}
