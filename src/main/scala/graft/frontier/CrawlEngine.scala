package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.urls.UrlOps
import graft.dom.HtmlParser
import graft.detect.Detector
import graft.tables.SnapshotStore

/** Frontier row (FIXTURES.md §5). priority = -depth gives BFS rounds (C7:
  * deterministic breadth-first ordering, matching the scrapy spider's
  * level-by-level expansion under dedup, web_spider.py:96-98).
  */
final case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    host_hash: Int,
    bucket: Int,
    priority: Int,
    depth: Int,
    discovered_round: Int)

final case class SeenEntry(bucket: Int, url_hash: Long)
final case class FilterState(bucket: Int, cuckoo_bytes: Array[Byte], n_keys: Long)
final case class LineageRow(round: Int, bucket: Int, drained: Long, fetched: Long,
    extracted_rows: Long, candidates: Long, robots_blocked: Long, deduped: Long,
    new_urls: Long, politeness_deferred: Long)

/** Per-page output of the fused fetch→detect→extract map. */
final case class PageOutput(
    url: String,
    depth: Int,
    n_nodes: Int,
    n_lists: Int,
    n_rows: Int,
    extracted_text: String,
    next_url: String,
    links: Seq[String])

final case class RobotsRule(host: String, disallow_prefixes: Seq[String], crawl_delay_ms: Long)

final case class CrawlConfig(
    numBuckets: Int = 32,
    hostBudgetPerRound: Int = 2, // scrapy CONCURRENT_REQUESTS=2 (settings.py:22)
    roundSize: Int = 10000,
    maxRounds: Int = 64,
    allowedHosts: Set[String] = Set.empty, // empty = all (C2/P13 allow-domains)
    filterCapacityPerBucket: Long = 1L << 16)

final case class CrawlStats(rounds: Int, fetched: Long, extractedRows: Long, seenSize: Long)

/** Spark-native URL frontier + fetch scheduler (north rule; SURVEY.md §2.9,
  * §3.3). Each round is one batch Dataset job:
  *
  *   frontier → politeness window (W5) → priority drain → "fetch" join vs the
  *   pages table (J4) → fused detect/extract map (3.1) → link explode (C2) →
  *   robots broadcast filter (C4) → in-round dedup → partitioned cuckoo-filter
  *   probe (C3) with exact anti-join backstop ONLY on the cuckoo-positive
  *   subset (J5) → frontier/seen/lineage snapshot commit (C8).
  *
  * Scale design: every stage is expressed on Datasets/DataFrames so Catalyst
  * plans it; the seen set is bucket-partitioned (pmod(url_hash, P)) so probes
  * and updates are co-partitioned cogroups, never a broadcast of the filter;
  * the fetch join relies on AQE skew handling for Zipf hosts; the politeness
  * rank shuffles on `host` once per round.
  */
object CrawlEngine {

  def entry(url: String, depth: Int, round: Int, numBuckets: Int): FrontierEntry = {
    val canon = UrlOps.canonicalize(url)
    val h = UrlOps.fnv1a64(canon)
    FrontierEntry(canon, h, UrlOps.hostOf(canon), UrlOps.hostHash(canon),
      (((h % numBuckets) + numBuckets) % numBuckets).toInt, -depth, depth, round)
  }

  def robotsAllowed(rules: Map[String, Seq[String]], url: String): Boolean = {
    val p = UrlOps.parse(url)
    rules.get(p.host.toLowerCase) match {
      case None => true
      case Some(prefixes) => !prefixes.exists(pre => p.path.startsWith(pre))
    }
  }

  /** One fetch-schedule round. Returns (new frontier, drained outputs). */
  def round(
      spark: SparkSession,
      roundNo: Int,
      frontier: Dataset[FrontierEntry],
      seen: Dataset[SeenEntry],
      filters: Dataset[FilterState],
      pages: DataFrame, // url, html (+ any other cols)
      robotsBc: org.apache.spark.broadcast.Broadcast[Map[String, Seq[String]]],
      cfg: CrawlConfig): (Dataset[FrontierEntry], Dataset[SeenEntry], Dataset[FilterState],
      Dataset[PageOutput], Dataset[LineageRow]) = {
    import spark.implicits._

    // --- politeness window (C5/W5): per-host budget per round ---
    val w = Window.partitionBy($"host")
      .orderBy(desc("priority"), asc("depth"), asc("url"))
    val ranked = frontier.withColumn("rn", row_number().over(w))
    val eligible = ranked.filter($"rn" <= cfg.hostBudgetPerRound).drop("rn").as[FrontierEntry]

    // --- global priority drain (C6/W5): top roundSize -> TakeOrdered ---
    val drained = eligible
      .orderBy(desc("priority"), asc("depth"), asc("url"))
      .limit(cfg.roundSize)
      .persist()
    val drainedKeys = drained.select($"url_hash").persist()

    val politenessDeferred = frontier.count() - drained.count()

    // --- "fetch" (J4): drained ⨝ pages on url (AQE skew-join for hot hosts) ---
    val fetched = drained.select($"url", $"depth")
      .join(pages.select($"url", $"html"), Seq("url"))
      .select($"url", $"depth", $"html")
      .as[(String, Int, Array[Byte])]

    // --- fused detect/extract map (3.1): ONE narrow map, no shuffle ---
    val outputs: Dataset[PageOutput] = fetched.map { case (url, depth, html) =>
      val doc = HtmlParser.parseBytes(html)
      val det = Detector.detectDoc(url, doc)
      val rows = det.lists.headOption.map(_.data).getOrElse(Seq.empty)
      val text = rows.flatMap(_.values.get("Field_text_1")).mkString("\n")
      val links = Detector.extractLinks(url, doc)
      PageOutput(url, depth, det.nNodes, det.lists.size,
        det.lists.map(_.data.size).sum, text,
        det.pagination.map(_.nextUrl).orNull, links)
    }.persist()

    // --- candidates (C2): explode links, canonicalize, allow + robots filters ---
    val allowedHosts = cfg.allowedHosts
    val robots = robotsBc
    val nb = cfg.numBuckets
    val rawCands = outputs.flatMap(o => o.links.map(l => (l, o.depth + 1)))
      .map { case (u, d) => entry(u, d, roundNo + 1, nb) }
      .filter(e => allowedHosts.isEmpty || allowedHosts.contains(e.host))
      .persist()
    val nRawCands = rawCands.count()
    val cands = rawCands.filter(e => robotsAllowed(robots.value, e.url)).persist()
    val robotsBlocked = nRawCands - cands.count()

    // --- in-round dedup (min depth wins, then url — deterministic) ---
    val dedupedCands = cands
      .groupByKey(_.url_hash)
      .reduceGroups((a, b) =>
        if (a.depth < b.depth || (a.depth == b.depth && a.url <= b.url)) a else b)
      .map(_._2)
      .persist()
    val dedupedInRound = cands.count() - dedupedCands.count()

    // --- seen-set probe (C3): co-partitioned cuckoo cogroup per bucket ---
    val probed = dedupedCands.groupByKey(_.bucket)
      .cogroup(filters.groupByKey(_.bucket)) { (b, cs, fs) =>
        val filt = fs.nextOption().map(f => CuckooFilter.fromBytes(f.cuckoo_bytes))
        cs.map(c => (c, filt.exists(_.contains(c.url_hash))))
      }.persist()
    val definiteNew = probed.filter(!_._2).map(_._1)
    // exactness backstop (J5): anti-join ONLY the cuckoo-positive subset
    // NB: a key-list join reorders columns (join key first) while Dataset
    // union is positional — realign by name before unioning.
    val feCols = Seq("url", "url_hash", "host", "host_hash", "bucket",
      "priority", "depth", "discovered_round").map(col)
    val fpNew = probed.filter(_._2).map(_._1)
      .join(seen, Seq("url_hash"), "left_anti")
      .select(feCols: _*)
      .as[FrontierEntry]
    val newEntries = definiteNew.union(fpNew)
      // also exclude urls sitting in the current frontier that were deferred
      // this round (they are already enqueued => already in seen; the
      // anti-join above covers them because seen includes all enqueued urls)
      .persist()
    val nNew = newEntries.count()

    // --- frontier update: deferred leftovers ∪ new candidates ---
    val leftover = frontier.join(drainedKeys, Seq("url_hash"), "left_anti")
      .select(feCols: _*).as[FrontierEntry]
    val newFrontier = leftover.union(newEntries)

    // --- seen update: seen ∪ new (enqueue-time dedup, scrapy semantics) ---
    val newSeen = seen.union(newEntries.map(e => SeenEntry(e.bucket, e.url_hash)))
    val cap = cfg.filterCapacityPerBucket
    val newFilters = newEntries.map(e => SeenEntry(e.bucket, e.url_hash))
      .groupByKey(_.bucket)
      .cogroup(filters.groupByKey(_.bucket)) { (b, ns, fs) =>
        val filt = fs.nextOption().map(f => CuckooFilter.fromBytes(f.cuckoo_bytes))
          .getOrElse(CuckooFilter.create(cap))
        var any = false
        ns.foreach { s => filt.add(s.url_hash); any = true }
        if (any || filt.size > 0) Iterator.single(FilterState(b, filt.toBytes, filt.size))
        else Iterator.empty
      }

    // --- lineage (A-9): per-bucket counters for this round ---
    val drainedByBucket = drained.groupBy($"bucket").agg(count("*").as("drained"))
    val newByBucket = newEntries.groupBy($"bucket").agg(count("*").as("new_urls"))
    val extractedTotal = outputs.agg(coalesce(sum($"n_rows"), lit(0L))).as[Long].head()
    val rn = roundNo
    val drainedTotal = drained.count()
    val fetchedTotal = outputs.count() // urls that actually resolved in pages
    val lineage = drainedByBucket.join(newByBucket, Seq("bucket"), "full_outer")
      .na.fill(0L)
      .select($"bucket", $"drained", $"new_urls")
      .as[(Int, Long, Long)]
      .map { case (b, dr, nu) =>
        LineageRow(rn, b, dr, 0L, 0L, 0L, 0L, 0L, nu, 0L)
      }
      // global counters on bucket -1
      .union(Seq(LineageRow(rn, -1, drainedTotal, fetchedTotal, extractedTotal,
        nRawCands, robotsBlocked, dedupedInRound, nNew, politenessDeferred)).toDS())

    rawCands.unpersist()
    cands.unpersist()
    (newFrontier, newSeen, newFilters, outputs, lineage)
  }

  /** Run the full crawl with per-round snapshot commits; resumable from the
    * latest committed snapshot in `stateDir` (C8).
    */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      seeds: Seq[String],
      robotsRules: Seq[RobotsRule],
      cfg: CrawlConfig,
      stateDir: String,
      collectOutputs: Boolean = true): CrawlStats = {
    import spark.implicits._

    val robotsBc = spark.sparkContext.broadcast(
      robotsRules.map(r => r.host.toLowerCase -> r.disallow_prefixes).toMap)

    // resume or bootstrap
    val resume = SnapshotStore.latestManifest(stateDir)
    var roundNo = resume.flatMap(_.counters.get("round")).map(_.toInt + 1).getOrElse(0)
    var fetchedTotal = resume.flatMap(_.counters.get("fetched")).getOrElse(0L)
    var extractedTotal = resume.flatMap(_.counters.get("extracted")).getOrElse(0L)

    var frontier: Dataset[FrontierEntry] = resume match {
      case Some(m) => SnapshotStore.read(spark, m, "frontier").as[FrontierEntry]
      case None =>
        val seedEntries = seeds.map(u => entry(u, 0, 0, cfg.numBuckets))
          .groupBy(_.url_hash).values.map(_.head).toSeq
        seedEntries.toDS()
    }
    var seen: Dataset[SeenEntry] = resume match {
      case Some(m) => SnapshotStore.read(spark, m, "seen").as[SeenEntry]
      case None => frontier.map(e => SeenEntry(e.bucket, e.url_hash))
    }
    var filters: Dataset[FilterState] = resume match {
      case Some(m) => SnapshotStore.read(spark, m, "filters").as[FilterState]
      case None =>
        val cap = cfg.filterCapacityPerBucket
        seen.groupByKey(_.bucket).mapGroups { (b, ss) =>
          val f = CuckooFilter.create(cap)
          ss.foreach(s => f.add(s.url_hash))
          FilterState(b, f.toBytes, f.size)
        }
    }

    var lineageAcc: Dataset[LineageRow] = resume match {
      case Some(m) => SnapshotStore.read(spark, m, "lineage").as[LineageRow]
      case None => spark.emptyDataset[LineageRow]
    }

    var continue = true
    while (continue && roundNo < cfg.maxRounds) {
      val frontierCount = frontier.count()
      if (frontierCount == 0) { continue = false }
      else {
        val (nf, ns, nfl, outputs, lineage) =
          round(spark, roundNo, frontier, seen, filters, pages, robotsBc, cfg)
        val roundFetched = outputs.count()
        val roundExtracted = outputs.agg(coalesce(sum($"n_rows"), lit(0L))).as[Long].head()
        fetchedTotal += roundFetched
        extractedTotal += roundExtracted
        lineageAcc = lineageAcc.union(lineage)
        // snapshot commit (atomic manifest rename)
        val tables = Map(
          "frontier" -> nf.toDF(),
          "seen" -> ns.toDF(),
          "filters" -> nfl.toDF(),
          "lineage" -> lineageAcc.toDF()) ++
          (if (collectOutputs) Map("outputs" -> outputs.drop("links").toDF()) else Map.empty)
        val m = SnapshotStore.commit(stateDir, roundNo + 1, tables,
          Map("round" -> roundNo.toLong, "fetched" -> fetchedTotal,
            "extracted" -> extractedTotal))
        // reload state from the committed snapshot (cuts lineage, bounds plans)
        frontier = SnapshotStore.read(spark, m, "frontier").as[FrontierEntry]
        seen = SnapshotStore.read(spark, m, "seen").as[SeenEntry]
        filters = SnapshotStore.read(spark, m, "filters").as[FilterState]
        lineageAcc = SnapshotStore.read(spark, m, "lineage").as[LineageRow]
        outputs.unpersist()
        roundNo += 1
      }
    }
    val seenSize = seen.count()
    CrawlStats(roundNo, fetchedTotal, extractedTotal, seenSize)
  }
}
