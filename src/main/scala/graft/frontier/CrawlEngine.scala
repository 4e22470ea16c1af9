package graft.frontier

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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

final case class RobotsRule(host: String, allow_prefixes: Seq[String],
    disallow_prefixes: Seq[String], crawl_delay_ms: Long)

final case class CrawlConfig(
    numBuckets: Int = 32,
    hostBudgetPerRound: Int = 2, // scrapy CONCURRENT_REQUESTS=2 (settings.py:22)
    roundSize: Int = 10000,
    maxRounds: Int = 64,
    allowedHosts: Set[String] = Set.empty, // empty = all (C2/P13 allow-domains)
    filterCapacityPerBucket: Long = 1L << 16,
    // the drained round is always <= roundSize small rows vs a huge pages
    // table: broadcast it so the fetch join never shuffles html bytes.
    // Above this limit fall back to a shuffled join (AQE skew handling).
    broadcastDrainLimit: Int = 2_000_000,
    // detailed per-stage counters cost extra count() jobs per round; turn off
    // for throughput benchmarks (fetched/extracted/new are always recorded)
    lineageDetail: Boolean = true,
    // P14 (web_spider.py:68-69): in test mode, seed urls containing
    // 'example' are skipped at injection time
    isTest: Boolean = false,
    // frontier commits are append-only deltas (adds + drained-key tombstones);
    // every N rounds — or when tombstones outnumber live rows — the frontier
    // is compacted to a single rewrite so reads never degrade unboundedly
    compactEveryRounds: Int = 8,
    // cuckoo-filter fold policy: new seen keys accumulate as PENDING deltas
    // (probed exactly, never written twice) and are folded into the filter
    // blobs only when pending >= max(foldMinKeys, foldFrac * seen) — so
    // filter bytes written per round amortize to O(new keys), not O(seen).
    // A bucket whose filter would exceed the load limit at fold time is
    // REBUILT at 2x capacity from the exact seen table (geometric growth:
    // the stash stays empty at any seen-set size).
    foldMinKeys: Long = 4096,
    foldFrac: Double = 0.2)

final case class CrawlStats(rounds: Int, fetched: Long, extractedRows: Long, seenSize: Long)
final case class RoundStats(drained: Long, fetched: Long, extracted: Long, newUrls: Long)

/** Spark-native URL frontier + fetch scheduler (north rule; SURVEY.md §2.9,
  * §3.3). Each round is one batch Dataset job:
  *
  *   frontier → politeness two-phase per-host top-k (W5) → priority drain
  *   (C6) → "fetch" join vs the pages table (J4) → fused detect/extract map
  *   (3.1) → link explode (C2) → robots broadcast filter (C4) → in-round
  *   dedup → partitioned cuckoo-filter probe (C3) with exact anti-join
  *   backstop ONLY on the cuckoo-positive subset (J5) → delta snapshot
  *   commit (C8).
  *
  * Scale design: every stage is expressed on Datasets/DataFrames so Catalyst
  * plans it; the seen set is bucket-partitioned (pmod(url_hash, P)) so probes
  * and updates are co-partitioned cogroups, never a broadcast of the filter;
  * the fetch join relies on AQE skew handling for Zipf hosts; the politeness
  * rank is a two-phase bounded-heap top-k (partial per-partition, then
  * per-host final), so a Zipf-hot host never funnels 30% of a 10^10-row
  * frontier through one sort task the way a row_number window would. All
  * frontier/seen/lineage state is committed as APPEND-ONLY deltas — a round
  * writes O(drained + new) rows, never the 10^10-row frontier — with
  * periodic compaction bounding read amplification.
  */
object CrawlEngine {

  private val debugTiming = sys.env.contains("GRAFT_DEBUG_TIMING")
  private def timed[A](label: String)(f: => A): A =
    if (!debugTiming) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[timing] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

  def entry(url: String, depth: Int, round: Int, numBuckets: Int): FrontierEntry = {
    val (canon, host) = UrlOps.canonicalParts(url)
    val h = UrlOps.fnv1a64(canon)
    val hh = UrlOps.fnv1a64(host)
    FrontierEntry(canon, h, host, (hh ^ (hh >>> 32)).toInt,
      (((h % numBuckets) + numBuckets) % numBuckets).toInt, -depth, depth, round)
  }

  def robotsAllowed(rules: Map[String, RobotsRule], url: String): Boolean = {
    val p = UrlOps.parse(url)
    rules.get(p.host.toLowerCase) match {
      case None => true
      case Some(r) => Robots.allowed(p.path, r.allow_prefixes, r.disallow_prefixes)
    }
  }

  /** Drain order: priority desc, depth asc, url asc (deterministic). */
  private val drainOrd: Ordering[FrontierEntry] =
    Ordering.by((e: FrontierEntry) => (-e.priority, e.depth, e.url))

  /** Two-phase per-host top-k (politeness, C5/W5): a bounded max-heap per
    * host per input partition (partial, map-side), then a per-host final
    * merge — replaces the row_number window whose single per-host sort task
    * would take the whole hot host. Each phase holds at most k rows per host
    * in memory; at most k × nPartitions rows per host cross the shuffle.
    * Exactly equivalent to rank-by-(priority desc, depth, url) <= k.
    */
  def topKPerHost(fr: Dataset[FrontierEntry], k: Int): Dataset[FrontierEntry] = {
    val spark = fr.sparkSession
    import spark.implicits._
    implicit val ord: Ordering[FrontierEntry] = drainOrd
    def bounded(it: Iterator[FrontierEntry]): Iterator[FrontierEntry] = {
      // max-heap: head = worst kept entry; evict when a better one arrives
      val heaps = mutable.HashMap.empty[String, mutable.PriorityQueue[FrontierEntry]]
      it.foreach { e =>
        val pq = heaps.getOrElseUpdate(e.host, mutable.PriorityQueue.empty(ord))
        if (pq.size < k) pq.enqueue(e)
        else if (ord.lt(e, pq.head)) { pq.dequeue(); pq.enqueue(e) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
    fr.mapPartitions(bounded _)
      .groupByKey(_.host)
      .flatMapGroups((_: String, es: Iterator[FrontierEntry]) => bounded(es))
  }

  /** One fetch-schedule round. Returns (frontier add-delta, drained keys,
    * seen delta, outputs, lineage, stats, round caches).
    *
    * `pendingSeen`: url_hash rows already committed to the seen table but not
    * yet folded into the filter blobs (the filters are allowed to lag — see
    * CrawlConfig fold policy). A cuckoo MISS is only "definitely new" after
    * an exact anti-join against this (small, bounded) pending set; a cuckoo
    * HIT still anti-joins the full seen table as before.
    */
  def round(
      spark: SparkSession,
      roundNo: Int,
      frontier: Dataset[FrontierEntry],
      frontierSize: Long,
      seen: Dataset[SeenEntry],
      filters: Dataset[FilterState],
      pendingSeen: Option[DataFrame],
      pages: DataFrame, // url, html (+ any other cols)
      robotsBc: org.apache.spark.broadcast.Broadcast[Map[String, RobotsRule]],
      cfg: CrawlConfig): (Dataset[FrontierEntry], DataFrame, Dataset[SeenEntry],
      Dataset[PageOutput], Dataset[LineageRow], RoundStats,
      Seq[Dataset[_]]) = {
    import spark.implicits._

    // --- politeness (C5/W5) + global priority drain (C6) ---
    // Politeness is provably a no-op when budget >= roundSize: an entry with
    // per-host rank > roundSize has >= roundSize better entries within its
    // own host under the SAME ordering, so it can never make the global
    // top-roundSize — skip the operator entirely. Likewise the global top-k
    // needs no ordering work when the whole frontier fits the round.
    val wholeFrontier = frontierSize <= cfg.roundSize &&
      cfg.hostBudgetPerRound >= frontierSize
    val drained: Dataset[FrontierEntry] =
      if (wholeFrontier) frontier.persist()
      else {
        val eligible =
          if (cfg.hostBudgetPerRound >= cfg.roundSize) frontier
          else topKPerHost(frontier, cfg.hostBudgetPerRound)
        if (frontierSize <= cfg.roundSize)
          // |eligible| <= frontierSize <= roundSize: the global top-k is the
          // identity — everything politeness admitted drains this round
          eligible.persist()
        else {
          // Exact top-k, scale-safe: a bare orderBy().limit(k) would
          // collapse the result to ONE partition and serialize everything
          // downstream. Instead: TakeOrdered over NARROW sort keys only,
          // then semi-join back — the join shuffle restores parallelism and
          // only ~k keys ever pass through a single task.
          val drainKeys = eligible
            .select($"url_hash", $"priority", $"depth", $"url")
            .orderBy(desc("priority"), asc("depth"), asc("url"))
            .limit(cfg.roundSize)
            .select($"url_hash")
          eligible.join(drainKeys, Seq("url_hash"), "left_semi")
            .as[FrontierEntry]
            .persist()
        }
      }
    val drainedKeys = drained.select($"url_hash")

    val drainedTotal =
      if (wholeFrontier) frontierSize else timed("drain")(drained.count())
    val politenessDeferred = frontierSize - drainedTotal

    // --- "fetch" (J4): drained ⨝ pages on url ---
    // html bytes dominate the row size: broadcast the (small) drained keys
    // and stream the pages scan so no html ever crosses a shuffle; beyond
    // the broadcast limit fall back to a shuffled join (AQE skew handling)
    val drainedSide = drained.select($"url", $"depth")
    val fetched = (
      if (cfg.roundSize <= cfg.broadcastDrainLimit)
        pages.select($"url", $"html").join(broadcast(drainedSide), Seq("url"))
      else
        drainedSide.join(pages.select($"url", $"html"), Seq("url")))
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

    // materialize outputs now: one combined agg job for (fetched, extracted);
    // everything downstream reads the persisted outputs
    val (fetchedTotal, extractedTotal) = timed("fetch+detect")(outputs
      .agg(count(lit(1)), coalesce(sum($"n_rows"), lit(0L)))
      .as[(Long, Long)].head())

    // --- candidates (C2): explode links, canonicalize, allow + robots filters ---
    val allowedHosts = cfg.allowedHosts
    val robots = robotsBc
    val nb = cfg.numBuckets
    val rawCands = outputs.flatMap(o => o.links.map(l => (l, o.depth + 1)))
      .map { case (u, d) => entry(u, d, roundNo + 1, nb) }
      .filter(e => allowedHosts.isEmpty || allowedHosts.contains(e.host))
    val cands = rawCands.filter(e => robotsAllowed(robots.value, e.url))

    // --- in-round dedup (min depth wins, then url — deterministic) ---
    // Tungsten-native: min over a (depth, url, ...) struct under hash agg
    // with partial (map-side) combine — no object serde, no GC churn on the
    // full candidate volume (struct ordering is lexicographic by field)
    val dedupedCands = cands.toDF()
      .groupBy($"url_hash")
      .agg(min(struct($"depth", $"url", $"host", $"host_hash", $"bucket",
        $"priority", $"discovered_round")).as("e"))
      .select($"e.url", $"url_hash", $"e.host", $"e.host_hash", $"e.bucket",
        $"e.priority", $"e.depth", $"e.discovered_round")
      .as[FrontierEntry]

    // detailed counters (3 extra jobs) only when lineageDetail is on
    val (nRawCands, robotsBlocked, dedupedInRound) =
      if (cfg.lineageDetail) {
        val raw = rawCands.count()
        val allowed = cands.count()
        val deduped = dedupedCands.count()
        (raw, raw - allowed, allowed - deduped)
      } else (-1L, -1L, -1L)

    // --- seen-set probe (C3): co-partitioned cuckoo cogroup per bucket ---
    val probed = dedupedCands.groupByKey(_.bucket)
      .cogroup(filters.groupByKey(_.bucket)) { (b, cs, fs) =>
        val filt = fs.nextOption().map(f => CuckooFilter.fromBytes(f.cuckoo_bytes))
        cs.map(c => (c, filt.exists(_.contains(c.url_hash))))
      }.persist()
    // NB: a key-list join reorders columns (join key first) while Dataset
    // union is positional — realign by name before unioning.
    val feCols = Seq("url", "url_hash", "host", "host_hash", "bucket",
      "priority", "depth", "discovered_round").map(col)
    // cuckoo MISS: new unless in the not-yet-folded pending seen deltas
    // (exact, small); the filter has no false negatives for FOLDED keys
    val cuckooNeg = probed.filter(!_._2).map(_._1)
    val definiteNew = pendingSeen match {
      case None => cuckooNeg
      case Some(p) => cuckooNeg
        .join(p.select($"url_hash"), Seq("url_hash"), "left_anti")
        .select(feCols: _*)
        .as[FrontierEntry]
    }
    // exactness backstop (J5): anti-join ONLY the cuckoo-positive subset
    val fpNew = probed.filter(_._2).map(_._1)
      .join(seen, Seq("url_hash"), "left_anti")
      .select(feCols: _*)
      .as[FrontierEntry]
    val newEntries = definiteNew.union(fpNew).persist()
    val nNew = timed("probe+new")(newEntries.count())

    // --- seen update: seen ∪ new (enqueue-time dedup, scrapy semantics) ---
    // append-only delta: ONLY the newly-enqueued urls (the full seen set is
    // the union of all committed deltas — never rewritten). The filter blobs
    // are NOT touched here: new keys stay pending until the fold policy
    // triggers (run() commit path), so a round writes O(new) filter bytes.
    val seenDelta = newEntries.map(e => SeenEntry(e.bucket, e.url_hash))

    // --- lineage (A-9): per-bucket counters only in detail mode; the global
    // round counters (bucket -1) always, computed from already-known values
    // (no extra jobs)
    val rn = roundNo
    val globalRow = Seq(LineageRow(rn, -1, drainedTotal, fetchedTotal,
      extractedTotal, nRawCands, robotsBlocked, dedupedInRound, nNew,
      politenessDeferred)).toDS()
    val lineage =
      if (!cfg.lineageDetail) globalRow
      else {
        val drainedByBucket = drained.groupBy($"bucket").agg(count("*").as("drained"))
        val newByBucket = newEntries.groupBy($"bucket").agg(count("*").as("new_urls"))
        drainedByBucket.join(newByBucket, Seq("bucket"), "full_outer")
          .na.fill(0L)
          .select($"bucket", $"drained", $"new_urls")
          .as[(Int, Long, Long)]
          .map { case (b, dr, nu) =>
            LineageRow(rn, b, dr, 0L, 0L, 0L, 0L, 0L, nu, 0L)
          }
          .union(globalRow)
      }

    val stats = RoundStats(drainedTotal, fetchedTotal, extractedTotal, nNew)
    (newEntries, drainedKeys, seenDelta, outputs, lineage, stats,
      Seq(drained, outputs, probed, newEntries))
  }

  /** Fold pending seen keys into the per-bucket cuckoo filters, growing any
    * bucket that would exceed the load limit by REBUILDING it at 2x capacity
    * from the exact seen table (CuckooFilter.rebuild — keys are re-derivable,
    * so the filter never degrades into its exact stash). Returns the full
    * rewritten filters table; amortized write cost is O(1) per key because
    * folds trigger proportionally to the seen size and rebuilds double.
    */
  def foldFilters(
      spark: SparkSession,
      filters: Dataset[FilterState],
      pendingKeys: Dataset[SeenEntry],
      seenAll: Dataset[SeenEntry],
      initialCapacity: Long): Dataset[FilterState] = {
    import spark.implicits._
    val cap = initialCapacity
    // pass 1: insert where room; mark overfull buckets for rebuild
    val folded = pendingKeys.groupByKey(_.bucket)
      .cogroup(filters.groupByKey(_.bucket)) { (b, ns, fs) =>
        val keys = ns.map(_.url_hash).toArray
        val filt = fs.nextOption().map(f => CuckooFilter.fromBytes(f.cuckoo_bytes))
          .getOrElse(CuckooFilter.create(cap))
        if (keys.isEmpty && filt.size == 0) Iterator.empty
        else if (filt.hasRoomFor(keys.length)) {
          keys.foreach(filt.add)
          Iterator.single((FilterState(b, filt.toBytes, filt.size), false))
        } else
          // target size for the rebuild: everything it must hold, doubled
          Iterator.single((FilterState(b, Array.emptyByteArray,
            filt.size + keys.length), true))
      }.persist()
    val rebuildSizes = folded.filter(_._2).map(t => (t._1.bucket, t._1.n_keys))
      .collect().toMap // one small int->long pair per overfull bucket
    val result =
      if (rebuildSizes.isEmpty) folded.map(_._1)
      else {
        val sizesBc = spark.sparkContext.broadcast(rebuildSizes)
        val buckets = rebuildSizes.keySet
        val rebuilt = seenAll.filter(s => buckets.contains(s.bucket))
          .groupByKey(_.bucket)
          .mapGroups { (b, it) =>
            val f = CuckooFilter.rebuild(it.map(_.url_hash),
              math.max(2L * sizesBc.value(b), cap))
            FilterState(b, f.toBytes, f.size)
          }
        folded.filter(!_._2).map(_._1).union(rebuilt)
      }
    // materialize before unpersisting the 2-pass intermediate
    val out = result.persist()
    out.count()
    folded.unpersist()
    out
  }

  /** Current frontier = union of add-deltas minus drained-key tombstones. */
  def readFrontier(spark: SparkSession, m: SnapshotStore.Manifest): Dataset[FrontierEntry] = {
    import spark.implicits._
    val adds = SnapshotStore.read(spark, m, "frontier_adds")
    val rm = SnapshotStore.read(spark, m, "frontier_rm")
    adds.join(rm, Seq("url_hash"), "left_anti")
      .select(Seq("url", "url_hash", "host", "host_hash", "bucket",
        "priority", "depth", "discovered_round").map(col): _*)
      .as[FrontierEntry]
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
      robotsRules.map(r => r.host.toLowerCase -> r).toMap)

    // resume from the latest committed snapshot, or bootstrap a v0 snapshot
    // from the seeds (so every later commit is uniform: append-only delta for
    // frontier/seen/lineage; filters rewritten only on fold rounds)
    val existing = SnapshotStore.latestManifest(stateDir)
    // format guard (round-2 ADVICE): a pre-delta-format snapshot (a full
    // `frontier` table / no frontier_size counter) would otherwise resume as
    // an empty frontier and "succeed" with zero rounds
    existing.foreach { m =>
      if (m.dataDirs.contains("frontier") || !m.counters.contains("frontier_size"))
        throw new IllegalStateException(
          s"incompatible legacy snapshot format in $stateDir (expected the " +
            "delta format: frontier_adds/frontier_rm tables + frontier_size " +
            "counter); re-bootstrap into a fresh state dir")
    }
    var manifest: SnapshotStore.Manifest = existing
      .getOrElse {
        // P14: test-mode seed skip (web_spider.py:68-69)
        val effSeeds =
          if (cfg.isTest) seeds.filterNot(_.contains("example")) else seeds
        val seedEntries = effSeeds.map(u => entry(u, 0, 0, cfg.numBuckets))
          .groupBy(_.url_hash).values.map(_.head).toSeq
        val seedFrontier = seedEntries.toDS()
        val seedSeen = seedFrontier.map(e => SeenEntry(e.bucket, e.url_hash))
        val cap = cfg.filterCapacityPerBucket
        // size each bucket's filter for its actual seed volume (2x headroom),
        // never below the configured floor — a 10M-seed bootstrap must not
        // overflow a fixed 2^16 capacity into the exact stash
        val filters0 = seedSeen.groupByKey(_.bucket).mapGroups { (b, ss) =>
          val keys = ss.map(_.url_hash).toArray
          val f = CuckooFilter.rebuild(keys.iterator,
            math.max(cap, 2L * keys.length))
          FilterState(b, f.toBytes, f.size)
        }
        SnapshotStore.commit(stateDir, 0,
          Map("filters" -> filters0.toDF()),
          Map("round" -> -1L, "fetched" -> 0L, "extracted" -> 0L,
            "seen" -> seedEntries.length.toLong,
            "frontier_size" -> seedEntries.length.toLong,
            "frontier_rm_size" -> 0L,
            "filters_folded_dirs" -> 1L, "pending_keys" -> 0L),
          deltas = Map(
            "frontier_adds" -> (seedFrontier.toDF(), Seq.empty),
            "frontier_rm" -> (spark.emptyDataset[SeenEntry].toDF()
              .select($"url_hash"), Seq.empty),
            "seen" -> (seedSeen.toDF(), Seq.empty),
            "lineage" -> (spark.emptyDataset[LineageRow].toDF(), Seq.empty)))
      }
    var roundNo = manifest.counters("round").toInt + 1
    var fetchedTotal = manifest.counters.getOrElse("fetched", 0L)
    var extractedTotal = manifest.counters.getOrElse("extracted", 0L)
    var seenTotal = manifest.counters.getOrElse("seen", 0L)
    var frontierSize = manifest.counters.getOrElse("frontier_size", 0L)
    var rmSize = manifest.counters.getOrElse("frontier_rm_size", 0L)
    // fold bookkeeping: how many committed seen-delta dirs the filter blobs
    // already reflect, and how many keys are pending since the last fold.
    // (Round-2-format snapshots folded every round: default = all dirs.)
    var foldedDirs = manifest.counters.getOrElse("filters_folded_dirs",
      SnapshotStore.dirsOf(manifest, "seen").length.toLong).toInt
    var pendingKeys = manifest.counters.getOrElse("pending_keys", 0L)

    var continue = true
    while (continue && roundNo < cfg.maxRounds && frontierSize > 0) {
      val frontier = readFrontier(spark, manifest)
      val seenDirs = SnapshotStore.dirsOf(manifest, "seen")
      val seen = SnapshotStore.read(spark, manifest, "seen").as[SeenEntry]
      val filters = SnapshotStore.read(spark, manifest, "filters").as[FilterState]
      val pendingDirs = seenDirs.drop(foldedDirs)
      val pendingSeen =
        if (pendingDirs.isEmpty) None else Some(spark.read.parquet(pendingDirs: _*))
      val (adds, drainedKeys, seenDelta, outputs, lineage, stats, caches) =
        round(spark, roundNo, frontier, frontierSize, seen, filters, pendingSeen,
          pages, robotsBc, cfg)
      if (stats.drained == 0) { continue = false; caches.foreach(_.unpersist()) }
      else {
        fetchedTotal += stats.fetched
        extractedTotal += stats.extracted
        seenTotal += stats.newUrls
        frontierSize = frontierSize - stats.drained + stats.newUrls
        rmSize += stats.drained
        // snapshot commit (atomic manifest rename); frontier/seen/lineage are
        // append-only deltas — a round writes O(drained + new) rows. Compact
        // the frontier when tombstones would dominate reads.
        val compact = rmSize > 0 &&
          ((roundNo + 1) % cfg.compactEveryRounds == 0 || rmSize >= frontierSize.max(1L))
        // filter fold policy: rewrite the blobs only when pending keys have
        // grown proportional to the seen set (amortized O(1) write per key);
        // otherwise CARRY the previous filters dir untouched.
        val newPending = pendingKeys + stats.newUrls
        val doFold = newPending > 0 &&
          newPending >= math.max(cfg.foldMinKeys, (cfg.foldFrac * seenTotal).toLong)
        val folded: Option[Dataset[FilterState]] =
          if (!doFold) None
          else {
            val pendingAll = pendingSeen
              .map(df => df.as[SeenEntry].union(seenDelta)).getOrElse(seenDelta)
            Some(timed("fold")(foldFilters(spark, filters, pendingAll,
              seen.union(seenDelta), cfg.filterCapacityPerBucket)))
          }
        val tables = folded.map(f => Map("filters" -> f.toDF())).getOrElse(Map.empty) ++
          (if (collectOutputs) Map("outputs" -> outputs.drop("links").toDF()) else Map.empty)
        val carry =
          if (doFold) Map.empty[String, Seq[String]]
          else Map("filters" -> SnapshotStore.dirsOf(manifest, "filters"))
        val frontierDeltas =
          if (compact) Map(
            "frontier_adds" -> (frontier.join(drainedKeys, Seq("url_hash"), "left_anti")
              .select($"url", $"url_hash", $"host", $"host_hash", $"bucket",
                $"priority", $"depth", $"discovered_round")
              .union(adds.toDF()), Seq.empty[String]),
            "frontier_rm" -> (drainedKeys.limit(0), Seq.empty[String]))
          else Map(
            "frontier_adds" -> (adds.toDF(), SnapshotStore.dirsOf(manifest, "frontier_adds")),
            "frontier_rm" -> (drainedKeys, SnapshotStore.dirsOf(manifest, "frontier_rm")))
        if (compact) rmSize = 0L
        val foldedDirsAfter = if (doFold) seenDirs.length + 1 else foldedDirs
        val pendingAfter = if (doFold) 0L else newPending
        manifest = timed("commit")(SnapshotStore.commit(stateDir, roundNo + 1, tables,
          Map("round" -> roundNo.toLong, "fetched" -> fetchedTotal,
            "extracted" -> extractedTotal, "seen" -> seenTotal,
            "frontier_size" -> frontierSize, "frontier_rm_size" -> rmSize,
            "filters_folded_dirs" -> foldedDirsAfter.toLong,
            "pending_keys" -> pendingAfter),
          deltas = frontierDeltas ++ Map(
            "seen" -> (seenDelta.toDF(), SnapshotStore.dirsOf(manifest, "seen")),
            "lineage" -> (lineage.toDF(), SnapshotStore.dirsOf(manifest, "lineage"))),
          carry = carry))
        foldedDirs = foldedDirsAfter
        pendingKeys = pendingAfter
        folded.foreach(_.unpersist())
        caches.foreach(_.unpersist())
        roundNo += 1
      }
    }
    // counter-tracked (the exact table is the union of committed deltas; the
    // counter avoids an extra count job per run)
    CrawlStats(roundNo, fetchedTotal, extractedTotal, seenTotal)
  }
}
