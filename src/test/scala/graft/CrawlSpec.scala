package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

import graft.frontier.{CrawlConfig, CrawlEngine, RobotsRule}
import graft.tables.{SnapshotStore, SyntheticWeb}
import graft.urls.UrlOps
import graft.dom.HtmlParser
import graft.detect.Detector

/** Crawl-parity + resume tests (SURVEY.md §5.2 items 4-5): the Spark frontier
  * must reproduce the URL-seen set and per-round drain ordering of an
  * independent single-threaded simulator implementing the same policy
  * (BFS rounds, per-host politeness budget, robots, enqueue-time dedup —
  * scrapy's documented semantics, settings.py:19-22,90).
  */
class CrawlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val nHosts = 4
  val nPages = 40
  lazy val pageMap: Map[String, Array[Byte]] = {
    import spark.implicits._
    SyntheticWeb.pagesFast(spark, nPages, nHosts, 4)
      .collect().map(p => p.url -> p.html).toMap
  }
  val robots: Seq[RobotsRule] =
    SyntheticWeb.robotsRules(nHosts).map(r => RobotsRule(r._1, r._2, r._3, r._4))
  val cfg: CrawlConfig = CrawlConfig(numBuckets = 8, hostBudgetPerRound = 3,
    roundSize = 16, maxRounds = 12)

  def ruleAllows(rules: Map[String, RobotsRule], u: String): Boolean =
    rules.get(UrlOps.hostOf(u)) match {
      case None => true
      case Some(r) =>
        // path+query, like the engine's robots gate (RFC 9309 §2.2.2)
        graft.frontier.Robots.allowed(
          UrlOps.pathQueryOfCanonical(UrlOps.canonicalize(u)),
          r.allow_prefixes, r.disallow_prefixes)
    }

  /** Reference simulator: same policy, plain collections. Returns the seen
    * set plus the per-NONEMPTY-round drains as (roundNo, urls) — idle rounds
    * (all hosts inside a crawl-delay window) tick the clock silently, exactly
    * like the engine.
    */
  def simulate(rulesSeq: Seq[RobotsRule] = robots,
      roundTimeMs: Long = 1000L): (Set[String], Vector[(Int, Vector[String])]) = {
    val rules = rulesSeq.map(r => r.host -> r).toMap
    val frontier = mutable.SortedSet.empty[(Int, String)] // (depth, url)
    val seen = mutable.Set.empty[String]
    val nextOk = mutable.Map.empty[String, Int]
    SyntheticWeb.seedUrls(nHosts).map(UrlOps.canonicalize).distinct
      .filter(ruleAllows(rules, _)).foreach { u =>
        frontier += ((0, u)); seen += u
      }
    val drains = Vector.newBuilder[(Int, Vector[String])]
    var rounds = 0
    var continue = true
    while (continue && frontier.nonEmpty && rounds < cfg.maxRounds) {
      // crawl-delay gate, then politeness: per-host top budget by
      // (depth asc, url asc); then global top roundSize by same ordering
      val perHost = mutable.Map.empty[String, Int]
      val eligible = frontier.toVector.filter { case (_, u) =>
        val h = UrlOps.hostOf(u)
        if (nextOk.getOrElse(h, 0) > rounds) false
        else {
          val c = perHost.getOrElse(h, 0)
          if (c < cfg.hostBudgetPerRound) { perHost(h) = c + 1; true } else false
        }
      }
      val drained = eligible.sortBy(identity).take(cfg.roundSize)
      if (drained.isEmpty) {
        if (nextOk.valuesIterator.exists(_ > rounds)) rounds += 1
        else continue = false
      } else {
        drains += ((rounds, drained.map(_._2)))
        frontier --= drained
        // fetch + extract links
        val cands = mutable.Map.empty[String, (Int, String)] // canon -> (depth, url)
        drained.foreach { case (depth, u) =>
          pageMap.get(u).foreach { html =>
            val doc = HtmlParser.parseBytes(html)
            Detector.extractLinks(u, doc).foreach { l =>
              val c = UrlOps.canonicalize(l)
              if (ruleAllows(rules, c)) {
                val e = (depth + 1, c)
                cands.get(c) match {
                  case Some(old) if old._1 < e._1 ||
                    (old._1 == e._1 && old._2 <= e._2) => // keep old
                  case _ => cands(c) = e
                }
              }
            }
          }
        }
        cands.values.foreach { case (d, c) =>
          if (!seen.contains(c)) { seen += c; frontier += ((d, c)) }
        }
        drained.iterator.map(e => UrlOps.hostOf(e._2)).toSet.foreach { h: String =>
          rules.get(h).foreach { r =>
            if (r.crawl_delay_ms > roundTimeMs)
              nextOk(h) = rounds +
                math.ceil(r.crawl_delay_ms.toDouble / roundTimeMs).toInt
          }
        }
        rounds += 1
      }
    }
    (seen.toSet, drains.result())
  }

  test("spark crawl matches the simulator's URL-seen set and drain ordering" +
      " under every filter-fold config") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF().cache()
    val (simSeen, simDrains) = simulate()
    val simSeenHashes = simSeen.map(UrlOps.fnv1a64)
    val simFetchedPerRound = simDrains.map(_._2.filter(pageMap.contains))

    // lazy-fold (default: pending path, filters never refold at this scale),
    // fold-every-round (round-2 behavior), and fold+grow (tiny capacity
    // forces rebuild-at-2x)
    val configs = Seq(
      "lazy" -> cfg,
      "eager" -> cfg.copy(foldMinKeys = 1, foldFrac = 0.0),
      "grow" -> cfg.copy(foldMinKeys = 1, foldFrac = 0.0, filterCapacityPerBucket = 16),
      // broadcastFilterLimitBytes = 0 forces the co-partitioned cogroup
      // probe (the 10^10-scale path); the other configs take the broadcast
      // probe — both must land on the simulator's exact seen set
      "cogroup" -> cfg.copy(foldMinKeys = 1, foldFrac = 0.0,
        broadcastFilterLimitBytes = 0L))
    for ((label, fcfg) <- configs) {
      val stateDir = java.nio.file.Files.createTempDirectory(s"graft-crawlspec-$label-").toString
      val stats = CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts),
        robots, fcfg, stateDir)

      // final URL-seen set: compare via hashes (engine stores hashes)
      val m = SnapshotStore.latestManifest(stateDir).get
      val engineSeen = CrawlEngine.readSeenDirs(spark,
          SnapshotStore.dirsOf(m, "seen"))
        .select("url_hash").as[Long].collect().toSet
      assert(engineSeen == simSeenHashes,
        s"[$label] seen mismatch: engine=${engineSeen.size} sim=${simSeenHashes.size}")

      // per-round drain ordering: outputs snapshot per round records fetched urls
      for (r <- simFetchedPerRound.indices) {
        val v = r + 1
        val mr = SnapshotStore.readManifest(stateDir, v)
        val fetched = SnapshotStore.read(spark, mr, "outputs")
          .select("url").as[String].collect().toSet
        assert(fetched == simFetchedPerRound(r).toSet,
          s"[$label] round $r fetched mismatch")
      }
      assert(stats.fetched == simFetchedPerRound.map(_.size).sum)
      assert(stats.rounds == simDrains.size)

      // filter-table health invariants per config
      import graft.frontier.{CuckooFilter, FilterState}
      val filters = SnapshotStore.read(spark, m, "filters").as[FilterState].collect()
      val restored = filters.map(f => f.bucket -> CuckooFilter.fromBytes(f.cuckoo_bytes)).toMap
      if (label != "lazy") {
        // all folds applied each round: every seen key must be IN the filter
        val seenRows = CrawlEngine.readSeenDirs(spark,
            SnapshotStore.dirsOf(m, "seen")).collect()
        assert(seenRows.forall(s => restored(s.bucket).contains(s.url_hash)),
          s"[$label] folded filter lost a seen key")
      }
      restored.values.foreach { f =>
        assert(f.size.toDouble / f.capacity <= CuckooFilter.LoadLimit + 1e-9,
          s"[$label] filter over load limit")
        assert(f.stashSize == 0,
          s"[$label] stash must stay empty (rebuild-at-2x), got ${f.stashSize}")
      }
      if (label == "grow")
        assert(restored.values.exists(_.capacity > 16 * 2),
          "[grow] at least one bucket must have been rebuilt larger")
      // write amplification: filters dirs exist only for fold commits (and a
      // fold only happens when the round enqueued new keys)
      val foldCommits = (1 to stats.rounds).count { v =>
        new java.io.File(s"$stateDir/data/v$v/filters").isDirectory
      }
      if (label == "lazy")
        assert(foldCommits == 0,
          s"lazy config must never rewrite filters at this scale, got $foldCommits")
      else {
        assert(foldCommits >= 1)
        assert(m.counters("pending_keys") == 0L, s"[$label] eager fold left pending keys")
      }
    }
  }

  test("C4: robots rules come only from /robots.txt page bodies in the pages table") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4)
      .union(SyntheticWeb.robotsPages(spark, nHosts)).toDF().cache()
    val stateDir = java.nio.file.Files.createTempDirectory("graft-robotspages-").toString
    // NEW api: no rules parameter anywhere — the engine fetches
    // https://host/robots.txt rows from the pages table itself
    val stats = CrawlEngine.run(spark, pages,
      spark.createDataset(SyntheticWeb.seedUrls(nHosts)), cfg, stateDir)
    val (simSeen, simDrains) = simulate()
    val m = SnapshotStore.latestManifest(stateDir).get
    val engineSeen = CrawlEngine.readSeenDirs(spark,
        SnapshotStore.dirsOf(m, "seen"))
      .select("url_hash").as[Long].collect().toSet
    assert(engineSeen == simSeen.map(UrlOps.fnv1a64))
    assert(stats.rounds == simDrains.size)
    // the robots table persisted the PARSED rules (including host2's Allow)
    import graft.frontier.RobotsEntry
    val rt = SnapshotStore.read(spark, m, "robots").as[RobotsEntry].collect()
    assert(rt.find(_.host == "host1.example").get.disallow == Seq("/private", "/tag"))
    assert(rt.find(_.host == "host2.example").get.allow == Seq("/private/area0"))
    // the Allow exception actually enqueued the excepted url (it is later
    // drained — no page serves it — so assert on the seen set, not frontier)
    assert(engineSeen.contains(
        UrlOps.fnv1a64("https://host2.example/private/area0")),
      "host2's Allow-excepted /private/area0 must be enqueued")
    assert(!engineSeen.contains(UrlOps.fnv1a64("https://host0.example/private/area0")),
      "other hosts' /private stays blocked")
    // a host with no robots.txt row gets the allow-all negative-cache entry
    val stateDir2 = java.nio.file.Files.createTempDirectory("graft-norobots-").toString
    CrawlEngine.run(spark, SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF(),
      spark.createDataset(SyntheticWeb.seedUrls(nHosts)), cfg.copy(maxRounds = 2), stateDir2)
    val rt2 = SnapshotStore.read(spark,
      SnapshotStore.latestManifest(stateDir2).get, "robots").as[RobotsEntry].collect()
    assert(rt2.nonEmpty && rt2.forall(r => r.allow.isEmpty && r.disallow.isEmpty))
  }

  test("C5: crawl-delay closes a host's window for ceil(D/roundTime) rounds") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF().cache()
    // host0 serves Crawl-delay: 2.5s against the 1s logical round
    val delayed = robots.map(r =>
      if (r.host == "host0.example") r.copy(crawl_delay_ms = 2500L) else r)
    val stateDir = java.nio.file.Files.createTempDirectory("graft-delay-").toString
    CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts),
      delayed, cfg, stateDir)
    val m = SnapshotStore.latestManifest(stateDir).get
    // engine (roundNo, fetched-set) per committed round == delay-aware sim
    val (simSeen, simDrains) = simulate(delayed)
    val simFetched = simDrains.map { case (r, us) => (r, us.filter(pageMap.contains).toSet) }
    val versions = (1 to m.version).flatMap { v =>
      scala.util.Try(SnapshotStore.readManifest(stateDir, v)).toOption
    }
    val engineFetched = versions.map { mr =>
      (mr.counters("round").toInt,
        SnapshotStore.read(spark, mr, "outputs").select("url").as[String].collect().toSet)
    }
    assert(engineFetched == simFetched,
      s"per-round fetch parity under crawl-delay:\n e=$engineFetched\n s=$simFetched")
    // host0 fetch rounds spaced >= ceil(2500/1000) = 3 apart
    val host0Rounds = engineFetched.filter(_._2.exists(_.contains("host0"))).map(_._1)
    assert(host0Rounds.size >= 2, "need at least two host0 windows to assert spacing")
    host0Rounds.sliding(2).foreach { case Seq(a, b) =>
      assert(b - a >= 3, s"host0 drained in rounds $a and $b, closer than its delay")
    }
    // seen-set parity too
    val engineSeen = CrawlEngine.readSeenDirs(spark,
        SnapshotStore.dirsOf(m, "seen"))
      .select("url_hash").as[Long].collect().toSet
    assert(engineSeen == simSeen.map(UrlOps.fnv1a64))
  }

  test("legacy (pre-delta-format) snapshots are rejected loudly, not resumed as empty") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-legacy-").toString
    // fabricate a round-1-format manifest: full `frontier` table dir, no
    // frontier_size counter
    val df = Seq(("https://host0.example/page/0", 1L)).toDF("url", "url_hash")
    df.write.parquet(s"$stateDir/data/v0/frontier")
    SnapshotStore.writeManifest(stateDir, SnapshotStore.Manifest(0,
      Map("frontier" -> s"$stateDir/data/v0/frontier"), Map("round" -> -1L)))
    val pages = SyntheticWeb.pagesFast(spark, 8, nHosts, 2).toDF()
    val e = intercept[IllegalStateException] {
      CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts), robots, cfg, stateDir)
    }
    assert(e.getMessage.contains("incompatible legacy snapshot format"))
  }

  test("crawl is resumable from the latest snapshot with identical final state") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF().cache()

    // full run
    val fullDir = java.nio.file.Files.createTempDirectory("graft-full-").toString
    val fullStats = CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts),
      robots, cfg, fullDir)

    // interrupted run: only 2 rounds, then resume with full budget
    val partDir = java.nio.file.Files.createTempDirectory("graft-part-").toString
    CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts),
      robots, cfg.copy(maxRounds = 2), partDir)
    // simulate crash: a torn uncommitted write must be invisible
    val resumedStats = CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts),
      robots, cfg, partDir)

    assert(resumedStats.fetched == fullStats.fetched)
    assert(resumedStats.extractedRows == fullStats.extractedRows)
    assert(resumedStats.seenSize == fullStats.seenSize)
    val fullSeen = CrawlEngine.readSeenDirs(spark, SnapshotStore.dirsOf(
        SnapshotStore.latestManifest(fullDir).get, "seen"))
      .select("url_hash").as[Long].collect().toSet
    val resumedSeen = CrawlEngine.readSeenDirs(spark, SnapshotStore.dirsOf(
        SnapshotStore.latestManifest(partDir).get, "seen"))
      .select("url_hash").as[Long].collect().toSet
    assert(fullSeen == resumedSeen)
  }

  test("drain-to-exhaustion writes no empty seen deltas (count-first steady state)") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF().cache()
    // seed every page PLUS every extractable link, so each round's
    // discovered candidates are all dups: after the bootstrap the crawl is a
    // pure drain, and the engine must carry the bootstrap's single seen dir
    // forward without committing a new (empty) delta dir per round
    val allUrls = (pageMap.keys.toSeq ++ pageMap.flatMap { case (u, html) =>
      Detector.extractLinks(u, HtmlParser.parseBytes(html))
        .map(UrlOps.canonicalize)
    }).distinct.filter(!_.endsWith("/robots.txt"))
    val drainCfg = cfg.copy(roundSize = 8, hostBudgetPerRound = 100, maxRounds = 16)
    val stateDir = java.nio.file.Files.createTempDirectory("graft-drain-").toString
    val stats = CrawlEngine.runWithRules(spark, pages, allUrls, robots, drainCfg, stateDir)
    assert(stats.fetched > 0)
    val m = SnapshotStore.latestManifest(stateDir).get
    val seenDirs = SnapshotStore.dirsOf(m, "seen")
    assert(seenDirs.length == 1,
      s"pure drain must not accumulate seen delta dirs, got ${seenDirs.length}")
    // and the seen set is exactly the robots-allowed seeds
    val seen = CrawlEngine.readSeenDirs(spark, seenDirs)
      .select("url_hash").as[Long].collect().toSet
    val rules = robots.map(r => r.host -> r).toMap
    val expected = allUrls.map(UrlOps.canonicalize).distinct
      .filter(ruleAllows(rules, _)).map(UrlOps.fnv1a64).toSet
    assert(seen == expected)
  }

  test("P14: test-mode skips seed urls containing 'example'") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF()
    val stateDir = java.nio.file.Files.createTempDirectory("graft-testmode-").toString
    val stats = CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts),
      robots, cfg.copy(isTest = true), stateDir)
    assert(stats.fetched == 0 && stats.seenSize == 0, "all example seeds skipped")
    // non-example seeds survive test mode (and simply fetch nothing here)
    val stateDir2 = java.nio.file.Files.createTempDirectory("graft-testmode2-").toString
    val stats2 = CrawlEngine.runWithRules(spark, pages,
      Seq("https://real.site/page/0"), robots, cfg.copy(isTest = true), stateDir2)
    assert(stats2.seenSize == 1)
  }

  test("P11: internal-link subset keeps same-domain links only") {
    val (h, k) = (0, 1) // page with a cross-host friend link (xh=3)
    val html = SyntheticWeb.pageHtml(h, k, 10, nHosts)
    val url = SyntheticWeb.pageUrl(h, k)
    val doc = HtmlParser.parseBytes(html.getBytes("UTF-8"))
    val g = graft.detect.PageGraph(doc).get
    val all = graft.detect.Pagination.linkNodeIdxs(g)
    val internal = graft.detect.Pagination.internalLinkNodeIdxs(g, url)
    assert(internal.nonEmpty && internal.size < all.size)
    assert(internal.forall(i =>
      UrlOps.urlDomain(UrlOps.transformUrl(url, g.node(i).attr("href").get)) == "host0.example"))
    // excluded: the cross-host friend link, plus the header "/" link — "/"
    // is a substring of the regex literal "^(https?:)?//", so the
    // reference's reversed-re.search bug treats it as ABSOLUTE and leaves
    // it untransformed (domain "" != root domain). Bug-compat preserved.
    val excluded = all.diff(internal).map(i => g.node(i).attr("href").get)
    assert(excluded.toSet == Set("/", "https://host3.example/page/0"))
  }

  test("robots.txt parsing: groups, agent specificity, crawl-delay") {
    val body =
      """# example robots file
        |User-agent: *
        |Disallow: /private
        |Crawl-delay: 1.5
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /tag
        |Disallow: /search
        |
        |User-agent: evilbot
        |Disallow: /
        |Sitemap: https://h.example/sitemap.xml
        |""".stripMargin
    val r = graft.frontier.Robots.rule("h.example", body, userAgent = "graftbot/1.0")
    assert(r.disallow_prefixes == Seq("/tag", "/search"))
    assert(r.crawl_delay_ms == 0L)
    val fallback = graft.frontier.Robots.rule("h.example", body, userAgent = "randombot")
    assert(fallback.disallow_prefixes == Seq("/private"))
    assert(fallback.crawl_delay_ms == 1500L)
    val evil = graft.frontier.Robots.rule("h.example", body, userAgent = "EvilBot/2")
    assert(evil.disallow_prefixes == Seq("/"))
    // empty / missing robots allows everything
    assert(graft.frontier.Robots.rule("h.example", "").disallow_prefixes.isEmpty)
    // empty Disallow in a matching group allows everything
    val open = "User-agent: *\nDisallow:\n"
    assert(graft.frontier.Robots.rule("h.example", open).disallow_prefixes.isEmpty)
  }

  test("robots Allow: RFC 9309 longest-match precedence, allow wins ties") {
    val body =
      """User-agent: *
        |Disallow: /
        |Allow: /public
        |Disallow: /public/secret
        |Allow: /public/secret/ok
        |""".stripMargin
    val r = graft.frontier.Robots.rule("h.example", body)
    assert(r.allow_prefixes == Seq("/public", "/public/secret/ok"))
    assert(r.disallow_prefixes == Seq("/", "/public/secret"))
    import graft.frontier.Robots.allowed
    assert(!allowed("/anything", r.allow_prefixes, r.disallow_prefixes))
    assert(allowed("/public/page", r.allow_prefixes, r.disallow_prefixes))
    assert(!allowed("/public/secret/x", r.allow_prefixes, r.disallow_prefixes))
    assert(allowed("/public/secret/ok/x", r.allow_prefixes, r.disallow_prefixes))
    // tie: Allow and Disallow same length -> allow wins
    assert(allowed("/a", Seq("/a"), Seq("/a")))
    // no matching disallow -> allowed regardless of allows
    assert(allowed("/elsewhere", Seq.empty, Seq("/private")))
    // serialize/parse round-trip preserves the rule
    val rt = graft.frontier.Robots.rule("h.example", graft.frontier.Robots.serialize(r))
    assert(rt == r)
  }

  test("robots wildcards: RFC 9309 * and $ matching") {
    import graft.frontier.Robots.{allowed, matches}
    // * matches any sequence
    assert(matches("/x/private/a", "/*/private"))
    assert(!matches("/private", "/*/private"))
    assert(matches("/a/b/c.php", "/a*php"))
    assert(matches("/ab", "/a*"))
    assert(matches("/a--b--c", "/a*b*c"))
    assert(!matches("/a--c--b", "/a*b*c"))
    // $ anchors at path end
    assert(matches("/page.php", "/*.php$"))
    assert(!matches("/page.php?x=1", "/*.php$")) // query not in path here
    assert(!matches("/page.phpx", "/*.php$"))
    assert(matches("/exact", "/exact$"))
    assert(!matches("/exactly", "/exact$"))
    assert(matches("/any/thing", "/any*$"))
    // plain prefixes keep prefix semantics
    assert(matches("/private/sub", "/private"))
    // precedence with wildcard rules: longest pattern wins, Allow wins ties
    assert(!allowed("/files/secret.pdf", Seq("/files"), Seq("/files/*.pdf$")))
    assert(allowed("/files/notes.txt", Seq("/files"), Seq("/files/*.pdf$")))
  }

  test("robots match path PLUS query (RFC 9309: query-string rules can hit)") {
    import graft.frontier.Robots.allowed
    // pathQueryOfCanonical keeps the ?query tail
    assert(UrlOps.pathQueryOfCanonical("https://h.example/a/b?x=1&y=2") == "/a/b?x=1&y=2")
    assert(UrlOps.pathQueryOfCanonical("https://h.example/a/b") == "/a/b")
    assert(UrlOps.pathQueryOfCanonical("https://h.example/") == "/")
    // a Disallow rule targeting a query parameter now matches
    val dis = Seq("/*?*sessionid=")
    assert(!allowed(UrlOps.pathQueryOfCanonical(
      UrlOps.canonicalize("https://h.example/page?sessionid=5")), Seq.empty, dis))
    assert(allowed(UrlOps.pathQueryOfCanonical(
      UrlOps.canonicalize("https://h.example/page")), Seq.empty, dis))
  }

  test("codegen robots gate matches the reference predicate row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit, typedLit}
    val urls = Seq(
      "https://h.example/", "https://h.example/private/x",
      "https://h.example/public/ok", "https://h.example/p?sessionid=9",
      "https://h.example/files/doc.pdf", "https://h.example/files/doc.txt")
    val allow = Seq("/public")
    val dis = Seq("/private", "/*?*sessionid=", "/files/*.pdf$")
    val df = urls.toDF("url")
      .withColumn("allow", typedLit(allow))
      .withColumn("disallow", typedLit(dis))
    val got = df.filter(graft.functions.RobotsFunctions.robots_allowed(
        col("url"), col("allow"), col("disallow")))
      .select("url").as[String].collect().toSet
    val want = urls.filter(u => graft.frontier.Robots.allowed(
      UrlOps.pathQueryOfCanonical(u), allow, dis)).toSet
    assert(got == want)
    assert(want.contains("https://h.example/public/ok"))
    assert(!want.contains("https://h.example/p?sessionid=9"))
    assert(!want.contains("https://h.example/files/doc.pdf"))
  }

  test("robots fetch joins by HOST: an http-discovered host finds its https robots row") {
    import spark.implicits._
    val body = "User-agent: *\nDisallow: /blocked\n"
    val robotsSrc = Seq(
      ("https://h1.example/robots.txt",
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      // h2 carries BOTH schemes: https (max) must win deterministically
      ("http://h2.example/robots.txt",
        "User-agent: *\nDisallow: /http-only\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      ("https://h2.example/robots.txt",
        "User-agent: *\nDisallow: /https-wins\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ).toDF("url", "html")
    val hosts = Seq("h1.example", "h2.example", "h3.example").toDF("host")
    val got = CrawlEngine.fetchRobots(spark, hosts, robotsSrc, "graftbot")
      .collect().map(r => r.host -> r.disallow).toMap
    assert(got("h1.example") == Seq("/blocked")) // found despite scheme mismatch
    assert(got("h2.example") == Seq("/https-wins"))
    assert(got("h3.example") == Seq.empty) // 404 negative cache: allow-all
  }

  test("robots filter blocks disallowed prefixes") {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages, nHosts, 4).toDF().cache()
    val stateDir = java.nio.file.Files.createTempDirectory("graft-robots-").toString
    CrawlEngine.runWithRules(spark, pages, SyntheticWeb.seedUrls(nHosts), robots, cfg, stateDir)
    val m = SnapshotStore.latestManifest(stateDir).get
    val frontierUrls = CrawlEngine.readFrontier(spark, m)
      .select("url").as[String].collect()
    // /private is disallowed everywhere, except host2's Allow-excepted area0
    assert(!frontierUrls.exists(u => u.contains("/private") &&
        u != "https://host2.example/private/area0"),
      "disallowed /private urls must never be enqueued")
    // lineage recorded robots blocks
    val lineage = SnapshotStore.read(spark, m, "lineage")
    import org.apache.spark.sql.functions._
    val blocked = lineage.filter(col("bucket") === -1)
      .agg(sum("robots_blocked")).as[Long].head()
    assert(blocked > 0)
  }

  test("CuckooSeen expression matches CuckooFilter.contains under codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.frontier.CuckooFilter
    val rnd = new scala.util.Random(7)
    val nb = 4
    val filters = Array.tabulate(nb)(b =>
      if (b == 3) null // missing bucket row = nothing folded = probe false
      else CuckooFilter.create(1000))
    val keys = (0 until 2000).map(_ => rnd.nextLong())
    keys.zipWithIndex.foreach { case (k, i) =>
      val b = i % nb
      if (filters(b) != null && i % 2 == 0) filters(b).add(k)
    }
    val bc = spark.sparkContext.broadcast(filters)
    val rows = keys.zipWithIndex.map { case (k, i) => (i % nb, k) }
    val df = rows.toDF("bucket", "url_hash")
    val got = df
      .withColumn("seen", graft.functions.CuckooFunctions.cuckoo_seen(
        bc, col("bucket"), col("url_hash")))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    rows.foreach { case (b, k) =>
      val want = filters(b) != null && filters(b).contains(k)
      assert(got((b, k)) == want, s"probe mismatch for bucket=$b key=$k")
    }
    bc.destroy()
  }
}
