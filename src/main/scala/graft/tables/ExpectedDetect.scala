package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.urls.UrlOps

/** Closed-form EXPECTED outputs for the detect/crawl queries (c1–c7), derived
  * from the SyntheticWeb fixture contract alone — no parser, no detector, no
  * CSS engine runs here. Verify writes these tables to parquet so the
  * driver's DuckDB oracle can check the flagship detect path value-for-value
  * (VERDICT round 1, "What's missing" #1).
  *
  * The golden selector strings are fixture constants (the reference golden
  * selector shape, /root/reference/webspot/test/detect/test_plain_list.py:
  * 9-16, generalized to this generator); ExpectedDetectSpec pins detector
  * output == these tables at test time, and the driver's DuckDB compare pins
  * the distributed queries == these tables at verify time.
  */
object ExpectedDetect {

  import SyntheticWeb._

  // ---- golden fixture constants (asserted by ExpectedDetectSpec) ----
  val ItemsSelector = "div.quote"
  val FullItemsSelector = s"$GoldenListSelector > $ItemsSelector"
  /** next-link selector: the pagination nav anchor, unless a sidebar link
    * resolves to the same next-page url — the detector keeps the LAST match
    * in document order (reference pagination.py:83-87).
    */
  val NextSelNav = "li.next > a"
  val NextSelSidebarRelated = "div.col-md-4.tags-box > span.tag-item > a.tag"
  val NextSelSidebarPopular = "div.col-md-4.tags-box > span.tag-item:nth-of-type(2) > a.tag"

  val AboutText = "(about)"

  /** Field rules the detector mines from a quotes item, in mining order:
    * (field name, per-item expected value function). BFS over the item
    * subtree: direct children first (span.text, span, div.tags), then depth 2.
    * "div.quote > span" selects FIRST span = span.text, so Field_text_2
    * repeats the quote.
    */
  def fieldValues(host: Int, k: Long, i: Int): Seq[(String, String)] = {
    val author = itemAuthor(host, k, i)
    val tags = itemTags(host, k, i)
    val quote = quoteText(host, k, i)
    val base = s"https://${hostName(host)}"
    Seq(
      "Field_text_1" -> quote,
      "Field_text_2" -> quote,
      "Field_text_3" -> ("Tags:\n            \n            " + tags.mkString("\n            ")),
      "Field_text_4" -> author,
      "Field_text_5" -> AboutText,
      "Field_link_url_6" -> s"$base/author/${authorSlug(author)}",
      "Field_text_7" -> tags.head,
      "Field_link_url_8" -> s"$base/tag/${tags.head}/page/1/")
  }

  /** Outlinks of a quotes page in document order, deduped keeping first —
    * mirrors the page template: header, login, per-item author+tags, next
    * nav, sidebar (related, popular, cross-host friend, disallowed private).
    */
  def links(host: Int, k: Long, nOnHost: Long, nHosts: Int): Vector[String] = {
    val base = s"https://${hostName(host)}"
    val (l1, l2, xh) = sidebarTargets(host, k, nOnHost, nHosts)
    val b = Vector.newBuilder[String]
    b += s"$base/"
    b += s"$base/login"
    (0 until itemCount(host, k)).foreach { i =>
      b += s"$base/author/${authorSlug(itemAuthor(host, k, i))}"
      itemTags(host, k, i).foreach(t => b += s"$base/tag/$t/page/1/")
    }
    if (k + 1 < nOnHost) b += s"$base/page/${k + 1}"
    b += s"$base/page/$l1"
    b += s"$base/page/$l2"
    b += s"https://${hostName(xh)}/page/0"
    b += s"$base/private/area$k"
    b.result().distinct
  }

  def nextUrl(host: Int, k: Long, nOnHost: Long): Option[String] =
    if (k + 1 < nOnHost) Some(s"https://${hostName(host)}/page/${k + 1}") else None

  def nextSelector(host: Int, k: Long, nOnHost: Long, nHosts: Int): Option[String] =
    nextUrl(host, k, nOnHost).map { _ =>
      val (l1, l2, _) = sidebarTargets(host, k, nOnHost, nHosts)
      if (l2 == k + 1) NextSelSidebarPopular
      else if (l1 == k + 1) NextSelSidebarRelated
      else NextSelNav
    }

  /** (host, k, nOnHost) for every page of a pagesFast table. */
  def fastPages(nPages: Long, nHosts: Int): Seq[(Int, Long, Long)] = {
    val cuts = fastCuts(nPages, nHosts)
    (0 until nHosts).flatMap { h =>
      val n = cuts(h + 1) - cuts(h)
      (0L until n).map(k => (h, k, n))
    }
  }

  // --------------------------------------------------- expected tables

  def c1(spark: SparkSession, nPages: Long, nHosts: Int): DataFrame = {
    import spark.implicits._
    fastPages(nPages, nHosts).map { case (h, k, n) =>
      (pageUrl(h, k), "List 1", GoldenListSelector, FullItemsSelector, itemCount(h, k))
    }.toDF("url", "name", "list_selector", "full_items_selector", "n_rows")
  }

  def c2(spark: SparkSession, nPages: Long, nHosts: Int): DataFrame = {
    import spark.implicits._
    fastPages(nPages, nHosts).flatMap { case (h, k, n) =>
      (0 until itemCount(h, k)).flatMap { i =>
        fieldValues(h, k, i).sortBy(_._1).map { case (f, v) => (pageUrl(h, k), i, f, v) }
      }
    }.toDF("url", "item_idx", "field", "value")
  }

  def c3(spark: SparkSession, nPages: Long, nHosts: Int): DataFrame = {
    import spark.implicits._
    fastPages(nPages, nHosts).map { case (h, k, n) =>
      (pageUrl(h, k), true, expectedText(h, k).length)
    }.toDF("url", "matches", "n_chars")
  }

  def c4(spark: SparkSession, nPages: Long, nHosts: Int): DataFrame = {
    import spark.implicits._
    fastPages(nPages, nHosts).flatMap { case (h, k, n) =>
      nextSelector(h, k, n, nHosts).map(sel => (pageUrl(h, k), sel, nextUrl(h, k, n).get))
    }.toDF("url", "next_selector", "next_url")
  }

  /** highlight markers: one "webspot-highlight-container" per addClass call —
    * list(1) + items(nItems) + per item: 5 single-match fields + the
    * double-match "div.quote > span" + 2×nTags tag fields = 7 + 2·nTags;
    * plus the pagination node when a next link exists. One primary label per
    * list and per pagination.
    */
  def c6(spark: SparkSession, nPages: Long, nHosts: Int): DataFrame = {
    import spark.implicits._
    fastPages(nPages, nHosts).map { case (h, k, n) =>
      val nItems = itemCount(h, k)
      val perItem = (0 until nItems).map(i => 7 + 2 * itemTags(h, k, i).length).sum
      val hasNext = if (k + 1 < n) 1 else 0
      (pageUrl(h, k), 1 + nItems + perItem + hasNext, 1 + hasNext)
    }.toDF("url", "n_markers", "n_labels")
  }

  /** /api/links: per list, the link field with max total stripped text wins
    * (first max on ties — reference link.py:54-109): about-links (7 chars ×
    * nItems, mined first) vs first-tag links (Σ len(tags_i.head)).
    */
  def c7(spark: SparkSession, nPages: Long, nHosts: Int): DataFrame = {
    import spark.implicits._
    fastPages(nPages, nHosts).flatMap { case (h, k, n) =>
      val url = pageUrl(h, k)
      val base = s"https://${hostName(h)}"
      val nItems = itemCount(h, k)
      val aboutSum = AboutText.length * nItems
      val firstTags = (0 until nItems).map(i => itemTags(h, k, i).head)
      val tagSum = firstTags.map(_.length).sum
      val links =
        if (tagSum > aboutSum)
          firstTags.map(t => (s"$base/tag/$t/page/1/", t))
        else
          (0 until nItems).map { i =>
            val a = itemAuthor(h, k, i)
            (s"$base/author/${authorSlug(a)}", AboutText)
          }
      links.map { case (lu, lt) => (url, "List 1", lu, lt) }
    }.toDF("url", "list_name", "link_url", "link_text")
  }

  /** books fixture: (url, item_idx, title, price) in closed form. */
  def c8(spark: SparkSession, nHosts: Int, nPerHost: Long): DataFrame = {
    import spark.implicits._
    (for (h <- 0 until nHosts; k <- 0L until nPerHost) yield (h, k)).flatMap {
      case (h, k) =>
        (0 until bookItemCount(h, k)).map { i =>
          (booksPageUrl(h, k), i, bookTitle(h, k, i), f"£${bookPrice(h, k, i)}%.2f")
        }
    }.toDF("url", "item_idx", "title", "price")
  }

  // --------------------------------------------------- c5: crawl simulator

  /** Independent single-threaded crawl simulator over the closed-form link
    * graph (no HTML parsing): BFS rounds with crawl-delay windows, per-host
    * politeness budget, global priority drain, in-round min-depth dedup,
    * robots RFC-9309 allow/disallow gate (after dedup — the engine's order),
    * enqueue-time seen-set dedup — the engine's documented policy (SURVEY.md
    * §2.9). Seeds are robots-gated like candidates. Emits the global
    * (bucket = -1) lineage counters per round, which is exactly what the c5
    * query returns.
    */
  def c5(spark: SparkSession, nPages: Long, nHosts: Int,
      hostBudget: Int, roundSize: Int, maxRounds: Int,
      roundTimeMs: Long = 1000L): DataFrame = {
    import spark.implicits._
    val pageOf: Map[String, (Int, Long, Long)] =
      fastPages(nPages, nHosts).map { case (h, k, n) => pageUrl(h, k) -> ((h, k, n)) }.toMap
    val rules: Map[String, (Seq[String], Seq[String], Long)] =
      robotsRules(nHosts).map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def allowed(u: String): Boolean = rules.get(UrlOps.hostOf(u)) match {
      case None => true
      case Some((alw, dis, _)) =>
        // path+query, like the engine's robots gate (RFC 9309 §2.2.2)
        graft.frontier.Robots.allowed(
          UrlOps.pathQueryOfCanonical(UrlOps.canonicalize(u)), alw, dis)
    }

    // frontier entries: (depth, canon url); drain order = (depth asc, url asc)
    var frontier = Set.empty[(Int, String)]
    var seen = Set.empty[String]
    seedUrls(nHosts).map(UrlOps.canonicalize).distinct.filter(allowed).foreach { u =>
      frontier += ((0, u)); seen += u
    }
    val nextOk = scala.collection.mutable.Map.empty[String, Int]

    val rows = Vector.newBuilder[(Int, Int, Long, Long, Long, Long, Long, Long, Long, Long)]
    var round = 0
    var continue = true
    while (continue && round < maxRounds) {
      val ordered = frontier.toVector.sorted
      val perHost = scala.collection.mutable.Map.empty[String, Int]
      val eligible = ordered.filter { case (_, u) =>
        val h = UrlOps.hostOf(u)
        if (nextOk.getOrElse(h, 0) > round) false
        else {
          val c = perHost.getOrElse(h, 0)
          if (c < hostBudget) { perHost(h) = c + 1; true } else false
        }
      }
      val drained = eligible.take(roundSize)
      if (drained.isEmpty) {
        // idle round: all remaining hosts inside a crawl-delay window
        if (frontier.nonEmpty && nextOk.valuesIterator.exists(_ > round)) round += 1
        else continue = false
      }
      else {
        val deferred = frontier.size.toLong - drained.size
        frontier --= drained
        var fetched = 0L
        var extracted = 0L
        var candidates = 0L
        var cands = Vector.empty[(Int, String)]
        drained.foreach { case (depth, u) =>
          pageOf.get(u).foreach { case (h, k, n) =>
            fetched += 1
            extracted += itemCount(h, k)
            val ls = links(h, k, n, nHosts).map(UrlOps.canonicalize).distinct
            candidates += ls.size
            ls.foreach(c => cands = cands :+ ((depth + 1, c)))
          }
        }
        // in-round dedup first (min (depth, url) per canon url), then robots
        val deduped = cands.groupBy(_._2).valuesIterator.map(_.min).toVector
        val admitted = deduped.filter { case (_, c) => allowed(c) }
        val fresh = admitted.filterNot { case (_, c) => seen.contains(c) }
        fresh.foreach { case (d, c) => seen += c; frontier += ((d, c)) }
        // crawl-delay: drained hosts with delay spanning >1 round close
        drained.iterator.map(e => UrlOps.hostOf(e._2)).distinct.foreach { h =>
          rules.get(h).foreach { case (_, _, delay) =>
            if (delay > roundTimeMs)
              nextOk(h) = round + math.ceil(delay.toDouble / roundTimeMs).toInt
          }
        }
        rows += ((round, -1, drained.size.toLong, fetched, extracted, candidates,
          (deduped.size - admitted.size).toLong,
          (candidates - deduped.size).toLong,
          fresh.size.toLong, deferred))
        round += 1
      }
    }
    rows.result().toDF("round", "bucket", "drained", "fetched", "extracted_rows",
      "candidates", "robots_blocked", "deduped", "new_urls", "politeness_deferred")
  }

  /** Absolute dir the expected tables are written to (and the oracle SQL
    * reads from). Anchored explicitly: GRAFT_EXPECTED_DIR wins, else the
    * directory of this class's compiled location... is not knowable offline,
    * so fall back to cwd — and oracleSql FAILS LOUDLY if the tables are not
    * where the SQL will point (a cwd mismatch between the writing job and
    * the verify driver would otherwise read nothing or stale tables).
    */
  def outputDir: String =
    sys.env.get("GRAFT_EXPECTED_DIR")
      .map(new java.io.File(_).getAbsolutePath)
      .getOrElse(new java.io.File("target/verify-expected").getAbsolutePath)

  /** Write every expected table; returns name -> path. Parameters MUST match
    * the corresponding Queries entries.
    */
  def writeAll(spark: SparkSession): Map[String, String] = {
    val dir = outputDir
    val tables: Map[String, DataFrame] = Map(
      "c1_detect_lists" -> c1(spark, 48, 4),
      "c2_extract_rows" -> c2(spark, 24, 4),
      "c3_text_parity" -> c3(spark, 32, 4),
      "c4_pagination" -> c4(spark, 24, 4),
      "c5_crawl_rounds" -> c5(spark, 64, 4, hostBudget = 4, roundSize = 32, maxRounds = 3),
      "c6_highlight" -> c6(spark, 16, 4),
      "c7_links" -> c7(spark, 16, 4),
      "c8_books_extract" -> c8(spark, 4, 4))
    tables.map { case (name, df) =>
      val p = s"$dir/$name"
      df.coalesce(1).write.mode("overwrite").parquet(p)
      name -> p
    }
  }

  /** Oracle SQL for the fixture-oracled queries: DuckDB reads the expected
    * parquet directly (closed-form tables, not produced by the engine).
    */
  /** The fixture-oracled query names — stable even when the expected tables
    * are absent (the degrade path emits failing sentinels under these names
    * so a broken fixture setup FAILS the round instead of shrinking it).
    */
  val names: Seq[String] = Seq("c1_detect_lists", "c2_extract_rows",
    "c3_text_parity", "c4_pagination", "c5_crawl_rounds", "c6_highlight",
    "c7_links", "c8_books_extract")

  def oracleSql: Map[String, String] = {
    val dir = outputDir
    val missing = names.filterNot(n => new java.io.File(s"$dir/$n").isDirectory)
    require(missing.isEmpty,
      s"expected tables absent under $dir (run ExpectedDetect.writeAll from " +
        s"the same working dir / GRAFT_EXPECTED_DIR first): ${missing.mkString(", ")}")
    names.map(n => n -> s"SELECT * FROM read_parquet('$dir/$n/*.parquet')").toMap
  }
}
