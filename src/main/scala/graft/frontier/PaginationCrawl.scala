package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.css.CssSelector
import graft.detect.{Detector, FieldRule}
import graft.dom.HtmlParser
import graft.urls.UrlOps

/** Recursive pagination crawl (C9, SURVEY.md §3.2): learn extraction rules on
  * the seed page(s), then follow each page's `next` selector re-extracting
  * with the SAME learned rules — the semantics of the reference CLI
  * (/root/reference/webspot/cmd/crawl.py:39-66), where attribute fields
  * return the raw attribute (no urljoin — unlike detect-time extraction) and
  * text fields return stripped subtree text.
  *
  * Spark shape: many chains advance together; each iteration is one batch job
  * mapping the current chain heads -> (rows, next url). The driver loop
  * terminates when every chain ends or maxHops is reached.
  */
object PaginationCrawl {

  final case class LearnedRules(
      itemsSelector: String,
      fields: Seq[FieldRule],
      paginationSelector: Option[String])

  final case class CrawlRow(start_url: String, page_url: String, hop: Int,
      item_idx: Int, values: Map[String, String])

  /** Learn rules from one page's html (reference: extract_rules on the seed,
    * take plain_list[0] + pagination[0]).
    */
  def learn(url: String, html: Array[Byte]): Option[LearnedRules] = {
    val out = Detector.detectHtml(url, html)
    out.lists.headOption.map { top =>
      LearnedRules(top.fullItemsSelector, top.fields,
        out.pagination.map(_.selector))
    }
  }

  /** Apply learned rules to one page (crawl.py:43-66 crawl_page body). */
  def applyRules(url: String, html: Array[Byte], rules: LearnedRules):
      (Vector[Map[String, String]], Option[String]) = {
    val doc = HtmlParser.parseBytes(html)
    val parsedFields = rules.fields.map(f => (f, CssSelector.parse(f.selector)))
    val rows = CssSelector.selectAll(doc, rules.itemsSelector).map { itemId =>
      val cands = CssSelector.descendants(doc, itemId)
      val row = Map.newBuilder[String, String]
      parsedFields.foreach { case (f, sel) =>
        CssSelector.selectOneAmong(doc, sel, cands).foreach { fid =>
          if (f.attribute.nonEmpty) doc(fid).attr(f.attribute).foreach(v => row += (f.name -> v))
          else row += (f.name -> doc.subtreeText(fid).strip())
        }
      }
      row.result()
    }
    val next = rules.paginationSelector.flatMap { sel =>
      CssSelector.selectOne(doc, sel).flatMap(id => doc(id).attr("href"))
        .map(href => UrlOps.resolve(url, href))
    }
    (rows, next)
  }

  /** Crawl all chains: learn on each seed, then advance every chain one hop
    * per batch iteration.
    */
  /** `workDir`: where per-hop rows spill (the returned Dataset lazily reads
    * it, so it must outlive consumption). Default: a temp dir cleaned at JVM
    * exit (graft.util.TempDirs); pass an explicit dir to keep the result
    * across processes.
    */
  def crawl(spark: SparkSession, pages: DataFrame, seeds: Seq[String],
      maxHops: Int = 32, workDir: Option[String] = None): Dataset[CrawlRow] = {
    import spark.implicits._

    val pagesKv = pages.select($"url", $"html")

    // learn rules per seed (one small batch job)
    val seedDs = seeds.toDF("url")
    val ruleRows = pagesKv.join(broadcast(seedDs), Seq("url"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) => learn(url, html).map(r => (url, r)) }
      .collect()
    val rulesMap = spark.sparkContext.broadcast(ruleRows.toMap)

    // chains: (start_url, current_url, hop)
    var chains = ruleRows.map { case (u, _) => (u, u, 0) }.toSeq
    val visited = scala.collection.mutable.Set.empty[(String, String)]
    chains.foreach { case (s, u, _) => visited += ((s, u)) }
    // per-hop rows SPILL to parquet instead of accumulating a maxHops-deep
    // union lineage with never-released persists: each hop's cache is freed
    // as soon as its rows are written, and the returned Dataset reads a flat
    // table (bounded plan depth at any chain length)
    val outDir = workDir.getOrElse(
      graft.util.TempDirs.create("graft-pagcrawl-").toString)
    var wroteAny = false
    var hop = 0
    while (chains.nonEmpty && hop < maxHops) {
      val chainDf = chains.toDF("start_url", "url", "hop")
      // extracted rows stay distributed; only (start, next) chain heads —
      // one tiny tuple per chain — come back to the driver
      val step = pagesKv.join(broadcast(chainDf), Seq("url"))
        .select($"start_url", $"url", $"hop", $"html")
        .as[(String, String, Int, Array[Byte])]
        .map { case (start, url, h, html) =>
          val rules = rulesMap.value(start)
          val (rows, next) = applyRules(url, html, rules)
          (start, url, h, rows, next.orNull)
        }
        .persist()
      step.flatMap { case (start, url, h, rs, _) =>
        rs.zipWithIndex.map { case (r, i) => CrawlRow(start, url, h, i, r) }
      }.write.mode("append").parquet(outDir)
      wroteAny = true
      val nexts = step.map { case (start, _, h, _, next) => (start, h, next) }
        .collect()
      step.unpersist()
      chains = nexts.toSeq.collect {
        case (start, h, next) if next != null && visited.add((start, next)) =>
          (start, next, h + 1)
      }
      hop += 1
    }
    if (!wroteAny) spark.emptyDataset[CrawlRow]
    else spark.read.parquet(outDir).as[CrawlRow]
  }
}
