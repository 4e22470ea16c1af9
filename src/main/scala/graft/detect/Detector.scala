package graft.detect

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.dom.{DomDocument, HtmlParser}

/** The authoritative input row shape (BASELINE.json input_hint). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** The fused per-page detect map — stages 1-4 of the reference's request
  * lifecycle (/root/reference/webspot/extract/extract_results.py:12-86)
  * collapsed into ONE narrow map: parse DOM → graph → plain-list detect →
  * pagination detect. No shuffle; Catalyst sees a single deterministic
  * function over (url, html) — SURVEY.md §3.1.
  */
object Detector {

  def detectHtml(url: String, html: Array[Byte]): DetectOutput = {
    val doc = HtmlParser.parseBytes(html)
    detectDoc(url, doc)
  }

  def detectDoc(url: String, doc: DomDocument): DetectOutput = {
    PageGraph(doc) match {
      case None => DetectOutput(url, 0, Vector.empty, None)
      case Some(g) =>
        val lists = PlainList.run(doc, g, url)
        val pagination = Pagination.run(doc, g, url)
        DetectOutput(url, g.n, lists, pagination)
    }
  }

  /** Outlink extraction for the crawler (C2 in SURVEY.md §2.9): resolved
    * hrefs of all <a> nodes, document order, deduped.
    */
  def extractLinks(url: String, doc: DomDocument): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    doc.nodes.foreach { nd =>
      if (nd.tag == "a") nd.attr("href").foreach { href =>
        val h = href.strip()
        if (h.nonEmpty && !h.startsWith("#") && !h.toLowerCase.startsWith("javascript:") &&
          !h.toLowerCase.startsWith("mailto:"))
          seen += graft.urls.UrlOps.resolve(url, h)
      }
    }
    seen.toVector
  }

  /** Typed whole-table detect: one narrow map over the pages table. */
  def detect(pages: Dataset[Page]): Dataset[DetectOutput] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map(p => detectHtml(p.url, p.html))
  }
}
