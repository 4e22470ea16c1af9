package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser
import graft.detect.{Detector, PageGraph, PlainList}
import graft.tables.SyntheticWeb

/** Extraction-parity fixtures (SURVEY.md §5.2 item 1): the synthetic
  * quotes-style page must reproduce the reference's golden list selector
  * (/root/reference/webspot/test/detect/test_plain_list.py:9-16) and extract
  * text byte-identical to the pages table's `text` oracle column.
  */
class DetectSpec extends AnyFunSuite {

  def detectPage(host: Int, k: Long, nOnHost: Long = 10, nHosts: Int = 4) = {
    val html = SyntheticWeb.pageHtml(host, k, nOnHost, nHosts)
    Detector.detectHtml(SyntheticWeb.pageUrl(host, k), html.getBytes("UTF-8"))
  }

  test("quotes page: top list selector matches the reference golden") {
    val out = detectPage(0, 0)
    assert(out.lists.nonEmpty, "at least one list result")
    val top = out.lists.head
    assert(top.listSelector == SyntheticWeb.GoldenListSelector,
      s"got ${top.listSelector}")
    assert(top.itemsSelector == "div.quote")
    assert(top.fields.nonEmpty)
    assert(top.data.size >= 5)
  }

  test("extracted text is byte-identical to the text oracle column") {
    for (host <- 0 until 3; k <- 0L until 3L) {
      val out = detectPage(host, k)
      val top = out.lists.head
      val extracted = top.data.flatMap(_.values.get("Field_text_1")).mkString("\n")
      assert(extracted == SyntheticWeb.expectedText(host, k),
        s"text mismatch on host=$host k=$k")
    }
  }

  test("field rules include text, link and author fields") {
    val out = detectPage(1, 2)
    val top = out.lists.head
    val types = top.fields.map(_.fieldType).toSet
    assert(types.contains("text"))
    assert(types.contains("link_url"))
    val sel = top.fields.map(_.selector)
    assert(sel.contains("div.quote > span.text"))
    assert(sel.contains("div.quote > span > small.author"))
  }

  test("link_url fields resolve against the page url") {
    val out = detectPage(0, 1)
    val top = out.lists.head
    val linkField = top.fields.find(_.fieldType == "link_url").get
    val links = top.data.flatMap(_.values.get(linkField.name))
    assert(links.nonEmpty)
    assert(links.forall(_.startsWith("https://host0.example/")))
  }

  test("pagination detector finds the next link with a full selector path") {
    val out = detectPage(0, 0, nOnHost = 5)
    assert(out.pagination.isDefined)
    val p = out.pagination.get
    assert(p.nextUrl == "https://host0.example/page/1")
    assert(p.selector.contains("li.next"))
    // last page has no next
    val last = detectPage(0, 4, nOnHost = 5)
    assert(last.pagination.isEmpty)
  }

  test("page without body yields empty output, no crash") {
    val out = Detector.detectHtml("https://x.example/", "<html><head></head></html>".getBytes)
    assert(out.lists.isEmpty && out.nNodes == 0)
  }

  test("non-list page yields no results") {
    val html = "<html><body><div class=\"container\"><p>just a paragraph</p></div></body></html>"
    val out = Detector.detectHtml("https://x.example/", html.getBytes)
    assert(out.lists.isEmpty)
  }

  test("outlink extraction resolves relative hrefs and skips fragments") {
    val html = ("<html><body><a href=\"/a\">a</a><a href=\"b\">b</a>" +
      "<a href=\"#x\">x</a><a href=\"javascript:void(0)\">j</a>" +
      "<a href=\"https://other.example/c\">c</a></body></html>").getBytes
    val doc = HtmlParser.parseBytes(html)
    val links = Detector.extractLinks("https://h.example/d/e", doc)
    assert(links == Vector("https://h.example/a", "https://h.example/d/b",
      "https://other.example/c"))
  }

  test("plain-table detector: selects table nodes, emits no results (reference parity)") {
    val html =
      """<html><body><div class="c"><table><tr><td>a</td><td>b</td></tr>
        |<tr><td>c</td><td>d</td></tr></table></div>
        |<table id="t2"><tr><td>e</td></tr></table></body></html>""".stripMargin
    val doc = graft.dom.HtmlParser.parseBytes(html.getBytes("UTF-8"))
    val g = graft.detect.PageGraph(doc).get
    val tables = graft.detect.PlainTable.tableNodes(g)
    assert(tables.size == 2)
    assert(tables.forall(i => g.node(i).tag == "table"))
    // bug-compat: the reference's _train() is `pass` — never any results
    assert(graft.detect.PlainTable.run(g).isEmpty)
  }

  test("detection is deterministic") {
    val a = detectPage(2, 3)
    val b = detectPage(2, 3)
    assert(a == b)
  }

  test("escaped tags (meta, svg, script) are excluded from the node graph") {
    val html = """<html><body><div><meta class="m"><svg><path d="x"/></svg><p>t</p></div></body></html>"""
    val doc = HtmlParser.parse(html)
    val g = PageGraph(doc).get
    val tags = (0 until g.n).map(g.node(_).tag).toSet
    assert(!tags.contains("meta") && !tags.contains("svg") && !tags.contains("path"))
    assert(tags.contains("p"))
  }
}
