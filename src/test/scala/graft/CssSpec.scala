package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser
import graft.css.CssSelector

class CssSpec extends AnyFunSuite {

  val doc = HtmlParser.parse(
    """<html><body>
      |<div class="container">
      |  <div class="row header-box"><div class="col-md-8"><h1>T</h1></div></div>
      |  <div class="row">
      |    <div class="col-md-8">
      |      <div class="quote"><span class="text">q1</span></div>
      |      <div class="quote"><span class="text">q2</span></div>
      |    </div>
      |  </div>
      |</div>
      |<footer class="footer"><div class="container"><p>f</p></div></footer>
      |</body></html>""".stripMargin)

  test("tag/class/id matching") {
    assert(CssSelector.selectAll(doc, "div.quote").size == 2)
    assert(CssSelector.selectAll(doc, "span.text").size == 2)
    assert(CssSelector.selectAll(doc, "div.container").size == 2)
    assert(CssSelector.selectAll(doc, "div.row.header-box").size == 1)
  }

  test("child and descendant combinators") {
    assert(CssSelector.selectAll(doc, "div.row > div.col-md-8 > div.quote").size == 2)
    assert(CssSelector.selectAll(doc, "body div.quote").size == 2)
    assert(CssSelector.selectAll(doc, "footer > p").isEmpty)
    assert(CssSelector.selectAll(doc, "footer p").size == 1)
  }

  test("nth-of-type and last-child") {
    val rows = CssSelector.selectAll(doc, "div.row")
    assert(rows.size == 2)
    assert(CssSelector.selectAll(doc, "div.row:nth-of-type(2)").size == 1)
    // second row is the last element child of container
    val lastRows = CssSelector.selectAll(doc, "div.row:last-child")
    assert(lastRows.size == 1)
    assert(CssSelector.selectAll(doc, "body > div.container > div.row:last-child > div.col-md-8").size == 1)
  }

  test("scoped select matches through the scope element (soupsieve semantics)") {
    val quote = CssSelector.selectAll(doc, "div.quote").head
    // 'div.quote > span.text' must match a span INSIDE the scope quote even
    // though the div.quote compound matches the scope element itself
    val hit = CssSelector.selectOne(doc, "div.quote > span.text", scopeId = quote)
    assert(hit.isDefined)
    assert(doc.subtreeText(hit.get) == "q1")
  }

  test("attribute selectors") {
    val d2 = HtmlParser.parse("""<div><a href="/x">l</a><a>n</a></div>""")
    assert(CssSelector.selectAll(d2, "a[href]").size == 1)
    assert(CssSelector.selectAll(d2, """a[href="/x"]""").size == 1)
  }

  test("identifier validity") {
    assert(CssSelector.isValidIdent("col-md-8"))
    assert(CssSelector.isValidIdent("_x"))
    assert(!CssSelector.isValidIdent("2col"))
    assert(!CssSelector.isValidIdent("a:b"))
    assert(!CssSelector.isValidIdent(""))
  }
}
