package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dom._

class DomSpec extends AnyFunSuite {

  test("parses simple nested html with document-order ids") {
    val doc = HtmlParser.parse("<html><body><div id=\"a\"><p>hi</p><p>yo</p></div></body></html>")
    val tags = doc.nodes.map(_.tag).toSeq
    assert(tags == Seq("html", "body", "div", "p", "p"))
    assert(doc(0).parentId == -1)
    assert(doc(1).parentId == 0)
    assert(doc(2).parentId == 1)
    assert(doc(3).parentId == 2 && doc(4).parentId == 2)
    assert(doc(2).attr("id").contains("a"))
  }

  test("void elements do not nest") {
    val doc = HtmlParser.parse("<body><img src=\"x.png\"><p>after</p></body>")
    val img = doc.nodes.find(_.tag == "img").get
    val p = doc.nodes.find(_.tag == "p").get
    assert(p.parentId == img.parentId)
  }

  test("class attribute splits to tokens; entities decode") {
    val doc = HtmlParser.parse("<div class=\"a  b\tc\">x &amp; y &#65;&#x42;</div>")
    val d = doc(0)
    assert(d.classTokens == Vector("a", "b", "c"))
    assert(doc.subtreeText(0) == "x & y AB")
  }

  test("text semantics: single kept, multiple joined with space, none -> null") {
    val doc = HtmlParser.parse("<div> solo </div>")
    assert(doc(0).nodeText == "solo")
    val doc2 = HtmlParser.parse("<div>one<span>s</span>two</div>")
    assert(doc2(0).nodeText == "one two")
    val doc3 = HtmlParser.parse("<div><span>s</span></div>")
    assert(doc3(0).nodeText == null)
  }

  test("script raw text is not parsed as markup") {
    val doc = HtmlParser.parse("<body><script>if (a<b) {x}</script><p>ok</p></body>")
    assert(doc.nodes.count(_.tag == "p") == 1)
    val s = doc.nodes.find(_.tag == "script").get
    assert(doc.subtreeText(s.id).contains("a<b"))
  }

  test("comments and doctype skipped; implicit li close") {
    val doc = HtmlParser.parse("<!DOCTYPE html><!-- c --><ul><li>one<li>two</ul>")
    val lis = doc.nodes.filter(_.tag == "li")
    assert(lis.length == 2)
    assert(lis.forall(_.parentId == doc.nodes.find(_.tag == "ul").get.id))
  }

  test("self-closing and bare attributes") {
    val doc = HtmlParser.parse("<div itemscope data-x=1><br/><span>t</span></div>")
    assert(doc(0).attr("itemscope").contains(""))
    assert(doc(0).attr("data-x").contains("1"))
    assert(doc.nodes.map(_.tag).toSeq == Seq("div", "br", "span"))
  }

  test("encoding cascade: utf-8 first, fallback latin-1") {
    val utf8 = "<p>héllo</p>".getBytes("UTF-8")
    assert(HtmlParser.decodeBytes(utf8).contains("héllo"))
    val latin = "<p>héllo</p>".getBytes("ISO-8859-1")
    assert(HtmlParser.decodeBytes(latin).contains("héllo") ||
      HtmlParser.decodeBytes(latin).contains("h?llo") == false)
  }

  test("features mirror reference node semantics") {
    val doc = HtmlParser.parse("<div class=\"a b:hover 2col\" id=\"main\" style=\"x\">t</div>")
    val d = doc(0)
    // pseudo-class-like class dropped from features (node.py:15-23)
    assert(d.featureNames.toSet ==
      Set("tag=div", "class=a", "class=2col", "id=main", "style=x"))
    // digit-leading class dropped from selector classes (node.py:37-45)
    assert(d.featureClasses == Vector("a"))
    assert(d.featureId.contains("main"))
  }
}
