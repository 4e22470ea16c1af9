package graft.tools

import graft.detect.{Detector, PageGraph, PlainList, Pagination, Numeric}
import graft.dom.HtmlParser
import graft.tables.SyntheticWeb

/** Single-threaded micro-profile of the per-page detect kernel stages
  * (bench-weight pages): where does fetch+detect time actually go?
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val weight = args.headOption.map(_.toInt).getOrElse(4)
    val n = 300
    val pages = (0 until n).map { i =>
      val host = i % 16
      val k = i / 16
      (SyntheticWeb.pageUrl(host, k),
        SyntheticWeb.pageHtml(host, k, 1000, 16, weight).getBytes("UTF-8"))
    }
    // warmup
    pages.take(50).foreach { case (u, h) => Detector.detectHtml(u, h) }

    var tParse = 0L; var tGraph = 0L; var tMatrix = 0L; var tDbscan = 0L
    var tRest = 0L; var tPag = 0L; var tLinks = 0L
    pages.foreach { case (url, html) =>
      var t0 = System.nanoTime()
      val doc = HtmlParser.parseBytes(html)
      tParse += System.nanoTime() - t0; t0 = System.nanoTime()
      val g = PageGraph(doc).get
      tGraph += System.nanoTime() - t0; t0 = System.nanoTime()
      val x = PlainList.buildFeatureMatrix(g)
      tMatrix += System.nanoTime() - t0; t0 = System.nanoTime()
      val labels = Numeric.dbscan(x, PlainList.DbscanEps, PlainList.DbscanMinSamples)
      tDbscan += System.nanoTime() - t0; t0 = System.nanoTime()
      val lists = PlainList.run(doc, g, url) // full path incl extract
      tRest += System.nanoTime() - t0; t0 = System.nanoTime()
      Pagination.run(doc, g, url)
      tPag += System.nanoTime() - t0; t0 = System.nanoTime()
      Detector.extractLinks(url, doc)
      tLinks += System.nanoTime() - t0
      require(lists.nonEmpty && labels.length == g.n)
    }
    // stage-internal breakdown of the PlainList path
    var tPre = 0L; var tScore = 0L; var tFields = 0L; var tData = 0L
    pages.foreach { case (url, html) =>
      val doc = HtmlParser.parseBytes(html)
      val g = PageGraph(doc).get
      val x = PlainList.buildFeatureMatrix(g)
      val labels = Numeric.dbscan(x, PlainList.DbscanEps, PlainList.DbscanMinSamples)
      var t0 = System.nanoTime()
      val cands = PlainList.preFilter(g, labels)
      tPre += System.nanoTime() - t0; t0 = System.nanoTime()
      val scored = PlainList.scoreCandidates(g, cands)
      tScore += System.nanoTime() - t0; t0 = System.nanoTime()
      val s = scored.head
      val fields = PlainList.extractFields(g, s.cand.listNodeId, s.cand.itemIdxs)
      tFields += System.nanoTime() - t0; t0 = System.nanoTime()
      val listNode = g.doc(s.cand.listNodeId)
      val fullItems = g.selectorPath(listNode) + " > " +
        g.selectorRepr(g.node(s.cand.itemIdxs(0)), numbered = false, noId = true)
      val data = PlainList.extractData(doc, url, fullItems, fields)
      tData += System.nanoTime() - t0
      require(data.nonEmpty)
    }

    def ms(t: Long) = t / 1e6 / n
    println(f"per page (weight=$weight, n=$n):")
    println(f"  parse        ${ms(tParse)}%8.3f ms")
    println(f"  graph        ${ms(tGraph)}%8.3f ms")
    println(f"  featureMatrix${ms(tMatrix)}%8.3f ms")
    println(f"  dbscan       ${ms(tDbscan)}%8.3f ms")
    println(f"  full run     ${ms(tRest)}%8.3f ms (matrix+dbscan+score+extract)")
    println(f"  pagination   ${ms(tPag)}%8.3f ms")
    println(f"  links        ${ms(tLinks)}%8.3f ms")
    println(f"    preFilter    ${ms(tPre)}%8.3f ms")
    println(f"    score        ${ms(tScore)}%8.3f ms")
    println(f"    fields       ${ms(tFields)}%8.3f ms")
    println(f"    extractData  ${ms(tData)}%8.3f ms")
    val doc0 = HtmlParser.parseBytes(pages.head._2)
    val g0 = PageGraph(doc0).get
    val x0 = PlainList.buildFeatureMatrix(g0)
    println(s"  sample page: nodes=${g0.n} matrixCols=${if (x0.nonEmpty) x0(0).length else 0}")
  }
}
