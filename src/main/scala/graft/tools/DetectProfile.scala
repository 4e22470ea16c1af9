package graft.tools

import java.lang.management.ManagementFactory
import graft.dom.HtmlParser
import graft.detect.{PageGraph, Pagination, PlainList, Numeric}
import graft.tables.SyntheticWeb

/** Single-thread allocation breakdown of the detect kernel by stage —
  * parse / graph / feature-matrix / dbscan / candidates+extract /
  * pagination — over the same synthetic pages KernelBench uses. Finds
  * WHERE the bytes/page that limit 4→16-thread scaling are allocated.
  *
  * Usage: runMain graft.tools.DetectProfile [nPages]
  */
object DetectProfile {
  private val tmx = ManagementFactory.getThreadMXBean
    .asInstanceOf[com.sun.management.ThreadMXBean]

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toInt).getOrElse(4000)
    val nHosts = 16
    val weight = 4
    val cuts = SyntheticWeb.fastCuts(nPages.toLong, nHosts)
    val htmls = Array.tabulate(nPages) { i =>
      var host = java.util.Arrays.binarySearch(cuts, i.toLong)
      if (host < 0) host = -host - 2
      if (host >= nHosts) host = nHosts - 1
      val k = i - cuts(host)
      val nOnHost = cuts(host + 1) - cuts(host)
      (SyntheticWeb.pageUrl(host, k),
        SyntheticWeb.pageHtml(host, k, nOnHost, nHosts, weight)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val id = Thread.currentThread().getId
    def alloc(): Long = tmx.getThreadAllocatedBytes(id)

    val avgChars = htmls.map(_._2.length.toLong).sum / nPages
    val avgNodes = htmls.map(h => HtmlParser.parseBytes(h._2).size.toLong).sum / nPages
    println(s"pages=$nPages avgHtmlBytes=$avgChars avgNodes=$avgNodes")

    val stages = Array("decode", "parse", "graph", "featmatrix", "dbscan",
      "candidates", "extract", "pagination")
    def pass(): Array[Long] = {
      val bytes = new Array[Long](stages.length)
      var sink = 0L
      var i = 0
      while (i < htmls.length) {
        val (url, html) = htmls(i)
        var a = alloc()
        val decoded = HtmlParser.decodeBytes(html)
        var b = alloc(); bytes(0) += b - a; a = b
        val doc = HtmlParser.parse(decoded)
        b = alloc(); bytes(1) += b - a; a = b
        PageGraph(doc) match {
          case None =>
          case Some(g) =>
            sink += g.featureCounts.length + g.rows.length +
              g.childrenIdx.length + g.textLengths.length
            b = alloc(); bytes(2) += b - a; a = b
            val x = PlainList.buildFeatureMatrix(g)
            sink += x.length
            b = alloc(); bytes(3) += b - a; a = b
            if (x.nonEmpty && x(0).nonEmpty) {
              val labels = Numeric.dbscan(x, PlainList.DbscanEps, PlainList.DbscanMinSamples)
              sink += labels.length
              b = alloc(); bytes(4) += b - a; a = b
              val cands = PlainList.preFilter(g, labels)
              val scored = PlainList.scoreCandidates(g, cands)
              sink += cands.length + scored.length
              b = alloc(); bytes(5) += b - a; a = b
              // run()'s extract loop, replicated (same cap + guards)
              var r = 0
              var kept = 0
              while (r < scored.length && r != PlainList.MaxResultCount) {
                val s = scored(r)
                if (g.containsId(s.cand.listNodeId)) {
                  val listNode = g.doc(s.cand.listNodeId)
                  val listSelector = g.selectorPath(listNode)
                  val itemsSelector = g.selectorRepr(g.node(s.cand.itemIdxs(0)),
                    numbered = false, noId = true)
                  val fullItems = s"$listSelector > $itemsSelector"
                  val fields = PlainList.extractFields(g, s.cand.listNodeId, s.cand.itemIdxs)
                  if (fields.nonEmpty) {
                    val data = PlainList.extractData(doc, url, fullItems, fields)
                    if (data.nonEmpty) kept += 1
                  }
                }
                r += 1
              }
              sink += kept
              b = alloc(); bytes(6) += b - a; a = b
            }
            val pg = Pagination.run(doc, g, url)
            sink += pg.size
            b = alloc(); bytes(7) += b - a; a = b
        }
        i += 1
      }
      System.err.println(s"sink=$sink")
      bytes
    }
    pass() // warm
    val bytes = pass()
    println(f"${"stage"}%-14s ${"KiB/page"}%10s")
    stages.zipWithIndex.foreach { case (s, i) =>
      println(f"$s%-14s ${bytes(i).toDouble / nPages / 1024}%10.1f")
    }
    println(f"${"TOTAL"}%-14s ${bytes.sum.toDouble / nPages / 1024}%10.1f")
  }
}
