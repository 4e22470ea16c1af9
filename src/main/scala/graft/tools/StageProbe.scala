package graft.tools
import java.lang.management.ManagementFactory
import graft.dom.HtmlParser
import graft.detect.{Detector, PageGraph, PlainList, Pagination}
import graft.tables.SyntheticWeb

object StageProbe {
  private val tmx = ManagementFactory.getThreadMXBean.asInstanceOf[com.sun.management.ThreadMXBean]
  def main(args: Array[String]): Unit = {
    val nPages = 3000; val nHosts = 16; val weight = 4
    val cuts = SyntheticWeb.fastCuts(nPages.toLong, nHosts)
    val htmls = Array.tabulate(nPages) { i =>
      var host = java.util.Arrays.binarySearch(cuts, i.toLong)
      if (host < 0) host = -host - 2
      if (host >= nHosts) host = nHosts - 1
      val k = i - cuts(host)
      (SyntheticWeb.pageUrl(host, k), SyntheticWeb.pageHtml(host, k, cuts(host+1)-cuts(host), nHosts, weight).getBytes("UTF-8"))
    }
    val id = Thread.currentThread().getId
    def measure(label: String)(f: => Unit): Unit = {
      f // warm
      val a0 = tmx.getThreadAllocatedBytes(id); val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime()-t0)/1e9
      println(f"$label%-12s ${(tmx.getThreadAllocatedBytes(id)-a0).toDouble/nPages/1024}%9.1f KiB/page  ${dt*1000/nPages}%7.3f ms/page")
    }
    var sink = 0L
    val docs = htmls.map { case (u,h) => (u, HtmlParser.parseBytes(h)) }
    measure("parse")   { htmls.foreach { case (_,h) => sink += HtmlParser.parseBytes(h).nodes.length } }
    measure("graph")   { docs.foreach { case (_,d) => sink += PageGraph(d).map(_.n).getOrElse(0) } }
    val graphs = docs.flatMap { case (u,d) => PageGraph(d).map(g => (u,d,g)) }
    measure("plainlist"){ graphs.foreach { case (u,d,g) => sink += PlainList.run(d,g,u).size } }
    measure("paginate") { graphs.foreach { case (u,d,g) => sink += Pagination.run(d,g,u).size } }
    measure("links")   { docs.foreach { case (u,d) => sink += Detector.extractLinks(u,d).length } }
    val links = docs.flatMap { case (u,d) => Detector.extractLinks(u,d) }
    measure("canon")   { links.foreach(l => sink += graft.urls.UrlOps.canonicalParts(l)._1.length) }
    println(s"sink=$sink links/page=${links.length.toDouble/nPages}")
  }
}
// quick size probe appended by StageProbe2
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val nPages = 500; val nHosts = 16
    val cuts = graft.tables.SyntheticWeb.fastCuts(nPages.toLong, nHosts)
    var tot = 0L; var nodes = 0L
    (0 until nPages).foreach { i =>
      var host = java.util.Arrays.binarySearch(cuts, i.toLong)
      if (host < 0) host = -host - 2
      if (host >= nHosts) host = nHosts - 1
      val k = i - cuts(host)
      val h = graft.tables.SyntheticWeb.pageHtml(host, k, cuts(host+1)-cuts(host), nHosts, 4)
      tot += h.length
      nodes += graft.dom.HtmlParser.parse(h).size
    }
    println(s"avg html chars: ${tot/nPages}  avg nodes: ${nodes/nPages}")
  }
}
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val nPages = 4000; val nHosts = 16
    val cuts = graft.tables.SyntheticWeb.fastCuts(nPages.toLong, nHosts)
    val htmls = Array.tabulate(nPages) { i =>
      var host = java.util.Arrays.binarySearch(cuts, i.toLong)
      if (host < 0) host = -host - 2
      if (host >= nHosts) host = nHosts - 1
      val k = i - cuts(host)
      graft.tables.SyntheticWeb.pageHtml(host, k, cuts(host+1)-cuts(host), nHosts, 4).getBytes("UTF-8")
    }
    var sink = 0L
    (0 until 6).foreach { _ => htmls.foreach { h => sink += graft.dom.HtmlParser.parseBytes(h).size } }
    println(s"sink=$sink")
  }
}
