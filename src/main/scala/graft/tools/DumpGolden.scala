package graft.tools

import graft.detect.Detector
import graft.tables.SyntheticWeb

/** Scratch inspector: prints the detector's concrete output strings for
  * sample synthetic pages (used to pin the golden constants the closed-form
  * expected tables assert).
  */
object DumpGolden {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scan")) { scanCollisions(); return }
    val nHosts = 4
    for (host <- 0 until 2; k <- 0L until 6L) {
      val nOnHost = 10L
      val html = SyntheticWeb.pageHtml(host, k, nOnHost, nHosts)
      val url = SyntheticWeb.pageUrl(host, k)
      val out = Detector.detectHtml(url, html.getBytes("UTF-8"))
      println(s"=== host=$host k=$k nItems=${SyntheticWeb.itemCount(host, k)} " +
        s"sidebar=${SyntheticWeb.sidebarTargets(host, k, nOnHost, nHosts)}")
      out.lists.foreach { l =>
        println(s"  list name=${l.name} sel=${l.listSelector} items=${l.itemsSelector} full=${l.fullItemsSelector} n=${l.data.size} score=${l.score}")
        l.fields.foreach(f => println(s"    field ${f.name} type=${f.fieldType} sel=${f.selector} attr=${f.attribute}"))
        if (k == 0 && host == 0) {
          l.data.take(2).zipWithIndex.foreach { case (r, i) =>
            r.values.toSeq.sortBy(_._1).foreach { case (fk, v) =>
              println(s"    data[$i] $fk = ${v.replace("\n", "\\n")}")
            }
          }
        }
      }
      out.pagination.foreach(p => println(s"  pag sel=${p.selector} next=${p.nextUrl}"))
      // links in document order
      if (k <= 1) {
        val doc = graft.dom.HtmlParser.parseBytes(html.getBytes("UTF-8"))
        println("  links=" + Detector.extractLinks(url, doc).mkString(" | "))
        graft.api.RequestStore.linkLists(url, html.getBytes("UTF-8")).foreach { ll =>
          println(s"  linkList ${ll.name} conf=${ll.confidence} n=${ll.links.size} first=${ll.links.headOption}")
        }
      }
    }
  }

  /** Find pages where a sidebar link collides with the next-page target and
    * print the pagination selector the detector emits for each collision
    * shape (l1-only, l2-only, both).
    */
  def scanCollisions(): Unit = {
    val nHosts = 4
    val nOnHost = 10L
    var seenL1 = false; var seenBoth = false; var seenFriend = false
    for (host <- 0 until nHosts; k <- 0L until (nOnHost - 1)) {
      val (l1, l2, xh) = SyntheticWeb.sidebarTargets(host, k, nOnHost, nHosts)
      val c1 = l1 == k + 1; val c2 = l2 == k + 1
      val cf = xh == host && k + 1 == 0
      if ((c1 && !c2 && !seenL1) || (c1 && c2 && !seenBoth) || (cf && !seenFriend)) {
        if (c1 && !c2) seenL1 = true
        if (c1 && c2) seenBoth = true
        val html = SyntheticWeb.pageHtml(host, k, nOnHost, nHosts)
        val out = Detector.detectHtml(SyntheticWeb.pageUrl(host, k), html.getBytes("UTF-8"))
        println(s"collision host=$host k=$k l1=$l1 l2=$l2 xh=$xh -> " +
          out.pagination.map(p => s"${p.selector} | ${p.nextUrl}").getOrElse("NONE"))
      }
    }
    println(s"covered: l1only=$seenL1 both=$seenBoth")
  }
}
