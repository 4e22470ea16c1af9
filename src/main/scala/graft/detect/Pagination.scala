package graft.detect

import graft.urls.UrlOps

/** Next-page-link detector. The reference delegates classification to the
  * external `autopager` CRF (/root/reference/webspot/detect/detectors/
  * pagination.py:71-77) and then selects the *last* DOM link whose resolved
  * url equals the predicted next url (:83-87). We re-express the classifier
  * as a deterministic in-row heuristic over the same signals autopager uses
  * (link text, rel, class/id tokens) — SURVEY.md §2.8 M8 — and keep the
  * reference's last-match + selector-path semantics exactly.
  */
object Pagination {

  private val NextTexts = Set(
    "next", "next »", "next page", "more", "older", "older posts",
    ">", ">>", "›", "»", "→", "下一页", "下页", "下一頁")

  private def tokenScore(nd: graft.dom.DomNode): Int = {
    var s = 0
    if (nd.attr("rel").exists(_.toLowerCase.contains("next"))) s += 5
    val classesAndId = (nd.classTokens :+ nd.attr("id").getOrElse("")).map(_.toLowerCase)
    if (classesAndId.exists(t => t.contains("next"))) s += 4
    if (nd.attr("aria-label").exists(_.toLowerCase.contains("next"))) s += 3
    s
  }

  /** Kept `<a href>` graph-node indices (pagination.py:50-52). */
  def linkNodeIdxs(g: PageGraph): IndexedSeq[Int] =
    (0 until g.n).filter { i =>
      val nd = g.node(i)
      nd.tag == "a" && nd.attr("href").isDefined
    }

  /** P11: the same-domain subset of link nodes — the reference's
    * `_get_internal_link_nodes` (pagination.py:54-59). NB the reference's
    * own `_extract` matches against ALL link_nodes, not this subset
    * (pagination.py:81-84); we expose the same machinery and keep the same
    * extract-time behavior.
    */
  def internalLinkNodeIdxs(g: PageGraph, url: String): IndexedSeq[Int] = {
    val rootDomain = UrlOps.urlDomain(url)
    linkNodeIdxs(g).filter { i =>
      UrlOps.urlDomain(UrlOps.transformUrl(url, g.node(i).attr("href").get)) == rootDomain
    }
  }

  def run(doc: graft.dom.DomDocument, g: PageGraph, url: String): Option[PaginationOut] = {
    val linkIdxs = linkNodeIdxs(g)
    if (linkIdxs.isEmpty) return None

    // classifier: score each link; best (first in doc order on ties) = NEXT
    var bestIdx = -1
    var bestScore = 0
    linkIdxs.foreach { i =>
      val nd = g.node(i)
      var s = tokenScore(nd)
      val text = doc.subtreeText(nd.id).strip().toLowerCase
      if (NextTexts.contains(text)) s += 4
      else if (text.startsWith("next")) s += 3
      // parent pagination container signal
      if (nd.parentId >= 0 && g.containsId(nd.parentId)) {
        val p = doc(nd.parentId)
        val ptoks = (p.classTokens :+ p.attr("id").getOrElse("")).map(_.toLowerCase)
        if (ptoks.exists(t => t.contains("next"))) s += 2
        else if (ptoks.exists(t => t.contains("pager") || t.contains("pagination"))) s += 1
      }
      if (s > bestScore) { bestScore = s; bestIdx = i }
    }
    if (bestIdx < 0) return None
    val nextHref = g.node(bestIdx).attr("href").get
    val target = UrlOps.transformUrl(url, nextHref)

    // last link whose resolved url == next url (pagination.py:83-87, W6) —
    // walk from the END and stop at the first hit (each transform parses
    // the url; no need to resolve every link on the page twice)
    val matching = linkIdxs.reverseIterator.find { i =>
      UrlOps.transformUrl(url, g.node(i).attr("href").get) == target
    }
    if (matching.isEmpty) return None
    val nextNode = g.node(matching.get)
    Some(PaginationOut(
      selector = g.selectorPath(nextNode),
      nodeId = nextNode.id,
      nextUrl = target))
  }
}
