package graft.detect

import scala.collection.mutable
import graft.dom.{ChildRef, DomDocument, TextSeg}
import graft.css.CssSelector

/** Highlight annotation (F13): add webspot highlight classes + label nodes to
  * matched elements and re-serialize — semantics of
  * /root/reference/webspot/detect/utils/highlight_html.py:63-87 +
  * plain_list.py:94-122 + pagination.py:28-43. In-row, pure.
  */
object Highlight {

  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link", "meta",
    "param", "source", "track", "wbr")

  // must mirror HtmlParser.RawTextTags: the parser stores these tags' content
  // RAW (no entity decode), so serialization must emit it raw — escaping here
  // would double-encode on a re-parse and break the round-trip fixpoint
  private val RawTextTags = Set("script", "style", "textarea", "title")

  /** Annotate list/items/fields + pagination results over a parsed page and
    * return serialized HTML. `_add_class` joins onto the existing class
    * string; `_add_label` APPENDS a div.webspot-highlight-label child.
    */
  def highlight(doc: DomDocument, lists: Seq[ListResultOut],
      pagination: Option[PaginationOut]): String = {
    val addedClasses = mutable.Map.empty[Int, mutable.ArrayBuffer[String]]
    val addedLabels = mutable.Map.empty[Int, mutable.ArrayBuffer[(String, String)]]

    def addClass(id: Int, classes: Seq[String]): Unit =
      addedClasses.getOrElseUpdate(id, mutable.ArrayBuffer.empty) ++= classes
    def addLabel(id: Int, label: String, tpe: String): Unit =
      addedLabels.getOrElseUpdate(id, mutable.ArrayBuffer.empty) += ((label, tpe))

    lists.zipWithIndex.foreach { case (result, i) =>
      CssSelector.selectOne(doc, result.listSelector).foreach { listEl =>
        addClass(listEl, Seq("webspot-highlight-container", "webspot-highlight-node-color__blue"))
        addLabel(listEl, s"List ${i + 1}", "primary")
        CssSelector.selectAll(doc, result.itemsSelector, scopeId = listEl).foreach { itemEl =>
          addClass(itemEl, Seq("webspot-highlight-container", "webspot-highlight-node-color__orange"))
          result.fields.foreach { f =>
            CssSelector.selectAll(doc, f.selector, scopeId = itemEl).foreach { fieldEl =>
              addClass(fieldEl, Seq("webspot-highlight-container", "webspot-highlight-node-color__green"))
            }
          }
        }
      }
    }
    pagination.foreach { p =>
      CssSelector.selectOne(doc, p.selector).foreach { nextEl =>
        addClass(nextEl, Seq("webspot-highlight-container", "webspot-highlight-node-color__red"))
        addLabel(nextEl, "Pagination", "primary")
      }
    }
    serialize(doc, addedClasses.view.mapValues(_.toSeq).toMap,
      addedLabels.view.mapValues(_.toSeq).toMap)
  }

  private def escText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def escAttr(s: String): String =
    escText(s).replace("\"", "&quot;")

  /** Serialize the DOM with injected classes/labels. */
  def serialize(doc: DomDocument, extraClasses: Map[Int, Seq[String]] = Map.empty,
      labels: Map[Int, Seq[(String, String)]] = Map.empty): String = {
    val sb = new StringBuilder(1 << 16)
    def writeNode(id: Int): Unit = {
      val nd = doc(id)
      sb.append('<').append(nd.tag)
      var wroteClass = false
      nd.attrs.foreach { case (k, v) =>
        val value =
          if (k == "class" && extraClasses.contains(id)) {
            wroteClass = true
            (v +: extraClasses(id)).mkString(" ")
          } else v
        sb.append(' ').append(k)
        sb.append("=\"").append(escAttr(value)).append('"')
      }
      if (!wroteClass && extraClasses.contains(id))
        sb.append(" class=\"").append(escAttr(extraClasses(id).mkString(" "))).append('"')
      sb.append('>')
      if (!VoidTags.contains(nd.tag)) {
        nd.content.foreach {
          case TextSeg(t) =>
            if (RawTextTags.contains(nd.tag)) sb.append(t)
            else sb.append(escText(t))
          case ChildRef(c) => writeNode(c)
        }
        labels.get(id).foreach(_.foreach { case (label, tpe) =>
          sb.append("<div class=\"webspot-highlight-label webspot-highlight-label-")
            .append(escAttr(tpe)).append("\">").append(escText(label)).append("</div>")
        })
        sb.append("</").append(nd.tag).append('>')
      }
    }
    doc.nodes.filter(_.parentId < 0).foreach(n => writeNode(n.id))
    sb.result()
  }
}
