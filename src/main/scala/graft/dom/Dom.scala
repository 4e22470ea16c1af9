package graft.dom

/** DOM model for the per-page detection pipeline.
  *
  * Mirrors the node-table shape the reference builds from
  * `html_to_json_enhanced.convert(html, with_id=True)` (see
  * /root/reference/webspot/graph/graph_loader.py:194-205): every element gets a
  * document-order integer id, a parent id, a tag, an open attribute map where
  * `class` is multi-valued, and direct text segments.
  *
  * Ids are assigned in depth-first document order (parents before children,
  * siblings in source order) — the only ordering properties the reference's
  * selector machinery relies on (sibling relative order and parent<child).
  */
sealed trait DomContent
final case class TextSeg(text: String) extends DomContent
final case class ChildRef(id: Int) extends DomContent

private[graft] object Ws {
  /** whitespace tokenization (non-empty tokens) — the per-node class/feature
    * splits run inside the fused detect map; `split("\\s+")` recompiles its
    * pattern per call.
    */
  def tokens(s: String): Vector[String] = {
    val n = s.length
    if (n == 0) return Vector.empty
    // fast path: no whitespace at all — the string IS the single token
    // (the common case for class attrs; skips the builder + substring)
    var i = 0
    while (i < n && !s.charAt(i).isWhitespace) i += 1
    if (i == n) return Vector(s)
    val out = Vector.newBuilder[String]
    if (i > 0) out += s.substring(0, i)
    while (i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      val st = i
      while (i < n && !s.charAt(i).isWhitespace) i += 1
      if (i > st) out += s.substring(st, i)
    }
    out.result()
  }
}

final case class DomNode(
    id: Int,
    parentId: Int, // -1 = no parent (document root element)
    tag: String, // lowercased element name
    attrsFlat: Array[String], // [k0,v0,k1,v1,...] source order, keys lowercased, entities decoded
    content: Array[DomContent] // direct children: raw text segments + element refs
) {
  /** Attribute pairs view — the flat array is the storage (one exact-size
    * allocation per element in the parser, no per-pair tuples on the hot
    * paths); this Vector materializes lazily for the cold consumers
    * (serializer, annotate-mode json, specs).
    */
  lazy val attrs: Vector[(String, String)] = {
    val b = Vector.newBuilder[(String, String)]
    var i = 0
    while (i < attrsFlat.length) { b += ((attrsFlat(i), attrsFlat(i + 1))); i += 2 }
    b.result()
  }

  /** First value for `key`, or null — the zero-allocation probe selector
    * matching uses per candidate × simple-selector.
    */
  def attrOrNull(key: String): String = {
    var i = 0
    while (i < attrsFlat.length) {
      if (attrsFlat(i) == key) return attrsFlat(i + 1)
      i += 2
    }
    null
  }

  def attr(key: String): Option[String] = Option(attrOrNull(key))

  // lazy + unboxed: traversals (graph build, CSS descendant walks) revisit a
  // node's children many times per page — one int array per node, ever
  lazy val childIds: Array[Int] = {
    var cnt = 0
    content.foreach { case ChildRef(_) => cnt += 1; case _ => }
    val a = new Array[Int](cnt)
    var j = 0
    content.foreach { case ChildRef(i) => a(j) = i; j += 1; case _ => }
    a
  }

  /** `class` attribute split on ASCII whitespace (reference: list-valued attr,
    * graph_loader.py:169-181).
    */
  def classTokens: Vector[String] =
    attr("class").map(Ws.tokens).getOrElse(Vector.empty)

  /** Direct text segments, stripped, empties dropped — the `_text`/`_texts`
    * fields of the reference's node json (graph_loader.py:183-192).
    */
  def directTexts: Vector[String] =
    content.iterator.collect { case TextSeg(t) => t.strip() }.filter(_.nonEmpty).toVector

  /** Reference `_get_node_text`: single text kept as-is, several joined by a
    * single space, none => null (graph_loader.py:183-192). Single pass, no
    * intermediate collection (runs per node inside the fused detect map).
    */
  def nodeText: String = {
    var sb: StringBuilder = null
    var single: String = null
    content.foreach {
      case TextSeg(t) =>
        val s = t.strip()
        if (s.nonEmpty) {
          if (single == null && sb == null) single = s
          else {
            if (sb == null) sb = new StringBuilder(single)
            sb.append(' ').append(s)
          }
        }
      case _ =>
    }
    if (sb != null) sb.toString else single
  }

  /** Raw (k, v) feature pairs: ('tag', tag) plus flattened attributes, class
    * exploded per token (webspot/graph/graph_loader.py:166-181).
    */
  lazy val rawFeatures: Vector[(String, String)] = {
    val b = Vector.newBuilder[(String, String)]
    b += (("tag", tag))
    var i = 0
    while (i < attrsFlat.length) {
      val k = attrsFlat(i); val v = attrsFlat(i + 1)
      if (k == "class") Ws.tokens(v).foreach(t => b += ((k, t)))
      else b += ((k, v))
      i += 2
    }
    b.result()
  }

  /** Features with pseudo-class-looking class values dropped
    * (webspot/graph/models/node.py:15-23).
    */
  lazy val features: Vector[(String, String)] =
    rawFeatures.filterNot { case (k, v) => k == "class" && v.contains(":") }

  /** Distinct one-hot feature names "k=v" (node.py:26-27). */
  def featureNames: Vector[String] = features.map { case (k, v) => s"$k=$v" }.distinct

  /** class values usable in a CSS selector: no ':' and not digit-leading
    * (node.py:37-45). Lazy: selector matching and the O(n²) numbered-sibling
    * scans probe this repeatedly per node.
    */
  lazy val featureClasses: Vector[String] = {
    // = features.collect { case ("class", v) if v.nonEmpty && !v.head.isDigit => v }
    // derived straight from the flat attrs (class exploded per token, ':'
    // pseudo-class tokens dropped — the `features` filter — then the
    // digit-lead filter); skips materializing rawFeatures/features on the
    // selector hot paths
    var out: Vector[String] = null
    var i = 0
    while (i < attrsFlat.length) {
      if (attrsFlat(i) == "class") Ws.tokens(attrsFlat(i + 1)).foreach { t =>
        if (!t.contains(':') && !t.head.isDigit) {
          if (out == null) out = Vector(t) else out = out :+ t
        }
      }
      i += 2
    }
    if (out == null) Vector.empty else out
  }

  lazy val featureId: Option[String] = Option(attrOrNull("id"))
}

/** A parsed page: nodes indexed by id (id == array index). */
final class DomDocument(val nodes: Array[DomNode]) {
  def apply(id: Int): DomNode = nodes(id)
  def size: Int = nodes.length

  /** All descendant+self raw text concatenated in document order — the
    * equivalent of BeautifulSoup `el.text` used by the reference's extraction
    * (plain_list.py:268).
    */
  def subtreeText(id: Int): String = {
    val sb = new StringBuilder
    def rec(i: Int): Unit = nodes(i).content.foreach {
      case TextSeg(t)  => sb.append(t)
      case ChildRef(c) => rec(c)
    }
    rec(id)
    sb.result()
  }

  /** Element children of `id` in document order (full DOM, all tags). */
  def children(id: Int): Array[Int] = nodes(id).childIds

  def findFirst(tag: String): Option[Int] = nodes.find(_.tag == tag).map(_.id)
}
