package graft.dom

import scala.collection.mutable

/** Minimal HTML5-ish parser producing a [[DomDocument]] with document-order
  * ids. From-scratch replacement for the reference's external
  * `html_to_json_enhanced.convert(html, with_id=True)`
  * (/root/reference/webspot/graph/graph_loader.py:196) — no jsoup/tagsoup on
  * the offline classpath.
  *
  * Handles: doctype, comments, CDATA-as-comment, void elements, rawtext
  * elements (script/style/textarea/title), single/double/unquoted/bare
  * attributes, entity decoding (named common set + numeric), implicit closing
  * of li/p/option/tr/td/th, and unmatched end tags. Designed for well-formed
  * pages plus common sloppiness (SURVEY.md §7.5 risk 1).
  */
object HtmlParser {

  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link", "meta",
    "param", "source", "track", "wbr")

  private val RawTextTags = Set("script", "style", "textarea", "title")

  private[dom] val NoAttrs = new Array[String](0) // shared empty flat attrs
  private[dom] val NoContent = new Array[DomContent](0) // shared empty content

  // tags that implicitly close an open element of the same (or listed) tag
  private val ImpliedClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"),
    "p" -> Set("p"),
    "option" -> Set("option"),
    "tr" -> Set("tr", "td", "th"),
    "td" -> Set("td", "th"),
    "th" -> Set("td", "th"),
    "dt" -> Set("dt", "dd"),
    "dd" -> Set("dt", "dd"))

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "middot" -> "·", "bull" -> "•",
    "rarr" -> "→", "larr" -> "←", "deg" -> "°")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(1)))))
              catch { case _: Exception => None }
            else NamedEntities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** Mutable node under construction. Adjacent text is COALESCED into one
    * [[TextSeg]] (matching live-DOM text-node semantics — a stray `<` or an
    * entity boundary never splits a text node), except across a comment /
    * doctype / PI, which separates text nodes exactly like a real DOM does.
    * This makes parse∘serialize∘parse a fixpoint: serialization re-encodes
    * `<` as `&lt;`, and a re-parse must yield the same segmentation.
    */
  private final class Building(
      val id: Int,
      val parentId: Int,
      val tag: String,
      val attrs: Array[String]) { // flat [k,v,...] — see DomNode.attrsFlat
    // small initial capacity: most nodes hold ≤4 content entries; grown +
    // trimmed to exact size at close (DomNode.content is an Array now — no
    // builder, no Vector leaf per node)
    private var arr = new Array[DomContent](4)
    private var len = 0
    var textOpen = false // true while the last content entry is a mergeable TextSeg

    private def append(c: DomContent): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, len * 2)
      arr(len) = c
      len += 1
    }
    def addText(t: String): Unit = {
      if (textOpen && len > 0) arr(len - 1) match {
        case TextSeg(prev) => arr(len - 1) = TextSeg(prev + t)
        case _ => append(TextSeg(t)); textOpen = true
      }
      else { append(TextSeg(t)); textOpen = true }
    }
    def addRaw(t: String): Unit = append(TextSeg(t))
    def addChild(id: Int): Unit = { append(ChildRef(id)); textOpen = false }
    def breakText(): Unit = textOpen = false
    def result(): Array[DomContent] =
      if (len == 0) HtmlParser.NoContent else java.util.Arrays.copyOf(arr, len)
  }

  def parseBytes(html: Array[Byte]): DomDocument = parse(decodeBytes(html))

  /** Encoding cascade mirroring the reference's utf-8 → gbk → iso-8859-1 →
    * cp1252 sniff (/root/reference/webspot/request/html_requester.py:53-61).
    */
  /** Strict UTF-8 validity scan (RFC 3629: no overlongs, no surrogates, max
    * U+10FFFF) — zero-allocation; lets the common case below decode through
    * the one-copy String ctor instead of a CharsetDecoder (which allocates a
    * 2n char buffer plus a final copy per page).
    */
  private def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xc2) return false // continuation byte or overlong lead
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (b0 < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80 || (bytes(i + 2) & 0xc0) != 0x80) return false
        if (b0 == 0xe0 && b1 < 0xa0) return false // overlong
        if (b0 == 0xed && b1 >= 0xa0) return false // surrogate
        i += 3
      } else if (b0 < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80 || (bytes(i + 2) & 0xc0) != 0x80 ||
          (bytes(i + 3) & 0xc0) != 0x80) return false
        if (b0 == 0xf0 && b1 < 0x90) return false // overlong
        if (b0 == 0xf4 && b1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  def decodeBytes(bytes: Array[Byte]): String = {
    import java.nio.charset._
    if (isValidUtf8(bytes))
      return new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val cascade = Seq("UTF-8", "GBK", "ISO-8859-1", "windows-1252")
    cascade.iterator.flatMap { name =>
      try {
        val dec = Charset.forName(name).newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
      } catch { case _: Exception => None }
    }.nextOption().getOrElse(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  def parse(html: String): DomDocument = {
    val finished = mutable.ArrayBuffer.empty[Building] // indexed by id
    val stack = mutable.ArrayBuffer.empty[Building] // open elements
    val tagScratch = new TagScratch // reused across all tags of this parse
    var nextId = 0

    def openNode(tag: String, attrs: Array[String]): Building = {
      val parent = if (stack.isEmpty) -1 else stack.last.id
      val b = new Building(nextId, parent, tag, attrs)
      nextId += 1
      finished += b
      if (parent >= 0) stack.last.addChild(b.id)
      b
    }

    def closeTopUntil(tag: String): Unit = {
      // find matching open tag; if found, pop through it; else ignore stray end tag
      val idx = stack.lastIndexWhere(_.tag == tag)
      if (idx >= 0) stack.remove(idx, stack.length - idx)
    }

    def addText(t: String): Unit =
      if (t.nonEmpty && stack.nonEmpty) stack.last.addText(decodeEntities(t))

    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        if (lt > i) addText(html.substring(i, lt))
        if (lt + 1 >= n) { i = n } // trailing '<'
        else html.charAt(lt + 1) match {
          case '!' =>
            // comment / doctype / cdata — separates adjacent text nodes
            if (stack.nonEmpty) stack.last.breakText()
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else {
              val end = html.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            }
          case '?' =>
            if (stack.nonEmpty) stack.last.breakText()
            val end = html.indexOf('>', lt)
            i = if (end < 0) n else end + 1
          case '/' =>
            val end = html.indexOf('>', lt)
            if (end < 0) { i = n }
            else {
              val tag = html.substring(lt + 2, end).trim.toLowerCase
              closeTopUntil(tag)
              i = end + 1
            }
          case c if c.isLetter =>
            parseTag(html, lt + 1, tagScratch)
            val tag = tagScratch.tag
            val attrs = tagScratch.attrs
            val selfClosed = tagScratch.selfClosed
            i = tagScratch.after
            // implied closes
            ImpliedClose.get(tag).foreach { closers =>
              if (stack.nonEmpty && closers.contains(stack.last.tag))
                stack.remove(stack.length - 1)
            }
            val b = openNode(tag, attrs)
            val isVoid = VoidTags.contains(tag) || selfClosed
            if (!isVoid) {
              if (RawTextTags.contains(tag)) {
                // consume raw text until matching close tag
                val closeSeq = "</" + tag
                val end = indexOfIgnoreCase(html, closeSeq, i)
                val rawEnd = if (end < 0) n else end
                val raw = html.substring(i, rawEnd)
                if (raw.nonEmpty) b.addRaw(raw)
                if (end < 0) i = n
                else {
                  val gt = html.indexOf('>', end)
                  i = if (gt < 0) n else gt + 1
                }
              } else {
                stack += b
              }
            }
          case _ =>
            addText("<")
            i = lt + 1
        }
      }
    }

    val arr = new Array[DomNode](finished.length)
    finished.foreach { b =>
      arr(b.id) = DomNode(b.id, b.parentId, b.tag, b.attrs, b.result())
    }
    new DomDocument(arr)
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = from
    val max = hay.length - needle.length
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Reusable start-tag parse state — one instance per parse() call, so a
    * page's several hundred tags don't each allocate a boxed tuple. Also
    * hosts a small per-parse intern table for lowercased tag/attr names: a
    * page has ~20 distinct tags and ~10 distinct attr names repeated across
    * hundreds of elements, and region-keyed interning skips both the
    * substring and the toLowerCase allocation on every repeat.
    */
  private final class TagScratch {
    var tag: String = _
    var attrs: Array[String] = _
    var selfClosed: Boolean = false
    var after: Int = 0
    // reusable flat [k,v,...] accumulator: one exact-size copy per attr-ful
    // tag replaces the per-tag VectorBuilder (32-slot chunk) + per-pair
    // tuples + Vector leaf of the old representation
    private var kv = new Array[String](32)
    private var kvLen = 0
    def kvClear(): Unit = kvLen = 0
    def kvAdd(k: String, v: String): Unit = {
      if (kvLen + 2 > kv.length) kv = java.util.Arrays.copyOf(kv, kv.length * 2)
      kv(kvLen) = k; kv(kvLen + 1) = v
      kvLen += 2
    }
    def kvResult(): Array[String] =
      if (kvLen == 0) HtmlParser.NoAttrs else java.util.Arrays.copyOf(kv, kvLen)

    private val tbl = new Array[String](128) // linear-probe, power of 2

    /** substring(start, end).toLowerCase, interned when the region is short
      * ASCII (tags/attr names always are); falls back to a plain lowercased
      * substring otherwise — byte-identical results either way.
      */
    def lowerName(html: String, start: Int, end: Int): String = {
      val len = end - start
      var h = 0
      var ascii = true
      var i = start
      while (i < end) {
        val c = html.charAt(i)
        if (c >= 0x80) ascii = false
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        h = h * 31 + lc
        i += 1
      }
      if (!ascii || len == 0 || len > 24) return lowerSubstring(html, start, end)
      var slot = h & 127
      var probes = 0
      while (probes < 8) {
        val cand = tbl(slot)
        if (cand == null) {
          val s = lowerSubstring(html, start, end)
          tbl(slot) = s
          return s
        }
        if (cand.length == len) {
          var j = 0
          var eq = true
          while (eq && j < len) {
            val c = html.charAt(start + j)
            val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
            if (lc != cand.charAt(j)) eq = false
            j += 1
          }
          if (eq) return cand
        }
        slot = (slot + 1) & 127
        probes += 1
      }
      lowerSubstring(html, start, end)
    }
  }

  /** substring(start, end), lowercased — without the extra toLowerCase
    * allocation when the region is already lowercase (the common case).
    */
  private def lowerSubstring(html: String, start: Int, end: Int): String = {
    var i = start
    while (i < end && !Character.isUpperCase(html.charAt(i))) i += 1
    val s = html.substring(start, end)
    if (i == end) s else s.toLowerCase
  }

  /** Parse a start tag beginning right after '<' into `out`. */
  private def parseTag(html: String, start: Int, out: TagScratch): Unit = {
    val n = html.length
    var i = start
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-' || html.charAt(i) == ':')) i += 1
    val tag = out.lowerName(html, start, i)
    out.kvClear()
    def addAttr(k: String, v: String): Unit = out.kvAdd(k, v)
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      // skip whitespace
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClosed = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name
          val nameStart = i
          while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '=' &&
            html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val name = out.lowerName(html, nameStart, i)
          // optional '=' value
          var j = i
          while (j < n && html.charAt(j).isWhitespace) j += 1
          if (j < n && html.charAt(j) == '=') {
            j += 1
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
              val q = html.charAt(j)
              val vEnd = html.indexOf(q, j + 1)
              val value = if (vEnd < 0) html.substring(j + 1) else html.substring(j + 1, vEnd)
              addAttr(name, decodeEntities(value))
              i = if (vEnd < 0) n else vEnd + 1
            } else {
              val vStart = j
              while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
              addAttr(name, decodeEntities(html.substring(vStart, j)))
              i = j
            }
          } else {
            if (name.nonEmpty) addAttr(name, "") // bare attribute
            i = i.max(nameStart + 1)
          }
      }
    }
    out.tag = tag
    out.attrs = out.kvResult()
    out.selfClosed = selfClosed
    out.after = i
  }
}
