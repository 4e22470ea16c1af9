package graft.css

import graft.dom.{DomDocument, DomNode}

/** CSS selector subset: parser + matcher over a [[DomDocument]].
  *
  * Covers exactly the grammar the reference's generated selectors use
  * (/root/reference/webspot/graph/graph_loader.py:352-433): compound selectors
  * of `tag`, `#id`, `.class`, `[attr="v"]`, `[attr]`, `:nth-of-type(k)`,
  * `:last-child`, combined with descendant (space) and child (`>`)
  * combinators. Matching semantics follow real CSS (as BeautifulSoup/soupsieve
  * evaluates them in plain_list.py:260-279): nth-of-type counts same-tag
  * element siblings in the full DOM; last-child means last element child.
  */
object CssSelector {

  sealed trait SimpleSel
  final case class TagSel(tag: String) extends SimpleSel
  final case class IdSel(id: String) extends SimpleSel
  final case class ClassSel(cls: String) extends SimpleSel
  final case class AttrSel(key: String, value: Option[String]) extends SimpleSel
  final case class NthOfType(n: Int) extends SimpleSel
  case object LastChild extends SimpleSel

  final case class Compound(parts: Vector[SimpleSel])
  /** combinator preceding each compound (after the first): '>' or ' ' */
  final case class Selector(compounds: Vector[Compound], combinators: Vector[Char])

  def parse(selector: String): Selector = {
    val compounds = Vector.newBuilder[Compound]
    val combs = Vector.newBuilder[Char]
    var i = 0
    val s = selector
    val n = s.length
    var first = true
    while (i < n) {
      // consume combinator / whitespace
      var sawGt = false
      var sawWs = false
      while (i < n && (s.charAt(i).isWhitespace || s.charAt(i) == '>')) {
        if (s.charAt(i) == '>') sawGt = true else sawWs = true
        i += 1
      }
      if (i < n) {
        if (!first) combs += (if (sawGt) '>' else ' ')
        else if (sawGt || (sawWs && first && compounds.result().nonEmpty)) ()
        first = false
        // parse one compound
        val parts = Vector.newBuilder[SimpleSel]
        var done = false
        while (i < n && !done) {
          s.charAt(i) match {
            case c if c.isWhitespace || c == '>' => done = true
            case '#' =>
              val st = i + 1; i = st
              while (i < n && isIdentChar(s.charAt(i))) i += 1
              parts += IdSel(s.substring(st, i))
            case '.' =>
              val st = i + 1; i = st
              while (i < n && isIdentChar(s.charAt(i))) i += 1
              parts += ClassSel(s.substring(st, i))
            case ':' =>
              val st = i + 1; i = st
              while (i < n && (s.charAt(i).isLetter || s.charAt(i) == '-')) i += 1
              val name = s.substring(st, i)
              if (i < n && s.charAt(i) == '(') {
                val close = s.indexOf(')', i)
                val arg = s.substring(i + 1, close).trim
                i = close + 1
                name match {
                  case "nth-of-type" => parts += NthOfType(arg.toInt)
                  case _ => // unsupported functional pseudo: never matches
                    parts += AttrSel("\u0000unsupported", None)
                }
              } else name match {
                case "last-child" => parts += LastChild
                case _ => parts += AttrSel("\u0000unsupported", None)
              }
            case '[' =>
              val close = s.indexOf(']', i)
              val body = s.substring(i + 1, close)
              i = close + 1
              val eq = body.indexOf('=')
              if (eq < 0) parts += AttrSel(body.trim.toLowerCase, None)
              else {
                val k = body.take(eq).trim.toLowerCase
                var v = body.drop(eq + 1).trim
                if (v.length >= 2 && (v.head == '"' || v.head == '\'')) v = v.substring(1, v.length - 1)
                parts += AttrSel(k, Some(v))
              }
            case '*' => i += 1
            case _ =>
              val st = i
              while (i < n && isIdentChar(s.charAt(i))) i += 1
              if (i == st) i += 1 // skip unknown char defensively
              else parts += TagSel(s.substring(st, i).toLowerCase)
          }
        }
        compounds += Compound(parts.result())
      }
    }
    Selector(compounds.result(), combs.result())
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_' || c > 0x7f

  /** A string is a valid CSS identifier (approximates the reference's
    * cssutils syntax check, webspot/utils/selector.py:4-8: no leading digit,
    * no ':' etc.).
    */
  def isValidIdent(s: String): Boolean =
    s.nonEmpty && {
      val body = if (s.head == '-') s.tail else s
      body.nonEmpty && !body.head.isDigit && body.head != '-' &&
        body.forall(isIdentChar)
    }

  /** whitespace-delimited token scan — classTokens semantics without the
    * per-check regex split (this runs per candidate × compound part in the
    * extract hot path).
    */
  private def containsToken(haystack: String, token: String): Boolean = {
    if (token.isEmpty) return false
    var i = 0
    val n = haystack.length
    val m = token.length
    while (i <= n - m) {
      if (haystack.startsWith(token, i) &&
        (i == 0 || haystack.charAt(i - 1).isWhitespace) &&
        (i + m == n || haystack.charAt(i + m).isWhitespace)) return true
      i += 1
    }
    false
  }

  private def matchesSimple(doc: DomDocument, node: DomNode, sel: SimpleSel): Boolean = sel match {
    case TagSel(t)   => node.tag == t
    case IdSel(v)    => node.attrOrNull("id") == v
    case ClassSel(c) =>
      val v = node.attrOrNull("class")
      v != null && containsToken(v, c)
    case AttrSel(k, None)    => k != "\u0000unsupported" && node.attrOrNull(k) != null
    case AttrSel(k, Some(v)) => node.attrOrNull(k) == v
    case NthOfType(k) =>
      if (node.parentId < 0) k == 1
      else {
        // k-th same-tag sibling, counted without the filtered copy (this
        // runs per candidate × selector part in the extract hot path)
        val sibs = doc.children(node.parentId)
        var cnt = 0
        var mine = -1
        var i = 0
        while (i < sibs.length) {
          val c = sibs(i)
          if (doc(c).tag == node.tag) { cnt += 1; if (c == node.id) mine = cnt }
          i += 1
        }
        mine == k
      }
    case LastChild =>
      node.parentId < 0 || {
        val sibs = doc.children(node.parentId)
        sibs.length > 0 && sibs(sibs.length - 1) == node.id
      }
  }

  def matchesCompound(doc: DomDocument, node: DomNode, c: Compound): Boolean = {
    val parts = c.parts
    var i = 0
    while (i < parts.length) {
      if (!matchesSimple(doc, node, parts(i))) return false
      i += 1
    }
    true
  }

  /** Right-to-left match of the full selector in whole-document context. */
  def matches(doc: DomDocument, nodeId: Int, sel: Selector): Boolean = {
    if (sel.compounds.isEmpty) return false
    def matchFrom(ci: Int, id: Int): Boolean = {
      if (!matchesCompound(doc, doc(id), sel.compounds(ci))) return false
      if (ci == 0) return true
      val comb = sel.combinators(ci - 1)
      val parent = doc(id).parentId
      comb match {
        case '>' =>
          parent >= 0 && matchFrom(ci - 1, parent)
        case _ =>
          var a = parent
          while (a >= 0) {
            if (matchFrom(ci - 1, a)) return true
            a = doc(a).parentId
          }
          false
      }
    }
    matchFrom(sel.compounds.length - 1, nodeId)
  }

  /** soup.select analog: all matches in document order. `scopeId >= 0`
    * restricts *candidates* to strict descendants of that node, while
    * ancestry matching still uses whole-document context — exactly
    * BeautifulSoup/soupsieve `item_el.select(...)` semantics as used in
    * plain_list.py:266 (a field path like `div.quote > span` matches a span
    * whose parent is the scope element itself).
    */
  def selectAll(doc: DomDocument, selector: String, scopeId: Int = -1): Vector[Int] =
    selectAll(doc, parse(selector), scopeId)

  /** Pre-parsed variant — extraction evaluates the same handful of field
    * selectors over hundreds of items per page; parse once, match many.
    */
  def selectAll(doc: DomDocument, sel: Selector, scopeId: Int): Vector[Int] =
    candidateIds(doc, scopeId).filter(id => matches(doc, id, sel)).toVector

  def selectOne(doc: DomDocument, selector: String, scopeId: Int = -1): Option[Int] =
    selectOne(doc, parse(selector), scopeId)

  /** First match in document order — short-circuits (does NOT materialize
    * the full match set the way selectAll does).
    */
  def selectOne(doc: DomDocument, sel: Selector, scopeId: Int): Option[Int] =
    candidateIds(doc, scopeId).find(id => matches(doc, id, sel))

  /** First match among an explicit candidate list (document-order node ids)
    * — lets extraction reuse one descendants scan across all field rules of
    * an item.
    */
  def selectOneAmong(doc: DomDocument, sel: Selector, candidates: IndexedSeq[Int]): Option[Int] = {
    var i = 0
    while (i < candidates.length) {
      if (matches(doc, candidates(i), sel)) return Some(candidates(i))
      i += 1
    }
    None
  }

  private def candidateIds(doc: DomDocument, scopeId: Int): Iterator[Int] =
    if (scopeId < 0) doc.nodes.iterator.map(_.id)
    else descendants(doc, scopeId).iterator

  def descendants(doc: DomDocument, id: Int): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    def rec(i: Int): Unit = doc.children(i).foreach { c => out += c; rec(c) }
    rec(id)
    out.result()
  }
}
