package graft.urls

/** URL resolution / canonicalization for the extraction pipeline and the
  * frontier. From-scratch RFC 3986 implementation (Spark has no urljoin).
  *
  * Semantics references:
  *   - resolve: Python `urllib.parse.urljoin` as used by
  *     /root/reference/webspot/detect/detectors/plain_list.py:270-272
  *   - transformUrl: /root/reference/webspot/detect/utils/transform_html_links.py:55-60
  *     including the reversed-`re.search`-args bug at :51-52 (a url is treated
  *     as "absolute" only when it is a literal substring of "^(https?:)?//").
  *   - canonicalize: scrapy w3lib request-fingerprint canonicalization
  *     (settings.py:90, REQUEST_FINGERPRINTER_IMPLEMENTATION='2.7'): lowercase
  *     scheme+host, strip default port, strip fragment, sort query params,
  *     empty path -> "/".
  */
object UrlOps {

  final case class ParsedUrl(scheme: String, netloc: String, path: String,
      query: String, fragment: String) {
    def host: String = {
      val noUser = netloc.substring(netloc.lastIndexOf('@') + 1)
      val ci = noUser.lastIndexOf(':')
      if (ci >= 0 && noUser.drop(ci + 1).forall(_.isDigit)) noUser.take(ci) else noUser
    }
    def port: Option[Int] = {
      val noUser = netloc.substring(netloc.lastIndexOf('@') + 1)
      val ci = noUser.lastIndexOf(':')
      if (ci >= 0 && noUser.length > ci + 1 && noUser.drop(ci + 1).forall(_.isDigit))
        Some(noUser.drop(ci + 1).toInt)
      else None
    }
  }

  /** urllib.parse.urlparse-alike split. */
  def parse(url: String): ParsedUrl = {
    var rest = url
    var fragment = ""
    val hi = rest.indexOf('#')
    if (hi >= 0) { fragment = rest.substring(hi + 1); rest = rest.substring(0, hi) }
    var scheme = ""
    val ci = rest.indexOf(':')
    if (ci > 0 && rest.take(ci).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
      && rest.head.isLetter) {
      scheme = rest.take(ci).toLowerCase
      rest = rest.substring(ci + 1)
    }
    var netloc = ""
    if (rest.startsWith("//")) {
      val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
      if (end < 0) { netloc = rest.substring(2); rest = "" }
      else { netloc = rest.substring(2, end); rest = rest.substring(end) }
    }
    var query = ""
    val qi = rest.indexOf('?')
    if (qi >= 0) { query = rest.substring(qi + 1); rest = rest.substring(0, qi) }
    ParsedUrl(scheme, netloc, rest, query, fragment)
  }

  def unparse(p: ParsedUrl): String = {
    val sb = new StringBuilder
    if (p.scheme.nonEmpty) sb.append(p.scheme).append(':')
    if (p.netloc.nonEmpty || p.scheme.nonEmpty) sb.append("//").append(p.netloc)
    sb.append(p.path)
    if (p.query.nonEmpty) sb.append('?').append(p.query)
    if (p.fragment.nonEmpty) sb.append('#').append(p.fragment)
    sb.result()
  }

  /** RFC 3986 dot-segment removal (urljoin behavior). Fast path: paths
    * without any "." segment (the overwhelming majority of crawl candidates
    * — the frontier canonicalizes millions per round) return unchanged with
    * zero allocation.
    */
  def removeDotSegments(path: String): String = {
    if (!needsDotRemoval(path)) return path
    removeDotSegmentsSlow(path)
  }

  /** conservative: true iff some path segment could be "." or ".." (false
    * positives just take the slow path; segments like "a.html" stay fast).
    */
  private def needsDotRemoval(path: String): Boolean = {
    var i = path.indexOf('.')
    while (i >= 0) {
      val segStart = i == 0 || path.charAt(i - 1) == '/' || path.charAt(i - 1) == '.'
      val segEnd = i + 1 == path.length || path.charAt(i + 1) == '/' || path.charAt(i + 1) == '.'
      if (segStart && segEnd) return true
      i = path.indexOf('.', i + 1)
    }
    false
  }

  private def removeDotSegmentsSlow(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    val absolute = path.startsWith("/")
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => // drop; keep trailing slash handled below
        case ".." => if (out.nonEmpty && out.last != "..") out.remove(out.length - 1)
        case s => out += s
      }
      i += 1
    }
    var res = out.mkString("/")
    // preserve trailing slash when last segment was . or ..
    if ((path.endsWith("/.") || path.endsWith("/..") || path.endsWith("/")) && !res.endsWith("/"))
      res += "/"
    if (absolute && !res.startsWith("/")) res = "/" + res
    res
  }

  /** Python urljoin(base, ref). */
  def resolve(base: String, ref: String): String = {
    if (ref == null || ref.isEmpty) return base
    if (base == null || base.isEmpty) return ref
    val b = parse(base)
    val r = parse(ref)
    if (r.scheme.nonEmpty && r.scheme != b.scheme)
      return unparse(r.copy(path = removeDotSegments(r.path)))
    val scheme = if (r.scheme.nonEmpty) r.scheme else b.scheme
    if (r.netloc.nonEmpty)
      return unparse(ParsedUrl(scheme, r.netloc, removeDotSegments(r.path), r.query, r.fragment))
    if (r.path.isEmpty) {
      val query = if (r.query.nonEmpty) r.query else b.query
      return unparse(ParsedUrl(scheme, b.netloc, b.path, query, r.fragment))
    }
    val path =
      if (r.path.startsWith("/")) removeDotSegments(r.path)
      else {
        val dir = b.path.lastIndexOf('/') match {
          case -1 => if (b.netloc.nonEmpty) "/" else ""
          case i  => b.path.substring(0, i + 1)
        }
        removeDotSegments(dir + r.path)
      }
    unparse(ParsedUrl(scheme, b.netloc, path, r.query, r.fragment))
  }

  private val AbsAnchor = "^(https?:)?//"

  /** Reference bug-compat: url counts as relative unless it is a substring of
    * the regex literal (transform_html_links.py:51-52).
    */
  def isRelativeBugCompat(url: String): Boolean = !AbsAnchor.contains(url)

  /** transform_html_links.py:55-60. */
  def transformUrl(rootUrl: String, url: String): String = {
    if (rootUrl == null) return url
    if (!isRelativeBugCompat(url)) return url
    resolve(rootUrl, url)
  }

  /** urlparse(url).netloc (webspot/detect/utils/url.py:4-7). */
  def urlDomain(url: String): String = parse(url).netloc

  def urlPath(url: String): String = parse(url).path

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** toLowerCase with an identity fast path — most crawl-candidate schemes
    * and hosts are already lowercase; the copy was pure allocation traffic.
    */
  private def lowerFast(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && Character.toLowerCase(s.charAt(i)) == s.charAt(i)) i += 1
    if (i == n) s else s.toLowerCase
  }

  /** Scrapy-style canonical url for fingerprinting (settings.py:90). */
  def canonicalize(url: String): String = {
    val p = parse(url)
    val scheme = lowerFast(p.scheme)
    val host = lowerFast(p.host)
    val port = p.port match {
      case Some(pt) if DefaultPorts.get(scheme).contains(pt) => ""
      case Some(pt) => s":$pt"
      case None => ""
    }
    val path = if (p.path.isEmpty) "/" else removeDotSegments(p.path)
    val query =
      if (p.query.isEmpty) ""
      else "?" + p.query.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")
    s"$scheme://$host$port$path$query"
  }

  /** 64-bit deterministic url hash for the seen-set / partition keys. */
  def urlHash64(url: String): Long = fnv1a64(canonicalize(url))

  /** (canonical url, lowercase host) with a single parse — the frontier
    * canonicalizes millions of candidate urls per round, so one-pass matters.
    */
  def canonicalParts(url: String): (String, String) = {
    val p = parse(url)
    val scheme = lowerFast(p.scheme)
    val host = lowerFast(p.host)
    val port = p.port match {
      case Some(pt) if DefaultPorts.get(scheme).contains(pt) => ""
      case Some(pt) => s":$pt"
      case None => ""
    }
    val path = if (p.path.isEmpty) "/" else removeDotSegments(p.path)
    val query =
      if (p.query.isEmpty) ""
      else "?" + p.query.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")
    (s"$scheme://$host$port$path$query", host)
  }

  def hostOf(url: String): String = lowerFast(parse(url).host)

  /** Path of an already-CANONICAL url (scheme://host[:port]/path[?query],
    * no fragment) without a full parse — equals `parse(url).path` on
    * canonicalize() output. The robots gate calls this once per candidate.
    */
  def pathOfCanonical(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return parse(url).path
    val j = url.indexOf('/', i + 3)
    if (j < 0) return ""
    val q = url.indexOf('?', j)
    if (q < 0) url.substring(j) else url.substring(j, q)
  }

  /** Path PLUS `?query` of an already-canonical url — what robots rules
    * match against per RFC 9309 §2.2.2 ("path and query"; protego/scrapy do
    * the same), so a `Disallow` rule with a `?sessionid=` tail can match.
    */
  def pathQueryOfCanonical(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) { val p = parse(url); return if (p.query.isEmpty) p.path else s"${p.path}?${p.query}" }
    val j = url.indexOf('/', i + 3)
    if (j < 0) "" else url.substring(j)
  }

  def hostHash(url: String): Int = {
    val h = fnv1a64(hostOf(url))
    (h ^ (h >>> 32)).toInt
  }

  /** FNV-1a over the string's UTF-8 bytes, encoded inline — no byte-array
    * allocation (the frontier hashes two strings per candidate url, millions
    * per round).
    */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    @inline def mix(b: Int): Unit = { h ^= (b & 0xffL); h *= 0x100000001b3L }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x80) mix(c)
      else if (c < 0x800) { mix(0xc0 | (c >> 6)); mix(0x80 | (c & 0x3f)) }
      else if (Character.isHighSurrogate(c) && i + 1 < n &&
        Character.isLowSurrogate(s.charAt(i + 1))) {
        val cp = Character.toCodePoint(c, s.charAt(i + 1))
        i += 1
        mix(0xf0 | (cp >> 18)); mix(0x80 | ((cp >> 12) & 0x3f))
        mix(0x80 | ((cp >> 6) & 0x3f)); mix(0x80 | (cp & 0x3f))
      } else if (Character.isSurrogate(c)) mix('?') // lone surrogate: as String.getBytes(UTF_8)
      else { mix(0xe0 | (c >> 12)); mix(0x80 | ((c >> 6) & 0x3f)); mix(0x80 | (c & 0x3f)) }
      i += 1
    }
    h
  }
}
