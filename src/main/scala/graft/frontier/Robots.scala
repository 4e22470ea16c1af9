package graft.frontier

/** robots.txt parsing (C4): the subset the frontier consumes — user-agent
  * groups, `Allow`/`Disallow` path prefixes, `Crawl-delay`. Semantics follow
  * the de-facto standard as Python's RobotFileParser / scrapy's protego apply
  * it (the reference delegates robots handling to scrapy's ROBOTSTXT_OBEY,
  * crawler settings.py): case-insensitive keys, `#` comments, consecutive
  * `User-agent` lines open one group, the most specific matching group wins
  * (longest agent token; `*` matches all), empty `Allow`/`Disallow` values
  * are ignored, and rule precedence is RFC 9309 §2.2.2 longest-match with
  * Allow winning ties ([[allowed]]). Rule paths support the RFC §2.2.3
  * special characters: `*` matches any character sequence and a trailing `$`
  * anchors the rule at the end of the path ([[matches]]); plain rules stay
  * on the prefix fast path.
  */
object Robots {

  final case class Group(agents: Vector[String], allow: Vector[String],
      disallow: Vector[String], crawlDelayMs: Option[Long])

  def parseGroups(body: String): Vector[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var alw = Vector.empty[String]
    var dis = Vector.empty[String]
    var delay: Option[Long] = None
    var inDirectives = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, alw, dis, delay)
      agents = Vector.empty; alw = Vector.empty; dis = Vector.empty; delay = None
      inDirectives = false
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.take(ci).trim.toLowerCase
        val value = line.drop(ci + 1).trim
        key match {
          case "user-agent" =>
            if (inDirectives) flush()
            agents :+= value.toLowerCase
          case "disallow" =>
            inDirectives = true
            if (value.nonEmpty) dis :+= value
          case "allow" =>
            inDirectives = true
            if (value.nonEmpty) alw :+= value
          case "sitemap" =>
            inDirectives = true // recognized, not consumed by the frontier
          case "crawl-delay" =>
            inDirectives = true
            delay = scala.util.Try((value.toDouble * 1000).toLong).toOption
          case _ =>
            inDirectives = true
        }
      }
    }
    flush()
    groups.result()
  }

  /** Resolve the effective rule for (host, userAgent): the group with the
    * longest agent token contained in the user agent; `*` as fallback.
    */
  def rule(host: String, body: String, userAgent: String = "graftbot"): RobotsRule = {
    val ua = userAgent.toLowerCase
    val groups = parseGroups(body)
    val matching = groups.flatMap { g =>
      g.agents.collect {
        case a if a == "*" => (0, g)
        case a if ua.contains(a) => (a.length, g)
      }
    }
    matching.sortBy(-_._1).headOption match {
      case Some((_, g)) =>
        RobotsRule(host, g.allow, g.disallow, g.crawlDelayMs.getOrElse(0L))
      case None => RobotsRule(host, Seq.empty, Seq.empty, 0L)
    }
  }

  /** RFC 9309 §2.2.3 rule matching: the rule is a path prefix where `*`
    * matches any character sequence and a trailing `$` anchors at path end.
    * Plain rules (no special chars) take the startsWith fast path — the hot
    * case for every fixture and most real robots files.
    */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    if (!anchored && pattern.indexOf('*') < 0) return path.startsWith(pattern)
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1) // literal segments between wildcards
    // leftmost-greedy sequential match (classic glob subsequence check)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      if (i == parts.length - 1 && anchored) {
        if (!(path.endsWith(p) && path.length - p.length >= pos)) return false
        pos = path.length
      } else {
        val j = path.indexOf(p, pos)
        if (j < 0) return false
        pos = j + p.length
      }
      i += 1
    }
    if (anchored && parts.length == 1) pos == path.length else true
  }

  /** RFC 9309 §2.2.2 rule precedence: the most specific (longest) matching
    * rule decides; `Allow` wins length ties; no matching rule = allowed.
    */
  def allowed(path: String, allows: Seq[String], disallows: Seq[String]): Boolean = {
    var best = -1 // longest matching disallow
    var bestAllow = -1
    var i = 0
    while (i < disallows.length) {
      val p = disallows(i)
      if (p.length > best && matches(path, p)) best = p.length
      i += 1
    }
    if (best < 0) return true
    i = 0
    while (i < allows.length) {
      val p = allows(i)
      if (p.length > bestAllow && matches(path, p)) bestAllow = p.length
      i += 1
    }
    bestAllow >= best
  }

  /** Serialize a rule back to a robots.txt body (used by the legacy
    * `CrawlEngine.run` bridge that turns pre-materialized rules into
    * synthetic `/robots.txt` page rows; `rule(serialize(r)) == r`).
    */
  def serialize(r: RobotsRule): String = {
    val sb = new StringBuilder("User-agent: *\n")
    r.allow_prefixes.foreach(p => sb ++= s"Allow: $p\n")
    r.disallow_prefixes.foreach(p => sb ++= s"Disallow: $p\n")
    if (r.crawl_delay_ms > 0) sb ++= s"Crawl-delay: ${r.crawl_delay_ms / 1000.0}\n"
    sb.result()
  }
}
