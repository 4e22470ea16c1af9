package graft.frontier

/** robots.txt parsing (C4): the subset the frontier consumes — user-agent
  * groups, `Allow`/`Disallow` path prefixes, `Crawl-delay`. Semantics follow
  * the de-facto standard as Python's RobotFileParser / scrapy's protego apply
  * it (the reference delegates robots handling to scrapy's ROBOTSTXT_OBEY,
  * crawler settings.py): case-insensitive keys, `#` comments, consecutive
  * `User-agent` lines open one group, the most specific matching group wins
  * (longest agent token; `*` matches all), empty `Allow`/`Disallow` values
  * are ignored, and rule precedence is RFC 9309 §2.2.2 longest-match with
  * Allow winning ties ([[allowed]]). Deviation (documented): `*`/`$` wildcard
  * patterns inside paths are not expanded — rules are plain prefixes, the
  * only form the fixture corpus and the reference tests exercise.
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

  /** RFC 9309 §2.2.2 rule precedence: the most specific (longest) matching
    * prefix decides; `Allow` wins length ties; no matching rule = allowed.
    */
  def allowed(path: String, allows: Seq[String], disallows: Seq[String]): Boolean = {
    var best = -1 // longest matching disallow
    var bestAllow = -1
    var i = 0
    while (i < disallows.length) {
      val p = disallows(i)
      if (p.length > best && path.startsWith(p)) best = p.length
      i += 1
    }
    if (best < 0) return true
    i = 0
    while (i < allows.length) {
      val p = allows(i)
      if (p.length > bestAllow && path.startsWith(p)) bestAllow = p.length
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
