package graft.frontier

/** robots.txt parsing (C4): the subset the frontier consumes — user-agent
  * groups, `Disallow` path prefixes, `Crawl-delay`. Semantics follow the
  * de-facto standard as Python's RobotFileParser / scrapy apply it
  * (the reference delegates robots handling to scrapy's ROBOTSTXT_OBEY,
  * crawler settings.py): case-insensitive keys, `#` comments, consecutive
  * `User-agent` lines open one group, the most specific matching group wins
  * (longest agent token; `*` matches all), empty `Disallow` allows
  * everything.
  */
object Robots {

  final case class Group(agents: Vector[String], disallow: Vector[String],
      crawlDelayMs: Option[Long])

  def parseGroups(body: String): Vector[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var dis = Vector.empty[String]
    var delay: Option[Long] = None
    var inDirectives = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, dis, delay)
      agents = Vector.empty; dis = Vector.empty; delay = None
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
          case "allow" | "sitemap" =>
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
      case Some((_, g)) => RobotsRule(host, g.disallow, g.crawlDelayMs.getOrElse(0L))
      case None => RobotsRule(host, Seq.empty, 0L)
    }
  }
}
