package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** RFC 9309 (robots.txt) evaluation — the admission-control half of the
  * crawl cycle the reference skips entirely (`Crawling.py` fetches
  * unconditionally; a production crawler legally and operationally
  * cannot). Parsing and rule evaluation are pure JVM functions over the
  * per-host robots bodies — model-sized state (hosts × rules), fetched
  * once per host per cycle through the same injected-fetcher boundary as
  * [[CrawlOps.fetchPages]] — so the distributed form is a broadcast of
  * the parsed rule map and a per-row prefix-match, no shuffle anywhere.
  *
  * Semantics implemented per RFC 9309 §2.2:
  *  - group selection: the group whose user-agent token is the LONGEST
  *    substring of the client's product token (case-insensitive);
  *    `*` groups apply only when no specific group matches;
  *  - rule precedence: the matching rule with the LONGEST pattern wins;
  *    equal lengths resolve to ALLOW;
  *  - patterns are path prefixes with `*` (any octets) and `$`
  *    (end anchor); an empty Disallow matches nothing (allow all);
  *  - no matching rule → allowed.
  */
object RobotsOps {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelay: Option[Double] = None)

  /** Parse one robots.txt body into agent groups. Consecutive
    * `User-agent` lines open one group; `Allow`/`Disallow` lines attach
    * to the open group; unknown directives and comments are skipped
    * (RFC 9309 §2.2.3 tolerance).
    */
  def parse(text: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents :+= value.toLowerCase
            inAgents = true
          case "allow" =>
            inAgents = false
            if (agents.nonEmpty) rules :+= Rule(allow = true, value)
          case "disallow" =>
            inAgents = false
            if (agents.nonEmpty) rules :+= Rule(allow = false, value)
          case "crawl-delay" =>
            inAgents = false
            if (agents.nonEmpty)
              delay = scala.util.Try(value.toDouble).toOption.filter(_ > 0)
          case _ => inAgents = false // sitemap, unknown
        }
      }
    }
    flush()
    groups.result()
  }

  /** `Sitemap:` records (the sitemaps.org extension RFC 9309 §2.2.4
    * carries as "other records") — GLOBAL, not group-scoped: every
    * sitemap URL applies regardless of which agent group matched. This
    * is how a crawler discovers the sitemap bodies
    * [[graft.operators.FrontierOps.crawlSitemap]] ingests — robots.txt
    * is the one URL a crawler can always construct, and its Sitemap
    * lines bootstrap everything else. File order kept, duplicates
    * dropped; the directive value is a full URL, returned verbatim
    * (case of the URL matters, unlike directive keys).
    */
  def sitemaps(text: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0 && line.substring(0, idx).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(idx + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result().distinct
  }

  /** The rule set governing `agent`: the most specific matching group
    * (longest user-agent token that is a substring of the agent), else
    * the `*` group, else no rules (everything allowed).
    */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] =
    groupFor(groups, agent).map(_.rules).getOrElse(Seq.empty)

  /** Crawl-delay (non-standard but ubiquitous) for `agent`, from the same
    * group-selection rule. */
  def crawlDelayFor(groups: Seq[Group], agent: String): Option[Double] =
    groupFor(groups, agent).flatMap(_.crawlDelay)

  private def groupFor(groups: Seq[Group], agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val specific = groups.flatMap(g =>
      g.agents.filter(t => t != "*" && a.contains(t)).map(t => (t.length, g)))
    if (specific.nonEmpty) Some(specific.maxBy(_._1)._2)
    else groups.find(_.agents.contains("*"))
  }

  /** Length of the pattern if it matches a prefix of `path` (RFC match
    * specificity = pattern octet length), None otherwise. `*` matches any
    * run (including empty); `$` at pattern end anchors to path end; an
    * empty pattern matches nothing.
    */
  private[graft] def matchLen(pattern: String, path: String): Option[Int] = {
    if (pattern.isEmpty) return None
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    // greedy wildcard prefix match, iterative backtracking
    def matches(pi0: Int, si0: Int): Boolean = {
      var pi = pi0; var si = si0
      var starPi = -1; var starSi = -1
      while (true) {
        if (pi < pat.length && pat.charAt(pi) == '*') {
          starPi = pi; starSi = si; pi += 1
        } else if (pi < pat.length && si < path.length &&
          pat.charAt(pi) == path.charAt(si)) {
          pi += 1; si += 1
        } else if (pi == pat.length) {
          // pattern consumed: a prefix match unless anchored to the end
          if (!anchored || si == path.length) return true
          // anchored: try to push the last * further
          if (starPi < 0 || starSi >= path.length) return false
          starSi += 1; pi = starPi + 1; si = starSi
        } else if (starPi >= 0 && starSi < path.length) {
          starSi += 1; pi = starPi + 1; si = starSi
        } else return false
      }
      false
    }
    if (matches(0, 0)) Some(pattern.length) else None
  }

  /** RFC 9309 verdict for one path: longest matching pattern wins,
    * allow wins length ties, no match allows.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    val hits = rules.flatMap(r => matchLen(r.pattern, path).map(l => (l, r.allow)))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_._1).max
      hits.filter(_._1 == best).exists(_._2) // any allow at max length wins
    }
  }

  /** The user-agent product token the engine crawls as — one definition
    * for the frontier gate, the fixture bodies, and the tests.
    */
  val FixtureAgent = "graftbot"

  /** Deterministic fixture robots corpus for the synthetic hosts
    * (`srcK`) — the per-host bodies a crawl cycle would have fetched
    * before scheduling, exercising every RFC 9309 semantic the evaluator
    * implements. Host class = K % 4:
    *
    *  - class 0: plain prefix rules (`/de/`, `/zh/` disallowed) +
    *    `Crawl-delay: 2`;
    *  - class 1: wildcard + end-anchor (a disallow of any path ending
    *    in 7: slash, star, 7, dollar — spelled out because the literal
    *    would nest this comment) against `Allow: /en/` (longest-match
    *    TIE at length 4, allow wins) over `Disallow: /en` (shorter,
    *    loses) + `Crawl-delay: 3`;
    *  - class 2: GROUP SELECTION — a `googlebot` group and a `*` group
    *    both disallow everything; the `graftbot` group disallows only
    *    `/es/`. Picking the wrong group blanks (or floods) the host.
    *  - class 3: no robots body → everything allowed (RFC 9309 §2.3.1.2
    *    unavailability rule).
    *
    * The DuckDB oracle mirrors these rules as a handwritten literal
    * table (LIKE patterns + pattern lengths), NOT through this parser —
    * so a group-selection or longest-match bug here diverges from the
    * oracle instead of being copied into it.
    */
  def fixtureRobots(hosts: Seq[String]): Map[String, String] =
    robotsByFetch(hosts, fixtureFetch)

  /** The robots.txt URL of a host (RFC 9309 §2.3: always at the root). */
  def robotsUrl(host: String): String = s"https://$host/robots.txt"

  /** Fetch each host's robots body through an INJECTED control-plane
    * fetcher (r15, VERDICT §8): one URL per host, driver-side — robots
    * acquisition is catalog-scale control plane, unlike the page fetch
    * (corpus-scale, executor-side through
    * [[graft.sources.CrawlOps.fetchPages]]). `None` = no robots body
    * (404/unreachable), which RFC 9309 §2.3.1.2 treats as allow-all —
    * the same offline/online split as the page connector: production
    * injects an HTTP client, the fixture injects [[fixtureFetch]].
    */
  def robotsByFetch(hosts: Seq[String],
      fetch: String => Option[String]): Map[String, String] =
    hosts.flatMap(h => fetch(robotsUrl(h)).map(h -> _)).toMap

  /** The fixture control-plane fetcher: derives each host's body from
    * the host name embedded in the URL (class = digits % 4, above) —
    * exactly what the injected HTTP fetcher would have returned.
    */
  def fixtureFetch: String => Option[String] = { url =>
    val host = url.stripPrefix("https://").stripPrefix("http://")
      .takeWhile(_ != '/')
    val digits = host.reverse.takeWhile(_.isDigit).reverse
    val cls: Int = if (digits.isEmpty) 3 else (BigInt(digits) % 4).toInt
    cls match {
      case 0 => Some(
        "User-agent: *\nDisallow: /de/\nDisallow: /zh/\nCrawl-delay: 2\n")
      case 1 => Some(
        "User-agent: *\nDisallow: /*7$\nAllow: /en/\nDisallow: /en\nCrawl-delay: 3\n")
      case 2 => Some(
        "User-agent: googlebot\nDisallow: /\n\n" +
          "User-agent: graftbot\nDisallow: /es/\n\n" +
          "User-agent: *\nDisallow: /\n")
      case _ => None
    }
  }

  /** Admission gate over (host, path) COLUMNS — the form the frontier
    * scheduler composes ([[graft.operators.FrontierOps.crawlFrontierRobots]]):
    * rows whose host's rules disallow the path for `agent` are dropped
    * BEFORE any ranking, so a disallowed URL never consumes a politeness
    * slot. The parsed per-host rule map is model-sized (the robots store
    * is host-keyed, one body per host per cycle) and rides the task
    * closure; evaluation is a map-side per-row prefix match — no shuffle,
    * no fetch. Hosts with no robots body are allowed (RFC 9309 §2.3.1.2).
    */
  def admitByHostPath(frontier: DataFrame, hostCol: String, pathCol: String,
      robotsByHost: Map[String, String], agent: String): DataFrame = {
    val ruleMap: Map[String, Seq[Rule]] =
      robotsByHost.map { case (h, txt) => h -> rulesFor(parse(txt), agent) }
    val hi = frontier.schema.fieldIndex(hostCol)
    val pi = frontier.schema.fieldIndex(pathCol)
    frontier.filter { r: org.apache.spark.sql.Row =>
      !r.isNullAt(hi) && !r.isNullAt(pi) && (ruleMap.get(r.getString(hi)) match {
        case None => true
        case Some(rules) => isAllowed(rules, r.getString(pi))
      })
    }
  }

  /** Distributed admission filter: drop frontier urls their host's robots
    * rules disallow for `agent`. The parsed rule map (host → rules) is
    * model-sized and rides the task closure; evaluation is a per-row
    * prefix match with no shuffle. Hosts with no robots body are allowed
    * (the RFC 9309 unavailability rule for 404).
    */
  def filterAllowed(urls: Dataset[String], robotsByHost: Map[String, String],
      agent: String): Dataset[String] = {
    val ruleMap: Map[String, Seq[Rule]] =
      robotsByHost.map { case (h, txt) => h -> rulesFor(parse(txt), agent) }
    urls.filter { u =>
      val uri = try new java.net.URI(u) catch { case _: Exception => null }
      if (uri == null || uri.getHost == null) false // malformed: never fetch
      else ruleMap.get(uri.getHost.toLowerCase) match {
        case None => true
        case Some(rules) =>
          val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
          isAllowed(rules, path)
      }
    }
  }

  /** Frontier composition: [[graft.operators.FrontierOps]]' schedule
    * filtered by robots admission — the fetch list a polite crawler
    * actually issues.
    */
  def admitFrontier(frontier: DataFrame, urlCol: String,
      robotsByHost: Map[String, String], agent: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = frontier.sparkSession
    import spark.implicits._
    val allowed = filterAllowed(
      frontier.select(col(urlCol)).distinct().as[String],
      robotsByHost, agent).toDF(urlCol)
    frontier.join(org.apache.spark.sql.functions.broadcast(allowed), urlCol)
  }

  /** Delay-aware slot caps: a host advertising `Crawl-delay: d` can
    * absorb at most ⌊cycleSeconds/d⌋ fetches per cycle, so its frontier
    * cap shrinks to min(globalCap, that budget). The frontier already
    * carries a per-host `slot` rank ([[graft.operators.FrontierOps]]);
    * this filters it against the per-host budget broadcast from the
    * model-sized robots map. Hosts with no delay keep the global cap.
    */
  def capByCrawlDelay(frontier: DataFrame, hostCol: String, slotCol: String,
      robotsByHost: Map[String, String], agent: String,
      cycleSeconds: Double, globalCap: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = frontier.sparkSession
    val caps = robotsByHost.toSeq.map { case (h, txt) =>
      val cap = crawlDelayFor(parse(txt), agent) match {
        case Some(d) => math.min(globalCap.toLong, (cycleSeconds / d).toLong)
        case None => globalCap.toLong
      }
      (h, cap)
    }
    val capDf = spark.createDataFrame(caps).toDF("__host", "__cap")
    frontier.join(broadcast(capDf), col(hostCol) === col("__host"), "left")
      .where(col(slotCol) <= coalesce(col("__cap"), lit(globalCap.toLong)))
      .drop("__host", "__cap")
  }
}
