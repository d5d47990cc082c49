package graft.operators

/** robots.txt (RFC 9309) parse + decision — the crawl-politeness step
  * of a web-corpus pipeline, beside [[UrlNorm]]'s canonicalization and
  * the WARC ingest path. Implements the Robots Exclusion Protocol as
  * crawlers apply it:
  *
  *   - lines are `field: value` records; `#` starts a comment; field
  *     names are case-insensitive; unknown fields are ignored
  *   - consecutive `User-agent` lines stack onto the following rule
  *     group; an agent picks the group whose product token matches it
  *     (case-insensitive substring of the agent name), falling back to
  *     the `*` group — and then ONLY that group applies
  *   - rule paths support `*` (any octet sequence) and a trailing `$`
  *     end anchor
  *   - the decision is most-specific-wins: the matching rule with the
  *     LONGEST pattern decides; on equal length Allow beats Disallow;
  *     no matching rule means allowed
  *
  * Pure string parsing and per-URL decisions — a map-side gate at any
  * scale (the robots corpus for a host set is model-sized next to the
  * crawl). */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  def parse(txt: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty
      rules = Vector.empty
      inRules = false
    }
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val at = line.indexOf(':')
      if (at > 0) {
        val field = line.substring(0, at).trim.toLowerCase
        val value = line.substring(at + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) flush()
            agents :+= value.toLowerCase
          case "allow" if agents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) rules :+= Rule(allow = true, value)
          case "disallow" if agents.nonEmpty =>
            inRules = true
            // empty Disallow means "allow everything" — no rule
            if (value.nonEmpty) rules :+= Rule(allow = false, value)
          case _ => // sitemap/crawl-delay/unknown: ignored
        }
      }
    }
    flush()
    groups.result()
  }

  /** `*`-wildcard + `$`-anchor pattern match against a path. */
  private[operators] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    // greedy left-to-right: first part must prefix, rest must appear
    // in order; anchored means the final part must end the path
    var pos = 0
    var ok = path.startsWith(parts.head)
    pos = parts.head.length
    var i = 1
    while (ok && i < parts.length) {
      val p = parts(i)
      if (i == parts.length - 1 && anchored) {
        ok = path.length >= pos + p.length && path.endsWith(p)
      } else if (p.isEmpty) {
        // consecutive '*' or trailing '*': matches anything
      } else {
        val at = path.indexOf(p, pos)
        if (at < 0) ok = false else pos = at + p.length
      }
      i += 1
    }
    if (parts.length == 1 && anchored) ok = ok && path.length == pat.length
    ok
  }

  /** Pick the agent's group (longest matching product token wins,
    * `*` as fallback), then decide by most-specific rule. Only groups
    * whose matching token ties the LONGEST match apply (RFC 9309 §2.2.1
    * most-specific user-agent; equal-token groups combine) — a policy
    * with both `graft` and `graftbot` groups must apply only the
    * `graftbot` rules to a graftbot agent. */
  def allowed(groups: Seq[Group], agent: String, path: String): Boolean = {
    val a = agent.toLowerCase
    val matchLen = groups.map(
      _.agents.filter(t => t != "*" && a.contains(t))
        .map(_.length).maxOption.getOrElse(-1))
    val best = if (matchLen.isEmpty) -1 else matchLen.max
    val g =
      if (best >= 0)
        groups.zip(matchLen).collect { case (gr, l) if l == best => gr }
      else groups.filter(_.agents.contains("*"))
    val rules = g.flatMap(_.rules)
    val hits = rules.filter(r => matches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(r => (r.pattern.length, r.allow))
        .sortBy { case (len, allow) => (-len, !allow) }
      best.head._2
    }
  }
}
