package graft.streaming

import org.apache.spark.sql.Dataset

/** One discovered URL on the crawl stream. */
case class DiscoveredUrl(docId: Long, variant: Long, url: String)

/** Frontier verdict: canonical target, robots gate, first-discovery
  * dedup, and the fetch decision. */
case class FrontierVerdict(docId: Long, variant: Long, canon: String,
    allowed: Boolean, isDup: Boolean, fetch: Boolean)

/** STREAMING CRAWL FRONTIER — the crawler-side standing query
  * composing the web family: discovered URLs canonicalize
  * (operators/UrlNorm) and pass the robots gate (operators/Robots)
  * statelessly; the first-discovery dedup rides the SAME keeper state
  * machine as line-level dedup ([[StreamingLineDedup]] keyed by the
  * canonical URL), so a (docId, variant)-ordered replay reproduces
  * the batch `crawl_frontier` exactly (pinned by the parity spec).
  * State is the distinct-canonical-URL dimension. */
object CrawlFrontier {

  def verdictStream(urls: Dataset[DiscoveredUrl], robotsTxt: String,
      agent: String): Dataset[FrontierVerdict] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val groups = graft.operators.Robots.parse(robotsTxt)
    val canon = urls.map { u =>
      val c = graft.operators.UrlNorm.normalize(u.url)
      val path = c.substring(c.indexOf('/', 8))
        .takeWhile(ch => ch != '?' && ch != '#')
      val ok = graft.operators.Robots.allowed(groups, agent, path)
      (StreamLine(u.docId, u.variant, c), ok)
    }
    // robots verdicts are a pure function of the canonical URL, so the
    // flag re-derives after the keeper pass instead of riding through
    // the state operator
    val canonAllowed = (c: String) => {
      val path = c.substring(c.indexOf('/', 8))
        .takeWhile(ch => ch != '?' && ch != '#')
      graft.operators.Robots.allowed(groups, agent, path)
    }
    StreamingLineDedup.verdictStream(canon.map(_._1)).map { v =>
      val ok = canonAllowed(v.line)
      FrontierVerdict(v.docId, v.lineNo, v.line, ok, !v.kept,
        ok && v.kept)
    }
  }
}
