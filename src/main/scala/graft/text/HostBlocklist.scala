package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host blocklist — drop every page from a blocked site before anything
  * else touches it (the C4 badwords-domain / RefinedWeb blocklist pass).
  * Blocking a host blocks its subdomains: SURT's reversed labels make
  * "subdomain of" a prefix relation, so `com,example` covers
  * `com,example,news` via the page's ancestor chain.
  *
  * Scale shape: a blocklist is a CONFIG artifact (10^4-10^6 lines curated
  * by humans), not a dataset — so it ships as plan literals and the drop
  * is a pure per-row filter: `exists(ancestorKeys, key ∈ InSet)`, zero
  * exchange, zero join, rides the scan. Catalyst compiles
  * `isInCollection` over a large literal set to `InSet` (hash-set probe,
  * O(ancestors) per row regardless of blocklist size). Contrast
  * [[Decontaminate]], whose benchmark side is a TABLE and joins; the
  * blocklist's natural home is the plan itself.
  *
  * Reference analog: the reference's excluded-prefix skip-list
  * (`discovery/mod.rs:16-109` config filters, F2/F8 in SURVEY §2) —
  * re-imagined for web identity.
  */
object HostBlocklist {

  /** The SURT host key of a bare domain: `news.Example.com` →
    * `com,example,news` (what blocklist FILES contain — [[ancestorKeys]]
    * of a page url are compared against these).
    */
  def hostKey(domain: String): String =
    UrlCanon.surt("http://" + domain.trim.stripSuffix(".").toLowerCase)
      .takeWhile(_ != ')').replaceAll(":\\d+$", "")

  /** Every ancestor SURT key of the url's host, shortest first:
    * `http://a.b.example.com/x` → [com | com,example | com,example,b |
    * com,example,b,a]. Ports never participate in blocking — a blocked
    * domain covers every port it is served on (the SURT key keeps a
    * non-default port on the host key, so it is stripped here; [[hostKey]]
    * strips it from curated entries symmetrically).
    */
  def ancestorKeys(url: Column): Column = {
    val labels = split(
      regexp_replace(SiteQuota.siteKey(url), ":\\d+$", ""), ",")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, lit(1), i), ","))
  }

  /** `df` without pages whose host (or any parent domain) is blocked.
    * `blockedDomains` are bare domains as curated ("Example.COM" is
    * normalized); an empty list is the identity.
    */
  def dropBlockedHosts(df: DataFrame, urlCol: String,
                       blockedDomains: Seq[String]): DataFrame = {
    val keys = blockedDomains.map(hostKey).filter(_.nonEmpty).distinct
    if (keys.isEmpty) df
    else df.filter(
      !exists(ancestorKeys(col(urlCol)), a => a.isInCollection(keys)))
  }
}
