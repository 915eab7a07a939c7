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

  /** The SURT host key of a curated blocklist entry: `news.Example.com` →
    * `com,example,news` (what [[ancestorKeys]] of a page url are compared
    * against). Curated files spell entries many ways — a scheme prefix
    * (`https://example.com`), a `*.` wildcard (SURT ancestor keys already
    * cover subdomains), a root dot, userinfo, a pasted url with a path —
    * and a key minted from the raw line would never equal any page's
    * ancestor key, silently enforcing nothing. Normalize to the bare host
    * first; entries that still yield no host key are dropped (and counted)
    * by [[dropBlockedHosts]].
    */
  def hostKey(domain: String): String = {
    val noScheme = domain.trim.toLowerCase
      .replaceFirst("^[a-z][a-z0-9+.-]*://", "")
    val noPath = noScheme.takeWhile(c => c != '/' && c != '?' && c != '#')
    val bare = noPath.substring(noPath.lastIndexOf('@') + 1)
      .stripPrefix("*.").stripPrefix(".").stripSuffix(".")
    if (bare.isEmpty) ""
    else UrlCanon.surt("http://" + bare)
      .takeWhile(_ != ')').replaceAll(":\\d+$", "")
  }

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
    val dropped = blockedDomains.count(hostKey(_).isEmpty)
    if (dropped > 0)
      System.err.println(s"[blocklist] $dropped entr${if (dropped == 1) "y" else "ies"} " +
        "yielded no host key and block nothing")
    if (keys.isEmpty) df
    // coalesce: a null url has no host, so no blocklist can match it —
    // it must survive this pass exactly as it does when the list is
    // empty (junk rows are another pass's job, not silent loss here)
    else df.filter(
      !coalesce(exists(ancestorKeys(col(urlCol)), a => a.isInCollection(keys)),
        lit(false)))
  }
}
