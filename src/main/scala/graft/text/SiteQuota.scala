package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-site page quota — cap how many pages any one site contributes to
  * the corpus. Web crawls are wildly site-skewed (forums, wikis and
  * link-farms mint millions of near-identical pages), and a training
  * corpus that lets one host dominate is both lower-quality and a dedup
  * time sink: the quota is the standard web-pipeline guard that runs
  * BEFORE the expensive passes, shrinking everything downstream.
  *
  * Site identity is the SURT host key (X14 machinery): respellings of the
  * same host — case, default ports, userinfo — share a key, and subdomains
  * stay distinct (`com,example` vs `com,example,news`), matching how
  * crawl indexes bucket a "site".
  *
  * Scale shape: the election is a rank-1..cap filter over the per-site
  * window, which Spark executes as `WindowGroupLimit` (spec-gated): each
  * task forwards at most `cap` rows per site into the shuffle, so a
  * 10^9-page host ships O(tasks × cap) rows, never 10^9. No other
  * operator sees the over-quota rows at all.
  *
  * Reference analog: none — the reference's corpus is a personal photo
  * library with no notion of "site"; this is what the webtext payload
  * adds (SURVEY §2 round-5 deltas, A11).
  */
object SiteQuota {

  /** SURT site key of a url: the host segment of the SURT form (before
    * the `)` path separator) — `HTTPS://News.Example.COM:443/a` and
    * `http://news.example.com/b?x=1` share `com,example,news`.
    */
  def siteKey(url: Column): Column =
    substring_index(UrlCanon.urlSurt(url), ")", 1)

  /** Keep at most `cap` pages per site. `order` is the keep-priority
    * (first column decides, ties break down the list) — pass e.g. a
    * quality score descending, or crawl timestamp descending for
    * newest-wins; the default orders by the url itself, which is arbitrary
    * but deterministic. The url and then a hash of the WHOLE row are the
    * final tiebreaks: the quota runs before dedup, so the same url can
    * recur with different payloads (a refetch), and a tiebreak that stops
    * at the url would pick an arbitrary physical row — which text survives
    * would flap between runs. Rows identical on every column still rank
    * arbitrarily, but swapping them is unobservable in the output.
    *
    * Null-url rows are EXEMPT from the quota (no site, no quota — junk
    * rows are the discovery filters' job): each gets a unique partition
    * key, so the null population is neither silently capped to `cap` rows
    * nor funneled through one window task.
    */
  def capPerSite(df: DataFrame, urlCol: String, cap: Int,
                 order: Seq[Column] = Nil): DataFrame = {
    require(cap >= 1, s"site cap must be >= 1, got $cap")
    // tiebreak hash over the HASHABLE columns only: xxhash64 rejects
    // MapType (plan-time AnalysisException), and a pages frame carrying
    // e.g. a map<string,string> headers column must not crash a quota
    // pass that never reads it. Excluding a column only coarsens the
    // tiebreak among rows identical on every hashable column — swapping
    // those is already documented as unobservable.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case st: org.apache.spark.sql.types.StructType =>
        st.fields.forall(f => hashable(f.dataType))
      case at: org.apache.spark.sql.types.ArrayType => hashable(at.elementType)
      case _ => true
    }
    val hashCols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val rowHash =
      if (hashCols.nonEmpty) xxhash64(hashCols: _*) else lit(0L)
    val part = when(col(urlCol).isNull,
        concat(lit("__nosite__"), monotonically_increasing_id().cast("string")))
      .otherwise(siteKey(col(urlCol)))
    val w = Window.partitionBy(part)
      .orderBy(order ++ Seq(col(urlCol).asc, rowHash.asc): _*)
    df.withColumn("_site_rn", row_number().over(w))
      .filter(col("_site_rn") <= cap)
      .drop("_site_rn")
  }
}
