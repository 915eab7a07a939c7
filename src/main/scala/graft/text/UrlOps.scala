package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Web-native identity: URL canonicalization + SURT.
  *
  * The reference dedups files whose IDENTITY is a filesystem path —
  * unique by construction. A crawl's identity column is a URL, and the
  * same page arrives under trivially-different spellings (scheme casing,
  * default ports, duplicate slashes, tracking query params, param order,
  * fragments). Left raw, each spelling becomes a distinct id: the resume
  * anti-join re-fingerprints the page and the cluster table carries
  * exact-dup rows that no content hash was needed to find. Canonicalizing
  * the id column BEFORE the pipeline (CLI `--canon-urls`) collapses these
  * at the cheapest possible point — the scan projection.
  *
  * Canonical form (every step deliberately cheap + deterministic; this is
  * a dedup KEY, not a fetchable address):
  *   1. trim; drop the `#fragment`
  *   2. non-URL strings (no `scheme://`) pass through unchanged — never
  *      throw on crawl junk (S9 posture)
  *   3. scheme + host lowercased; userinfo dropped; trailing host dot
  *      dropped; default ports stripped (`:80` http, `:443` https)
  *   4. duplicate slashes in the path collapsed; empty path → `/`
  *   5. query params: tracking params dropped (`utm_*`, gclid, fbclid,
  *      msclkid, yclid, igshid, mc_eid, ref_src, _ga), the rest sorted in
  *      UTF-16 code-unit order — Java String ordering, identical to UTF-8
  *      byte order for every BMP character; supplementary-plane params
  *      (emoji keys) sort before U+E000..U+FFFF ones, unlike raw bytes
  *      (param ORDER is transport noise); an emptied query drops its `?`
  *
  * SURT (Sort-friendly URI Reordering Transform — the Internet Archive /
  * Common Crawl index key form): host labels reversed and comma-joined,
  * `com,example)/path?query`, computed over the canonical form. Sorting
  * a corpus by SURT clusters all pages of a site (and of its subdomains)
  * into contiguous ranges — the natural ORDER BY for a bucketed pages
  * layout, range-partitioned crawl exports, and per-site quotas.
  *
  * Reference analog: path normalization before identity use
  * (image-deduper lowercases extensions before format dispatch,
  * `crates/core/src/fixsuffix.rs:19-62`); this is the same "normalize
  * the identity, then trust it" move at web shape.
  */
object UrlCanon {

  private val trackingRe = java.util.regex.Pattern.compile(
    "(?i)^(utm_[^=]*|gclid|fbclid|msclkid|yclid|igshid|mc_eid|ref_src|_ga)(=.*)?$")
  private val urlRe = java.util.regex.Pattern.compile(
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?.*$")
  private val slashRe = java.util.regex.Pattern.compile("/{2,}")

  def canonicalize(url: String): String = {
    if (url == null) return null
    val s = url.trim
    val m = urlRe.matcher(s)
    if (!m.matches()) return s
    val scheme = m.group(1).toLowerCase
    var host = m.group(2)
    val at = host.lastIndexOf('@')
    if (at >= 0) host = host.substring(at + 1)
    host = host.toLowerCase
    // port BEFORE trailing dot: "example.com.:80" hides its dot behind the
    // port — the reverse order left it in place, so two trivially-equal
    // spellings kept distinct dedup keys and canonicalize wasn't idempotent
    if ((scheme == "http" && host.endsWith(":80")) ||
        (scheme == "https" && host.endsWith(":443")))
      host = host.substring(0, host.lastIndexOf(':'))
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    var path = m.group(3)
    path = if (path == null || path.isEmpty) "/" else slashRe.matcher(path).replaceAll("/")
    val query = cleanQuery(m.group(4))
    scheme + "://" + host + path + (if (query.isEmpty) "" else "?" + query)
  }

  private def cleanQuery(q: String): String = {
    if (q == null || q.isEmpty) return ""
    val kept = q.split("&").filter(p => p.nonEmpty && !trackingRe.matcher(p).matches())
    java.util.Arrays.sort(kept.asInstanceOf[Array[Object]])
    kept.mkString("&")
  }

  /** SURT key of the CANONICAL form: `com,example)/path?query`
    * (`com,example:8080)/...` for a non-default port).
    */
  def surt(url: String): String = {
    val c = canonicalize(url)
    if (c == null) return null
    val m = urlRe.matcher(c)
    if (!m.matches()) return c
    var host = m.group(2)
    var port = ""
    val colon = host.lastIndexOf(':')
    if (colon >= 0 && colon < host.length - 1 &&
        host.substring(colon + 1).forall(ch => ch >= '0' && ch <= '9')) {
      port = host.substring(colon)
      host = host.substring(0, colon)
    }
    val rev = host.split('.').reverse.mkString(",")
    val q = m.group(4)
    rev + port + ")" + m.group(3) + (if (q == null || q.isEmpty) "" else "?" + q)
  }

  import org.apache.spark.sql.graftshim.shim
  def urlCanon(c: Column): Column = shim.toColumn(UrlCanonExpr(shim.toExpression(c)))
  def urlSurt(c: Column): Column = shim.toColumn(SurtExpr(shim.toExpression(c)))

  /** The CLI `--canon-urls` pre-step: canonicalize the id column, then
    * collapse within-batch collisions (respellings of one page are now one
    * id, and the state contract is one row per id). Newest crawl wins when
    * the frame carries `warc_ts` — the rank-1 filter rides the shuffle as
    * a `WindowGroupLimit`, so hot pages never materialize whole groups —
    * else arbitrary-per-group (`dropDuplicates`).
    */
  def canonicalizePages(df: org.apache.spark.sql.DataFrame, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.functions.xxhash64
    val canon = df.withColumn(idCol, urlCanon(col(idCol)))
    if (canon.columns.contains("warc_ts"))
      // whole-row hash as the final tiebreak: same-second refetches of one
      // page are common, and a warc_ts-only order would elect a survivor
      // by shuffle arrival — different text across re-runs/retries, which
      // the sub-doc state's bit-identical re-run contract cannot tolerate
      canon.withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("warc_ts").desc_nulls_last,
            xxhash64(canon.columns.toIndexedSeq.map(col): _*).asc)))
        .filter(col("_rn") === 1).drop("_rn")
    else canon.dropDuplicates(idCol)
  }
}

/** Catalyst wrapper for [[UrlCanon.canonicalize]]: string → string. */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UrlCanon.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlCanonExpr", this, classOf[UrlCanonExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
  override def prettyName: String = "url_canon"
}

/** Catalyst wrapper for [[UrlCanon.surt]]: string → string. */
case class SurtExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UrlCanon.surt(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("surtExpr", this, classOf[SurtExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SurtExpr =
    copy(child = newChild)
  override def prettyName: String = "url_surt"
}
