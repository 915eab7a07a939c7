package graft.discovery

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discovery-layer predicates — the scan-side filter battery of the
  * reference's directory walk (image-deduper `src/discovery/mod.rs:41-109`),
  * re-targeted at a pages/documents table. Pure Column combinators so every
  * predicate pushes down to the parquet/Iceberg scan (PLANS.md audits the
  * `PushedFilters` line).
  */
object Discovery {

  /** F1 (hidden-file filter, `discovery/mod.rs:61-66`): drop ids whose last
    * path segment starts with '.'.
    */
  def notHidden(url: Column): Column =
    !element_at(split(url, "/"), -1).startsWith(".")

  /** F2 (excluded-dirs filter, `discovery/mod.rs:68-72`; config
    * `config.rs:90`): drop ids under any excluded prefix.
    */
  def notExcluded(url: Column, excludedPrefixes: Seq[String]): Column =
    excludedPrefixes.foldLeft(lit(true))((acc, p) => acc && !url.startsWith(p))

  /** F4 (extension→format supported filter, `discovery/mod.rs:81-85`,
    * `types.rs:24-44`): keep allowlisted langs unless
    * `process_unsupported_formats` (`config.rs:63`).
    */
  def supportedLang(lang: Column, supported: Seq[String],
                    processUnsupported: Boolean = false): Column =
    if (processUnsupported) lit(true) else lang.isin(supported: _*)

  /** F5 (WalkDir max_depth, `discovery/mod.rs:48`): path-segment count. */
  def maxDepth(url: Column, depth: Int): Column =
    size(split(url, "/")) <= depth

  /** F3 + F7 (is-file + zero-size drop, `file_validation.rs:37-51`). */
  def nonEmptyText(text: Column): Column =
    text.isNotNull && length(text) > 0

  /** The composed discovery scan (S1/S2): multiple roots fan out as a union
    * of scans (`discovery/mod.rs:16-38`); each root applies the filter
    * battery. All predicates are scan-pushable.
    */
  def discover(roots: Seq[DataFrame], urlCol: String, textCol: String, langCol: String,
               excludedPrefixes: Seq[String] = Nil,
               supportedLangs: Seq[String] = Nil,
               maxDepthSegments: Int = Int.MaxValue,
               processUnsupported: Boolean = false): DataFrame = {
    require(roots.nonEmpty, "at least one root")
    val filtered = roots.map { df =>
      val u = col(urlCol)
      df.filter(
        notHidden(u) &&
          notExcluded(u, excludedPrefixes) &&
          (if (supportedLangs.nonEmpty)
             supportedLang(col(langCol), supportedLangs, processUnsupported)
           else lit(true)) &&
          (if (maxDepthSegments != Int.MaxValue) maxDepth(u, maxDepthSegments)
           else lit(true)) &&
          nonEmptyText(col(textCol)))
    }
    // by NAME: multi-root fan-out reads from different sources, whose
    // column ORDERS legitimately diverge — a positional union would land
    // one root's lang values in another's text column without an error
    filtered.reduce(_ unionByName _)
  }
}
