package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-normalization step in front of URL-level
  * dedup (crawl pipelines dedup by canonical URL before any content pass:
  * it is free compared to shingling, and crawl frontiers revisit the same
  * page under dozens of surface forms).
  *
  * Whole chain is codegen'd built-ins (split/filter/sort on arrays, regexp
  * on scheme/host), no UDF, and every rule is replayable in ANSI-ish SQL —
  * the DuckDB oracle runs the identical normalization.
  *
  * Rules (deterministic, order-independent input → one canonical form):
  *  - scheme and host lowercased; path/query case preserved
  *  - fragment dropped
  *  - leading `www.` and default ports `:80`/`:443` dropped from the host
  *  - tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`)
  *  - remaining query params SORTED (param order never distinguishes pages)
  *  - trailing slashes trimmed from the path
  */
object Urls {

  private val TrackingParam = "^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val hostPath = substring_index(noFrag, "://", -1)
    val hostPort = lower(substring_index(hostPath, "/", 1))
    val host = regexp_replace(regexp_replace(hostPort, "^www\\.", ""), ":(80|443)$", "")
    // everything after the first '/' ('' when the URL has no path)
    val pathQ = when(hostPath.contains("/"),
      hostPath.substr(instr(hostPath, "/") + 1, lit(Int.MaxValue))).otherwise("")
    val path = regexp_replace(substring_index(pathQ, "?", 1), "/+$", "")
    val query = when(pathQ.contains("?"),
      pathQ.substr(instr(pathQ, "?") + 1, lit(Int.MaxValue))).otherwise("")
    val params = array_sort(filter(split(query, "&"),
      p => !(p.rlike(TrackingParam) || p === "")))
    concat(scheme, lit("://"), host,
      when(path === "", "").otherwise(concat(lit("/"), path)),
      when(size(params) === 0, "")
        .otherwise(concat(lit("?"), array_join(params, "&"))))
  }
}
