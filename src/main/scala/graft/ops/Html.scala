package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction as codegen'd column chains — the step
  * between WARC ingest ([[graft.io.WarcReader]]) and the text tier
  * (language id, quality, dedup). No UDFs, no parser objects: boilerplate
  * stripping at corpus scale is regex-shaped work Tungsten executes inside
  * whole-stage codegen, and every regex here is RE2-compatible (no
  * backreferences, no lookaround) so the DuckDB oracle replays the exact
  * chain.
  *
  * This is deliberately the cheap tier: full boilerplate removal
  * (readability/trafilatura-class DOM scoring) needs a DOM and lives
  * outside a columnar engine's sweet spot; the regex tier handles the bulk
  * strip and the quality operators downstream discard what it misses.
  */
object Html {

  /** Visible text of an HTML document: script/style/comments dropped, tags
    * stripped, the six standard entities decoded, whitespace collapsed.
    * Entity order matters: `&amp;` decodes LAST so `&amp;lt;` yields the
    * literal `&lt;` (one decode pass, never two).
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = replaceEntities(noTag)
    trim(regexp_replace(ent, "\\s+", " "))
  }

  private def replaceEntities(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** `<title>` text (first occurrence), '' when absent. */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** True when a robots meta tag opts the page out of indexing — the
    * compliance gate a crawl-derived corpus must honor before training use.
    */
  def metaNoindex(html: Column): Column =
    html.rlike("(?is)<meta[^>]*name\\s*=\\s*[\"']robots[\"'][^>]*content\\s*=\\s*[\"'][^\"']*noindex")

  /** All href link targets, in document order. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("(?is)href\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1))
}
