package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training text extraction — the stage every crawl pipeline
  * runs before anything else sees a document (a WET file IS this
  * stage's output, precomputed by the crawler; a WARC response body
  * is its input). Two layers:
  *
  *  - [[htmlToText]]: markup removal — scripts/styles/comments
  *    deleted (their text is code, not content), block-level closers
  *    become newlines (so the document's visual lines survive as
  *    machine-readable lines), remaining tags stripped, character
  *    references decoded (ALL numeric forms + the documented named
  *    tier — the native single-pass
  *    [[graft.functions.HtmlUnescapeCore]]), whitespace normalized
  *    per line.
  *  - [[mainContent]]: a jusText-style line filter — boilerplate
  *    (nav, titles, footers, button labels) lives in SHORT lines, so
  *    keeping only lines with ≥ `minWords` words removes most of it
  *    with zero parsing. (Real jusText adds link density and
  *    stopword ratios; the word-count core is what generalizes
  *    across languages and is the 80% at 1% of the complexity.)
  *
  * The regex layers stay in the RE2 ∩ Java dialect; the q178/q179
  * gate does not replay them — it demands the strongest possible
  * result instead: HTML built around the corpus must give back the
  * corpus BYTE-FOR-BYTE (the q168 round-trip convention), character
  * references included. Per-row expression work throughout — zero
  * shuffles, scales as the scan does.
  *
  * [[htmlToText]] resolves `html_unescape` by name: sessions built
  * through [[graft.GraftSession]] / the extensions route carry it;
  * [[extractMainText]] self-registers for any other session. */
object Html {

  /** Block-level closers (plus <br>) whose end marks a rendered line
    * break. head/title/html/body are included so metadata text can
    * never concatenate onto content lines. */
  private val BlockClose =
    "p|div|li|h[1-6]|tr|td|th|table|ul|ol|blockquote|pre|section|" +
      "article|header|footer|nav|aside|title|head|body|html"

  /** The markup-removal chain over an HTML string column. */
  def htmlToText(html: Column): Column = {
    // 1. scripts/styles with their CONTENT (lazy span; (?is) = case-
    //    insensitive + dotall — inline flags, RE2 and Java agree)
    val noScript = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>", " ")
    // 2. comments
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    // 3. block closers and <br> become line breaks
    val withBreaks = regexp_replace(noComment,
      s"(?i)</($BlockClose)\\s*>|<br\\s*/?>", "\n")
    // 4. every remaining tag becomes a space
    val noTags = regexp_replace(withBreaks, "<[^>]*>", " ")
    // 5. character references — ALL numeric forms plus the documented
    //    named tier, one native left-to-right pass
    //    ([[graft.functions.HtmlUnescapeCore]]; the earlier fold of
    //    per-entity regexp_replace re-scanned every document once per
    //    entity and could not express numeric references at all).
    //    Single-pass also hard-guarantees "&amp;lt;" → literal "&lt;".
    val decoded = call_function("html_unescape", noTags)
    // 6. normalize: horizontal whitespace runs to one space (U+00A0
    //    included, so &nbsp;/&#160; fold like the space they render
    //    as), trimmed lines, blank lines dropped
    val oneSpace = regexp_replace(decoded, "[ \\t\\r\\f\\x0B\\x{A0}]+", " ")
    val trimmedLines = regexp_replace(oneSpace, " ?\\n ?", "\n")
    trim(regexp_replace(trimmedLines, "\\n+", "\n"))
  }

  /** jusText-lite: keep only lines with ≥ `minWords` whitespace-
    * separated words, rejoined by newline. In-row HOF work. */
  def mainContent(text: Column, minWords: Int): Column =
    array_join(
      filter(split(text, "\n"),
        l => size(filter(split(l, " "), w => w =!= "")) >= minWords),
      "\n")

  /** DataFrame form: html column → (… , textCol) extracted +
    * boilerplate-filtered. */
  def extractMainText(df: DataFrame, htmlCol: String,
                      outCol: String = "text",
                      minWords: Int = 3): DataFrame = {
    graft.functions.HtmlUnescape.register(df.sparkSession)
    df.withColumn(outCol, mainContent(htmlToText(col(htmlCol)), minWords))
  }

  /** Page-declared directives — the two head signals a modern
    * training pipeline reads BEFORE keeping a page (r16):
    *
    *  - `rel_canonical`: the page's own `<link rel="canonical">`
    *    target. The strongest URL-dedup signal there is — the SITE
    *    says which URL this content belongs to, catching mirrors and
    *    parameter variants [[Domains.canonicalizeUrl]]'s syntactic
    *    rules cannot; feed it to [[Domains.urlDedup]] as the
    *    dedup key (`coalesce(rel_canonical, canonical_url)`).
    *  - `meta_robots` + derived `noindex`/`nofollow`: the page's
    *    `<meta name="robots">` opt-out. Respecting `noindex` at
    *    ingest is the polite-crawl floor for training corpora.
    *
    * Both attribute orders (`rel` before or after `href`, `name`
    * before or after `content`) are matched; tag/attribute names are
    * case-insensitive via `(?i)` (RE2 ∩ Java — the oracle replays
    * the same patterns verbatim in DuckDB); attribute VALUES keep
    * their case (a canonical URL's path is case-significant, and the
    * noindex/nofollow tokens are lowercased only for the boolean
    * derivation). Token matching is comma/space-delimited whole-word
    * (`noindexfoo` does not count). Absent directives come back
    * null/false — per-row regex work, zero shuffles. */
  def pageDirectives(df: DataFrame, htmlCol: String): DataFrame = {
    def firstNonEmpty(a: Column, b: Column): Column =
      coalesce(nullif(a, lit("")), nullif(b, lit("")))
    val canon = firstNonEmpty(
      regexp_extract(col(htmlCol),
        "(?i)<link[^>]*\\brel=[\"']canonical[\"'][^>]*\\bhref=[\"']([^\"']*)[\"']", 1),
      regexp_extract(col(htmlCol),
        "(?i)<link[^>]*\\bhref=[\"']([^\"']*)[\"'][^>]*\\brel=[\"']canonical[\"']", 1))
    val robots = firstNonEmpty(
      regexp_extract(col(htmlCol),
        "(?i)<meta[^>]*\\bname=[\"']robots[\"'][^>]*\\bcontent=[\"']([^\"']*)[\"']", 1),
      regexp_extract(col(htmlCol),
        "(?i)<meta[^>]*\\bcontent=[\"']([^\"']*)[\"'][^>]*\\bname=[\"']robots[\"']", 1))
    def hasToken(token: String): Column =
      coalesce(lower(col("meta_robots")).rlike(s"(^|[,\\s])$token([,\\s]|$$)"),
        lit(false))
    df.withColumn("rel_canonical", canon)
      .withColumn("meta_robots", robots)
      .withColumn("noindex", hasToken("noindex"))
      .withColumn("nofollow", hasToken("nofollow"))
  }
}
