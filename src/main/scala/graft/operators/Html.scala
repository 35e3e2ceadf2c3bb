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
  *    machine-readable lines), remaining tags stripped, the five
  *    ubiquitous entities decoded, whitespace normalized per line.
  *  - [[mainContent]]: a jusText-style line filter — boilerplate
  *    (nav, titles, footers, button labels) lives in SHORT lines, so
  *    keeping only lines with ≥ `minWords` words removes most of it
  *    with zero parsing. (Real jusText adds link density and
  *    stopword ratios; the word-count core is what generalizes
  *    across languages and is the 80% at 1% of the complexity.)
  *
  * Both layers are chains of regexp_replace / higher-order array
  * functions in the RE2 ∩ Java-regex dialect, so DuckDB replays the
  * entire extraction verbatim and the q178 oracle can demand the
  * strongest possible result: HTML built around the corpus must give
  * back the corpus BYTE-FOR-BYTE (the q168 round-trip convention).
  * Per-row expression work throughout — zero shuffles, scales as the
  * scan does. */
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
    // 5. the five ubiquitous entities; &amp; LAST so "&amp;lt;"
    //    decodes to the literal "&lt;", not "<"
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    // 6. normalize: horizontal whitespace runs to one space, trimmed
    //    lines, blank lines dropped
    val oneSpace = regexp_replace(decoded, "[ \\t\\r\\f\\x0B]+", " ")
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
                      minWords: Int = 3): DataFrame =
    df.withColumn(outCol, mainContent(htmlToText(col(htmlCol)), minWords))
}
