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
    * training pipeline reads BEFORE keeping a page (r16, widened r17):
    *
    *  - `rel_canonical`: the page's own `<link rel="canonical">`
    *    target, verbatim. The strongest URL-dedup signal there is —
    *    the SITE says which URL this content belongs to, catching
    *    mirrors and parameter variants [[Domains.canonicalizeUrl]]'s
    *    syntactic rules cannot.
    *  - `canonical_resolved` (r17): the canonical target RESOLVED per
    *    RFC 3986 §5 against the page's effective base — `<base href>`
    *    when present (itself resolved against `pageUrlCol`), the page
    *    URL otherwise. Real pages overwhelmingly declare RELATIVE
    *    canonical URLs (`href="/article/x"`), which collide across
    *    sites until resolved; THIS column is the dedup key — feed
    *    `coalesce(canonical_resolved, canonical_url)` to
    *    [[Domains.urlDedup]]. Null when no absolute target exists
    *    (relative href with no pageUrl and no absolute base).
    *  - `base_href`: the first `<base href>` value, verbatim (null
    *    when absent) — surfaced for provenance/debugging.
    *  - `meta_robots` + derived `noindex`/`nofollow`: the page's
    *    `<meta name="robots">` opt-out. Respecting `noindex` at
    *    ingest is the polite-crawl floor for training corpora.
    *
    * Extraction is TAG-level (r17): the first `<link>` whose `rel`
    * value contains `canonical` as a whole space-separated token
    * (multi-token lists like `rel="canonical alternate"` count, HTML
    * rel is a token list) is captured whole, then `href` is pulled
    * from the captured tag — so attribute ORDER never matters by
    * construction (the r16 form enumerated both orders). Attribute
    * values match double-quoted, single-quoted, AND unquoted
    * spellings (`content=noindex` is valid HTML); names/tokens are
    * case-insensitive via `(?i)` (RE2 ∩ Java dialect throughout — no
    * lookaround); attribute VALUES keep their case (a canonical URL's
    * path is case-significant; the noindex/nofollow tokens lowercase
    * only for the boolean derivation), with HTML's leading/trailing
    * whitespace strip applied to URL values. Token matching is
    * comma/space-delimited whole-word (`noindexfoo` does not count).
    * Absent directives come back null/false — per-row regex + one
    * codegen'd [[graft.functions.UrlResolve]] call, zero shuffles. */
  private def firstNonEmpty(cs: Column*): Column =
    coalesce(cs.map(nullif(_, lit(""))): _*)

  /** Attribute value out of a CAPTURED TAG string: quoted forms
    * first (the unquoted arm cannot start at a quote, so the
    * coalesce order is just preference, not correctness). The name
    * is anchored to a preceding DELIMITER, not \b: '-' is a word
    * boundary, so \bhref would match inside data-href and a hostile
    * <link rel=canonical data-href="/wrong" href="/right"> could
    * surface the wrong value (ADVICE r17). RE2-safe, no lookbehind.
    * Shared by [[pageDirectives]] and [[extractAnchors]]. */
  private def attrValue(tag: Column, attr: String): Column = firstNonEmpty(
    regexp_extract(tag, s"(?i)(?:^|[\\s\"'/])$attr\\s*=\\s*\"([^\"]*)\"", 1),
    regexp_extract(tag, s"(?i)(?:^|[\\s\"'/])$attr\\s*=\\s*'([^']*)'", 1),
    regexp_extract(tag, s"(?i)(?:^|[\\s\"'/])$attr\\s*=\\s*([^\\s\"'>]+)", 1))

  def pageDirectives(df: DataFrame, htmlCol: String,
                     pageUrlCol: Option[String] = None): DataFrame = {
    graft.functions.UrlResolveCore.register(df.sparkSession)
    // <link> whose rel VALUE contains the whole token `canonical`:
    // quoted arms token-match inside the quotes; the unquoted arm is
    // single-token by grammar (an unquoted value ends at whitespace),
    // and its tail alternation handles last-attribute position
    // (`...rel=canonical>`) without lookahead
    // same delimiter anchoring as attrValue: [\s"'/] before the
    // attribute name, never \b (data-rel= must not match rel=)
    val canonTag = regexp_extract(col(htmlCol),
      "(?i)<link\\b[^>]*[\\s\"'/]rel\\s*=\\s*(?:\"(?:[^\"]*\\s)?canonical(?:\\s[^\"]*)?\"[^>]*" +
        "|'(?:[^']*\\s)?canonical(?:\\s[^']*)?'[^>]*" +
        "|canonical(?:[\\s/][^>]*)?)>", 0)
    val robotsTag = regexp_extract(col(htmlCol),
      "(?i)<meta\\b[^>]*[\\s\"'/]name\\s*=\\s*(?:\"robots\"[^>]*" +
        "|'robots'[^>]*|robots(?:[\\s/][^>]*)?)>", 0)
    val baseTag = regexp_extract(col(htmlCol),
      "(?i)<base\\b[^>]*[\\s\"'/]href\\s*=[^>]*>", 0)
    def hasToken(token: String): Column =
      coalesce(lower(col("meta_robots")).rlike(s"(^|[,\\s])$token([,\\s]|$$)"),
        lit(false))
    val pageUrl = pageUrlCol.map(col)
      .getOrElse(lit(null).cast("string"))
    def urlResolve(base: Column, ref: Column): Column =
      call_function("url_resolve", base, ref)
    val out = df
      .withColumn("rel_canonical", trim(attrValue(canonTag, "href"), " \t\n\r"))
      .withColumn("base_href", trim(attrValue(baseTag, "href"), " \t\n\r"))
      .withColumn("meta_robots", attrValue(robotsTag, "content"))
      .withColumn("noindex", hasToken("noindex"))
      .withColumn("nofollow", hasToken("nofollow"))
    // effective base per the HTML spec: the document's <base href>
    // resolved against the page URL (the fallback base), the page URL
    // itself when absent or unresolvable
    out.withColumn("canonical_resolved",
      urlResolve(
        coalesce(
          urlResolve(coalesce(pageUrl, lit("")), col("base_href")),
          pageUrl, lit("")),
        col("rel_canonical")))
  }

  /** Out-link extraction: one row per `<a>` element — the LINK GRAPH
    * stage of a crawl pipeline, and the source of ANCHOR TEXT, the
    * oldest off-page document-description signal there is (Brin &
    * Page 1998 §2.2 — anchor text describes the TARGET better than
    * the target's own page; modern corpora mine it for titles,
    * queries, and link-graph features alike).
    *
    * Emitted per anchor: `href_raw` (attribute value, the
    * [[attrValue]] quoted/unquoted + decoy-proof machinery), `target`
    * (href RFC 3986 §5-resolved against `pageUrlCol` — relative
    * hrefs, the overwhelmingly common spelling, become absolute and
    * comparable across pages; null for no-href anchors like
    * `<a name=…>`), and `anchor_text` (element content with inner
    * markup stripped, character references decoded through the same
    * native single-pass [[graft.functions.HtmlUnescapeCore]] the text
    * extractor uses, whitespace normalized, trimmed). Pages with a
    * `<base href>` should pre-resolve their URL column via
    * [[pageDirectives]]' effective-base output.
    *
    * Per-row expression work only — `regexp_extract_all` + one
    * explode; no shuffle until the caller aggregates. Nested `<a>`
    * cannot occur (HTML forbids it and browsers auto-close), so the
    * lazy span to the first `</a>` is the correct parse, not an
    * approximation. */
  def extractAnchors(df: DataFrame, htmlCol: String,
                     pageUrlCol: String): DataFrame = {
    graft.functions.UrlResolveCore.register(df.sparkSession)
    graft.functions.HtmlUnescape.register(df.sparkSession)
    val anchors = regexp_extract_all(col(htmlCol),
      lit("(?is)<a\\b[^>]*>.*?</a\\s*>"), lit(0))
    val withEl = df.withColumn("a_el", explode(anchors))
    val openTag = regexp_extract(col("a_el"), "(?s)^<[^>]*>", 0)
    val inner = regexp_replace(col("a_el"),
      "(?is)^<[^>]*>|</a\\s*>$", "")
    val innerText = trim(regexp_replace(
      call_function("html_unescape", regexp_replace(inner, "<[^>]*>", " ")),
      "[\\s\\x{A0}]+", " "))
    withEl
      .withColumn("href_raw", trim(attrValue(openTag, "href"), " \t\n\r"))
      .withColumn("target",
        call_function("url_resolve", col(pageUrlCol), col("href_raw")))
      .withColumn("anchor_text", innerText)
      .drop("a_el")
  }

  /** Per-target anchor aggregation over [[extractAnchors]] output:
    * `n_links` (in-link count), `n_hosts` (distinct linking hosts —
    * the spam-resistant form of in-degree: one host repeating a link
    * counts once), and `top_anchor` (most frequent anchor text,
    * ties broken text-ascending — a total order, so the pick is
    * deterministic and oracle-replayable). No-href and unresolvable
    * anchors are dropped — they name nothing.
    *
    * Scale: two parallel aggregation legs, both map-side combinable —
    * (target, anchor_text) counts feeding a per-target argmax, and
    * DISTINCT (target, src_host) feeding the host count — joined on
    * target. In-degree skew (everyone links the homepage) is absorbed
    * by partial aggregation: duplicate (target, anchor) and (target,
    * host) rows collapse map-side, so the reducer holding a hot
    * target sees at most its distinct-anchor/-host row counts, never
    * the raw link volume. */
  def anchorStats(anchors: DataFrame,
                  srcUrlCol: String = "page_url"): DataFrame = {
    val linked = anchors.filter(col("target").isNotNull)
      .withColumn("src_host",
        regexp_extract(col(srcUrlCol), "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1))
    val byAnchor = linked.groupBy("target", "anchor_text")
      .agg(count(lit(1)).as("cnt"))
    val top = byAnchor.groupBy("target")
      .agg(sum(col("cnt")).as("n_links"),
        min_by(col("anchor_text"),
          struct((-col("cnt")).as("nc"), col("anchor_text"))).as("top_anchor"))
    val hosts = linked.select("target", "src_host").distinct()
      .groupBy("target").agg(count(lit(1)).as("n_hosts"))
    top.join(hosts, "target")
      .select("target", "n_links", "n_hosts", "top_anchor")
  }
}
