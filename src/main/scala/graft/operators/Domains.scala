package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain governance over a crawled corpus — the C4-style stage
  * between ingest and training: who contributed what, and which
  * sources are banned. Per-domain accounting drives mixing quotas and
  * over-crawl detection; the blocklist gate removes domains excluded
  * for quality/licensing/safety reasons. All URI surgery is one
  * regexp chain per row (RE2 ∩ Java dialect, so the q180 oracle
  * replays it verbatim in DuckDB); the blocklist is a broadcast
  * ANTI-JOIN, the shape that stays one map-side pass when the list
  * grows from ten domains to ten million.
  */
object Domains {

  /** scheme://[userinfo@]host[:port]/… → lowercased host: authority
    * extracted up to the first `/?#`, userinfo and port stripped.
    * Bracketed IPv6 hosts (`https://[::1]:8080/`) keep their brackets
    * as one token — the naive `[^:]+` port-strip would truncate them
    * at the first colon, so the bracket alternative comes FIRST.
    * Null/relative/malformed URIs yield null (no throw — crawl URIs
    * are untrusted input). */
  def uriHost(uri: Column): Column = {
    val auth = regexp_extract(uri, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    // nullif: regexp_extract returns '' on no-match
    lower(nullif(
      regexp_extract(auth, "^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]+)", 1), lit("")))
  }

  /** Naive registrable domain: the host's last two labels
    * (`cdn.example.org` → `example.org`). DOCUMENTED approximation —
    * the exact answer needs the public-suffix list (`co.uk` has three
    * registrable labels); the two-label form is what a blocklist
    * keyed on registrable domains matches against, and swapping in a
    * PSL lookup changes only this Column. */
  def registrableDomain(host: Column): Column =
    nullif(regexp_extract(host, "([^.]+\\.[^.]+)$", 1), lit(""))

  /** Per-host corpus accounting: (host, domain, n_docs, n_tokens) —
    * the frame quota/mixing policies and over-crawl audits read. One
    * scan, one combinable aggregate. */
  def domainStats(docs: DataFrame, uriCol: String = "uri",
                  textCol: String = "text"): DataFrame =
    docs
      .withColumn("host", uriHost(col(uriCol)))
      .withColumn("domain", registrableDomain(col("host")))
      .groupBy("host", "domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))

  /** Remove documents whose host OR registrable domain is blocked.
    * The blocklist arrives as a one-column DataFrame (`blocked`) so
    * production lists (millions of rows, refreshed independently)
    * join instead of shipping through a literal; the join is a
    * broadcast LEFT ANTI twice — host-level then domain-level — each
    * a map-side hash probe. */
  def filterBlocked(docs: DataFrame, blocklist: DataFrame,
                    uriCol: String = "uri"): DataFrame = {
    val bl = broadcast(blocklist.select(col("blocked")).distinct())
    docs
      .withColumn("_host", uriHost(col(uriCol)))
      .withColumn("_dom", registrableDomain(col("_host")))
      .join(bl, col("_host") === col("blocked"), "left_anti")
      .join(bl, col("_dom") === col("blocked"), "left_anti")
      .drop("_host", "_dom")
  }
}
