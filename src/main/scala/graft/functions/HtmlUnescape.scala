package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding — the step between markup
  * removal and training text that real crawl HTML actually needs:
  * `&#8217;`/`&#xA0;`-dense pages otherwise ship literal references
  * into the corpus (the round-13 gap: only five named entities plus
  * `&#39;` decoded).
  *
  * One LEFT-TO-RIGHT pass, which is both the performance answer (the
  * regex-fold form re-scanned every document once per entity; this is
  * one scan however many entities the table grows) and the semantics
  * answer: `&amp;lt;` decodes to the literal `&lt;`, never `<`,
  * because the pass consumes `&amp;` and moves on — double-decoding
  * is structurally impossible.
  *
  * Coverage: ALL numeric references (`&#NNN;` decimal, `&#xHH;` hex,
  * any Unicode scalar value — rejects 0, surrogates, > 0x10FFFF) plus
  * the COMPLETE HTML 4.01 named table ([[HtmlUnescapeCore.Named]],
  * 252 names: the Latin-1 block `&eacute;`/`&uuml;`-class accented
  * letters, the Greek/symbol block, the `special` block), `&apos;`,
  * and the spec's uppercase legacy spellings (`&AMP;` etc.). The
  * HTML5 LEGACY subset — exactly the Latin-1-era names the published
  * spec lists as valid WITHOUT a trailing semicolon
  * ([[HtmlUnescapeCore.Legacy]]) — also decodes semicolon-less by
  * longest-match (`&copy 2020` → `© 2020`, `&notit;` → `¬it;`),
  * matching the HTML5 data-state tokenizer and CPython's
  * `html.unescape`. Anything else unrecognized — unknown name,
  * malformed number, numeric reference with no `;` within 32 chars
  * (numeric refs REQUIRE the semicolon here: the spec decodes
  * `&#169x` too, but stray `&#` sequences in prose/URLs are common
  * enough in crawl text that the conservative side wins) — passes
  * through as literal text (crawl input is untrusted; decode must
  * never throw). The HTML5-only long tail beyond HTML 4.01 (~2k
  * math-alphanumeric/combining names, e.g. `&DoubleLongLeftArrow;`)
  * passes through likewise — a documented non-goal; those names are
  * vanishingly rare in crawl text next to the accented-letter and
  * typographic tiers covered here. `&nbsp;`/`&#160;` both yield
  * U+00A0, which the caller's whitespace normalization folds to a
  * plain space ([[graft.operators.Html.htmlToText]] step 6), so the
  * named and numeric spellings of a no-break space cannot diverge. */
object HtmlUnescapeCore {

  /** The 96 `HTMLlat1` names, IN CODEPOINT ORDER: the published HTML
    * 4.01 Latin-1 entity set maps name-by-name onto U+00A0–U+00FF, so
    * the table is the name list zipped against that range — no
    * per-name codepoint to mistype. */
  private val Latin1Names: Seq[String] = Seq(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
    "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
    "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
    "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
    "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
    "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")

  /** The `HTMLsymbol` block (Greek letters, math, arrows, card suits)
    * and the `HTMLspecial` block (markup chars, Latin Extended,
    * spacing/directional marks, quotes, `&euro;`) — codepoints per the
    * published HTML 4.01 entity DTDs, with the HTML5 revision that
    * `&lang;`/`&rang;` map to the mathematical angle brackets
    * U+27E8/U+27E9 (HTML 4.01 pointed at the deprecated CJK forms). */
  private val SymbolAndSpecial: Seq[(String, Int)] = Seq(
    // markup-significant (HTMLspecial) + HTML5's apos
    "quot" -> 0x22, "amp" -> 0x26, "apos" -> 0x27, "lt" -> 0x3C, "gt" -> 0x3E,
    // Latin Extended / ligatures
    "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160, "scaron" -> 0x161,
    "Yuml" -> 0x178, "fnof" -> 0x192, "circ" -> 0x2C6, "tilde" -> 0x2DC,
    // Greek uppercase (no final-sigma slot at U+03A2)
    "Alpha" -> 0x391, "Beta" -> 0x392, "Gamma" -> 0x393, "Delta" -> 0x394,
    "Epsilon" -> 0x395, "Zeta" -> 0x396, "Eta" -> 0x397, "Theta" -> 0x398,
    "Iota" -> 0x399, "Kappa" -> 0x39A, "Lambda" -> 0x39B, "Mu" -> 0x39C,
    "Nu" -> 0x39D, "Xi" -> 0x39E, "Omicron" -> 0x39F, "Pi" -> 0x3A0,
    "Rho" -> 0x3A1, "Sigma" -> 0x3A3, "Tau" -> 0x3A4, "Upsilon" -> 0x3A5,
    "Phi" -> 0x3A6, "Chi" -> 0x3A7, "Psi" -> 0x3A8, "Omega" -> 0x3A9,
    // Greek lowercase (sigmaf = final sigma U+03C2)
    "alpha" -> 0x3B1, "beta" -> 0x3B2, "gamma" -> 0x3B3, "delta" -> 0x3B4,
    "epsilon" -> 0x3B5, "zeta" -> 0x3B6, "eta" -> 0x3B7, "theta" -> 0x3B8,
    "iota" -> 0x3B9, "kappa" -> 0x3BA, "lambda" -> 0x3BB, "mu" -> 0x3BC,
    "nu" -> 0x3BD, "xi" -> 0x3BE, "omicron" -> 0x3BF, "pi" -> 0x3C0,
    "rho" -> 0x3C1, "sigmaf" -> 0x3C2, "sigma" -> 0x3C3, "tau" -> 0x3C4,
    "upsilon" -> 0x3C5, "phi" -> 0x3C6, "chi" -> 0x3C7, "psi" -> 0x3C8,
    "omega" -> 0x3C9, "thetasym" -> 0x3D1, "upsih" -> 0x3D2, "piv" -> 0x3D6,
    // spacing + directional marks
    "ensp" -> 0x2002, "emsp" -> 0x2003, "thinsp" -> 0x2009,
    "zwnj" -> 0x200C, "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F,
    // typographic punctuation
    "ndash" -> 0x2013, "mdash" -> 0x2014,
    "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
    "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E,
    "dagger" -> 0x2020, "Dagger" -> 0x2021, "bull" -> 0x2022,
    "hellip" -> 0x2026, "permil" -> 0x2030,
    "prime" -> 0x2032, "Prime" -> 0x2033,
    "lsaquo" -> 0x2039, "rsaquo" -> 0x203A,
    "oline" -> 0x203E, "frasl" -> 0x2044, "euro" -> 0x20AC,
    // letterlike
    "image" -> 0x2111, "weierp" -> 0x2118, "real" -> 0x211C,
    "trade" -> 0x2122, "alefsym" -> 0x2135,
    // arrows
    "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192, "darr" -> 0x2193,
    "harr" -> 0x2194, "crarr" -> 0x21B5,
    "lArr" -> 0x21D0, "uArr" -> 0x21D1, "rArr" -> 0x21D2, "dArr" -> 0x21D3,
    "hArr" -> 0x21D4,
    // mathematical operators
    "forall" -> 0x2200, "part" -> 0x2202, "exist" -> 0x2203,
    "empty" -> 0x2205, "nabla" -> 0x2207, "isin" -> 0x2208,
    "notin" -> 0x2209, "ni" -> 0x220B, "prod" -> 0x220F, "sum" -> 0x2211,
    "minus" -> 0x2212, "lowast" -> 0x2217, "radic" -> 0x221A,
    "prop" -> 0x221D, "infin" -> 0x221E, "ang" -> 0x2220,
    "and" -> 0x2227, "or" -> 0x2228, "cap" -> 0x2229, "cup" -> 0x222A,
    "int" -> 0x222B, "there4" -> 0x2234, "sim" -> 0x223C,
    "cong" -> 0x2245, "asymp" -> 0x2248, "ne" -> 0x2260,
    "equiv" -> 0x2261, "le" -> 0x2264, "ge" -> 0x2265,
    "sub" -> 0x2282, "sup" -> 0x2283, "nsub" -> 0x2284,
    "sube" -> 0x2286, "supe" -> 0x2287, "oplus" -> 0x2295,
    "otimes" -> 0x2297, "perp" -> 0x22A5, "sdot" -> 0x22C5,
    // technical / geometric / suits
    "lceil" -> 0x2308, "rceil" -> 0x2309, "lfloor" -> 0x230A,
    "rfloor" -> 0x230B, "lang" -> 0x27E8, "rang" -> 0x27E9,
    "loz" -> 0x25CA, "spades" -> 0x2660, "clubs" -> 0x2663,
    "hearts" -> 0x2665, "diams" -> 0x2666)

  /** The full named table, HTML-case-sensitive (`&Dagger;` ≠
    * `&dagger;`; `&AMP;` is the spec's uppercase legacy spelling, but
    * `&Amp;` is nothing). `shy` (soft hyphen) decodes to the empty
    * string: it is a rendering hint, not text. */
  val Named: Map[String, String] =
    (Latin1Names.zipWithIndex.map { case (n, i) =>
      n -> new String(Character.toChars(0xA0 + i)) } ++
      SymbolAndSpecial.map { case (n, cp) =>
        n -> new String(Character.toChars(cp)) } ++
      Seq("AMP" -> "&", "COPY" -> "©", "GT" -> ">", "LT" -> "<",
        "QUOT" -> "\"", "REG" -> "®")).toMap + ("shy" -> "")

  /** The HTML5 legacy subset — the published spec's exact list of
    * named references valid WITHOUT a trailing semicolon (the
    * Latin-1-era names plus the markup four and their uppercase
    * spellings). */
  val Legacy: Set[String] =
    (Latin1Names ++ Seq("amp", "lt", "gt", "quot",
      "AMP", "COPY", "GT", "LT", "QUOT", "REG")).toSet
  private val LegacyMaxLen = Legacy.iterator.map(_.length).max
  private val LegacyMinLen = Legacy.iterator.map(_.length).min

  /** Longest reference body we will consider between `&` and `;` —
    * `&#x10FFFF;` is 9; real named entities top out near 8; anything
    * longer is prose containing a stray ampersand. */
  private val MaxBody = 32

  private def decodeBody(body: String, table: Map[String, String]): String = {
    if (body.isEmpty) return null
    if (body.charAt(0) == '#') {
      val num = body.substring(1)
      val cp =
        try {
          if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num, 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) null
      else new String(Character.toChars(cp))
    } else table.getOrElse(body, null)
  }

  /** Longest [[Legacy]] name starting at `from` (exclusive of the
    * `&`), or -1. Names are 2–6 chars of ASCII letters; the scan
    * tries the longest window first so `&notin` never stops at
    * `&not` when the longer name exists semicolon-terminated
    * upstream (the caller checks the `;` form before this). */
  private def legacyLen(str: String, from: Int): Int = {
    var len = math.min(LegacyMaxLen, str.length - from)
    while (len >= LegacyMinLen) {
      if (Legacy.contains(str.substring(from, from + len))) return len
      len -= 1
    }
    -1
  }

  def unescape(s: UTF8String): UTF8String = unescapeWith(s, Named)

  /** The five XML-predefined entities — the ONLY named references XML
    * itself defines (XML 1.0 §4.6); everything else named is HTML's. */
  val XmlPredefined: Map[String, String] = Map(
    "lt" -> "<", "gt" -> ">", "amp" -> "&", "quot" -> "\"", "apos" -> "'")

  /** XML-scoped decode: numeric character references (`&#38;` /
    * `&#x26;` — XML 1.0 §4.1 allows them anywhere character data
    * does) plus [[XmlPredefined]], and NOTHING else — no HTML named
    * table, and no HTML5 legacy no-semicolon tier (XML references
    * REQUIRE the `;`). Unknown/malformed references pass through as
    * literal text (same untrusted-input stance as [[unescape]];
    * strict XML would reject the document, but a sitemap parser that
    * throws on one bad file loses the other 49,999 URLs). */
  def xmlUnescape(s: UTF8String): UTF8String =
    run(s, XmlPredefined, legacy = false)

  /** [[unescape]] over an EXTENDED named table (`Named ++` a loaded
    * extension — see [[HtmlEntities]]): identical single-pass
    * semantics; extension names decode ONLY with the trailing `;`
    * (the no-semicolon set is [[Legacy]], frozen by the published
    * spec, extension-independent). */
  def unescapeWith(s: UTF8String, table: Map[String, String]): UTF8String =
    run(s, table, legacy = true)

  /** The shared single-pass loop; `legacy` gates the HTML5
    * no-semicolon tier (off for XML — and required off whenever
    * `table` doesn't cover [[Legacy]]'s names, which that tier
    * looks up unguarded). */
  private def run(s: UTF8String, table: Map[String, String],
                  legacy: Boolean): UTF8String = {
    val str = s.toString
    var amp = str.indexOf('&')
    if (amp < 0) return s // fast path: most lines have no references
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (amp >= 0) {
      sb.append(str, i, amp)
      i = amp
      val semi = str.indexOf(';', amp + 1)
      val rep =
        if (semi < 0 || semi - amp - 1 > MaxBody) null
        else decodeBody(str.substring(amp + 1, semi), table)
      if (rep != null) { sb.append(rep); i = semi + 1 }
      else if (legacy && amp + 1 < str.length && str.charAt(amp + 1) != '#') {
        // the `;` form didn't resolve: HTML5's legacy names decode
        // without the semicolon by LONGEST match (`&copy 2020`,
        // `&notit;` → `¬it;` — the missing-semicolon parse error the
        // spec and CPython's html.unescape both decode through)
        val n = legacyLen(str, amp + 1)
        if (n < 0) { sb.append('&'); i = amp + 1 }
        else { sb.append(table(str.substring(amp + 1, amp + 1 + n)))
               i = amp + 1 + n }
      } else { sb.append('&'); i = amp + 1 }
      amp = str.indexOf('&', i)
    }
    sb.append(str, i, str.length)
    UTF8String.fromString(sb.toString)
  }
}

/** `html_unescape(text STRING) -> STRING` — see [[HtmlUnescapeCore]]. */
case class HtmlUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_unescape requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlUnescapeCore.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlUnescapeCore.unescape($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
  override def prettyName: String = "html_unescape"
}

object HtmlUnescape {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "html_unescape", classOf[HtmlUnescape])
}

/** `xml_unescape(text STRING) -> STRING` — the XML-scoped tier of
  * [[HtmlUnescapeCore]]: numeric character references + the five
  * predefined entities, no HTML named table, no legacy no-semicolon
  * decoding. The decoder [[graft.operators.Domains.sitemapParse]]
  * runs over non-CDATA `<loc>` content (sitemaps are XML, not HTML —
  * `&copy;` in a loc is a malformed reference to pass through, not a
  * © to substitute). */
case class XmlUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xml_unescape requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlUnescapeCore.xmlUnescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlUnescapeCore.xmlUnescape($c);")

  override protected def withNewChildInternal(newChild: Expression): XmlUnescape =
    copy(child = newChild)
  override def prettyName: String = "xml_unescape"
}

object XmlUnescape {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "xml_unescape", classOf[XmlUnescape])
}

/** `html_unescape_full(text STRING, table_path STRING literal) ->
  * STRING` — [[HtmlUnescape]] with the named table EXTENDED by a
  * loaded entity file (the HTML5-only ~2k-name tail the compiled
  * table scopes out — see [[HtmlUnescapeCore]]'s non-goal note and
  * the r17 `ScaleProbe entities` measurement). The table is loaded
  * ONCE per path on the driver at analysis time ([[HtmlEntities]])
  * and travels to executors inside the expression — the same
  * ship-the-compiled-artifact stance as `PslRules.fromFile`'s
  * when-chain, so no executor-side file access is assumed. Extension
  * names decode only with the trailing `;`: the no-semicolon set is
  * the published spec's frozen Legacy list, extension-independent.
  */
case class HtmlUnescapeFull(child: Expression, table: Map[String, String],
                            source: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_unescape_full requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlUnescapeCore.unescapeWith(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("entityTable", table,
      "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlUnescapeCore.unescapeWith($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescapeFull =
    copy(child = newChild)
  override def prettyName: String = "html_unescape_full"
  override def sql: String = s"html_unescape_full(${child.sql}, '$source')"
}

object HtmlUnescapeFull {
  /** Register `html_unescape_full` — added r20: q192 previously
    * leaned on a session-wide registerAll having run first, which
    * held in the mains (GraftSession registers the catalog) but made
    * plan-building order-dependent in bare test sessions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "html_unescape_full",
      classOf[HtmlUnescapeFull])
}

/** Loader for the PUBLISHED entity-table JSON format (the HTML
  * standard's machine-readable `entities.json`: an object keyed by
  * reference spelling, each value carrying `codepoints` +
  * `characters` — multi-codepoint entries like `&fjlig;` → "fj"
  * included). Production drops the real ~2.2k-name file next to the
  * job and loads it here; the committed snapshot under
  * `src/main/resources/graft/` is a provenance-disclosed transcribed
  * SUBSET (no egress in this environment — the PSL snapshot stance).
  *
  * Only `;`-terminated keys are taken: the published file's
  * no-semicolon spellings are exactly the frozen
  * [[HtmlUnescapeCore.Legacy]] set, already compiled in. Non-entity
  * keys (a `_provenance` note) are skipped. Driver-side, once per
  * path per JVM. */
object HtmlEntities {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  def fromStream(in: java.io.InputStream): Map[String, String] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    val it = root.properties().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      if (k.length > 2 && k.charAt(0) == '&' && k.endsWith(";")) {
        val chars = e.getValue.get("characters")
        if (chars != null) b += (k.substring(1, k.length - 1) -> chars.asText())
      }
    }
    b.result()
  }

  /** `classpath:resource/name.json` or any Hadoop-readable path
    * (file://, hdfs://, s3a:// — the scheme-transparent S12 stance).
    *
    * Filesystem paths key the cache by (path, length, mtime) so a
    * long-lived driver picks up a REPLACED entity file on the next
    * load instead of silently serving the stale table for the JVM
    * lifetime (ADVICE r17); classpath resources are immutable per
    * JVM by construction and key by name alone. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Map[String, String] = {
    val key =
      if (path.startsWith("classpath:")) path
      else {
        val hp = new org.apache.hadoop.fs.Path(path)
        val st = hp.getFileSystem(spark.sessionState.newHadoopConf())
          .getFileStatus(hp)
        s"$path#${st.getLen}#${st.getModificationTime}"
      }
    cache.computeIfAbsent(key, { _ =>
      val in =
        if (path.startsWith("classpath:")) {
          val n = path.substring("classpath:".length)
          val st = Thread.currentThread().getContextClassLoader
            .getResourceAsStream(n)
          require(st != null, s"classpath resource not found: $n")
          st
        } else {
          val hp = new org.apache.hadoop.fs.Path(path)
          hp.getFileSystem(spark.sessionState.newHadoopConf()).open(hp)
        }
      try fromStream(in) finally in.close()
    })
  }
}
