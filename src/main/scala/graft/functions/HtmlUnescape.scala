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
  * a DOCUMENTED named subset ([[HtmlUnescapeCore.Named]]): the HTML 2.0
  * four, plus the typographic/symbol tier that dominates named-entity
  * frequency in public web-crawl statistics. Anything unrecognized —
  * unknown name, malformed number, missing `;` within 32 chars —
  * passes through as literal text (crawl input is untrusted; decode
  * must never throw). `&nbsp;`/`&#160;` both yield U+00A0, which the
  * caller's whitespace normalization folds to a plain space
  * ([[graft.operators.Html.htmlToText]] step 6), so the named and
  * numeric spellings of a no-break space cannot diverge. */
object HtmlUnescapeCore {

  /** The named subset, HTML-case-sensitive (`&Dagger;` ≠ `&dagger;`).
    * `shy` (soft hyphen) decodes to the empty string: it is a
    * rendering hint, not text. */
  val Named: Map[String, String] = Map(
    // HTML 2.0 core + the two quote names
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00A0",
    // typographic punctuation (the high-frequency tier)
    "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“",
    "ndash" -> "–", "mdash" -> "—",
    "hellip" -> "…", "middot" -> "·", "bull" -> "•",
    "laquo" -> "«", "raquo" -> "»",
    "prime" -> "′", "Prime" -> "″",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "shy" -> "",
    // legal / commerce symbols
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "sect" -> "§", "para" -> "¶", "deg" -> "°",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢",
    // math / fractions
    "times" -> "×", "divide" -> "÷", "plusmn" -> "±",
    "minus" -> "−", "ne" -> "≠", "le" -> "≤",
    "ge" -> "≥", "infin" -> "∞",
    "sup2" -> "²", "sup3" -> "³",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    // arrows
    "larr" -> "←", "rarr" -> "→",
    "uarr" -> "↑", "darr" -> "↓")

  /** Longest reference body we will consider between `&` and `;` —
    * `&#x10FFFF;` is 9; real named entities top out near 8; anything
    * longer is prose containing a stray ampersand. */
  private val MaxBody = 32

  private def decodeBody(body: String): String = {
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
    } else Named.getOrElse(body, null)
  }

  def unescape(s: UTF8String): UTF8String = {
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
        else decodeBody(str.substring(amp + 1, semi))
      if (rep == null) { sb.append('&'); i = amp + 1 }
      else { sb.append(rep); i = semi + 1 }
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
