package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `url_resolve(base STRING, ref STRING) -> STRING`: RFC 3986 §5
  * reference resolution — the missing half of the canonical-URL dedup
  * key. Real pages overwhelmingly declare RELATIVE canonical URLs
  * (`<link rel="canonical" href="/article/x">`), which collide across
  * sites and cannot merge mirrors until resolved against the page URL
  * (plus `<base href>` when present — [[graft.operators.Html
  * .pageDirectives]] wires both). Native expression, zero-UDF stance:
  * one codegen'd call per row, no shuffle.
  *
  * Semantics (strict mode, §5.2.2):
  *   - `ref` carries a scheme → the target IS `ref` (its path
  *     dot-normalized) — the base is ignored, including the abnormal
  *     `http:g` → `http:g` example of §5.4.2;
  *   - otherwise `base` must carry a scheme (an absolute URI); the
  *     target takes authority/path/query per §5.2.2 with
  *     merge (§5.2.3) and remove_dot_segments (§5.2.4);
  *   - `base` has no scheme and `ref` is relative → NULL: there is no
  *     defined target, and a null key lets callers fall back
  *     (`coalesce(canonical_resolved, canonical_url)`).
  *
  * No §6 normalization (case, percent-encoding) happens here — that
  * is [[graft.operators.Domains.canonicalizeUrl]]'s job downstream;
  * this expression is the §5 algorithm and nothing else, so the two
  * layers compose without double-normalizing. Pinned against the §5.4
  * normal AND abnormal example tables in Round17Spec. */
case class UrlResolve(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"url_resolve requires (string, string), got $other")
    }

  override def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolveCore.resolve(base.asInstanceOf[UTF8String],
      ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"""${ev.value} = graft.functions.UrlResolveCore.resolve($b, $r);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "url_resolve"
}

object UrlResolveCore {

  /** The five RFC 3986 components; `null` = absent (the RFC's
    * "defined" distinction — an EMPTY authority (`file:///x`) or
    * query (`/p?`) is defined-and-empty, which recomposition must
    * preserve). */
  private final case class Parts(scheme: String, authority: String,
                                 path: String, query: String,
                                 fragment: String)

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  private def isScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter && s.forall(isSchemeChar)

  /** Component split per RFC 3986 Appendix B, hand-scanned (this runs
    * per row inside codegen — no regex). */
  private def parse(s: String): Parts = {
    var rest = s
    var fragment: String = null
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var scheme: String = null
    val colon = rest.indexOf(':')
    if (colon > 0) {
      val cand = rest.substring(0, colon)
      val slash = rest.indexOf('/')
      // a scheme's ':' precedes any '/' ('?'/'#' are already stripped)
      if ((slash < 0 || colon < slash) && isScheme(cand)) {
        scheme = cand // case preserved: §6 normalization is not §5's job
        rest = rest.substring(colon + 1)
      }
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      val end = rest.indexOf('/', 2)
      if (end < 0) { authority = rest.substring(2); rest = "" }
      else { authority = rest.substring(2, end); rest = rest.substring(end) }
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  /** §5.2.4 remove_dot_segments, literally. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    def dropLastSegment(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out.charAt(i) != '/') i -= 1
      out.setLength(math.max(i, 0))
    }
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); dropLastSegment() }
      else if (in == "/..") { in = "/"; dropLastSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val idx = in.indexOf('/', start)
        if (idx < 0) { out.append(in); in = "" }
        else { out.append(in, 0, idx); in = in.substring(idx) }
      }
    }
    out.toString
  }

  /** §5.2.3 merge. */
  private def merge(baseAuthority: String, basePath: String,
                    refPath: String): String =
    if (baseAuthority != null && basePath.isEmpty) "/" + refPath
    else {
      val cut = basePath.lastIndexOf('/')
      if (cut < 0) refPath else basePath.substring(0, cut + 1) + refPath
    }

  /** §5.3 recomposition. */
  private def recompose(p: Parts): String = {
    val sb = new java.lang.StringBuilder
    sb.append(p.scheme).append(':')
    if (p.authority != null) sb.append("//").append(p.authority)
    sb.append(p.path)
    if (p.query != null) sb.append('?').append(p.query)
    if (p.fragment != null) sb.append('#').append(p.fragment)
    sb.toString
  }

  /** §5.2.2 strict-mode transform; null when no absolute target is
    * defined (relative ref against a scheme-less base). */
  def resolveStr(baseS: String, refS: String): String = {
    val ref = parse(refS)
    if (ref.scheme != null)
      return recompose(ref.copy(path = removeDotSegments(ref.path)))
    val base = parse(baseS)
    if (base.scheme == null) return null
    val t =
      if (ref.authority != null)
        Parts(base.scheme, ref.authority, removeDotSegments(ref.path),
          ref.query, ref.fragment)
      else if (ref.path.isEmpty)
        Parts(base.scheme, base.authority, base.path,
          if (ref.query != null) ref.query else base.query, ref.fragment)
      else if (ref.path.charAt(0) == '/')
        Parts(base.scheme, base.authority, removeDotSegments(ref.path),
          ref.query, ref.fragment)
      else
        Parts(base.scheme, base.authority,
          removeDotSegments(merge(base.authority, base.path, ref.path)),
          ref.query, ref.fragment)
    recompose(t)
  }

  def resolve(base: UTF8String, ref: UTF8String): UTF8String = {
    val r = resolveStr(base.toString, ref.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "url_resolve", classOf[UrlResolve])
}
