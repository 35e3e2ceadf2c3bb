package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** THE inventory of graft's native SQL functions — one (name, usage,
  * builder) row per function, consumed by BOTH registration routes:
  *
  *   - [[graft.GraftSession.registerFunctions]] (programmatic route,
  *     and each operator's `X.register(spark)` convenience calls);
  *   - [[graft.GraftExtensions]] (`spark.sql.extensions` route for
  *     SQL-only deployments where infrastructure builds the session).
  *
  * Keeping the builders HERE — instead of one copy per companion
  * object plus a hand-maintained list in each route — is what makes
  * the two routes equivalent BY CONSTRUCTION: a new function added to
  * this table is visible to SQL-only users the same commit it ships
  * (round 9 shipped `misra_gries`/`deflate_len` to the programmatic
  * route only; this table is the structural fix for that drift
  * class). `GraftSessionSpec` asserts both routes resolve every
  * catalog name.
  */
object FunctionCatalog {

  /** One native function: SQL name, usage string (shown in DESCRIBE
    * FUNCTION via the extensions route), the Expression class the
    * builder constructs (the [[register]] cross-check — see below),
    * and the builder itself. */
  final case class FunctionDef(
      name: String,
      usage: String,
      exprClass: Class[_],
      builder: Seq[Expression] => Expression)

  val all: Seq[FunctionDef] = Seq(
    FunctionDef("simhash64",
      "simhash64(features array<bigint>) -> bigint", classOf[SimHash64], { exprs =>
        FunctionArgs.requireArity("simhash64", exprs, 1,
          "simhash64(features array<bigint>)")
        SimHash64(exprs.head)
      }),
    FunctionDef("minhash_sigs",
      "minhash_sigs(features array<bigint>, k INT) -> array<bigint>", classOf[MinHashSigs], { exprs =>
        FunctionArgs.requireArity("minhash_sigs", exprs, 2,
          "minhash_sigs(features array<bigint>, k INT literal)")
        MinHashSigs(exprs.head,
          FunctionArgs.foldableInt("minhash_sigs", exprs(1), "k"))
      }),
    FunctionDef("shingle_hashes",
      "shingle_hashes(text STRING, k INT) -> array<bigint>", classOf[ShingleHashes], { exprs =>
        FunctionArgs.requireArity("shingle_hashes", exprs, 2,
          "shingle_hashes(text STRING, k INT literal)")
        ShingleHashes(exprs.head,
          FunctionArgs.foldableInt("shingle_hashes", exprs(1), "k"))
      }),
    FunctionDef("mix64_fold",
      "mix64_fold(arr array<bigint>, seed BIGINT) -> bigint", classOf[Mix64Fold], { exprs =>
        FunctionArgs.requireArity("mix64_fold", exprs, 2,
          "mix64_fold(arr array<bigint>, seed BIGINT literal)")
        Mix64Fold(exprs.head,
          FunctionArgs.foldableLong("mix64_fold", exprs(1), "seed"))
      }),
    FunctionDef("srp_buckets",
      "srp_buckets(vec array<float|double>, tables INT, bits INT, seed BIGINT) -> array<bigint>", classOf[SrpBuckets], { exprs =>
        FunctionArgs.requireArity("srp_buckets", exprs, 4,
          "srp_buckets(vec array<float|double>, tables INT, bits INT, seed BIGINT)")
        SrpBuckets(exprs.head,
          FunctionArgs.foldableInt("srp_buckets", exprs(1), "tables"),
          FunctionArgs.foldableInt("srp_buckets", exprs(2), "bits"),
          FunctionArgs.foldableLong("srp_buckets", exprs(3), "seed"))
      }),
    FunctionDef("url_resolve",
      "url_resolve(base STRING, ref STRING) -> STRING", classOf[UrlResolve], { exprs =>
        FunctionArgs.requireArity("url_resolve", exprs, 2,
          "url_resolve(base STRING, ref STRING)")
        UrlResolve(exprs.head, exprs(1))
      }),
    FunctionDef("sorted_intersect_count",
      "sorted_intersect_count(a array<bigint> sorted asc, b array<bigint> sorted asc) -> bigint", classOf[SortedIntersectCount], { exprs =>
        FunctionArgs.requireArity("sorted_intersect_count", exprs, 2,
          "sorted_intersect_count(a array<bigint> sorted, b array<bigint> sorted)")
        SortedIntersectCount(exprs.head, exprs(1))
      }),
    FunctionDef("cosine_sim",
      "cosine_sim(a array<float|double>, b array<float|double>) -> double", classOf[CosineSim], { exprs =>
        FunctionArgs.requireArity("cosine_sim", exprs, 2,
          "cosine_sim(a array<float|double>, b array<float|double>)")
        CosineSim(exprs.head, exprs(1))
      }),
    FunctionDef("bounded_min_k",
      "bounded_min_k(col BIGINT, k INT) -> array<bigint>", classOf[BoundedMinK], { exprs =>
        FunctionArgs.requireArity("bounded_min_k", exprs, 2,
          "bounded_min_k(col bigint, k int literal)")
        BoundedMinK(exprs.head,
          FunctionArgs.foldableInt("bounded_min_k", exprs(1), "k"))
          .toAggregateExpression()
      }),
    FunctionDef("bounded_min_k_distinct",
      "bounded_min_k_distinct(col BIGINT, k INT) -> array<bigint>", classOf[BoundedMinKDistinct], { exprs =>
        FunctionArgs.requireArity("bounded_min_k_distinct", exprs, 2,
          "bounded_min_k_distinct(col bigint, k int literal)")
        BoundedMinKDistinct(exprs.head,
          FunctionArgs.foldableInt("bounded_min_k_distinct", exprs(1), "k"))
          .toAggregateExpression()
      }),
    FunctionDef("bounded_min_k_pairs",
      "bounded_min_k_pairs(ord BIGINT, tag BIGINT, k INT) -> array<struct<o:bigint,t:bigint>>", classOf[BoundedMinKPairs], { exprs =>
        FunctionArgs.requireArity("bounded_min_k_pairs", exprs, 3,
          "bounded_min_k_pairs(ord bigint, tag bigint, k int literal)")
        BoundedMinKPairs(exprs.head, exprs(1),
          FunctionArgs.foldableInt("bounded_min_k_pairs", exprs(2), "k"))
          .toAggregateExpression()
      }),
    FunctionDef("misra_gries",
      "misra_gries(col BIGINT, k INT) -> array<struct<v:bigint,c:bigint>>", classOf[MisraGries], { exprs =>
        FunctionArgs.requireArity("misra_gries", exprs, 2,
          "misra_gries(col bigint, k int literal)")
        MisraGries(exprs.head,
          FunctionArgs.foldableInt("misra_gries", exprs(1), "k"))
          .toAggregateExpression()
      }),
    FunctionDef("deflate_len",
      "deflate_len(text STRING) -> bigint", classOf[DeflateLen], { exprs =>
        FunctionArgs.requireArity("deflate_len", exprs, 1,
          "deflate_len(text string)")
        DeflateLen(exprs.head)
      }),
    FunctionDef("media_type",
      "media_type(payload BINARY) -> string", classOf[MediaType], { exprs =>
        FunctionArgs.requireArity("media_type", exprs, 1,
          "media_type(payload binary)")
        MediaType(exprs.head)
      }),
    FunctionDef("ahash64",
      "ahash64(payload BINARY) -> bigint", classOf[AHash64], { exprs =>
        FunctionArgs.requireArity("ahash64", exprs, 1,
          "ahash64(payload binary)")
        AHash64(exprs.head)
      }),
    FunctionDef("dhash64",
      "dhash64(payload BINARY) -> bigint", classOf[DHash64], { exprs =>
        FunctionArgs.requireArity("dhash64", exprs, 1,
          "dhash64(payload binary)")
        DHash64(exprs.head)
      }),
    FunctionDef("image_meta",
      "image_meta(payload BINARY) -> struct<width,height,channels>", classOf[ImageMeta], { exprs =>
        FunctionArgs.requireArity("image_meta", exprs, 1,
          "image_meta(payload binary)")
        ImageMeta(exprs.head)
      }),
    FunctionDef("ahash64_gray",
      "ahash64_gray(cells ARRAY<BIGINT> of 64) -> bigint", classOf[AHash64Gray], { exprs =>
        FunctionArgs.requireArity("ahash64_gray", exprs, 1,
          "ahash64_gray(cells array<bigint> of 64)")
        AHash64Gray(exprs.head)
      }),
    FunctionDef("dhash64_gray",
      "dhash64_gray(cells ARRAY<BIGINT> of 72) -> bigint", classOf[DHash64Gray], { exprs =>
        FunctionArgs.requireArity("dhash64_gray", exprs, 1,
          "dhash64_gray(cells array<bigint> of 72)")
        DHash64Gray(exprs.head)
      }),
    FunctionDef("ehash64",
      "ehash64(payload BINARY) -> bigint", classOf[EHash64], { exprs =>
        FunctionArgs.requireArity("ehash64", exprs, 1,
          "ehash64(payload binary)")
        EHash64(exprs.head)
      }),
    FunctionDef("ehash64_energy",
      "ehash64_energy(energies ARRAY<BIGINT> of 65) -> bigint", classOf[EHash64Energy], { exprs =>
        FunctionArgs.requireArity("ehash64_energy", exprs, 1,
          "ehash64_energy(energies array<bigint> of 65)")
        EHash64Energy(exprs.head)
      }),
    FunctionDef("audio_meta",
      "audio_meta(payload BINARY) -> struct<sample_rate,channels,frames,bits>", classOf[AudioMeta], { exprs =>
        FunctionArgs.requireArity("audio_meta", exprs, 1,
          "audio_meta(payload binary)")
        AudioMeta(exprs.head)
      }),
    FunctionDef("gzip_members",
      "gzip_members(archive BINARY[, max_member BIGINT[, max_total BIGINT]]) -> array<struct<idx,offset,clen,payload,err>>", classOf[GzipMembers], { exprs =>
        FunctionArgs.requireArity("gzip_members", exprs, 1, 3,
          "gzip_members(archive binary[, max_member bigint[, max_total bigint]])")
        val mm = if (exprs.size >= 2)
          FunctionArgs.foldableLong("gzip_members", exprs(1), "max_member")
        else GzipArchiveCore.MaxMemberBytes
        val mt = if (exprs.size >= 3)
          FunctionArgs.foldableLong("gzip_members", exprs(2), "max_total")
        else GzipArchiveCore.MaxTotalBytes
        GzipMembers(exprs.head, mm, mt)
      }),
    FunctionDef("gzip_member_index",
      "gzip_member_index(archive BINARY[, max_ulen BIGINT]) -> array<struct<idx,offset,clen,ulen,err>>", classOf[GzipMemberIdx], { exprs =>
        FunctionArgs.requireArity("gzip_member_index", exprs, 1, 2,
          "gzip_member_index(archive binary[, max_ulen bigint])")
        val mu = if (exprs.size >= 2)
          FunctionArgs.foldableLong("gzip_member_index", exprs(1), "max_ulen")
        else GzipArchiveCore.MaxIndexMemberBytes
        GzipMemberIdx(exprs.head, mu)
      }),
    FunctionDef("html_unescape_full",
      "html_unescape_full(text STRING, table_path STRING literal) -> STRING",
      classOf[HtmlUnescapeFull], { exprs =>
        FunctionArgs.requireArity("html_unescape_full", exprs, 2,
          "html_unescape_full(text string, table_path string literal)")
        val path = FunctionArgs.foldableString("html_unescape_full",
          exprs(1), "table_path")
        HtmlUnescapeFull(exprs.head,
          HtmlUnescapeCore.Named ++ HtmlEntities.load(
            org.apache.spark.sql.SparkSession.active, path), path)
      }),
    FunctionDef("html_unescape",
      "html_unescape(text STRING) -> STRING", classOf[HtmlUnescape], { exprs =>
        FunctionArgs.requireArity("html_unescape", exprs, 1,
          "html_unescape(text string)")
        HtmlUnescape(exprs.head)
      }),
    FunctionDef("int_l2sq",
      "int_l2sq(a array<bigint>, b array<bigint>) -> bigint", classOf[IntL2Sq], { exprs =>
        FunctionArgs.requireArity("int_l2sq", exprs, 2,
          "int_l2sq(a array<bigint>, b array<bigint>)")
        IntL2Sq(exprs.head, exprs(1))
      }),
    FunctionDef("int_dot",
      "int_dot(a array<bigint>, b array<bigint>) -> bigint", classOf[IntDot], { exprs =>
        FunctionArgs.requireArity("int_dot", exprs, 2,
          "int_dot(a array<bigint>, b array<bigint>)")
        IntDot(exprs.head, exprs(1))
      }),
    FunctionDef("xml_unescape",
      "xml_unescape(text STRING) -> STRING", classOf[XmlUnescape], { exprs =>
        FunctionArgs.requireArity("xml_unescape", exprs, 1,
          "xml_unescape(text string)")
        XmlUnescape(exprs.head)
      }),
    FunctionDef("gzip_index_path",
      "gzip_index_path(path STRING[, max_ulen BIGINT]) -> array<struct<idx,offset,clen,ulen,err>>", classOf[GzipIndexPath], { exprs =>
        FunctionArgs.requireArity("gzip_index_path", exprs, 1, 2,
          "gzip_index_path(path string[, max_ulen bigint])")
        val mu = if (exprs.size >= 2)
          FunctionArgs.foldableLong("gzip_index_path", exprs(1), "max_ulen")
        else GzipArchiveCore.MaxIndexMemberBytes
        GzipIndexPath(exprs.head, mu)
      }),
    FunctionDef("file_range_read",
      "file_range_read(path STRING, offset BIGINT, len BIGINT[, max_bytes BIGINT]) -> struct<slice,err>", classOf[FileRangeRead], { exprs =>
        FunctionArgs.requireArity("file_range_read", exprs, 3, 4,
          "file_range_read(path string, offset bigint, len bigint[, max_bytes bigint])")
        val mb = if (exprs.size >= 4)
          FunctionArgs.foldableLong("file_range_read", exprs(3), "max_bytes")
        else FileRangeCore.MaxRangeBytes
        FileRangeRead(exprs(0), exprs(1), exprs(2), mb)
      }),
    FunctionDef("warc_split",
      "warc_split(record BINARY) -> struct<hdr_end,headers,err>", classOf[WarcSplit], { exprs =>
        FunctionArgs.requireArity("warc_split", exprs, 1,
          "warc_split(record binary)")
        WarcSplit(exprs.head)
      }),
    FunctionDef("gzip_member",
      "gzip_member(payload BINARY) -> binary", classOf[GzipMemberEnc], { exprs =>
        FunctionArgs.requireArity("gzip_member", exprs, 1,
          "gzip_member(payload binary)")
        GzipMemberEnc(exprs.head)
      })
  )

  private val byName: Map[String, FunctionDef] =
    all.map(d => d.name -> d).toMap

  /** Register one catalog function in a session ([[Registration]]
    * once-per-session semantics) — the delegation target for each
    * companion object's `register(spark)` convenience method. */
  def register(spark: SparkSession, name: String): Unit = {
    val d = byName.getOrElse(name,
      throw new IllegalArgumentException(s"no such graft function: $name"))
    Registration.once(spark, d.name)(d.builder)
  }

  /** The companion-delegation form: `owner` is the companion's own
    * Expression class, cross-checked against the catalog row so a
    * copy-pasted wrong-but-valid NAME in a companion (e.g. "ahash64"
    * inside DHash64.register) throws at first use instead of silently
    * registering a different function — the string-keyed hole the
    * round-10 advice flagged. */
  def register(spark: SparkSession, name: String, owner: Class[_]): Unit = {
    val d = byName.getOrElse(name,
      throw new IllegalArgumentException(s"no such graft function: $name"))
    require(d.exprClass == owner,
      s"companion ${owner.getSimpleName}.register delegates to catalog " +
        s"name '$name', which builds ${d.exprClass.getSimpleName}")
    Registration.once(spark, d.name)(d.builder)
  }

  /** Register every catalog function — [[graft.GraftSession]]'s
    * programmatic route. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach(d => Registration.once(spark, d.name)(d.builder))
}
