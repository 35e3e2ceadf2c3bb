package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compressed web-crawl ingestion (WET/WARC-gzip → document rows) —
  * the source a 100 TB training-data pipeline actually starts from:
  * Common-Crawl-style archives where each crawl record is its own
  * gzip member and members are concatenated into multi-GB files.
  *
  * Pipeline: `binaryFile`-style rows (archive path, payload bytes) →
  * [[expandGzipMembers]] (per-member rows with provenance: member
  * index, byte offset, compressed length — the fields a WARC
  * cluster.idx records, so a re-crawl or a spot audit can seek
  * straight to a record) → [[wetRecords]] (WARC header parse:
  * WARC-Type, WARC-Target-URI, Content-Length-sliced body) →
  * [[wetDocuments]] (conversion records as clean document rows
  * feeding cleanCorpus → dedupCorpus).
  *
  * Everything is per-row expression work — the member split is the
  * native codegen'd [[graft.functions.GzipMembers]], the header parse
  * is string functions, the body slice is BYTE arithmetic on the
  * binary payload (Content-Length is bytes; a char-based substring
  * would shear multi-byte UTF-8 records) — so the plan has ZERO
  * shuffles until the caller aggregates: archives split
  * embarrassingly parallel across executors, one task per archive
  * row (split archives into per-file rows upstream;
  * `spark.read.format("binaryFile")` does exactly that).
  *
  * Corruption is data, not an error, at BOTH layers (the decodeImage
  * quarantine convention): a broken gzip member yields a row with
  * null payload and a non-null `err` covering the rest of its archive
  * (gzip has no resync marker — scanning past a broken member is
  * guesswork); a well-formed member that is not a parseable WARC
  * record yields a row with null text and a non-null `quarantine`
  * reason. Nothing is silently dropped: `n_archive_rows =
  * Σ(documents) + Σ(quarantined)` always holds, the audit identity a
  * lossy ingest cannot fake. */
object WebArchive {

  /** Archive rows (path + concatenated-gzip payload) → one row per
    * gzip member with provenance. Corrupt/truncated/bomb members come
    * back with `payload` null and `err` set (one row covers the
    * remainder of that archive). A null or zero-byte archive payload
    * also yields ONE quarantine row (`explode_outer` + null-struct
    * mapping) — a plain `explode` would drop the archive row entirely
    * and silently break the audit identity. */
  def expandGzipMembers(archives: DataFrame,
                        pathCol: String = "archive",
                        payloadCol: String = "payload",
                        maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                        maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes): DataFrame = {
    graft.functions.GzipMembers.register(archives.sparkSession)
    archives
      .select(col(pathCol).as("archive"),
        explode_outer(expr(
          s"gzip_members($payloadCol, ${maxMemberBytes}L, ${maxTotalBytes}L)")).as("m"))
      .select(col("archive"),
        coalesce(col("m.idx"), lit(0)).as("member_index"),
        coalesce(col("m.offset"), lit(0L)).as("member_offset"),
        coalesce(col("m.clen"), lit(0L)).as("member_clen"),
        col("m.payload").as("member_payload"),
        when(col("m").isNull, lit("empty or null archive payload"))
          .otherwise(col("m.err")).as("member_err"))
  }

  /** Payload-free member index — the cluster.idx builder: (archive,
    * member_index, member_offset, member_clen, member_ulen,
    * member_err). The scan is streaming per member (constant memory —
    * [[graft.functions.GzipArchiveCore.memberIndex]]), so an archive
    * whose DECOMPRESSED size dwarfs the per-row bomb budget indexes
    * fine; the caps then bind per SLICE on the fan-out read. In
    * production this index is built once per crawl (or shipped with
    * it, as Common Crawl ships cluster.idx) and persisted; rebuilding
    * it per query would re-scan every archive. */
  def memberIndex(archives: DataFrame,
                  pathCol: String = "archive",
                  payloadCol: String = "payload"): DataFrame = {
    graft.functions.GzipMemberIdx.register(archives.sparkSession)
    archives
      .select(col(pathCol).as("archive"),
        explode_outer(expr(s"gzip_member_index($payloadCol)")).as("m"))
      .select(col("archive"),
        coalesce(col("m.idx"), lit(0)).as("member_index"),
        coalesce(col("m.offset"), lit(0L)).as("member_offset"),
        coalesce(col("m.clen"), lit(0L)).as("member_clen"),
        coalesce(col("m.ulen"), lit(0L)).as("member_ulen"),
        when(col("m").isNull, lit("empty or null archive payload"))
          .otherwise(col("m.err")).as("member_err"))
  }

  /** The STREAMING index builder over file PATHS — [[memberIndex]]'s
    * contract with the whole-file payload rows removed: input is a
    * one-column frame of archive paths, each indexed through a
    * bounded rolling window ([[graft.functions.GzipIndexPath]], ~128
    * KiB regardless of file size). Together with
    * [[wetDocumentsRanged]] this closes the archive pipeline's last
    * whole-file residency: index by streaming the path, then read
    * members by byte range — no stage ever materializes a compressed
    * crawl file. Output schema identical to [[memberIndex]] (archive
    * = the path; open failures quarantine as one err row). */
  def memberIndexFromPaths(paths: DataFrame,
                           pathCol: String = "archive",
                           maxUlen: Long = graft.functions.GzipArchiveCore.MaxIndexMemberBytes): DataFrame = {
    graft.functions.GzipIndexPath.register(paths.sparkSession)
    paths
      .select(col(pathCol).as("archive"),
        explode_outer(expr(s"gzip_index_path($pathCol, ${maxUlen}L)")).as("m"))
      .select(col("archive"),
        coalesce(col("m.idx"), lit(0)).as("member_index"),
        coalesce(col("m.offset"), lit(0L)).as("member_offset"),
        coalesce(col("m.clen"), lit(0L)).as("member_clen"),
        coalesce(col("m.ulen"), lit(0L)).as("member_ulen"),
        when(col("m").isNull, lit("empty archive"))
          .otherwise(col("m.err")).as("member_err"))
  }

  /** Fan an archive out into PER-MEMBER compressed slices along a
    * member index: (archive, base_index, base_offset, slice) — each
    * slice is an independent, individually-inflatable gzip stream, so
    * the unit of parallelism becomes the MEMBER, not the file, and the
    * bomb caps bind per slice. This is the offset-range read a
    * 100 TB crawl ingest does against object storage; on in-memory
    * archive rows the byte-range seek is a `substring` on the payload
    * (the index side is broadcast: member coordinates only, no
    * payloads move). Corrupt index rows (err set) are NOT sliced —
    * [[wetDocumentsSliced]] re-unions them as quarantine rows so the
    * audit identity survives the fan-out. */
  def sliceMembers(archives: DataFrame, index: DataFrame,
                   pathCol: String = "archive",
                   payloadCol: String = "payload"): DataFrame =
    archives
      .select(col(pathCol).as("archive"), col(payloadCol).as("payload"))
      .join(broadcast(index.filter(col("member_err").isNull)
        .select("archive", "member_index", "member_offset", "member_clen")),
        Seq("archive"))
      .select(col("archive"),
        col("member_index").as("base_index"),
        col("member_offset").as("base_offset"),
        expr("substring(payload, cast(member_offset as int) + 1, " +
          "cast(member_clen as int))").as("slice"))

  /** Slice rows → member rows with provenance REBASED to the original
    * archive coordinates (member_index/member_offset are absolute, as
    * if the whole file had been expanded in one task). Caps are
    * per-slice dials. When `errCol` names a column, a non-null value
    * there takes precedence as the member error — the ranged path
    * carries its fetch failures through here so a failed range read
    * becomes a quarantine row in the SAME single pass (filtering the
    * error rows out first would re-execute the range fetch per
    * branch: two GETs per member). */
  def expandSlices(slices: DataFrame,
                   maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                   maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes,
                   errCol: Option[String] = None): DataFrame = {
    graft.functions.GzipMembers.register(slices.sparkSession)
    val carried = errCol.map(col).getOrElse(lit(null).cast("string"))
    slices
      .select(col("archive"), col("base_index"), col("base_offset"),
        carried.as("_carried_err"),
        explode_outer(expr(
          s"gzip_members(slice, ${maxMemberBytes}L, ${maxTotalBytes}L)")).as("m"))
      .select(col("archive"),
        (col("base_index") + coalesce(col("m.idx"), lit(0))).as("member_index"),
        (col("base_offset") + coalesce(col("m.offset"), lit(0L))).as("member_offset"),
        coalesce(col("m.clen"), lit(0L)).as("member_clen"),
        col("m.payload").as("member_payload"),
        coalesce(col("_carried_err"),
          when(col("m").isNull, lit("empty or null slice"))
            .otherwise(col("m.err"))).as("member_err"))
  }

  /** The TRUE object-storage fan-out: a persisted member index whose
    * `archive` column holds REAL file paths → per-member compressed
    * slices fetched by positioned byte-range reads
    * ([[graft.functions.FileRangeRead]] — Hadoop `FileSystem`, so
    * `file://`/`hdfs://`/`s3a://` are one code path and the read is a
    * ranged GET on object stores). No archive payload column exists
    * anywhere in this plan: the only thing that shuffles or sits in a
    * row is `(path, offset, clen)` plus ONE member's compressed bytes,
    * so a task never holds a whole crawl file and the 2 GiB
    * row-size bound of the `binaryFile` route becomes a per-MEMBER
    * bound. Fetch failures (missing file, short read, over-cap claim)
    * surface in `slice_err`, never as exceptions.
    *
    * `fanoutPartitions` repartitions the index before the fetch: an
    * index is KBs per thousand members, so its parquet layout gives
    * far fewer tasks than the fetch work wants — at scale set this to
    * ~(total members / desired members-per-task); None keeps the plan
    * shuffle-free for small reads.
    *
    * `coalesceMembers` > 1 batches runs of ADJACENT members (by
    * member_index div k) into ONE range request covering the group's
    * byte span, then cuts each member's slice from the fetched buffer
    * by offset arithmetic — the OBJECT-STORE dial: crawl members are
    * a few KB and every GET carries 10–50 ms latency plus a
    * per-request charge, so a 64-member group cuts request count 64×.
    * On page-cached LOCAL files it does not pay (measured 2.8 s
    * per-member vs 4.1 s coalesced on 50k members — syscalls are free
    * there, and the group path adds an index shuffle + a per-member
    * buffer copy; ARCHITECTURE.md §headroom), which is why 1 (the
    * pure zero-shuffle per-member form) is the default. Costs one
    * SHUFFLE of the payload-free index (collect_list state ≤ k
    * coordinate structs per group) and reads any gap bytes between
    * retained members (none exist in practice: the indexer halts at
    * the first error, so retained members are contiguous).
    * Output is spec-pinned byte-identical to the per-member form at
    * any k. */
  /** Production sizing for `fanoutPartitions`: an index is KBs per
    * thousand members, so its parquet layout yields far fewer tasks
    * than the fetch work wants — at a billion members the shuffle-free
    * default would hand one task millions of ranged reads. The
    * formula is the documented recipe: ceil(total members / target
    * members-per-task). 4096 members/task is the object-store sweet
    * spot — ~4k ranged GETs ≈ 1–3 min of request latency per task,
    * large enough to amortize task startup, small enough for retry
    * granularity. Pass `Some(fanoutFor(index.count()))` when the
    * index is big; leave `None` (shuffle-free) for small reads —
    * q185's fixture-scale path does, and the spec pins that the
    * repartition appears ONLY when asked. */
  def fanoutFor(totalMembers: Long, membersPerTask: Long = 4096L): Int = {
    require(totalMembers >= 0 && membersPerTask > 0,
      s"need totalMembers >= 0 and membersPerTask > 0: $totalMembers/$membersPerTask")
    math.max(1L, math.min(Int.MaxValue.toLong,
      (totalMembers + membersPerTask - 1) / membersPerTask)).toInt
  }

  def sliceMembersRanged(index: DataFrame,
                         maxSliceBytes: Long = graft.functions.FileRangeCore.MaxRangeBytes,
                         fanoutPartitions: Option[Int] = None,
                         coalesceMembers: Int = 1): DataFrame = {
    graft.functions.FileRangeRead.register(index.sparkSession)
    val base = index.filter(col("member_err").isNull)
      .select(col("archive"), col("member_index"), col("member_offset"),
        col("member_clen"))
    if (coalesceMembers <= 1) {
      val fanned = fanoutPartitions.map(base.repartition(_)).getOrElse(base)
      fanned
        .select(col("archive"),
          col("member_index").as("base_index"),
          col("member_offset").as("base_offset"),
          expr(s"file_range_read(archive, member_offset, member_clen, " +
            s"${maxSliceBytes}L)").as("r"))
        .select(col("archive"), col("base_index"), col("base_offset"),
          col("r.slice").as("slice"), col("r.err").as("slice_err"))
    } else {
      // the GROUP fetch budget scales by k: k adjacent members each
      // under the per-member cap legitimately span up to k×cap bytes,
      // and checking the group span against the per-member cap would
      // quarantine every healthy member in the group. A group whose
      // span still exceeds k×cap (a member over the per-member cap, a
      // hostile offset, a gappy doctored index) is NOT quarantined
      // wholesale: the group read is skipped and each member falls
      // back to its own per-member ranged read, so the per-MEMBER cap
      // is the only cap that ever decides a member's fate and the
      // coalesced form stays byte-identical (slice AND slice_err) to
      // the per-member form on every input, honest or hostile.
      // ... and clamped to the JVM array bound (Int.MaxValue - 16, the
      // same bound FileRangeCore.read enforces): k×cap exceeds it for
      // k >= 8 at the default 256 MiB cap, and WITHOUT the clamp a
      // group span between the JVM bound and k×cap would pass this
      // gate, fail inside the group read ("range length N exceeds JVM
      // array bound"), and stamp that error onto every member via the
      // `_r IS NOT NULL` branch — healthy members wrongly quarantined
      // where the contract promises the per-member fallback. Clamped,
      // such spans skip the group read entirely and each member reads
      // itself (ADVICE r16 medium; Round17Spec pins it with a group
      // span past the JVM bound whose members are individually fine).
      val jvmBound = (Int.MaxValue - 16).toLong
      val groupCap = math.min(jvmBound,
        if (maxSliceBytes > Long.MaxValue / coalesceMembers) Long.MaxValue
        else maxSliceBytes * coalesceMembers)
      val grouped = base
        .groupBy(col("archive"),
          expr(s"member_index div $coalesceMembers").as("_grp"))
        .agg(min(col("member_offset")).as("_goff"),
          max(col("member_offset") + col("member_clen")).as("_gend"),
          collect_list(struct(col("member_index"), col("member_offset"),
            col("member_clen"))).as("_ms"))
      val fanned = fanoutPartitions.map(grouped.repartition(_)).getOrElse(grouped)
      fanned
        // the range read is LET-BOUND via the single-element-array
        // transform (the shingleExpr idiom): as a bare projected
        // column, CollapseProject inlines it into the Generate's
        // output projection and the GROUP read re-executes once per
        // MEMBER — measured 4× slower than not coalescing at all; the
        // lambda binding pins it to one fetch per group
        .select(col("archive"),
          explode(expr(
            s"""transform(array(
               |  CASE WHEN _gend - _goff <= ${groupCap}L THEN
               |    file_range_read(archive, _goff, _gend - _goff, ${groupCap}L)
               |  END),
               |  _r -> transform(_ms, m -> named_struct(
               |    'base_index', m.member_index,
               |    'base_offset', m.member_offset,
               |    'r', CASE
               |      WHEN m.member_clen > ${maxSliceBytes}L THEN named_struct(
               |        'slice', CAST(NULL AS BINARY),
               |        'err', concat('range length ',
               |          cast(m.member_clen as string),
               |          ' exceeds ${maxSliceBytes} byte cap'))
               |      WHEN _r IS NOT NULL THEN named_struct(
               |        'slice', CASE WHEN _r.err IS NULL THEN
               |          substring(_r.slice,
               |            cast(m.member_offset - _goff as int) + 1,
               |            cast(m.member_clen as int)) END,
               |        'err', _r.err)
               |      ELSE file_range_read(archive, m.member_offset,
               |        m.member_clen, ${maxSliceBytes}L)
               |    END)))[0]""".stripMargin)).as("s"))
        .select(col("archive"),
          col("s.base_index").as("base_index"),
          col("s.base_offset").as("base_offset"),
          col("s.r.slice").as("slice"),
          col("s.r.err").as("slice_err"))
    }
  }

  /** Member rows → parsed WARC records with BINARY bodies — the
    * GENERAL layer: a crawl's response records carry images, PDFs,
    * archives, so nothing here ever decodes the payload as text. The
    * header split is the byte-level native
    * [[graft.functions.WarcSplit]] (ASCII-enforced headers, so the
    * byte offsets the Content-Length slice needs can never desync
    * from char indices), the body is a byte-exact BINARY slice. Rows
    * that fail any stage keep provenance with a `quarantine` reason;
    * parsed rows carry (warc_type, target_uri, body binary). */
  def warcRecords(members: DataFrame): DataFrame = {
    graft.functions.WarcSplit.register(members.sparkSession)
    members
      .withColumn("w", expr("warc_split(member_payload)"))
      .withColumn("hdr_end", col("w.hdr_end"))
      .withColumn("headers", col("w.headers"))
      .withColumn("warc_type",
        expr("nullif(regexp_extract(headers, 'WARC-Type: ([^\\r\\n]+)', 1), '')"))
      .withColumn("target_uri",
        expr("nullif(regexp_extract(headers, 'WARC-Target-URI: ([^\\r\\n]+)', 1), '')"))
      .withColumn("content_length",
        expr("try_cast(nullif(regexp_extract(headers, " +
          "'Content-Length: ([0-9]+)', 1), '') as bigint)"))
      .withColumn("quarantine",
        when(col("member_err").isNotNull, col("member_err"))
          .when(col("member_payload").isNull, lit("empty member"))
          .when(col("w.err").isNotNull, col("w.err"))
          .when(col("warc_type").isNull, lit("missing WARC-Type"))
          .when(col("content_length").isNull, lit("missing Content-Length"))
          .when(col("content_length") >
            expr("octet_length(member_payload)") - col("hdr_end") - 3,
            lit("Content-Length past end of member")))
      .withColumn("body",
        when(col("quarantine").isNull,
          // byte-exact: hdr_end is a 1-based BYTE position (warc_split
          // contract); +4 skips the CRLFCRLF
          expr("substring(member_payload, hdr_end + 4, content_length)")))
      .select(col("archive"), col("member_index"), col("member_offset"),
        col("member_clen"), col("warc_type"), col("target_uri"),
        col("content_length"), col("body"), col("quarantine"))
  }

  /** The TEXT (WET) layer over [[warcRecords]]: conversion records are
    * text by contract, so the binary body becomes a `text` column,
    * with undecodable bodies quarantined. Same output schema as ever
    * (…, text, quarantine). */
  def wetRecords(members: DataFrame): DataFrame =
    warcRecords(members)
      // the TEXT layer on top of the binary split: WET conversion
      // records are text by contract, so an undecodable body — a
      // binary response record routed here by mistake, or a
      // Content-Length slicing mid-UTF-8-sequence — quarantines
      // instead of aborting the job (NON-validating cast +
      // is_valid_utf8; the validating decode() threw
      // MALFORMED_CHARACTER_CODING and killed the whole ingest).
      .withColumn("quarantine", coalesce(col("quarantine"),
        when(!expr("is_valid_utf8(cast(body as string))"),
          lit("body is not valid UTF-8 text"))))
      .withColumn("text",
        when(col("quarantine").isNull, col("body").cast("string")))
      .select(col("archive"), col("member_index"), col("member_offset"),
        col("member_clen"), col("warc_type"), col("target_uri"),
        col("content_length"), col("text"), col("quarantine"))

  /** Spec/oracle harness — the inverse direction: document rows →
    * WET archive rows, one archive per `groupCol` value, one gzip
    * member per doc (uri `…/doc/<doc_id>`, Content-Length in BYTES,
    * CRLF framing per the WARC spec), members ordered by doc_id. The
    * round trip documents ⇒ [[buildWetArchives]] ⇒ [[wetDocuments]]
    * ⇒ documents is the ingest oracle: the recovered text is
    * byte-identical to the input WHATEVER zlib build produced the
    * members, so the gate certifies splitter + header parse + body
    * slice without pinning compressed bytes. (Production archives
    * arrive as files; this assembly exists for closed-loop testing —
    * its per-group collect_list is fixture-sized by construction.) */
  def buildWetArchives(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    graft.functions.GzipMemberEnc.register(docs.sparkSession)
    docs
      // fail LOUDLY on null doc fields: a null doc_id/text would null
      // `rec`, null its gzip member, and the aggregate concat would
      // then null the whole group's payload — one bad row silently
      // voiding an entire archive is exactly the failure a fixture
      // builder must not have
      .withColumn("_docok", when(col("doc_id").isNull || col("text").isNull,
        expr("cast(raise_error('buildWetArchives: null doc_id or text') " +
          "as boolean)")).otherwise(lit(true)))
      .filter(col("_docok"))
      .withColumn("rec", concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: " +
          "https://example.org/doc/"), col("doc_id"),
        lit("\r\nContent-Length: "), octet_length(col("text")).cast("string"),
        lit("\r\n\r\n"), col("text"), lit("\r\n\r\n")))
      .withColumn("mb", expr("gzip_member(encode(rec, 'UTF-8'))"))
      .groupBy(col(groupCol).as("archive"))
      .agg(expr("aggregate(array_sort(collect_list(struct(doc_id, mb))), " +
        "cast('' as binary), (acc, r) -> concat(acc, r.mb))").as("payload"))
  }

  /** Spec/oracle harness for the RESPONSE-record (binary-body) side:
    * document rows with a `body` BINARY column → WARC archive rows,
    * one gzip member per record (`WARC-Type: response`, Content-Length
    * in bytes) — [[buildWetArchives]]'s shape with the body kept
    * binary end-to-end, so the round trip certifies the byte-level
    * split against payloads no text codec could survive. */
  def buildWarcArchives(docs: DataFrame, groupCol: String = "source",
                        bodyCol: String = "body"): DataFrame = {
    graft.functions.GzipMemberEnc.register(docs.sparkSession)
    docs
      .withColumn("_docok", when(col("doc_id").isNull || col(bodyCol).isNull,
        expr("cast(raise_error('buildWarcArchives: null doc_id or body') " +
          "as boolean)")).otherwise(lit(true)))
      .filter(col("_docok"))
      .withColumn("rec", concat(
        encode(concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
            "https://example.org/doc/"), col("doc_id"),
          lit("\r\nContent-Length: "),
          octet_length(col(bodyCol)).cast("string"),
          lit("\r\n\r\n")), "UTF-8"),
        col(bodyCol), encode(lit("\r\n\r\n"), "UTF-8")))
      .withColumn("mb", expr("gzip_member(rec)"))
      .groupBy(col(groupCol).as("archive"))
      .agg(expr("aggregate(array_sort(collect_list(struct(doc_id, mb))), " +
        "cast('' as binary), (acc, r) -> concat(acc, r.mb))").as("payload"))
  }

  /** Archives → MULTIMODAL asset rows: response-record bodies routed
    * by their sniffed media type ([[graft.operators.Multimodal
    * .routeByType]] — constant-time prefix inspection, payload bytes
    * never shuffle), quarantine rows kept under route `quarantine`.
    * This is what the round-11 advice finding was really about: a
    * crawl's binary bodies are not corruption, they are the image/
    * audio pillar's INPUT — so the WET text path and this asset path
    * now share one byte-level parser and split only at the body
    * interpretation. */
  def warcAssets(archives: DataFrame,
                 pathCol: String = "archive",
                 payloadCol: String = "payload"): DataFrame =
    graft.operators.Multimodal.routeByType(
      warcRecords(expandGzipMembers(archives, pathCol, payloadCol))
        .filter(col("quarantine").isNotNull || col("warc_type") === "response")
        .select(col("archive"), col("member_index"), col("member_offset"),
          col("target_uri"), col("body").as("payload"), col("quarantine")))
      .withColumn("route",
        when(col("quarantine").isNotNull, lit("quarantine"))
          .otherwise(col("route")))

  /** Archives → clean conversion-record document rows + quarantine
    * rows (kept, flagged — route them to a dead-letter sink with
    * `filter(col("quarantine").isNotNull)`). WET text records are
    * `WARC-Type: conversion`; request/response/metadata records pass
    * through only when `conversionOnly` is false. */
  def wetDocuments(archives: DataFrame, conversionOnly: Boolean = true,
                   pathCol: String = "archive",
                   payloadCol: String = "payload",
                   maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                   maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes): DataFrame = {
    val recs = wetRecords(expandGzipMembers(archives, pathCol, payloadCol,
      maxMemberBytes, maxTotalBytes))
    if (conversionOnly)
      recs.filter(col("quarantine").isNotNull ||
        col("warc_type") === "conversion")
    else recs
  }

  /** The OFFSET-SPLITTABLE ingest: index → per-member slices → rebased
    * member rows → parsed records — same output contract as
    * [[wetDocuments]], but the unit of parallelism is the member and
    * the bomb caps bind PER SLICE, so one real Common-Crawl WET file
    * (>1 GiB decompressed — the whole-file path quarantine-truncates
    * it at [[graft.functions.GzipArchiveCore.MaxTotalBytes]]) ingests
    * completely. Index error rows (corrupt tails, null payloads)
    * re-enter as quarantine member rows, so the audit identity
    * `archive member rows = documents + quarantined` holds exactly as
    * on the whole-file path. Pass a persisted crawl index as `index`
    * to skip the in-line indexing scan. */
  def wetDocumentsSliced(archives: DataFrame, conversionOnly: Boolean = true,
                         pathCol: String = "archive",
                         payloadCol: String = "payload",
                         maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                         maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes,
                         index: Option[DataFrame] = None): DataFrame = {
    val idx = index.getOrElse(memberIndex(archives, pathCol, payloadCol))
    val sliced = expandSlices(
      sliceMembers(archives, idx, pathCol, payloadCol),
      maxMemberBytes, maxTotalBytes)
    val errRows = idx.filter(col("member_err").isNotNull)
      .select(col("archive"), col("member_index"), col("member_offset"),
        col("member_clen"), lit(null).cast("binary").as("member_payload"),
        col("member_err"))
    val recs = wetRecords(sliced.unionByName(errRows))
    if (conversionOnly)
      recs.filter(col("quarantine").isNotNull ||
        col("warc_type") === "conversion")
    else recs
  }

  /** The RANGE-READ ingest — [[wetDocumentsSliced]]'s contract with
    * the in-memory archive rows removed entirely: input is ONLY a
    * persisted member index over real file paths (`archive` = path,
    * plus member_index/member_offset/member_clen/member_err — what
    * [[memberIndex]] emits and Common Crawl ships as cluster.idx), and
    * every compressed member is fetched by its own byte-range read at
    * parse time. Same output schema and audit identity: index rows =
    * documents + quarantined (index error rows re-enter as quarantine
    * rows; failed range fetches become quarantine rows through the
    * carried `slice_err`). This is the production 100 TB path: build
    * or receive the index once, then every query over the crawl reads
    * exactly the byte ranges it needs, at member granularity, with no
    * task ever holding a whole file. */
  def wetDocumentsRanged(index: DataFrame, conversionOnly: Boolean = true,
                         maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                         maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes,
                         maxSliceBytes: Long = graft.functions.FileRangeCore.MaxRangeBytes,
                         fanoutPartitions: Option[Int] = None,
                         coalesceMembers: Int = 1): DataFrame = {
    val sliced = expandSlices(
      sliceMembersRanged(index, maxSliceBytes, fanoutPartitions,
        coalesceMembers),
      maxMemberBytes, maxTotalBytes, errCol = Some("slice_err"))
    val errRows = index.filter(col("member_err").isNotNull)
      .select(col("archive"), col("member_index"), col("member_offset"),
        col("member_clen"), lit(null).cast("binary").as("member_payload"),
        col("member_err"))
    val recs = wetRecords(sliced.unionByName(errRows))
    if (conversionOnly)
      recs.filter(col("quarantine").isNotNull ||
        col("warc_type") === "conversion")
    else recs
  }
}
