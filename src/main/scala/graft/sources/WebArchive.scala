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
    * remainder of that archive). */
  def expandGzipMembers(archives: DataFrame,
                        pathCol: String = "archive",
                        payloadCol: String = "payload"): DataFrame = {
    graft.functions.GzipMembers.register(archives.sparkSession)
    archives
      .select(col(pathCol).as("archive"),
        explode(expr(s"gzip_members($payloadCol)")).as("m"))
      .select(col("archive"),
        col("m.idx").as("member_index"),
        col("m.offset").as("member_offset"),
        col("m.clen").as("member_clen"),
        col("m.payload").as("member_payload"),
        col("m.err").as("member_err"))
  }

  /** Member rows → parsed WARC records. WARC headers are ASCII lines
    * terminated by CRLF with a blank line before the body, and the
    * body is exactly Content-Length BYTES — so the header search runs
    * on the decoded string (char index == byte index inside ASCII
    * headers) and the body slice runs on the BINARY payload. Rows
    * that fail any stage keep their provenance with a `quarantine`
    * reason; parsed rows carry (warc_type, target_uri, text). */
  def wetRecords(members: DataFrame): DataFrame =
    members
      .withColumn("s", expr("decode(member_payload, 'UTF-8')"))
      .withColumn("hdr_end", expr("instr(s, '\r\n\r\n')"))
      .withColumn("headers",
        expr("case when hdr_end > 0 then substr(s, 1, hdr_end - 1) end"))
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
          .when(!expr("s like 'WARC/%'"), lit("not a WARC record"))
          .when(col("hdr_end") <= 0, lit("no header terminator"))
          .when(col("warc_type").isNull, lit("missing WARC-Type"))
          .when(col("content_length").isNull, lit("missing Content-Length"))
          .when(col("content_length") >
            expr("octet_length(member_payload)") - col("hdr_end") - 3,
            lit("Content-Length past end of member")))
      .withColumn("text",
        when(col("quarantine").isNull,
          // byte-exact slice: headers are ASCII so hdr_end (a char
          // index) IS the byte index; +4 skips the CRLFCRLF
          expr("decode(substring(member_payload, hdr_end + 4, content_length), 'UTF-8')")))
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

  /** Archives → clean conversion-record document rows + quarantine
    * rows (kept, flagged — route them to a dead-letter sink with
    * `filter(col("quarantine").isNotNull)`). WET text records are
    * `WARC-Type: conversion`; request/response/metadata records pass
    * through only when `conversionOnly` is false. */
  def wetDocuments(archives: DataFrame, conversionOnly: Boolean = true,
                   pathCol: String = "archive",
                   payloadCol: String = "payload"): DataFrame = {
    val recs = wetRecords(expandGzipMembers(archives, pathCol, payloadCol))
    if (conversionOnly)
      recs.filter(col("quarantine").isNotNull ||
        col("warc_type") === "conversion")
    else recs
  }
}
