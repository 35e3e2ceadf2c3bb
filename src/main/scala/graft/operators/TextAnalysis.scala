package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline,
  * over a `documents(doc_id, text, ...)` table.
  *
  * Everything here is built-in Catalyst expressions (split /
  * regexp_extract_all / higher-order array functions) — codegen'd,
  * shuffle-free, embarrassingly parallel per row: the exact shape you
  * want when scoring 100 TB of text, where any per-row UDF or Python
  * boundary would dominate the run time.
  */
object TextAnalysis {

  /** Language stopword profiles for the n-gram/function-word heuristic.
    * Word-boundary alternation keeps counting a single regex pass. */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|to|in|and|is)\\b",
    "es" -> "\\b(el|la|de|que|y|en|los)\\b",
    "fr" -> "\\b(le|la|de|et|les|des|un)\\b",
    "de" -> "\\b(der|die|und|das|von|mit|ein)\\b")

  private val punctPattern = "[^a-z0-9 ]"
  /** BPE-ish pre-tokenizer: letter runs | digit runs | single symbol. */
  private val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def words(text: Column): Column = split(text, " ")

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def withTokenCounts(df: DataFrame, text: String = "text"): DataFrame =
    df.withColumn("n_tokens_ws", size(words(col(text))))
      .withColumn("n_tokens_re",
        size(regexp_extract_all(col(text), lit(bpeishPattern), lit(0))))

  /** Heuristic quality scoring: length / stopword / punctuation signals
    * combined with a fixed, deterministic arithmetic order (documented
    * so the DuckDB oracle can reproduce it bit-for-bit). */
  def withQualityScore(df: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    df.withColumn("n_words", size(words(t)))
      .withColumn("n_chars_m", length(t))
      .withColumn("mean_word_len",
        (col("n_chars_m") - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("stop_hits",
        size(regexp_extract_all(t, lit(langProfiles.head._2), lit(0))))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_words"))
      .withColumn("punct_ratio",
        // greatest(..,1): empty text must score 0, not raise ANSI
        // divide-by-zero (empty rows are guaranteed at corpus scale)
        size(regexp_extract_all(t, lit(punctPattern), lit(0))).cast("double") /
          greatest(col("n_chars_m"), lit(1)))
      .withColumn("quality_score",
        (least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          least(col("stop_ratio") * 5.0, lit(1.0)) +
          (lit(1.0) - col("punct_ratio"))) / 3.0)
  }

  /** Language ID: one regex-count per profile, argmax with a fixed
    * priority order (en > es > fr > de) and 'unknown' when no profile
    * matches at all. */
  def withLanguageId(df: DataFrame, text: String = "text"): DataFrame = {
    val scored = langProfiles.foldLeft(df) { case (d, (code, pat)) =>
      d.withColumn(s"score_$code",
        size(regexp_extract_all(col(text), lit(pat), lit(0))).cast("long"))
    }
    val Seq(en, es, fr, de) = langProfiles.map(p => col(s"score_${p._1}"))
    scored.withColumn("lang_pred",
      when(en >= es && en >= fr && en >= de && en > 0, "en")
        .when(es >= fr && es >= de && es > 0, "es")
        .when(fr >= de && fr > 0, "fr")
        .when(de > 0, "de")
        .otherwise("unknown"))
  }

  /** Document fingerprints: content hash (md5, cross-engine stable),
    * 64-bit xxhash, and a word-level polynomial rolling hash — the
    * last two feed sharding/near-dup machinery and are exact-integer
    * arithmetic, so they are deterministic across partitionings. */
  def withFingerprints(df: DataFrame, text: String = "text"): DataFrame =
    df.withColumn("fp_md5", md5(col(text)))
      .withColumn("fp_bucket", substring(md5(col(text)), 1, 4))
      .withColumn("fp_xx64", xxhash64(col(text)))
      .withColumn("fp_rolling",
        // chained xxhash64 fold: order-sensitive like a rolling hash but
        // free of ANSI overflow (multiply-add wraps are errors in Spark 4)
        expr(s"aggregate(split($text, ' '), cast(7 as bigint), (acc, w) -> xxhash64(acc, w))"))
}
