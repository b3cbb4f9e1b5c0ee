package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a
  * (doc_id, text) table. All built from `org.apache.spark.sql.functions`
  * (whole-stage codegen'd, pushdown-friendly); definitions chosen to be
  * expressible identically in ANSI/DuckDB SQL so the driver oracle can
  * cross-check them.
  */
object TextOps {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Token statistics per doc. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      tokenCount(col("text")).as("n_tokens"),
      length(regexp_replace(col("text"), "\\s+", "")).as("n_nonspace"))

  /** BPE-ish piece pattern (GPT-2 style): letter runs, digit runs, and
    * single non-letter/digit/space marks. Expressed as a MATCH pattern (no
    * lookarounds) so Java regex and DuckDB's RE2 agree exactly.
    */
  val BpePiece = "[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"

  /** BPE-ish regex token count over the piece pattern. */
  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpePiece), lit(0))).as("n_bpe_tokens"))

  /** Rule-based language ID (n-gram/script heuristic): deterministic CASE
    * cascade — script ranges first, then stopword hits.
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = col("text")
    val pred =
      when(t.rlike("[가-힣]"), "ko")
        .when(t.rlike("[ぁ-んァ-ン]"), "ja")
        .when(t.rlike("[一-鿿]"), "zh")
        .when(t.rlike("[а-яА-Я]"), "ru")
        .when(t.rlike("(?i)(^| )(der|die|das|und|nicht) "), "de")
        .when(t.rlike("(?i)(^| )(le|la|les|une|est) "), "fr")
        .when(t.rlike("(?i)(^| )(el|los|las|una|es) "), "es")
        .otherwise("en")
    docs.select(col("doc_id"), pred.as("pred_lang"))
  }

  /** Quality scoring: integer feature counts plus a per-mille composite.
    * All-integer arithmetic so engines agree exactly.
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nChars = length(t)
    val punct = length(regexp_replace(t, "[^.!?,;:]", ""))
    val digits = length(regexp_replace(t, "[^0-9]", ""))
    val stop = size(filter(split(t, " "),
      w => w.isin("the", "a", "and", "of", "to", "in", "is")))
    val tokens = tokenCount(t)
    docs.select(
      col("doc_id"), nChars.as("n_chars"), punct.as("n_punct"),
      digits.as("n_digit"), stop.as("n_stopword"), tokens.as("n_tokens"),
      // per-mille ratios via integer floor division semantics
      floor(punct * lit(1000) / greatest(nChars, lit(1))).cast("long").as("punct_pm"),
      floor(stop * lit(1000) / greatest(tokens, lit(1))).cast("long").as("stopword_pm"))
  }

  /** Document fingerprinting: md5 (portable) + a 64-bit Spark hash. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("md5_hex"),
      xxhash64(col("text")).as("h64"))
}
