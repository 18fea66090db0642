package graft.operators

import graft.Tables
import graft.functions.text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table: language ID,
  * quality scoring, token statistics, fingerprinting. All single-pass
  * scans with pure-expression columns (no UDFs) — at 100 TB these run at
  * parquet scan speed inside whole-stage codegen.
  */
object TextOps {

  /** Pinned fan-out before regex-heavy per-row scoring: a compact text
    * corpus is few MB (so AQE/file-splits under-parallelize) but costs
    * seconds of regex per partition. Scattering the raw docs is free by
    * comparison.
    */
  private def docsFanned(s: SparkSession, dir: String) =
    Tables(s, dir, "documents").repartition(
      s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))

  /** Language-ID confusion matrix: labelled lang × heuristic prediction.
    *
    * Staged so each expensive expression evaluates once per row: tokenize
    * -> per-language hit counts as named columns -> CASE over plain
    * columns. (Inlining text.langId would re-tokenize per language per
    * comparison branch — ~12 regex splits/row.)
    */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = docsFanned(s, dir)
      .select($"lang", $"text", text.tokensLower($"text").as("toks"))
      .select($"lang",
        text.stopwordHitsTokens($"toks", text.stopwords("en")).as("en"),
        text.stopwordHitsTokens($"toks", text.stopwords("de")).as("de"),
        text.stopwordHitsTokens($"toks", text.stopwords("fr")).as("fr"),
        text.stopwordHitsTokens($"toks", text.stopwords("es")).as("es"),
        text.cjkCharCount($"text").as("cjk"))
    scored
      .select($"lang",
        when($"cjk" > 0, "zh")
          .when($"en" >= $"de" && $"en" >= $"fr" && $"en" >= $"es", "en")
          .when($"de" >= $"fr" && $"de" >= $"es", "de")
          .when($"fr" >= $"es", "fr")
          .otherwise("es").as("pred"))
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"pred")
  }

  /** Per-document composite quality score. */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"doc_id", $"text", $"n_chars", text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        text.qualityScoreTokens($"text", $"toks", $"n_chars").as("quality"))
      .orderBy($"doc_id")
  }

  /** Token statistics per language: whitespace + BPE-ish counts. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"lang",
        text.wsTokenCount($"text").as("ws"),
        text.bpeTokenCount($"text").as("bpe"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"ws").as("sum_ws_tokens"),
        round(avg($"ws"), 2).as("avg_ws_tokens"),
        sum($"bpe").as("sum_bpe_tokens"),
        round(avg($"bpe"), 2).as("avg_bpe_tokens"))
      .orderBy($"lang")
  }

  /** Normalised-content fingerprint cardinality per source — the
    * dedup-oriented document fingerprint (whitespace-collapsed md5).
    */
  def fingerprintStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"source", text.normalizedFingerprint($"text").as("fp"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_distinct_fp"))
      .orderBy($"source")
  }
}
