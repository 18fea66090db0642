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

  /** Language-ID confusion matrix: labelled lang × heuristic prediction. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"lang", text.langId($"text").as("pred"))
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"pred")
  }

  /** Per-document composite quality score. */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", text.qualityScore($"text", $"n_chars").as("quality"))
      .orderBy($"doc_id")
  }

  /** Token statistics per language: whitespace + BPE-ish counts. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
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
    Tables(s, dir, "documents")
      .select($"source", text.normalizedFingerprint($"text").as("fp"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_distinct_fp"))
      .orderBy($"source")
  }
}
