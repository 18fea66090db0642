package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expressions for the LLM-data-pipeline surface: token
  * counting, shingling, quality signals, language-ID scoring, document
  * fingerprinting. All pure `Column` compositions (codegen'd, no UDFs) so
  * they vectorise across a 100 TB corpus.
  *
  * Regex classes stay ASCII-explicit (`[A-Za-z]`, `\\s`) to avoid
  * engine-specific unicode-class semantics.
  */
object text {

  /** Whitespace tokens of trimmed, lowercased text; empties removed. */
  def tokensLower(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column = size(tokensLower(c))

  /** BPE-ish subword proxy: alpha runs, digit runs, single symbols. */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeTokenRe)).cast("int")

  /** ASCII-letter / punctuation character counts (unicode-safe: counts
    * regex matches, never relies on length() code-unit semantics).
    * regexp_count, not size(regexp_extract_all): counting must not
    * materialize an array of every match.
    */
  def alphaCharCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]")).cast("int")

  def punctCharCount(c: Column): Column =
    regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("int")

  /** Distinct lowercase word set (for Jaccard near-dup). */
  def distinctTokens(c: Column): Column = array_distinct(tokensLower(c))

  /** Word n-gram shingles. Caller must ensure >= n tokens (guard with
    * wsTokenCount >= n) — `sequence` needs a non-negative range.
    *
    * PERF: pass an already-materialized token COLUMN (shinglesFromTokens),
    * not a raw text column — a lambda body that embeds the tokenizer
    * re-splits the text once per shingle (interpreted higher-order
    * functions don't cache subexpressions across lambda invocations;
    * measured 4.7s -> sub-second on the 5k-doc bench corpus).
    */
  def wordShingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokensLower(c), n)

  /** Shingles over a materialized token array column; empty for docs
    * with fewer than n tokens (a negative sequence bound would otherwise
    * step downward into an invalid slice index).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Normalised content fingerprint: md5 of whitespace-collapsed,
    * lowercased, trimmed text. Stable across incidental formatting.
    */
  def normalizedFingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  // ---- language ID ------------------------------------------------------

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic.
    * Deliberately small and fixed: the point is the distributed scoring
    * shape, not lexicographic completeness.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "je"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "se", "no", "por", "con"))

  /** Count of tokens contained in `words`. */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    stopwordHitsTokens(tokensLower(c), words)

  /** Same over an already-tokenized column — callers scoring several
    * languages should tokenize ONCE and reuse (each embedded tokensLower
    * re-splits the text per language per branch; staging the token column
    * cut the lang-ID bench query ~10x).
    */
  def stopwordHitsTokens(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Count of CJK (BMP unified ideograph) characters. */
  def cjkCharCount(c: Column): Column =
    regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]")).cast("int")

  /** Heuristic language ID over {en,de,fr,es,zh}: CJK presence wins,
    * otherwise argmax of stopword hits with fixed precedence
    * en > de > fr > es (deterministic ties).
    */
  def langId(c: Column): Column =
    langIdFromHits(cjkCharCount(c),
      stopwordHits(c, stopwords("en")), stopwordHits(c, stopwords("de")),
      stopwordHits(c, stopwords("fr")), stopwordHits(c, stopwords("es")))

  /** THE precedence chain over pre-staged hit counts — the single
    * definition shared by [[langId]], `TextOps.langIdConfusion` and
    * `TextOps.filterCascade` (which stage the expensive hit counts as
    * named columns first), so a precedence tweak cannot drift between
    * the confusion matrix and the cascade's lang_match gate.
    */
  def langIdFromHits(cjk: Column, en: Column, de: Column,
                     fr: Column, es: Column): Column =
    when(cjk > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")

  /** Composite quality score in [0,1]: alpha density, low punctuation,
    * English-stopword presence. Denominator is the n_chars column (never
    * length(), whose code-unit semantics differ across engines).
    */
  def qualityScore(textCol: Column, nChars: Column): Column =
    qualityScoreTokens(textCol, tokensLower(textCol), nChars)

  /** Staged variant: callers that already have the token column avoid the
    * double re-tokenization qualityScore embeds.
    */
  def qualityScoreTokens(textCol: Column, toks: Column, nChars: Column): Column = {
    val alphaRatio = alphaCharCount(textCol).cast("double") / nChars
    val punctRatio = punctCharCount(textCol).cast("double") / nChars
    val swRatio = stopwordHitsTokens(toks, stopwords("en")).cast("double") /
      greatest(size(toks), lit(1))
    round(
      lit(0.4) * alphaRatio +
        lit(0.3) * (lit(1.0) - least(punctRatio * 4, lit(1.0))) +
        lit(0.3) * least(swRatio * 5, lit(1.0)),
      4)
  }
}
