package graft.operators

import graft.{Sessions, Tables}
import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
        text.langIdFromHits($"cjk", $"en", $"de", $"fr", $"es").as("pred"))
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

  /** Leave-one-source-out influence on corpus quality — the jackknife
    * a data-curation pass runs before negotiating source mixes: for
    * each source, the corpus mean quality recomputed WITHOUT that
    * source, and the delta against the full-corpus mean. A positive
    * delta means dropping the source raises average quality (it drags);
    * ranked worst-drag-first, this is the curation kill list. O(1)
    * arithmetic over per-source aggregates — no per-source rescans, so
    * "what if we dropped source X" costs nothing extra at any corpus
    * size.
    *
    * Determinism: quality (already 4dp by construction) quantizes to
    * 1e-4 longs; every mean is an integer floor-division to 1e-8 units
    * (the datasetCard discipline); deltas subtract already-divided
    * integers, so no negative value reaches a div.
    */
  def sourceInfluence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = docsFanned(s, dir)
      .select($"source", $"text", $"n_chars",
        text.tokensLower($"text").as("toks"))
      .select($"source",
        round(text.qualityScoreTokens($"text", $"toks", $"n_chars")
          * 10000).cast("long").as("qu"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"qu").as("sum_u"))
    val tot = per.agg(sum($"n_docs").as("n"), sum($"sum_u").as("su"))
    per.crossJoin(broadcast(tot))
      .select($"source", $"n_docs",
        expr("sum_u * 10000 div n_docs").as("mean_src_u"),
        expr("su * 10000 div n").as("mean_all_u"),
        expr("(su - sum_u) * 10000 div (n - n_docs)")
          .as("mean_without_u"))
      .withColumn("delta_u", $"mean_without_u" - $"mean_all_u")
      .withColumn("rank", row_number()
        .over(Window.orderBy($"delta_u".desc, $"source")).cast("int"))
      .orderBy($"rank")
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

  /** Exact heavy-hitters: top-k most frequent tokens per language.
    * Token counting is one map-side-combined groupBy (the distinct-token
    * space, not the token stream, reaches the shuffle); the rank window
    * partitions by lang so no single-node sort of the whole vocabulary.
    */
  def topTokensPerLang(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val counts = docsFanned(s, dir)
      .select($"lang", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"tok")
    counts.withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"lang", $"rk", $"tok", $"n")
      .orderBy($"lang", $"rk")
  }

  /** TF-IDF top terms per document: tf = in-doc occurrences, idf =
    * ln(N/df). Two map-side-combined groupBys + a broadcast of the corpus
    * size; scores rounded BEFORE ranking so the order is reproducible
    * across engines (ulp-level double drift cannot flip ranks).
    */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
    val tf = docs
      .select($"doc_id", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("n_tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"tok")
    tf.join(df, "tok").crossJoin(broadcast(total))
      .withColumn("tfidf",
        round($"n_tf" * log($"n_docs".cast("double") / $"df"), 4))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"doc_id", $"rk", $"tok", $"tfidf")
      .orderBy($"doc_id", $"rk")
  }

  /** PII / pattern-scan statistics per source: email, URL, and digit-run
    * match counts — the scrubbing pre-pass of a training-data pipeline
    * (counting here; redaction is the same regexp_replace shape). ASCII
    * regexes only, identical semantics under Java regex and RE2.
    */
  def piiStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hits(re: String): Column =
      regexp_count($"text", lit(re)).cast("int")
    docsFanned(s, dir)
      .select($"source",
        hits("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}").as("emails"),
        hits("https?://[^ \\t\\n]+").as("urls"),
        hits("[0-9]+").as("digit_runs"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"emails").as("n_emails"),
        sum($"urls").as("n_urls"),
        sum($"digit_runs").as("n_digit_runs"))
      .orderBy($"source")
  }

  /** PII scrub MATERIALIZATION — the write-back half of [[piiStats]]
    * (counts alone don't redact a corpus): emails, then URLs, then
    * long digit runs (8+, the phone/account shapes) are replaced with
    * typed placeholder tags, in a fixed order so a URL containing an
    * @-shape is consumed by the email pass first on both engines. Only
    * affected documents emit (the write-back set); patterns are
    * RE2-safe (no lookarounds), so Java and RE2 engines rewrite
    * identically. Scan-speed, stateless, no shuffle.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    piiScrubFrom(docsFanned(s, dir)).orderBy($"doc_id")
  }

  /** The scrub over ANY (doc_id, text) frame — per-row stateless, so
    * batch and synthetic/streaming frames share one definition. Every
    * document emits (clean docs pass through with clean_text = text and
    * zero counts — THIS corpus contains no PII-shaped content at all,
    * so the oracle pins the identity path and the spec proves the
    * redaction path on constructed documents).
    */
  private[graft] def piiScrubFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^ \\t\\n]+"
    val digits = "[0-9]{8,}"
    docs
      .select($"doc_id",
        regexp_count($"text", lit(email)).cast("long").as("n_emails"),
        regexp_count($"text", lit(url)).cast("long").as("n_urls"),
        regexp_count($"text", lit(digits)).cast("long").as("n_digit_runs"),
        regexp_replace(
          regexp_replace(
            regexp_replace($"text", email, "<EMAIL>"),
            url, "<URL>"),
          digits, "<NUMBER>").as("clean_text"))
  }

  /** 60-bit md5 bucket in [0,100) — the engine-portable deterministic
    * hash for split assignment and sampling (same md5-prefix trick as
    * Dedup.tokenHash60, reproducible in any SQL engine).
    */
  private[graft] def hashBucket(c: Column, salt: String): Column =
    hashBucketMod(c, salt, 100L)

  /** Same md5-prefix hash at a caller-chosen granularity (sampling rates
    * finer than 1% need more than 100 buckets).
    */
  private[graft] def hashBucketMod(c: Column, salt: String, mod: Long): Column =
    pmod(conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(mod))

  /** Deterministic train/val/test split by content-independent doc_id
    * hash (80/10/10). Pure per-row expression: at 100 TB the split is a
    * scan-speed projection, stable across reruns and engines, and needs
    * no shuffle or state.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id",
        when($"bucket" < 80, "train").when($"bucket" < 90, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  /** Split-balance chi-square audit: the source × split contingency
    * table with the independence test every eval pipeline should run on
    * its split assignment — a content-independent hash split
    * ([[hashSplit]]) must NOT correlate with source, or per-source eval
    * numbers silently measure split luck instead of model quality.
    * Emits every cell (observed, expected, chi-square contribution)
    * plus the total statistic and Cramér's V repeated per row (the
    * [[Relational.benfordAudit]] shape — a constant-size frame at any
    * corpus size).
    *
    * Determinism: observed/row/column totals are exact longs; each
    * cell's expected count and contribution is one fixed-shape IEEE
    * expression over those longs, pre-rounded to 1e-6 micro-units and
    * summed order-free (the PSI discipline); V derives from the
    * already-rounded chi-square.
    */
  def splitBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"source",
        when($"bucket" < 80, "train").when($"bucket" < 90, "val")
          .otherwise("test").as("split"))
      .groupBy($"split", $"source").agg(count(lit(1)).as("obs"))
    // spine of all (split, source) pairs so empty cells still count
    val splits = cells.select($"split").distinct()
    val sources = cells.select($"source").distinct()
    val full = splits.crossJoin(sources)
      .join(cells, Seq("split", "source"), "left")
      .select($"split", $"source", coalesce($"obs", lit(0L)).as("obs"))
    val rt = full.groupBy($"split").agg(sum($"obs").as("rt"))
    val ct = full.groupBy($"source").agg(sum($"obs").as("ct"))
    val tot = full.agg(sum($"obs").as("n"),
      countDistinct($"split").as("r"),
      countDistinct($"source").as("c"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    full.join(broadcast(rt), Seq("split"))
      .join(broadcast(ct), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("e", ($"rt" * $"ct").cast("double") / $"n")
      .withColumn("contrib_u",
        round(($"obs" - $"e") * ($"obs" - $"e") / $"e" * 1e6)
          .cast("long"))
      .withColumn("chi2", round(sum($"contrib_u").over(all) / 1e6, 4))
      .withColumn("cramers_v",
        round(sqrt($"chi2" / ($"n" * least($"r" - 1, $"c" - 1))
          .cast("double")), 4))
      .select($"split", $"source", $"obs", round($"e", 4).as("expected"),
        round($"contrib_u" / 1e6, 4).as("contrib"), $"chi2", $"cramers_v")
      .orderBy($"split", $"source")
  }

  /** Train/eval decontamination: find training documents sharing word
    * n-grams with the held-out test split (the [[hashSplit]] buckets), so
    * leaked near-copies of eval data can be dropped before training.
    * Blocked on exact n-gram hash — the join only ever sees matching
    * shingles, never the train×eval cross product; at 100 TB the eval
    * side's shingle set is small enough to broadcast.
    */
  def decontamination(s: SparkSession, dir: String, n: Int = 8,
                      minShared: Int = 1): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
    // Single pass: tokenize->shingle->md5->distinct runs ONCE over the
    // union of both splits and is checkpointed; the train and eval sides
    // are then cheap filters over the materialized shingle blocks. (The
    // old two-branch shape re-ran the whole md5/shuffle pipeline from the
    // parquet scan per side — ~40% of the query's work duplicated.)
    // Token array staged BEFORE the shingling HOF: a lambda that embeds
    // the tokenizer re-splits the text once per shingle (text.scala note).
    val sh = docs.filter($"bucket" < 80 || $"bucket" >= 90)
      .select($"doc_id", ($"bucket" < 80).as("is_train"),
        text.tokensLower($"text").as("toks"))
      .select($"doc_id", $"is_train",
        explode(text.shinglesFromTokens($"toks", n)).as("sh"))
      .select($"doc_id", $"is_train", md5($"sh").as("h"))
      .distinct()
      .localCheckpoint()
    val train = sh.filter($"is_train").select($"doc_id".as("train_doc"), $"h")
    val eval_ = sh.filter(!$"is_train").select($"doc_id".as("eval_doc"), $"h")
    train.join(eval_, "h")
      .groupBy($"train_doc", $"eval_doc")
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .filter($"n_shared_ngrams" >= minShared)
      .orderBy($"train_doc", $"eval_doc")
  }

  /** Feature-hashed TF document vectors (the hashing trick, Weinberger
    * et al. 2009): every kept token hashes to one of `dim` buckets with
    * a ±1 sign from its own hash bits, and a document's vector is the
    * signed term-frequency sum per bucket — COSINE semantics over raw
    * text with no trained embedding model and no vocabulary state (the
    * hash IS the vocabulary). Tokens in more than n/`dfCapDenom` of the
    * corpus are dropped first (document-frequency stopword cap —
    * integer-exact, engine-portable, unlike a float idf weight): on
    * this corpus that turns a common-word-dominated unimodal cosine
    * distribution into a clean bimodal dup/non-dup separation. One
    * df aggregation + one vocab-keyed join + one (doc, bucket) groupBy;
    * the dense vector assembles per doc from a map literal — no pivot,
    * no per-dim shuffle. Output (vec_id, v) plugs into every consumer
    * the embedding column has.
    */
  def hashedTfVectors(s: SparkSession, dir: String, dim: Int = 64,
                      dfCapDenom: Int = 10): DataFrame = {
    import s.implicits._
    val tk = docsFanned(s, dir)
      .select($"doc_id", explode(text.tokensLower($"text")).as("tok"))
    val nDocs = tk.select($"doc_id").distinct().count()
    val keptVocab = tk.distinct()
      .groupBy($"tok").agg(count(lit(1)).as("d"))
      .filter($"d" * dfCapDenom <= nDocs)
      .select($"tok")
    tk.join(keptVocab, "tok")
      .select($"doc_id",
        conv(substring(md5(concat(lit("fh:"), $"tok")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .select($"doc_id", pmod($"h", lit(dim.toLong)).as("j"),
        when(pmod(expr(s"h div $dim"), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy($"doc_id", $"j").agg(sum($"sgn").as("x"))
      .groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"j", $"x"))).as("m"))
      .select($"doc_id".as("vec_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          j => coalesce(element_at($"m", j), lit(0L)).cast("double")).as("v"))
  }

  /** Text near-dup by hashed-TF cosine — the third dedup geometry next
    * to Jaccard (MinHash) and Hamming (SimHash): true cosine on sparse
    * term frequencies, caught by the same banded sign-LSH + exact-verify
    * path as the embedding column (`Similarity.bandedPairsCore`), with
    * no model in the loop. Zero vectors (docs whose kept tokens all
    * cancel, or all-stopword docs) drop before banding on both engine
    * and oracle sides.
    *
    * Representation caveat, measured: cosine over TF vectors is only as
    * discriminative as the KEPT vocabulary. This repo's synthetic
    * corpus has ~40 distinct tokens total; at the stress sizes the df
    * cap leaves ~10, every doc keeps ~1 distinct token, vectors
    * collapse onto ~10 one-hot directions, and the ≥0.9 pair output
    * degenerates to the cross-product of those classes (measured 102M
    * pairs at 10x — Θ(output), the join itself stays bucket-bounded).
    * On a real crawl vocabulary (10⁵+ surviving terms) directions are
    * high-entropy and the output is near-dup-sized. The diagnosis query
    * is the class structure itself: groupBy the normalized vector and
    * look for fat classes before trusting TF-cosine on a new corpus.
    */
  def hashedTfNearDupPairs(s: SparkSession, dir: String,
                           threshold: Double = 0.9,
                           planesPerBand: Int = Similarity.AutoPlanes,
                           nBands: Int = 24): DataFrame = {
    import s.implicits._
    val vecs = hashedTfVectors(s, dir)
      .filter(graft.functions.vectors.dot($"v", $"v") > 0)
    // band width from the metadata-cheap doc count (the media-path
    // convention), not a count over the hashed-vector pipeline — 4 at
    // the oracle SFs (the width the SQL hardcodes), wider at stress
    // sizes so bucket occupancy stays constant
    val r = if (planesPerBand > 0) planesPerBand
            else Similarity.autoPlanesPerBand(Tables(s, dir, "documents").count())
    Similarity.bandedPairsCore(vecs, threshold, r, nBands, 64, multiProbe = false)
      .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"), $"cos_sim")
  }

  /** The contamination dashboard: BOTH screens joined per eval doc —
    * exact n-gram overlap ([[decontamination]]) and embedding-space
    * nearest-train cosine (`Similarity.semanticDecontamination`), which
    * catch different leaks (verbatim copies vs paraphrases). One row
    * per held-out doc: how many train docs share ≥1 n-gram, the total
    * shared-gram mass, the nearest-train cosine, and the combined
    * verdict. This is the artifact an eval-suite release actually
    * ships; the split convention (md5 doc-id buckets) is shared by both
    * screens, so the join is total by construction. Cost = the two
    * screens (each scale-audited on its own) + two broadcast-sized
    * joins on the eval population.
    */
  def contaminationReport(s: SparkSession, dir: String, n: Int = 8,
                          threshold: Double = 0.3): DataFrame = {
    import s.implicits._
    val ngram = decontamination(s, dir, n)
      .groupBy($"eval_doc")
      .agg(count(lit(1)).as("n_ngram_train_docs"),
        sum($"n_shared_ngrams").as("n_shared_ngrams"))
    val sem = Similarity.semanticDecontamination(s, dir, threshold)
      .select($"eval_id".as("eval_doc"), $"cos_sim".as("sem_cos"),
        $"contaminated".as("sem_flag"))
    docsFanned(s, dir)
      .select($"doc_id".as("eval_doc"))
      .filter(hashBucket($"eval_doc", "split:") >= 90)
      .join(ngram, Seq("eval_doc"), "left")
      .join(sem, Seq("eval_doc"), "left")
      .select($"eval_doc",
        coalesce($"n_ngram_train_docs", lit(0L)).as("n_ngram_train_docs"),
        coalesce($"n_shared_ngrams", lit(0L)).as("n_shared_ngrams"),
        coalesce($"sem_cos", lit(-9.0)).as("sem_cos"),
        (coalesce($"n_ngram_train_docs", lit(0L)) > 0 ||
          coalesce($"sem_flag", lit(false))).as("flagged"))
      .orderBy($"eval_doc")
  }

  /** Bloom-pruned decontamination: identical output to
    * [[decontamination]], different 100 TB cost shape. The exact form
    * shuffles every distinct train-side shingle into the join — at scale
    * that is the full corpus token stream through the wire even though
    * almost none of it matches. Here the eval split's shingle set
    * (benchmark-suite scale: MBs, not the corpus) is folded once into a
    * `BloomFilter` via `df.stat.bloomFilter` (a tree-aggregated sketch,
    * driver holds only the bits), and the train side probes it
    * scan-side through the native [[graft.functions.expressions.BloomMightContain]]
    * expression BEFORE distinct/shuffle/join — only true matches and an
    * `fpp` fraction of false positives ever leave the scan stage. The
    * surviving sliver joins the eval shingles exactly (md5 key), so
    * false positives drop out and the result matches the un-pruned
    * operator bit for bit: bloom probes have no false negatives.
    *
    * Reference analog: SURVEY §7.4 decontamination, same contract as
    * [[decontamination]] (reference has no equivalent; LLM-pipeline
    * extension surface).
    */
  /** The eval (held-out) split's distinct shingle set: `(eval_doc, h,
    * hb)` — the 64-bit xxhash `hb` feeds the bloom, the 128-bit md5 `h`
    * is the exact-verify join key (same key the un-pruned operator and
    * the oracle use). Checkpointed: consumed by the count, the bloom
    * build, and the verify join, and small by construction.
    */
  private[graft] def evalShingles(s: SparkSession, dir: String,
                                  n: Int): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .filter($"bucket" >= 90)
      .select($"doc_id".as("eval_doc"), text.tokensLower($"text").as("toks"))
      .select($"eval_doc", explode(text.shinglesFromTokens($"toks", n)).as("sh"))
      .select($"eval_doc", md5($"sh").as("h"), xxhash64($"sh").as("hb"))
      .distinct()
      .localCheckpoint()
  }

  /** Serialized bloom filter over the eval split's shingle hashes — the
    * static artifact a streaming ingest gate
    * ([[graft.streaming.Streams.decontaminationGate]]) probes without
    * touching the eval corpus again.
    */
  def evalShingleBloom(s: SparkSession, dir: String, n: Int = 8,
                       fpp: Double = 0.01): Array[Byte] =
    serializeBloom(evalShingles(s, dir, n), fpp)

  private def serializeBloom(evalSh: DataFrame, fpp: Double): Array[Byte] = {
    val expected = math.max(evalSh.count(), 1L)
    val bloom = evalSh.stat.bloomFilter("hb", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  def bloomDecontamination(s: SparkSession, dir: String, n: Int = 8,
                           minShared: Int = 1, fpp: Double = 0.01): DataFrame = {
    import graft.functions.expressions.BloomMightContain
    import org.apache.spark.sql.GraftBridge
    import s.implicits._
    val docs = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
    val evalSh = evalShingles(s, dir, n)
    val bytes = serializeBloom(evalSh, fpp)
    def probe(key: Column): Column = GraftBridge.column(BloomMightContain(
      GraftBridge.expression(lit(bytes)), GraftBridge.expression(key)))
    // Train side: probe per exploded shingle at scan granularity — the
    // distinct (the first shuffle) only ever sees bloom survivors.
    val trainSh = docs.filter($"bucket" < 80)
      .select($"doc_id".as("train_doc"), text.tokensLower($"text").as("toks"))
      .select($"train_doc", explode(text.shinglesFromTokens($"toks", n)).as("sh"))
      .filter(probe(xxhash64($"sh")))
      .select($"train_doc", md5($"sh").as("h"))
      .distinct()
    trainSh.join(evalSh.select($"eval_doc", $"h"), "h")
      .groupBy($"train_doc", $"eval_doc")
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .filter($"n_shared_ngrams" >= minShared)
      .orderBy($"train_doc", $"eval_doc")
  }

  /** Distributed BPE tokenizer training: `k` merge rounds over the
    * corpus word-frequency table (the Sennrich algorithm's shape). The
    * vocabulary — distinct lowercase alphabetic words with counts — is
    * what iterates, so round cost scales with VOCAB size, not corpus
    * size: the corpus is scanned exactly once, like the centroid loop in
    * the IVF trainer. Each round: count adjacent symbol pairs weighted
    * by word frequency (map-side-combined sum), pick the argmax with a
    * deterministic tie-break (count desc, then lexicographic pair), and
    * rewrite every word's symbol string with the merged pair. The merge
    * RULE is a scalar, so collecting one row per round is the natural
    * distributed shape (exactly the k-means-centroid pattern); the
    * rewrite is a plain left-to-right non-overlapping `replace`, whose
    * semantics the oracle reproduces verbatim. Words are spelled as
    * space-joined single letters bracketed by spaces, so a pair match
    * can never cross symbol boundaries. Output: the learned merge table
    * (step, pair, merged, cnt) — the artifact a tokenizer ships.
    */
  def bpeMerges(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val words = docsFanned(s, dir)
      .select(explode(text.tokensLower($"text")).as("word"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
    var vocab = words
      .select(concat(lit(" "),
          concat_ws(" ", expr("regexp_extract_all(word, '[a-z]', 0)")),
          lit(" ")).as("w"),
        $"cnt")
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to k) {
      val best = vocab
        .select(expr("split(trim(w), ' ')").as("a"), $"cnt")
        .filter(size($"a") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(a) - 1)," +
            " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")).as("pr"),
          $"cnt")
        .groupBy($"pr").agg(sum($"cnt").as("total"))
        .orderBy($"total".desc, $"pr")
        .limit(1).collect()(0)
      val pair = best.getString(0)
      val merged = pair.replace(" ", "")
      merges += ((step, pair, merged, best.getLong(1)))
      vocab = vocab
        .select(expr(s"replace(w, ' ${pair} ', ' ${merged} ')").as("w"), $"cnt")
        .localCheckpoint()
    }
    s.createDataFrame(merges.toSeq).toDF("step", "pair", "merged", "cnt")
      .orderBy($"step")
  }

  /** Distributed BPE encode: apply the trained merge table to the corpus.
    *
    * Training ([[bpeMerges]]) produces a k-row scalar merge table; the
    * encode broadcasts it into the expression tree (k literal `replace`
    * calls — the table IS the program) and rewrites every document at
    * scan speed: no shuffle, no UDF, whole-stage codegen end to end.
    * Per document: keep the same `^[a-z]+$` word population training
    * learned from, spell each word as space-joined letters bracketed by
    * spaces, apply the k merges IN STEP ORDER with the same left-to-right
    * non-overlapping `replace` semantics as training (and the oracle),
    * then flatten the per-word symbol runs into the document's token
    * sequence. Word-at-a-time, never whole-document: a single global
    * string rewrite could consume a word-final space and let a later
    * merge match ACROSS a word boundary.
    *
    * Token ids are deterministic from the table alone: letters a–z get
    * 0–25 (their alphabet position), the step-i merged symbol gets 25+i —
    * the id space a tokenizer ships with its merges. Output per doc:
    * `n_tokens` (the count [[Packing]] consumes instead of trusting a
    * generator-provided number) and `ids`, the space-joined id sequence
    * (pins the exact encoding for the oracle hash).
    */
  /** The encode expressions for a trained merge table, shared by the
    * batch encode and the streaming tokenize gate (the table is driver
    * data; the expressions ARE the program). `bpeSymsCol`: text → the
    * document's symbol sequence; `bpeIdFor`: symbol → token id.
    */
  private[graft] def bpeSymsCol(textCol: Column,
                                merges: Seq[(String, String)]): Column = {
    def spell(w: Column): Column =
      concat(lit(" "),
        concat_ws(" ", regexp_extract_all(w, lit("[a-z]"), lit(0))), lit(" "))
    def applyMerges(w: Column): Column =
      merges.foldLeft(w) { case (c, (p, m)) => replace(c, lit(s" $p "), lit(s" $m ")) }
    flatten(transform(
      filter(text.tokensLower(textCol), w => w.rlike("^[a-z]+$")),
      w => split(trim(applyMerges(spell(w))), " ")))
  }

  /** First-match-wins in step order (two distinct pairs can in theory
    * concat to the same merged string); reversed fold puts step 1
    * outermost, mirroring the oracle's CASE branch order.
    */
  private[graft] def bpeIdFor(sym: Column,
                              merges: Seq[(String, String)]): Column =
    merges.zipWithIndex.reverse.foldLeft((ascii(sym) - lit(97)).cast("int")) {
      case (els, ((_, m), i)) => when(sym === m, lit(26 + i)).otherwise(els)
    }

  /** Collect the trained merge table in step order (k driver rows — the
    * artifact the encode broadcasts into its expressions). Train-once
    * memo per (dir, corpus stamp, k): a tokenizer is trained once and
    * applied many times, so every encode consumer in a session reuses
    * the first training run — and the corpus version stamp in the key
    * means a regenerated corpus retrains automatically.
    */
  def bpeMergeTable(s: SparkSession, dir: String, k: Int = 5): Seq[(String, String)] =
    mergeTableMemo.synchronized {
      mergeTableMemo.getOrElseUpdate(
        (dir + "|" + Dedup.corpusStamp(s, dir, "documents"), k), {
        import s.implicits._
        bpeMerges(s, dir, k).orderBy($"step")
          .select($"pair", $"merged").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
      })
    }

  private val mergeTableMemo =
    scala.collection.mutable.Map.empty[(String, Int), Seq[(String, String)]]

  /** Tokenizer vocabulary usage over the encoded corpus: per symbol, its
    * token id, use count, and whether it is a learned merge — the QA
    * rollup a tokenizer ships with its merge table (how much usage the
    * merges actually capture). One scan-speed encode + one map-side-
    * combined groupBy over the bounded symbol space (≤ 26 + k rows).
    */
  def bpeVocabStats(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val merges = bpeMergeTable(s, dir, k)
    docsFanned(s, dir)
      .select(explode(bpeSymsCol($"text", merges)).as("sym"))
      .groupBy($"sym").agg(count(lit(1)).as("n_uses"))
      .select(bpeIdFor($"sym", merges).as("token_id"), $"sym".as("symbol"),
        $"n_uses", (length($"sym") > 1).as("is_merge"))
      .orderBy($"token_id", $"symbol")
  }

  def bpeEncode(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val merges = bpeMergeTable(s, dir, k)
    docsFanned(s, dir)
      .select($"doc_id", $"lang", bpeSymsCol($"text", merges).as("syms"))
      .select($"doc_id", $"lang",
        size($"syms").cast("long").as("n_tokens"),
        concat_ws(" ", transform($"syms", sym => bpeIdFor(sym, merges).cast("string"))).as("ids"))
      .orderBy($"doc_id")
  }

  /** Tokenizer compression ratio per language: letters in / tokens out —
    * THE tokenizer QA number (how many chars one token buys, per lang;
    * a tokenizer trained on one language under-compresses the others,
    * and this is the rollup that shows it). One scan-speed encode + a
    * map-side-combined groupBy over the lang space. The ratio is
    * integer-floor-scaled (×10⁴ div, then one exact double divide) so
    * no float division can straddle a rounding boundary between
    * engines — the `datasetCard` discipline.
    */
  def bpeCompressionStats(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val merges = bpeMergeTable(s, dir, k)
    docsFanned(s, dir)
      .select($"lang", bpeSymsCol($"text", merges).as("syms"))
      .select($"lang", length(concat_ws("", $"syms")).cast("long").as("nl"),
        size($"syms").cast("long").as("nt"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"nl").as("n_letters"),
        sum($"nt").as("n_tokens"))
      .select($"lang", $"n_docs", $"n_letters", $"n_tokens",
        (expr("(n_letters * 10000L) div n_tokens").cast("double") / 10000.0)
          .as("chars_per_token"))
      .orderBy($"lang")
  }

  /** BPE decode + roundtrip audit: ids → symbols → text, the other half
    * of the tokenizer contract ([[bpeEncode]] is only shippable if
    * decode(encode(x)) gives x back). The id→symbol map is the inverse
    * of [[bpeIdFor]], derived from the same driver-side merge table
    * (26+i → step-i merged symbol, 0–25 → the letter); the audit
    * re-spells each document THROUGH the id space and compares against
    * the letters of the trained word population directly. Pure per-row
    * projection — scan speed, no shuffle, no UDF — and the verdict is
    * COMPUTED on both engine and oracle sides, not asserted.
    */
  def bpeRoundtrip(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val merges = bpeMergeTable(s, dir, k)
    def symForId(id: Column): Column =
      merges.zipWithIndex.reverse.foldLeft(char(id + lit(97))) {
        case (els, ((_, m), i)) => when(id === lit(26 + i), lit(m)).otherwise(els)
      }
    docsFanned(s, dir)
      .select($"doc_id", $"text", bpeSymsCol($"text", merges).as("syms"))
      .select($"doc_id",
        size($"syms").cast("long").as("n_tokens"),
        concat_ws("", transform($"syms",
          sym => symForId(bpeIdFor(sym, merges)))).as("decoded"),
        concat_ws("", filter(text.tokensLower($"text"),
          w => w.rlike("^[a-z]+$"))).as("orig"))
      .select($"doc_id", $"n_tokens",
        length($"decoded").cast("long").as("decoded_chars"),
        ($"decoded" === $"orig").as("roundtrip_ok"))
      .orderBy($"doc_id")
  }

  /** Repetition quality signals (the Gopher-style filters): per document,
    * the distinct-token ratio, the most-frequent-token fraction, and the
    * fraction of 2-gram occurrences belonging to a repeated 2-gram. High
    * repetition marks boilerplate/templated docs for dropping before
    * training. Two map-side-combined groupBys over exploded tokens /
    * bigrams — the shuffle carries the per-doc distinct term space, never
    * the raw token stream.
    */
  def repetitionScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
    val tokStats = toks
      .select($"doc_id", explode($"toks").as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max($"n").as("max_n"))
    val gramStats = toks
      .select($"doc_id", explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"),
        sum(when($"c" >= 2, $"c").otherwise(0L)).as("n_dup_grams"))
    tokStats.join(gramStats, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        round($"n_distinct".cast("double") / $"n_tokens", 4).as("distinct_ratio"),
        round($"max_n".cast("double") / $"n_tokens", 4).as("top_tok_frac"),
        round(coalesce($"n_dup_grams", lit(0L)).cast("double") /
          greatest(coalesce($"n_grams", lit(0L)), lit(1L)), 4).as("dup_2gram_frac"))
      .orderBy($"doc_id")
  }

  /** Quality-weighted sampling: each document's keep probability is
    * proportional to its [[text.qualityScoreTokens]] (rate = round(
    * quality·maxRate) percent), decided by the same deterministic
    * md5-bucket predicate as [[hashSplit]] — high-quality docs are
    * oversampled for curation without any sort, reservoir, or driver
    * state. The rate is an integer percent of an already-rounded score,
    * so the keep decision is reproducible across engines and reruns.
    */
  def qualityWeightedSample(s: SparkSession, dir: String,
                            maxRate: Int = 50): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"doc_id", $"text", $"n_chars", text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        text.qualityScoreTokens($"text", $"toks", $"n_chars").as("quality"))
      .withColumn("rate", round($"quality" * maxRate).cast("long"))
      .withColumn("bucket", hashBucket($"doc_id", "qsample:"))
      .filter($"bucket" < $"rate")
      .select($"doc_id", $"quality")
      .orderBy($"doc_id")
  }

  /** Per-domain cap sampling: keep at most `cap` documents per source —
    * the anti-monoculture guard a crawl pipeline applies before anything
    * else sees the data (one mega-domain must not dominate the corpus).
    * Selection within a domain is by the deterministic md5 hash (an
    * unbiased, reproducible draw — NOT first-N, which would bias toward
    * whatever the upstream scan order was), doc_id tie-broken.
    *
    * Exact two-level top-k so a mega-domain never sorts on one task:
    * stage 1 takes the per-(source, salt) top `cap` — 64-way salted, so
    * a 10^9-doc domain spreads over 64 tasks and each emits ≤ cap rows;
    * stage 2 re-ranks the ≤ 64·cap survivors per domain. The global
    * per-domain top-cap is always contained in the union of per-salt
    * top-caps, so the composition is EXACT, not approximate — the
    * standard salted-window remedy, same playbook as
    * `Relational.saltedJoinRevenue`.
    */
  def domainCapSample(s: SparkSession, dir: String, cap: Int = 10): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
      .select($"doc_id", $"source",
        hashBucketMod($"doc_id", "domcap:", 1000000L).as("rank_h"),
        hashBucketMod($"doc_id", "domsalt:", 64L).as("salt"))
    val w1 = Window.partitionBy($"source", $"salt").orderBy($"rank_h", $"doc_id")
    val w2 = Window.partitionBy($"source").orderBy($"rank_h", $"doc_id")
    docs
      .withColumn("rk1", row_number().over(w1)).filter($"rk1" <= cap)
      .withColumn("rk", row_number().over(w2)).filter($"rk" <= cap)
      .select($"doc_id", $"source", $"rk".cast("long").as("rank_in_domain"))
      .orderBy($"doc_id")
  }

  /** Deterministic stratified sampling: per-language keep rates applied
    * via hash threshold (en 10% … zh 50%). The selection is a stateless
    * per-row predicate — no sort, no reservoir, no driver coordination —
    * so it distributes perfectly and is reproducible for audit.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate =
      when($"lang" === "en", 10).when($"lang" === "de", 20)
        .when($"lang" === "fr", 30).when($"lang" === "es", 40)
        .otherwise(50)
    docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "sample:"))
      .filter($"bucket" < rate)
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** Exactly-k-per-language document sample via the bottom-k-by-hash
    * sketch ([[graft.functions.aggregates.BottomK]]): priority =
    * md5-of-id, so the draw is uniform, reproducible, and — because
    * min-k selection is associative — identical at any parallelism.
    * Fixed-size complements the fixed-rate [[stratifiedSample]]; the
    * aggregator shape moves ≤ k rows per (partition, group) into the
    * shuffle where the equivalent row_number window would move and sort
    * every row of the corpus.
    */
  def groupSample(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"lang",
        md5(concat(lit("gsample:"), $"doc_id".cast("string"))).as("p"),
        $"doc_id")
      .as[(String, String, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new graft.functions.aggregates.BottomK(k).toColumn)
      .toDF("lang", "picks")
      .select($"lang", posexplode($"picks"))
      .select($"lang", ($"pos" + 1).cast("long").as("rk"), $"col._2".as("doc_id"))
      .orderBy($"lang", $"rk")
  }

  /** Shannon entropy of the a–z letter distribution per document — a
    * character-level quality signal (low entropy = repeated filler,
    * high = natural mixed text). Letter counts via length-difference
    * after `replace` (each ASCII letter is one length unit in any
    * engine's string semantics, so the difference is exactly the
    * occurrence count — and replace is far cheaper than 26 regex
    * scans). One projection, no shuffle: scan-speed at 100 TB.
    */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val letters = ('a' to 'z').map(_.toString)
    val counts = letters.map(l =>
      (length($"t") - length(translate($"t", l, ""))).cast("long").as(s"c_$l"))
    val staged = docsFanned(s, dir)
      .select($"doc_id", lower($"text").as("t"))
      .select($"doc_id" +: counts: _*)
      .withColumn("n_letters", letters.map(l => col(s"c_$l")).reduce(_ + _))
    val ent = letters.map { l =>
      val p = col(s"c_$l").cast("double") / $"n_letters"
      when(col(s"c_$l") > 0, -p * log(p)).otherwise(lit(0.0))
    }.reduce(_ + _)
    staged
      .select($"doc_id", $"n_letters",
        round(when($"n_letters" > 0, ent).otherwise(lit(0.0)), 4).as("entropy"))
      .orderBy($"doc_id")
  }

  /** Inverted-index build: per token, document frequency and a capped
    * posting list (the `cap` smallest doc_ids). The cap is the scale
    * lever — per-token collected state is bounded regardless of how
    * common the token is (an uncapped collect_list of a stopword's
    * postings is a single-task OOM at 100 TB); full postings would be
    * written sharded, this materializes the index head for the top-k
    * tokens by df.
    */
  def invertedIndex(s: SparkSession, dir: String, cap: Int = 20,
                    k: Int = 50, shards: Int = 64): DataFrame = {
    import s.implicits._
    val dt = docsFanned(s, dir)
      .select($"doc_id", explode(text.distinctTokens($"text")).as("tok"))
    val dfreq = dt.groupBy($"tok").agg(count(lit(1)).as("df"))
    // staged top-k: a stopword's postings would otherwise stream through
    // ONE task's sort. Shard by doc_id first — each (tok, shard) keeps
    // its `cap` smallest (distributed sorts), so the global per-token
    // window sees at most shards·cap survivors, which provably contain
    // the cap smallest doc_ids overall.
    val wShard = Window.partitionBy($"tok", $"shard").orderBy($"doc_id")
    val wTok = Window.partitionBy($"tok").orderBy($"doc_id")
    val capped = dt
      .withColumn("shard", pmod($"doc_id", lit(shards.toLong)))
      .withColumn("rs", row_number().over(wShard)).filter($"rs" <= cap)
      .withColumn("rk", row_number().over(wTok)).filter($"rk" <= cap)
      .groupBy($"tok")
      .agg(array_join(sort_array(collect_list($"doc_id")), ",").as("postings"))
    dfreq.join(capped, Seq("tok"))
      .orderBy($"df".desc, $"tok").limit(k)
      .select($"tok", $"df", $"postings")
  }

  /** Conjunctive keyword search over the corpus: documents containing
    * ALL query terms, ranked by total term frequency. The term filter
    * applies before the shuffle, so only matching token occurrences
    * leave the scan — the distributed twin of an inverted-index lookup
    * (df-bounded, never a corpus-wide sort).
    */
  def keywordSearch(s: SparkSession, dir: String,
                    terms: Seq[String] = Seq("vector", "hash", "spark"),
                    k: Int = 25): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"doc_id", explode(text.tokensLower($"text")).as("tok"))
      .filter($"tok".isInCollection(terms))
      .groupBy($"doc_id")
      .agg(countDistinct($"tok").as("n_terms"), count(lit(1)).as("score"))
      .filter($"n_terms" === terms.size)
      .select($"doc_id", $"score")
      .orderBy($"score".desc, $"doc_id").limit(k)
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones, the +1 idf variant
    * Lucene ships): disjunctive query, per-(doc, term) contribution
    * idf·tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) summed per doc, top-k.
    *
    * Scale shape is the same as [[keywordSearch]]: the term filter cuts
    * the token stream at the scan, so only query-term occurrences ever
    * shuffle — cost is bounded by the query terms' document frequency,
    * never the corpus. The corpus-level constants (N, Σdl) are one
    * metadata-cheap aggregate broadcast into the scoring expression; the
    * per-term df table is query-terms-sized and broadcast likewise.
    *
    * The cross-term sum is fixed-point (contributions rounded to 1e-6
    * then summed as longs) so the result is independent of Spark's
    * partial-aggregation order — the same determinism discipline as the
    * kmeans/centroid oracles.
    */
  def bm25TopK(s: SparkSession, dir: String,
               terms: Seq[String] = Seq("vector", "hash", "spark"),
               k: Int = 25, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = docs
      .select($"doc_id", $"dl", explode($"toks").as("tok"))
      .filter($"tok".isInCollection(terms))
      .groupBy($"doc_id", $"dl", $"tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("tok")).crossJoin(broadcast(stats))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs")
      .withColumn("idf",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("c",
        $"idf" * ($"tf" * lit(k1 + 1.0)) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl")))
      .withColumn("cf", round($"c" * lit(1000000.0)).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"), sum($"cf").as("sf"))
      .select($"doc_id", $"n_terms",
        round($"sf".cast("double") / 1000000.0, 4).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id").limit(k)
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty's
    * classic LM scorer) over the same fixed query terms as [[bm25TopK]]
    * — the second member of the lexical-ranking family, and the one
    * whose smoothing answers "how much does a MISSING term hurt",
    * which BM25 simply zeroes: score(q,d) = Σ_t ln((tf + μ·ctf/C) /
    * (dl + μ)). Every document scores every query term (absent terms
    * included — that is the point of the model), so the plan is a
    * broadcast of the 3-row (ctf, C) frame against the corpus-sized
    * (doc, dl) frame with a left join onto observed tfs — no per-term
    * rescans, one shuffle for the tf rollup. Exactness: each term is
    * ONE fixed-point ln of a ratio of exact integers,
    * (tf·C + μ·ctf)/((dl+μ)·C), all < 2⁵³ so the double quotient is
    * computed from exactly-represented operands on both engines; the
    * top-k is a distributed TakeOrdered on (score_u desc, doc_id),
    * never a global sort.
    */
  def dirichletQlTopK(s: SparkSession, dir: String,
                      terms: Seq[String] = Seq("vector", "hash", "spark"),
                      mu: Long = 2000L, k: Int = 25): DataFrame = {
    import s.implicits._
    val toksDf = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .localCheckpoint() // dl frame and tf/ctf explode both read it
    val dd = toksDf.select($"doc_id", size($"toks").cast("long").as("dl"))
    val tok = toksDf.select($"doc_id", explode($"toks").as("tok"))
      .filter($"tok".isInCollection(terms))
    val tf = tok.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val ctf = tok.groupBy($"tok").agg(count(lit(1)).as("ctf"))
    val tot = dd.agg(sum($"dl").as("c_total"))
    val ord = Window.orderBy($"score_u".desc, $"doc_id")
    dd.crossJoin(broadcast(ctf.crossJoin(tot)))
      .join(tf, Seq("doc_id", "tok"), "left")
      .withColumn("tf0", coalesce($"tf", lit(0L)))
      .withColumn("term_u", round(log(
        ($"tf0" * $"c_total" + lit(mu) * $"ctf").cast("double") /
          (($"dl" + lit(mu)) * $"c_total").cast("double")) * 1e6)
        .cast("long"))
      .groupBy($"doc_id")
      .agg(max($"dl").as("dl"), sum($"term_u").as("score_u"))
      .orderBy($"score_u".desc, $"doc_id").limit(k)
      .withColumn("rank", row_number().over(ord).cast("int"))
      .select($"rank", $"doc_id", $"dl", $"score_u")
      .orderBy($"rank")
  }

  /** CART decision stump on n_chars predicting lang = 'en': the
    * exact best single split by weighted Gini impurity — the root
    * node every tree ensemble grows first, and the one-line "is doc
    * length alone a language signal" audit. The candidate set is the
    * distinct n_chars values (one groupBy, then BOTH cumulative series
    * — counts and positives — through ONE range-partitioned two-pass
    * [[graft.operators.Relational.globalPrefixSums]], so no task ever
    * sorts the full distinct-value frame: n_chars cardinality is
    * data-dependent, and a single-partition window over it would be
    * the one unbounded frame in the audit path); the objective is the
    * fixed-point weighted impurity
    * cost_u9 = N·10⁹ − ⌊(posL²+negL²)·10⁹/nL⌋ − ⌊(posR²+negR²)·10⁹/nR⌋
    * in DECIMAL(38,0) (the squared counts overflow long past ~sf0.1),
    * with truncating division both engines share — so the argmin is
    * engine-exact by construction; ties break to the smallest
    * threshold via min(struct). Output: the chosen split, its side
    * tallies, the root impurity and the Gini gain.
    */
  def giniStump(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val byVal = Tables(s, dir, "documents")
      .groupBy($"n_chars")
      .agg(count(lit(1)).as("cnt"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"))
    // inclusive cumulative = exclusive global prefix + own cell, both
    // series in one range-partitioned pass — no single-task sort of the
    // distinct-value frame
    val cum = Relational
      .globalPrefixSums(byVal, Seq($"n_chars"),
        Seq(($"cnt", "_pc"), ($"pos", "_pp")))
      .withColumn("nl", $"_pc" + $"cnt")
      .withColumn("posl", $"_pp" + $"pos")
      .drop("_pc", "_pp")
      .localCheckpoint() // totals and the candidate scan read it
    val tot = cum.agg(max($"nl").as("n"), max($"posl").as("p"))
    val cand = cum.crossJoin(broadcast(tot))
      .filter($"nl" < $"n") // right side must be non-empty
      .withColumn("negl", $"nl" - $"posl")
      .withColumn("nr", $"n" - $"nl")
      .withColumn("posr", $"p" - $"posl")
      .withColumn("negr", $"nr" - $"posr")
      .withColumn("cost_u9", expr(
        s"""CAST(n AS $dec) * 1000000000
           - (CAST(posl AS $dec) * posl + CAST(negl AS $dec) * negl)
             * 1000000000 div nl
           - (CAST(posr AS $dec) * posr + CAST(negr AS $dec) * negr)
             * 1000000000 div nr"""))
    cand
      .groupBy()
      .agg(min(struct($"cost_u9", $"n_chars", $"nl", $"posl", $"nr",
        $"posr")).as("m"), max($"n").as("n_docs"), max($"p").as("n_en"))
      .select($"m.n_chars".as("threshold"), $"m.nl".as("n_left"),
        $"m.posl".as("pos_left"), $"m.nr".as("n_right"),
        $"m.posr".as("pos_right"), $"m.cost_u9".as("cost_u9"),
        $"n_docs", $"n_en")
      .withColumn("root_u9", expr(
        s"""CAST(n_docs AS $dec) * 1000000000
           - (CAST(n_en AS $dec) * n_en
              + CAST(n_docs - n_en AS $dec) * (n_docs - n_en))
             * 1000000000 div n_docs"""))
      .withColumn("gain_u9", $"root_u9" - $"cost_u9")
      // impurity costs are ≤ n_docs·10⁹ (~6e17 even at sf100) — inside
      // int64; DECIMAL(38,0) stays internal-accumulation-only
      .withColumn("cost_u9",
        graft.functions.num.toLongChecked($"cost_u9", "cost_u9"))
      .withColumn("root_u9",
        graft.functions.num.toLongChecked($"root_u9", "root_u9"))
      .withColumn("gain_u9",
        graft.functions.num.toLongChecked($"gain_u9", "gain_u9"))
  }

  /** Split-conformal calibration of a token-count predictor — the
    * distribution-free uncertainty recipe (Vovk; Lei et al.) a
    * pipeline runs before trusting ANY per-doc estimate: fit a cheap
    * model on the train split (here OLS tokens ~ chars in exact
    * fixed point), take the ⌈(n+1)(1−α)⌉-th order statistic of the
    * calibration split's absolute residuals as q̂, and the interval
    * ŷ ± q̂ covers ≥ 1−α of exchangeable test docs — a theorem, not a
    * hope, and the test-split coverage ships alongside so the
    * guarantee is AUDITED data. Everything is integer: the fixed-point
    * OLS (theilSenTrend shift-division discipline), residuals in
    * micro-tokens, the quantile an exact rank pick with doc_id
    * tie-break, coverage in exact basis points. The calibration rank
    * window rides the cal split only; scores are a scan-speed
    * projection at any corpus size.
    */
  def conformalCalibration(s: SparkSession, dir: String,
                           alphaBp: Long = 1000L): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val d = docsFanned(s, dir)
      .select($"doc_id", $"n_chars",
        size(text.tokensLower($"text")).cast("long").as("toks"))
      .withColumn("bucket", hashBucketMod($"doc_id", "split:", 100L))
      .localCheckpoint() // train OLS, cal scores, test coverage read it
    val ols = d.filter($"bucket" < 80)
      .agg(count(lit(1)).as("n_train"), sum($"n_chars").as("sx"),
        sum($"toks").as("sy"),
        sum(($"n_chars" * $"toks").cast(dec)).as("sxy"),
        sum(($"n_chars" * $"n_chars").cast(dec)).as("sxx"))
      .withColumn("num",
        expr(s"CAST(n_train AS $dec) * sxy - CAST(sx AS $dec) * sy"))
      .withColumn("den",
        expr(s"CAST(n_train AS $dec) * sxx - CAST(sx AS $dec) * sx"))
      .withColumn("b_u", expr(
        "CAST((num * 1000000 + 2000000000000000 * den) div den" +
        " - 2000000000000000 AS BIGINT)"))
      .withColumn("a_u", expr(
        s"CAST((CAST(sy AS $dec) * 1000000 - CAST(b_u AS $dec) * sx" +
        s" + 2000000000000000 * CAST(n_train AS $dec)) div n_train" +
        " - 2000000000000000 AS BIGINT)"))
      .select($"n_train", $"b_u", $"a_u")
    def score(df: DataFrame) = df.crossJoin(broadcast(ols))
      .withColumn("s_u",
        abs($"toks" * lit(1000000L) - $"a_u" - $"b_u" * $"n_chars"))
    val cal = score(d.filter($"bucket" >= 80 && $"bucket" < 90))
    val nCal = cal.count()
    val kRank = math.min(
      ((nCal + 1) * (10000 - alphaBp) + 9999) / 10000, nCal)
    // the ⌈(n+1)(1−α)⌉-th order statistic via the range-partitioned
    // global rank — the cal split is a corpus fraction, so a bare
    // Window.orderBy here would sort it on ONE task
    val qHat = Relational.globalRowNumber(cal, Seq($"s_u", $"doc_id"))
      .filter($"rk" === kRank)
      .select($"s_u".as("q_hat"))
    score(d.filter($"bucket" >= 90)).crossJoin(broadcast(qHat))
      .agg(count(lit(1)).as("n_test"),
        sum(when($"s_u" <= $"q_hat", 1L).otherwise(0L)).as("n_covered"),
        max($"q_hat").as("q_hat"))
      .crossJoin(broadcast(ols))
      .withColumn("n_cal", lit(nCal))
      .withColumn("k_rank", lit(kRank))
      .withColumn("coverage_bp", expr("n_covered * 10000 div n_test"))
      .withColumn("target_bp", lit(10000L - alphaBp))
      .select($"n_train", $"n_cal", $"n_test", $"b_u", $"a_u",
        $"k_rank", $"q_hat", $"n_covered", $"coverage_bp", $"target_bp")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * the A-ES one-pass scheme): each doc draws a deterministic uniform
    * u ∈ (0,1] from its md5 hash and competes with key u^(1/w) — the
    * top-n keys are EXACTLY a weighted sample without replacement, the
    * result [[qualityWeightedSample]]'s per-doc Bernoulli thresholding
    * cannot give (that draws a rate, not a fixed-size sample). One scan
    * computes keys; the top-n is Spark's distributed TakeOrdered (per-
    * partition heads, never a global sort) — the canonical "give me
    * exactly n docs, quality-weighted" at any corpus size. Keys are
    * ranked at fixed 1e-6 granularity (doc_id ties) so a last-ulp pow()
    * difference cannot reorder engines.
    */
  def weightedSampleES(s: SparkSession, dir: String, n: Int = 100): DataFrame = {
    import s.implicits._
    val keyed = docsFanned(s, dir)
      .select($"doc_id", $"text", $"n_chars",
        text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        text.qualityScoreTokens($"text", $"toks", $"n_chars").as("w"),
        ((hashBucketMod($"doc_id", "aes:", 1000000L) + 1).cast("double")
          / 1000001.0).as("u"))
      .filter($"w" > 0.0) // zero weight = never sampled (and no 1/0)
      .select($"doc_id", $"w",
        round(pow($"u", lit(1.0) / $"w") * 1000000.0).cast("long").as("key_u"))
    val byKey = Window.orderBy($"key_u".desc, $"doc_id")
    keyed
      .orderBy($"key_u".desc, $"doc_id").limit(n)
      .withColumn("rk", row_number().over(byKey).cast("int"))
      .select($"rk", $"doc_id", $"w", $"key_u")
      .orderBy($"rk")
  }

  /** Persist the term index `(tok, doc_id, tf)` BUCKETED by token — the
    * text twin of the stored band/PQ/IVF artifacts: the corpus-sized
    * tokenize+count happens once at build, and a query-time term filter
    * prunes the scan to the terms' buckets (Spark bucket pruning fires
    * on In/EqualTo over the bucket column), so per-query cost scales
    * with the query terms' document frequency, never the corpus.
    */
  def writeTermIndex(s: SparkSession, dir: String, table: String,
                     nBuckets: Int = 16): Unit = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"doc_id", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"tok", $"doc_id").agg(count(lit(1)).as("tf"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "tok").sortBy("tok")
      .saveAsTable(table)
  }

  /** Build-once memo for the stored term index (the band/PQ/IVF memo
    * contract: first use per (dir, corpus stamp) writes, later queries
    * read).
    */
  private[graft] def termIndexFor(s: SparkSession, dir: String): DataFrame = {
    val key = Seq(dir, Dedup.corpusStamp(s, dir, "documents"), "terms")
      .mkString("|")
    val table = "graft_term_index_" + java.security.MessageDigest
      .getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    Dedup.indexBuildLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        Dedup.dropStaleLocation(s, table)
        writeTermIndex(s, dir, table)
      }
    }
    s.table(table)
  }

  /** [[keywordSearch]] served from the STORED term index — identical
    * output (one oracle pins both): the conjunctive filter reads only
    * the query terms' buckets (bucket pruning, spec-asserted), the
    * per-doc aggregation sees df-bounded rows, and no tokenizer runs at
    * query time. `sum(tf)` reproduces the recompute path's
    * per-occurrence score exactly.
    */
  def keywordSearchIndexed(s: SparkSession, dir: String,
                           terms: Seq[String] = Seq("vector", "hash", "spark"),
                           k: Int = 25): DataFrame = {
    import s.implicits._
    termIndexFor(s, dir)
      .filter($"tok".isInCollection(terms))
      .groupBy($"doc_id")
      .agg(countDistinct($"tok").as("n_terms"), sum($"tf").as("score"))
      .filter($"n_terms" === terms.size)
      .select($"doc_id", $"score")
      .orderBy($"score".desc, $"doc_id").limit(k)
  }

  /** The feature-hashing token hash (md5-prefix, "fh:" salt) replicated
    * driver-side — the ONE definition the query-vector literal in
    * [[hybridRrfTopK]] and the oracle generator both read, so the query
    * embedding can never drift from [[hashedTfVectors]]' doc-side hash.
    */
  private[graft] def fhHash60(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(("fh:" + tok).getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** The query-term hashed vector + its norm for [[hybridRrfTopK]] —
    * shared with the oracle generator.
    */
  private[graft] def fhQueryVector(terms: Seq[String], dim: Int = 64)
      : Array[Double] = {
    val q = new Array[Double](dim)
    terms.foreach { t =>
      val h = fhHash60(t)
      q((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1.0 else -1.0)
    }
    q
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
    * a lexical run (BM25 over the query terms) and a vector run (cosine
    * of each doc's hashed-TF vector against the hashed query vector) are
    * fused by RRF score Σ 1/(60 + rank) — the standard two-tower search
    * front-end, robust to either run's score scale. Ranks come from each
    * run's top-`pool` candidates only (fusion over retrieved lists, as
    * deployed systems do): both pools are TakeOrdered results, so no
    * global rank of the corpus ever materializes, and the fusion join
    * holds ≤ 2·pool rows. RRF contributions are integer floor divisions
    * (1e6 // (60+rank)) — exact in any engine.
    *
    * Scale: BM25's cost is df-bounded by the term filter at the scan;
    * the vector run is one broadcast-query scan over the (already
    * df-capped) hashed vectors; fusion is driver-trivial.
    */
  def hybridRrfTopK(s: SparkSession, dir: String,
                    terms: Seq[String] = Seq("vector", "hash", "spark"),
                    k: Int = 25, pool: Int = 50, kRrf: Int = 60): DataFrame = {
    import s.implicits._
    val byA = Window.orderBy($"bm25".desc, $"doc_id")
    val a = bm25TopK(s, dir, terms, pool)
      .withColumn("rank_a", row_number().over(byA).cast("long"))
      .select($"doc_id", $"rank_a")
    val q = fhQueryVector(terms)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val qArr = array(q.toSeq.map(lit): _*)
    val vecs = hashedTfVectors(s, dir)
      .filter(graft.functions.vectors.dot($"v", $"v") > 0)
      .select($"vec_id".as("doc_id"),
        round(graft.functions.vectors.dot($"v", qArr)
          / (graft.functions.vectors.l2Norm($"v") * lit(qNorm)), 4)
          .as("cos_q"))
    val byB = Window.orderBy($"cos_q".desc, $"doc_id")
    val b = vecs.orderBy($"cos_q".desc, $"doc_id").limit(pool)
      .withColumn("rank_b", row_number().over(byB).cast("long"))
      .select($"doc_id", $"rank_b")
    val byRrf = Window.orderBy($"rrf_u".desc, $"doc_id")
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"1000000 div ($kRrf + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($kRrf + rank_b)"), lit(0L)))
      .orderBy($"rrf_u".desc, $"doc_id").limit(k)
      .withColumn("rk", row_number().over(byRrf).cast("int"))
      .select($"rk", $"doc_id", $"rank_a", $"rank_b", $"rrf_u")
      .orderBy($"rk")
  }

  /** Rank-biased-overlap depth weights (1-p)·p^(d-1), pre-scaled to
    * 1e-8 integers ON THE DRIVER. Both the Spark plan and the oracle
    * SQL consume these longs as literals, so neither engine ever
    * evaluates pow() — the classic libm-divergence hole in cross-engine
    * geometric weights is closed by construction.
    */
  private[graft] def rboWeightsU(depth: Int, pMilli: Int): Seq[Long] = {
    val p = pMilli / 1000.0
    (1 to depth).map(d => math.round((1 - p) * math.pow(p, d - 1) * 1e8))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    * two scorers' ORDERINGS of one candidate pool — the top-weighted
    * rank-agreement measure a retrieval stack monitors when it changes
    * scoring functions: here BM25 (idf-weighted, tf-saturated,
    * length-normalized) against the naive term-frequency density it
    * refines, over BM25's own top-`depth` pool. Ranking the SAME pool
    * under both scorers (instead of two independent top-k cuts) keeps
    * the measure about rank agreement — disjoint candidate sets would
    * score 0 identically at every depth and say nothing. Emits the full
    * depth profile: overlap@d, agreement A_d in basis points, the
    * geometric weight, the term contribution, and the running truncated
    * RBO in 1e-8 units.
    *
    * Determinism: BM25 ranks on its 4dp-rounded fixed-point sum (the
    * [[bm25TopK]] discipline); density is the pure-integer
    * tf·10^6 div dl; overlap counts are integers, weights are
    * driver-side literal longs ([[rboWeightsU]]), and every derived
    * column is integer floor-division — no float comparison anywhere.
    *
    * Shape at scale: the scan is [[bm25TopK]]'s (term filter at the
    * scan, cost bounded by query-term df); everything after the top-
    * `depth` cut operates on ≤ depth² rows — constant-size regardless
    * of corpus.
    */
  /** The (doc_id, bm25, dens_u) score frame shared by [[rboOverlap]]
    * and [[ndcgAudit]] — factored so the two rank-comparison metrics
    * can never drift on what they rank.
    */
  private def bm25DensScored(s: SparkSession, dir: String,
                             terms: Seq[String], k1: Double,
                             b: Double): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = docs
      .select($"doc_id", $"dl", explode($"toks").as("tok"))
      .filter($"tok".isInCollection(terms))
      .groupBy($"doc_id", $"dl", $"tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs")
      .withColumn("idf",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("c",
        $"idf" * ($"tf" * lit(k1 + 1.0)) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl")))
      .withColumn("cf", round($"c" * lit(1000000.0)).cast("long"))
      .groupBy($"doc_id", $"dl")
      .agg(sum($"cf").as("sf"), sum($"tf").as("tf_sum"))
      .select($"doc_id",
        round($"sf".cast("double") / 1000000.0, 4).as("bm25"),
        expr("tf_sum * 1000000 div dl").as("dens_u"))
  }

  def rboOverlap(s: SparkSession, dir: String,
                 terms: Seq[String] = Seq("vector", "hash", "spark"),
                 depth: Int = 25, pMilli: Int = 900,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import s.implicits._
    val scored = bm25DensScored(s, dir, terms, k1, b)
    val pool = scored.orderBy($"bm25".desc, $"doc_id").limit(depth)
      .localCheckpoint()
    val a = pool
      .withColumn("rank_a", row_number()
        .over(Window.orderBy($"bm25".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"rank_a")
    val bRun = pool
      .withColumn("rank_b", row_number()
        .over(Window.orderBy($"dens_u".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"rank_b")
    val m = a.join(bRun, Seq("doc_id"))
      .select(greatest($"rank_a", $"rank_b").as("m"))
    val wDf = s.createDataFrame(
        rboWeightsU(depth, pMilli).zipWithIndex
          .map { case (wu, i) => (i + 1, wu) })
      .toDF("depth", "w_u")
    val spine = s.range(1, depth + 1).select($"id".cast("int").as("depth"))
    spine.join(m, $"m" <= $"depth", "left")
      .groupBy($"depth").agg(count($"m").as("n_overlap"))
      .join(broadcast(wDf), Seq("depth"))
      .withColumn("agree_bp", expr("n_overlap * 10000 div depth"))
      .withColumn("term_u", expr("w_u * n_overlap div depth"))
      .withColumn("rbo_u", sum($"term_u").over(Window.orderBy($"depth")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"depth", $"n_overlap", $"agree_bp", $"w_u", $"term_u",
        $"rbo_u")
      .orderBy($"depth")
  }

  /** nDCG@k discount weights round(10⁹/log₂(i+1)) — driver-computed
    * once and injected as identical literals into both engines (the
    * [[rboWeightsU]] discipline), so neither engine evaluates log₂ at
    * query time.
    */
  private[graft] def ndcgWeightsU(k: Int): Seq[(Int, Long)] =
    (1 to k).map(i =>
      i -> math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))

  /** nDCG@k of the TF-density ranking against BM25 as graded relevance
    * gold: the position-discounted complement of [[rboOverlap]]'s
    * set-overlap profile — RBO says how much the prefixes agree, nDCG
    * says how much a ranking mistake at position i actually costs
    * (log-discounted), which is the number a retrieval dashboard
    * publishes. The BM25 top-k pool gets graded relevance k−rank+1;
    * discounts are the [[ndcgWeightsU]] driver literals; DCG and the
    * ideal DCG are exact integer dot products, nDCG one basis-point
    * floor division. Per-doc rows expose each position's contribution;
    * the scalars repeat per row (the splitBalance shape).
    */
  def ndcgAudit(s: SparkSession, dir: String,
                terms: Seq[String] = Seq("vector", "hash", "spark"),
                k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import s.implicits._
    val pool = bm25DensScored(s, dir, terms, k1, b)
      .orderBy($"bm25".desc, $"doc_id").limit(k)
      .localCheckpoint()
    val wDf = s.createDataFrame(ndcgWeightsU(k)).toDF("pos", "w_u")
    val a = pool
      .withColumn("rank_gold", row_number()
        .over(Window.orderBy($"bm25".desc, $"doc_id")))
      .select($"doc_id", $"rank_gold", (lit(k) - $"rank_gold" + 1)
        .cast("long").as("rel"))
    val bRun = pool
      .withColumn("rank_eval", row_number()
        .over(Window.orderBy($"dens_u".desc, $"doc_id")))
      .select($"doc_id", $"rank_eval")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    a.join(bRun, Seq("doc_id"))
      .join(broadcast(wDf.select($"pos".as("rank_eval"), $"w_u")),
        Seq("rank_eval"))
      .join(broadcast(wDf.select($"pos".as("rank_gold"),
        $"w_u".as("w_gold_u"))), Seq("rank_gold"))
      .withColumn("contrib", $"rel" * $"w_u")
      .withColumn("dcg_num", sum($"contrib").over(all))
      .withColumn("idcg_num", sum($"rel" * $"w_gold_u").over(all))
      .select($"doc_id", $"rank_gold", $"rank_eval", $"rel", $"w_u",
        $"contrib", $"dcg_num", $"idcg_num",
        expr("dcg_num * 10000 div idcg_num").as("ndcg_bp"))
      .orderBy($"rank_gold")
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS document-fingerprinting algorithm): hash
    * every k-token shingle, slide a window of `w` consecutive hashes,
    * and SELECT each window's minimum, rightmost on ties. The paper's
    * guarantee carries over verbatim: any token run of length ≥ w+k−1
    * shared by two documents contributes at least one selected
    * fingerprint to BOTH — so matching on the selected set (expected
    * density 2/(w+1)) never misses a long shared passage, at a fraction
    * of the full shingle index's size.
    *
    * Cross-engine determinism: the (hash, rightmost-position) argmin is
    * encoded as ONE sortable string key — md5-hex ‖ zero-padded
    * (10⁹ − pos) — so a plain min() window aggregate performs the
    * selection identically in Spark and the SQL oracle; no
    * min_by/tie-break seam between engines.
    *
    * Scale: selection is a single window function over (doc_id, pos) —
    * one shuffle key, O(w) frame per row; everything downstream sees
    * only the ~2/(w+1)-density selected set.
    */
  private[graft] def winnowSelectedFrom(docs: DataFrame, k: Int,
                                        w: Int): DataFrame = {
    val g = docs
      .select(col("doc_id"),
        posexplode(text.shinglesFromTokens(text.tokensLower(col("text")), k)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), md5(col("col")).as("h"))
    val key = concat(col("h"),
      lpad((lit(1000000000) - col("pos")).cast("string"), 10, "0"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    g.withColumn("sk", min(key).over(frame))
      .filter(col("pos") >= w)
      .select(col("doc_id"), substring(col("sk"), 1, 32).as("h"),
        (lit(1000000000) - substring(col("sk"), 33, 10).cast("long")).as("pos"))
      .distinct()
  }

  private[graft] def winnowSelected(s: SparkSession, dir: String, k: Int,
                                    w: Int): DataFrame =
    winnowSelectedFrom(docsFanned(s, dir), k, w)

  /** Per-document winnowing profile: shingle count, selected-fingerprint
    * count, and selection density in basis points — the sizing read
    * (expected density 2/(w+1) ≈ 4000 bp at w=4) taken before building
    * the fingerprint index. Docs with fewer than `w` shingles select
    * nothing and drop, mirroring the windowed selection's domain.
    */
  def winnowFingerprints(s: SparkSession, dir: String, k: Int = 4,
                         w: Int = 4): DataFrame = {
    import s.implicits._
    val sel = winnowSelected(s, dir, k, w)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_selected"))
    docsFanned(s, dir)
      .select($"doc_id",
        (size(text.tokensLower($"text")) - k + 1).cast("long").as("n_grams"))
      .filter($"n_grams" >= w)
      .join(sel, "doc_id")
      .select($"doc_id", $"n_grams", $"n_selected",
        expr("n_selected * 10000 div n_grams").as("density_bp"))
      .orderBy($"doc_id")
  }

  /** MOSS-style match pairs over the winnowed fingerprint sets: documents
    * sharing ≥ `minShared` distinct selected fingerprints, scored by
    * containment against the smaller set. Fingerprints selected by more
    * than `maxDf` documents are dropped before pairing (the paper's
    * over-common-fingerprint screen — boilerplate k-grams would
    * otherwise pair everything with everything); the remaining bucket
    * join is df-bounded, never corpus².
    */
  def winnowPairs(s: SparkSession, dir: String, k: Int = 4, w: Int = 4,
                  maxDf: Long = 50L, minShared: Long = 2L): DataFrame = {
    import s.implicits._
    // (doc, fingerprint) support set — df screen + both join sides + the
    // per-doc counts all read it, so materialize the windowed selection once
    val sel = winnowSelected(s, dir, k, w)
      .select($"doc_id", $"h").distinct().localCheckpoint()
    val matchable = sel.groupBy($"h")
      .agg(count(lit(1)).as("df"))
      .filter($"df" >= 2 && $"df" <= maxDf)
      .select($"h")
    val sh = sel.join(matchable, "h")
    val counts = sel.groupBy($"doc_id").agg(count(lit(1)).as("n_sel"))
    sh.alias("a")
      .join(sh.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .join(counts.select($"doc_id".as("doc_a"), $"n_sel".as("na")), "doc_a")
      .join(counts.select($"doc_id".as("doc_b"), $"n_sel".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b", $"n_shared",
        expr("n_shared * 10000 div least(na, nb)").as("containment_bp"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Persist the winnowed fingerprint set as a bucketed table keyed by
    * fingerprint hash — the stored index the streaming probe
    * (`Streams.winnowProbeSink`) joins arriving documents against. Only
    * the ~2/(w+1)-density selected set is stored (the winnowing win over
    * a full shingle index), and the (h)-bucketed layout means probe
    * joins never shuffle the index side.
    */
  def writeWinnowIndex(s: SparkSession, dir: String, table: String,
                       k: Int = 4, w: Int = 4, nBuckets: Int = 8): Unit =
    writeWinnowIndexFrom(docsFanned(s, dir), table, k, w, nBuckets)

  /** [[writeWinnowIndex]] over an arbitrary (doc_id, text) frame —
    * e.g. a corpus slice standing in for "everything indexed so far".
    */
  def writeWinnowIndexFrom(docs: DataFrame, table: String, k: Int = 4,
                           w: Int = 4, nBuckets: Int = 8): Unit =
    winnowSelectedFrom(docs, k, w)
      .select(col("doc_id"), col("h")).distinct()
      .write.mode("overwrite")
      .bucketBy(nBuckets, "h").sortBy("h")
      .saveAsTable(table)

  /** Build-once memo for the stored winnow index (the
    * `Dedup.bandIndexFor` convention: name keyed on dir + corpus stamp +
    * scheme + index predicate, so distinct corpora, schemes and slices
    * never collide).
    */
  private[graft] def winnowIndexFor(s: SparkSession, dir: String,
                                    indexPred: Column = lit(true),
                                    k: Int = 4, w: Int = 4): DataFrame = {
    val key = Seq(dir, Dedup.corpusStamp(s, dir, "documents"),
      "winnow", indexPred.toString, k, w).mkString("|")
    val table = "graft_winnow_index_" + java.security.MessageDigest
      .getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    Dedup.indexBuildLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        Dedup.dropStaleLocation(s, table)
        writeWinnowIndexFrom(docsFanned(s, dir).filter(indexPred), table, k, w)
      }
    }
    s.table(table)
  }

  /** Incremental winnow match probe: a NEW ingest batch winnowed fresh
    * (cost scales with the batch — per-doc selection is independent of
    * the rest of the corpus, which is exactly what makes the index
    * precomputable) and joined against the STORED h-bucketed fingerprint
    * index of everything already ingested. The batch member of the
    * winnow family — the streaming twin is `Streams.winnowProbeSink`,
    * and both inherit the w+k−1 shared-run guarantee from the batch
    * selection they reuse. The index side reads shuffle-free on its
    * bucketing (spec-asserted); only the batch moves.
    */
  def winnowIncrementalPairs(s: SparkSession, dir: String,
                             batchPred: Column = col("doc_id") % 4 === 3,
                             k: Int = 4, w: Int = 4,
                             minShared: Long = 2L): DataFrame = {
    import s.implicits._
    val index = winnowIndexFor(s, dir, !batchPred, k, w)
    winnowSelectedFrom(docsFanned(s, dir).filter(batchPred), k, w)
      .select($"doc_id".as("new_doc"), $"h").distinct()
      .join(index.select($"doc_id".as("index_doc"), $"h"), Seq("h"))
      .groupBy($"new_doc", $"index_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .orderBy($"new_doc", $"index_doc")
  }

  /** Tokenizer fertility per language (Rust et al. 2021; the BLOOM
    * tokenizer-audit metric): subword tokens emitted per word, and
    * characters per subword token, for the corpus' trained BPE — the
    * screen that says which languages the tokenizer serves poorly (high
    * fertility = more sequence length spent per word = less effective
    * context and more compute for the same text). Runs over exactly the
    * word population the trainer saw ([[bpeEncode]]'s `^[a-z]+$`
    * filter), in integer basis points off exact token/char counts.
    */
  def bpeFertility(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val merges = bpeMergeTable(s, dir, k)
    docsFanned(s, dir)
      .select($"lang",
        size(filter(text.tokensLower($"text"), w => w.rlike("^[a-z]+$")))
          .cast("long").as("nw"),
        size(bpeSymsCol($"text", merges)).cast("long").as("nt"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"nw").as("n_words"),
        sum($"nt").as("n_tokens"))
      .filter($"n_words" > 0)
      // integer-floor-scaled ratio, one exact double divide at the end —
      // the datasetCard discipline (no float division boundary risk)
      .select($"lang", $"n_docs", $"n_words", $"n_tokens",
        (expr("(n_tokens * 10000) div n_words").cast("double") / 10000.0)
          .as("tokens_per_word"))
      .orderBy($"lang")
  }

  /** Cross-document duplicated-span scrub (the span-level exact dedup of
    * Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better"): token positions covered by any `n`-gram that ALSO occurs
    * in another document are cut; per affected document the operator
    * reports token count, merged removed-span count, removed and kept
    * token totals — whole-doc dedup misses boilerplate headers/footers
    * and quoted passages embedded in otherwise-unique pages, which is
    * exactly what this catches. (The suffix-array of the paper is a
    * single-machine structure; the distributed equivalent is this
    * hash-blocked n-gram occurrence join — same duplicated-substring
    * semantics at n-gram granularity.)
    *
    * Shape: one token-explode builds the occurrence list; duplicated
    * shingles come from a shingle-keyed count (vocab-bounded, like the
    * decontamination block join); interval merging is gaps-and-islands
    * over (doc_id, start) windows — one shuffle key end to end, no
    * self-join, no per-pair work: cost scales with occurrences of
    * duplicated shingles, never the corpus².
    */
  def spanScrub(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    import s.implicits._
    val docs = spanScrubDocs(s, dir)
    val spans = mergedDupSpans(docs, n)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"), sum($"e" - $"s" + 1).as("n_removed"))
    docs.select($"doc_id", size($"toks").cast("long").as("n_toks"))
      .join(spans, "doc_id")
      .select($"doc_id", $"n_toks", $"n_spans",
        $"n_removed".cast("long").as("n_removed"),
        ($"n_toks" - $"n_removed").cast("long").as("n_kept"))
      .orderBy($"doc_id")
  }

  /** Tokenized corpus for the span-scrub family, checkpointed once —
    * occurrence explode + the final n_toks/rebuild legs all read it.
    */
  private def spanScrubDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .localCheckpoint()
  }

  /** The merged removed-span frame (doc_id, s, e) shared by [[spanScrub]]
    * and [[spanScrubClean]] — occurrence list, duplicated-shingle screen,
    * gaps-and-islands interval merge. ONE implementation mirroring the
    * single `spanScrubCtes` factoring on the oracle side, so a semantics
    * tweak (span bounds, island condition) lands in exactly one place
    * per engine.
    */
  private def mergedDupSpans(docs: DataFrame, n: Int): DataFrame = {
    val occ = docs
      .select(col("doc_id"), posexplode(text.shinglesFromTokens(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("st"), (col("pos") + n).as("en"),
        md5(col("col")).as("h"))
    val dup = occ.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
      .select(col("h"))
    val iv = occ.join(dup, "h").select(col("doc_id"), col("st"), col("en"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("st"))
    val prevMax = max(col("en"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("newi",
        when(col("st") > coalesce(prevMax, lit(-1)), 1L).otherwise(0L))
      .withColumn("isl",
        sum(col("newi")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("st")).as("s"), max(col("en")).as("e"))
  }

  /** Model-based quality FILTER over the whole corpus — the deployed
    * form of [[bigramSurprisal]] (which scores only the held-out split):
    * the add-one bigram LM trains on the train split, every document is
    * scored, and docs whose cross-entropy exceeds the corpus mean are
    * flagged to drop — the CCNet/Gopher "perplexity filter" stage with a
    * 2-gram LM standing in for the 5-gram KenLM (same join shape, no
    * external model artifact).
    *
    * Unlike the audit query's float `avg`, the filter is FIXED-POINT end
    * to end: per-bigram surprisal rounded to 1e-6 once (where the model
    * probability is a ratio of exact integers), per-doc and corpus means
    * as integer floor divisions of non-negative sums — so the keep/drop
    * verdict can never straddle an ulp between engines. Model tables
    * are vocab-bounded broadcasts; scoring is one token-stream pass.
    */
  /** Per-document fixed-point LM cross-entropy (train-split model, all
    * docs scored) — shared by [[surprisalFilter]] and
    * [[mixtureReweight]].
    */
  private def surprisalPerDoc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toksF = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id", $"bucket", text.tokensLower($"text").as("toks"))
      .localCheckpoint() // model counts + corpus scoring all read it
    val train = toksF.filter($"bucket" < 80)
    val cAb = train
      .select(explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("c_ab"))
    val cA = train
      .select(explode($"toks").as("a"))
      .groupBy($"a").agg(count(lit(1)).as("c_a"))
    val vocab = cA.agg(count(lit(1)).as("v"))
    toksF
      .select($"doc_id", explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .withColumn("a", split($"g", " ").getItem(0))
      .join(broadcast(cAb), Seq("g"), "left")
      .join(broadcast(cA), Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_u",
        round(-log((coalesce($"c_ab", lit(0L)) + 1).cast("double") /
          (coalesce($"c_a", lit(0L)) + $"v").cast("double")) * 1000000.0)
          .cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lp_u").as("slp"))
      .select($"doc_id", $"n_bigrams", expr("slp div n_bigrams").as("xent_u"))
  }

  /** RHO-style learnability selection (Lin et al. 2024's "Rho-1: Not
    * All Tokens Are What You Need" idea at document granularity, with
    * bigram LMs standing in for the reference/train pair): score every
    * document under TWO add-one bigram models — the BASE model trained
    * on the whole train split, and the REFERENCE model trained only on
    * its high-quality slice (quality ≥ `refQualityMin` bp) — and rank
    * by excess cross-entropy xent_base − xent_ref. A high-excess doc is
    * one the generic corpus model finds surprising but the quality
    * model explains: quality-LIKE yet underrepresented — exactly the
    * data a curation pass upsamples next. Negative excess = the generic
    * model explains it better than the quality model does (boilerplate
    * the quality slice lacks).
    *
    * Exactness: both models score in one pass over the bigram stream
    * (four broadcast count joins, two per-bigram fixed-point surprisals
    * — the [[surprisalFilter]] arithmetic twice), per-doc xent by
    * integer floor division, so learn_u is exact in both engines. The
    * ranking rides [[graft.operators.Relational.globalRowNumber]]
    * (range-partitioned, never a single-partition window); model state
    * is vocabulary-bounded broadcast, never corpus-sized.
    */
  def rhoLearnability(s: SparkSession, dir: String,
                      refQualityMin: Long = 5000L,
                      topK: Int = 100): DataFrame = {
    import s.implicits._
    val perDoc = rhoPerDocScores(s, dir, refQualityMin)
    Relational.globalRowNumber(perDoc,
        Seq($"learn_u".desc, $"doc_id"))
      .select($"doc_id", $"n_bigrams", $"xent_base_u", $"xent_ref_u",
        $"learn_u", $"rk".as("rnk"), ($"rk" <= topK).as("selected"))
      .orderBy($"doc_id")
  }

  /** The dual-model scoring stage of [[rhoLearnability]], pre-ranking —
    * package-private so PlanSpec audits the one-scan / four-broadcast
    * shape directly (the public op checkpoints it inside the
    * range-partitioned ranking).
    */
  private[graft] def rhoPerDocScores(s: SparkSession, dir: String,
                                     refQualityMin: Long): DataFrame = {
    import s.implicits._
    val toksF = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id", $"bucket", $"text", $"n_chars",
        text.tokensLower($"text").as("toks"))
      .withColumn("qu",
        round(text.qualityScoreTokens($"text", $"toks", $"n_chars")
          * 10000).cast("long"))
      .select($"doc_id", $"bucket", $"qu", $"toks")
      .localCheckpoint() // both model-count passes + scoring read it
    def counts(tr: DataFrame, sfx: String) = {
      val cAb = tr.select(explode(text.shinglesFromTokens($"toks", 2)).as("g"))
        .groupBy($"g").agg(count(lit(1)).as(s"c_ab_$sfx"))
      val cA = tr.select(explode($"toks").as("a"))
        .groupBy($"a").agg(count(lit(1)).as(s"c_a_$sfx"))
      val v = cA.agg(count(lit(1)).as(s"v_$sfx"))
      (cAb, cA, v)
    }
    val (cAbB, cAB, vB) = counts(toksF.filter($"bucket" < 80), "b")
    val (cAbR, cAR, vR) = counts(
      toksF.filter($"bucket" < 80 && $"qu" >= refQualityMin), "r")
    def lp(cab: Column, ca: Column, v: Column): Column =
      round(-log((coalesce(cab, lit(0L)) + 1).cast("double") /
        (coalesce(ca, lit(0L)) + v).cast("double")) * 1000000.0)
        .cast("long")
    toksF
      .select($"doc_id", explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .withColumn("a", split($"g", " ").getItem(0))
      .join(broadcast(cAbB), Seq("g"), "left")
      .join(broadcast(cAB), Seq("a"), "left")
      .join(broadcast(cAbR), Seq("g"), "left")
      .join(broadcast(cAR), Seq("a"), "left")
      .crossJoin(broadcast(vB)).crossJoin(broadcast(vR))
      .select($"doc_id",
        lp($"c_ab_b", $"c_a_b", $"v_b").as("lpb_u"),
        lp($"c_ab_r", $"c_a_r", $"v_r").as("lpr_u"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"lpb_u").as("slb"), sum($"lpr_u").as("slr"))
      .select($"doc_id", $"n_bigrams",
        expr("slb div n_bigrams").as("xent_base_u"),
        expr("slr div n_bigrams").as("xent_ref_u"))
      .withColumn("learn_u", $"xent_base_u" - $"xent_ref_u")
  }

  def surprisalFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perDoc = surprisalPerDoc(s, dir)
    val cut = perDoc.agg(sum($"xent_u").as("sx"), count(lit(1)).as("nd"))
      .select(expr("sx div nd").as("cut_u"))
    perDoc.crossJoin(broadcast(cut))
      .select($"doc_id", $"n_bigrams", $"xent_u", $"cut_u",
        ($"xent_u" <= $"cut_u").as("keep"))
      .orderBy($"doc_id")
  }

  /** Static domain reweighting from per-source LM loss (the DoReMi idea
    * — Xie et al. 2023, "Doremi: Optimizing Data Mixtures" — reduced to
    * its loss-proportional proxy: domains the reference LM finds HARD
    * get more sampling weight, instead of weights ∝ raw size): per
    * source, the mean document cross-entropy under the train-split
    * bigram LM, normalized to basis points that sum to EXACTLY 10000 by
    * largest-remainder (Hamilton) apportionment — floor division gives
    * each source its base weight and the deficit goes to the largest
    * remainders, so the published mixture is integer-exact and
    * total-preserving in any engine. The apportionment windows run over
    * the source table (tens of rows), never the corpus.
    */
  def mixtureReweight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySrc = surprisalPerDoc(s, dir)
      .join(Tables(s, dir, "documents").select($"doc_id", $"source"), "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"xent_u").as("sx"))
      .select($"source", $"n_docs", expr("sx div n_docs").as("mean_xent_u"))
    val tot = bySrc.agg(sum($"mean_xent_u").as("tot"))
    val wAll = Window.partitionBy(lit(1))
    val wRem = Window.partitionBy(lit(1)).orderBy($"rem".desc, $"source")
    bySrc.crossJoin(broadcast(tot))
      .withColumn("base_bp", expr("mean_xent_u * 10000 div tot"))
      .withColumn("rem", expr("(mean_xent_u * 10000) % tot"))
      .withColumn("deficit", lit(10000L) - sum($"base_bp").over(wAll))
      .withColumn("rk", row_number().over(wRem))
      .select($"source", $"n_docs", $"mean_xent_u",
        ($"base_bp" + when($"rk" <= $"deficit", 1L).otherwise(0L))
          .as("weight_bp"))
      .orderBy($"source")
  }

  /** Length-staged curriculum order: documents grouped into length-
    * doubling stages (stage = bit-length of the token count — 1-1, 2-3,
    * 4-7, 8-15… tokens), short-first, with the reproducible md5 shuffle
    * inside each stage — the "train on short sequences first" schedule,
    * stated so a restart or a second site replays it identically
    * ([[trainingOrder]]'s determinism discipline applied to a curriculum
    * instead of a uniform shuffle).
    *
    * The stage function is INTEGER-exact (length of the binary string,
    * no log() float boundary) and needs no corpus statistics — unlike
    * quantile bucketing there is no global rank, so the position window
    * partitions by stage and parallelizes across stages at any corpus
    * size; within a stage the shuffle key spreads the sort.
    */
  /** The (stage, shuffle-key) derivation behind [[curriculumOrder]] —
    * shared with `warehouse.Export.curriculumShards`, whose file layout's
    * contract is to replay this schedule.
    */
  private[graft] def curriculumKey(textCol: Column, docId: Column)
      : (Column, Column) = (
    length(bin(size(text.tokensLower(textCol)).cast("long"))).cast("int"),
    hashBucketMod(docId, "curr:", 1000000L))

  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byStage = Window.partitionBy($"stage").orderBy($"sk", $"doc_id")
    val (stageCol, skCol) = curriculumKey($"text", $"doc_id")
    docsFanned(s, dir)
      .select($"doc_id", size(text.tokensLower($"text")).cast("long").as("n_toks"),
        stageCol.as("stage"), skCol.as("sk"))
      .withColumn("pos", row_number().over(byStage).cast("long"))
      .select($"stage", $"pos", $"doc_id", $"n_toks")
      .orderBy($"stage", $"pos")
  }

  /** Count-Min sketch frequency estimates with a point-query audit —
    * the frequency member of the sketch family (HLL distinct, GK
    * quantiles, SpaceSaving top-k, Bloom membership, MinHash Jaccard,
    * SimHash Hamming): `depth`×`width` integer counters built in ONE
    * token pass (bounded state at ANY vocabulary — the whole point at
    * 100 TB), then the exact top-k tokens probed against the sketch.
    * CMS's deterministic guarantee — est ≥ true, ALWAYS (collisions only
    * ever add) — is emitted as an oracle-assertable boolean per probe,
    * exact witnesses alongside; the measured overestimate shows the ε·N
    * slack actually paid. Hashes are the engine-portable md5 prefix with
    * a per-row salt, so the oracle rebuilds the identical counters.
    */
  def cmsAudit(s: SparkSession, dir: String, depth: Int = 4,
               width: Int = 16, k: Int = 10): DataFrame = {
    import s.implicits._
    val tk = docsFanned(s, dir)
      .select(explode(text.tokensLower($"text")).as("tok"))
      .localCheckpoint() // counters + exact counts + probes all read it
    def bucket(r: Column, tok: Column): Column =
      pmod(conv(substring(md5(
        concat(r.cast("string"), lit(":cms:"), tok)), 1, 15), 16, 10)
        .cast("long"), lit(width.toLong))
    val counters = tk
      .select($"tok", explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select($"r", bucket($"r", $"tok").as("b"))
      .groupBy($"r", $"b").agg(count(lit(1)).as("c"))
    val top = tk.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
      .orderBy($"true_cnt".desc, $"tok").limit(k)
    val est = top
      .select($"tok", $"true_cnt",
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b", bucket($"r", $"tok"))
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy($"tok", $"true_cnt").agg(min($"c").as("est_cnt"))
    est.select($"tok", $"true_cnt", $"est_cnt",
        ($"est_cnt" - $"true_cnt").as("overestimate"),
        ($"est_cnt" >= $"true_cnt").as("sound"))
      .orderBy($"true_cnt".desc, $"tok")
  }

  /** The corpus-release funnel in ONE frame — every curation gate this
    * engine ships, applied cumulatively in deployment order, with
    * doc/token survivor counts per stage: raw → train split (held-out
    * data never enters a training release) → quality cascade → near-dup
    * canonical dedup → eval decontamination. The artifact a release
    * review reads, and the composition proof that the individual gates
    * (each separately oracle-checked) agree when chained: the oracle
    * recombines the SAME split, cascade, CC and decontamination
    * fragments and must land on identical counts.
    *
    * Dedup semantics: assignments come from the GLOBAL near-dup graph
    * (computed once corpus-wide), survivors = canonical members — gate
    * order-independent, so the funnel is a pure intersection of
    * per-gate verdicts and each gate's count is exact.
    */
  def releaseManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the three stage inputs are INDEPENDENT pipelines (quality cascade
    // scan, dedup CC chain, decontamination shingle join) — materialize
    // them concurrently (r14, guide §2.6). The CC chain is a sequence
    // of small driver-blocking jobs that leave cores idle; the cascade
    // and decontamination scans back-fill them, and the final rollup
    // job then reads three checkpointed frames instead of recomputing
    // the two heavy scans inline.
    val Seq(lvls, losers, flagged) = Sessions.inParallel(
      () => cascadeLevels(s, dir).localCheckpoint(),
      () => Dedup.dedupAssignments(s, dir)
        .filter($"doc_id" =!= $"canon_id")
        .select($"doc_id", lit(1).as("dup"))
        .localCheckpoint(),
      () => decontamination(s, dir)
        .select($"train_doc".as("doc_id")).distinct()
        .withColumn("cont", lit(1))
        .localCheckpoint())
    val g = lvls
      .withColumn("in_train", hashBucket($"doc_id", "split:") < 80)
      .join(losers, Seq("doc_id"), "left")
      .join(flagged, Seq("doc_id"), "left")
      .select($"n_toks",
        $"in_train".as("g1"),
        ($"in_train" && $"lvl" === 4).as("g2"),
        ($"in_train" && $"lvl" === 4 && $"dup".isNull).as("g3"),
        ($"in_train" && $"lvl" === 4 && $"dup".isNull && $"cont".isNull)
          .as("g4"))
    val cols = Seq(
      count(lit(1)).as("n0"), sum($"n_toks").as("t0")) ++
      (1 to 4).flatMap(i => Seq(
        sum(when(col(s"g$i"), 1L).otherwise(0L)).as(s"n$i"),
        sum(when(col(s"g$i"), $"n_toks").otherwise(0L)).as(s"t$i")))
    g.agg(cols.head, cols.tail: _*)
      .selectExpr(
        """stack(5,
           0, 'raw',              n0, t0,
           1, 'train_split',      n1, t1,
           2, 'quality_cascade',  n2, t2,
           3, 'near_dup_dedup',   n3, t3,
           4, 'decontamination',  n4, t4) AS (stage, stage_name, n_docs, n_tokens)""")
      .orderBy($"stage")
  }

  /** The scrub [[spanScrub]] only reports: materialized CLEANED text for
    * every affected document — tokens covered by a cross-doc-duplicated
    * n-gram are cut, the remainder re-joins in position order. This is
    * the frame a pipeline actually writes back to the corpus after
    * span-level dedup (stats alone don't train a model).
    *
    * Shape: the merged spans explode to covered positions (rows =
    * removed-token count, bounded by the corpus token count), the kept
    * tokens survive a position anti-join, and the rebuild is one
    * (doc, pos)-sorted aggregation — the same single shuffle key as the
    * stats query, no range join, no per-pair work.
    */
  def spanScrubClean(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    import s.implicits._
    val docs = spanScrubDocs(s, dir)
    val covered = mergedDupSpans(docs, n)
      .select($"doc_id", explode(sequence($"s", $"e")).as("p"))
    val toks = docs
      .select($"doc_id", posexplode($"toks").as(Seq("p0", "tok")))
      .select($"doc_id", ($"p0" + 1).as("p"), $"tok")
    toks
      .join(covered.select($"doc_id", $"p", lit(1).as("cut")),
        Seq("doc_id", "p"), "left")
      .groupBy($"doc_id")
      .agg(
        count(when($"cut".isNotNull, 1)).as("n_removed"),
        sort_array(collect_list(when($"cut".isNull, struct($"p", $"tok"))))
          .as("kept"))
      .filter($"n_removed" > 0)
      .select($"doc_id", $"n_removed".cast("long").as("n_removed"),
        size($"kept").cast("long").as("n_kept"),
        array_join(transform($"kept", x => x("tok")), " ").as("clean_text"))
      .orderBy($"doc_id")
  }

  /** Temperature-scaled language rebalancing — the multilingual sampling
    * rule of mBERT/XLM-R (Conneau et al. 2020: p_l ∝ n_l^α, α = 1/T):
    * upweight low-resource languages, downweight the head, and emit an
    * integer per-language sampling quota for a fixed document budget.
    *
    * α is FIXED at 1/2 (T = 2) deliberately: n^0.5 = sqrt(n), and IEEE
    * 754 requires sqrt to be correctly rounded — so the weights agree
    * bit-for-bit in every engine, where a general pow(n, α) carries no
    * such guarantee and could flip a rounded micro-unit. Weights are
    * micro-units (round(sqrt(n)·10⁶)); quotas are Hamilton-apportioned
    * (floor share + largest remainder, the [[mixtureReweight]]
    * discipline) so they sum to the budget EXACTLY.
    *
    * Scale: one groupBy over the corpus; everything after runs on
    * |languages| rows.
    */
  def temperatureMix(s: SparkSession, dir: String,
                     budget: Long = 100000L): DataFrame = {
    import s.implicits._
    val byLang = Tables(s, dir, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w_u", round(sqrt($"n_docs") * 1e6).cast("long"))
    val tot = byLang.agg(sum($"w_u").as("tot"))
    val wAll = Window.partitionBy(lit(1))
    val wRem = Window.partitionBy(lit(1)).orderBy($"rem".desc, $"lang")
    byLang.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"w_u * $budget div tot"))
      .withColumn("rem", expr(s"(w_u * $budget) % tot"))
      .withColumn("deficit", lit(budget) - sum($"base").over(wAll))
      .withColumn("rk", row_number().over(wRem))
      .select($"lang", $"n_docs", $"w_u",
        ($"base" + when($"rk" <= $"deficit", 1L).otherwise(0L))
          .as("quota_docs"))
      .orderBy($"lang")
  }

  /** The documents [[temperatureMix]]'s quotas actually select: per
    * language, the first `quota_docs` documents in deterministic
    * md5-shuffle order — so the sample hits each language's apportioned
    * quota EXACTLY (not in expectation, unlike the rate-based
    * [[mixtureSample]]), is reproducible across runs and engines, and a
    * language with fewer documents than its quota contributes everything
    * it has (the flattening exponent deliberately over-asks the tail).
    * One window per language partition — parallel across languages, no
    * global sort.
    */
  def temperatureSample(s: SparkSession, dir: String,
                        budget: Long = 200L): DataFrame = {
    import s.implicits._
    val quotas = temperatureMix(s, dir, budget)
      .select($"lang", $"quota_docs")
    val byLang = Window.partitionBy($"lang").orderBy($"rk_key", $"doc_id")
    docsFanned(s, dir)
      .select($"doc_id", $"lang",
        md5(concat(lit("tsamp:"), $"doc_id".cast("string"))).as("rk_key"))
      .withColumn("rk", row_number().over(byLang).cast("long"))
      .join(broadcast(quotas), Seq("lang"))
      .filter($"rk" <= $"quota_docs")
      .select($"doc_id", $"lang", $"rk")
      .orderBy($"doc_id")
  }

  /** MOSS match REGIONS for the winnowed pairs: per matching document
    * pair, where the shared fingerprints sit — shared-fingerprint count
    * plus the min/max matched shingle position on each side, the span a
    * reviewer (or a span-scrub stage) jumps to. Same df-capped bucket
    * join as [[winnowPairs]]; positions ride along from the selection,
    * so localization costs nothing extra.
    */
  def winnowMatchSpans(s: SparkSession, dir: String, k: Int = 4,
                       w: Int = 4, maxDf: Long = 50L,
                       minShared: Long = 2L): DataFrame = {
    import s.implicits._
    val sel = winnowSelected(s, dir, k, w).localCheckpoint()
    val docH = sel.select($"doc_id", $"h").distinct()
    val matchable = docH.groupBy($"h")
      .agg(count(lit(1)).as("df"))
      .filter($"df" >= 2 && $"df" <= maxDf)
      .select($"h")
    // pre-aggregate positions per (doc, fingerprint) BEFORE the bucket
    // self-join: a fingerprint selected at p positions in A and q in B
    // would otherwise contribute p·q joined rows; min/max survive the
    // pre-aggregation exactly, and one row per (doc, h) makes n_shared a
    // plain count — measured 17s → 4s at the 10x stress size
    val occ = sel.join(matchable, "h")
      .groupBy($"doc_id", $"h")
      .agg(min($"pos").as("mn"), max($"pos").as("mx"))
    occ.select($"doc_id".as("doc_a"), $"h", $"mn".as("amn"), $"mx".as("amx"))
      .join(occ.select($"doc_id".as("doc_b"), $"h",
        $"mn".as("bmn"), $"mx".as("bmx")), Seq("h"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"),
        min($"amn").as("a_min_pos"), max($"amx").as("a_max_pos"),
        min($"bmn").as("b_min_pos"), max($"bmx").as("b_max_pos"))
      .filter($"n_shared" >= minShared)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Code-switching screen: documents whose stopword evidence spans
    * MULTIPLE languages — mixed-language pages poison monolingual
    * sampling quotas and per-language statistics, and the lang-ID
    * argmax ([[langIdConfusion]]) is structurally blind to them (it
    * always answers with one language, however split the evidence).
    * Per doc: hits per language list, languages with any evidence, the
    * runner-up-to-winner evidence ratio in basis points, and a `mixed`
    * flag when the runner-up carries ≥ `mixedBp` of the winner's hits.
    * All integer counts and one cross-multiplied comparison — zero
    * float seams, scan-speed, stateless.
    */
  def codeSwitchScreen(s: SparkSession, dir: String,
                       mixedBp: Long = 3000L): DataFrame = {
    import s.implicits._
    codeSwitchScreenFrom(docsFanned(s, dir), mixedBp).orderBy($"doc_id")
  }

  /** The screen over ANY (doc_id, lang, text) frame — per-row stateless
    * expressions, so it runs on batch and synthetic/streaming frames
    * alike. (On THIS synthetic corpus every document screens clean —
    * its languages share one domain vocabulary, so no cross-list
    * evidence exists; the spec proves the mixed path on constructed
    * bilingual documents.)
    */
  private[graft] def codeSwitchScreenFrom(docs: DataFrame,
                                          mixedBp: Long = 3000L): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val langs = Seq("en", "de", "fr", "es")
    val scored = docs
      .select($"doc_id", $"lang", text.tokensLower($"text").as("toks"))
      .select($"doc_id" +: $"lang" +: langs.map(l =>
        text.stopwordHitsTokens($"toks", text.stopwords(l))
          .cast("long").as(s"hits_$l")): _*)
    val hitCols = langs.map(l => col(s"hits_$l"))
    // best and runner-up straight off the descending-sorted hit multiset
    // — one definition, identical in SQL (list_sort DESC + subscripts)
    val sorted = sort_array(array(hitCols: _*), asc = false)
    scored
      .withColumn("n_langs_hit",
        hitCols.map(c => when(c > 0, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("best_hits", element_at(sorted, 1))
      .withColumn("second_hits", element_at(sorted, 2))
      .withColumn("mixed",
        $"best_hits" > 0 &&
          $"second_hits" * 10000 >= $"best_hits" * mixedBp)
      .select($"doc_id", $"lang", $"n_langs_hit", $"best_hits",
        $"second_hits", $"mixed")
  }

  /** Source ↔ language mutual information — how much knowing a
    * document's source tells you about its language (and vice versa), in
    * micro-nats. The one-number answer to "are my sources linguistically
    * redundant": MI ≈ 0 says language mix is uniform across sources (a
    * source-stratified sample is also language-balanced); MI near H(lang)
    * says sources ARE languages and sampling one collapses the other.
    *
    * Determinism: every probability is a ratio of exact counts; each
    * cell's ln term is fixed-pointed to 1e-6 AT THE CELL (the
    * [[surprisalPerDoc]] discipline — |sources|·|langs| ln calls over
    * identical doubles, never per doc), then the MI is an exact integer
    * sum of per-cell contributions weighted by cell counts, floor-divided
    * by the doc total once.
    */
  def sourceLangMi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables(s, dir, "documents")
      .groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
      .localCheckpoint() // marginals + cell scan all read it
    val bySrc = cells.groupBy($"source").agg(sum($"n").as("ns"))
    val byLang = cells.groupBy($"lang").agg(sum($"n").as("nl"))
    val tot = cells.agg(sum($"n").as("nt"))
    // pmi_u = round(ln(n·nt / (ns·nl)) · 1e6) — one ln per CELL; the
    // argument is a ratio of exact integer products (n ≤ ~1e9 · nt fits
    // a double exactly well past any real source×lang cardinality)
    cells.join(broadcast(bySrc), "source").join(broadcast(byLang), "lang")
      .crossJoin(broadcast(tot))
      .withColumn("pmi_u",
        round(log(($"n" * $"nt").cast("double") /
          ($"ns" * $"nl").cast("double")) * 1e6).cast("long"))
      .agg(sum($"n").cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_cells"),
        // non-negative-shifted floor division: true MI ≥ 0, but per-cell
        // rounding could nudge the integer sum below zero, where Spark's
        // div truncs toward zero and SQL's // floors — shift by 1e6·N so
        // the dividend is provably non-negative in both engines
        expr("(sum(n * pmi_u) + 1000000 * sum(n)) div sum(n) - 1000000")
          .as("mi_u"))
  }

  /** Gopher quality-rule suite (Rae et al. 2021, Appendix A): the
    * per-rule verdict table behind the classic web-text filter — word
    * count in [50, 100k], mean word length in [3, 10] characters,
    * symbol-to-word ratio (# and …) ≤ 0.1, ≥ 80% of words containing an
    * alphabetic character, ≥ 2 of the 8 required English stopwords, ≤ 90%
    * of lines bullet-led and ≤ 30% ellipsis-ended. Unlike the composite
    * [[qualityScores]] (one weighted float) this emits each rule as its
    * own boolean so a corpus owner sees WHICH screen kills a document —
    * and every comparison is integer cross-multiplication (3n ≤ Σlen,
    * 10·sym ≤ n, 5·alpha ≥ 4n…), so the verdicts carry zero float risk
    * in any engine. One tokenize + a handful of per-row expressions:
    * scan-speed at any corpus size.
    */
  /** Gopher's default required-stopword set. The rule is "≥ 2 of a
    * REQUIRED word list" — the list is a parameter because it must match
    * the corpus' language register (the paper's 8 English function words
    * are near-absent from this synthetic corpus, whose function words
    * are "the"/"a" — a corpus owner tunes the list, not the rule).
    */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(s: SparkSession, dir: String,
                  requiredWords: Seq[String] = GopherRequiredWords): DataFrame = {
    import s.implicits._
    gopherVerdictsFrom(docsFanned(s, dir), requiredWords).orderBy($"doc_id")
  }

  /** The per-row Gopher verdicts over ANY (doc_id, text) frame. Every
    * rule is a stateless per-row expression — no shuffle, no state — so
    * the same code runs over a batch corpus and a streaming micro-batch
    * (`Streams.gopherGate`) with bit-identical verdicts.
    */
  private[graft] def gopherVerdictsFrom(docs: DataFrame,
      requiredWords: Seq[String] = GopherRequiredWords): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val required = requiredWords
    val scored = docs
      .select($"doc_id", $"text", text.tokensLower($"text").as("toks"),
        split($"text", "\n").as("lines"))
      .select($"doc_id", $"toks", $"lines",
        size($"toks").cast("long").as("n_words"),
        aggregate($"toks", lit(0L), (acc, t) => acc + length(t)).as("sum_len"),
        (length($"text") - length(replace($"text", lit("#"), lit("")))
          + (length($"text") - length(replace($"text", lit("..."), lit("")))) / 3
          + length($"text") - length(replace($"text", lit("…"), lit(""))))
          .cast("long").as("n_sym"),
        size(filter($"toks", t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
        required.map(w => when(array_contains($"toks", w), 1).otherwise(0))
          .reduce(_ + _).cast("long").as("n_stop"),
        size($"lines").cast("long").as("n_lines"),
        size(filter($"lines", l => ltrim(l).rlike("^[-*•]")))
          .cast("long").as("n_bullet"),
        size(filter($"lines", l => l.rlike("(\\.\\.\\.|…)\\s*$")))
          .cast("long").as("n_ell_end"))
    scored.select($"doc_id", $"n_words",
        ($"n_words" >= 50 && $"n_words" <= 100000).as("rule_word_count"),
        ($"sum_len" >= $"n_words" * 3 && $"sum_len" <= $"n_words" * 10)
          .as("rule_mean_word_len"),
        ($"n_sym" * 10 <= $"n_words").as("rule_symbol_ratio"),
        ($"n_alpha" * 5 >= $"n_words" * 4).as("rule_alpha_words"),
        ($"n_stop" >= 2).as("rule_stopwords"),
        ($"n_bullet" * 10 <= $"n_lines" * 9).as("rule_bullet_lines"),
        ($"n_ell_end" * 10 <= $"n_lines" * 3).as("rule_ellipsis_lines"))
      .withColumn("keep",
        $"rule_word_count" && $"rule_mean_word_len" && $"rule_symbol_ratio" &&
          $"rule_alpha_words" && $"rule_stopwords" && $"rule_bullet_lines" &&
          $"rule_ellipsis_lines")
  }

  /** N-gram diversity per language — distinct-1/2/3 (Li et al. 2016):
    * unique n-grams over total n-grams in basis points, plus the
    * type-token ratio's raw counts. Low distinct-n = repetitive,
    * template-heavy text (the corpus-level complement of the per-doc
    * [[repetitionScores]]); the number degrades gracefully as a corpus
    * accumulates boilerplate, which makes it a good per-ingest trend
    * metric. One shingle pass per n; counts are exact.
    */
  def distinctNgrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docsFanned(s, dir)
      .select($"lang", text.tokensLower($"text").as("toks"))
      .localCheckpoint() // three shingle passes read it
    def level(n: Int) = toks
      .select($"lang", explode(text.shinglesFromTokens($"toks", n)).as("g"))
      .groupBy($"lang")
      .agg(count(lit(1)).as(s"total_$n"),
        countDistinct($"g").as(s"uniq_$n"))
    level(1).join(level(2), "lang").join(level(3), "lang")
      .select($"lang",
        $"total_1", $"uniq_1", expr("uniq_1 * 10000 div total_1").as("d1_bp"),
        $"total_2", $"uniq_2", expr("uniq_2 * 10000 div total_2").as("d2_bp"),
        $"total_3", $"uniq_3", expr("uniq_3 * 10000 div total_3").as("d3_bp"))
      .orderBy($"lang")
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020): rank every
    * document by its LM cross-entropy ([[surprisalPerDoc]]'s fixed-point
    * score — ties broken by doc_id, so the rank is total and engine-
    * exact) and cut the corpus into head/middle/tail thirds — the
    * established coarse quality binning a crawl pipeline publishes
    * alongside the raw data. Bucket assignment is pure integer
    * arithmetic on the rank; the per-bucket rollup reports exact count
    * and min/mean/max cross-entropy.
    */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = surprisalPerDoc(s, dir).localCheckpoint() // rank + count
    // distributed exact global rank (range partitions + offsets) — the
    // ordering is total ((xent_u, doc_id) is unique), which is what
    // makes the distributed rank identical to a single-partition window
    Relational.globalRowNumber(scored, Seq($"xent_u", $"doc_id"))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("nn"))))
      .withColumn("bucket",
        when(($"rk" - 1) * 3 < $"nn", "head")
          .when(($"rk" - 1) * 3 < $"nn" * 2, "middle")
          .otherwise("tail"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"xent_u").as("min_xent_u"),
        expr("sum(xent_u) div count(1)").as("mean_xent_u"),
        max($"xent_u").as("max_xent_u"))
      .orderBy($"bucket")
  }

  /** Data selection via importance resampling (DSIR, Xie et al. 2023):
    * score every raw document by how much more likely its hashed-unigram
    * bag is under a TARGET distribution than under the raw-corpus
    * distribution, and keep the top-n — the principled way to skew a web
    * crawl toward a reference corpus (here: target = the corpus'
    * `targetLang` slice, the "give me more English-like data" ask)
    * without training a model. Both unigram LMs are add-one-smoothed
    * over `dim` hashed feature buckets, so model size is O(dim) no
    * matter the vocabulary.
    *
    * Determinism: the two ln() calls happen once per FEATURE (≤ dim
    * rows), their difference fixed-pointed to 1e-6 there; per-document
    * weights are then pure integer sums of llr_u over token occurrences
    * — partial-agg-order-proof, and the only float seam is ln over
    * identical doubles at dim rows, not per token.
    *
    * Scale: model tables are dim-bounded (broadcast); the corpus pays
    * one token-explode + hash-keyed count, the scoring join is
    * broadcast-by-llr-table, and top-n is TakeOrdered — no global sort
    * materializes.
    */
  /** The (token stream, per-feature llr) pair behind [[dsirSelect]] —
    * also the artifact source for the streaming gate
    * ([[dsirLlrTable]] collects the dim-bounded llr rows).
    */
  private def dsirParts(s: SparkSession, dir: String, dim: Int,
                        targetLang: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val tk = docsFanned(s, dir)
      .select($"doc_id", $"lang", explode(text.tokensLower($"text")).as("tok"))
      .select($"doc_id", $"lang",
        hashBucketMod($"tok", "dsir:", dim.toLong).as("f"))
      .localCheckpoint() // raw counts, target counts and scoring all read it
    val raw = tk.groupBy($"f").agg(count(lit(1)).as("cr"))
    val tgt = tk.filter($"lang" === targetLang)
      .groupBy($"f").agg(count(lit(1)).as("ct"))
    val nr = tk.count().toDouble
    val nt = tk.filter($"lang" === targetLang).count().toDouble
    val llr = raw.join(tgt, Seq("f"), "left")
      .select($"f",
        round((log((coalesce($"ct", lit(0L)) + lit(1L)).cast("double")
            / lit(nt + dim)) -
          log(($"cr" + lit(1L)).cast("double") / lit(nr + dim)))
          * lit(1000000.0)).cast("long").as("llr_u"))
    (tk, llr)
  }

  /** The trained DSIR model as a driver-side map (≤ dim entries — the
    * same bounded-artifact contract as the BPE merge-table memo):
    * feature id → fixed-point log-likelihood ratio. What the streaming
    * ingest gate (`Streams.dsirGate`) folds into its scan expression.
    */
  def dsirLlrTable(s: SparkSession, dir: String, dim: Int = 1024,
                   targetLang: String = "en"): Map[Long, Long] =
    dsirParts(s, dir, dim, targetLang)._2.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  def dsirSelect(s: SparkSession, dir: String, dim: Int = 1024,
                 n: Int = 100, targetLang: String = "en"): DataFrame = {
    import s.implicits._
    val (tk, llr) = dsirParts(s, dir, dim, targetLang)
    val w = tk.join(broadcast(llr), Seq("f"))
      .groupBy($"doc_id").agg(sum($"llr_u").as("weight_u"))
    val byW = Window.orderBy($"weight_u".desc, $"doc_id")
    w.orderBy($"weight_u".desc, $"doc_id").limit(n)
      .withColumn("rk", row_number().over(byW).cast("int"))
      .select($"rk", $"doc_id", $"weight_u")
      .orderBy($"rk")
  }

  /** Distributed training of a linear document classifier by batch
    * gradient descent — the "learned quality filter" step of a training-
    * data pipeline (a fastText-style model distilled from cheap surface
    * features), and the canonical distributed-ML loop: per step ONE
    * corpus scan computes the gradient with map-side partial
    * aggregation, the driver holds only the (tiny) weight vector, and
    * the updated weights broadcast back into the next step's expression
    * tree as literals. Cost per step is O(corpus) scan + a 4-long
    * aggregate — no shuffle of features, no driver data path; at 100 TB
    * this is exactly mini-batch-free full-batch GD as Spark MLlib runs
    * it, minus any vector library.
    *
    * Logistic regression with the HARD-sigmoid link p = clamp(0.5 +
    * 0.25·z, 0, 1) (Courbariaux et al.'s hard σ): unlike exp(), every
    * operation is plain IEEE mul/add/clamp, so p is bit-identical in any
    * engine evaluating the same order — which is what lets an external
    * SQL oracle replay TRAINING hash-exactly. The same discipline as the
    * kmeans loop: gradients are per-row fixed-pointed (1e-6) then summed
    * as longs (partial-agg-order-proof), and weights live in integer
    * micro-units end to end.
    *
    * Label: doc contains 'spark' AND has ≥ 54 tokens — one component
    * the features can learn (length), one they cannot see (the token) —
    * so the loss drops but stays bounded away from zero, the realistic
    * regime for a surface-feature quality model. Features: bias,
    * tokens/100, distinct-token ratio, chars-per-token/10.
    */
  /** Label/feature/score expressions shared by training, batch scoring,
    * and the streaming ingest gate (`Streams.classifierGate`) — one
    * definition, so serving cannot drift from what was trained. All take
    * a MATERIALIZED token column (tokenize once per row).
    */
  private[graft] def lrLabel(toks: Column): Column =
    when(array_contains(toks, "spark") && size(toks) >= 54, 1.0)
      .otherwise(0.0)

  private[graft] def lrFeats(toks: Column, nChars: Column): Seq[Column] = Seq(
    lit(1.0),
    size(toks).cast("double") / 100.0,
    size(array_distinct(toks)).cast("double") / size(toks),
    nChars.cast("double") / size(toks) / 10.0)

  /** Hard-sigmoid forward pass with the micro-unit weights folded in as
    * literals — left-assoc dot order, the one the oracle replays.
    */
  private[graft] def lrScore(feats: Seq[Column], wMicro: Seq[Long]): Column = {
    val z = feats.zip(wMicro)
      .map { case (x, wu) => lit(wu.toDouble / 1000000.0) * x }
      .reduceLeft(_ + _)
    greatest(lit(0.0), least(lit(1.0), lit(0.5) + lit(0.25) * z))
  }

  private def lrFeatFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"doc_id", $"n_chars", text.tokensLower($"text").as("toks"))
      .select(Seq($"doc_id", lrLabel($"toks").as("y")) ++
        lrFeats($"toks", $"n_chars").zipWithIndex
          .map { case (c, j) => c.as(s"x$j") }: _*)
      .localCheckpoint()
  }

  /** The GD loop shared by the history query and the scoring/serving
    * paths: returns (per-step weight history, final weights), both in
    * exact micro-units.
    */
  private[graft] def lrTrainCore(s: SparkSession, dir: String, steps: Int,
                                 lr: Double)
      : (Seq[(Int, Long, Long, Long, Long)], Vector[Long]) = {
    import s.implicits._
    val feats = lrFeatFrame(s, dir)
    val n = feats.count()
    var w = Vector(0L, 0L, 0L, 0L) // micro-units: exact integers
    val hist = scala.collection.mutable.ListBuffer
      .empty[(Int, Long, Long, Long, Long)]
    for (step <- 1 to steps) {
      val p = lrScore((0 to 3).map(j => col(s"x$j")), w)
      val row = feats.withColumn("p", p)
        .select((0 to 3).map(j =>
          sum(round(($"p" - $"y") * col(s"x$j") * lit(1000000.0))
            .cast("long")).as(s"g$j")): _*)
        .head()
      w = w.indices.map { j =>
        // HALF_UP (away from zero), matching SQL round() for negatives
        // where Scala's math.round (floor(x+0.5)) would differ
        w(j) - BigDecimal(lr * row.getLong(j).toDouble / n)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.toVector
      hist += ((step, w(0), w(1), w(2), w(3)))
    }
    (hist.toSeq, w)
  }

  def qualityLrTrain(s: SparkSession, dir: String, steps: Int = 5,
                     lr: Double = 0.5): DataFrame = {
    import s.implicits._
    lrTrainCore(s, dir, steps, lr)._1
      .toDF("step", "w0_u", "w1_u", "w2_u", "w3_u").orderBy($"step")
  }

  /** Split-conformal quality gate (Vovk's split conformal prediction,
    * the Papadopoulos et al. 2002 inductive form): from the held-back
    * calibration slice (hash buckets 80-89 — between train and eval),
    * the k-th smallest quality with k = ⌊α(n+1)⌋ is a threshold such
    * that a fresh exchangeable document scores ≥ it with probability
    * ≥ 1−α — a FINITE-SAMPLE guarantee, no distributional assumption,
    * which is what a "keep documents above the quality bar" gate
    * actually needs before anyone trusts the bar. Output: the
    * threshold, and the guarantee AUDITED on the eval split (measured
    * coverage vs the 1−α target — the proven-bounds discipline of the
    * sketch audits). A degenerate rank — k < 1 (calibration too small
    * for the requested α) or k > nCal (α ≥ 1, e.g. alphaBp ≥ 10⁴,
    * where ⌊α(n+1)⌋ exceeds the calibration size) — reports NULL
    * threshold/coverage instead of a fabricated bar, matching the
    * oracle's scalar-subquery NULL contract on the same inputs.
    *
    * Exactness: quality quantizes to the usual 1e4 integers; the k-th
    * order statistic rides [[graft.operators.Relational.globalRowNumber]]
    * over (qu, doc_id) — a total order, so the threshold is the same
    * row in any engine; coverage is an integer floor division. The
    * only driver values are the calibration count and the one
    * threshold row (bounded collects).
    */
  def conformalQualityGate(s: SparkSession, dir: String,
                           alphaBp: Long = 1000L): DataFrame = {
    import s.implicits._
    val scored = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id", $"bucket", $"text", $"n_chars",
        text.tokensLower($"text").as("toks"))
      .select($"doc_id", $"bucket",
        round(text.qualityScoreTokens($"text", $"toks", $"n_chars")
          * 10000).cast("long").as("qu"))
      .localCheckpoint() // calibration rank + eval coverage read it
    val cal = scored.filter($"bucket" >= 80 && $"bucket" < 90)
      .select($"doc_id", $"qu")
    val nCal = cal.count()
    val k = alphaBp * (nCal + 1) / 10000
    val thr: Option[Long] =
      if (k < 1 || k > nCal) None
      else Some(Relational.globalRowNumber(cal, Seq($"qu", $"doc_id"))
        .filter($"rk" === k).head().getAs[Long]("qu"))
    val ev = scored.filter($"bucket" >= 90)
    val base = ev.agg(count(lit(1)).as("n_eval"),
      thr.map(t => sum(when($"qu" >= t, 1L).otherwise(0L)))
        .getOrElse(lit(null).cast("long")).as("n_covered"))
    base.select(
      lit(nCal).as("n_cal"), lit(k).as("k"),
      thr.map(lit(_)).getOrElse(lit(null)).cast("long").as("threshold_qu"),
      $"n_eval", $"n_covered",
      when($"n_eval" > 0, expr("n_covered * 1000000 div n_eval"))
        .as("coverage_u"),
      lit(1000000L - alphaBp * 100).as("target_u"))
  }

  /** Dataset cartography (Swayamdipta et al. 2020, "Dataset
    * Cartography: Mapping and Diagnosing Datasets with Training
    * Dynamics"): per document, the MEAN and VARIABILITY of the model's
    * confidence in the TRUE label across the training trajectory —
    * here the 5 GD steps of [[qualityLrTrain]], whose per-step weights
    * already exist as exact micro-integers. High-confidence/low-
    * variability docs are easy-to-learn (safe but redundant),
    * low/low are hard-to-learn (often mislabeled — audit first), and
    * high-variability docs are ambiguous (the slice that moves
    * decision boundaries — what curation keeps). All five step scores
    * fold into ONE scan as literal-weight projections; confidence is
    * an integer floor-mean, variability one fixed-shape sqrt over the
    * exact integer n·Σc²−S² (the headwayRegularity discipline), so
    * both engines agree bit-for-bit.
    */
  def datasetCartography(s: SparkSession, dir: String, steps: Int = 5,
                         lr: Double = 0.5,
                         variThreshold: Long = 150000L): DataFrame = {
    import s.implicits._
    val hist = lrTrainCore(s, dir, steps, lr)._1
    val feats = lrFeatFrame(s, dir)
    val cCols = hist.map { case (step, w0, w1, w2, w3) =>
      val p = lrScore((0 to 3).map(j => col(s"x$j")), Vector(w0, w1, w2, w3))
      val pu = round(p * lit(1000000.0)).cast("long")
      when($"y" === 1.0, pu).otherwise(lit(1000000L) - pu).as(s"c$step")
    }
    val sumC = (1 to steps).map(i => col(s"c$i")).reduce(_ + _)
    val sumC2 = (1 to steps).map(i => col(s"c$i") * col(s"c$i"))
      .reduce(_ + _)
    feats.select(($"doc_id" +: $"y" +: cCols): _*)
      .withColumn("conf_u", expr(
        s"(${(1 to steps).map("c" + _).mkString(" + ")}) div $steps"))
      .withColumn("vari_u",
        round(sqrt((lit(steps.toLong) * sumC2 - sumC * sumC)
          .cast("double")) / lit(steps.toDouble)).cast("long"))
      .select($"doc_id", $"y".cast("int").as("y"), $"conf_u", $"vari_u",
        when($"vari_u" >= variThreshold, lit("ambiguous"))
          .when($"conf_u" >= 500000L, lit("easy_to_learn"))
          .otherwise(lit("hard_to_learn")).as("region"))
      .orderBy($"doc_id")
  }

  /** Batch inference with the trained weights: per document the
    * hard-sigmoid probability (fixed-pointed to 1e-6 — exact), the
    * accept verdict, and the true label — the frame a threshold sweep /
    * calibration reads, and the batch twin of the streaming
    * `Streams.classifierGate`. Training runs first (steps corpus scans),
    * scoring is then ONE more scan with the weights folded into the
    * projection — at 100 TB the scan dominates and nothing shuffles.
    */
  def qualityLrScores(s: SparkSession, dir: String, steps: Int = 5,
                      lr: Double = 0.5): DataFrame = {
    import s.implicits._
    val w = lrTrainCore(s, dir, steps, lr)._2
    val p = lrScore((0 to 3).map(j => col(s"x$j")), w)
    lrFeatFrame(s, dir)
      .select($"doc_id", $"y", p.as("p"))
      .select($"doc_id",
        round($"p" * lit(1000000.0)).cast("long").as("p_u"),
        ($"p" >= 0.5).as("pred"),
        $"y".cast("int").as("y"))
      .orderBy($"doc_id")
  }

  /** Reliability audit of the trained quality classifier: documents
    * bucketed by predicted probability decile; per bin the mean
    * predicted probability, the empirical positive rate, and the summed
    * Brier contribution — the table a calibration curve plots, and the
    * acceptance artifact for shipping [[qualityLrScores]]' threshold (a
    * model can rank well and still be badly calibrated; the gap between
    * mean_p_u and pos_rate_u per bin IS the miscalibration).
    *
    * Determinism discipline matches training: probabilities fixed-
    * pointed to micro-units, bin = integer decile of p_u, per-bin means
    * as integer floor divisions, Brier terms per-row rounded to 1e-6
    * then summed as longs — partial-aggregation-order-proof, so the
    * distributed result is hash-identical to any sequential replay.
    * Cost: training's scans + ONE more scan; the groupBy carries 10 keys.
    */
  def qualityLrCalibration(s: SparkSession, dir: String, steps: Int = 5,
                           lr: Double = 0.5): DataFrame = {
    import s.implicits._
    val w = lrTrainCore(s, dir, steps, lr)._2
    val p = lrScore((0 to 3).map(j => col(s"x$j")), w)
    lrFeatFrame(s, dir)
      .select($"y", p.as("p"))
      .withColumn("p_u", round($"p" * lit(1000000.0)).cast("long"))
      .withColumn("bin", expr("CAST(least(p_u * 10 div 1000000, 9) AS INT)"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"p_u").as("sp"),
        sum($"y".cast("long")).as("sy"),
        sum(round(($"p" - $"y") * ($"p" - $"y") * lit(1000000.0))
          .cast("long")).as("brier_su"))
      .select($"bin", $"n_docs",
        expr("sp div n_docs").as("mean_p_u"),
        expr("sy * 1000000 div n_docs").as("pos_rate_u"),
        $"brier_su")
      .orderBy($"bin")
  }

  /** Bigram language-model cross-entropy of held-out documents: train
    * add-one-smoothed bigram probabilities P(b|a) = (c_ab+1)/(c_a+V) on
    * the train split of [[hashSplit]], score each test-split document by
    * its average negative log-probability (high = surprising / possibly
    * corrupt text — a model-based quality filter). The model tables are
    * bounded by the vocabulary (distinct unigrams/bigrams), so they
    * broadcast; scoring is then a single scan over the eval token
    * stream. At an unbounded vocabulary the model would be capped to
    * top-V unigrams first — V here doubles as the smoothing constant.
    */
  def bigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id", $"bucket", text.tokensLower($"text").as("toks"))
    val train = toks.filter($"bucket" < 80)
    val cAb = train
      .select(explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("c_ab"))
    val cA = train
      .select(explode($"toks").as("a"))
      .groupBy($"a").agg(count(lit(1)).as("c_a"))
    val vocab = cA.agg(count(lit(1)).as("v"))
    toks.filter($"bucket" >= 90)
      .select($"doc_id", explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .withColumn("a", split($"g", " ").getItem(0))
      .join(broadcast(cAb), Seq("g"), "left")
      .join(broadcast(cA), Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce($"c_ab", lit(0L)) + 1).cast("double") /
          (coalesce($"c_a", lit(0L)) + $"v").cast("double")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(-avg($"logp"), 4).as("xent"))
      .orderBy($"doc_id")
  }

  /** Zipf-fit audit of the corpus vocabulary: least-squares slope of
    * ln(freq) against ln(rank) over tokens with freq ≥ minFreq — natural
    * text tracks slope ≈ −1, so a far-off slope flags synthetic or
    * templated corpora. The slope comes from explicit Σx/Σy/Σxy/Σx²
    * (the same closed form on both oracle sides, over a deterministic
    * ranked set), not an engine's regr_slope whose merge path may
    * differ. Token counting is the usual map-side-combined groupBy; the
    * rank rides [[Relational.globalRowNumber]]'s range-partitioned
    * two-pass (a web-corpus vocabulary is 10⁸+ types — too big for a
    * single-partition window), and the regression collapses to one
    * 5-sum aggregate.
    */
  def zipfSlope(s: SparkSession, dir: String, minFreq: Long = 5): DataFrame = {
    import s.implicits._
    val freqs = docsFanned(s, dir)
      .select(explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
      .filter($"freq" >= minFreq)
    // vocabulary-sized rank: range-partitioned two-pass — a bare
    // Window.orderBy would sort a 10⁸+-type web vocabulary on ONE task;
    // (freq desc, tok) is a total order so the ranks are identical
    val ranked = Relational.globalRowNumber(freqs, Seq($"freq".desc, $"tok"))
      .select(log($"rk".cast("double")).as("x"),
        log($"freq".cast("double")).as("y"))
    ranked
      .agg(count(lit(1)).as("n_tokens"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sx2"))
      .select($"n_tokens",
        round(($"n_tokens" * $"sxy" - $"sx" * $"sy") /
          ($"n_tokens" * $"sx2" - $"sx" * $"sx"), 4).as("slope"))
  }

  /** Kneser–Ney smoothed bigram cross-entropy of the eval split — the
    * smoothing that actually wins LM benchmarks (Kneser & Ney 1995; Chen
    * & Goodman 1999's fixed-discount form, D = `dMilli`/1000): unlike
    * the add-one model ([[bigramSurprisal]]'s), mass freed by
    * discounting flows to the CONTINUATION unigram P_cont(w) ∝ #distinct
    * predecessors — "francisco" is frequent but follows only "san", so
    * KN stops overpredicting it after novel contexts. All model terms
    * are exact integer ppm with floor divisions in a fixed shape
    * (discounted term, backoff weight λ(v) = D·N1+(v·)/c(v),
    * continuation from distinct-bigram counts), one rounded ln per
    * scored bigram, integer mean per doc — engine-replayable throughout.
    * Scale: model tables are vocabulary-bounded broadcasts off ONE
    * distinct-bigram rollup; scoring is a single eval-split scan.
    */
  def kneserNeySurprisal(s: SparkSession, dir: String,
                         dMilli: Long = 750L): DataFrame = {
    import s.implicits._
    val toksF = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id", $"bucket", text.tokensLower($"text").as("toks"))
      .localCheckpoint() // model counts + eval scoring read it
    val cAbF = toksF.filter($"bucket" < 80)
      .select(explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("c_ab"))
      .withColumn("a", split($"g", " ").getItem(0))
      .withColumn("b", split($"g", " ").getItem(1))
      .localCheckpoint() // three model rollups read it
    val byA = cAbF.groupBy($"a")
      .agg(sum($"c_ab").as("c_a"), count(lit(1)).as("n1_fwd"))
    val byB = cAbF.groupBy($"b").agg(count(lit(1)).as("n1_back"))
    val tT = cAbF.agg(count(lit(1)).as("t_types"))
    toksF.filter($"bucket" >= 90)
      .select($"doc_id", explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .withColumn("a", split($"g", " ").getItem(0))
      .withColumn("b", split($"g", " ").getItem(1))
      .join(broadcast(cAbF.select($"g", $"c_ab")), Seq("g"), "left")
      .join(broadcast(byA), Seq("a"), "left")
      .join(broadcast(byB), Seq("b"), "left")
      .crossJoin(broadcast(tT))
      .withColumn("pcont_ppm",
        expr("coalesce(n1_back, 0) * 1000000 div t_types"))
      .withColumn("p_ppm", expr(
        s"""greatest(1, CASE WHEN c_a IS NULL THEN pcont_ppm
           ELSE greatest(coalesce(c_ab, 0) * 1000 - $dMilli, 0) * 1000 div c_a
             + ($dMilli * 1000 * n1_fwd div c_a) * pcont_ppm div 1000000
           END)"""))
      .withColumn("lp_u", round(-log($"p_ppm".cast("double") / 1000000.0)
        * 1000000.0).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lp_u").as("slp"))
      .select($"doc_id", $"n_bigrams",
        expr("slp div n_bigrams").as("xent_kn_u"))
      .orderBy($"doc_id")
  }

  /** Flesch reading-ease per document — the classic readability screen
    * (word/sentence and syllable/word ratios) that catches both
    * run-on-sentence boilerplate (low score) and telegraphic fragment
    * spam (implausibly high score) with zero model state. Syllables are
    * the standard vowel-group proxy ([aeiouy]+ runs, floor 1/word);
    * sentences count terminal-punctuation runs (floor 1). The score is
    * the textbook double expression evaluated in ONE fixed shape on
    * exact integer counts, rounded once to milli — engine-identical.
    * Scale: one fan-out for syllables (map-side-combined re-agg), one
    * doc-level projection, join on doc_id; nothing corpus-wide.
    */
  def readabilityScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docsFanned(s, dir)
      .select($"doc_id", $"text", text.tokensLower($"text").as("toks"))
    val syl = base.select($"doc_id", explode($"toks").as("tok"))
      .select($"doc_id", greatest(lit(1L),
        size(regexp_extract_all($"tok", lit("[aeiouy]+"), lit(0)))
          .cast("long")).as("sy"))
      .groupBy($"doc_id").agg(sum($"sy").as("n_syllables"))
    base.select($"doc_id",
        size($"toks").cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all($"text", lit("[.!?]+"), lit(0)))
            .cast("long")).as("n_sentences"))
      .filter($"n_words" > 0)
      .join(syl, Seq("doc_id"))
      .withColumn("flesch_milli", round((lit(206.835)
        - lit(1.015) * ($"n_words".cast("double") / $"n_sentences".cast("double"))
        - lit(84.6) * ($"n_syllables".cast("double") / $"n_words".cast("double")))
        * 1000).cast("long"))
      .withColumn("band", when($"flesch_milli" >= 90000L, "very_easy")
        .when($"flesch_milli" >= 70000L, "easy")
        .when($"flesch_milli" >= 50000L, "medium")
        .when($"flesch_milli" >= 30000L, "hard")
        .otherwise("very_hard"))
      .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
        $"flesch_milli", $"band")
      .orderBy($"doc_id")
  }

  /** Murphy decomposition of the quality classifier's Brier score —
    * reliability − resolution + uncertainty over the
    * [[qualityLrCalibration]] deciles, the one-row verdict on WHERE the
    * probability error lives: reliability (bin means off their observed
    * rates — fixable by recalibration) vs resolution (how much the bins
    * actually separate outcomes — not fixable post hoc) vs uncertainty
    * (the base rate's intrinsic floor). Terms are micro-unit integer
    * floors over the 10-bin rollup (Δ_u² sums ride DECIMAL, one
    * division each); `decomp_gap_u` reports the binning+flooring
    * residual against the row-level Brier sum as data rather than
    * pretending the identity is exact in fixed point.
    */
  def qualityBrierDecomposition(s: SparkSession, dir: String,
                                steps: Int = 5, lr: Double = 0.5): DataFrame = {
    import s.implicits._
    val dec = "DECIMAL(38,0)"
    val bins = qualityLrCalibration(s, dir, steps, lr)
      .localCheckpoint() // three term rollups read it
    bins
      .withColumn("n_total", sum($"n_docs").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("ybar_u", expr(
        "sum(pos_rate_u * n_docs) OVER () div n_total"))
      .agg(max($"n_total").as("n_docs"), max($"ybar_u").as("ybar_u"),
        sum($"brier_su").as("brier_s"),
        sum(($"mean_p_u" - $"pos_rate_u").cast(dec)
          * ($"mean_p_u" - $"pos_rate_u") * $"n_docs").as("rel_num"),
        sum(($"pos_rate_u" - $"ybar_u").cast(dec)
          * ($"pos_rate_u" - $"ybar_u") * $"n_docs").as("res_num"))
      .select($"n_docs", $"ybar_u",
        expr("brier_s div n_docs").as("brier_u"),
        expr(s"CAST(rel_num div (CAST(n_docs AS $dec) * 1000000) AS BIGINT)")
          .as("reliability_u"),
        expr(s"CAST(res_num div (CAST(n_docs AS $dec) * 1000000) AS BIGINT)")
          .as("resolution_u"),
        expr("ybar_u * (1000000 - ybar_u) div 1000000").as("uncertainty_u"))
      .withColumn("decomp_gap_u", $"brier_u" -
        ($"reliability_u" - $"resolution_u" + $"uncertainty_u"))
  }

  /** Largest-remainder (Hamilton) apportionment of a sampling budget
    * across sources — the exact integer answer to "give me a
    * `budget`-doc sample proportional to source mass" that floating
    * quotas can't deliver (floors alone under-fill the budget; naive
    * rounding overfills). Per source: quota = budget·n_s/N as floor +
    * remainder; the unfilled seats go to the largest remainders
    * (source-name tie-break), so Σ alloc = budget EXACTLY and no
    * source deviates from its real quota by ≥ 1. This is the
    * allocation layer under every stratified corpus draw
    * ([[mixtureSample]] picks WHICH docs; this decides HOW MANY).
    * All integer; the only windows run on the |sources|-bounded
    * rollup.
    */
  def largestRemainderAllocation(s: SparkSession, dir: String,
                                 budget: Long = 1000L): DataFrame = {
    import s.implicits._
    val srcs = Tables(s, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    srcs
      .withColumn("n_total", sum($"n_docs").over(all))
      .withColumn("base", expr(s"$budget * n_docs div n_total"))
      .withColumn("rem", expr(s"($budget * n_docs) % n_total"))
      .withColumn("leftover", lit(budget) - sum($"base").over(all))
      .withColumn("rrank", row_number()
        .over(Window.orderBy($"rem".desc, $"source")).cast("long"))
      .withColumn("alloc",
        $"base" + when($"rrank" <= $"leftover", 1L).otherwise(0L))
      .select($"source", $"n_docs", $"base", $"rem", $"rrank",
        $"alloc",
        expr(s"alloc * 1000000 div $budget").as("alloc_ppm"),
        expr("n_docs * 1000000 div n_total").as("mass_ppm"))
      .orderBy($"source")
  }

  /** Word2vec-style negative-sampling table + draw audit: the top-`vocab`
    * tokens weighted by freq^(3/4) (Mikolov et al. 2013's unigram
    * smoothing — the 3/4 power lifts rare words enough that negatives
    * aren't all stopwords), materialized as cumulative [lo, hi) ranges,
    * then `nSamples` deterministic md5 draws assigned through the
    * inverse-CDF range join so expected vs drawn share is auditable in
    * ppm. Exactness: freq^0.75 = sqrt(sqrt(freq³)) — two IEEE
    * correctly-rounded sqrts on an exactly-represented integer cube
    * (freq < 2¹⁷ holds for any per-token count this audit would run on;
    * beyond that, pre-bucket counts), so no libm pow whose last ulp
    * differs across engines; draws are 60-bit md5 ints mod the weight
    * total. Scale: the token count is the map-side-combined groupBy,
    * the range table is vocab-bounded (broadcast), draws are one
    * generator scan — the range join is draws × broadcast(vocab), never
    * a shuffle.
    */
  def negativeSampling(s: SparkSession, dir: String, vocab: Int = 100,
                       nSamples: Int = 2000): DataFrame = {
    import s.implicits._
    val bounded = Window.orderBy($"freq".desc, $"tok") // ≤ vocab rows
    val ranges = docsFanned(s, dir)
      .select(explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"tok").limit(vocab)
      .withColumn("w",
        floor(sqrt(sqrt(($"freq" * $"freq" * $"freq").cast("double"))) * 1000)
          .cast("long"))
      .withColumn("hi", sum($"w").over(
        bounded.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lo", $"hi" - $"w")
      .withColumn("w_tot", sum($"w").over(
        bounded.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .localCheckpoint() // draw assignment + presentation both read it
    val tot = ranges.agg(max($"w_tot").as("w_tot"))
    val draws = s.range(nSamples).toDF("i")
      .crossJoin(broadcast(tot)) // 1-row scalar frame
      .select((conv(substring(md5(concat(lit("neg:"), $"i".cast("string"))),
        1, 15), 16, 10).cast("long") % $"w_tot").as("u"))
    val drawn = draws
      .join(broadcast(ranges.select($"tok", $"lo", $"hi")),
        $"u" >= $"lo" && $"u" < $"hi")
      .groupBy($"tok").agg(count(lit(1)).as("n_drawn"))
    ranges.join(drawn, Seq("tok"), "left")
      .select($"tok", $"freq", $"w".as("w_u"),
        expr("w * 1000000 div w_tot").as("exp_ppm"),
        coalesce($"n_drawn", lit(0L)).as("n_drawn"),
        expr(s"coalesce(n_drawn, 0) * 1000000 div $nSamples")
          .as("drawn_ppm"))
      .orderBy($"freq".desc, $"tok")
  }

  /** Token co-occurrence lift over a bounded vocabulary: the top-`vocab`
    * tokens by document frequency, paired within documents, scored by
    * pointwise lift `n_ab·N / (df_a·df_b)` (PMI sans the log — the log
    * adds nothing to ranking and libm implementations differ in the last
    * ulp across engines). The vocabulary cap is the scale lever: each
    * doc's vocab hits collapse to ONE sorted array (≤ vocab structs of
    * bounded size), pairs generate in-row from that array — ≤ vocab²/2
    * per doc regardless of corpus size — and the pair rollup is a
    * map-side-combined groupBy over a ≤ vocab²-key space. No self-join:
    * the former doc_id-blocked self-join shuffled the vocab-hit stream
    * twice and joined; this shape shuffles it once into the per-doc
    * collect. Integer operands keep the double arithmetic bit-exact.
    */
  def tokenCooccurrence(s: SparkSession, dir: String, vocab: Int = 40,
                        minPairs: Int = 5, k: Int = 50): DataFrame = {
    import s.implicits._
    val docToks = docsFanned(s, dir)
      .select($"doc_id", explode(text.distinctTokens($"text")).as("tok"))
    val df = docToks.groupBy($"tok").agg(count(lit(1)).as("df"))
    val top = df.orderBy($"df".desc, $"tok").limit(vocab)
    val nDocs = Tables(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    // per-doc sorted (tok, df) array; strictly-after pairing over the
    // sorted array gives each unordered pair once with tok_a < tok_b
    val perDoc = docToks.join(broadcast(top), Seq("tok"))
      .groupBy($"doc_id")
      .agg(array_sort(collect_list(struct($"tok", $"df"))).as("ts"))
    perDoc
      .select(explode(expr(
        """flatten(transform(ts, (x, i) ->
             transform(slice(ts, i + 2, size(ts)), y ->
               struct(x.tok AS tok_a, y.tok AS tok_b,
                      x.df AS df_a, y.df AS df_b))))""")).as("p"))
      .select($"p.*")
      .groupBy($"tok_a", $"tok_b", $"df_a", $"df_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= minPairs)
      .crossJoin(broadcast(nDocs))
      .select($"tok_a", $"tok_b", $"n_ab",
        round($"n_ab".cast("double") * $"n_docs" / ($"df_a" * $"df_b"), 4).as("lift"))
      .orderBy($"lift".desc, $"tok_a", $"tok_b")
      .limit(k)
  }

  /** Acceptance audit for the SpaceSaving heavy-hitters sketch in batch:
    * run the typed Aggregator per language with `capacity` counters over
    * the token stream, then assert the sketch's order-independent
    * guarantee against exact counts — every reported count overestimates
    * its true frequency by at most floor(N/capacity) (each partial's
    * eviction inheritance injects ≤ floor(N_p/capacity), keywise-sum
    * merging adds the partials' bounds, and the trim only drops keys).
    * The tracked-set SIZE is also order-independent (= min(capacity,
    * vocabulary)), so both witness columns and the ok flag are
    * deterministic at any parallelism even though WHICH tail keys the
    * sketch tracks can vary with merge order — same oracle pattern as
    * [[Events.approxQuantileAudit]]. Bounded state per group is the
    * 100 TB story: capacity counters regardless of key cardinality.
    */
  /** CCNet-style boilerplate scoring: a shingle appearing in ≥ `minDocs`
    * distinct documents is boilerplate (headers, footers, navigation,
    * license blurbs — content shared across documents rather than
    * authored in one), and each document is scored by the fraction of
    * its shingle occurrences that are boilerplate — the filter signal a
    * web-scale corpus applies before training. Two shuffles, both
    * key-bounded: document frequency per shingle (vocab-bounded, the
    * same key space as the minhash pipeline), then the occurrence join
    * back (boilerplate set ≤ vocab; AQE broadcasts it when small).
    * Documents with no full shingle are absent, matching the minhash
    * convention.
    */
  def boilerplateScores(s: SparkSession, dir: String, shingleSize: Int = 3,
                        minDocs: Int = 4): DataFrame = {
    import s.implicits._
    // one materialization feeds the document-frequency aggregation and
    // the per-doc occurrence join
    val sh = Dedup.shingleStream(Tables(s, dir, "documents"), shingleSize)
      .localCheckpoint()
    val bp = sh.select($"doc_id", $"sh").distinct()
      .groupBy($"sh").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= minDocs)
      .select($"sh", lit(1).as("isbp"))
    sh.join(bp, Seq("sh"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce($"isbp", lit(0))).cast("long").as("n_boilerplate"))
      .select($"doc_id", $"n_shingles", $"n_boilerplate",
        round($"n_boilerplate".cast("double") / $"n_shingles", 4).as("bp_frac"))
      .orderBy($"doc_id")
  }

  /** Deterministic training order: every document gets a (shard, pos)
    * from the md5 of (seed, doc_id) — a reproducible global shuffle, the
    * property a training run needs so a restart (or a second lab)
    * consumes the corpus in the identical order. Same md5-bucket idiom
    * as [[hashSplit]]. Scale shape: the position window is
    * hash-partition-by-shard + sort-within — exactly one shuffle of
    * (doc_id, key) pairs, never the payload; at export time the order
    * rides `repartition(shard).sortWithinPartitions(ok)` into the
    * shard writer.
    */
  /** The (ok, shard) training-order key columns over `doc_id` — ONE
    * definition shared by [[trainingOrder]] and
    * `Export.orderedTrainingShards`, because the export's file layout
    * guarantees it replays exactly this permutation: a divergent copy of
    * the hash scheme would silently break that property.
    */
  private[graft] def trainingOrderKey(nShards: Int, seed: String): (Column, Column) = {
    val ok = md5(concat_ws(":", lit(seed), col("doc_id")))
    val shard = pmod(conv(substring(ok, 1, 15), 16, 10).cast("long"), lit(nShards))
      .cast("int")
    (ok, shard)
  }

  def trainingOrder(s: SparkSession, dir: String, nShards: Int = 8,
                    seed: String = "s0"): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"shard").orderBy($"ok", $"doc_id")
    val (ok, shard) = trainingOrderKey(nShards, seed)
    Tables(s, dir, "documents")
      .select($"doc_id", ok.as("ok"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"shard", $"pos")
  }

  /** Dataset card: the per-(lang, source) summary a corpus release
    * publishes — document and token volume, mean quality, exact-dup
    * incidence — assembled in ONE pass over the documents plus one
    * hash-group for the dup flags (each a single shuffle on a bounded
    * key space). Mean quality is computed from the 4dp-rounded per-doc
    * scores lifted to integer ten-thousandths and summed as longs:
    * integer sums are order-independent, so the average is
    * bit-reproducible at any parallelism and engine-portable (a double
    * running sum is neither).
    */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = docsFanned(s, dir)
      .select($"lang", $"source", $"n_chars",
        md5($"text").as("h"),
        size(text.tokensLower($"text")).cast("long").as("n_toks"),
        round(text.qualityScore($"text", $"n_chars") * 10000).cast("long").as("q4"))
    val dupGroups = Tables(s, dir, "documents")
      .groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("n_copies"))
    scored.join(dupGroups, Seq("h"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").as("n_tokens"),
        sum($"n_chars").as("n_chars"),
        sum($"q4").as("sq4"),
        sum(when($"n_copies" > 1, 1L).otherwise(0L)).as("n_exact_dup_docs"))
      // mean via integer floor-division to a fixed 10^-8 scale: a float
      // divide + round can land exactly on a .5 boundary where engines'
      // decimal-vs-binary rounding diverge (observed: 26794/4/10^4);
      // integer div of identical longs is bit-identical everywhere and
      // the final /1e8 maps the same integer to the same double
      .select($"lang", $"source", $"n_docs", $"n_tokens", $"n_chars",
        (expr("sq4 * 10000 div n_docs").cast("double") / 1e8).as("avg_quality"),
        $"n_exact_dup_docs")
      .orderBy($"lang", $"source")
  }

  /** Filter-cascade audit: document and token survivor counts through
    * the ordered filter chain a pretraining corpus applies — minimum
    * length, quality score, language-ID agreement, distinct-token ratio
    * (the repetition guard). The report every pipeline publishes before
    * training ("how much survives each gate, and where does the volume
    * go"). One scan computes every per-doc flag plus the first-failing
    * stage; ONE map-side-combined aggregation folds the corpus to ten
    * numbers; `stack` unpivots those to the 5-row report — at 100 TB
    * this is parquet-scan speed with a 10-column reduce. The only
    * document-row exchange is the deliberate regex fan-out scatter; the
    * reduce itself moves ten longs per task.
    */
  /** Cascade gate thresholds — shared by [[filterCascade]], the SQL
    * oracle, and `Streams.qualityGate` so the three cannot drift.
    */
  val DefaultMinChars: Long = 150L
  val DefaultMinQuality: Double = 0.65

  /** Per-document cascade level (doc_id, n_toks, lvl) — the first
    * failing stage, 4 = passes all; shared by [[filterCascade]]'s
    * aggregate view and [[releaseManifest]]'s quality gate.
    */
  private[graft] def cascadeLevels(s: SparkSession, dir: String,
                                   minChars: Long = DefaultMinChars,
                                   minQuality: Double = DefaultMinQuality)
      : DataFrame = {
    import s.implicits._
    // staged like langIdConfusion: tokenize once, stopword-hit counts as
    // named columns, CASE over plain columns (inlining langId would
    // re-tokenize per language per branch)
    val scored = docsFanned(s, dir)
      .select($"doc_id", $"lang", $"n_chars", $"text",
        text.tokensLower($"text").as("toks"))
      .select($"doc_id", $"lang", $"n_chars",
        size($"toks").cast("long").as("n_toks"),
        text.qualityScoreTokens($"text", $"toks", $"n_chars").as("q"),
        (size(array_distinct($"toks")) * 2 >= size($"toks")).as("dok"),
        text.stopwordHitsTokens($"toks", text.stopwords("en")).as("en"),
        text.stopwordHitsTokens($"toks", text.stopwords("de")).as("de"),
        text.stopwordHitsTokens($"toks", text.stopwords("fr")).as("fr"),
        text.stopwordHitsTokens($"toks", text.stopwords("es")).as("es"),
        text.cjkCharCount($"text").as("cjk"))
      .withColumn("pred",
        text.langIdFromHits($"cjk", $"en", $"de", $"fr", $"es"))
    // first failing stage (docs passing all four get level 4); a doc at
    // level L survives stages 0..L of the cascade
    val lvl = when($"n_chars" < minChars, 0)
      .when($"q" < minQuality, 1)
      .when($"pred" =!= $"lang", 2)
      .when(!$"dok", 3)
      .otherwise(4)
    scored.withColumn("lvl", lvl)
      .select($"doc_id", $"n_toks", $"lvl")
  }

  def filterCascade(s: SparkSession, dir: String,
                    minChars: Long = DefaultMinChars,
                    minQuality: Double = DefaultMinQuality): DataFrame = {
    import s.implicits._
    val cols = (0 to 4).flatMap(i => Seq(
      sum(when($"lvl" >= i, 1L).otherwise(0L)).as(s"n$i"),
      sum(when($"lvl" >= i, $"n_toks").otherwise(0L)).as(s"t$i")))
    cascadeLevels(s, dir, minChars, minQuality)
      .agg(cols.head, cols.tail: _*)
      .selectExpr(
        """stack(5,
           0, 'raw',            n0, t0,
           1, 'min_length',     n1, t1,
           2, 'quality',        n2, t2,
           3, 'lang_match',     n3, t3,
           4, 'distinct_ratio', n4, t4) AS (stage, stage_name, n_docs, n_tokens)""")
      .orderBy($"stage")
  }

  /** Cross-doc repeated-span report: the n-gram spans that appear in ≥
    * `minDocs` distinct documents, ranked by spread then volume — the
    * span-granular dedup signal (repeated lines/spans are scrubbed at
    * span level where whole-doc dedup can't see them, and the top
    * offenders are what a corpus owner actually reads). One shuffle on
    * the shingle key (the same key space as the MinHash document-
    * frequency pass), then a top-k that plans as TakeOrdered — per-
    * partition heads only, never a global sort of the span table.
    * Ordering is fully deterministic ((n_docs, n_occur) desc, span) so
    * the cut is reproducible across engines and runs.
    */
  def repeatedSpans(s: SparkSession, dir: String, spanTokens: Int = 8,
                    minDocs: Int = 2, k: Int = 25): DataFrame = {
    import s.implicits._
    Dedup.shingleStream(Tables(s, dir, "documents"), spanTokens)
      .groupBy($"sh".as("span"))
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occur"))
      .filter($"n_docs" >= minDocs)
      .orderBy($"n_docs".desc, $"n_occur".desc, $"span")
      .limit(k)
  }

  /** Shared with the SQL oracle so the two cannot drift. */
  val DefaultMixtureBudget: Long = 10000L

  /** Temperature-weighted source-mixture sampling: draw a deterministic
    * subsample whose per-source token volume tracks weight ∝ √(source
    * tokens) — the τ=0.5 temperature mix a multi-source pretraining run
    * uses to up-weight small sources without drowning in the biggest
    * one. Per-source keep-rates come from PURE INTEGER arithmetic
    * (⌊√total⌋ weights, basis-point rate via integer division) so the
    * rate is bit-identical on any engine — a float Σ√ would round
    * differently per association order and flip docs at the rate
    * boundary. Membership is the md5-bucket draw of [[hashSplit]] at
    * 1/10000 granularity: content-independent, stable across reruns.
    * Scale shape: one token-count scan folds to a ~|sources|-row rate
    * table that broadcasts back over a second scan — no shuffle of
    * document rows; at 100 TB the totals scan is the same pass a corpus
    * stats job already runs.
    */
  /** Basis-point keep rate over (w, sw, total) columns. DECIMAL(38,0)
    * intermediates: at petascale token counts the Long products overflow
    * (total ~1e13 -> sw*total ~3e19 > Long.MAX; Spark would wrap
    * negative and silently zero the source's sample, DuckDB would
    * error). 128-bit integral division is exact and identical on both
    * engines, so the rate stays bit-portable at any corpus size —
    * property-tested against BigInt reference math at petascale values.
    */
  private[graft] def mixtureRateBp(budgetTokens: Long): Column =
    least(lit(10000L), expr(
      s"(CAST($budgetTokens AS DECIMAL(38,0)) * w * 10000)" +
        " div (CAST(sw AS DECIMAL(38,0)) * total)"))

  def mixtureSample(s: SparkSession, dir: String,
                    budgetTokens: Long = DefaultMixtureBudget): DataFrame = {
    import s.implicits._
    val perSrc = docsFanned(s, dir)
      .select($"source", size(text.tokensLower($"text")).cast("long").as("nt"))
      .groupBy($"source").agg(sum($"nt").as("total"))
      .withColumn("w", floor(sqrt($"total".cast("double"))).cast("long"))
    val sumW = perSrc.agg(sum($"w").as("sw"))
    val rates = perSrc.crossJoin(broadcast(sumW))
      .withColumn("rate_bp", mixtureRateBp(budgetTokens))
      .select($"source", $"rate_bp")
    docsFanned(s, dir)
      .select($"doc_id", $"source",
        hashBucketMod($"doc_id", "mix:", 10000L).as("bk"))
      .join(broadcast(rates), Seq("source"))
      .filter($"bk" < $"rate_bp")
      .select($"doc_id", $"source", $"rate_bp".cast("int").as("rate_bp"))
      .orderBy($"doc_id")
  }

  def topkAudit(s: SparkSession, dir: String, capacity: Int = 16): DataFrame = {
    import s.implicits._
    val tok = docsFanned(s, dir)
      .select($"lang", explode(text.tokensLower($"text")).as("tok"))
    val sketch = tok.as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.aggregates.SpaceSavingTopK(capacity, capacity).toColumn)
      .toDF("lang", "sketch")
      .select($"lang", explode($"sketch").as("e"))
      .select($"lang", $"e._1".as("tok"), $"e._2".as("c"))
    val exact = tok.groupBy($"lang", $"tok").agg(count(lit(1)).as("f"))
    val totals = tok.groupBy($"lang").agg(count(lit(1)).as("n_tokens"))
    sketch.join(exact, Seq("lang", "tok"))
      .join(broadcast(totals), Seq("lang"))
      .groupBy($"lang")
      .agg(max($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_tracked"),
        bool_and($"c" <= $"f" + floor($"n_tokens" / capacity)).as("ok"))
      .orderBy($"lang")
  }

  /** Trigram stupid-backoff LM scoring of the held-out split — the
    * cheap-and-cheerful n-gram perplexity filter training pipelines run
    * before anything neural: score S(w3|w1 w2) = c3/c2 when the trigram
    * was seen in training, else 0.4*c(w2 w3)/c(w2), else
    * 0.4^2*(c(w3)+1)/(N+V) (add-one floor so OOV tokens stay finite).
    * "Stupid" because the backoff weight is a constant, not a proper
    * discount — no normalization pass over the count tables, which is
    * exactly why it scales to web corpora.
    *
    * Determinism: each trigram's ln(score) is a single fixed-shape IEEE
    * expression over exact integer counts, rounded to 1e-6 micro-units
    * (the PSI discipline), so per-doc sums are order-free longs.
    *
    * Shape: three count tables from one training scan each (map-side
    * combined), probe-joined into the eval trigrams. Broadcast fits the
    * synthetic corpus; at web scale the trigram table outgrows it and
    * the hints drop away — the probes become plain shuffle joins on the
    * n-gram key, still one pass over eval.
    */
  def trigramBackoff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docsFanned(s, dir)
      .withColumn("bucket", hashBucket($"doc_id", "split:"))
      .select($"doc_id", $"bucket", text.tokensLower($"text").as("toks"))
    val train = toks.filter($"bucket" < 80)
    val c3 = train
      .select(explode(text.shinglesFromTokens($"toks", 3)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("c3"))
    val c2 = train
      .select(explode(text.shinglesFromTokens($"toks", 2)).as("b2"))
      .groupBy($"b2").agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode($"toks").as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c1"))
    val tot = c1.agg(sum($"c1").as("nn"), count(lit(1)).as("v"))
    toks.filter($"bucket" >= 90)
      .select($"doc_id",
        explode(text.shinglesFromTokens($"toks", 3)).as("g"))
      .withColumn("w", split($"g", " "))
      .join(broadcast(c3), Seq("g"), "left")
      .join(broadcast(c2.select($"b2".as("ab"), $"c2".as("cab"))),
        concat_ws(" ", $"w".getItem(0), $"w".getItem(1)) === $"ab", "left")
      .join(broadcast(c2.select($"b2".as("bc"), $"c2".as("cbc"))),
        concat_ws(" ", $"w".getItem(1), $"w".getItem(2)) === $"bc", "left")
      .join(broadcast(c1.select($"t".as("tb"), $"c1".as("cb"))),
        $"w".getItem(1) === $"tb", "left")
      .join(broadcast(c1.select($"t".as("tc"), $"c1".as("cc"))),
        $"w".getItem(2) === $"tc", "left")
      .crossJoin(broadcast(tot))
      // seen trigram implies seen context bigram, seen backoff bigram
      // implies seen middle unigram — the guarded branches never div/0
      .withColumn("logp_u", round(
        when($"c3".isNotNull, log($"c3".cast("double") / $"cab"))
          .when($"cbc".isNotNull, log(lit(0.4) * $"cbc" / $"cb"))
          .otherwise(log(lit(0.16) * (coalesce($"cc", lit(0L)) + 1)
            / ($"nn" + $"v")))
          * 1e6).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum($"logp_u").as("sum_logp_u"))
      .select($"doc_id", $"n_trigrams", $"sum_logp_u",
        round(-($"sum_logp_u" / 1e6) / $"n_trigrams", 4).as("xent"))
      .orderBy($"doc_id")
  }

  /** Lorenz curve + Gini coefficient of token mass across sources: the
    * standard concentration audit a mixture owner runs before trusting
    * per-source weights — a Gini near 0 means the corpus is evenly
    * sourced, near 1 means one provider dominates and every "diverse
    * mixture" claim is cosmetic. Sources sorted ascending by mass (ties
    * by name, so rank is total); per-source rows carry the cumulative
    * Lorenz share and the global Gini via the mean-difference identity
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) — every term an exact long,
    * one floor division to basis points. The window runs over the
    * per-source rollup (|sources| rows), never the corpus.
    */
  def giniSources(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = docsFanned(s, dir)
      .select($"source", size(text.tokensLower($"text")).cast("long").as("tk"))
      .groupBy($"source").agg(sum($"tk").as("n_tokens"))
    val ord = Window.orderBy($"n_tokens", $"source")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    per
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("cum", sum($"n_tokens").over(ord.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum($"n_tokens").over(all))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("wsum", sum($"i" * $"n_tokens").over(all))
      .select($"source", $"n_tokens", $"i".cast("int").as("rank"),
        expr("cum * 10000 div tot").as("lorenz_bp"),
        expr("(2 * wsum - (m + 1) * tot) * 10000 div (m * tot)")
          .as("gini_bp"))
      .orderBy($"rank")
  }

  /** Cohen's kappa between two independent quality screens — the Gopher
    * rule suite ([[gopherRules]]) and the composite quality-score
    * threshold — measuring whether the screens agree beyond chance. Two
    * screens with high raw overlap but kappa ≈ 0 are redundant with the
    * base rate, not with each other; that is the number that decides
    * whether running both filters buys anything. The 2×2 confusion is
    * four exact longs; po, pe and kappa are integer cross-products, with
    * kappa's possibly-negative micro value floor-divided through the
    * non-negative shift (the [[sourceLangMi]] trick) so Spark's `div`
    * and SQL's `//` agree on sign.
    */
  def screenKappa(s: SparkSession, dir: String,
                  requiredWords: Seq[String] = Seq("the", "a")): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
    // corpus-tuned required-word list (the q_gopher_rules setting) so
    // the Gopher verdict actually varies over this register
    val verdicts = gopherVerdictsFrom(docs, requiredWords)
      .select($"doc_id", $"keep")
    val quality = docs
      .select($"doc_id", $"text", $"n_chars", text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        (round(text.qualityScoreTokens($"text", $"toks", $"n_chars") * 10000)
          .cast("long") >= 5000L).as("hi_q"))
    verdicts.join(quality, "doc_id")
      .agg(sum(when($"keep" && $"hi_q", 1L).otherwise(0L)).as("a"),
        sum(when($"keep" && !$"hi_q", 1L).otherwise(0L)).as("b"),
        sum(when(!$"keep" && $"hi_q", 1L).otherwise(0L)).as("c"),
        sum(when(!$"keep" && !$"hi_q", 1L).otherwise(0L)).as("d"))
      .withColumn("n", $"a" + $"b" + $"c" + $"d")
      .withColumn("po_bp", expr("(a + d) * 10000 div n"))
      .withColumn("pe_bp",
        expr("((a + b) * (a + c) + (c + d) * (b + d)) * 10000 div (n * n)"))
      // kappa = 2(ad − bc) / ((a+b)(b+d) + (a+c)(c+d)) ∈ [−1, 1]
      .withColumn("kappa_u",
        expr("(2000000 * (a * d - b * c) " +
          "+ 1000000 * ((a + b) * (b + d) + (a + c) * (c + d))) " +
          "div ((a + b) * (b + d) + (a + c) * (c + d)) - 1000000"))
      .select($"a", $"b", $"c", $"d", $"n", $"po_bp", $"pe_bp", $"kappa_u")
  }

  /** UniMax language-budget allocation (Chung et al. 2023,
    * arXiv:2304.09151): split a token budget across languages as evenly
    * as possible subject to a per-language epoch cap — the principled
    * alternative to temperature sampling ([[temperatureMix]]) that never
    * over-repeats a low-resource language. Exact integer water-filling
    * in one window pass over the per-language rollup: languages sorted
    * ascending by capacity cᵢ = nᵢ·E; language i is capped iff its
    * capacity fits the equal split of what remains at its turn
    * (cᵢ·(m−i+1) ≤ B − Σ_{j<i} cⱼ, an integer cross-product — capacity
    * sorting makes the capped set a prefix), and the uncapped suffix
    * splits the leftover with Hamilton remainders so allocations sum to
    * the budget EXACTLY (the [[temperatureSample]] discipline).
    */
  def unimaxBudget(s: SparkSession, dir: String, epochCap: Int = 2): DataFrame = {
    import s.implicits._
    unimaxFrom(docsFanned(s, dir)
      .select($"lang", size(text.tokensLower($"text")).cast("long").as("tk"))
      .groupBy($"lang").agg(sum($"tk").as("n_tokens")), epochCap)
      .orderBy($"lang")
  }

  /** The water-filling core over ANY (lang, n_tokens) frame — factored
    * out so the spec can drive the capped prefix with skewed counts the
    * near-balanced synthetic corpus never produces.
    */
  private[graft] def unimaxFrom(per0: DataFrame, epochCap: Int): DataFrame = {
    val s = per0.sparkSession
    import s.implicits._
    val per = per0.withColumn("cap", $"n_tokens" * epochCap)
    val ord = Window.orderBy($"cap", $"lang")
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    per
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("budget", sum($"n_tokens").over(all))
      .withColumn("cum_before", coalesce(sum($"cap").over(before), lit(0L)))
      .withColumn("capped",
        $"cap" * ($"m" - $"i" + 1L) <= $"budget" - $"cum_before")
      // the capped set is a prefix of the capacity order; what the
      // uncapped suffix shares is the budget minus all capped capacity
      .withColumn("j", sum(when($"capped", 1L).otherwise(0L)).over(all))
      .withColumn("rem",
        $"budget" - sum(when($"capped", $"cap").otherwise(0L)).over(all))
      .withColumn("alloc",
        when($"capped", $"cap").otherwise(
          expr("rem div (m - j)") +
            when($"i" - $"j" <= expr("rem % (m - j)"), 1L).otherwise(0L)))
      .select($"lang", $"n_tokens", $"cap", $"capped", $"alloc",
        expr("alloc * 10000 div n_tokens").as("epochs_bp"),
        $"budget")
  }

  /** Good–Turing unseen-mass estimate per language: the share of the
    * NEXT sample expected to be vocabulary never seen in this corpus —
    * N1/N, the classic coverage answer to "have we crawled enough of
    * this language yet" — plus the hapax/dis legomena counts behind it
    * and the Good–Turing adjusted count r* = 2·N2/N1 for once-seen
    * types (how much a raw count of 1 overstates true frequency).
    * Everything is exact integer counts off ONE token rollup; the
    * adjusted count is a single micro-unit floor division guarded
    * against an N1 = 0 corpus.
    */
  def goodTuringMass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"lang", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"lang")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"c" === 2, 1L).otherwise(0L)).as("n2"))
      .select($"lang", $"n_tokens", $"vocab", $"n1", $"n2",
        expr("n1 * 10000 div n_tokens").as("missing_mass_bp"),
        when($"n1" > 0, expr("2000000 * n2 div n1")).as("r1_star_u"))
      .orderBy($"lang")
  }

  /** Chao1 species-richness estimate per language: how many vocabulary
    * types the language HAS, not just how many this corpus saw — the
    * forward-looking complement of [[goodTuringMass]]'s next-sample
    * coverage. Bias-corrected Chao1 = V + n₁(n₁−1)/(2(n₂+1)) is exact
    * integer arithmetic on the same hapax/dis counts; the unseen-type
    * estimate ships separately so a crawl planner can read "≈K types
    * still out there" directly.
    */
  def chao1Richness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsFanned(s, dir)
      .select($"lang", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("vocab"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"c" === 2, 1L).otherwise(0L)).as("n2"))
      .select($"lang", $"vocab", $"n1", $"n2",
        ($"vocab" + expr("n1 * (n1 - 1) div (2 * (n2 + 1))")).as("chao1"),
        expr("n1 * (n1 - 1) div (2 * (n2 + 1))").as("unseen_est"))
      .orderBy($"lang")
  }

  /** Source-mix diversity: Shannon entropy, inverse-Simpson effective
    * source count, and Pielou evenness of the document-count mix — the
    * one-row answer to "is this a 20-source corpus or a 2-source corpus
    * wearing 20 names". Inverse Simpson N²/Σnₛ² is exact rational to
    * milli-units; Shannon rides the per-cell fixed-point ln
    * ([[sourceLangMi]] discipline); evenness divides by ln(m) in the
    * same 1e-6 units, floor.
    */
  def sourceDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables(s, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    per
      .withColumn("nt", sum($"n").over(all))
      .withColumn("lnu",
        round(log($"n".cast("double") / $"nt".cast("double")) * 1e6)
          .cast("long"))
      .agg(count(lit(1)).as("n_sources"), max($"nt").as("n_docs"),
        sum($"n" * $"n").as("sum_sq"),
        expr("(-sum(n * lnu)) div max(nt)").as("shannon_u"))
      .select($"n_sources", $"n_docs",
        expr("n_docs * n_docs * 1000 div sum_sq").as("inv_simpson_milli"),
        $"shannon_u",
        (round(log($"n_sources".cast("double")) * 1e6).cast("long"))
          .as("ln_m_u"))
      .withColumn("evenness_bp", expr("shannon_u * 10000 div ln_m_u"))
  }

  /** ROC AUC between the two quality screens: the composite quality
    * score ranked against the Gopher verdict as the binary label — "if
    * I replaced the rule suite with a threshold on the score, how often
    * would the score rank a Gopher-pass above a Gopher-fail". AUC is
    * the Mann–Whitney statistic, so the doubled-midrank machinery makes
    * it exact: auc_bp = U₁·10⁴/(n₊·n₋) in integer basis points, with
    * the Gini coefficient 2·AUC−1 alongside. The rank window runs over
    * the distinct-score rollup.
    */
  def screenAuc(s: SparkSession, dir: String,
                requiredWords: Seq[String] = Seq("the", "a")): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
    val labels = gopherVerdictsFrom(docs, requiredWords)
      .select($"doc_id", $"keep")
    val scores = docs
      .select($"doc_id", $"text", $"n_chars", text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        round(text.qualityScoreTokens($"text", $"toks", $"n_chars") * 10000)
          .cast("long").as("qu"))
    val cells = labels.join(scores, "doc_id")
      .groupBy($"qu")
      .agg(count(lit(1)).as("t"),
        sum(when($"keep", 1L).otherwise(0L)).as("t1"))
    val before = Window.orderBy($"qu")
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cb", coalesce(sum($"t").over(before), lit(0L)))
      .agg(sum($"t1").as("n_pos"), sum($"t" - $"t1").as("n_neg"),
        sum($"t1" * (lit(2L) * $"cb" + $"t" + 1L)).as("r1_x2"))
      .withColumn("u1_x2", $"r1_x2" - $"n_pos" * ($"n_pos" + 1L))
      .select($"n_pos", $"n_neg",
        expr("u1_x2 * 10000 div (2 * n_pos * n_neg)").as("auc_bp"))
      .withColumn("gini_bp", lit(2L) * $"auc_bp" - 10000L)
  }

  /** Youden-J optimal cutoff for the quality score against the Gopher
    * keep verdicts — the DECIDED threshold [[screenAuc]]'s ranking
    * quality only implies: classify keep at qu ≥ θ, pick θ maximizing
    * J = TPR − FPR. Exact integers: per-score-cell confusion counts
    * from one exclusive prefix window over the 1e-4 quality grid
    * (audit-sized), rates floored to micro units, argmax via
    * min(struct) with the SMALLEST threshold on ties (the permissive
    * end of the plateau). One row: the operating point a pipeline
    * would actually configure, with its full confusion row.
    */
  def youdenCutoff(s: SparkSession, dir: String,
                   requiredWords: Seq[String] = Seq("the", "a")): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = docsFanned(s, dir)
    val labels = gopherVerdictsFrom(docs, requiredWords)
      .select($"doc_id", $"keep")
    val scores = docs
      .select($"doc_id", $"text", $"n_chars",
        text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        round(text.qualityScoreTokens($"text", $"toks", $"n_chars") * 10000)
          .cast("long").as("qu"))
    val cells = labels.join(scores, "doc_id")
      .groupBy($"qu")
      .agg(count(lit(1)).as("t"),
        sum(when($"keep", 1L).otherwise(0L)).as("t1"))
      .localCheckpoint() // totals and the threshold walk both read it
    val tot = cells.agg(sum($"t1").as("n_pos"),
      sum($"t" - $"t1").as("n_neg"))
    val before = Window.orderBy($"qu")
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cp", coalesce(sum($"t1").over(before), lit(0L)))
      .withColumn("cn", coalesce(sum($"t" - $"t1").over(before), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("tp", $"n_pos" - $"cp")
      .withColumn("fp", $"n_neg" - $"cn")
      .withColumn("tpr_u", expr("tp * 1000000 div n_pos"))
      .withColumn("fpr_u", expr("fp * 1000000 div n_neg"))
      .withColumn("j_u", $"tpr_u" - $"fpr_u")
      .agg(min(struct((-$"j_u").as("nj"), $"qu".as("th"), $"tp".as("tp"),
        $"fp".as("fp"), $"tpr_u".as("tpr"), $"fpr_u".as("fpr"))).as("m"),
        max($"n_pos").as("n_pos"), max($"n_neg").as("n_neg"))
      .select($"m.th".as("threshold_qu"), $"n_pos", $"n_neg",
        $"m.tp".as("tp"), $"m.fp".as("fp"), $"m.tpr".as("tpr_u"),
        $"m.fpr".as("fpr_u"), (-$"m.nj").as("j_u"))
  }

  /** Token dispersion (Gries 2008 "DP" — deviation of proportions) for
    * the top-k corpus tokens: how far a token's occurrence mass deviates
    * from the corpus' document-size distribution. DP ≈ 0 means the token
    * spreads like ordinary vocabulary; DP → 1 means it bursts in a few
    * documents — the burstiness screen separating topical terms from
    * boilerplate that raw frequency (and even document frequency)
    * cannot. Exact rational arithmetic by cross-multiplying the two
    * proportion denominators: DP = (Σ_present |c_dt·L − l_d·c_t| +
    * (L − Σ_present l_d)·c_t) / (2·c_t·L) — absent documents contribute
    * their size share in one closed-form term, so the per-token join
    * only ever touches documents the token OCCURS in; the top-k cap
    * bounds the join's probe side at any corpus size.
    */
  def tokenDispersion(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    import s.implicits._
    val docToks = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("l_d"),
        explode($"toks").as("tok"))
      .localCheckpoint() // totals, top-k, and the per-doc scan read it
    val lTot = docToks.agg(count(lit(1)).as("l_tot"))
    val top = docToks.groupBy($"tok").agg(count(lit(1)).as("c_t"))
      .orderBy($"c_t".desc, $"tok").limit(k)
    docToks
      .groupBy($"doc_id", $"l_d", $"tok").agg(count(lit(1)).as("c_dt"))
      .join(broadcast(top), Seq("tok"))
      .crossJoin(broadcast(lTot))
      .groupBy($"tok", $"c_t", $"l_tot")
      .agg(count(lit(1)).as("n_docs_present"),
        sum(abs($"c_dt" * $"l_tot" - $"l_d" * $"c_t")).as("pres_abs"),
        sum($"l_d").as("pres_len"))
      .select($"tok", $"c_t", $"n_docs_present",
        expr("(pres_abs + (l_tot - pres_len) * c_t) * 10000" +
          " div (2 * c_t * l_tot)").as("dp_bp"))
      .orderBy($"c_t".desc, $"tok")
  }

  /** Entropy rate of the token stream per language: unigram entropy H₁
    * and the conditional (bigram) entropy H(w|prev) — the predictability
    * gap between them is how much one token of context buys, the
    * corpus-level compressibility signal that separates natural
    * language (large gap) from shuffled or templated token soup (tiny
    * gap). The [[sourceLangMi]] fixed-point discipline: one 1e-6 ln per
    * DISTINCT cell (vocab-sized, never per token), exact integer
    * contribution sums weighted by cell count, floor division on the
    * negated (provably nonnegative) total.
    */
  def entropyRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docsFanned(s, dir)
      .select($"lang", text.tokensLower($"text").as("toks"))
      .localCheckpoint() // unigram + bigram passes read it
    val uni = toks.select($"lang", explode($"toks").as("w"))
      .groupBy($"lang", $"w").agg(count(lit(1)).as("c"))
    val n1 = uni.groupBy($"lang").agg(sum($"c").as("n"))
    val h1 = uni.join(broadcast(n1), "lang")
      .withColumn("lnu",
        round(log($"c".cast("double") / $"n".cast("double")) * 1e6)
          .cast("long"))
      .groupBy($"lang")
      .agg(max($"n").as("n_tokens"),
        expr("(-sum(c * lnu)) div max(n)").as("h1_u"))
    val bi = toks
      .select($"lang", explode(text.shinglesFromTokens($"toks", 2)).as("g"))
      .groupBy($"lang", $"g").agg(count(lit(1)).as("c"))
      .withColumn("a", split($"g", " ").getItem(0))
    val ctx = bi.groupBy($"lang", $"a").agg(sum($"c").as("ca"))
    val hc = bi.join(ctx, Seq("lang", "a"))
      .withColumn("lnu",
        round(log($"c".cast("double") / $"ca".cast("double")) * 1e6)
          .cast("long"))
      .groupBy($"lang")
      .agg(sum($"c").as("n_bigrams"),
        expr("(-sum(c * lnu)) div sum(c)").as("hcond_u"))
    // gain clamped at 0: H(w|prev) <= H1 mathematically, but 1e-6
    // rounding could nudge a degenerate language below zero, where
    // Spark div (trunc) and SQL // (floor) disagree
    h1.join(hc, "lang")
      .select($"lang", $"n_tokens", $"h1_u", $"n_bigrams", $"hcond_u",
        expr("greatest(h1_u - hcond_u, 0) * 10000 div h1_u").as("gain_bp"))
      .orderBy($"lang")
  }

  /** Characteristic terms per source by smoothed log-odds z-score
    * (Monroe, Colaresi & Quinn 2008's "fightin' words" with the
    * uninformative +1/2 prior): for each source, the tokens whose usage
    * odds most exceed the rest of the corpus, normalized by the
    * log-odds variance so rare-but-striking and common-but-mild terms
    * compete fairly — the provenance fingerprint TF-IDF approximates
    * and raw frequency misses entirely. Haldane's +1/2 becomes
    * integer-exact by doubling every count (ln((2y+1)/(2(n−y)+1))), the
    * variance terms are floor divisions 2·10¹²/(2y+1), and the z-score
    * is ONE fixed-shape quotient pre-rounded to 1e-4 before the ranked
    * top-5 per source. Only present (source, token) cells can rank, so
    * no spine join is needed.
    */
  def keyTerms(s: SparkSession, dir: String, minFreq: Long = 5,
               topK: Int = 5): DataFrame = {
    import s.implicits._
    val cells = docsFanned(s, dir)
      .select($"source", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("y"))
      .localCheckpoint() // totals + marginals + cells all read it
    val totW = cells.groupBy($"tok").agg(sum($"y").as("yt"))
      .filter($"yt" >= minFreq)
    val nS = cells.groupBy($"source").agg(sum($"y").as("ns"))
    val nAll = cells.agg(sum($"y").as("nt"))
    val bysrc = Window.partitionBy($"source").orderBy($"z_u4".desc, $"tok")
    cells.join(broadcast(totW), "tok").join(broadcast(nS), "source")
      .crossJoin(broadcast(nAll))
      .withColumn("yr", $"yt" - $"y")
      .withColumn("nr", $"nt" - $"ns")
      .withColumn("delta_u",
        round((log((lit(2L) * $"y" + 1L).cast("double") /
            (lit(2L) * ($"ns" - $"y") + 1L).cast("double")) -
          log((lit(2L) * $"yr" + 1L).cast("double") /
            (lit(2L) * ($"nr" - $"yr") + 1L).cast("double"))) * 1e6)
          .cast("long"))
      .withColumn("s2_u",
        expr("2000000000000 div (2 * y + 1)" +
          " + 2000000000000 div (2 * (ns - y) + 1)" +
          " + 2000000000000 div (2 * yr + 1)" +
          " + 2000000000000 div (2 * (nr - yr) + 1)"))
      .withColumn("z_u4",
        round($"delta_u" / sqrt($"s2_u".cast("double")) * 1e4).cast("long"))
      .withColumn("rank", row_number().over(bysrc))
      .filter($"rank" <= topK)
      .select($"source", $"rank", $"tok", $"y", $"delta_u", $"z_u4")
      .orderBy($"source", $"rank")
  }

  /** Rendezvous (highest-random-weight) shard assignment audit: each
    * document goes to the shard maximizing md5(shard ‖ doc) — the
    * stateless assignment scheme whose defining guarantee is MINIMAL
    * DISRUPTION: removing a shard remaps exactly that shard's documents
    * and nothing else (mod-N striping reshuffles nearly everything).
    * The audit computes the assignment under n and under n−1 shards in
    * one pass (the per-doc argmax over a broadcast shard spine, with
    * and without the victim) and emits per-shard counts plus the moved
    * set — the invariant the spec and oracle both pin. Balance falls
    * out of md5 uniformity; disruption is the property you buy HRW
    * for, and here it is measured, not assumed.
    */
  def rendezvousShards(s: SparkSession, dir: String, nShards: Int = 8,
                       removed: Int = 7): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents").select($"doc_id")
    val spine = s.range(0, nShards).select($"id".cast("int").as("shard"))
    val w = Window.partitionBy($"doc_id")
    val weighted = docs.crossJoin(broadcast(spine))
      .withColumn("hw",
        conv(substring(md5(concat(lit("hrw:"), $"shard", lit(":"),
          $"doc_id")), 1, 15), 16, 10).cast("long"))
    val assigned = weighted
      .withColumn("full_max", max($"hw").over(w))
      .withColumn("red_max",
        max(when($"shard" =!= removed, $"hw")).over(w))
      .filter($"hw" === $"full_max" || $"hw" === $"red_max")
      .groupBy($"doc_id")
      .agg(max(when($"hw" === $"full_max", $"shard")).as("shard_full"),
        max(when($"hw" === $"red_max", $"shard")).as("shard_reduced"))
    assigned
      .groupBy($"shard_full")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"shard_full" =!= $"shard_reduced", 1L).otherwise(0L))
          .as("n_moved"))
      .select($"shard_full".as("shard"), $"n_docs", $"n_moved",
        // the HRW guarantee, as data: only the removed shard moves
        ($"shard_full" === removed).as("is_removed"),
        (($"shard_full" === removed && $"n_moved" === $"n_docs") ||
          ($"shard_full" =!= removed && $"n_moved" === 0L))
          .as("disruption_minimal"))
      .orderBy($"shard")
  }

  /** Striped shard-balance audit: assign documents to training shards
    * by token-count rank modulo the shard count (sort-descending
    * striping — the stateless approximation of LPT bin packing that a
    * distributed writer can actually execute, since true LPT is
    * sequential in the number of documents), then report how balanced
    * the shards came out: per-shard doc and token totals, deviation
    * from the ideal equal split in basis points, and the max deviation
    * repeated (the export-planning number — a shard 10% over ideal is
    * the straggler of every epoch). Ranks ride
    * [[Relational.globalRowNumber]]'s range-partitioned two-pass, so
    * the audit holds at any corpus size; striping guarantees shard
    * token totals within max-doc-tokens of each other ONLY under sorted
    * order, which is exactly what the spec pins.
    */
  def shardBalance(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    import s.implicits._
    val docs = docsFanned(s, dir)
      .select($"doc_id", size(text.tokensLower($"text")).cast("long").as("tk"))
    val ranked = Relational.globalRowNumber(docs, Seq($"tk".desc, $"doc_id"))
      .withColumn("shard", (($"rk" - 1L) % nShards).cast("int"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    ranked
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"tk").as("tokens"))
      .withColumn("tot", sum($"tokens").over(all))
      .withColumn("ideal", expr(s"tot div $nShards"))
      .withColumn("dev_bp",
        expr("abs(tokens - ideal) * 10000 div ideal"))
      .withColumn("max_dev_bp", max($"dev_bp").over(all))
      .select($"shard", $"n_docs", $"tokens", $"ideal", $"dev_bp",
        $"max_dev_bp")
      .orderBy($"shard")
  }

  /** Greedy max-coverage corpus selection (the facility-location data
    * selection baseline): pick k documents that together cover the most
    * distinct word n-grams — the classic submodular subset-selection
    * rule whose greedy answer is within (1−1/e) of optimal, used to
    * seed eval panels and dedup exemplars with maximally diverse text.
    * Each round is one distributed anti-join + argmax over the
    * checkpointed doc–shingle frame (covered mass only ever shrinks the
    * probe side); the driver holds exactly one winner row per round
    * (the [[bpeMerges]] discipline — k rows total, never the corpus).
    * Gains are exact distinct-shingle counts, ties break on doc_id, so
    * the selection is total-ordered and engine-exact.
    */
  def coverageSelect(s: SparkSession, dir: String, k: Int = 6,
                     n: Int = 3): DataFrame = {
    import s.implicits._
    val sh = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .select($"doc_id", explode(text.shinglesFromTokens($"toks", n)).as("g"))
      .select($"doc_id", md5($"g").as("h")).distinct()
      .localCheckpoint()
    val tot = sh.select($"h").distinct().count()
    var covered = Seq.empty[String].toDF("h")
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)]()
    var coveredCount = 0L
    var r = 1
    while (r <= k) {
      val win = sh.join(covered, Seq("h"), "left_anti")
        .groupBy($"doc_id").agg(count(lit(1)).as("gain"))
        .orderBy($"gain".desc, $"doc_id").limit(1).collect()
      if (win.nonEmpty) {
        val (wid, gain) = (win(0).getLong(0), win(0).getLong(1))
        coveredCount += gain
        picks += ((r, wid, gain, coveredCount, coveredCount * 10000 / tot))
        covered = covered
          .union(sh.filter($"doc_id" === wid).select($"h"))
          .distinct().localCheckpoint()
      } else r = k // every shingle covered: stop early
      r += 1
    }
    picks.toSeq
      .toDF("round", "doc_id", "gain", "covered_total", "coverage_bp")
      .orderBy($"round")
  }

  /** Burrows' Delta stylometric distance between sources: the standard
    * authorship-attribution measure applied as a provenance audit — two
    * "independent" providers with near-zero Delta over the most frequent
    * tokens are stylistically the same feed (scraped mirrors, shared
    * generator), which per-source counts and even n-gram overlap miss.
    * Per source, relative frequencies of the top-m corpus tokens in
    * parts-per-million (integer floor division); per token, mean and
    * sample std across sources from exact integer moments (one
    * fixed-shape sqrt); Delta(s1,s2) = mean over tokens of
    * |f1 − f2| / σ_t, each term pre-rounded to 1e-6 before the integer
    * sum so the total is order-free in both engines. The frame is
    * |sources|²·m — an audit-sized matrix at any corpus size; emitted
    * as the s1 < s2 upper triangle.
    */
  def burrowsDelta(s: SparkSession, dir: String, m: Int = 30): DataFrame = {
    import s.implicits._
    // materialize the (source, token) COUNT rollup, never the raw
    // exploded token stream: every consumer (source lengths, global
    // top-m, per-cell counts) reads an aggregate, so checkpointing the
    // |sources|·|vocab|-bounded rollup instead of corpus-tokens-many
    // rows keeps the materialization audit-sized at any corpus
    val stc = docsFanned(s, dir)
      .select($"source", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c_st"))
      .localCheckpoint() // source lengths + counts + top-m all read it
    val srcLen = stc.groupBy($"source").agg(sum($"c_st").as("len_s"))
    val top = stc.groupBy($"tok").agg(sum($"c_st").as("c"))
      .orderBy($"c".desc, $"tok").limit(m).select($"tok")
    // dense (source × top token) relative-frequency grid in ppm —
    // missing cells are true zeros, so spine-join before the moments
    val cnt = stc.join(broadcast(top), Seq("tok"))
    val f = srcLen.crossJoin(broadcast(top))
      .join(cnt, Seq("source", "tok"), "left")
      .select($"source", $"tok",
        expr("coalesce(c_st, 0) * 1000000 div len_s").as("f_ppm"))
      .localCheckpoint() // moments + both pair sides read it
    val stats = f.groupBy($"tok")
      .agg(count(lit(1)).as("m_s"), sum($"f_ppm").as("sf"),
        sum($"f_ppm" * $"f_ppm").as("sff"))
      .select($"tok",
        round(sqrt(($"m_s" * $"sff" - $"sf" * $"sf").cast("double") /
          ($"m_s" * ($"m_s" - 1L)).cast("double"))).cast("long")
          .as("sigma_ppm"))
      .filter($"sigma_ppm" > 0) // a token used identically everywhere
                                // carries no stylometric signal
    val a = f.select($"source".as("s1"), $"tok", $"f_ppm".as("f1"))
    val b = f.select($"source".as("s2"), $"tok", $"f_ppm".as("f2"))
    a.join(b, Seq("tok")).filter($"s1" < $"s2")
      .join(broadcast(stats), Seq("tok"))
      .withColumn("d_u",
        round(abs($"f1" - $"f2").cast("double") / $"sigma_ppm" * 1e6)
          .cast("long"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("n_terms"),
        expr("sum(d_u) div count(1)").as("delta_u"))
      .orderBy($"s1", $"s2")
  }

  /** Pairwise Jensen–Shannon divergence between source token
    * distributions over the global top-m vocabulary — the
    * information-theoretic "are these two providers the same feed"
    * complement to [[burrowsDelta]]'s stylometric L1: symmetric,
    * bounded by ln 2, and zero iff the smoothed distributions match.
    * Add-one smoothing over the shared vocab kills the zero cells;
    * each term's two log-ratios come from EXACT integer cross-products
    * (2·c₁'·d₂ / (c₁'·d₂ + c₂'·d₁), products < 2⁵³ so the double is
    * exact) pre-rounded at 1e-6 (the hillTail discipline), then the
    * pair sum assembles in DECIMAL(38,0) scaled by the constant
    * 2·d₁·d₂ so the only division is one truncating micro floor per
    * pair. |sources|²·m audit-sized pair frame; one corpus scan.
    */
  def jsdSources(s: SparkSession, dir: String, m: Int = 100): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    // (source, token) COUNT rollup, not the raw exploded stream — the
    // burrowsDelta discipline: all consumers are aggregates, so the
    // checkpoint is |sources|·|vocab|-bounded at any corpus
    val stc = docsFanned(s, dir)
      .select($"source", explode(text.tokensLower($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c_st"))
      .localCheckpoint() // vocab + counts both read it
    val top = stc.groupBy($"tok").agg(sum($"c_st").as("c"))
      .orderBy($"c".desc, $"tok").limit(m).select($"tok")
    val cnt = stc.join(broadcast(top), Seq("tok"))
    val den = cnt.groupBy($"source")
      .agg((sum($"c_st") + lit(m.toLong)).as("d"))
    val grid = den.crossJoin(broadcast(top))
      .join(cnt, Seq("source", "tok"), "left")
      .select($"source", $"tok",
        (coalesce($"c_st", lit(0L)) + 1L).as("cn"), $"d")
    val a = grid.select($"source".as("s1"), $"tok",
      $"cn".as("cn1"), $"d".as("d1"))
    val b = grid.select($"source".as("s2"), $"tok",
      $"cn".as("cn2"), $"d".as("d2"))
    a.join(b, Seq("tok")).filter($"s1" < $"s2")
      .withColumn("x1", $"cn1" * $"d2") // exact longs, < 2^53
      .withColumn("x2", $"cn2" * $"d1")
      .withColumn("l1", round(log(
        $"x1".cast("double") * 2.0 / ($"x1" + $"x2").cast("double"))
        * 1e6).cast("long"))
      .withColumn("l2", round(log(
        $"x2".cast("double") * 2.0 / ($"x1" + $"x2").cast("double"))
        * 1e6).cast("long"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("n_vocab"),
        sum(($"x1".cast(dec) * $"l1" + $"x2".cast(dec) * $"l2"))
          .as("num"),
        max($"d1").as("d1"), max($"d2").as("d2"))
      .select($"s1", $"s2", $"n_vocab",
        expr(s"CAST(num div (2 * CAST(d1 AS $dec) * d2) AS BIGINT)")
          .as("jsd_micro"))
      .orderBy($"s1", $"s2")
  }

  /** Heaps'-law vocabulary growth audit: V(N) sampled at ten evenly
    * spaced points of the doc_id-ordered token stream, each point's
    * type-token ratio, and the fitted Heaps exponent β from
    * ln V = ln k + β·ln N — the planning number for "how much new
    * vocabulary will the next 10× of crawl bring" (β ≈ 0.5 typical
    * English; β near 0 means the corpus has saturated). V at a
    * checkpoint is exact: each type contributes at its FIRST global
    * occurrence position, so one min-aggregate per token plus a 10-row
    * broadcast range join counts every checkpoint without re-scanning.
    * The regression runs on 1e-6 fixed-point logs of exact integer
    * counts (sums of longs, order-free), with one fixed-shape double
    * quotient at the end (the [[zipfSlope]] shape, made order-proof).
    * The doc-offset running sum rides [[Relational.globalPrefixSum]]'s
    * range-partitioned two-pass — one row per doc is corpus-sized, so
    * a bare Window.orderBy there would serialize onto one task.
    */
  def heapsLaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docsFanned(s, dir)
      .select($"doc_id", text.tokensLower($"text").as("toks"))
      .localCheckpoint() // offsets + explode both read it
    val off = Relational.globalPrefixSum(
      toks.select($"doc_id", size($"toks").cast("long").as("len")),
      Seq($"doc_id"), $"len", "off")
    val first = toks.join(off.select($"doc_id", $"off"), "doc_id")
      .select($"off", posexplode($"toks").as(Seq("p", "tok")))
      .select($"tok", ($"off" + $"p" + 1L).as("gpos"))
      .groupBy($"tok").agg(min($"gpos").as("fp"))
    val nTot = off.agg(sum($"len").as("n_tot"))
    val ck = s.range(1, 11).select($"id".as("k"))
      .crossJoin(broadcast(nTot))
      .withColumn("n_k", expr("k * n_tot div 10"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    first.join(broadcast(ck), $"fp" <= $"n_k")
      .groupBy($"k", $"n_k").agg(count(lit(1)).as("v_k"))
      .withColumn("x_u", round(log($"n_k".cast("double")) * 1e6).cast("long"))
      .withColumn("y_u", round(log($"v_k".cast("double")) * 1e6).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("sx", sum($"x_u").over(all))
      .withColumn("sy", sum($"y_u").over(all))
      .withColumn("sxy", sum($"x_u" * $"y_u").over(all))
      .withColumn("sxx", sum($"x_u" * $"x_u").over(all))
      .select($"k", $"n_k", $"v_k",
        expr("v_k * 10000 div n_k").as("ttr_bp"),
        round(($"m" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"m" * $"sxx" - $"sx" * $"sx").cast("double"), 4).as("beta"))
      .orderBy($"k")
  }

  /** Spearman rank correlation between the two per-document quality
    * signals the pipeline computes independently — the composite
    * heuristic score and the bigram-LM cross-entropy ([[surprisalPerDoc]]).
    * A strong negative rho (fluent text scores high, high-perplexity
    * text scores low) is the calibration check that either signal can
    * stand in for the other; rho ≈ 0 means the filters disagree and a
    * cascade using both is load-bearing. Tied ranks use the doubled
    * midrank trick ([[Events.mannWhitney]]): both rank columns are exact
    * longs, the five moment sums accumulate in DECIMAL(38,0) (order-free
    * exact at any corpus size), and only the final single-row
    * Pearson-on-ranks quotient is floating point, pre-rounded to 4
    * places in one fixed shape both engines share.
    */
  def qualitySurprisalRho(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = docsFanned(s, dir)
      .select($"doc_id", $"text", $"n_chars", text.tokensLower($"text").as("toks"))
      .select($"doc_id",
        round(text.qualityScoreTokens($"text", $"toks", $"n_chars") * 10000)
          .cast("long").as("qu"))
    // checkpointed: the two midrank passes and the final moment agg all
    // re-read this frame — without it the whole bigram-LM surprisal
    // pipeline re-executes per consumer (measured ~2.5s -> ~1.6s)
    val joined = q.join(surprisalPerDoc(s, dir).select($"doc_id", $"xent_u"),
      "doc_id").localCheckpoint()
    def midrank(c: Column, name: String)(df: DataFrame): DataFrame = {
      val cells = df.groupBy(c.as("v")).agg(count(lit(1)).as("t"))
        .withColumn("cb", coalesce(sum($"t").over(Window.orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"v", (lit(2L) * $"cb" + $"t" + 1L).as(name))
      df.join(broadcast(cells), df(c.toString) === cells("v")).drop("v")
    }
    val dec = "decimal(38,0)"
    val ranked = joined
      .transform(midrank($"qu", "rx"))
      .transform(midrank($"xent_u", "ry"))
    ranked
      .agg(count(lit(1)).cast(dec).as("n"),
        sum($"rx").cast(dec).as("sx"), sum($"ry").cast(dec).as("sy"),
        sum($"rx".cast(dec) * $"ry").as("sxy"),
        sum($"rx".cast(dec) * $"rx").as("sxx"),
        sum($"ry".cast(dec) * $"ry").as("syy"))
      .select($"n".cast("long").as("n_docs"),
        // rank-covariance numerator ~n⁴/12 — inside int64 at gate
        // scale; narrow loudly (wide decimal is internal-only)
        graft.functions.num.toLongChecked(
          ($"n" * $"sxy" - $"sx" * $"sy").cast(dec), "cov_num")
          .as("cov_num"),
        round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
            sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))), 4)
          .as("rho"))
  }

  /** One DoReMi/Group-DRO mixture-reweighting step (Xie et al. 2023):
    * per-source excess loss over the corpus reference — here the
    * bigram-LM surprisal [[surprisalPerDoc]] already computes, the
    * proxy-model loss of this pipeline — drives a multiplicative
    * weight update w_i ∝ share_i · exp(excess_i), clipped at zero
    * excess like the paper (sources BELOW the reference keep their
    * base share rather than shrinking). Output is the decided sampling
    * mixture in exact ppm: base doc-share, mean and excess loss in
    * integer micro-nats, the exp factor pre-rounded to 1e6 fixed point
    * in ONE shape both engines share (the [[linkageWeights]] rounded-
    * transcendental discipline), and the normalized weight through a
    * wide-decimal floor division. One groupBy over the corpus scan;
    * the source table is dimension-sized at any scale.
    */
  def doremiStep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = surprisalPerDoc(s, dir)
      .join(Tables(s, dir, "documents").select($"doc_id", $"source"),
        Seq("doc_id"))
    val per = d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"xent_u").as("sx"))
      .localCheckpoint() // totals and the weight pass both read it
    val tot = per.agg(sum($"n_docs").as("n_tot"), sum($"sx").as("sx_tot"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    per.crossJoin(broadcast(tot))
      .withColumn("mean_xent_u", expr("sx div n_docs"))
      .withColumn("corp_u", expr("sx_tot div n_tot"))
      .withColumn("excess_u", greatest($"mean_xent_u" - $"corp_u", lit(0L)))
      .withColumn("exp_u",
        round(exp($"excess_u".cast("double") / 1e6) * 1e6).cast("long"))
      .withColumn("u_i", $"n_docs" * $"exp_u")
      .withColumn("weight_ppm", expr(
        "CAST(CAST(u_i AS DECIMAL(38,0)) * 1000000" +
        " div (sum(u_i) OVER ()) AS BIGINT)"))
      .select($"source", $"n_docs",
        expr("n_docs * 10000 div n_tot").as("base_share_bp"),
        $"mean_xent_u", $"excess_u", $"exp_u", $"weight_ppm")
      .orderBy($"source")
  }

  /** Skyline (Pareto-maximal) documents over (quality, n-gram novelty)
    * — the classic maximal-vector operator applied to CURATION: a doc
    * is on the frontier iff no other doc is at least as good on both
    * axes and strictly better on one. The frontier is what a "pick the
    * best docs" selection can choose from without trading one axis
    * blindly against the other. Exact integers (1e-4 quality grid ×
    * novelty bp), ties kept (equal points dominate nothing). Scale
    * shape: within-group domination is one max per quality cell
    * (map-side combined); the cross-group pass runs on the ≤1e4-row
    * quality grid — audit-sized at any corpus — so no corpus-sized
    * window or pairwise join anywhere. The oracle states the textbook
    * NOT EXISTS dominance definition directly, so the staged form is
    * proven equivalent, not assumed.
    */
  def skylineDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pts = qualityScores(s, dir)
      .select($"doc_id", round($"quality" * 10000).cast("long").as("qu"))
      .join(ngramNovelty(s, dir).select($"doc_id", $"novelty_bp"), "doc_id")
      .localCheckpoint() // group maxima and the survivor join read it
    val groups = pts.groupBy($"qu").agg(max($"novelty_bp").as("g_max"))
    val above = Window.orderBy($"qu".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // the qu grid is ≤ 1e4 rows — this window is audit-sized by
    // construction, not corpus-sized
    val frontier = groups
      .withColumn("max_above", coalesce(max($"g_max").over(above),
        lit(Long.MinValue)))
      .filter($"g_max" > $"max_above")
      .select($"qu", $"g_max")
    pts.join(broadcast(frontier), Seq("qu"))
      .filter($"novelty_bp" === $"g_max")
      .select($"doc_id", $"qu", $"novelty_bp")
      .orderBy($"doc_id")
  }

  /** Per-document n-gram novelty — the MEMORIZATION-RISK screen: the
    * fraction of a doc's distinct 3-token shingles whose global FIRST
    * occurrence (min doc_id over the whole corpus) is this doc. A
    * low-novelty doc is mostly restating earlier data (duplication the
    * pairwise dedup may have missed — templates, quotes, spin); a
    * curriculum or sampling pass can downweight it without any pair
    * computation. Exact integers: distinct shingles per doc, one
    * min-aggregate per shingle (shuffle on the shingle key — the same
    * shape as the inverted index), one join back, one floor-division
    * basis-point share. Docs with fewer than 3 tokens have no
    * shingles and drop (stated in the oracle identically).
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = docsFanned(s, dir)
      .select($"doc_id",
        explode(text.shinglesFromTokens(text.tokensLower($"text"), 3))
          .as("sh"))
      .distinct()
      .localCheckpoint() // first-occurrence agg and per-doc join read it
    val first = sh.groupBy($"sh").agg(min($"doc_id").as("fd"))
    sh.join(first, Seq("sh"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"fd" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_shingles", $"n_novel",
        expr("n_novel * 10000 div n_shingles").as("novelty_bp"))
      .orderBy($"doc_id")
  }
}
