package graft.operators

import graft.Tables
import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite for the LLM-data-pipeline surface: exact (hash
  * groupBy), n-gram Jaccard with blocking, MinHash+LSH, SimHash.
  *
  * Scale posture: every variant is shuffle-bounded by a *blocking key*
  * (content hash, (lang,n_chars) block, LSH band bucket, simhash band),
  * never an unblocked cross join — at 100 TB the candidate-pair space is
  * what kills you, so all pair generation happens inside hash buckets.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep smallest doc_id.
    * At scale: a single hash-shuffle; the md5 key also serves as the
    * idempotent-append PK (reference K1 ON CONFLICT DO NOTHING).
    */
  def exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .groupBy(md5($"text").as("content_hash"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"content_hash")
  }

  /** Token-set Jaccard similarity over candidate pairs blocked on
    * (lang, n_chars). Blocking keeps pairs ~linear in corpus size; the
    * unblocked alternative is quadratic and forbidden at scale.
    */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars", text.distinctTokens($"text").as("toks"))
    val a = d.alias("a")
    val b = d.alias("b")
    a.join(b,
        col("a.lang") === col("b.lang") &&
          col("a.n_chars") === col("b.n_chars") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(
          size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
            size(array_union(col("a.toks"), col("b.toks"))),
          4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** MinHash signature matrix: md5-keyed min-hash per (doc, seed).
    * md5 (not xxhash64) so an external SQL oracle can reproduce it bit
    * for bit. numHashes seeds, lexicographic min of md5(seed ":" shingle).
    */
  private[graft] def minhashSignatures(docs: DataFrame, shingleSize: Int,
                                       numHashes: Int): DataFrame = {
    val seeds = array((0 until numHashes).map(lit): _*)
    docs
      .filter(text.wsTokenCount(col("text")) >= shingleSize)
      .select(col("doc_id"), explode(text.wordShingles(col("text"), shingleSize)).as("sh"))
      .select(col("doc_id"), col("sh"), explode(seeds).as("seed"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("sh")))).as("mh"))
  }

  /** MinHash + LSH candidate pairs: band the signature (rowsPerBand
    * hashes per band), bucket-join on (band, band-signature). Docs
    * agreeing on any full band become a candidate pair — the classic
    * probability amplification; only bucket-mates are ever paired.
    */
  def minhashLshPairs(s: SparkSession, dir: String,
                      shingleSize: Int = 3, numHashes: Int = 12,
                      rowsPerBand: Int = 3): DataFrame = {
    import s.implicits._
    val sig = minhashSignatures(Tables(s, dir, "documents"), shingleSize, numHashes)
    // Deterministic band signature: sort "ss:md5" strings (zero-padded
    // seed prefix ⇒ lexicographic = numeric seed order).
    val bands = sig
      .withColumn("band", ($"seed" / rowsPerBand).cast("int"))
      .groupBy($"doc_id", $"band")
      .agg(concat_ws(",", array_sort(collect_list(
        concat(lpad($"seed".cast("string"), 2, "0"), lit(":"), $"mh")))).as("sig"))
    val a = bands.alias("a")
    val b = bands.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by
    * token-hash bit, sign → fingerprint bit. Near-dups share fingerprints
    * within small Hamming distance; bucketing on 16-bit bands makes the
    * candidate join linear.
    */
  private[graft] def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash fingerprints + band buckets (4×16-bit bands). Output: docs
    * with their fingerprint; pair generation would join on any equal band.
    */
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", simhash64(text.tokensLower($"text")).as("simhash"))
      .withColumn("band0", shiftright($"simhash", 0).bitwiseAND(0xffffL))
      .withColumn("band1", shiftright($"simhash", 16).bitwiseAND(0xffffL))
      .withColumn("band2", shiftright($"simhash", 32).bitwiseAND(0xffffL))
      .withColumn("band3", shiftright($"simhash", 48).bitwiseAND(0xffffL))
      .orderBy($"doc_id")
  }

  /** SimHash near-dup candidate pairs via 16-bit band bucketing. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fp = simhashFingerprints(s, dir)
    val banded = fp.select($"doc_id", $"simhash",
      explode(array(
        concat(lit("0:"), $"band0"), concat(lit("1:"), $"band1"),
        concat(lit("2:"), $"band2"), concat(lit("3:"), $"band3"))).as("bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }
}
