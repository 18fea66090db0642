package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Content-defined chunking via Rabin-Karp rolling hash — the
  * document-fingerprinting primitive for dedup of long, partially-edited
  * documents: chunk boundaries are chosen where the rolling hash of a
  * sliding byte window hits a mask condition, so an insertion early in a
  * document only perturbs the chunks around the edit (fixed-size chunking
  * would shift every subsequent boundary).
  *
  * Implemented as a typed per-partition pass (one hasher per partition,
  * rows streamed) — the same execution shape as Multimodal.extractFeatures:
  * at 100 TB this runs at scan speed with no shuffle; downstream chunk-hash
  * joins are the only exchanges.
  */
object Chunker {

  case class DocChunks(doc_id: Long, n_chunks: Int, chunk_hashes: Array[Long])

  /** Polynomial rolling hash over a sliding `window` of bytes; a boundary
    * is declared when hash & mask == 0 (expected chunk ≈ mask+1 bytes),
    * with hard min/max bounds. Deterministic, dependency-free.
    */
  def chunkBoundaries(bytes: Array[Byte], window: Int = 16, maskBits: Int = 6,
                      minChunk: Int = 32, maxChunk: Int = 256): Seq[Int] = {
    val mask = (1 << maskBits) - 1
    val B = 257L
    val bPow = { var p = 1L; var i = 0; while (i < window - 1) { p *= B; i += 1 }; p }
    val bounds = scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < bytes.length) {
      val in = bytes(i) & 0xff
      h = h * B + in
      if (i - start >= window) h -= (bytes(i - window) & 0xff) * bPow * B
      val len = i - start + 1
      if ((len >= minChunk && (h & mask) == 0) || len >= maxChunk) {
        bounds += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) bounds += bytes.length
    bounds.toSeq
  }

  /** Per-chunk 64-bit FNV-1a fingerprints of a document's UTF-8 bytes. */
  def chunkHashes(textBytes: Array[Byte]): Array[Long] = {
    var prev = 0
    chunkBoundaries(textBytes).map { end =>
      var h = 0xcbf29ce484222325L
      var i = prev
      while (i < end) { h ^= (textBytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      prev = end
      h
    }.toArray
  }

  /** Chunk every document (typed, partition-parallel; pinned fan-out —
    * the corpus is byte-small but CPU-heavy per row).
    */
  def chunkDocuments(s: SparkSession, dir: String): Dataset[DocChunks] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"doc_id")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val hashes = chunkHashes(text.getBytes("UTF-8"))
        DocChunks(id, hashes.length, hashes)
      })
  }

  // ---- portable CDC variant (SQL-oracle-reproducible) ---------------------
  // Pure mask rule, no min/max bounds: a cut lands after code point p
  // (1-based, p >= W) iff the windowed polynomial hash of the last W code
  // points is 0 mod 64, plus a final cut at the end. Dropping the bounds
  // makes every cut position-independent, so the whole chunking is ONE
  // parallel pass — and expressible in plain SQL (lag window + md5), which
  // is what lets DuckDB verify it bit-for-bit. The bounded byte-based
  // variant above remains the production chunker (bounded chunk sizes);
  // this one is the verification/bench surface with identical join shape.

  private[graft] val W = 16
  private[graft] val M = 1L << 20
  /** B^k mod M for k = 0..W-1 (B = 257). 64 divides M, so reducing the
    * coefficients mod M never changes the cut rule (h mod 64).
    */
  private[graft] val Bpow: Array[Long] =
    Iterator.iterate(1L)(p => p * 257L % M).take(W).toArray

  /** B^W mod M — the outgoing code point's coefficient in the rolling
    * update.
    */
  private[graft] val BW: Long = Bpow(W - 1) * 257L % M

  /** Portable chunk split of a document (code-point domain). The hash
    * rolls in O(1) per position — h' = (h*B + c_in - c_out*B^W) mod M —
    * which is congruent mod M to the windowed sum the oracle computes,
    * and 64 | M so the cut rule (h % 64) is unchanged.
    */
  def portableChunks(text: String): Seq[String] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    if (n >= W) {
      var h = 0L
      var k = 0
      // seed: windowed sum at position W-1 (newest code point ↔ B^0)
      while (k < W) { h += (cps(W - 1 - k) % M) * Bpow(k); k += 1 }
      h %= M
      var i = W - 1
      while (i < n) {
        if (h % 64 == 0) cuts += i + 1
        i += 1
        if (i < n)
          h = ((h * 257L + cps(i) % M - (cps(i - W) % M) * BW) % M + M) % M
      }
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    var prev = 0
    cuts.map { c => val s = new String(cps, prev, c - prev); prev = c; s }.toSeq
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** md5 hex fingerprints of a document's portable chunks. */
  def portableChunkFingerprints(text: String): Array[String] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    portableChunks(text).map { ch =>
      digest.reset()
      val bytes = digest.digest(ch.getBytes("UTF-8"))
      val out = new Array[Char](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        out(i * 2) = HexDigits((bytes(i) >> 4) & 0xf)
        out(i * 2 + 1) = HexDigits(bytes(i) & 0xf)
        i += 1
      }
      new String(out)
    }.toArray
  }

  /** Document-frequency cap for blocking chunks: fingerprints present in
    * more than this many documents are boilerplate ("stop chunks") and
    * are dropped before pair generation. Shared with the SQL oracle.
    */
  val MaxChunkDf = 64

  /** Shared-chunk near-dup candidates: docs sharing >= minShared *rare*
    * chunk fingerprints (explode -> df-cap -> self-join on chunk hash ->
    * count). Pair generation is blocked by chunk hash, and the df cap
    * bounds every bucket: without it one boilerplate chunk shared by k
    * docs costs k²/2 join rows (measured: a single df=11k fingerprint
    * contributed 65M of 72M pairs at 10× bench scale — the classic
    * stop-shingle blowup). Common chunks carry no near-dup signal anyway.
    * The df window shuffles on ch, the same key the self-join needs, so
    * the cap adds no extra exchange and the two join inputs reuse one
    * shuffle (ReuseExchange).
    */
  def sharedChunkPairs(s: SparkSession, dir: String, minShared: Int = 2,
                       maxDf: Int = MaxChunkDf): DataFrame = {
    import s.implicits._
    // distinct per doc: a chunk hash repeated inside one document would
    // otherwise multiply the join matches (2x2 rows for 1 shared chunk)
    // pinned fan-out before the compute-heavy chunk+md5 pass: the raw
    // corpus is few MB (1-2 file splits) but costs CPU-seconds per split
    val chunks = Tables(s, dir, "documents")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"doc_id")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, portableChunkFingerprints(text).distinct)
      })
      .toDF("doc_id", "fps")
      .select($"doc_id", explode($"fps").as("ch"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"ch")
    val rare = chunks.withColumn("df", count(lit(1)).over(w))
      .filter($"df" <= maxDf).select($"doc_id", $"ch")
    val a = rare.alias("a")
    val b = rare.alias("b")
    a.join(b, col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Chunk-grain keyword retrieval — the RAG serving granularity: a
    * retrieval hit is the PASSAGE (CDC chunk) containing every query
    * term, not the whole document, so the consumer gets exactly the
    * spans to stuff into a context window. Same conjunctive-term
    * semantics as `TextOps.keywordSearch` one level down the
    * containment hierarchy; chunk identity is the md5 fingerprint the
    * dedup join already uses, so hits link 1:1 into the chunk-level
    * dedup graph. One chunk pass (scan-speed, per-partition hasher) +
    * a per-row token filter; no shuffle before the output sort.
    */
  def chunkSearch(s: SparkSession, dir: String,
                  terms: Seq[String] = Seq("spark")): DataFrame = {
    import s.implicits._
    val chunks = Tables(s, dir, "documents")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"doc_id")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        portableChunks(text).zipWithIndex
          .map { case (ch, i) => (id, i + 1, ch) }
      })
      .toDF("doc_id", "chunk_idx", "chunk")
    val toks = graft.functions.text.tokensLower($"chunk")
    val cond = terms.map(t => array_contains(toks, t)).reduce(_ && _)
    chunks.filter(cond)
      .select($"doc_id", $"chunk_idx".cast("int").as("chunk_idx"),
        md5($"chunk").as("chunk_fp"))
      .orderBy($"doc_id", $"chunk_idx")
  }
}
