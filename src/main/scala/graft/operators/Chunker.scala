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

  /** Chunk every document (typed, partition-parallel). */
  def chunkDocuments(s: SparkSession, dir: String): Dataset[DocChunks] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val hashes = chunkHashes(text.getBytes("UTF-8"))
        DocChunks(id, hashes.length, hashes)
      })
  }

  /** Shared-chunk near-dup candidates: docs sharing >= minShared chunk
    * fingerprints (explode -> self-join on chunk hash -> count). Pair
    * generation is blocked by chunk hash — linear in corpus, like the
    * other dedup variants.
    */
  def sharedChunkPairs(s: SparkSession, dir: String, minShared: Int = 2): DataFrame = {
    import s.implicits._
    // distinct per doc: a chunk hash repeated inside one document would
    // otherwise multiply the join matches (2x2 rows for 1 shared chunk)
    val chunks = chunkDocuments(s, dir)
      .select($"doc_id", explode(array_distinct($"chunk_hashes")).as("ch"))
    val a = chunks.alias("a")
    val b = chunks.alias("b")
    a.join(b, col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .orderBy($"doc_a", $"doc_b")
  }
}
