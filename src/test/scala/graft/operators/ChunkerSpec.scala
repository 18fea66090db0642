package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends SparkSpec {
  import Chunker._

  test("boundaries cover the document exactly, within size bounds") {
    val bytes = Array.tabulate[Byte](5000)(i => ((i * 31 + 7) % 251).toByte)
    val bounds = chunkBoundaries(bytes)
    assert(bounds.last === bytes.length)
    assert(bounds === bounds.sorted)
    val sizes = bounds.zip(0 +: bounds.init).map { case (e, s) => e - s }
    assert(sizes.init.forall(sz => sz >= 32 && sz <= 256)) // last chunk may be short
    assert(sizes.sum === bytes.length)
  }

  test("chunking is content-defined: early edit only perturbs nearby chunks") {
    val base = Array.tabulate[Byte](4000)(i => ((i * 131 + 17) % 250).toByte)
    val edited = Array[Byte](1, 2, 3) ++ base // insertion at the front
    val h1 = chunkHashes(base).toSet
    val h2 = chunkHashes(edited).toSet
    val shared = h1.intersect(h2).size
    // most chunks resynchronize after the edit
    assert(shared >= h1.size / 2, s"shared=$shared of ${h1.size}")
  }

  test("identical documents share all chunks, disjoint docs none") {
    val a = "the quick brown fox ".repeat(50).getBytes("UTF-8")
    assert(chunkHashes(a).toSeq === chunkHashes(a.clone()).toSeq)
  }

  test("chunkDocuments matches the local chunker on the corpus") {
    import spark.implicits._
    val fromDs = Chunker.chunkDocuments(spark, sf)
      .collect().map(d => d.doc_id -> d.chunk_hashes.toSeq).toMap
    val local = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> chunkHashes(t.getBytes("UTF-8")).toSeq }.toMap
    assert(fromDs === local)
  }

  test("portable chunks reconstruct the document and respect the cut rule") {
    val doc = "The quick brown fox jumps over the lazy dog. ".repeat(40) +
      "Ünïcödé 中文 テスト " + "tail text to finish the doc."
    val chunks = portableChunks(doc)
    assert(chunks.mkString === doc) // exact reconstruction
    assert(portableChunks(doc) === chunks) // deterministic
    // every non-final cut satisfies the windowed-hash mask rule
    val cps = doc.codePoints().toArray
    var pos = 0
    chunks.init.foreach { ch =>
      pos += ch.codePointCount(0, ch.length)
      val h = (0 until W).map(k => (cps(pos - 1 - k) % M) * Bpow(k)).sum
      assert(h % M % 64 === 0, s"cut at $pos violates mask rule")
    }
  }

  test("portable fingerprints: identical text identical, edit resynchronizes") {
    val base = "lorem ipsum dolor sit amet consectetur ".repeat(60)
    val f1 = portableChunkFingerprints(base)
    assert(f1.toSeq === portableChunkFingerprints(base).toSeq)
    val edited = "XYZ " + base
    val shared = f1.toSet.intersect(portableChunkFingerprints(edited).toSet).size
    assert(shared >= f1.toSet.size / 2, s"shared=$shared of ${f1.toSet.size}")
  }

  test("chunkSearch returns exactly the term-bearing chunks with stable ids") {
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.flatMap { case (id, text) =>
      Chunker.portableChunks(text).zipWithIndex.collect {
        case (ch, i) if ch.trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).contains("spark") =>
          (id, i + 1, md5hex(ch))
      }
    }.sortBy(e => (e._1, e._2))
    val got = Chunker.chunkSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === expected.toSeq)
    // retrieval is passage-grain: hits exist, and some matching DOC has
    // non-matching chunks too (the chunk filter is finer than the doc one)
    assert(got.nonEmpty)
    val hitDocs = got.map(_._1).toSet
    val finer = docs.exists { case (id, text) =>
      hitDocs.contains(id) &&
        Chunker.portableChunks(text).length > got.count(_._1 == id)
    }
    assert(finer, "every chunk of every hit doc matched — filter not passage-grain")
  }

  test("sharedChunkPairs finds no false pairs on the (distinct) corpus") {
    // sf0.001 documents are short and distinct; duplicate texts share all
    // chunks, distinct texts nearly none -> exact dups must dominate
    import spark.implicits._
    val pairs = Chunker.sharedChunkPairs(spark, sf, minShared = 2)
    val dups = Dedup.exact(spark, sf).filter($"n_copies" > 1).count()
    assert(pairs.count() >= dups || dups == 0)
  }
}
