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

  test("sharedChunkPairs finds no false pairs on the (distinct) corpus") {
    // sf0.001 documents are short and distinct; duplicate texts share all
    // chunks, distinct texts nearly none -> exact dups must dominate
    import spark.implicits._
    val pairs = Chunker.sharedChunkPairs(spark, sf, minShared = 2)
    val dups = Dedup.exact(spark, sf).filter($"n_copies" > 1).count()
    assert(pairs.count() >= dups || dups == 0)
  }
}
