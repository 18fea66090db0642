package graft.operators

import graft.{SparkSpec, Tables}

/** Winnowing (Schleimer et al. 2003) — the distributed selection must
  * match a sequential reference implementation fingerprint-for-
  * fingerprint, and must satisfy the paper's window guarantee.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sequential winnowing: per window of W k-gram hashes, pick the
    * minimum hash, rightmost on ties; return distinct (doc, h, pos).
    */
  private def reference(docs: Seq[(Long, String)]): Set[(Long, String, Long)] =
    docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filterNot(_.isEmpty)
      if (toks.length < K + W - 1) Seq.empty
      else {
        val hs = toks.sliding(K).map(g => md5hex(g.mkString(" "))).toArray
        (W to hs.length).flatMap { end => // window covers [end-W, end-1] 0-based
          val win = (end - W until end)
          // min hash, rightmost position on ties
          val sel = win.minBy(i => (hs(i), -i))
          Seq((id, hs(sel), (sel + 1).toLong))
        }
      }
    }.toSet

  test("winnowSelected matches the sequential reference exactly") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expected = reference(docs)
    val got = TextOps.winnowSelected(spark, sf, K, W)
      .as[(Long, String, Long)].collect().toSet
    assert(got === expected)
  }

  test("every window of W shingles contains a selected fingerprint") {
    // the winnowing guarantee: the first selection sits within the first
    // window, and consecutive selections are at most W apart (positions
    // a and a+W cover the window [a+1, a+W] between them)
    val sel = TextOps.winnowSelected(spark, sf, K, W)
      .select($"doc_id", $"pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sel.nonEmpty)
    sel.foreach { case (doc, ps) =>
      assert(ps.head <= W, s"doc $doc first selection ${ps.head} > $W")
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(b - a <= W, s"doc $doc gap $a -> $b exceeds $W")
      }
    }
  }

  test("winnowFingerprints: density sane, counts consistent") {
    val rows = TextOps.winnowFingerprints(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nGrams, nSel, bp) =>
      assert(nSel >= 1 && nSel <= nGrams, s"doc $doc: $nSel of $nGrams")
      assert(bp === nSel * 10000 / nGrams)
    }
    // expected density 2/(w+1) = 4000bp; corpus-wide mean should sit near it
    val mean = rows.map(_._4).sum / rows.length
    assert(mean > 2000 && mean < 7000, s"mean density $mean bp implausible")
  }

  test("winnowIncrementalPairs equals a batch-vs-rest split of the full " +
       "selection (per-doc selection is corpus-independent)") {
    val sel = TextOps.winnowSelected(spark, sf, K, W)
      .select($"doc_id", $"h").distinct()
      .as[(Long, String)].collect().toSeq
    val isBatch = (id: Long) => id % 4 == 3
    val expected = sel.groupBy(_._2).valuesIterator.flatMap { docs =>
      val ids = docs.map(_._1).distinct
      for (a <- ids if isBatch(a); b <- ids if !isBatch(b)) yield (a, b)
    }.toSeq.groupBy(identity).toSeq
      .map { case (p, g) => (p._1, p._2, g.size.toLong) }
      .filter(_._3 >= 2L).sorted
    val got = TextOps.winnowIncrementalPairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === expected)
    assert(got.nonEmpty, "degenerate test: no incremental matches at this SF")
  }

  test("winnowMatchSpans: same pairs as winnowPairs, bounds enclose the " +
       "matched positions exactly") {
    val sel = TextOps.winnowSelected(spark, sf, K, W)
      .as[(Long, String, Long)].collect()
    val docH = sel.map(t => (t._1, t._2)).distinct
    val df = docH.groupBy(_._2).view.mapValues(_.size).toMap
    val matchable = df.filter { case (_, n) => n >= 2 && n <= 50 }.keySet
    val got = TextOps.winnowMatchSpans(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val pairKeys = TextOps.winnowPairs(spark, sf)
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2, r._3)).toSet
    assert(got.map(r => (r._1, r._2, r._3)).toSet === pairKeys)
    assert(got.nonEmpty)
    val byDoc = sel.filter(t => matchable(t._2))
      .groupBy(_._1).view.mapValues(_.toSeq).toMap
    got.foreach { case (a, b, _, aMin, aMax, bMin, bMax) =>
      val shared = byDoc(a).map(_._2).toSet & byDoc(b).map(_._2).toSet
      val pa = byDoc(a).filter(t => shared(t._2)).map(_._3)
      val pb = byDoc(b).filter(t => shared(t._2)).map(_._3)
      assert(aMin === pa.min && aMax === pa.max)
      assert(bMin === pb.min && bMax === pb.max)
    }
  }

  test("winnowPairs agrees with brute-force shared-fingerprint counts") {
    val sel = TextOps.winnowSelected(spark, sf, K, W)
      .select($"doc_id", $"h").distinct()
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val df = sel.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size)
    val matchable = df.filter { case (_, n) => n >= 2 && n <= 50 }.keySet
    val expected = (for {
      (a, ha) <- sel.toSeq; (b, hb) <- sel.toSeq if a < b
      shared = (ha & hb & matchable).size if shared >= 2
    } yield (a, b) ->
        (shared.toLong, shared.toLong * 10000 / math.min(ha.size, hb.size)))
      .toMap
    val got = TextOps.winnowPairs(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
