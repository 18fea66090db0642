package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.text
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tokenTotal = Tables(spark, sf, "documents")
    .select(text.wsTokenCount($"text").cast("long").as("n"))
    .agg(sum($"n")).first().getLong(0)

  test("sequencePacking conserves docs and tokens, bins contiguous per lang") {
    val rows = Packing.sequencePacking(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.map(_._3).sum === nDocs)
    assert(rows.map(_._4).sum === tokenTotal)
    rows.groupBy(_._1).foreach { case (lang, grp) =>
      val bins = grp.map(_._2).sorted.toSeq
      assert(bins === bins.distinct, s"$lang duplicate bins: $bins")
      assert(bins.head === 0L)
      // a gap larger than one doc's token span is impossible: doc i+1
      // starts at most n_tok(i) tokens after doc i, so consecutive
      // non-empty bins differ by at most ceil(maxDoc/budget)+1
      val maxDoc = Tables(spark, sf, "documents")
        .select(text.wsTokenCount($"text").cast("long")).collect().map(_.getLong(0)).max
      val maxGap = maxDoc / Packing.PackBudget + 1
      bins.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= maxGap, s"$lang bin gap $a->$b")
        case _ =>
      }
    }
  }

  test("contextWindows tile every doc: first window at 0, strides of 64, full coverage") {
    val byDoc = Packing.contextWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nTok = Tables(spark, sf, "documents")
      .select($"doc_id", text.wsTokenCount($"text").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet === nTok.keySet)
    byDoc.foreach { case (doc, wins) =>
      val sorted = wins.sortBy(_._2).toSeq
      assert(sorted.head._3 === 0L)
      assert(sorted.map(_._2) === sorted.indices.map(identity))
      sorted.foreach { case (_, winId, start, end) =>
        assert(start === winId.toLong * Packing.WindowStride)
        assert(end === math.min(start + Packing.WindowSize, nTok(doc)))
      }
      // strides overlap or touch: no token between windows is ever skipped
      assert(sorted.last._3 < math.max(nTok(doc), 1L))
    }
  }

  test("packedSequences materialize each bin's ids in doc order, token-exact") {
    val enc = TextOps.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // driver reference: same greedy offsets, ids joined in doc_id order
    val expected = enc.groupBy(_._2).toSeq.flatMap { case (lang, docs) =>
      var off = 0L
      docs.sortBy(_._1).map { case (id, _, n, ids) =>
        val bin = off / Packing.PackBudget; off += n; (lang, bin, id, n, ids)
      }.groupBy(_._2).map { case (bin, rows) =>
        (lang, bin, rows.size.toLong, rows.map(_._4).sum,
          rows.toSeq.sortBy(_._3).collect { case (_, _, _, n, ids) if n > 0 => ids }
            .mkString(" "))
      }
    }.sortBy(r => (r._1, r._2))
    val got = Packing.packedSequences(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === expected)
    // every bin's payload really carries its token count
    got.foreach { case (_, _, _, nTokens, ids) =>
      val n = if (ids.isEmpty) 0L else ids.split(" ").length.toLong
      assert(n === nTokens)
    }
  }
}
