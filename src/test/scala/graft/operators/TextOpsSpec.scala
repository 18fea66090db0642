package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions.{floor, lit, round, row_number, sqrt, sum}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jsdSources: every pair's divergence recounts exactly; JSD is " +
       "bounded by ln 2 and zero only for identical smoothed counts") {
    val docs = Tables(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val toks = docs.flatMap { case (src, t) =>
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map(src -> _) }
    val top = toks.groupBy(_._2).map { case (t, g) => (t, g.length) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(100).map(_._1)
    val topSet = top.toSet
    val cnt = toks.filter(t => topSet(t._2))
      .groupBy(identity).map { case ((s0, t), g) => (s0, t) -> g.length.toLong }
    val srcs = cnt.keys.map(_._1).toSeq.distinct.sorted
    val den = srcs.map(s0 =>
      s0 -> (cnt.collect { case ((`s0`, _), c) => c }.sum + 100L)).toMap
    def jsd(sa: String, sb: String): (Long, Long) = {
      val (da, db) = (den(sa), den(sb))
      val num = top.map { t =>
        val (ca, cb) = (cnt.getOrElse((sa, t), 0L) + 1L,
          cnt.getOrElse((sb, t), 0L) + 1L)
        val (x1, x2) = (ca * db, cb * da)
        def l(u: Long) = math.round(
          math.log(u.toDouble * 2.0 / (x1 + x2).toDouble) * 1e6)
        BigInt(x1) * l(x1) + BigInt(x2) * l(x2)
      }.sum
      (top.length.toLong, (num / (2 * BigInt(da) * db)).toLong)
    }
    val rows = TextOps.jsdSources(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (s1, s2, nv, j) =>
      val (env, ej) = jsd(s1, s2)
      assert(nv === env && j === ej, s"pair ($s1, $s2)")
      assert(j >= 0L && j <= 693148L, s"JSD out of [0, ln 2] at ($s1, $s2)")
    }
    assert(rows.length === srcs.length * (srcs.length - 1) / 2)
  }

  test("giniStump: the weighted-impurity argmin recounts exactly over " +
       "every candidate threshold with smallest-threshold tie-break") {
    val docs = Tables(spark, sf, "documents")
      .select($"n_chars", ($"lang" === "en").cast("long"))
      .as[(Long, Long)].collect()
    val n = BigInt(docs.length)
    val p = BigInt(docs.map(_._2).sum)
    val byVal = docs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, BigInt(g.length), BigInt(g.map(_._2).sum)) }
    def halfCost(pos: BigInt, neg: BigInt): BigInt =
      (pos * pos + neg * neg) * BigInt(1000000000) / (pos + neg)
    var (nl, posl) = (BigInt(0), BigInt(0))
    val cands = byVal.dropRight(1).map { case (v, cnt, pos) =>
      nl += cnt; posl += pos
      val (nr, posr) = (n - nl, p - posl)
      (n * 1000000000 - halfCost(posl, nl - posl)
        - halfCost(posr, nr - posr), v, nl, posl, nr, posr)
    }
    val best = cands.min // (cost, threshold) lexicographic = the operator's tie-break
    val r = TextOps.giniStump(spark, sf).collect()(0)
    assert(BigInt(r.getAs[Long]("cost_u9")) === best._1)
    assert(r.getAs[Long]("threshold") === best._2.toLong)
    assert(BigInt(r.getAs[Long]("n_left")) === best._3)
    assert(BigInt(r.getAs[Long]("pos_left")) === best._4)
    assert(BigInt(r.getAs[Long]("n_right")) === best._5)
    assert(BigInt(r.getAs[Long]("pos_right")) === best._6)
    val root = n * 1000000000 - (p * p + (n - p) * (n - p)) *
      BigInt(1000000000) / n
    assert(BigInt(r.getAs[Long]("root_u9")) === root)
    assert(BigInt(r.getAs[Long]("gain_u9")) === root - best._1)
    // a split can only ever help a concave impurity
    assert(root - best._1 >= 0)
  }

  test("topTokensPerLang: ranks 1..k, counts non-increasing within a lang") {
    val rows = TextOps.topTokensPerLang(spark, sf, k = 5)
      .select($"lang", $"rk", $"n").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      val ns = sorted.map(_._3).toSeq
      assert(ns === ns.sorted.reverse, s"counts not non-increasing: $ns")
    }
  }

  test("tfidfTopTerms: per-doc ranks 1..k with non-increasing scores") {
    val rows = TextOps.tfidfTopTerms(spark, sf, k = 3)
      .select($"doc_id", $"rk", $"tfidf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      val scores = sorted.map(_._3).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("hashSplit covers every doc deterministically with sane shares") {
    val total = Tables(spark, sf, "documents").count()
    val a = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val b = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.length.toLong === total)
    assert(a.toMap === b.toMap) // deterministic
    val shares = a.groupBy(_._2).view.mapValues(_.length.toDouble / total).toMap
    assert(shares.keySet.subsetOf(Set("train", "val", "test")))
    assert(shares("train") > 0.6 && shares("train") < 0.95)
  }

  test("stratifiedSample is a deterministic subset") {
    val all = Tables(spark, sf, "documents")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val s1 = TextOps.stratifiedSample(spark, sf).collect().map(_.getLong(0)).toSet
    val s2 = TextOps.stratifiedSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    assert(s1.nonEmpty && s1.size < all.size)
    assert(s1.subsetOf(all))
  }

  test("decontamination pairs live strictly across the split boundary") {
    val split = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextOps.decontamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the fixture corpus HAS dup groups straddling the split — an empty
    // result would mean the join regressed, not a clean corpus
    assert(rows.nonEmpty)
    rows.foreach { case (train, eval_, n) =>
      assert(split(train) === "train" && split(eval_) === "test")
    }
  }

  test("repetitionScores: ratios in (0,1], hand-recount on one doc") {
    val rows = TextOps.repetitionScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length.toLong === Tables(spark, sf, "documents").count())
    rows.foreach { case (_, n, dr, tf, dg) =>
      assert(n > 0)
      assert(dr > 0 && dr <= 1.0)
      assert(tf > 0 && tf <= 1.0)
      assert(dg >= 0 && dg <= 1.0)
    }
    // recount doc 0 with plain Scala
    val txt = Tables(spark, sf, "documents")
      .filter($"doc_id" === 0L).head().getAs[String]("text")
    val toks = txt.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val gramCounts = grams.groupBy(identity).view.mapValues(_.length)
    val (_, n0, dr0, tf0, dg0) = rows.find(_._1 == 0L).get
    assert(n0 === toks.length.toLong)
    assert(dr0 === BigDecimal(toks.distinct.length.toDouble / toks.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(tf0 === BigDecimal(
      toks.groupBy(identity).values.map(_.length).max.toDouble / toks.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(dg0 === BigDecimal(
      gramCounts.values.filter(_ >= 2).sum.toDouble / math.max(grams.length, 1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("piiStats accounts for every document with non-negative counts") {
    val total = Tables(spark, sf, "documents").count()
    val rows = TextOps.piiStats(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0 && r.getLong(4) >= 0)
    }
  }

  test("tokenCooccurrence matches a full driver-side recomputation") {
    val got = TextOps.tokenCooccurrence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // independent recount from raw text on the tiny SF
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSet)
    val nDocs = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(40).toMap
    val pairCounts = docs.flatMap { case (_, toks) =>
      val kept = toks.filter(top.contains).toSeq.sorted
      for (i <- kept.indices; j <- i + 1 until kept.length) yield (kept(i), kept(j))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = pairCounts.collect { case ((a, b), nab) if nab >= 5 =>
      val lift = BigDecimal(nab.toDouble * nDocs / (top(a) * top(b)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, nab, lift)
    }.toSeq.sortBy { case (a, b, _, l) => (-l, a, b) }.take(50)
    assert(got.toSeq === expected)
  }

  test("charEntropy matches a full driver-side recomputation") {
    val got = TextOps.charEntropy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).toLowerCase
        val counts = ('a' to 'z').map(l => t.count(_ == l).toLong)
        val n = counts.sum
        val ent =
          if (n == 0) 0.0
          else counts.filter(_ > 0).map { c =>
            val p = c.toDouble / n; -p * math.log(p)
          }.sum
        (r.getLong(0), n,
          BigDecimal(ent).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
  }

  test("invertedIndex: df is the true document frequency, postings capped & sorted") {
    val rows = TextOps.invertedIndex(spark, sf, cap = 20, k = 50).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
    rows.foreach { case (tok, df, postings) =>
      val withTok = docs.collect { case (id, toks) if toks(tok) => id }.sorted
      assert(df === withTok.length.toLong, s"df mismatch for '$tok'")
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids === ids.sorted, s"postings unsorted for '$tok'")
      assert(ids === withTok.take(20).toSeq, s"postings wrong for '$tok'")
    }
    // top-k ordering: df non-increasing
    val dfs = rows.map(_._2).toSeq
    assert(dfs === dfs.sorted.reverse)
  }

  test("keywordSearch: conjunctive semantics with exact tf scores") {
    val terms = Seq("vector", "hash", "spark")
    val got = TextOps.keywordSearch(spark, sf, terms, k = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val expected = docs
      .filter { case (_, toks) => terms.forall(toks.contains) }
      .map { case (id, toks) => (id, toks.count(terms.contains).toLong) }
      .sortBy { case (id, score) => (-score, id) }.take(25)
    assert(got.toSeq === expected.toSeq)
  }

  test("bm25TopK matches a sequential driver-side BM25 recomputation") {
    val terms = Seq("vector", "hash", "spark")
    val (k1, b) = (1.2, 0.75)
    val got = TextOps.bm25TopK(spark, sf, terms, k = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val nDocs = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nDocs
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
          val c = idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * dl / avgdl))
          Some(math.round(c * 1000000.0))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.size.toLong,
        BigDecimal(contribs.sum.toDouble / 1000000.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.sortBy { case (id, _, s) => (-s, id) }.take(25)
    assert(got.toSeq === expected.toSeq)
  }

  test("conformalCalibration: fixed-point OLS, calibration quantile " +
       "and test coverage recount exactly; coverage honors the bound") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex("split:" + id).substring(0, 15), 16) % 100
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"n_chars", $"text").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+")
          .count(_.nonEmpty).toLong))
    val train = docs.filter(d => bucket(d._1) < 80)
    val n = train.length.toLong
    val sx = train.map(d => BigInt(d._2)).sum
    val sy = train.map(d => BigInt(d._3)).sum
    val num = n * train.map(d => BigInt(d._2) * d._3).sum - sx * sy
    val den = n * train.map(d => BigInt(d._2) * d._2).sum - sx * sx
    val shift = BigInt(2000000000000000L)
    val bU = ((num * 1000000 + shift * den) / den - shift).toLong
    val aU = ((sy * 1000000 - BigInt(bU) * sx + shift * n) / n - shift)
      .toLong
    def sU(d: (Long, Long, Long)): Long =
      math.abs(d._3 * 1000000L - aU - bU * d._2)
    val cal = docs.filter(d => bucket(d._1) >= 80 && bucket(d._1) < 90)
    val nCal = cal.length.toLong
    val kRank = math.min(((nCal + 1) * 9000 + 9999) / 10000, nCal)
    val qHat = cal.map(d => (sU(d), d._1)).sorted.apply(kRank.toInt - 1)._1
    val test0 = docs.filter(d => bucket(d._1) >= 90)
    val covered = test0.count(d => sU(d) <= qHat).toLong
    val r = TextOps.conformalCalibration(spark, sf).collect().head
    assert(r.getAs[Long]("n_train") === n)
    assert(r.getAs[Long]("n_cal") === nCal)
    assert(r.getAs[Long]("n_test") === test0.length.toLong)
    assert(r.getAs[Long]("b_u") === bU)
    assert(r.getAs[Long]("a_u") === aU)
    assert(r.getAs[Long]("k_rank") === kRank)
    assert(r.getAs[Long]("q_hat") === qHat)
    assert(r.getAs[Long]("n_covered") === covered)
    assert(r.getAs[Long]("coverage_bp") ===
      covered * 10000 / test0.length)
    assert(r.getAs[Long]("target_bp") === 9000L)
    // exchangeable split: realized coverage should sit near the 90%
    // guarantee (binomial noise allowance, not a strict bound per draw)
    assert(r.getAs[Long]("coverage_bp") >= 8300L,
      s"coverage ${r.getAs[Long]("coverage_bp")} implausibly low")
  }

  test("dirichletQlTopK matches a sequential query-likelihood recount; " +
       "every document scores every term") {
    val terms = Seq("vector", "hash", "spark")
    val mu = 2000L
    val got = TextOps.dirichletQlTopK(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val cTotal = docs.map(_._2.length.toLong).sum
    val ctf = terms.map(t => t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    val present = terms.filter(ctf(_) > 0)
    assert(present.nonEmpty) // fixture must exercise the scorer
    val expected = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val score = present.map { t =>
        val tf = toks.count(_ == t).toLong
        BigDecimal(math.log((tf * cTotal + mu * ctf(t)).toDouble /
          ((dl + mu) * cTotal).toDouble) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (id, dl, score)
    }.sortBy { case (id, _, sc) => (-sc, id) }.take(25)
      .zipWithIndex.map { case ((id, dl, sc), i) => (i + 1, id, dl, sc) }
    assert(got.toSeq === expected.toSeq)
  }

  test("weightedSampleES matches a driver-side A-ES recount and favors quality") {
    val got = TextOps.weightedSampleES(spark, sf, n = 100).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // independent weights via the operator's own quality column is fine:
    // the A-ES key mechanics are what this recount pins
    val scored = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.text.qualityScoreTokens(
          org.apache.spark.sql.functions.col("text"),
          graft.functions.text.tokensLower(
            org.apache.spark.sql.functions.col("text")),
          org.apache.spark.sql.functions.col("n_chars")).as("w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val expected = scored.filter(_._2 > 0.0).map { case (id, w) =>
      val u = (h60(s"aes:$id") % 1000000L + 1).toDouble / 1000001.0
      (id, w, math.round(math.pow(u, 1.0 / w) * 1000000.0))
    }.sortBy { case (id, _, k) => (-k, id) }.take(100)
      .zipWithIndex.map { case ((id, w, k), i) => (i + 1, id, w, k) }
    assert(got.toSeq === expected.toSeq)
    // weighting is real: the sample's mean quality beats the corpus mean
    val sampleMean = got.map(_._3).sum / got.length
    val corpusMean = scored.map(_._2).sum / scored.length
    assert(sampleMean > corpusMean,
      f"weighted sample mean $sampleMean%.4f should beat corpus $corpusMean%.4f")
  }

  test("qualityLrTrain matches a sequential fixed-point gradient descent") {
    def r6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = Tables(spark, sf, "documents")
      .select("text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(0).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq
        val y = if (toks.contains("spark") && toks.length >= 54) 1.0 else 0.0
        (y, Array(1.0, toks.length / 100.0,
          toks.distinct.length.toDouble / toks.length,
          r.getLong(1).toDouble / toks.length / 10.0))
      }
    val n = rows.length
    var w = Vector(0L, 0L, 0L, 0L)
    val expected = (1 to 5).map { step =>
      val wd = w.map(_.toDouble / 1000000.0)
      val g = Array.fill(4)(0L)
      rows.foreach { case (y, x) =>
        val z = ((wd(0) * x(0) + wd(1) * x(1)) + wd(2) * x(2)) + wd(3) * x(3)
        val p = math.max(0.0, math.min(1.0, 0.5 + 0.25 * z))
        (0 to 3).foreach(j => g(j) += r6((p - y) * x(j) * 1000000.0))
      }
      w = w.indices.map(j => w(j) - r6(0.5 * g(j).toDouble / n)).toVector
      (step, w(0), w(1), w(2), w(3))
    }
    val got = TextOps.qualityLrTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
    // training moved off the zero init
    assert(expected.last.productIterator.drop(1).exists(_ != 0L))
  }

  test("qualityLrScores: verdicts consistent with p_u, labels recount, " +
       "trained model beats the all-positive baseline's miss pattern") {
    val got = TextOps.qualityLrScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getInt(3)))
    val labels = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(0 + 1).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq
        r.getLong(0) -> (if (toks.contains("spark") && toks.length >= 54) 1 else 0)
      }.toMap
    assert(got.length === labels.size)
    got.foreach { case (id, pu, pred, y) =>
      assert(y === labels(id))
      // pred is computed on the UNROUNDED p, so at the rounding boundary
      // only the weak direction is implied
      assert(if (pred) pu >= 500000L else pu <= 500000L,
        s"doc $id: pred/p_u inconsistent")
      assert(pu >= 0L && pu <= 1000000L)
    }
    // the model discriminates: both verdicts occur
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("keywordSearchIndexed: identical to keywordSearch; the stored scan " +
       "prunes to the query terms' buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val direct = TextOps.keywordSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val served = TextOps.keywordSearchIndexed(spark, sf)
    assert(served.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === direct)
    assert(direct.nonEmpty)
    val scan = planNodes(served)
      .collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined)
    val sel = scan.get.metadata.get("SelectedBucketsCount")
    assert(sel.isDefined, "term filter did not reach bucket pruning")
    val m = "(\\d+) out of (\\d+)".r.findFirstMatchIn(sel.get).get
    assert(m.group(1).toInt < m.group(2).toInt,
      s"no bucket pruned: ${sel.get}")
  }

  test("surprisalFilter matches a sequential fixed-point LM recount") {
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val train = docs.filter { case (id, _) => h60(s"split:$id") % 100 < 80 }
    val cAb = train.flatMap(_._2.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
      .groupBy(identity).map { case (g, v) => g -> v.length.toLong }
    val cA = train.flatMap(_._2)
      .groupBy(identity).map { case (a, v) => a -> v.length.toLong }
    val v = cA.size.toLong
    val perDoc = docs.filter(_._2.length >= 2).map { case (id, toks) =>
      val lps = toks.sliding(2).filter(_.length == 2).map { bg =>
        val g = bg.mkString(" ")
        r0(-math.log((cAb.getOrElse(g, 0L) + 1).toDouble /
          (cA.getOrElse(bg(0), 0L) + v).toDouble) * 1000000.0)
      }.toSeq
      (id, lps.length.toLong, lps.sum / lps.length)
    }
    val cut = perDoc.map(_._3).sum / perDoc.length
    val expected = perDoc.sortBy(_._1).map { case (id, n, x) =>
      (id, n, x, cut, x <= cut)
    }
    val got = TextOps.surprisalFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq === expected)
    // the filter separates: both verdicts occur
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("mixtureReweight: largest-remainder weights sum to exactly 10000") {
    // source means recomputed from the independently-spec'd filter frame
    val xent = TextOps.surprisalFilter(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val srcOf = Tables(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = xent.toSeq.groupBy(kv => srcOf(kv._1)).map { case (src, g) =>
      (src, g.length.toLong, g.map(_._2).sum / g.length)
    }.toSeq
    val tot = bySrc.map(_._3).sum
    val base = bySrc.map { case (src, n, m) =>
      (src, n, m, m * 10000 / tot, m * 10000 % tot)
    }
    val deficit = 10000L - base.map(_._4).sum
    val bonus = base.sortBy { case (src, _, _, _, rem) => (-rem, src) }
      .take(deficit.toInt).map(_._1).toSet
    val expected = base.sortBy(_._1).map { case (src, n, m, b, _) =>
      (src, n, m, b + (if (bonus(src)) 1L else 0L))
    }
    val got = TextOps.mixtureReweight(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    assert(got.map(_._4).sum === 10000L)
    assert(deficit > 0, "no remainder apportioned — fixture is vacuous")
    // loss-proportionality: the hardest source gets the largest weight
    val hardest = got.maxBy(_._3)
    assert(hardest._4 === got.map(_._4).max)
  }

  test("curriculumOrder: length-doubling stages, md5 order, full coverage") {
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
    val expected = docs
      .map { case (id, nt) =>
        (nt.toBinaryString.length, h60(s"curr:$id") % 1000000L, id, nt)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (stage, g) =>
        g.sortBy { case (_, sk, id, _) => (sk, id) }.zipWithIndex
          .map { case ((_, _, id, nt), i) => (stage, (i + 1).toLong, id, nt) }
      }
    val got = TextOps.curriculumOrder(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // every doc appears exactly once, and stages genuinely ascend in length
    assert(got.map(_._3).toSet === docs.map(_._1).toSet)
    got.foreach { case (stage, _, _, nt) =>
      assert(nt.toBinaryString.length === stage)
    }
    assert(got.map(_._1).distinct.length > 1, "single-stage corpus is vacuous")
  }

  test("hybridRrfTopK fuses the lexical and vector pools exactly") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = Seq("vector", "hash", "spark")
    // run A ranks from the independently-spec'd BM25 operator
    val rankA = TextOps.bm25TopK(spark, sf, terms, 50).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // run B ranks: driver cosine of each hashed-TF vector vs the query
    val q = TextOps.fhQueryVector(terms)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val rankB = TextOps.hashedTfVectors(spark, sf).collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v.zip(q).map { case (a, b) => a * b }.sum,
          math.sqrt(v.map(x => x * x).sum))
      }
      .filter { case (_, _, n) => n > 0 }
      .map { case (id, dp, n) => (id, r4(dp / (n * qNorm))) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expected = (rankA.keySet ++ rankB.keySet).toSeq.map { id =>
      val rrf = rankA.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rankB.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
      (id, rankA.get(id), rankB.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(25)
      .zipWithIndex.map { case ((id, ra, rb, rrf), i) => (i + 1, id, ra, rb, rrf) }
    val got = TextOps.hybridRrfTopK(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4)))
    assert(got.toSeq === expected)
    // fusion is a union, not an intersection: some result doc came from
    // only one of the two runs
    assert(got.exists(g => g._3.isEmpty || g._4.isEmpty),
      "both pools identical — union semantics unexercised")
  }

  test("spanScrub matches a sequential interval-merge recount") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val n = 8
    val occ = docs.flatMap { case (id, toks) =>
      toks.sliding(n).zipWithIndex
        .filter(_._1.length == n)
        .map { case (w, i) => (id, i + 1, i + n, w.mkString(" ")) }
    }
    val dup = occ.groupBy(_._4)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = occ.filter(o => dup(o._4))
      .groupBy(_._1).map { case (id, os) =>
        // merge overlapping [st,en] intervals, count + size the islands
        val sorted = os.map(o => (o._2, o._3)).sortBy(_._1)
        var spans = 0L; var removed = 0L
        var cs = -1; var ce = -2
        (sorted :+ ((Int.MaxValue, Int.MaxValue))).foreach { case (st, en) =>
          if (st > ce) {
            if (cs >= 0) { spans += 1; removed += ce - cs + 1 }
            cs = st; ce = en
          } else ce = math.max(ce, en)
        }
        val nToks = docs.find(_._1 == id).get._2.length.toLong
        id -> (nToks, spans, removed, nToks - removed)
      }
    val got = TextOps.spanScrub(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toMap === expected)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    // the fixture exercises the operator: some doc loses a real span but
    // keeps content (scrub, not whole-doc drop)
    assert(got.exists { case (_, (_, sp, rm, kept)) =>
      sp >= 1 && rm >= 8 && kept > 0 })
  }

  test("cmsAudit matches a sequential sketch build; soundness is absolute") {
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val toks = Tables(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val counters = Array.fill(4, 16)(0L)
    toks.foreach { t =>
      (0 until 4).foreach(r => counters(r)((h60(s"$r:cms:$t") % 16).toInt) += 1)
    }
    val trueCnt = toks.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val top = trueCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    val expected = top.map { case (t, c) =>
      val est = (0 until 4).map(r => counters(r)((h60(s"$r:cms:$t") % 16).toInt)).min
      (t, c, est, est - c, est >= c)
    }
    val got = TextOps.cmsAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq === expected)
    // the deterministic CMS guarantee holds on every probe, and the
    // sketch is genuinely lossy somewhere (collisions occurred)
    assert(got.forall(_._5))
    assert(got.exists(_._4 > 0L), "no collision at 4x16 — audit vacuous")
  }

  test("releaseManifest recombines the independently-tested gates exactly") {
    val lvl = TextOps.cascadeLevels(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val split = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val losers = Dedup.dedupAssignments(spark, sf).collect()
      .collect { case r if r.getLong(0) != r.getLong(1) => r.getLong(0) }.toSet
    val flagged = TextOps.decontamination(spark, sf).collect()
      .map(_.getLong(0)).toSet
    def gates(id: Long): Seq[Boolean] = {
      val g1 = split(id) == "train"
      val g2 = g1 && lvl(id)._2 == 4
      val g3 = g2 && !losers(id)
      Seq(true, g1, g2, g3, g3 && !flagged(id))
    }
    val ids = lvl.keys.toSeq
    val expected = (0 to 4).map { st =>
      val keep = ids.filter(id => gates(id)(st))
      (st, keep.length.toLong, keep.map(id => lvl(id)._1).sum)
    }
    val got = TextOps.releaseManifest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // the funnel is a funnel: counts never increase, and the release is
    // non-empty with every gate cutting something somewhere
    val ns = got.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(ns.last > 0)
    assert(ns.toSet.size > 1, "no gate cut anything — fixture is vacuous")
  }

  test("spanScrubClean rebuilds exactly the uncovered token stream") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val n = 8
    val occ = docs.flatMap { case (id, toks) =>
      toks.sliding(n).zipWithIndex.filter(_._1.length == n)
        .map { case (w, i) => (id, i + 1, w.mkString(" ")) }
    }
    val dup = occ.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = docs.flatMap { case (id, toks) =>
      val covered = Array.fill(toks.length + 1)(false)
      occ.filter(o => o._1 == id && dup(o._3)).foreach { case (_, st, _) =>
        (st until st + n).foreach(p => covered(p - 1) = true)
      }
      val removed = covered.count(identity).toLong
      if (removed == 0) None
      else {
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !covered(i) => t
        }
        Some((id, removed, kept.length.toLong, kept.mkString(" ")))
      }
    }.sortBy(_._1)
    val got = TextOps.spanScrubClean(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === expected.toSeq)
    // consistency with the stats query: same docs, same removed counts
    val stats = TextOps.spanScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got.map(_._1).toSet === stats.keySet)
    got.foreach { case (id, rm, kp, _) =>
      assert(stats(id) === ((rm, kp)), s"doc $id stats/clean drift")
    }
    // a scrubbed doc retains real content somewhere
    assert(got.exists(_._4.nonEmpty))
  }

  test("dsirSelect matches a sequential hashed-LM importance recount") {
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    def r6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(t => h60(s"dsir:$t") % 1024L)))
    val rawC = docs.flatMap(_._3).groupBy(identity).map { case (f, v) => f -> v.length.toLong }
    val tgtC = docs.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).map { case (f, v) => f -> v.length.toLong }
    val nr = docs.map(_._3.length.toLong).sum.toDouble
    val nt = docs.filter(_._2 == "en").map(_._3.length.toLong).sum.toDouble
    val llr = rawC.map { case (f, cr) =>
      f -> r6((math.log((tgtC.getOrElse(f, 0L) + 1).toDouble / (nt + 1024)) -
        math.log((cr + 1).toDouble / (nr + 1024))) * 1000000.0)
    }
    val weights = docs.filter(_._3.nonEmpty).map { case (id, _, fs) =>
      (id, fs.map(llr).sum)
    }
    val expected = weights.sortBy { case (id, w) => (-w, id) }.take(100)
      .zipWithIndex.map { case ((id, w), i) => (i + 1, id, w) }
    val got = TextOps.dsirSelect(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
    // selection is real: the sample is more English than the corpus
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val sampleEn = got.count(g => langOf(g._2) == "en").toDouble / got.length
    val corpusEn = docs.count(_._2 == "en").toDouble / docs.length
    assert(sampleEn > corpusEn,
      f"sample en-share $sampleEn%.3f should beat corpus $corpusEn%.3f")
  }

  test("qualityLrCalibration matches a sequential train+bin+floor-div recount") {
    def r6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = Tables(spark, sf, "documents")
      .select("text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(0).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq
        val y = if (toks.contains("spark") && toks.length >= 54) 1.0 else 0.0
        (y, Array(1.0, toks.length / 100.0,
          toks.distinct.length.toDouble / toks.length,
          r.getLong(1).toDouble / toks.length / 10.0))
      }
    val n = rows.length
    var w = Vector(0L, 0L, 0L, 0L)
    (1 to 5).foreach { _ =>
      val wd = w.map(_.toDouble / 1000000.0)
      val g = Array.fill(4)(0L)
      rows.foreach { case (y, x) =>
        val z = ((wd(0) * x(0) + wd(1) * x(1)) + wd(2) * x(2)) + wd(3) * x(3)
        val p = math.max(0.0, math.min(1.0, 0.5 + 0.25 * z))
        (0 to 3).foreach(j => g(j) += r6((p - y) * x(j) * 1000000.0))
      }
      w = w.indices.map(j => w(j) - r6(0.5 * g(j).toDouble / n)).toVector
    }
    val wd = w.map(_.toDouble / 1000000.0)
    val binned = rows.map { case (y, x) =>
      val z = ((wd(0) * x(0) + wd(1) * x(1)) + wd(2) * x(2)) + wd(3) * x(3)
      val p = math.max(0.0, math.min(1.0, 0.5 + 0.25 * z))
      val pu = r6(p * 1000000.0)
      (math.min(pu * 10 / 1000000, 9).toInt, y, p, pu)
    }
    val expected = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      (b, g.length.toLong,
        g.map(_._4).sum / g.length,
        g.map(_._2).sum.toLong * 1000000L / g.length,
        g.map { case (_, y, p, _) => r6((p - y) * (p - y) * 1000000.0) }.sum)
    }
    val got = TextOps.qualityLrCalibration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
    // the audit is non-degenerate: more than one bin is occupied, counts
    // cover the corpus, and every mean/rate sits in [0, 1e6]
    assert(got.length > 1)
    assert(got.map(_._2).sum === n.toLong)
    got.foreach { case (_, _, mp, pr, _) =>
      assert(mp >= 0L && mp <= 1000000L && pr >= 0L && pr <= 1000000L)
    }
  }

  test("bigramSurprisal: scores exactly the test split, positive cross-entropy") {
    val split = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextOps.bigramSurprisal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nBigrams, xent) =>
      assert(split(id) === "test", s"doc $id not in test split")
      assert(nBigrams > 0)
      // add-one smoothing keeps every P(b|a) < 1, so -avg(log p) > 0
      assert(xent > 0.0, s"non-positive cross-entropy for doc $id")
    }
    // every test-split doc with >= 2 tokens is scored
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").count(_.nonEmpty))
    val expectedIds = docs.collect {
      case (id, n) if split(id) == "test" && n >= 2 => id
    }.toSet
    assert(rows.map(_._1).toSet === expectedIds)
  }

  test("sourceInfluence matches a sequential jackknife replay; deltas " +
       "are zero-sum-ish and the rank order is by delta") {
    val q = TextOps.qualityScores(spark, sf).collect()
      .map(r => r.getLong(0) ->
        math.round(r.getDouble(1) * 10000)).toMap
    val src = Tables(spark, sf, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val per = src.groupBy(_._2).view.mapValues { ds =>
      (ds.length.toLong, ds.map(d => q(d._1)).sum)
    }.toMap
    val n = per.values.map(_._1).sum; val su = per.values.map(_._2).sum
    val expected = per.map { case (s0, (nd, sd)) =>
      s0 -> ((nd, sd * 10000 / nd, su * 10000 / n,
        (su - sd) * 10000 / (n - nd)))
    }
    val got = TextOps.sourceInfluence(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Int)].collect()
    assert(got.length === expected.size)
    got.foreach { case (s0, nd, ms, ma, mw, d, _) =>
      val (end, ems, ema, emw) = expected(s0)
      assert(nd === end, s"$s0 n"); assert(ms === ems, s"$s0 mean_src")
      assert(ma === ema, s"$s0 mean_all")
      assert(mw === emw, s"$s0 mean_without")
      assert(d === mw - ma, s"$s0 delta")
    }
    // ranked by delta desc then source; deltas must straddle zero
    // (some source drags, some source carries)
    val byRank = got.sortBy(_._7)
    assert(byRank.map(r => (-r._6, r._1)) ===
      byRank.map(r => (-r._6, r._1)).sorted)
    assert(got.exists(_._6 > 0) && got.exists(_._6 < 0))
  }

  test("splitBalance matches a sequential contingency replay; the hash " +
       "split does not correlate with source") {
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val split = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val src = Tables(spark, sf, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val obs = src.groupBy(d => (split(d._1), d._2)).view
      .mapValues(_.length.toLong).toMap
    val splits = obs.keys.map(_._1).toSeq.distinct
    val sources = obs.keys.map(_._2).toSeq.distinct
    val rt = splits.map(sp =>
      sp -> sources.map(so => obs.getOrElse((sp, so), 0L)).sum).toMap
    val ct = sources.map(so =>
      so -> splits.map(sp => obs.getOrElse((sp, so), 0L)).sum).toMap
    val n = rt.values.sum
    val cells = for (sp <- splits; so <- sources) yield {
      val o = obs.getOrElse((sp, so), 0L)
      val e = (rt(sp) * ct(so)).toDouble / n
      val cu = java.math.BigDecimal.valueOf((o - e) * (o - e) / e * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      (sp, so, o, e, cu)
    }
    val chi2 = r4(cells.map(_._5).sum / 1e6)
    val v = r4(math.sqrt(chi2 /
      (n * math.min(splits.length - 1, sources.length - 1)).toDouble))
    val got = TextOps.splitBalance(spark, sf)
      .as[(String, String, Long, Double, Double, Double, Double)]
      .collect()
    assert(got.length === splits.length * sources.length)
    val exp = cells.map(c => (c._1, c._2) ->
      ((c._3, r4(c._4), r4(c._5 / 1e6)))).toMap
    got.foreach { case (sp, so, o, e, c, x2, cv) =>
      val (eo, ee, ec) = exp((sp, so))
      assert(o === eo, s"($sp,$so) obs"); assert(e === ee, s"($sp,$so) e")
      assert(c === ec, s"($sp,$so) contrib")
      assert(x2 === chi2); assert(cv === v)
    }
    // an md5 hash split must be independent of source. At 500 docs
    // over 60 cells, sampling noise alone puts V around sqrt(dof/n)
    // ~ 0.28, so bound by that, not the large-sample 0.1 line
    assert(v < 0.28, s"hash split correlates with source (V=$v)")
    assert(chi2 < 70.7, // chi2 crit at dof=38, alpha=0.001
      s"independence rejected (chi2=$chi2)")
  }

  test("rboOverlap matches a sequential depth replay and is monotone") {
    val depth = 25
    // rebuild the pool and the raw TF-density scorer from raw text,
    // keep BM25 from the already-replay-tested operator, then replay
    // the depth profile sequentially
    val terms = Set("vector", "hash", "spark")
    val bm25 = TextOps.bm25TopK(spark, sf,
        Seq("vector", "hash", "spark"), k = Int.MaxValue)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect().toMap
    val dens = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        id -> (toks.count(terms), toks.length.toLong)
      }
      .collect { case (id, (tfSum, dl)) if tfSum > 0 =>
        id -> tfSum.toLong * 1000000 / dl
      }.toMap
    val pool = bm25.toSeq.sortBy { case (id, s) => (-s, id) }.take(depth)
    val rankA = pool.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val rankB = pool.map(_._1)
      .sortBy(id => (-dens(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1).toLong }.toMap
    val ms = rankA.keys.toSeq
      .map(id => math.max(rankA(id), rankB(id)))
    val w = TextOps.rboWeightsU(depth, 900)
    var run = 0L
    val expected = (1 to depth).map { d =>
      val ov = ms.count(_ <= d).toLong
      val term = w(d - 1) * ov / d
      run += term
      (d, ov, ov * 10000 / d, w(d - 1), term, run)
    }
    val got = TextOps.rboOverlap(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // overlap@d and the running RBO are monotone non-decreasing
    assert(got.map(_._2) === got.map(_._2).sorted)
    assert(got.map(_._6) === got.map(_._6).sorted)
    // same pool under both scorers: full agreement at the bottom...
    assert(got.last._2 === depth.toLong)
    // ...but NOT at every depth, or the comparison is vacuous
    assert(got.exists(r => r._2 < r._1),
      "BM25 and TF-density ordered the pool identically")
  }

  test("trigramBackoff matches a sequential stupid-backoff replay") {
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id",
        TextOps.hashBucket(org.apache.spark.sql.functions.col("doc_id"),
          "split:").as("b"), $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).toSeq))
    def ngrams(t: Seq[String], n: Int): Seq[String] =
      if (t.length >= n) t.sliding(n).map(_.mkString(" ")).toSeq
      else Seq.empty
    val train = docs.filter(_._2 < 80)
    def counts(gs: Seq[String]) =
      gs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c3 = counts(train.flatMap(d => ngrams(d._3, 3)))
    val c2 = counts(train.flatMap(d => ngrams(d._3, 2)))
    val c1 = counts(train.flatMap(_._3))
    val nn = c1.values.sum; val v = c1.size.toLong
    val expected = docs.filter(d => d._2 >= 90 && d._3.length >= 3)
      .map { case (id, _, toks) =>
        val lus = ngrams(toks, 3).map { g =>
          val w = g.split(" ")
          val lp =
            if (c3.contains(g))
              math.log(c3(g).toDouble / c2(w(0) + " " + w(1)))
            else if (c2.contains(w(1) + " " + w(2)))
              math.log(0.4 * c2(w(1) + " " + w(2)) / c1(w(1)))
            else
              math.log(0.16 * (c1.getOrElse(w(2), 0L) + 1) / (nn + v))
          java.math.BigDecimal.valueOf(lp * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        }
        id -> ((lus.length.toLong, lus.sum,
          r4(-(lus.sum / 1e6) / lus.length)))
      }.toMap
    val got = TextOps.trigramBackoff(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === expected.size && expected.nonEmpty)
    got.foreach { case (id, n, slu, xent) =>
      val (en, eslu, exent) = expected(id)
      assert(n === en, s"doc $id n_trigrams")
      assert(slu === eslu, s"doc $id sum_logp_u")
      assert(xent === exent, s"doc $id xent")
      // every branch's score is a probability (<= 1 even after the 0.4
      // backoff multipliers), so cross-entropy stays positive
      assert(xent > 0.0, s"doc $id xent sign")
    }
  }

  test("qualityWeightedSample keeps exactly bucket < round(quality*50)") {
    val quality = TextOps.qualityScores(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val buckets = Tables(spark, sf, "documents")
      .select($"doc_id",
        TextOps.hashBucket(org.apache.spark.sql.functions.col("doc_id"),
          "qsample:").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = quality.collect {
      case (id, q) if buckets(id) < math.round(q * 50) => id
    }.toSet
    val got = TextOps.qualityWeightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSet === expected)
    got.foreach { case (id, q) => assert(q === quality(id)) }
    assert(expected.nonEmpty && expected.size < quality.size)
  }

  test("zipfSlope: negative slope matching a driver-side least-squares fit") {
    val Array(row) = TextOps.zipfSlope(spark, sf).collect()
    val (nTokens, slope) = (row.getLong(0), row.getDouble(1))
    val freqs = Tables(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .filter(_._2 >= 5)
    val ranked = freqs.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((_, f), i) => (math.log(i + 1.0), math.log(f.toDouble)) }
    val n = ranked.length
    assert(nTokens === n.toLong)
    val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
    val sxy = ranked.map { case (x, y) => x * y }.sum
    val sx2 = ranked.map { case (x, _) => x * x }.sum
    val expected = BigDecimal((n * sxy - sx * sy) / (n * sx2 - sx * sx))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(slope === expected)
    assert(slope < 0.0, s"token frequencies should fall with rank: $slope")
  }

  test("boilerplateScores matches a driver-side shingle-frequency recount") {
    val rows = TextOps.boilerplateScores(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val shingles = docs.map { case (id, t) =>
      id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    }.filter(_._2.nonEmpty)
    val df = shingles.flatMap { case (id, sh) => sh.distinct.map(s => (s, id)) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    val expected = shingles.map { case (id, sh) =>
      id -> (sh.length.toLong, sh.count(s => df(s) >= 4).toLong)
    }.toMap
    assert(rows === expected)
  }

  test("datasetCard: volumes recount exactly, quality mean in [0,1]") {
    val card = TextOps.datasetCard(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    val docs = Tables(spark, sf, "documents")
      .select("lang", "source", "n_chars").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val expected = docs.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(card.keySet === expected.keySet)
    card.foreach { case (k, (nDocs, nChars, avgQ)) =>
      assert((nDocs, nChars) === expected(k))
      assert(avgQ >= 0.0 && avgQ <= 1.0, s"$k avg_quality out of range: $avgQ")
    }
  }

  test("trainingOrder: a reproducible permutation — each shard a dense 1..n run") {
    val rows = TextOps.trainingOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === nDocs) // a permutation covers every doc once
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (shard, grp) =>
      assert(grp.map(_._3).sorted.toSeq === (1L to grp.length.toLong).toSeq,
        s"shard $shard positions not dense")
    }
    // deterministic: a second run is bit-identical
    val again = TextOps.trainingOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("filterCascade: 5 monotone stages starting from the full corpus") {
    val rows = TextOps.filterCascade(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (0 to 4))
    assert(rows.map(_._2).toSeq ===
      Seq("raw", "min_length", "quality", "lang_match", "distinct_ratio"))
    // stage 0 is the unfiltered corpus
    assert(rows.head._3 === Tables(spark, sf, "documents").count())
    // each gate can only shrink the survivor set, docs and tokens alike
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"cascade grew: $a -> $b")
    }
    // disabling the length and quality gates keeps everything through
    // stages 0-1 (lang_match and distinct_ratio can still drop docs, so
    // only the two disabled gates are asserted open)
    val open = TextOps.filterCascade(spark, sf, minChars = 0, minQuality = 0.0)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val raw = open.head._2
    assert(open.take(2).forall(_._2 === raw), open.toSeq.toString)
  }

  test("repeatedSpans: deterministic top-k of genuinely shared spans") {
    val rows = TextOps.repeatedSpans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { case (span, nDocs, nOccur) =>
      assert(span.split(" ").length === 8)
      assert(nDocs >= 2 && nOccur >= nDocs)
    }
    // ranking is (n_docs, n_occur) non-increasing, span-tiebroken
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && (a._3 > b._3 ||
          (a._3 == b._3 && a._1 < b._1))), s"order violated: $a then $b")
      case _ => ()
    }
    val again = TextOps.repeatedSpans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("mixtureRateBp matches BigInt reference math at petascale token counts") {
    // totals up to 2e13 tokens per source (a multi-TB source): the naive
    // Long product sw*total overflows at ~3e19, which wrapped negative
    // and silently zeroed the source's sample before the DECIMAL fix
    val rnd = new scala.util.Random(7)
    val rows = (Seq(1L, 999L, 1500000000000L, 20000000000000L) ++
      Seq.fill(20)(math.abs(rnd.nextLong()) % 20000000000000L + 1))
      .zipWithIndex.map { case (total, i) => (s"s$i", total) }
    val budget = 3000000000000L // 3e12-token training budget
    val df = rows.toDF("source", "total")
      .withColumn("w", floor(sqrt($"total".cast("double"))).cast("long"))
    val sw = df.agg(sum($"w")).head().getLong(0)
    val got = df.withColumn("sw", lit(sw))
      .withColumn("rate_bp", TextOps.mixtureRateBp(budget))
      .select($"source", $"w", $"rate_bp")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (src, total) =>
      val (w, rateBp) = got(src)
      val expected = (BigInt(budget) * w * 10000 / (BigInt(sw) * total))
        .min(BigInt(10000)).toLong
      assert(rateBp === expected, s"$src total=$total")
      assert(rateBp >= 0 && rateBp <= 10000)
    }
    // the stress totals genuinely exceed Long capacity in the naive form
    assert(rows.map(_._2).max * BigInt(sw) > BigInt(Long.MaxValue))
  }

  test("mixtureSample: deterministic, rate-consistent, within-budget draw") {
    val rows = TextOps.mixtureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // one rate per source, in basis points
    val bySrc = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    bySrc.foreach { case (src, rates) =>
      assert(rates.length === 1 && rates.head >= 0 && rates.head <= 10000,
        s"$src rates: ${rates.toSeq}")
    }
    // the draw is a subset of the corpus and reruns bit-identically
    val ids = Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).forall(ids))
    val again = TextOps.mixtureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq === rows.toSeq)
    // a budget beyond the corpus saturates every rate: the whole corpus drawn
    val all = TextOps.mixtureSample(spark, sf, budgetTokens = 100000000L)
      .collect()
    assert(all.length.toLong === ids.size)
  }

  test("bpeMerges learns the same merge table as a sequential reference") {
    val got = TextOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got.length === 5)
    // sequential reference: same tokenizer, plain Scala merge loop
    val wordCounts = graft.Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.text.tokensLower($"text")).as("word"))
      .collect().map(_.getString(0)).filter(_.matches("^[a-z]+$"))
      .groupBy(w => w).map { case (w, ws) => w -> ws.length.toLong }
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.toVector.map(_.toString) -> c }.toMap
    def mergeLeftToRight(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val expected = (1 to 5).map { step =>
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val ((a, b), total) = pairCounts.toSeq
        .minBy { case ((x, y), t) => (-t, s"$x $y") }
      vocab = vocab.toSeq.map { case (syms, c) => mergeLeftToRight(syms, a, b) -> c }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      (step, s"$a $b", a + b, total)
    }
    assert(got === expected)
    // the merges genuinely compose: later steps may merge earlier outputs
    assert(got.map(_._4).sliding(2).forall { case Seq(x, y) => x >= y; case _ => true })
  }

  test("bpeEncode matches a sequential re-application of the trained merges") {
    val merges = TextOps.bpeMerges(spark, sf).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length === 5)
    // engine tokenization reused (validated elsewhere); the reference
    // re-applies the merges with java String.replace, which shares the
    // SQL replace contract: left-to-right, non-overlapping, scan resumes
    // AFTER the replacement (the engine, oracle, and reference must all
    // agree on the consumed-boundary-space case)
    val docWords = Tables(spark, sf, "documents")
      .select($"doc_id", $"lang",
        org.apache.spark.sql.functions.filter(
          graft.functions.text.tokensLower($"text"),
          w => w.rlike("^[a-z]+$")).as("words"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    def idOf(sym: String): Int = merges.indexWhere(_._2 == sym) match {
      case -1 => sym.head - 'a'
      case i  => 26 + i
    }
    val expected = docWords.map { case (id, lang, words) =>
      val syms = words.flatMap { w =>
        val spelled = " " + w.map(_.toString).mkString(" ") + " "
        val enc = merges.foldLeft(spelled) { case (acc, (p, m)) =>
          acc.replace(" " + p + " ", " " + m + " ")
        }
        enc.trim.split(" ").filter(_.nonEmpty)
      }
      (id, lang, syms.length.toLong, syms.map(idOf).mkString(" "))
    }.sortBy(_._1).toSeq
    val got = TextOps.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === expected)
    // packing on engine counts conserves tokens: bin sums == corpus total
    val totalTokens = expected.map(_._3).sum
    val packed = Packing.sequencePackingEncoded(spark, sf).collect()
    assert(packed.map(_.getLong(3)).sum === totalTokens)
    // vocab stats reconcile with the same encode: per-symbol uses sum to
    // the corpus token count, ids/is_merge consistent with the reference
    val vocab = TextOps.bpeVocabStats(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(vocab.map(_._3).sum === totalTokens)
    val refUses = expected.flatMap(_._4.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (id, xs) => id.toInt -> xs.length.toLong }
    assert(vocab.map(v => v._1 -> v._3).toMap === refUses)
    vocab.foreach { case (id, sym, _, isMerge) =>
      assert(isMerge === (sym.length > 1))
      assert(if (isMerge) id >= 26 else id === sym.head - 'a')
    }
  }

  test("hashedTfNearDupPairs matches a full driver recount (df cap, hashing, banding)") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tokens(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tk = docs.flatMap { case (id, t) => tokens(t).map(id -> _) }
    val nd = tk.map(_._1).distinct.length
    val df = tk.distinct.groupBy(_._2)
      .map { case (tok, xs) => tok -> xs.map(_._1).distinct.length }
    val kept = tk.filter { case (_, tok) => df(tok) * 10 <= nd }
    def h(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fh:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(d, 16)
    }
    val vecs = kept.groupBy(_._1).map { case (id, xs) =>
      val v = Array.fill(64)(0.0)
      xs.foreach { case (_, tok) =>
        val hh = h(tok)
        v((hh % 64).toInt) += (if ((hh / 64) % 2 == 0) 1.0 else -1.0)
      }
      id -> v
    }.filter(_._2.exists(_ != 0.0))
    def sig(v: Array[Double], band: Int): Int =
      (0 until 4).map { k =>
        val dot = (0 until 64).map(d => v(d) * Similarity.planeComponent(band * 4 + k, d)).sum
        if (dot > 0) 1 << k else 0
      }.sum
    val sigs = vecs.map { case (id, v) => id -> (0 until 24).map(b => sig(v, b)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if (0 until 24).exists(band => sigs(a)(band) == sigs(b)(band))
      c = r4(cos(vecs(a), vecs(b))) if c >= 0.9
    } yield (a, b, c)).toSeq
    val got = TextOps.hashedTfNearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "corpus should contain hashed-TF near-dups")
  }

  test("contaminationReport reconciles with both parent screens") {
    val ngram = TextOps.decontamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sem = Similarity.semanticDecontamination(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val got = TextOps.contaminationReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.length === sem.size, "one row per held-out doc")
    val byEval = ngram.groupBy(_._2)
    got.foreach { case (eid, nDocs, nGrams, semCos, flagged) =>
      val hits = byEval.getOrElse(eid, Array.empty)
      assert(nDocs === hits.length.toLong)
      assert(nGrams === hits.map(_._3).sum)
      val (bcs, bflag) = sem(eid)
      assert(semCos === bcs)
      assert(flagged === (nDocs > 0 || bflag))
    }
    // the two screens genuinely disagree somewhere, or the report is moot
    assert(got.exists(g => g._2 > 0 || g._5))
  }

  test("bpeCompressionStats reconciles with the encode and roundtrip frames") {
    val enc = TextOps.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val chars = TextOps.bpeRoundtrip(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = enc.groupBy(_._2).map { case (lang, ds) =>
      val nl = ds.map(d => chars(d._1)).sum
      val nt = ds.map(_._3).sum
      (lang, ds.length.toLong, nl, nt, (nl * 10000L / nt).toDouble / 10000.0)
    }.toSeq.sortBy(_._1)
    val got = TextOps.bpeCompressionStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // merges exist, so every lang compresses below 1 token per char
    got.foreach { case (lang, _, nl, nt, cpt) =>
      assert(nt < nl, s"$lang: merges should shrink the token count")
      assert(cpt > 1.0)
    }
  }

  test("domainCapSample: salted two-stage top-k equals the global per-domain rank") {
    def h(id: Long, salt: String, mod: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(d, 16) % mod
    }
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cap = 10
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy { case (id, _) => (h(id, "domcap:", 1000000L), id) }
        .take(cap).zipWithIndex
        .map { case ((id, _), i) => (id, src, (i + 1).toLong) }
    }.sortBy(_._1)
    val got = TextOps.domainCapSample(spark, sf, cap).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    // every domain capped, none over
    assert(got.groupBy(_._2).values.forall(_.length <= cap))
  }

  test("bpeRoundtrip: decode(encode(x)) restores every document's letters") {
    val got = TextOps.bpeRoundtrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // the verdict column is computed, not asserted — assert it here
    assert(got.nonEmpty && got.forall(_._4),
      s"roundtrip broke for docs ${got.filterNot(_._4).take(5).map(_._1).mkString(",")}")
    // n_tokens agrees with the encode; decoded_chars with the raw letter
    // count of the trained word population (ids carry ALL the chars)
    val enc = TextOps.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val letters = Tables(spark, sf, "documents")
      .select($"doc_id",
        org.apache.spark.sql.functions.filter(
          graft.functions.text.tokensLower($"text"),
          w => w.rlike("^[a-z]+$")).as("words"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).map(_.length).sum.toLong)
      .toMap
    got.foreach { case (id, nTok, nChars, _) =>
      assert(nTok === enc(id))
      assert(nChars === letters(id))
    }
  }

  test("bpeFertility reconciles with the encode frame and the trained " +
       "word population") {
    import spark.implicits._
    val enc = TextOps.bpeEncode(spark, sf)
      .select($"lang", $"n_tokens").as[(String, Long)].collect()
    val words = graft.Tables(spark, sf, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
      .map { case (lang, t) =>
        (lang, t.trim.toLowerCase.split("\\s+")
          .count(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z')).toLong)
      }
    val byLangTok = enc.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byLangW = words.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val rows = TextOps.bpeFertility(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nW, nT, tpw) =>
      assert(nW === byLangW(lang))
      assert(nT === byLangTok(lang))
      assert(nDocs === words.count(_._1 == lang).toLong)
      assert(tpw === (nT * 10000 / nW).toDouble / 10000.0)
      assert(tpw >= 1.0, s"$lang fertility $tpw < 1 — merges cannot split words")
    }
  }

  test("temperatureSample hits each language's quota exactly, capped by " +
       "availability, deterministically") {
    import spark.implicits._
    val budget = 200L
    val quotas = TextOps.temperatureMix(spark, sf, budget)
      .select($"lang", $"quota_docs").as[(String, Long)].collect().toMap
    val avail = graft.Tables(spark, sf, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val sample = TextOps.temperatureSample(spark, sf, budget)
      .as[(Long, String, Long)].collect()
    val byLang = sample.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    quotas.foreach { case (lang, q) =>
      assert(byLang.getOrElse(lang, 0L) === math.min(q, avail(lang)),
        s"$lang quota $q avail ${avail(lang)}")
    }
    val again = TextOps.temperatureSample(spark, sf, budget)
      .as[(Long, String, Long)].collect()
    assert(sample.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("piiScrub: corpus passes through untouched (no PII shapes here); " +
       "redaction path proven on constructed documents") {
    import spark.implicits._
    val rows = TextOps.piiScrub(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    val texts = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(rows.length === texts.size)
    rows.foreach { case (id, e, u, d, clean) =>
      assert((e, u, d) === ((0L, 0L, 0L)))
      assert(clean === texts(id))
    }
    val synth = Seq(
      (1L, "mail me at jo.doe+x@ex-a.co.uk now"),
      (2L, "see https://ex.com/a?b=1 and http://b.io end"),
      (3L, "card 12345678901 and short 1234567 stay"),
      (4L, "a@b.cd via https://z.dev 99999999"))
      .toDF("doc_id", "text")
    val got = TextOps.piiScrubFrom(synth)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1L, 0L, 0L, "mail me at <EMAIL> now")))
    assert(got(2L) === ((2L, 0L, 2L, 0L, "see <URL> and <URL> end")))
    assert(got(3L) === ((3L, 0L, 0L, 1L, "card <NUMBER> and short 1234567 stay")))
    assert(got(4L) === ((4L, 1L, 1L, 1L, "<EMAIL> via <URL> <NUMBER>")))
  }

  test("codeSwitchScreen matches a sequential stopword-evidence replay") {
    import spark.implicits._
    val lists = Seq("en", "de", "fr", "es")
      .map(l => graft.functions.text.stopwords(l).toSet)
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.map { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").filterNot(_.isEmpty)
      val hits = lists.map(ws => toks.count(ws.contains).toLong)
      val sorted = hits.sorted.reverse
      id -> (hits.count(_ > 0).toLong, sorted(0), sorted(1),
        sorted(0) > 0 && sorted(1) * 10000 >= sorted(0) * 3000)
    }.toMap
    val got = TextOps.codeSwitchScreen(spark, sf)
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, _, nl, best, second, mixed) =>
      assert((nl, best, second, mixed) === expected(id), s"doc $id")
    }
    // this corpus's languages share one domain vocabulary, so every real
    // doc screens clean — prove the MIXED path on constructed bilingual
    // docs (second list's evidence at 0%, 25%, 50% of the first's)
    val synth = Seq(
      (1L, "mx", "the of and the of and the of"),          // pure en
      (2L, "mx", "the of and the der die le el"),          // heavy mixing
      (3L, "mx", "the of and that it was in is der die"))  // 2/8 de
      .toDF("doc_id", "lang", "text")
    val flags = TextOps.codeSwitchScreenFrom(synth)
      .select($"doc_id", $"mixed").as[(Long, Boolean)].collect().toMap
    assert(flags(1L) === false)
    assert(flags(2L) === true)
    assert(flags(3L) === false) // 2/8 = 25% < the 30% bar
  }

  test("gopherRules matches a sequential replay of every rule") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val required = Set("the", "a") // the corpus-tuned list the query uses
    val expected = docs.map { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").filterNot(_.isEmpty)
      val n = toks.length.toLong
      val sumLen = toks.map(_.length.toLong).sum
      def occ(s: String, sub: String): Long = {
        var c = 0L; var i = s.indexOf(sub)
        while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
        c
      }
      val nSym = occ(t, "#") + occ(t, "...") + occ(t, "…")
      val nAlpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nStop = required.count(toks.contains).toLong
      val lines = t.split("\n", -1)
      val nLines = lines.length.toLong
      val nBullet = lines.count(l => // ltrim = spaces only, like the engine
        l.dropWhile(_ == ' ').headOption.exists("-*•".contains(_))).toLong
      val nEll = lines.count(l =>
        l.stripTrailing.endsWith("...") || l.stripTrailing.endsWith("…")).toLong
      val rules = Seq(n >= 50 && n <= 100000,
        sumLen >= 3 * n && sumLen <= 10 * n,
        10 * nSym <= n, 5 * nAlpha >= 4 * n, nStop >= 2,
        10 * nBullet <= 9 * nLines, 10 * nEll <= 3 * nLines)
      id -> (n, rules, rules.forall(identity))
    }.toMap
    val got = TextOps.gopherRules(spark, sf, Seq("the", "a")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, rules, keep) = expected(r.getLong(0))
      assert(r.getLong(1) === n)
      (0 until 7).foreach(i => assert(r.getBoolean(2 + i) === rules(i),
        s"doc ${r.getLong(0)} rule $i"))
      assert(r.getBoolean(9) === keep)
    }
    // both verdicts genuinely occur
    assert(got.exists(_.getBoolean(9)) && got.exists(!_.getBoolean(9)))
  }

  test("distinctNgrams matches a sequential n-gram census") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
    def grams(t: String, n: Int): Seq[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").filterNot(_.isEmpty).toSeq
      if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val rows = TextOps.distinctNgrams(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      val mine = docs.filter(_._1 == lang)
      Seq(1, 2, 3).zipWithIndex.foreach { case (n, i) =>
        val all = mine.flatMap(d => grams(d._2, n))
        assert(r.getLong(1 + i * 3) === all.length.toLong, s"$lang total_$n")
        assert(r.getLong(2 + i * 3) === all.distinct.length.toLong, s"$lang uniq_$n")
        assert(r.getLong(3 + i * 3) ===
          all.distinct.length.toLong * 10000 / all.length)
      }
    }
  }

  test("ccnetBuckets: thirds are balanced, contiguous in score, and " +
       "cover every scored doc") {
    import spark.implicits._
    val rows = TextOps.ccnetBuckets(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    val sizes = Seq(rows("head")._1, rows("middle")._1, rows("tail")._1)
    assert(sizes.max - sizes.min <= 1, s"unbalanced thirds: $sizes")
    // rank-contiguous buckets: head's max score <= middle's min, etc.
    assert(rows("head")._4 <= rows("middle")._2)
    assert(rows("middle")._4 <= rows("tail")._2)
    rows.values.foreach { case (_, mn, mean, mx) =>
      assert(mn <= mean && mean <= mx)
    }
  }

  test("temperatureMix: quotas sum to the budget exactly, follow sqrt " +
       "weights, and flatten the head/tail ratio") {
    import spark.implicits._
    val budget = 100000L
    val rows = TextOps.temperatureMix(spark, sf, budget)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length >= 2)
    assert(rows.map(_._4).sum === budget)
    rows.foreach { case (_, n, wU, quota) =>
      assert(wU === java.math.BigDecimal.valueOf(math.sqrt(n.toDouble) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
      // quota within 1 of the exact real share (Hamilton property)
      val tot = rows.map(_._3).sum
      val exact = wU.toDouble * budget / tot
      assert(math.abs(quota - exact) < 1.0 + 1e-9, s"quota $quota vs $exact")
    }
    // temperature flattening: head/tail doc ratio strictly exceeds the
    // head/tail quota ratio whenever the corpus is imbalanced
    val byN = rows.sortBy(_._2)
    val (tail, head) = (byN.head, byN.last)
    if (head._2 > tail._2)
      assert(head._2.toDouble / tail._2 >
        head._4.toDouble / tail._4 - 1e-9)
  }

  test("sourceLangMi matches an exact sequential replay and is " +
       "non-negative on real data") {
    import spark.implicits._
    val cells = graft.Tables(spark, sf, "documents")
      .groupBy($"source", $"lang").count()
      .as[(String, String, Long)].collect()
    val ns = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nl = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nt = cells.map(_._3).sum
    val num = cells.map { case (src, lang, n) =>
      val pmiU = java.math.BigDecimal.valueOf(
          math.log((n * nt).toDouble / (ns(src) * nl(lang)).toDouble) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      n * pmiU
    }.sum
    val expectedMi = (num + 1000000L * nt) / nt - 1000000L
    val row = TextOps.sourceLangMi(spark, sf).as[(Long, Long, Long)].head()
    assert(row._1 === nt)
    assert(row._2 === cells.length.toLong)
    assert(row._3 === expectedMi)
    assert(row._3 >= -1L) // true MI >= 0; rounding can shave at most ~1e-6
  }

  test("giniSources: Lorenz shares and Gini match a sequential recount") {
    val per = Tables(spark, sf, "documents")
      .as[(Long, String, String, String, Long)].collect()
      .groupBy(_._4)
      .view.mapValues(_.map(d =>
        d._2.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong).sum)
      .toSeq.sortBy(p => (p._2, p._1))
    val tot = per.map(_._2).sum
    val m = per.length.toLong
    val wsum = per.zipWithIndex.map { case ((_, x), i) => (i + 1) * x }.sum
    val gini = (2 * wsum - (m + 1) * tot) * 10000 / (m * tot)
    val rows = TextOps.giniSources(spark, sf).collect()
    assert(rows.length === per.length)
    var cum = 0L
    rows.zip(per).zipWithIndex.foreach { case ((r, (src, x)), i) =>
      cum += x
      assert(r.getAs[String]("source") === src)
      assert(r.getAs[Long]("n_tokens") === x)
      assert(r.getAs[Int]("rank") === i + 1)
      assert(r.getAs[Long]("lorenz_bp") === cum * 10000 / tot)
      assert(r.getAs[Long]("gini_bp") === gini)
    }
    // Lorenz curve is convex-monotone: shares never decrease, end at 100%
    assert(rows.last.getAs[Long]("lorenz_bp") === 10000L)
    assert(gini >= 0 && gini < 10000)
  }

  test("screenKappa: confusion cells and kappa identities hold exactly") {
    val keep = TextOps.gopherRules(spark, sf, Seq("the", "a"))
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val hiQ = TextOps.qualityScores(spark, sf)
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
      .map { case (id, q) =>
        id -> (BigDecimal(q * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong >= 5000L)
      }.toMap
    assert(keep.keySet === hiQ.keySet)
    val a = keep.count { case (id, k) => k && hiQ(id) }.toLong
    val b = keep.count { case (id, k) => k && !hiQ(id) }.toLong
    val c = keep.count { case (id, k) => !k && hiQ(id) }.toLong
    val d = keep.count { case (id, k) => !k && !hiQ(id) }.toLong
    val n = a + b + c + d
    val row = TextOps.screenKappa(spark, sf).collect().head
    assert(row.getAs[Long]("a") === a)
    assert(row.getAs[Long]("b") === b)
    assert(row.getAs[Long]("c") === c)
    assert(row.getAs[Long]("d") === d)
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("po_bp") === (a + d) * 10000 / n)
    assert(row.getAs[Long]("pe_bp") ===
      ((a + b) * (a + c) + (c + d) * (b + d)) * 10000 / (n * n))
    val den = (a + b) * (b + d) + (a + c) * (c + d)
    val kappaU = Math.floorDiv(2000000L * (a * d - b * c), den)
    assert(row.getAs[Long]("kappa_u") === kappaU)
    assert(kappaU >= -1000000L && kappaU <= 1000000L)
  }

  test("goodTuringMass: hapax counts and missing mass recount exactly") {
    val byLang = Tables(spark, sf, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues { docs =>
        val counts = docs.flatMap(d =>
            d._2.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
          .groupBy(identity).map(_._2.length.toLong)
        (counts.sum, counts.size.toLong,
          counts.count(_ == 1L).toLong, counts.count(_ == 2L).toLong)
      }.toMap
    val rows = TextOps.goodTuringMass(spark, sf).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet === byLang.keySet)
    rows.foreach { r =>
      val (n, v, n1, n2) = byLang(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("vocab") === v)
      assert(r.getAs[Long]("n1") === n1)
      assert(r.getAs[Long]("n2") === n2)
      assert(r.getAs[Long]("missing_mass_bp") === n1 * 10000 / n)
      if (n1 > 0) assert(r.getAs[Long]("r1_star_u") === 2000000L * n2 / n1)
    }
  }

  test("chao1Richness: hapax-based richness recounts; estimate >= vocab") {
    val byLang = Tables(spark, sf, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues { docs =>
        val counts = docs.flatMap(d =>
            d._2.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
          .groupBy(identity).map(_._2.length.toLong)
        (counts.size.toLong, counts.count(_ == 1L).toLong,
          counts.count(_ == 2L).toLong)
      }.toMap
    TextOps.chao1Richness(spark, sf).collect().foreach { r =>
      val (v, n1, n2) = byLang(r.getAs[String]("lang"))
      val unseen = n1 * (n1 - 1) / (2 * (n2 + 1))
      assert(r.getAs[Long]("vocab") === v)
      assert(r.getAs[Long]("n1") === n1)
      assert(r.getAs[Long]("n2") === n2)
      assert(r.getAs[Long]("unseen_est") === unseen)
      assert(r.getAs[Long]("chao1") === v + unseen)
      assert(r.getAs[Long]("chao1") >= v)
    }
  }

  test("sourceDiversity: Shannon/Simpson recount; bounds hold") {
    val per = Tables(spark, sf, "documents")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val nt = per.values.sum
    val m = per.size.toLong
    val sumSq = per.values.map(n => n * n).sum
    val shannon = -per.values.map { n =>
      n * BigDecimal(math.log(n.toDouble / nt.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum / nt
    val lnM = BigDecimal(math.log(m.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val row = TextOps.sourceDiversity(spark, sf).collect().head
    assert(row.getAs[Long]("n_sources") === m)
    assert(row.getAs[Long]("n_docs") === nt)
    assert(row.getAs[Long]("inv_simpson_milli") === nt * nt * 1000 / sumSq)
    assert(row.getAs[Long]("shannon_u") === shannon)
    assert(row.getAs[Long]("evenness_bp") === shannon * 10000 / lnM)
    // 1 <= effective sources <= m; evenness <= 100% (+rounding slack)
    assert(row.getAs[Long]("inv_simpson_milli") >= 1000L)
    assert(row.getAs[Long]("inv_simpson_milli") <= m * 1000L)
    assert(row.getAs[Long]("evenness_bp") <= 10001L)
  }

  test("screenAuc: midrank AUC equals direct pair counting") {
    val keep = TextOps.gopherRules(spark, sf, Seq("the", "a"))
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val qu = TextOps.qualityScores(spark, sf)
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
      .map { case (id, q) => id -> BigDecimal(q * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }.toMap
    val pos = keep.collect { case (id, true) => qu(id) }.toSeq
    val neg = keep.collect { case (id, false) => qu(id) }.toSeq
    // direct O(n+ * n-) count: wins + half-ties, in x2 units
    val u1x2 = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p).toLong).sum
    val row = TextOps.screenAuc(spark, sf).collect().head
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    assert(row.getAs[Long]("auc_bp") ===
      u1x2 * 10000 / (2L * pos.length * neg.length))
    assert(row.getAs[Long]("gini_bp") === 2 * row.getAs[Long]("auc_bp") - 10000)
  }

  test("tokenDispersion: DP recounts exactly and sits in [0, 1)") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty) }
    val lTot = docs.map(_._2.length.toLong).sum
    val totals = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val top = totals.toSeq.sortBy { case (t, c) => (-c, t) }.take(25)
    val rows = TextOps.tokenDispersion(spark, sf).collect()
    assert(rows.map(r => (r.getAs[String]("tok"), r.getAs[Long]("c_t"))).toSeq
      === top)
    rows.foreach { r =>
      val tok = r.getAs[String]("tok")
      val ct = totals(tok)
      val present = docs.map { case (_, ts) =>
        (ts.length.toLong, ts.count(_ == tok).toLong) }.filter(_._2 > 0)
      val presAbs = present.map { case (ld, cdt) =>
        math.abs(cdt * lTot - ld * ct) }.sum
      val presLen = present.map(_._1).sum
      val dp = (presAbs + (lTot - presLen) * ct) * 10000 / (2 * ct * lTot)
      assert(r.getAs[Long]("n_docs_present") === present.length.toLong)
      assert(r.getAs[Long]("dp_bp") === dp)
      assert(dp >= 0 && dp < 10000)
    }
  }

  test("entropyRate: fixed-point unigram and conditional entropy recount; " +
       "context never hurts") {
    def lnU(num: Long, den: Long): Long =
      BigDecimal(math.log(num.toDouble / den.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val byLang = Tables(spark, sf, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(
        _._2.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))).toMap
    val rows = TextOps.entropyRate(spark, sf).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet === byLang.keySet)
    rows.foreach { r =>
      val docs = byLang(r.getAs[String]("lang"))
      val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong)
      val n = uni.values.sum
      val h1 = -uni.values.map(c => c * lnU(c, n)).sum / n
      val bi = docs.flatMap(_.sliding(2).filter(_.length == 2).map(p =>
        (p(0), p(1)))).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val ctx = bi.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
      val n2 = bi.values.sum
      val hc = -bi.map { case ((a, _), c) => c * lnU(c, ctx(a)) }.sum / n2
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("h1_u") === h1)
      assert(r.getAs[Long]("n_bigrams") === n2)
      assert(r.getAs[Long]("hcond_u") === hc)
      assert(r.getAs[Long]("gain_bp") === math.max(h1 - hc, 0L) * 10000 / h1)
      assert(hc <= h1, "conditioning on context must not raise entropy")
    }
  }

  test("keyTerms: log-odds z-scores recount; top terms are per-source " +
       "distinctive") {
    val cells = Tables(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .flatMap { case (s0, t) =>
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map((s0, _)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val yt = cells.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).filter(_._2 >= 5).toMap
    val ns = cells.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val nt = cells.values.sum
    def z(s0: String, tok: String): (Long, Long) = {
      val y = cells((s0, tok)); val yr = yt(tok) - y
      val nsv = ns(s0); val nr = nt - nsv
      val delta = BigDecimal((math.log((2 * y + 1).toDouble /
          (2 * (nsv - y) + 1).toDouble)
        - math.log((2 * yr + 1).toDouble / (2 * (nr - yr) + 1).toDouble))
        * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val s2 = 2000000000000L / (2 * y + 1) +
        2000000000000L / (2 * (nsv - y) + 1) +
        2000000000000L / (2 * yr + 1) + 2000000000000L / (2 * (nr - yr) + 1)
      (delta, BigDecimal(delta / math.sqrt(s2.toDouble) * 1e4)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val rows = TextOps.keyTerms(spark, sf).collect()
    rows.foreach { r =>
      val (delta, zu) = z(r.getAs[String]("source"), r.getAs[String]("tok"))
      assert(r.getAs[Long]("delta_u") === delta)
      assert(r.getAs[Long]("z_u4") === zu)
    }
    // per source: the engine's top-5 are the sequential top-5
    rows.groupBy(_.getAs[String]("source")).foreach { case (s0, got) =>
      val expected = yt.keys.filter(t => cells.contains((s0, t))).toSeq
        .map(t => (t, z(s0, t)._2))
        .sortBy { case (t, zu) => (-zu, t) }.take(5).map(_._1)
      assert(got.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[String]("tok")).toSeq === expected, s"top-5 for $s0")
    }
  }

  test("ndcgAudit: discounted gains recount against the BM25 gold order") {
    val gold = TextOps.bm25TopK(spark, sf, k = 10).collect()
      .map(_.getAs[Long]("doc_id"))
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty) }.toMap
    val terms = Set("vector", "hash", "spark")
    def densU(id: Long): Long = {
      val ts = docs(id)
      ts.count(terms.contains(_)).toLong * 1000000L / ts.length
    }
    val rows = TextOps.ndcgAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === gold.toSeq,
      "pool must be the BM25 top-10 in gold order")
    val evalOrder = gold.sortBy(id => (-densU(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val w = TextOps.ndcgWeightsU(10).toMap
    val rel = gold.zipWithIndex.map { case (id, i) => id -> (10L - i) }.toMap
    val dcg = gold.map(id => rel(id) * w(evalOrder(id))).sum
    val idcg = gold.zipWithIndex.map { case (id, i) => rel(id) * w(i + 1) }.sum
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("rank_eval") === evalOrder(id))
      assert(r.getAs[Long]("rel") === rel(id))
      assert(r.getAs[Long]("contrib") === rel(id) * w(evalOrder(id)))
      assert(r.getAs[Long]("dcg_num") === dcg)
      assert(r.getAs[Long]("idcg_num") === idcg)
      assert(r.getAs[Long]("ndcg_bp") === dcg * 10000 / idcg)
    }
    // a perfect score is only possible when the rankings agree
    val agree = gold.zipWithIndex.forall { case (id, i) =>
      evalOrder(id) == i + 1 }
    assert((dcg * 10000 / idcg == 10000L) === agree)
  }

  test("rendezvousShards: HRW argmax recounts; only the removed shard's " +
       "documents move") {
    def md5hex60(s0: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .substring(0, 15), 16)
    val ids = Tables(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    def assign(id: Long, shards: Seq[Int]): Int =
      shards.maxBy(sh => (md5hex60(s"hrw:$sh:$id"), sh))
    val full = ids.map(id => id -> assign(id, 0 to 7)).toMap
    val reduced = ids.map(id => id -> assign(id, (0 to 7).filter(_ != 7))).toMap
    val moved = ids.filter(id => full(id) != reduced(id))
    // HRW minimal disruption: the movers are exactly shard 7's docs
    assert(moved.toSet === ids.filter(id => full(id) == 7).toSet)
    val rows = TextOps.rendezvousShards(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === ids.length.toLong)
    rows.foreach { r =>
      val sh = r.getAs[Int]("shard")
      assert(r.getAs[Long]("n_docs") === full.values.count(_ == sh).toLong)
      assert(r.getAs[Long]("n_moved") ===
        ids.count(id => full(id) == sh && reduced(id) != sh).toLong)
      assert(r.getAs[Boolean]("disruption_minimal"),
        s"HRW disruption guarantee violated at shard $sh")
    }
  }

  test("shardBalance: striped assignment recounts; spread bounded by " +
       "the largest document") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        (id, t.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong) }
      .sortBy { case (id, tk) => (-tk, id) }
    val byShard = docs.zipWithIndex.groupBy(_._2 % 8).view
      .mapValues { g => (g.length.toLong, g.map(_._1._2).sum) }.toMap
    val tot = docs.map(_._2).sum
    val ideal = tot / 8
    val rows = TextOps.shardBalance(spark, sf).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val (nd, tk) = byShard(r.getAs[Int]("shard"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("tokens") === tk)
      assert(r.getAs[Long]("ideal") === ideal)
      assert(r.getAs[Long]("dev_bp") === math.abs(tk - ideal) * 10000 / ideal)
    }
    // descending striping keeps shard totals within one max-doc of
    // each other — the property that makes it a usable LPT stand-in
    val toks = rows.map(_.getAs[Long]("tokens"))
    assert(toks.max - toks.min <= docs.map(_._2).max)
  }

  test("coverageSelect: greedy replay matches; gains are nonincreasing") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val ts = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        id -> ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    val covered = scala.collection.mutable.Set[String]()
    val expected = (1 to 6).map { r =>
      val (wid, gain) = docs.toSeq
        .map { case (id, sh) => (id, (sh -- covered).size.toLong) }
        .maxBy { case (id, g) => (g, -id) }
      covered ++= docs(wid)
      (r, wid, gain, covered.size.toLong)
    }
    val tot = docs.values.flatten.toSet.size.toLong
    val rows = TextOps.coverageSelect(spark, sf).collect()
    rows.zip(expected).foreach { case (row, (r, wid, gain, cum)) =>
      assert(row.getAs[Int]("round") === r)
      assert(row.getAs[Long]("doc_id") === wid, s"winner at round $r")
      assert(row.getAs[Long]("gain") === gain)
      assert(row.getAs[Long]("covered_total") === cum)
      assert(row.getAs[Long]("coverage_bp") === cum * 10000 / tot)
    }
    // greedy on a submodular objective: marginal gains never increase
    assert(rows.map(_.getAs[Long]("gain")).sliding(2)
      .forall(p => p(0) >= p(1)))
  }

  test("burrowsDelta: ppm grid, sigma filter and pair deltas recount") {
    val docs = Tables(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .map { case (s0, t) =>
        (s0, t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)) }
    val lens = docs.groupBy(_._1).view
      .mapValues(_.map(_._2.length.toLong).sum).toMap
    val totals = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val top = totals.toSeq.sortBy { case (t, c) => (-c, t) }.take(30).map(_._1)
    val cnt = docs.flatMap { case (s0, ts) => ts.map(t => (s0, t)) }
      .filter(p => top.contains(p._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sources = lens.keySet.toSeq.sorted
    val fppm = (for (s0 <- sources; t <- top) yield
      (s0, t) -> cnt.getOrElse((s0, t), 0L) * 1000000L / lens(s0)).toMap
    val sigma = top.flatMap { t =>
      val fs = sources.map(s0 => fppm((s0, t)))
      val m = BigInt(fs.length)
      val sfv = fs.map(BigInt(_)).sum
      val sff = fs.map(v => BigInt(v) * BigInt(v)).sum
      val sg = math.round(math.sqrt(
        (m * sff - sfv * sfv).toDouble / (m * (m - 1)).toDouble))
      if (sg > 0) Some(t -> sg) else None
    }.toMap
    val rows = TextOps.burrowsDelta(spark, sf).collect()
    val expectedPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield (sources(i), sources(j))
    assert(rows.map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")))
      .toSet === expectedPairs.toSet)
    rows.foreach { r =>
      val (s1, s2) = (r.getAs[String]("s1"), r.getAs[String]("s2"))
      val ds = sigma.keys.toSeq.map { t =>
        math.round(math.abs(fppm((s1, t)) - fppm((s2, t))).toDouble
          / sigma(t) * 1e6)
      }
      assert(r.getAs[Long]("n_terms") === sigma.size.toLong)
      assert(r.getAs[Long]("delta_u") === ds.sum / ds.length)
    }
  }

  test("heapsLaw: checkpoint vocabulary recounts against a token stream") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy(_._1)
      .map(_._2.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val stream = docs.flatten
    val nTot = stream.length.toLong
    val firstPos = scala.collection.mutable.Map[String, Long]()
    stream.zipWithIndex.foreach { case (t, i) =>
      if (!firstPos.contains(t)) firstPos(t) = i + 1L
    }
    val cks = (1L to 10L).map(k => (k, k * nTot / 10))
    val vs = cks.map { case (k, nk) =>
      (k, nk, firstPos.values.count(_ <= nk).toLong) }
    val xu = vs.map(v => math.round(math.log(v._2.toDouble) * 1e6))
    val yu = vs.map(v => math.round(math.log(v._3.toDouble) * 1e6))
    val m = 10L
    val (sx, sy) = (xu.sum, yu.sum)
    val sxy = xu.zip(yu).map { case (a, b) => a * b }.sum
    val sxx = xu.map(a => a * a).sum
    val beta = BigDecimal((m * sxy - sx * sy).toDouble /
        (m * sxx - sx * sx).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = TextOps.heapsLaw(spark, sf).collect()
    assert(rows.length === 10)
    rows.zip(vs).foreach { case (r, (k, nk, vk)) =>
      assert(r.getAs[Long]("k") === k)
      assert(r.getAs[Long]("n_k") === nk)
      assert(r.getAs[Long]("v_k") === vk)
      assert(r.getAs[Long]("ttr_bp") === vk * 10000 / nk)
      assert(r.getAs[Double]("beta") === beta)
    }
    // V is nondecreasing and ends at the full vocabulary
    assert(rows.map(_.getAs[Long]("v_k")).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.last.getAs[Long]("v_k") === firstPos.size.toLong)
  }

  test("qualitySurprisalRho: midranks and moments recount sequentially") {
    val qu = TextOps.qualityScores(spark, sf)
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
      .map { case (id, q) => id -> BigDecimal(q * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }.toMap
    val xent = TextOps.surprisalFilter(spark, sf)
      .select($"doc_id", $"xent_u").as[(Long, Long)].collect().toMap
    val joined = qu.keySet.intersect(xent.keySet).toSeq.sorted
      .map(id => (qu(id), xent(id)))
    def midranks(vs: Seq[Long]): Map[Long, Long] = {
      val counts = vs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      var cb = 0L
      counts.map { case (v, t) =>
        val r = 2 * cb + t + 1; cb += t; v -> r }.toMap
    }
    val rx = midranks(joined.map(_._1))
    val ry = midranks(joined.map(_._2))
    val n = BigInt(joined.length)
    val sx = joined.map(p => BigInt(rx(p._1))).sum
    val sy = joined.map(p => BigInt(ry(p._2))).sum
    val sxy = joined.map(p => BigInt(rx(p._1)) * BigInt(ry(p._2))).sum
    val sxx = joined.map(p => BigInt(rx(p._1)).pow(2)).sum
    val syy = joined.map(p => BigInt(ry(p._2)).pow(2)).sum
    val covNum = n * sxy - sx * sy
    val rho = BigDecimal((n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble)
          * math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = TextOps.qualitySurprisalRho(spark, sf).collect().head
    assert(row.getAs[Long]("n_docs") === joined.length.toLong)
    assert(BigInt(row.getAs[Long]("cov_num")) === covNum)
    assert(row.getAs[Double]("rho") === rho)
    assert(math.abs(row.getAs[Double]("rho")) <= 1.0)
  }

  test("unimaxFrom: water-filling caps a prefix, Hamilton-exact budget") {
    // skewed counts the near-balanced corpus never produces: three tiny
    // languages all capped at 2 epochs, one giant absorbing the rest
    val skew = Seq(("aa", 1L), ("bb", 1L), ("cc", 1L), ("zz", 100L))
      .toDF("lang", "n_tokens")
    val got = TextOps.unimaxFrom(skew, 2).orderBy($"lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Boolean]("capped"),
        r.getAs[Long]("alloc")))
    assert(got.toSeq === Seq(("aa", true, 2L), ("bb", true, 2L),
      ("cc", true, 2L), ("zz", false, 97L)))
    // two uncapped languages split the leftover within one token
    val two = Seq(("aa", 1L), ("mm", 50L), ("nn", 60L))
      .toDF("lang", "n_tokens")
    val got2 = TextOps.unimaxFrom(two, 2).orderBy($"lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Boolean]("capped"),
        r.getAs[Long]("alloc")))
    assert(got2.toSeq === Seq(("aa", true, 2L), ("mm", false, 55L),
      ("nn", false, 54L)))
    // and on the real corpus: allocations sum to the budget exactly,
    // never exceed the epoch cap, and uncapped allocs differ by <= 1
    val real = TextOps.unimaxBudget(spark, sf).collect()
    val budget = real.head.getAs[Long]("budget")
    assert(real.map(_.getAs[Long]("alloc")).sum === budget)
    real.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"))
    }
    val un = real.filter(!_.getAs[Boolean]("capped")).map(_.getAs[Long]("alloc"))
    if (un.length > 1) assert(un.max - un.min <= 1)
  }

  test("doremiStep: the mixture is a proper ppm distribution, the exp " +
       "factor recounts from the excess, and excess is clipped at a " +
       "single consistent corpus reference") {
    val rows = TextOps.doremiStep(spark, sf).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val excess = r.getAs[Long]("excess_u")
      assert(excess >= 0L)
      assert(r.getAs[Long]("exp_u") ===
        math.round(math.exp(excess.toDouble / 1e6) * 1e6))
    }
    // sources with positive excess reveal the (floored) corpus mean:
    // mean - excess must agree across all of them
    val refs = rows.filter(_.getAs[Long]("excess_u") > 0L)
      .map(r => r.getAs[Long]("mean_xent_u") - r.getAs[Long]("excess_u"))
    assert(refs.distinct.length <= 1, refs.mkString(","))
    // weight normalization recounts from (n_docs, exp_u)
    val us = rows.map(r =>
      BigInt(r.getAs[Long]("n_docs")) * r.getAs[Long]("exp_u"))
    val tot = us.sum
    rows.zip(us).foreach { case (r, u) =>
      assert(r.getAs[Long]("weight_ppm") === (u * 1000000 / tot).toLong)
    }
    // the ppm mixture sums to 1e6 up to one floor unit per source
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    assert(wsum <= 1000000L && wsum > 1000000L - rows.length)
    // the update genuinely reweights: some source moves off its base
    assert(rows.exists(r =>
      r.getAs[Long]("weight_ppm") / 100 != r.getAs[Long]("base_share_bp")))
  }

  test("ngramNovelty: per-doc novelty recounts from a sequential " +
       "first-occurrence sweep; the earliest doc is fully novel") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", graft.functions.text.tokensLower($"text"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    val expected = docs.flatMap { case (id, toks) =>
      if (toks.length < 3) None
      else {
        val sh = (0 to toks.length - 3)
          .map(i => toks.slice(i, i + 3).mkString(" ")).distinct
        sh.foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
        Some(id -> sh)
      }
    }.toMap
    val rows = TextOps.ngramNovelty(spark, sf).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val sh = expected(id)
      val novel = sh.count(g => firstSeen(g) == id).toLong
      assert(r.getAs[Long]("n_shingles") === sh.length.toLong)
      assert(r.getAs[Long]("n_novel") === novel, s"doc $id")
      assert(r.getAs[Long]("novelty_bp") === novel * 10000 / sh.length)
    }
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_bp") === 10000L)
    // repetition exists in the fixture, so novelty must not be constant
    assert(rows.map(_.getAs[Long]("novelty_bp")).distinct.length > 1)
  }
  test("skylineDocs: survivors match the brute-force dominance " +
       "definition; everything else is dominated by some survivor") {
    val pts = TextOps.qualityScores(spark, sf)
      .select($"doc_id", round($"quality" * 10000).cast("long"))
      .as[(Long, Long)].collect().toMap
    val nv = TextOps.ngramNovelty(spark, sf)
      .select($"doc_id", $"novelty_bp").as[(Long, Long)].collect().toMap
    val all = nv.keys.map(d => (d, pts(d), nv(d))).toSeq
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    val expected = all.filter(p => !all.exists(q => dominates(q, p)))
      .map(_._1).toSet
    val got = TextOps.skylineDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet === expected)
    got.foreach { case (d, q, n) =>
      assert(pts(d) === q && nv(d) === n)
    }
    // completeness: every non-survivor is dominated by some survivor
    val sky = got.toSet
    all.filterNot(p => expected.contains(p._1)).foreach { p =>
      assert(sky.exists(s0 => dominates((s0._1, s0._2, s0._3), p)),
        s"doc ${p._1} excluded but undominated by the frontier")
    }
    assert(got.nonEmpty && got.length < all.length)
  }

  test("youdenCutoff: the chosen threshold maximizes TPR-FPR over every " +
       "candidate cut; confusion cells recount") {
    // sf0.01: the shared sf0.001 fixture has a degenerate keep class
    // (TPR/FPR undefined), which is below this operator's contract
    val sf01 = "/root/testdata/sf0.01"
    val labels = TextOps.gopherRules(spark, sf01, Seq("the", "a"))
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val scores = TextOps.qualityScores(spark, sf01)
      .select($"doc_id", round($"quality" * 10000).cast("long"))
      .as[(Long, Long)].collect()
    val pts = scores.map { case (d, q) => (q, labels(d)) }
    val nPos = pts.count(_._2).toLong
    val nNeg = pts.length - nPos
    val cand = pts.map(_._1).distinct.sorted
    val js = cand.map { th =>
      val tp = pts.count(p => p._1 >= th && p._2).toLong
      val fp = pts.count(p => p._1 >= th && !p._2).toLong
      (th, tp, fp, tp * 1000000L / nPos - fp * 1000000L / nNeg)
    }
    val best = js.minBy(t => (-t._4, t._1))
    val r = TextOps.youdenCutoff(spark, sf01).collect().head
    assert(r.getAs[Long]("threshold_qu") === best._1)
    assert(r.getAs[Long]("n_pos") === nPos)
    assert(r.getAs[Long]("n_neg") === nNeg)
    assert(r.getAs[Long]("tp") === best._2)
    assert(r.getAs[Long]("fp") === best._3)
    assert(r.getAs[Long]("j_u") === best._4)
    // the decided cut genuinely separates: J must beat both trivial cuts
    assert(best._4 > 0L)
  }

  test("conformalQualityGate: threshold is the exact k-th calibration " +
       "order statistic; an undersized calibration yields NULLs, not a " +
       "fabricated bar") {
    val cal = TextOps.qualityScores(spark, sf)
      .selectExpr("doc_id", "CAST(round(quality * 10000) AS BIGINT) AS qu")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (id, _) =>
        val b = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils
            .md5Hex(s"split:$id").substring(0, 15), 16) % 100
        b >= 80 && b < 90
      }
    val alpha = 5000L // big enough for k >= 1 on the tiny sf slice
    val r = TextOps.conformalQualityGate(spark, sf, alphaBp = alpha)
      .head()
    assert(r.getAs[Long]("n_cal") === cal.length.toLong)
    val k = alpha * (cal.length + 1) / 10000
    assert(r.getAs[Long]("k") === k)
    val expectedThr = cal.map(_._2).sorted.apply(k.toInt - 1)
    // ties on qu are broken by doc_id in rank order, but the k-th QU
    // value itself is tie-invariant
    assert(r.getAs[Long]("threshold_qu") === expectedThr)
    assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_eval"))
    assert(r.getAs[Long]("coverage_u") ===
      r.getAs[Long]("n_covered") * 1000000L / r.getAs[Long]("n_eval"))
    // alpha so small that k = 0: the guarantee is vacuous and the gate
    // must say so with NULLs
    val v = TextOps.conformalQualityGate(spark, sf, alphaBp = 1L).head()
    assert(v.getAs[Long]("k") === 0L)
    assert(v.isNullAt(v.fieldIndex("threshold_qu")))
    assert(v.isNullAt(v.fieldIndex("coverage_u")))
    // alpha >= 1 (alphaBp >= 10^4): k = n_cal + 1 exceeds the calibration
    // size — the gate must degrade to the same NULL contract (the oracle's
    // scalar subquery is NULL there), not throw on an empty rank pick
    val w = TextOps.conformalQualityGate(spark, sf, alphaBp = 10000L).head()
    assert(w.getAs[Long]("k") === cal.length.toLong + 1L)
    assert(w.isNullAt(w.fieldIndex("threshold_qu")))
    assert(w.isNullAt(w.fieldIndex("coverage_u")))
  }

  test("datasetCartography: confidence/variability in range, region " +
       "mapping consistent, every document mapped exactly once") {
    val rows = TextOps.datasetCartography(spark, sf).collect()
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === rows.length)
    rows.foreach { r =>
      val c = r.getAs[Long]("conf_u"); val v = r.getAs[Long]("vari_u")
      assert(c >= 0L && c <= 1000000L, s"conf out of range: $c")
      // max possible std of values in [0, 1e6] is 5e5
      assert(v >= 0L && v <= 500000L, s"vari out of range: $v")
      val expected =
        if (v >= 150000L) "ambiguous"
        else if (c >= 500000L) "easy_to_learn"
        else "hard_to_learn"
      assert(r.getAs[String]("region") === expected)
    }
    // the map must be non-degenerate on the gate corpus: at least two
    // regions populated (a single-region map carries no signal)
    assert(rows.map(_.getAs[String]("region")).distinct.length >= 2)
  }

  test("rhoLearnability: excess xent is exact, ranks are a permutation " +
       "in (learn_u desc, doc_id) order, selection is the top-k prefix") {
    val rows = TextOps.rhoLearnability(spark, sf, topK = 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("learn_u") ===
        r.getAs[Long]("xent_base_u") - r.getAs[Long]("xent_ref_u"))
    }
    val ranks = rows.map(_.getAs[Long]("rnk")).sorted
    assert(ranks === (1L to rows.length.toLong).toArray,
      "global rank must be a 1..n permutation")
    val byRank = rows.sortBy(_.getAs[Long]("rnk"))
    val keys = byRank.map(r =>
      (-r.getAs[Long]("learn_u"), r.getAs[Long]("doc_id")))
    assert(keys === keys.sorted,
      "rank order must equal (learn_u desc, doc_id) order")
    byRank.foreach(r => assert(r.getAs[Boolean]("selected") ===
      (r.getAs[Long]("rnk") <= 10L)))
    // the reference model explains its own training slice at least as
    // well on average: mean excess over high-quality train docs is
    // >= the corpus mean (the direction the selector exists for)
    val hq = TextOps.qualityScores(spark, sf)
      .selectExpr("doc_id", "CAST(round(quality * 10000) AS BIGINT) AS qu")
      .collect().filter(_.getLong(1) >= 5000L).map(_.getLong(0)).toSet
    val bucketed = rows.partition(r => hq.contains(r.getAs[Long]("doc_id")))
    if (bucketed._1.nonEmpty && bucketed._2.nonEmpty) {
      def mean(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getAs[Long]("learn_u")).sum.toDouble / rs.length
      assert(mean(bucketed._1) >= mean(bucketed._2),
        "high-quality docs must score at least as learnable on average")
    }
  }

}
