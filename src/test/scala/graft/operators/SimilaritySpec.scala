package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("mcnemarTruncation: cells recount exactly from a sequential " +
       "nearest-centroid pass at full and truncated width") {
    val vecs = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"label".cast("long"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)" +
          " * 1000000) AS BIGINT))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val dims = vecs.head._3.length
    val cents = vecs.groupBy(_._2).map { case (l, g) =>
      l -> Array.tabulate(dims)(d => g.map(_._3(d)).sum / g.length)
    }
    def pred(v: Array[Long], k: Int): Long =
      cents.toSeq.map { case (l, c) =>
        ((0 until k).map(d => BigInt(v(d) - c(d)) * (v(d) - c(d))).sum, l)
      }.min._2
    val outcomes = vecs.map { case (_, l, v) =>
      (pred(v, dims) == l, pred(v, 32) == l) }
    val (nbr, na, nb, nbw) = (
      outcomes.count(o => o._1 && o._2).toLong,
      outcomes.count(o => o._1 && !o._2).toLong,
      outcomes.count(o => !o._1 && o._2).toLong,
      outcomes.count(o => !o._1 && !o._2).toLong)
    val r = Similarity.mcnemarTruncation(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_both_right") === nbr)
    assert(r.getAs[Long]("n_only_a") === na)
    assert(r.getAs[Long]("n_only_b") === nb)
    assert(r.getAs[Long]("n_both_wrong") === nbw)
    assert(r.getAs[Long]("n_vecs") === vecs.length.toLong)
    assert(na + nb > 0, "truncation flipped nothing — ablation inert")
    assert(r.getAs[Long]("chi2_milli") ===
      (na - nb) * (na - nb) * 1000L / (na + nb))
    assert(r.getAs[Long]("acc_full_bp") ===
      (nbr + na) * 10000L / vecs.length)
  }

  test("BandSignatures expression matches the inline when(dot) composition bit for bit") {
    import graft.functions.vectors
    val e = Tables(spark, sf, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
    val r = 4; val nBands = 24; val dim = 64
    // the pre-r13 inline reference composition, rebuilt verbatim
    val bandStructs = (0 until nBands).map { b =>
      val sig = (0 until r).map { k =>
        val plane = typedLit((0 until dim).map(d =>
          Similarity.planeComponent(b * r + k, d)))
        when(vectors.dot($"v", plane) > 0, lit(1 << k)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val ref = e.select($"vec_id", explode(array(bandStructs: _*)).as("bs"))
      .select($"vec_id", $"bs.band".as("band"), $"bs.sig".as("sig"))
    val got = Similarity.bandedPlaneBuckets(e, r, nBands, dim)
    assert(got.count() === ref.count())
    assert(got.join(ref, Seq("vec_id", "band", "sig")).count() === ref.count())
  }

  test("brute-force top-k returns k rows, sorted by similarity") {
    val df = Similarity.bruteForceTopK(spark, sf, queryId = 0L, k = 10)
    val sims = df.select($"cos_sim").collect().map(_.getDouble(0)).toSeq
    assert(sims.length === 10)
    assert(sims === sims.sorted.reverse)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("hyperplane LSH: plane components are deterministic and bounded") {
    val c1 = Similarity.planeComponent(3, 17)
    val c2 = Similarity.planeComponent(3, 17)
    assert(c1 === c2)
    val all = for (j <- 0 until 8; d <- 0 until 64) yield Similarity.planeComponent(j, d)
    assert(all.forall(c => c >= -1.0 && c <= 1.0))
    assert(all.distinct.length > 400) // not collapsing to a few values
  }

  test("hyperplane LSH top-k: sorted, bounded, excludes the query") {
    val rows = Similarity.hyperplaneLshTopK(spark, sf, queryId = 0L, k = 5).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getLong(0) != 0L))
    val sims = rows.map(_.getDouble(1)).toSeq
    assert(sims === sims.sorted.reverse)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("IVF search result is a subset of the query cell, never the query itself") {
    val df = Similarity.ivfTopK(spark, sf, queryId = 0L, k = 5)
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(0) != 0L))
    assert(rows.map(_.getLong(1)).distinct.length === 1) // single cell searched
  }

  test("annRecall: query 0's row reproduces ivfTopK-vs-bruteForce overlap") {
    val rows = Similarity.annRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    rows.foreach { case (_, nBrute, nOverlap, recall) =>
      assert(nBrute === 5L)
      assert(nOverlap >= 0 && nOverlap <= nBrute)
      assert(recall === BigDecimal(nOverlap.toDouble / nBrute)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // independent recount for query 0 from the two single-query operators
    val brute0 = Similarity.bruteForceTopK(spark, sf, k = 5).collect()
      .map(_.getLong(0)).toSet
    val ivf0 = Similarity.ivfTopK(spark, sf).collect().map(_.getLong(0)).toSet
    val row0 = rows.find(_._1 == 0L).get
    assert(row0._3 === brute0.intersect(ivf0).size.toLong)
  }

  test("quantizationStats: codes bounded by int8, error below half-step bound") {
    val rows = Similarity.quantizationStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length.toLong === Tables(spark, sf, "embeddings").count())
    rows.foreach { case (_, maxQ, sumQ, mseNano) =>
      // symmetric scale puts the max component at ±127 (0 for a zero vector)
      assert(maxQ === 127 || (maxQ === 0 && sumQ === 0L))
      assert(sumQ >= 0 && sumQ <= 127L * 64)
      assert(mseNano >= 0)
      // per-component error ≤ scale/2; scale ≤ 1/127·max|v| with |v| ≤ ~1
      assert(mseNano < 1e9 * 0.25, s"mse too large: $mseNano")
    }
  }

  test("embeddingClusters matches a driver-side union-find over the pair graph") {
    val pairs = Similarity.embeddingNearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = Similarity.embeddingClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val roots = nodes.map(n => n -> find(n)).toMap
    // canonical id = min member of each component
    val canon = nodes.groupBy(roots).toSeq.flatMap { case (_, members) =>
      val m = members.min; members.toSeq.map(_ -> m)
    }.toMap
    assert(got === canon)
  }

  test("autoPlanesPerBand holds bucket occupancy: 4 at oracle SFs, grows with n") {
    assert(Similarity.autoPlanesPerBand(100L) === 4)   // spec corpus
    assert(Similarity.autoPlanesPerBand(500L) === 4)   // sf0.01 (oracle SF)
    assert(Similarity.autoPlanesPerBand(2000L) === 4)  // sf0.1 (bench SF)
    assert(Similarity.autoPlanesPerBand(20000L) === 8) // 10x stress
    assert(Similarity.autoPlanesPerBand(2000000L) === 14)
    // expected occupancy n/2^r stays <= target (for n above target)
    Seq(500L, 2000L, 20000L, 2000000L).foreach { n =>
      val r = Similarity.autoPlanesPerBand(n)
      assert(n.toDouble / (1L << r) <= 125.0, s"occupancy breached at n=$n r=$r")
    }
  }

  test("banded-LSH near-dup: pairs are exactly verified (precision 1) and " +
    "the recall audit clears the acceptance bar") {
    // precision is structural — every emitted pair passed the exact
    // cosine verify — so assert it directly against a brute all-pairs
    val brute = {
      val vecs = Tables(spark, sf, "embeddings")
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      (for {
        (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
        dot = va.zip(vb).map { case (x, y) => x * y }.sum
        c = dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
        if BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.3
      } yield (ia, ib)).toSet
    }
    val lsh = Similarity.embeddingNearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH emitted a pair below the threshold")
    assert(lsh.size >= (brute.size * 0.9).toInt,
      s"recall ${lsh.size}/${brute.size} below the 0.9 acceptance bar")
    // and the audit query reports the same story, bucketed by similarity
    val audit = Similarity.embeddingLshRecall(spark, sf).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getLong(2) <= r.getLong(1)) // caught <= true
    }
  }

  test("hardNegatives: never the probe's own label, dense ranks, descending similarity") {
    val labels = Tables(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(spark, sf, nQueries = 5, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, v, _, _) =>
      assert(labels(v) !== labels(q), s"negative $v shares label with probe $q")
    }
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to sorted.length))
      val sims = sorted.map(_._3).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("semDedup matches a driver-side cell-scoped sweep") {
    val nlist = 8
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = vecs.filter(_._1 < nlist)
    val assigned = vecs.map { case (id, v) =>
      val cid = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
      (id, cid, v)
    }
    val expected = assigned.map { case (id, cid, v) =>
      val lower = assigned.filter(o => o._2 == cid && o._1 < id)
      val mx = if (lower.isEmpty) -9.0 else lower.map(o => r4(cos(v, o._3))).max
      (id, cid, mx, mx < 0.3)
    }.sortBy(_._1).toSeq
    val got = Similarity.semDedup(spark, sf, nlist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got === expected)
    // the sweep keeps at least the 8 cell minima and prunes something
    // on this near-dup-rich corpus
    assert(got.count(_._4) >= nlist && got.exists(!_._4))
    // AutoNlist resolves to the oracle's 8 at the test SFs, grows with n
    assert(Similarity.autoNlist(500L) === 8)
    assert(Similarity.autoNlist(2000L) === 8)
    assert(Similarity.autoNlist(20000L) === 80)   // 10x stress: cells stay ~250
    val auto = Similarity.semDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(auto === expected)
  }

  test("quantizedRecall matches a driver-side int8-serving recount") {
    val (nQ, k) = (20, 5)
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val recon = vecs.map { case (id, v) =>
      val sc = v.map(math.abs).max / 127.0
      id -> (if (sc == 0.0) v.map(_ => 0.0)
             else v.map(x => math.round(x / sc).toDouble * sc))
    }.toMap
    def topk(qid: Long, qv: Array[Double], of: Long => Array[Double]): Set[Long] =
      vecs.filter(_._1 != qid)
        .map { case (id, _) => (id, r4(cos(of(id), qv))) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    val byId = vecs.toMap
    val expected = vecs.filter(_._1 < nQ).map { case (qid, qv) =>
      val ex = topk(qid, qv, byId)
      val qz = topk(qid, qv, recon)
      val ov = ex.intersect(qz).size.toLong
      (qid, k.toLong, ov, r4(ov.toDouble / k))
    }.toSeq
    val got = Similarity.quantizedRecall(spark, sf, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // int8 at 64 dims should barely dent retrieval
    assert(got.map(_._4).sum / got.length >= 0.8)
  }

  test("semanticDecontamination matches a driver-side nearest-train sweep") {
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % 100
    }
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val train = vecs.filter(v => bucket(v._1) < 80)
    val eval_ = vecs.filter(v => bucket(v._1) >= 90)
    assert(train.nonEmpty && eval_.nonEmpty)
    val expected = eval_.map { case (eid, ev) =>
      val (tid, cs) = train.map { case (t, tv) => (t, r4(cos(tv, ev))) }
        .minBy { case (t, s) => (-s, t) }
      (eid, tid, cs, cs >= 0.3)
    }.sortBy(_._1).toSeq
    val got = Similarity.semanticDecontamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got === expected)
  }

  test("indexed decontamination: flags subset of brute, candidates exact-verified") {
    val brute = Similarity.semanticDecontamination(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    val idx = Similarity.semanticDecontaminationIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(idx.length === brute.size, "every eval doc must be reported")
    idx.foreach { case (eid, tid, cs, flag) =>
      val (_, bcs, bflag) = brute(eid)
      if (tid >= 0) assert(cs <= bcs, s"eval $eid: candidate best above global best")
      if (flag) assert(bflag, s"eval $eid: indexed flag not confirmed by brute")
    }
    // loose-threshold regime: the band scheme should catch nearly all flags
    val bruteFlagged = brute.values.count(_._3)
    assert(bruteFlagged > 0)
    assert(idx.count(_._4) >= (bruteFlagged * 0.9).toInt,
      s"indexed recall ${idx.count(_._4)}/$bruteFlagged below acceptance")
  }

  test("kmeansStep matches a driver-side Lloyd iteration") {
    val nlist = 8
    val got = Similarity.kmeansStep(spark, sf, nlist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cents = vecs.filter(_._1 < nlist)
    val assigned = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) } // sim desc, cid asc on ties
      (best._1, v)
    }
    val expected = assigned.groupBy(_._1).toSeq.map { case (cid, members) =>
      val n = members.length
      val dims = members.head._2.indices
      val norm2 = dims.map { d =>
        val sx = members.map(m => math.round(m._2(d) * 1e6)).sum
        val mean = sx.toDouble / n / 1e6
        mean * mean
      }.sum
      (cid, n.toLong,
        BigDecimal(math.sqrt(norm2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(got.map(_._2).sum === vecs.length.toLong) // every vector assigned
    assert(got.toSeq === expected)
  }

  test("pqTopK matches a driver-side codebook-assign + ADC recount") {
    val (m, subDim, ncodes, k) = (8, 8, 16, 10)
    val got = Similarity.pqTopK(spark, sf, queryId = 0L, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def sub(v: Array[Double], j: Int) = v.slice(j * subDim, (j + 1) * subDim)
    def dFixed(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) => math.round((x - y) * (x - y) * 1e12) }.sum
    val cb = vecs.filter(_._1 < ncodes)
    // code assignment: per (vec, j) the argmin-fixed-distance codeword
    val codes = vecs.map { case (id, v) =>
      (id, (0 until m).map { j =>
        cb.map { case (cid, cv) => (cid, dFixed(sub(v, j), sub(cv, j))) }
          .minBy { case (cid, d) => (d, cid) }._1
      })
    }
    val qv = vecs.find(_._1 == 0L).get._2
    val lut = (0 until m).map { j =>
      cb.map { case (cid, cv) => cid -> dFixed(sub(qv, j), sub(cv, j)) }.toMap
    }
    val expected = codes.filter(_._1 != 0L).map { case (id, cs) =>
      val adc = cs.zipWithIndex.map { case (cid, j) => lut(j)(cid) }.sum
      (id, adc,
        BigDecimal(math.sqrt(adc.toDouble / 1e12))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, adc, _) => (adc, id) }.take(k)
    assert(got.toSeq === expected.toSeq)
  }

  test("ivfPqTopK: results live in the query's IVF cell with pqTopK's ADC values") {
    val got = Similarity.ivfPqTopK(spark, sf, queryId = 0L, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // full-corpus ADC reference (large k so truncation can't hide rows)
    val pqAll = Similarity.pqTopK(spark, sf, queryId = 0L, k = 100000).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the query's cell, derived independently via ivfTopK's assignment
    // (nlist=8 default there matches ivfPqTopK's)
    val cellOfQuery = Similarity.ivfTopK(spark, sf, queryId = 0L, k = 100000)
      .collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    got.foreach { case (id, adc, l2) =>
      assert(cellOfQuery(id), s"vec $id outside the query's IVF cell")
      assert(pqAll(id) === ((adc, l2)), s"vec $id ADC drifts from pqTopK")
    }
    // exactly the cell-restricted prefix of the full ADC ranking
    val expected = pqAll.toSeq
      .filter { case (id, _) => cellOfQuery(id) }
      .sortBy { case (id, (adc, _)) => (adc, id) }
      .take(10).map { case (id, (adc, l2)) => (id, adc, l2) }
    assert(got.toSeq === expected)
  }

  test("pqTopKIndexed: identical to pqTopK via the stored codes, and the " +
       "per-vector code aggregation runs exchange-free on the bucketing") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val direct = Similarity.pqTopK(spark, sf, queryId = 0L, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val served = Similarity.pqTopKIndexed(spark, sf, queryId = 0L, k = 10)
    assert(served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === direct)
    // the codes scan feeds the vec_id aggregation with no shuffle in
    // between: below the FIRST aggregate there is no exchange (the
    // top-k sort above it legitimately exchanges)
    val nodes = planNodes(served)
    val firstAgg = nodes.reverse.find(_.isInstanceOf[BaseAggregateExec])
    assert(firstAgg.isDefined)
    def below(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(below)
    assert(below(firstAgg.get).count(_.isInstanceOf[ShuffleExchangeExec]) === 0,
      "stored-codes aggregation should ride the bucketed layout")
  }

  test("powerIteration matches a sequential fixed-point replay and converges") {
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = graft.Tables(spark, sf, "embeddings").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var vu = Array.fill(64)(125000L)
    var norm2 = BigInt(0)
    (1 to 3).foreach { _ =>
      val v = vu.map(_.toDouble / 1e6)
      val t = Array.fill(64)(0L)
      vecs.foreach { x =>
        val sc = x.zip(v).map { case (a, b) => a * b }.sum
        (0 until 64).foreach(d => t(d) += r0(x(d) * sc * 1e6))
      }
      norm2 = t.map(x => BigInt(x) * BigInt(x)).sum
      val nrm = math.sqrt(norm2.toDouble)
      vu = t.map(x => r0(x / nrm * 1e6))
    }
    val got = Similarity.powerIteration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val expected = (0 until 64).map(d => (d + 1, vu(d), norm2.toLong))
    assert(got.toSeq === expected)
    // the direction is a genuine unit vector at the fixed-point grid
    val n = got.map(g => g._2.toDouble / 1e6).map(x => x * x).sum
    assert(math.abs(n - 1.0) < 1e-4, s"|v| drifted: $n")
    // and it captures real variance: Rayleigh quotient under the found
    // direction beats the init direction's
    def rayleigh(dir0: Array[Double]): Double =
      vecs.map { x =>
        val s2 = x.zip(dir0).map { case (a, b) => a * b }.sum; s2 * s2
      }.sum
    val vFound = got.map(_._2.toDouble / 1e6)
    assert(rayleigh(vFound) > rayleigh(Array.fill(64)(0.125)),
      "power iteration failed to increase the Rayleigh quotient")
  }

  test("anisotropyReport: driver recount, direction tied to powerIteration") {
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = graft.Tables(spark, sf, "embeddings").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = vecs.length
    val mu = (0 until 64).map(d =>
      vecs.map(x => r0(x(d) * 1e6)).sum.toDouble / n / 1e6).toArray
    // the direction must be EXACTLY the one powerIteration publishes
    val vu = Similarity.powerIteration(spark, sf).collect().map(_.getLong(1))
    val v = vu.map(_.toDouble / 1e6)
    def normU(a: Array[Double]): Long = {
      val sq = a.map(x => r0(x * x * 1e12)).sum
      r0(math.sqrt(sq.toDouble / 1e12) * 1e6)
    }
    val proj = (0 until 64).map(d => r0(mu(d) * v(d) * 1e12)).sum.toDouble / 1e12
    val res = (0 until 64).map(d => mu(d) - proj * v(d)).toArray
    val expected = (n.toLong, normU(mu), r0(math.abs(proj) * 1e6), normU(res))
    val got = Similarity.anisotropyReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got === expected)
    // projecting out the top direction genuinely shrinks the common
    // offset (the all-but-the-top effect is present in this corpus)
    assert(got._4 < got._2, "residual norm did not shrink")
    assert(got._2 > 0L)
  }

  test("matryoshkaRecall matches a driver truncated-vs-full recount") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def topk(qid: Long, proj: Array[Double] => Array[Double]): Set[Long] = {
      val qv = proj(rows.find(_._1 == qid).get._2)
      rows.filter(_._1 != qid)
        .map { case (id, v) => (id, r4(cos(proj(v), qv))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }
    val expected = (0L until 20L).map { qid =>
      val full = topk(qid, identity)
      val pref = topk(qid, _.take(16))
      val overlap = (full & pref).size.toLong
      (qid, 5L, overlap, r4(overlap.toDouble / 5.0))
    }
    val got = Similarity.matryoshkaRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === expected)
    // the audit discriminates: truncation loses SOMETHING somewhere, and
    // keeps something too
    assert(got.exists(_._3 < 5L) && got.exists(_._3 > 0L))
  }

  test("labelSuspects: exactly the margin-positive vectors, driver recount") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = graft.Tables(spark, sf, "embeddings").collect().map { r =>
      (r.getLong(0), r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val cents = rows.groupBy(_._2).map { case (lbl, vs) =>
      lbl -> Array.tabulate(vs.head._3.length) { d =>
        vs.map(v => r0(v._3(d) * 1e6)).sum.toDouble / vs.length / 1e6
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = rows.flatMap { case (id, lbl, v) =>
      val it = r0(r4(cos(v, cents(lbl))) * 10000.0)
      val (rl, rt) = cents.filter(_._1 != lbl)
        .map { case (l, c) => (l, r0(r4(cos(v, c)) * 10000.0)) }
        .toSeq.sortBy { case (l, t) => (-t, l) }.head
      if (rt > it) Some((id, lbl, rl, it, rt, rt - it)) else None
    }.sortBy(_._1)
    val got = Similarity.labelSuspects(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected.toSeq)
    // the screen separates: some vectors are suspects, most are not
    assert(got.nonEmpty && got.length < rows.length)
    got.foreach { case (_, lbl, rl, _, _, m) =>
      assert(lbl != rl && m > 0L)
    }
  }

  test("labelSilhouette matches a driver fixed-point centroid recount") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = graft.Tables(spark, sf, "embeddings").collect().map { r =>
      (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val byLabel = rows.groupBy(_._2)
    val cents = byLabel.map { case (lbl, vs) =>
      val dim = vs.head._3.length
      lbl -> Array.tabulate(dim) { d =>
        vs.map(v => r0(v._3(d) * 1e6)).sum.toDouble / vs.length / 1e6
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val perVec = rows.map { case (id, lbl, v) =>
      val it = r0(r4(cos(v, cents(lbl))) * 10000.0)
      val xt = r0(cents.filter(_._1 != lbl).values
        .map(c => r4(cos(v, c))).max * 10000.0)
      (id, lbl, it, xt)
    }
    val expected = perVec.groupBy(_._2).toSeq.sortBy(_._1).map { case (lbl, g) =>
      val n = g.length.toLong
      val mi = (g.map(_._3).sum + 10000 * n) / n - 10000
      val mx = (g.map(_._4).sum + 10000 * n) / n - 10000
      (lbl, n, mi, mx, mi - mx)
    }
    val got = Similarity.labelSilhouette(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum === rows.length.toLong)
  }

  test("ivfTopKIndexed: identical to ivfTopK via the stored cells; the " +
       "serving scan is partition-pruned and exchange-free") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val direct = Similarity.ivfTopK(spark, sf, queryId = 0L, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val served = Similarity.ivfTopKIndexed(spark, sf, queryId = 0L, k = 5)
    assert(served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === direct)
    val nodes = planNodes(served)
    // literal-cid routing = static partition pruning at the stored scan
    val scan = nodes.collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined)
    assert(scan.get.partitionFilters.nonEmpty,
      "cell filter should prune the partitioned index, not scan all cells")
    // TakeOrdered top-k over a pruned scan: no exchange anywhere
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) === 0,
      "serving plan should be scan -> project -> take-ordered, no shuffle")
  }

  test("pqRecall: n_exact is k per probe, recall in [0,1], codebook " +
       "vectors recover themselves as their own nearest code") {
    val rows = Similarity.pqRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 20)
    assert(rows.forall(_._2 == 5L))
    assert(rows.forall(r => r._3 >= 0L && r._3 <= r._2))
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // a codebook vector's sub-vectors are IN the codebook: its own code
    // distance is 0 in every subspace, so its ADC distance to itself is 0
    // — spot-check via pqTopK probed at a codebook vector
    val self = Similarity.pqTopK(spark, sf, queryId = 3L, k = 500).collect()
    // every other codebook vector scores a strictly positive ADC distance
    assert(self.filter(_.getLong(0) < 16L).forall(_.getLong(1) > 0L))
  }

  test("jlRecall: one row per probe, n_full = k, recall consistent and " +
       "deterministic; projection matches a sequential fixed-point replay") {
    val rows = Similarity.jlRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 20)
    rows.foreach { case (_, nFull, nOv, rec) =>
      assert(nFull === 5L)
      assert(nOv >= 0L && nOv <= nFull)
      assert(rec === nOv.toDouble / nFull)
    }
    val again = Similarity.jlRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === again.toSeq)
    // the projection itself: replay one vector's 16 coordinates
    // sequentially with the same per-term fixed-pointing
    import spark.implicits._
    val (vid, v) = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().minBy(_._1)
    val expected = (0 until 16).map { j =>
      (0 until 64).map { d =>
        // Spark round() = BigDecimal.valueOf (shortest repr) HALF_UP
        java.math.BigDecimal.valueOf(
            Similarity.planeComponent(j, d) * v(d).toDouble * 1e4)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }.sum.toDouble
    }
    val got = Similarity.jlProjection(spark, sf)
      .filter($"vec_id" === vid)
      .select($"p").as[Array[Double]].head().toSeq
    assert(got === expected)
  }

  test("mmrRerank matches a sequential greedy replay; no duplicate picks " +
       "and rank-1 is pure relevance") {
    val emb = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def csU(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      java.math.BigDecimal.valueOf(dot / (na * nb) * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    }
    val (nQ, poolN, k) = (8, 20, 5)
    val expected = (0L until nQ.toLong).flatMap { qid =>
      val pool = emb.keys.filter(_ != qid).toSeq
        .map(v => v -> csU(emb(v), emb(qid)))
        .sortBy { case (v, cs) => (-cs, v) }.take(poolN)
      var sel = Vector(pool.head._1)
      var rows = Vector((qid, 1, pool.head._1, pool.head._2,
        7L * pool.head._2))
      for (r <- 2 to k) {
        val cand = pool.filter(p => !sel.contains(p._1))
          .map { case (v, cs) =>
            val ms = sel.map(b => csU(emb(v), emb(b))).max
            (v, cs, 7L * cs - 3L * ms)
          }
        val best = cand.minBy { case (v, _, sc) => (-sc, v) }
        sel :+= best._1
        rows :+= ((qid, r, best._1, best._2, best._3))
      }
      rows
    }
    val got = Similarity.mmrRerank(spark, sf)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(got.length === nQ * k)
    assert(got === expected,
      "greedy selection must match the sequential replay exactly")
    // structural sanity: per query, no duplicate vec_ids; ranks 1..k
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).distinct.length === k, s"query $q dup pick")
      assert(rs.map(_._2).sorted === (1 to k), s"query $q ranks")
    }
  }

  test("knnLabelAgreement matches a sequential banded-kNN replay and " +
       "reads this fixture's labels as neighborhood-noise") {
    val rows = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def csU(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      java.math.BigDecimal.valueOf(dot / (na * nb) * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    }
    val k = 5
    // candidate sets from the SAME banded sign-LSH scheme the engine
    // rides: r planes per band × 24 bands, planes from planeComponent
    val r = Similarity.autoPlanesPerBand(rows.length.toLong)
    def sigs(v: Array[Double]): Seq[(Int, Int)] = (0 until 24).map { b =>
      val sig = (0 until r).map { p =>
        val plane = (0 until 64).map(d =>
          Similarity.planeComponent(b * r + p, d))
        val dot = (0 until 64).map(d => v(d) * plane(d)).sum
        if (dot > 0) 1 << p else 0
      }.sum
      (b, sig)
    }
    val sigMap = rows.map { case (id, _, v) => id -> sigs(v).toSet }.toMap
    def collides(x: Long, y: Long): Boolean =
      sigMap(x).exists(sigMap(y).contains)
    val perVec = rows.map { case (id, lbl, v) =>
      val nn = rows.filter(o => o._1 != id && collides(id, o._1))
        .map(o => (o._1, o._2, csU(v, o._3)))
        .sortBy { case (oid, _, cs) => (-cs, oid) }.take(k)
      (lbl, nn.count(_._2 == lbl).toLong)
    }
    val expected = perVec.groupBy(_._1).map { case (lbl, vs) =>
      val n = vs.length.toLong
      val sa = vs.map(_._2).sum
      lbl -> ((n, sa * 10000 / (n * k),
        vs.count(_._2 * 2 < k).toLong))
    }
    val got = Similarity.knnLabelAgreement(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length === expected.size)
    got.foreach { case (lbl, n, bp, sus) =>
      val (en, ebp, esus) = expected(lbl)
      assert(n === en, s"label $lbl n")
      assert(bp === ebp, s"label $lbl agree_bp")
      assert(sus === esus, s"label $lbl n_suspect")
    }
    // this fixture's labels are near-random w.r.t. kNN neighborhoods
    // (pooled agreement ~= the 1/n_labels chance line) — which is
    // exactly the condition the audit exists to report: pin that the
    // screen reads "noisy labels" (most members lose their own vote)
    // rather than asserting cluster structure the data doesn't have
    val pooled = got.map(r => r._2 * r._3).sum.toDouble /
      (got.map(_._2).sum * 10000)
    assert(pooled > 0.0 && pooled < 0.5, s"pooled agreement $pooled")
    assert(got.map(_._2).sum === rows.length.toLong)
    assert(got.map(_._4).sum > got.map(_._2).sum / 2,
      "suspect count should dominate when labels are neighborhood-noise")
  }

  test("bitextMine matches a sequential margin replay; margins genuinely " +
       "re-rank raw cosine") {
    val emb = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def csU(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      java.math.BigDecimal.valueOf(dot / (na * nb) * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    }
    val k = 4
    // cross-half candidates from the engine's banded sign-LSH scheme
    val r = Similarity.autoPlanesPerBand(emb.size.toLong)
    def sigs(v: Array[Double]): Set[(Int, Int)] = (0 until 24).map { b =>
      val sig = (0 until r).map { p =>
        val plane = (0 until 64).map(d =>
          Similarity.planeComponent(b * r + p, d))
        val dot = (0 until 64).map(d => v(d) * plane(d)).sum
        if (dot > 0) 1 << p else 0
      }.sum
      (b, sig)
    }.toSet
    val sigMap = emb.map { case (id, v) => id -> sigs(v) }
    val xs = emb.keys.filter(_ % 2 == 0).toSeq.sorted
    val ys = emb.keys.filter(_ % 2 == 1).toSeq.sorted
    val sims = for {
      x <- xs; y <- ys
      if sigMap(x).exists(sigMap(y).contains)
    } yield (x, y, csU(emb(x), emb(y)))
    val fwd = sims.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, y, cs) => (-cs, y) }.take(k)).toMap
    val sax = fwd.view.mapValues(_.map(_._3).sum).toMap
    val say = sims.groupBy(_._2).view.mapValues(
      _.sortBy { case (x, _, cs) => (-cs, x) }.take(k).map(_._3).sum).toMap
    val expected = fwd.toSeq.flatMap { case (x, rows) =>
      rows.zipWithIndex.collect {
        case ((_, y, cs), i)
            if cs > 0 && sax(x) + say(y) > 0 &&
              (2 * k * cs * 10000) / (sax(x) + say(y)) >= 10200L =>
          (x, y) -> ((i + 1, cs, (2 * k * cs * 10000) / (sax(x) + say(y))))
      }
    }.toMap
    val got = Similarity.bitextMine(spark, sf)
      .as[(Long, Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "fixture mines no pairs; test is vacuous")
    // the margin must actually demote some high-cosine candidate: a
    // forward-rank-1 pair somewhere fails the margin bar
    val demoted = fwd.exists { case (x, rows) =>
      rows.headOption.exists { case (_, y, _) => !got.contains((x, y)) }
    }
    assert(demoted, "margin criterion never disagreed with raw cosine")
  }

  test("kCenterSeeds: sequential Gonzalez replay matches; the coverage " +
       "radius never increases") {
    val vecs = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def d(a: Array[Double], b: Array[Double]): Long =
      a.indices.map(i =>
        math.round((a(i) - b(i)) * (a(i) - b(i)) * 1e12)).sum
    val ids = vecs.keys.toSeq.sorted
    val md = scala.collection.mutable.Map(
      ids.map(id => id -> d(vecs(id), vecs(0L))): _*)
    val expected = scala.collection.mutable.ArrayBuffer(
      (1, 0L, 0L, md.values.max))
    for (r <- 2 to 6) {
      val wid = ids.maxBy(id => (md(id), -id))
      val wd = md(wid)
      ids.foreach(id => md(id) = math.min(md(id), d(vecs(id), vecs(wid))))
      expected += ((r, wid, wd, md.values.max))
    }
    val rows = Similarity.kCenterSeeds(spark, sf).collect()
    rows.zip(expected).foreach { case (row, (r, wid, wd, rad)) =>
      assert(row.getAs[Int]("round") === r)
      assert(row.getAs[Long]("vec_id") === wid, s"winner at round $r")
      assert(row.getAs[Long]("picked_d") === wd)
      assert(row.getAs[Long]("radius_after") === rad)
    }
    // the k-center objective is monotone under added centers
    assert(rows.map(_.getAs[Long]("radius_after")).sliding(2)
      .forall(p => p(0) >= p(1)))
  }

  test("knnShapley: the exact suffix recursion recounts per probe and " +
       "the top-25 aggregation matches; efficiency law holds to " +
       "truncation drift") {
    import graft.Tables
    import graft.functions.vectors
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 5
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex("split:" + id).substring(0, 15), 16) % 100
    val all = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"label",
        vectors.toDoubleArray($"embedding").as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    val probes = all.filter(e => bucket(e._1) >= 90).sortBy(_._1).take(40)
    val train = all.filter(e => bucket(e._1) < 90)
    val n = train.length.toLong
    def csU(a: Seq[Double], b: Seq[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb) * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // trunc division matching Spark div / DuckDB //
    def tdiv(a: Long, b: Long): Long = a / b
    val sums = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    probes.foreach { case (_, la, av) =>
      val ranked = train.map { case (b, lb, bv) => (b, lb, csU(av, bv)) }
        .sortBy(t => (-t._3, t._1))
      val ind = ranked.map(t => if (t._2 == la) 1L else 0L)
      val sArr = new Array[Long](ranked.length)
      sArr(ranked.length - 1) = tdiv(1000000L * ind.last, n)
      for (i <- ranked.length - 2 to 0 by -1) {
        val rk = i + 1L
        sArr(i) = sArr(i + 1) +
          tdiv((ind(i) - ind(i + 1)) * 1000000L * math.min(k, rk), k * rk)
      }
      ranked.zip(sArr).foreach { case ((b, _, _), s0) => sums(b) += s0 }
      // efficiency law on the exact (double) recursion: sum of all
      // Shapley values equals the full-set utility agree@K / K
      val sD = new Array[Double](ranked.length)
      sD(ranked.length - 1) = ind.last.toDouble / n
      for (i <- ranked.length - 2 to 0 by -1) {
        val rk = i + 1L
        sD(i) = sD(i + 1) +
          (ind(i) - ind(i + 1)).toDouble * math.min(k, rk) / (k * rk)
      }
      assert(math.abs(sD.sum - ind.take(k).sum.toDouble / k) < 1e-9,
        "efficiency law violated on the exact recursion")
    }
    val expected = sums.toSeq.map { case (b, s0) =>
      (b, train.find(_._1 == b).get._2.toLong, s0)
    }.sortBy(t => (-t._3, t._1)).take(25)
      .zipWithIndex.map { case ((b, lb, s0), i) =>
        (i + 1, b, lb, 40L, s0)
      }
    val got = Similarity.knnShapley(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getAs[Number]("label").longValue(), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected)
  }
}
