package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "b", 43L), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "en", "a", 43L), // near dup of 1
    (4L, "completely different content about spark engines", "en", "a", 48L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical content, keeps smallest id") {
    val r = docs.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep"), count(lit(1)).as("n"))
      .filter($"n" > 1).head()
    assert(r.getLong(1) === 1L && r.getLong(2) === 2L)
  }

  test("minhash signatures identical for identical docs") {
    val sig = Dedup.minhashSignatures(docs, shingleSize = 3, numHashes = 8)
      .groupBy($"doc_id").agg(concat_ws("|", array_sort(collect_list($"mh"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
  }

  test("minhash LSH pairs exact dups, never unrelated docs") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupspec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.minhashLshPairs(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("incremental LSH probes batch against index only, both directions absent") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupincr").toString
    // batch = {2} (exact dup of indexed 1); index = {1, 3, 4}
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.incrementalLshPairs(spark, tmp,
        batchPred = $"doc_id" === 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)), s"batch dup must hit its indexed twin: $pairs")
    // no index-internal pairs (1-3 are near dups but both indexed), and
    // the unrelated doc never appears
    assert(pairs.forall(_._1 == 2L), pairs)
    assert(!pairs.exists(_._2 == 4L), pairs)
  }

  test("simhashFast equals the reference simhash64 expression") {
    val slow = docs.select($"doc_id",
        Dedup.simhash64(graft.functions.text.tokensLower($"text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Dedup.simhashFast(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }

  test("dedupClusters finds connected components with min-id canon") {
    // graph: {1-2, 2-3} one cluster, {10-11} another, chain {20-21, 21-22, 22-23}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("contract-and-finish equals the pure distributed loop on a deep chain") {
    // one 60-node chain (depth forces many propagation rounds), ids
    // DESCENDING along the chain plus a separate triangle and a pair —
    // exercises quotient contraction + the single-task union-find against
    // maxLocalEdges=0, which forbids the local finisher entirely
    val chain = (0 until 59).map(i => (100L - i, 99L - i))
    val pairs = (chain ++ Seq((200L, 201L), (201L, 202L), (200L, 202L), (300L, 301L)))
      .toDF("doc_a", "doc_b")
    val expected = ((41L to 100L).map(_ -> 41L) ++
      Seq(200L -> 200L, 201L -> 200L, 202L -> 200L, 300L -> 300L, 301L -> 300L)).toMap
    val local = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Dedup.dedupClusters(pairs, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === expected)
    assert(distributed === expected)
  }

  test("sourceOverlap conserves the LSH pair count across the source matrix") {
    val pairTotal = Dedup.minhashLshPairs(spark, sf).count()
    val overlap = Dedup.sourceOverlap(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(overlap.map(_._2).sum === pairTotal, "every pair lands in one cell")
    // unordered pairs: key is (least, greatest), each cell unique
    overlap.foreach { case ((x, y), _) => assert(x <= y) }
    assert(overlap.map(_._1).distinct.length === overlap.length)
  }

  test("dedupClusters with a reliable checkpoint dir matches the default strategy") {
    val ckDir = java.nio.file.Files.createTempDirectory("cc-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("doc_a", "doc_b")
    val reliable = Dedup.dedupClusters(pairs,
        checkpoint = Dedup.reliableCheckpointStrategy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val default = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === default)
    // the strategy actually wrote blocks to the reliable dir
    val wrote = new java.io.File(ckDir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint written")
  }

  test("dedupAssignments groups the exact dups in the fixture corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupassign").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.dedupAssignments(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 1L) // exact dup of doc 1
    assert(got.getOrElse(4L, 4L) === 4L) // unrelated doc never absorbed
  }

  test("incrementalClusters: quotient maintenance equals the full " +
       "recompute for every batch carve, including cluster-merging ones") {
    val full = Dedup.dedupAssignments(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // several carves: different batch sizes and positions, including
    // batches that bridge two previously separate base clusters
    val carves = Seq[(String, org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column)](
      ("quarter", _ % 4 === 3), ("half", _ % 2 === 0),
      ("band", _ % 10 < 3))
    carves.foreach { case (name, pred) =>
      val inc = Dedup.incrementalClusters(spark, sf, pred)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === full, s"carve $name diverged from the full recompute")
    }
  }

  test("dedupCorpus keeps exactly the canonical member of each cluster") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupcorpus").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val assignments = Dedup.dedupAssignments(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = Dedup.dedupCorpus(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    val expected = all.filter(id => assignments.getOrElse(id, id) == id)
    assert(survivors === expected)
  }

  test("dedupBest keeps each cluster's highest-quality member, min-id ties") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupbest").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val assignments = Dedup.dedupAssignments(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = graft.Tables(spark, tmp, "documents")
      .select($"doc_id", graft.functions.text.qualityScore($"text", $"n_chars"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val best = Dedup.dedupBest(spark, tmp)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // one row per cluster, covering exactly the clustered docs
    val clusters = assignments.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    assert(best.keySet === clusters.keySet)
    best.foreach { case (canon, (bestId, nMembers, q)) =>
      val members = clusters(canon)
      assert(members.contains(bestId), s"$bestId not in cluster $canon")
      assert(nMembers === members.length.toLong)
      val topQ = members.map(quality).max
      assert(q === topQ)
      // argmax ties break to the smallest doc_id
      assert(bestId === members.filter(quality(_) == topQ).min)
    }
  }

  test("dedupProfile histogram matches a recount of the assignment frame") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupprof").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sizes = Dedup.dedupAssignments(spark, tmp)
      .collect().map(r => r.getLong(1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap // canon -> size
    val expected = sizes.values.groupBy(identity).view
      .mapValues(g => (g.size.toLong, g.sum)).toMap // size -> (n_clusters, n_docs)
    val got = Dedup.dedupProfile(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("dedupAssignments catches middle members of 3+-copy short-doc groups") {
    // "hi there" has < shingleSize tokens -> invisible to MinHash; only
    // the exact-dup star edges can cluster it, including the middle id
    val tmp = java.nio.file.Files.createTempDirectory("dedupmid").toString
    Seq(
      (1L, "hi there", "en", "a", 8L),
      (5L, "hi there", "en", "b", 8L),
      (9L, "hi there", "en", "c", 8L),
      (20L, "something else entirely different", "en", "a", 33L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.dedupAssignments(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("minhashJaccardEst: one row per LSH candidate, estimator brackets truth") {
    val est = Dedup.minhashJaccardEst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(est.map(e => (e._1, e._2)).toSet === pairs)
    est.foreach { case (_, _, e, t) =>
      assert(e >= 0.0 && e <= 1.0 && t >= 0.0 && t <= 1.0)
      // LSH candidates agreed on a full band (3 of 12 seeds) by construction
      assert(e >= 0.25 - 1e-9)
    }
    // exact duplicates must estimate exactly 1 and measure exactly 1
    val dupes = Dedup.exact(spark, sf).filter($"n_copies" > 1)
    if (dupes.count() > 0) {
      val perfect = est.filter(_._4 == 1.0)
      assert(perfect.forall(_._3 == 1.0), "identical shingle sets ⇒ identical minhashes")
    }
  }

  test("simhash: identical docs share fingerprints; distinct content differs") {
    val fp = docs.select($"doc_id", Dedup.simhash64(graft.functions.text.tokensLower($"text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(4L))
    // near-dup differs in few bits
    val hamming = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(hamming <= 16, s"near-dup hamming=$hamming")
  }

  test("nearDupPageRank matches a single-threaded integer recompute") {
    val got = Dedup.nearDupPageRank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // driver recompute from the same candidate edges, plain Scala
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.length.toLong }
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    var rank = docs.map(_ -> 100000L).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = docs.map(d => d -> (15000L + 85L * contrib.getOrElse(d, 0L) / 100L)).toMap
    }
    assert(got.toSeq === docs.map(d => d -> rank(d)).toSeq)
    // centrality sanity: isolated docs sit at the damping baseline,
    // connected docs above it
    val connected = edges.map(_._1).toSet
    got.foreach { case (d, pr) =>
      if (!connected.contains(d)) assert(pr === 15000L)
      else assert(pr > 15000L)
    }
  }

  test("labelPropagation matches a single-threaded synchronous LPA") {
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val nodes = edges.map(_._1).distinct.sorted
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val byDst = edges.groupBy(_._1)
      lbl = nodes.map { v =>
        val counts = byDst(v).map { case (_, nb) => lbl(nb) }
          .groupBy(identity).map { case (l, xs) => (l, xs.length) }
        // most frequent neighbor label, minimum label on ties
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = Dedup.labelPropagation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === nodes.map(n => (n, lbl(n))).toSeq)
    // communities refine reachability: same community => same CC canon
    val canon = Dedup.dedupAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got.groupBy(_._2).values.foreach { grp =>
      assert(grp.map(g => canon.getOrElse(g._1, g._1)).distinct.length <= 1)
    }
  }

  test("nearDupModularity recounts from the LPA labels and the pair list; " +
       "degree and internal-edge identities hold") {
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lbl = Dedup.labelPropagation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val m = pairs.length.toLong
    val ein = pairs.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy { case (a, _) => lbl(a) }
      .map { case (c, xs) => (c, xs.length.toLong) }
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (v, xs) => (v, xs.length.toLong) }
    val comm = lbl.keys.toSeq.groupBy(lbl)
      .map { case (c, vs) => (c, (vs.size.toLong, vs.map(deg).sum)) }
    val rows = Dedup.nearDupModularity(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === comm.keys.toSeq.sorted)
    rows.foreach { r =>
      val c = r.getLong(0)
      val (nn, ds) = comm(c)
      val ei = ein.getOrElse(c, 0L)
      assert(r.getAs[Long]("n_nodes") === nn)
      assert(r.getAs[Long]("e_in") === ei)
      assert(r.getAs[Long]("deg_sum") === ds)
      // the exact truncating-division ppm formula, recounted in Java longs
      assert(r.getAs[Long]("q_term_ppm") ===
        ei * 1000000L / m - ((ds * ds) / (4 * m)) * 1000000L / m)
    }
    // graph identities: degrees double-count edges; internal edges <= m
    assert(rows.map(_.getAs[Long]("deg_sum")).sum === 2 * m)
    assert(rows.map(_.getAs[Long]("e_in")).sum <= m)
  }

  test("dedupMethodAgreement recounts from the three pair sets") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = Map(
      "minhash" -> pairSet(Dedup.minhashLshPairs(spark, sf)
        .select($"doc_a", $"doc_b")),
      "simhash" -> pairSet(Dedup.simhashPairs(spark, sf)
        .select($"doc_a", $"doc_b")),
      "embedding" -> pairSet(Similarity.embeddingNearDupPairs(spark, sf)
        .select($"vec_a", $"vec_b")))
    val rows = Dedup.dedupMethodAgreement(spark, sf).collect()
    assert(rows.length === 3)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("embedding", "minhash"), ("embedding", "simhash"),
        ("minhash", "simhash")))
    rows.foreach { r =>
      val (sa, sb) = (sets(r.getString(0)), sets(r.getString(1)))
      assert(r.getAs[Long]("n_a") === sa.size.toLong)
      assert(r.getAs[Long]("n_b") === sb.size.toLong)
      val nb = (sa intersect sb).size.toLong
      assert(r.getAs[Long]("n_both") === nb)
      val u = sa.size.toLong + sb.size.toLong - nb
      if (u == 0) assert(r.isNullAt(r.fieldIndex("jaccard_ppm")))
      else assert(r.getAs[Long]("jaccard_ppm") === nb * 1000000L / u)
    }
  }

  test("sortedNeighborhoodPairs emits exactly the window-adjacent pairs " +
       "of the key-sorted corpus with exact ppm Jaccard") {
    val d = graft.Tables(spark, sf, "documents")
      .select($"doc_id",
        substring(regexp_replace(lower($"text"), "[^a-z0-9]", ""), 1, 24)
          .as("bk"),
        graft.functions.text.distinctTokens($"text").as("toks"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2).toSet))
    val sorted = d.sortBy(x => (x._2, x._1))
    val expected = (for {
      i <- sorted.indices; g <- 1 to 3; if i + g < sorted.length
    } yield {
      val (a, b) = (sorted(i), sorted(i + g))
      val u = (a._3 union b._3).size
      val j = if (u == 0) None
              else Some((a._3 intersect b._3).size.toLong * 1000000L / u)
      ((a._1, b._1), (g.toLong, j))
    }).toMap
    val rows = Dedup.sortedNeighborhoodPairs(spark, sf).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (g, j) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getAs[Long]("rank_gap") === g)
      if (j.isEmpty) assert(r.isNullAt(r.fieldIndex("jaccard_ppm")))
      else assert(r.getAs[Long]("jaccard_ppm") === j.get)
    }
  }

  test("clusterProvenance recounts source/lang mixes from the CC " +
       "assignments; singleton clusters are absent") {
    val asn = Dedup.dedupAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val meta = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", $"lang")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    val expected = asn.groupBy(_._2).collect {
      case (c, xs) if xs.length > 1 =>
        val ms = xs.map(x => meta(x._1))
        c -> ((xs.length.toLong, ms.map(_._1).distinct.length.toLong,
          ms.map(_._2).distinct.length.toLong))
    }
    val rows = Dedup.clusterProvenance(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === expected.keys.toSeq.sorted)
    rows.foreach { r =>
      val (n, ns, nl) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("n_sources") === ns)
      assert(r.getAs[Long]("n_langs") === nl)
      assert(r.getAs[Boolean]("cross_source") === (ns > 1))
    }
  }

  test("kCore matches a sequential peel and has converged by its fixed rounds") {
    val k = 2
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // sequential peel to FIXPOINT (not fixed rounds): the operator's
    // fixed unroll must have converged at this scale or the two diverge
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSeq
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (v, es) => (v, es.length) }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.length != edges.length
      edges = next
    }
    val expected = edges.groupBy(_._1)
      .map { case (v, es) => (v, es.length.toLong) }.toSeq.sortBy(_._1)
    val got = Dedup.kCore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty, "corpus should retain a non-trivial 2-core")
    assert(got === expected)
    // every survivor keeps >= k neighbors inside the core, by definition
    assert(got.forall(_._2 >= k))
  }

  test("coreness matches a sequential nested peel; level-2 set equals kCore") {
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSeq
    val nodes = edges.map(_._1).distinct
    val expected = scala.collection.mutable.Map(nodes.map(_ -> 1): _*)
    for (k <- 2 to 4) {
      var changed = true
      while (changed) { // peel THIS level to fixpoint, from the previous core
        val deg = edges.groupBy(_._1).map { case (v, es) => (v, es.length) }
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        changed = next.length != edges.length
        edges = next
      }
      edges.map(_._1).distinct.foreach(v => expected(v) = k)
    }
    val got = Dedup.coreness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === nodes.sorted.map(n => (n, expected(n))))
    // internal consistency: the >=2 slice IS the kCore member set
    val kcoreMembers = Dedup.kCore(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 >= 2).map(_._1).toSet === kcoreMembers)
  }

  test("nearDupTriangles matches a brute-force triple scan") {
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && pairs((a, b))
      c <- nodes if b < c && pairs((b, c)) && pairs((a, c))
    } yield (a, b, c)
    val expected = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (d, xs) => (d, xs.length.toLong) }
      .toSeq.sortBy(_._1)
    val got = Dedup.nearDupTriangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(tris.nonEmpty, "corpus should close at least one triangle")
    // the degree-oriented schedule counts the identical triangle set
    val oriented = Dedup.nearDupTrianglesOriented(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(oriented === expected)
  }

  test("containmentPairs matches driver set arithmetic; exact dups score 10000/10000") {
    import org.apache.spark.sql.functions._
    val got = Dedup.containmentPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    // driver recompute: shingle sets via the same public column helpers,
    // intersection/containment as plain Scala set arithmetic
    val shingles = graft.Tables(spark, sf, "documents")
      .select($"doc_id", explode(graft.functions.text.shinglesFromTokens(
        graft.functions.text.tokensLower($"text"), 3)).as("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    got.foreach { case ((a, b), (nsh, ca, cb)) =>
      val ia = shingles(a); val ib = shingles(b)
      val inter = (ia & ib).size.toLong
      assert(nsh === inter, s"pair ($a,$b)")
      assert(ca === inter * 10000 / ia.size, s"pair ($a,$b) cont_a")
      assert(cb === inter * 10000 / ib.size, s"pair ($a,$b) cont_b")
      assert(nsh >= 1 && ca >= 0 && ca <= 10000 && cb >= 0 && cb <= 10000)
    }
    // identical texts are LSH candidates by construction and must score
    // full containment on both sides
    val textOf = graft.Tables(spark, sf, "documents")
      .select($"doc_id", md5($"text").as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dupPairs = textOf.groupBy(_._2).values.filter(_.length > 1).flatMap { g =>
      val ids = g.map(_._1).sorted
      ids.combinations(2).map(p => (p(0), p(1)))
    }.filter { case (a, b) => shingles.contains(a) && shingles.contains(b) }
    dupPairs.foreach { p =>
      assert(got.contains(p), s"exact-dup pair $p missing from candidates")
      val (_, ca, cb) = got(p)
      assert(ca === 10000L && cb === 10000L, s"exact dup $p not fully contained")
    }
  }

  test("evalProximityPpr matches a sequential seeded integer PPR recount") {
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val docIds = graft.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val seeds = docIds.filter(id => h60(s"split:$id") % 100 >= 90).toSet
    val base = 15000L * docIds.length / seeds.size
    def teleport(id: Long): Long = if (seeds(id)) base else 0L
    var rank = docIds.map(id => id -> teleport(id)).toMap
    (1 to 3).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          java.lang.Math.floorDiv(rank(src), deg(src)) }.sum
      }
      rank = docIds.map(id => id ->
        (teleport(id) +
          java.lang.Math.floorDiv(85L * contrib.getOrElse(id, 0L), 100L))).toMap
    }
    val got = Dedup.evalProximityPpr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._3).toMap === rank)
    got.foreach { case (id, isSeed, ppr) =>
      assert(isSeed === seeds(id))
      if (isSeed) assert(ppr >= base, s"seed $id below teleport floor")
    }
    // diffusion is real: some NON-seed doc near a seed scores > 0, and
    // some isolated non-seed sits exactly at 0
    assert(got.exists { case (id, s2, p) => !s2 && p > 0L })
    assert(got.exists { case (id, s2, p) => !s2 && p === 0L })
  }

  test("pairSimilarityHistogram matches a driver Jaccard-bucket recount") {
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val shingles = graft.Tables(spark, sf, "documents")
      .select($"doc_id", explode(graft.functions.text.shinglesFromTokens(
        graft.functions.text.tokensLower($"text"), 3)).as("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = pairs.map { case (a, b) =>
      val ia = shingles(a); val ib = shingles(b)
      val inter = (ia & ib).size.toLong
      math.min(inter * 10000 / (ia.size + ib.size - inter) / 1000, 9L).toInt
    }.groupBy(identity).map { case (b, v) => (b, v.length.toLong) }
      .toSeq.sortBy(_._1)
    val got = Dedup.pairSimilarityHistogram(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === expected)
    // conservation + the histogram genuinely spreads (more than one bin)
    assert(got.map(_._2).sum === pairs.length.toLong)
    assert(got.length > 1, "single-bin histogram — threshold diagnostic vacuous")
  }

  test("sourceDupBurden matches a per-source recount over the assignments") {
    val assign = Dedup.dedupAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, g) =>
      val n = g.length.toLong
      val clustered = g.count(d => assign.contains(d._1)).toLong
      val dropped = g.count(d => assign.get(d._1).exists(_ != d._1)).toLong
      (src, n, clustered, dropped, dropped * 10000 / n)
    }
    val got = Dedup.sourceDupBurden(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
    // conservation + the fixture exercises both sides of the report
    assert(got.map(_._2).sum === docs.length.toLong)
    assert(got.exists(_._4 > 0L) && got.exists(g => g._4 < g._2))
  }

  test("cluster split: whole clusters share a split; singletons match hashSplit") {
    val split = Dedup.clusterSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val assign = Dedup.dedupAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every corpus doc gets exactly one assignment
    assert(split.size === graft.Tables(spark, sf, "documents").count())
    // cluster members all inherit the canon's group and therefore split
    assign.foreach { case (doc, canon) =>
      assert(split(doc)._1 === canon, s"doc $doc group != canon")
      assert(split(doc)._2 === split(canon)._2, s"doc $doc split leaks from $canon")
    }
    // docs in no cluster keep the plain hash split assignment (adopting
    // the cluster-aware split must not reshuffle the unclustered corpus)
    val clustered = assign.map(_._1).toSet
    val plain = TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    split.foreach { case (doc, (grp, sp)) =>
      if (!clustered.contains(doc)) {
        assert(grp === doc)
        assert(sp === plain(doc), s"singleton $doc diverges from hashSplit")
      }
    }
    // the corpus genuinely exercises the leak case: at least one cluster
    // spans members whose PLAIN hash splits disagree
    val rescued = assign.exists { case (doc, canon) =>
      doc != canon && plain(doc) != plain(canon)
    }
    assert(rescued, "fixture has no cross-split dup family; test is vacuous")
  }

  /** Sequential Wagner-Fischer edit distance — the reference the
    * distributed Levenshtein verify must reproduce pair-for-pair.
    */
  private def editDist(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    var i = 1
    while (i <= a.length) {
      var diag = prev(0); prev(0) = i
      var j = 1
      while (j <= b.length) {
        val t = prev(j)
        prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = t
        j += 1
      }
      i += 1
    }
    prev(b.length)
  }

  test("editNearDupPairs: scores match a sequential Wagner-Fischer replay " +
       "over the LSH candidate set") {
    import spark.implicits._
    val texts = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val cands = Dedup.minhashLshPairs(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(cands.nonEmpty)
    val expected = cands.flatMap { case (a, b) =>
      val pa = texts(a).take(400); val pb = texts(b).take(400)
      val lev = editDist(pa, pb).toLong
      val mx = math.max(pa.length, pb.length).toLong
      val sim = if (mx == 0) 10000L else 10000L - lev * 10000L / mx
      if (sim >= 7000L) Some((a, b) -> (lev, sim)) else None
    }.toMap
    val got = Dedup.editNearDupPairs(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === expected)
    assert(got.nonEmpty, "fixture has no edit-near-dup pair; test is vacuous")
  }

  test("bfsHops matches a sequential multi-source BFS; survivors are " +
       "exactly the hop-0 set") {
    val pairs = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.collect { case (v, ns) if ns.min > v => v }.toSet
    var dist = seeds.map(_ -> 0).toMap
    for (_ <- 1 to 4) {
      val relaxed = adj.keys.flatMap { v =>
        val best = (dist.get(v).toSeq ++
          adj(v).flatMap(n => dist.get(n).map(_ + 1)))
        if (best.isEmpty) None else Some(v -> best.min)
      }.toMap
      dist = relaxed
    }
    val got = Dedup.bfsHops(spark, sf).as[(Long, Int)].collect().toMap
    assert(got === dist)
    assert(got.values.exists(_ == 0) && got.values.exists(_ > 0),
      "fixture must have both survivors and dropped docs")
    // a hop-h node must have a neighbor at hop h-1 (BFS layering)
    got.foreach { case (v, h) =>
      if (h > 0) assert(adj(v).exists(n => got.get(n).contains(h - 1)),
        s"node $v layer gap")
    }
  }

  test("kmvOverlap: sketch and exact numbers recount; estimates land " +
       "near truth") {
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s0: String): Long =
      java.lang.Long.parseLong(md5hex(s0).substring(0, 15), 16)
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"split:$id").substring(0, 15), 16) % 100
    def shingles(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    val train = docs.filter(d => bucket(d._1) < 80)
      .flatMap(d => shingles(d._2)).map(h60).toSet
    val ev = docs.filter(d => bucket(d._1) >= 90)
      .flatMap(d => shingles(d._2)).map(h60).toSet
    val k = 256
    val tMin = train.toSeq.sorted.take(k)
    val eMin = ev.toSeq.sorted.take(k)
    val uMin = (tMin ++ eMin).distinct.sorted.take(k)
    val matches = uMin.count(h => tMin.contains(h) && eMin.contains(h))
    val inter = train.intersect(ev).size.toLong
    val jaccExact = inter * 10000 / (train.size + ev.size - inter)
    val row = Dedup.kmvOverlap(spark, sf).collect().head
    assert(row.getAs[Long]("n_train") === train.size.toLong)
    assert(row.getAs[Long]("n_eval") === ev.size.toLong)
    assert(row.getAs[Long]("n_inter") === inter)
    assert(row.getAs[Long]("matches") === matches.toLong)
    assert(row.getAs[Long]("jacc_exact_bp") === jaccExact)
    assert(row.getAs[Long]("jacc_est_bp") === matches.toLong * 10000 / k)
    assert(row.getAs[Long]("n_train_est") ===
      (BigInt(k - 1) * BigInt(1L << 60) / BigInt(tMin.last)).toLong)
    // KMV at k=256 has ~6% stderr; a 25% deterministic band is generous
    val est = row.getAs[Long]("n_train_est").toDouble
    assert(math.abs(est / train.size - 1.0) < 0.25,
      s"cardinality estimate off: $est vs ${train.size}")
  }

  test("degreeAssortativity: moments recount from the candidate edges; " +
       "r stays in [-1, 1]") {
    val pairs = Dedup.minhashLshPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = BigInt(edges.length)
    val dx = edges.map(e => BigInt(deg(e._1)))
    val dy = edges.map(e => BigInt(deg(e._2)))
    val (sx, sy) = (dx.sum, dy.sum)
    val sxy = dx.zip(dy).map { case (a, b) => a * b }.sum
    val sxx = dx.map(a => a * a).sum
    val syy = dy.map(a => a * a).sum
    val covNum = n * sxy - sx * sy
    val r0 = BigDecimal(covNum.toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble)
          * math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Dedup.degreeAssortativity(spark, sf).collect().head
    assert(row.getAs[Long]("n_edges") === edges.length.toLong)
    assert(row.getAs[Long]("n_nodes") === deg.size.toLong)
    assert(BigInt(row.getAs[Long]("cov_num")) === covNum)
    assert(row.getAs[Double]("assortativity") === r0)
    assert(math.abs(r0) <= 1.0)
  }

  test("linkageWeights: m/u agreement counts, smoothing and log2 weights " +
       "recount exactly from the pair sets") {
    import graft.Tables
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"lang", $"source",
        expr("octet_length(text) div 128").as("len_band"),
        element_at(split($"text", " ", 2), 1).as("tok1"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    val mPairs = Dedup.minhashLshPairs(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ranked = docs.keys.toSeq
      .sortBy(id => (md5hex("link:" + id), id))
    val h = docs.size / 2
    val uPairs = (0 until h).map(i => (ranked(i), ranked(i + h)))
    def agrees(p: Seq[(Long, Long)], pick: ((String, String, Long, String)) => Any) =
      p.count { case (a, b) => pick(docs(a)) == pick(docs(b)) }.toLong
    val picks: Seq[(String, ((String, String, Long, String)) => Any)] = Seq(
      "lang" -> (_._1), "source" -> (_._2),
      "len_band" -> (_._3), "first_token" -> (_._4))
    val nM = mPairs.length.toLong
    val nU = uPairs.length.toLong
    val rows = Dedup.linkageWeights(spark, sf).collect()
    assert(rows.map(_.getAs[String]("comparator")).sorted ===
      picks.map(_._1).sorted.toArray)
    def w(num: Long, den: Long): Long =
      BigDecimal(math.log(num.toDouble / den.toDouble) / math.log(2.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    rows.foreach { r =>
      val pick = picks.toMap.apply(r.getAs[String]("comparator"))
      val aM = agrees(mPairs.toSeq, pick)
      val aU = agrees(uPairs, pick)
      assert(r.getAs[Long]("n_match") === nM)
      assert(r.getAs[Long]("n_unmatch") === nU)
      assert(r.getAs[Long]("m_agree") === aM)
      assert(r.getAs[Long]("u_agree") === aU)
      assert(r.getAs[Long]("m_ppm") === (aM + 1) * 1000000 / (nM + 2))
      assert(r.getAs[Long]("u_ppm") === (aU + 1) * 1000000 / (nU + 2))
      assert(r.getAs[Long]("w_agree_u") ===
        w((aM + 1) * (nU + 2), (nM + 2) * (aU + 1)))
      assert(r.getAs[Long]("w_disagree_u") ===
        w((nM + 1 - aM) * (nU + 2), (nM + 2) * (nU + 1 - aU)))
    }
  }

  test("isotonicCalibration: minimax fits recount exactly, are monotone " +
       "in the right directions, and never beat the raw rates' SSE of 0 " +
       "claim falsely") {
    val rows = Dedup.isotonicCalibration(spark, sf).collect()
    val b = rows.length
    val nD = rows.map(_.getAs[Long]("n_docs"))
    val nDup = rows.map(_.getAs[Long]("n_dup"))
    val cn = nD.scanLeft(0L)(_ + _)
    val cd = nDup.scanLeft(0L)(_ + _)
    def rate(i: Int, j: Int): Long = // 1-indexed inclusive range
      1000000L * (cd(j) - cd(i - 1)) / (cn(j) - cn(i - 1))
    (1 to b).zip(rows).foreach { case (k, r) =>
      val fitInc = (1 to k).map(i =>
        (k to b).map(j => rate(i, j)).min).max
      val fitDec = (1 to k).map(i =>
        (k to b).map(j => rate(i, j)).max).min
      assert(r.getAs[Long]("rate_u") === rate(k, k))
      assert(r.getAs[Long]("fit_inc_u") === fitInc, s"fit_inc at idx $k")
      assert(r.getAs[Long]("fit_dec_u") === fitDec, s"fit_dec at idx $k")
    }
    // monotonicity laws of the minimax formula
    val inc = rows.map(_.getAs[Long]("fit_inc_u"))
    val dec = rows.map(_.getAs[Long]("fit_dec_u"))
    assert(inc.zip(inc.tail).forall { case (a, c) => a <= c })
    assert(dec.zip(dec.tail).forall { case (a, c) => a >= c })
    // SSE totals recount; the reported direction is the smaller SSE
    def sse(fit: Array[Long]) = rows.zip(fit).map { case (r, f) =>
      val d0 = BigInt(r.getAs[Long]("rate_u") - f)
      BigInt(r.getAs[Long]("n_docs")) * d0 * d0
    }.sum
    rows.foreach { r =>
      assert(BigInt(r.getAs[Long]("sse_inc")) === sse(inc))
      assert(BigInt(r.getAs[Long]("sse_dec")) === sse(dec))
      assert(r.getAs[Boolean]("monotone_up") === (sse(inc) <= sse(dec)))
    }
  }

  test("captureRecapture: Chapman estimate recounts from the two pair " +
       "sets and can never claim fewer dups than the observed union") {
    import spark.implicits._
    val mh = Dedup.minhashLshPairs(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simhashPairs(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val (n1, n2, m) = (mh.size.toLong, sh.size.toLong, (mh & sh).size.toLong)
    val chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val union = n1 + n2 - m
    val r = Dedup.captureRecapture(spark, sf).collect().head
    assert(r.getAs[Long]("n_minhash") === n1)
    assert(r.getAs[Long]("n_simhash") === n2)
    assert(r.getAs[Long]("n_both") === m)
    assert(r.getAs[Long]("n_union") === union)
    assert(r.getAs[Long]("chapman_est") === chapman)
    assert(r.getAs[Long]("est_missed") === chapman - union)
    // algebraic law: (n1+1)(n2+1) - (union+1)(m+1) = (n1-m)(n2-m) >= 0,
    // so the estimate can never fall below what both nets already saw
    assert(r.getAs[Long]("est_missed") >= 0L)
    assert(r.getAs[Long]("minhash_recall_ppm") ===
      n1 * 1000000 / math.max(chapman, 1L))
    assert(r.getAs[Long]("simhash_recall_ppm") ===
      n2 * 1000000 / math.max(chapman, 1L))
    // the fixture corpus must actually exercise the overlap
    assert(m > 0 && m < n1 && m < n2)
  }

  test("dedupSurvivorship: the exact KS between survivor and victim " +
       "quality recounts from assignments + scores") {
    val assign = Dedup.dedupAssignments(spark, sf)
      .as[(Long, Long)].collect()
    val qu = TextOps.qualityScores(spark, sf)
      .select($"doc_id", round($"quality" * 10000).cast("long"))
      .as[(Long, Long)].collect().toMap
    val surv = assign.filter { case (d, c) => d == c }.map(t => qu(t._1))
    val vict = assign.filter { case (d, c) => d != c }.map(t => qu(t._1))
    val n1 = BigInt(surv.length); val n2 = BigInt(vict.length)
    val cuts = (surv ++ vict).distinct.sorted
    val ksX = cuts.map { q =>
      (BigInt(surv.count(_ <= q)) * n2 - BigInt(vict.count(_ <= q)) * n1).abs
    }.max
    val r = Dedup.dedupSurvivorship(spark, sf).collect().head
    assert(r.getAs[Long]("n_survivors") === surv.length.toLong)
    assert(r.getAs[Long]("n_victims") === vict.length.toLong)
    assert(r.getAs[Long]("ks_bp") === (ksX * 10000 / (n1 * n2)).toLong)
    assert(r.getAs[Long]("mean_qu_surv") ===
      (surv.map(BigInt(_)).sum / n1).toLong)
    assert(r.getAs[Long]("mean_qu_vict") ===
      (vict.map(BigInt(_)).sum / n2).toLong)
    // both populations must be non-trivial or the audit is vacuous
    assert(surv.length > 1 && vict.length > 1)
  }
  test("dedupThresholdSweep: each bar recounts from the scored candidate " +
       "pairs; the sweep is monotone decreasing") {
    val corpus = graft.Tables(spark, sf, "documents")
    val nDocs = corpus.count()
    val pairs = Dedup.minhashLshPairs(spark, sf)
      .as[(Long, Long)].collect()
    val shs: Map[Long, Set[String]] = corpus.select($"doc_id",
        graft.functions.text.tokensLower($"text")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet).toMap
    val scored: Seq[(Long, Long, Long)] = pairs.toSeq.map { case (a, b) =>
      val sa = shs(a); val sb = shs(b)
      val inter = sa.intersect(sb).size.toLong
      (a, b, inter * 10000 / (sa.size + sb.size - inter))
    }
    val rows = Dedup.dedupThresholdSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("thr_bp") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_dropped"),
          r.getAs[Long]("loss_bp")))).toMap
    assert(rows.keySet === (5000L to 9500L by 500L).toSet)
    rows.foreach { case (thr, (np, nd, loss)) =>
      val keep = scored.filter(_._3 >= thr)
      assert(np === keep.length.toLong, s"pairs at $thr")
      assert(nd === keep.map(_._2).distinct.length.toLong, s"drops at $thr")
      assert(loss === nd * 10000 / nDocs)
    }
    // tightening the bar can only shrink the drop set
    val byThr = rows.toSeq.sortBy(_._1).map(_._2)
    byThr.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(hi._1 <= lo._1 && hi._2 <= lo._2)
      case _ =>
    }
  }

  test("rougePairs: clipped overlap bounded by both sides, F between recalls") {
    val rows = Dedup.rougePairs(spark, sf).collect()
    val pairKeys = Dedup.sharedLshPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet === pairKeys, "one ROUGE row per LSH candidate pair")
    rows.foreach { r =>
      val ov = r.getAs[Long]("ov2")
      assert(ov <= math.min(r.getAs[Long]("n_bi_a"), r.getAs[Long]("n_bi_b")),
        "clipped overlap can't exceed either side's bigram mass")
      val ra = r.getAs[Long]("r_a_bp"); val rb = r.getAs[Long]("r_b_bp")
      val f = r.getAs[Long]("f2_bp")
      assert(ra <= 10000L && rb <= 10000L)
      // harmonic mean sits between the recalls (±1 for the floors)
      assert(f >= math.min(ra, rb) - 1 && f <= math.max(ra, rb) + 1)
    }
  }

  test("dedupDesignReport recombines exactly its four parents' values, " +
       "all adjudicating the PLANNER-CHOSEN banding scheme") {
    val rep = Dedup.dedupDesignReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = scala.collection.mutable.Map[(String, String), Long]()
    val pl = Dedup.lshPlanner(spark, sf).filter($"chosen").head()
    expected(("lsh_scheme", "bands")) = pl.getAs[Int]("b").toLong
    expected(("lsh_scheme", "rows_per_band")) = pl.getAs[Int]("r").toLong
    expected(("lsh_scheme", "cost_u")) = pl.getAs[Long]("cost_u")
    // the three candidate-set facets must be computed from pairs banded
    // with the planner's chosen rows-per-band — the report's lsh_scheme
    // facet names the scheme that actually produced the adjudicated set
    val chosenPairs =
      Dedup.sharedLshPairs(spark, sf, rowsPerBand = pl.getAs[Int]("r"))
    Dedup.dedupThresholdSweep(spark, sf, chosenPairs, 3)
      .filter($"thr_bp" === 7000L)
      .collect().foreach { ts =>
        expected(("threshold_7000bp", "n_pairs")) = ts.getAs[Long]("n_pairs")
        expected(("threshold_7000bp", "n_docs_dropped")) =
          ts.getAs[Long]("n_docs_dropped")
        expected(("threshold_7000bp", "loss_bp")) = ts.getAs[Long]("loss_bp")
      }
    val cr = Dedup.captureRecapture(spark, sf, chosenPairs).head()
    expected(("capture_recapture", "chapman_est")) =
      cr.getAs[Long]("chapman_est")
    expected(("capture_recapture", "est_missed")) =
      cr.getAs[Long]("est_missed")
    expected(("capture_recapture", "minhash_recall_ppm")) =
      cr.getAs[Long]("minhash_recall_ppm")
    expected(("capture_recapture", "simhash_recall_ppm")) =
      cr.getAs[Long]("simhash_recall_ppm")
    val sv = Dedup.dedupSurvivorship(spark, sf, chosenPairs).head()
    expected(("survivorship", "ks_bp")) = sv.getAs[Long]("ks_bp")
    expected(("survivorship", "mean_qu_surv")) = sv.getAs[Long]("mean_qu_surv")
    expected(("survivorship", "mean_qu_vict")) = sv.getAs[Long]("mean_qu_vict")
    assert(rep === expected.toMap)
  }

  test("lshPlanner argmin departs from the hardcoded (4, 3) default " +
       "when the corpus's pair similarities demand it") {
    // every candidate pair is a true near-dup (s >= 0.95, all above the
    // 700-milli threshold): false negatives are the only cost, so the
    // single-row-per-band scheme b=12, r=1 (highest collision
    // probability) must win — NOT the default b=4, r=3
    val sims = Seq(950L, 960L, 970L, 980L, 990L).toDF("s_milli")
    val plan = Dedup.lshPlannerFromSims(sims, numHashes = 12,
      thresholdMilli = 700L)
    val picked = plan.filter($"chosen").select($"b", $"r").head()
    assert((picked.getInt(0), picked.getInt(1)) === (12, 1))
    assert((picked.getInt(0), picked.getInt(1)) !== (4, 3),
      "planner must be able to override the default scheme")
    // and plannedLshPairs carries the corpus-chosen scheme through:
    // its (b, r) columns equal the standalone planner's chosen row
    val chosen = Dedup.lshPlanner(spark, sf).filter($"chosen")
      .select($"b", $"r").head()
    val pairs = Dedup.plannedLshPairs(spark, sf)
    val schemes = pairs.select($"b", $"r").distinct().collect()
    assert(schemes.length === 1)
    assert((schemes(0).getInt(0), schemes(0).getInt(1)) ===
      (chosen.getInt(0), chosen.getInt(1)))
  }

}
