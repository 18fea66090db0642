package graft.operators

import graft.Tables
import graft.functions.vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (array<float> column).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline; one broadcast of the
  *    query vector, one scan, one top-k. At 100 TB this is a full scan
  *    but embarrassingly parallel (no shuffle until the final top-k).
  *  - IVF (inverted-file) — deterministic coarse quantizer: assign every
  *    vector to its nearest centroid (argmax cosine), search only the
  *    query's cell. This is the scale path: the scan shrinks by ~1/nlist
  *    and the assignment is a broadcast join, no shuffle of the vectors.
  */
object Similarity {

  private def embDouble(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), vectors.toDoubleArray(col("embedding")).as("v"))

  /** Exact cosine top-k against the embedding of `queryId`. */
  def bruteForceTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                     k: Int = 10): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val q = e.filter($"vec_id" === queryId).select($"v".as("qv"))
    e.join(broadcast(q))
      .filter($"vec_id" =!= queryId)
      .select($"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
  }

  /** Banded sign-random-projection buckets: `nBands` bands of
    * `planesPerBand` hyperplanes each (planes from [[planeComponent]] —
    * engine-portable constants, no learned state). A vector's bucket in
    * band b is the sign bitmask of its dots with that band's planes; two
    * vectors are candidates iff they share a bucket in ANY band — the
    * classic OR-of-ANDs amplification, same algebra as the MinHash band
    * join in `Dedup.bandSignatures`. All nBands×planesPerBand dots are
    * one scan-side projection BEFORE the band explode, so the corpus is
    * read once and only (vec_id, band, sig) rows — never the vectors —
    * enter the candidate shuffle. For the incremental probe the
    * corpus-side band table is written once at index build, bucketed by
    * (band, sig) ([[writeEmbeddingBandIndex]]), and read shuffle-free —
    * exactly as with the MinHash index in `Dedup.incrementalLshPairs`;
    * the self-join pair generators still derive it inline (their join
    * reads BOTH sides from the same frame).
    */
  /** Sentinel for "derive planesPerBand from the corpus size". */
  val AutoPlanes: Int = 0

  /** Adaptive band width: the smallest r keeping EXPECTED bucket
    * occupancy n/2^r at or below `targetOccupancy` (floor 4). With r
    * FIXED, bucket occupancy grows linearly in corpus size and the
    * candidate mass Σn² quadratically — the classic fixed-granularity
    * LSH failure at scale. Holding occupancy constant instead keeps
    * random-collision candidates ~linear in n; the price is recall,
    * which falls as r grows (p^r per band) — the explicit LSH trade, and
    * [[embeddingLshRecall]] measures it at whatever size the corpus is.
    * At genuine near-dup thresholds (≥0.8, per-bit agreement ~0.8+) the
    * recall loss per added bit is small; this synthetic corpus's loose
    * 0.3 threshold is the adversarial regime where the quadratic TRUE
    * pair mass dominates anyway (no parameterization beats
    * Θ(output)).
    */
  private[graft] def autoPlanesPerBand(n: Long, targetOccupancy: Long = 125L): Int =
    math.max(4, math.ceil(
      math.log(math.max(n, 1L).toDouble / targetOccupancy) / math.log(2.0)).toInt)

  private[graft] def bandedPlaneBuckets(e: DataFrame, planesPerBand: Int,
                                        nBands: Int, dim: Int = 64): DataFrame = {
    // r13 (guide §4): one BandSignatures expression instead of
    // nBands·planesPerBand inlined when(dot(v, lit(plane)) > 0, …)
    // terms — the inline composition generated a whole-stage method
    // past the JVM's huge-method bytecode limit, so it never JIT-
    // compiled and the projection ran interpreted (measured 1.2 s →
    // 0.15 s noop at sf0.1 for the 2 000×96-dot frame). Signatures are
    // bit-identical (same plane constants, same index-ascending dot,
    // same > 0 on the same IEEE double; null dots contribute 0 bits in
    // both forms — spec-pinned in SimilaritySpec).
    val planes = Array.tabulate(nBands * planesPerBand, dim)(
      (j, d) => planeComponent(j, d))
    import org.apache.spark.sql.GraftBridge
    val sigs = GraftBridge.column(graft.functions.expressions.BandSignatures(
      GraftBridge.expression(col("v")), planes, planesPerBand))
    e.select(col("vec_id"), posexplode(sigs).as(Seq("band", "sig")))
  }

  /** Embedding-cosine near-dup pairs: banded-LSH candidate generation
    * (bucket join on (band, sig) — the pair space is bucket-bounded,
    * never corpus²) followed by the exact cosine verify on candidates
    * only. Norms are staged once per vector; the final dot/(na*nb) is
    * bit-identical to inline cosineSimilarity.
    *
    * Parameter regime (measured on this corpus, audited by
    * [[embeddingLshRecall]]): sign-LSH selectivity grows with the cosine
    * gap over random, so at a genuine near-dup threshold (≥0.8) a
    * (8-plane, 16-band) scheme keeps ~6% of random pairs at ~94% recall,
    * while this corpus's loose 0.3 threshold sits barely above the
    * random-pair cosine (64-dim σ≈0.125) — the adversarial regime, where
    * (4, 24) still reaches 97% recall and the candidate set degrades
    * gracefully toward all-pairs rather than losing recall. The audit
    * query makes that curve visible per similarity bucket.
    *
    * Band width defaults to [[AutoPlanes]]: sized by
    * [[autoPlanesPerBand]] so expected bucket occupancy stays constant
    * as the corpus grows (4 at the oracle scale factors — identical to
    * the fixed scheme there — 8 at the 10x stress size), which keeps
    * random-collision candidate mass ~linear in n instead of quadratic.
    */
  /** Probe-side bucket variants for multi-probe LSH: the bucket itself
    * plus its `r` Hamming-distance-1 neighbors (one plane's sign
    * flipped). A near-miss pair that disagrees on exactly one plane of a
    * band still collides — per band the match probability rises from
    * p^r to p^r + r·p^(r-1)(1−p), which is what buys recall back when
    * [[autoPlanesPerBand]] widens bands at scale (measured at the 10x
    * size with auto r=8, by cos bucket: 0.36/0.48/0.56 single-probe →
    * 0.94/0.98/1.0 multi-probe). Cost is (r+1)× probe
    * rows — linear in r, vs the 2^r it would take to re-narrow buckets
    * — and the join stays an equi-join on (band, sig): the flips
    * explode on the PROBE side only, the stored index is untouched
    * (exactly how a served index multi-probes).
    */
  private def withProbes(bands: DataFrame, planesPerBand: Int,
                         multiProbe: Boolean): DataFrame =
    if (!multiProbe) bands
    else {
      val variants = col("sig") +: (0 until planesPerBand).map(k =>
        col("sig").bitwiseXOR(lit(1 << k)))
      bands.select(col("vec_id"), col("band"),
          explode(array(variants: _*)).as("sig"))
    }

  def embeddingNearDupPairs(s: SparkSession, dir: String,
                            threshold: Double = 0.3,
                            planesPerBand: Int = AutoPlanes,
                            nBands: Int = 24,
                            multiProbe: Boolean = false): DataFrame = {
    import s.implicits._
    val e0 = Tables(s, dir, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
    val r = if (planesPerBand > 0) planesPerBand else autoPlanesPerBand(e0.count())
    bandedPairsCore(e0, threshold, r, nBands, 64, multiProbe)
  }

  /** The banded near-dup engine over ANY (vec_id, v: array<double>)
    * frame — text embeddings use it with dim 64, decoded media feature
    * vectors (`Multimodal.mediaNearDupPairs`) with dim 8. Band
    * projection, bucket self-join, exact-cosine verify on candidates.
    *
    * Vectors+norms feed the band projection and both verify joins;
    * checkpoint or the nBands×r-dot band subtree plans and runs per
    * consumer. The repartition pins parallelism BEFORE the checkpoint:
    * the corpus parquet is a single small file at test SF, and without
    * it the whole band self-join (the stage that emits the multi-
    * million-row candidate stream) inherits one partition and
    * serializes onto one task (measured 5.1s -> 0.6s at sf0.1).
    */
  private[graft] def bandedPairsCore(e0: DataFrame, threshold: Double,
                                     r: Int, nBands: Int, dim: Int,
                                     multiProbe: Boolean): DataFrame = {
    val s = e0.sparkSession
    import s.implicits._
    val e = e0.select($"vec_id", $"v")
      .withColumn("nrm", vectors.l2Norm($"v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint()
    // both join sides read the band frame — checkpoint it or the
    // nBands x r hyperplane-dot projection runs once per side
    val bands = bandedPlaneBuckets(e, r, nBands, dim).localCheckpoint()
    // split each bucket's pair emission G ways (r13, guide §2.5): the
    // (band, sig) self-join's INPUT is a few MB, so AQE coalesced it to
    // ONE partition — but the join is emission-bound (the hot buckets
    // emit millions of candidate rows), so the whole candidate stream
    // plus the distinct's partial aggregation ran on a single task
    // (event-log: a 2.6s one-task stage dominating the query, ~70% of
    // its wall time). Salting: the build side keeps one deterministic
    // grid cell g = vec_id mod G, the probe side explodes to all G
    // cells, the join keys on (band, sig, g) — every (a < b) pair still
    // appears exactly once (b's cell is unique), AQE can't starve the
    // emission because a single (band, sig) key is now G keys, and the
    // explicit keyed repartition is exempt from AQE coalescing.
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val emissionSplit = 8
    val xSide = withProbes(bands, r, multiProbe)
      .withColumn("g", explode(array((0 until emissionSplit).map(lit): _*)))
      .repartition(nPart, col("band"), col("sig"), col("g"))
    val ySide = bands
      .withColumn("g", pmod(col("vec_id"), lit(emissionSplit)).cast("int"))
      .repartition(nPart, col("band"), col("sig"), col("g"))
    // (measured dead end, r13: a SHUFFLE_HASH hint here to skip the
    // sort-merge sorts ran >10 minutes at 10x where SMJ takes ~60s —
    // the residual vec_id< filter over a hashed hot bucket degrades;
    // keep the sort-merge join.)
    val cand = xSide.alias("x")
      .join(ySide.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.g") === col("y.g") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      // pin the distinct's merge width too: candidate rows are 16 bytes,
      // so AQE's byte-based coalesce put the multi-million-row dedup
      // merge on ONE task (event-log: 3M records into a single
      // AQEShuffleRead). The keyed repartition satisfies the aggregate's
      // required distribution (no extra exchange) and is coalesce-exempt.
      .repartition(nPart, col("vec_a"), col("vec_b"))
      .distinct()
    cand
      .join(e.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("na")), Seq("vec_a"))
      .join(e.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nb")), Seq("vec_b"))
      .select($"vec_a", $"vec_b",
        round(vectors.dot($"va", $"vb") / ($"na" * $"nb"), 4).as("cos_sim"))
      .filter($"cos_sim" >= threshold)
      .orderBy($"vec_a", $"vec_b")
  }

  /** LSH recall audit in the [[annRecall]] style: every true pair (exact
    * cosine ≥ threshold) whose left end is one of the `nProbes` smallest
    * vec_ids is checked against the banded-LSH candidate set, aggregated
    * per similarity bucket — the acceptance gate that quantifies what
    * the bucket join trades for its bounded pair space, and shows the
    * LSH guarantee directly (recall rises with cosine). The exact side
    * is affordable at any scale because it is probe×corpus (a broadcast
    * of the probes against one scan), never corpus².
    */
  def embeddingLshRecall(s: SparkSession, dir: String, threshold: Double = 0.3,
                         planesPerBand: Int = AutoPlanes, nBands: Int = 24,
                         nProbes: Int = 100,
                         multiProbe: Boolean = false): DataFrame = {
    import s.implicits._
    val e0 = Tables(s, dir, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
    val r = if (planesPerBand > 0) planesPerBand else autoPlanesPerBand(e0.count())
    lshRecallCore(e0, threshold, r, nBands, 64, nProbes, multiProbe)
  }

  /** The recall-audit core over ANY (vec_id, v) frame — the acceptance
    * gate that quantifies what the bucket join trades for its bounded
    * pair space, per similarity bucket; media features audit through it
    * with dim 8 (`Multimodal.mediaLshRecall`). The exact side is
    * affordable at any scale because it is probe×corpus (a broadcast of
    * the probes against one scan), never corpus².
    *
    * NO checkpoint on the band frame here (unlike the pair generator):
    * the x side filters to the nProbes smallest vec_ids and Catalyst
    * pushes that filter below the band projection, so its "recompute"
    * costs ~nProbes vectors — cheaper than materializing the full
    * frame (measured 1.8s vs 0.6s at sf0.1 with the checkpoint).
    */
  private[graft] def lshRecallCore(e0: DataFrame, threshold: Double, r: Int,
                                   nBands: Int, dim: Int, nProbes: Int,
                                   multiProbe: Boolean): DataFrame = {
    val s = e0.sparkSession
    import s.implicits._
    // same parallelism pin as the pair generator (single-file corpus)
    val e = e0.select($"vec_id", $"v")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint()
    val probes = e.filter($"vec_id" < nProbes)
      .select($"vec_id".as("vec_a"), $"v".as("va"))
    val truth = e.alias("o").join(broadcast(probes), $"vec_a" < col("o.vec_id"))
      .select($"vec_a", col("o.vec_id").as("vec_b"),
        round(vectors.cosineSimilarity($"va", col("o.v")), 4).as("cos_sim"))
      .filter($"cos_sim" >= threshold)
    // audit the SAME band width the pair generator would use
    val bands = bandedPlaneBuckets(e, r, nBands, dim)
    val cand = withProbes(bands, r, multiProbe).alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id") && col("x.vec_id") < nProbes)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    truth.join(cand.withColumn("hit", lit(1)), Seq("vec_a", "vec_b"), "left")
      .groupBy(round($"cos_sim", 1).as("cos_bucket"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_caught"))
      .select($"cos_bucket", $"n_true", $"n_caught",
        round($"n_caught".cast("double") / $"n_true", 4).as("recall"))
      .orderBy($"cos_bucket")
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1]: first
    * 15 hex digits of md5("j:d") → 60-bit int → affine map. Pure public
    * arithmetic any SQL engine reproduces bit-for-bit — the planes are
    * engine-portable constants, not learned state.
    */
  private[graft] def planeComponent(j: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
  }

  /** ANN via sign-random-projection (hyperplane) LSH: nPlanes fixed
    * pseudo-random hyperplanes; a vector's bucket is the sign bitmask of
    * its dot products with them. Search touches only the query's bucket —
    * the corpus scan shrinks ~2^nPlanes-fold, and bucketing is a
    * scan-speed projection (planes ride along as literals; no shuffle
    * until the final top-k). The LSH twin of [[ivfTopK]]'s coarse
    * quantizer, with zero training.
    */
  def hyperplaneLshTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                        k: Int = 5, nPlanes: Int = 8): DataFrame = {
    import s.implicits._
    val dim = 64
    val bucket = (0 until nPlanes).map { j =>
      val plane = typedLit((0 until dim).map(d => planeComponent(j, d)))
      when(vectors.dot(col("v"), plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = embDouble(s, dir).withColumn("bucket", bucket)
    val q = sig.filter($"vec_id" === queryId)
      .select($"v".as("qv"), $"bucket".as("qb"))
    sig.join(broadcast(q), $"bucket" === $"qb")
      .filter($"vec_id" =!= queryId)
      .select($"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
  }

  /** Int8 scalar quantization of the embedding column — the compression
    * step before an ANN index ships to serving (4× smaller than float32).
    * Per vector: symmetric scale = max|v|/127, codes = round(v/scale),
    * reconstruction MSE via the same codegen'd dot product the search
    * paths use (error·error — bit-identical to the oracle's
    * list_dot_product). Stateless per-row projection: at 100 TB it runs
    * at scan speed with no shuffle at all.
    */
  def quantizationStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", vectors.toDoubleArray($"embedding").as("v"))
      .withColumn("scale", array_max(transform($"v", x => abs(x))) / 127.0)
      // zero vector → scale 0: codes are all-zero by definition, never 0/0
      .withColumn("q", transform($"v",
        x => when($"scale" === 0.0, 0.0).otherwise(round(x / $"scale"))))
      .withColumn("err", zip_with($"v", $"q", (x, qi) => x - qi * $"scale"))
      .select($"vec_id", $"label",
        array_max(transform($"q", x => abs(x))).cast("int").as("max_abs_q"),
        aggregate($"q", lit(0L), (acc, x) => acc + abs(x).cast("long")).as("sum_abs_q"),
        round(vectors.dot($"err", $"err") / size($"v") * 1e9, 4).as("mse_nano"))
      .orderBy($"vec_id")
  }

  /** IVF top-k: centroids = embeddings with vec_id < nlist (deterministic
    * "training" so the oracle can replicate); every vector assigned to its
    * max-cosine centroid; search restricted to the query's cell.
    */
  def ivfTopK(s: SparkSession, dir: String, queryId: Long = 0L,
              k: Int = 5, nlist: Int = 8): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val cents = e.filter($"vec_id" < nlist).select($"vec_id".as("cid"), $"v".as("cv"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    val assigned = e.join(broadcast(cents))
      .select($"vec_id", $"v", $"cid",
        vectors.cosineSimilarity($"v", $"cv").as("sim"))
      .withColumn("rn", row_number().over(byVec))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cid")
    val qCell = assigned.filter($"vec_id" === queryId)
      .select($"cid".as("qcid"), $"v".as("qv"))
    assigned.join(broadcast(qCell), $"cid" === $"qcid")
      .filter($"vec_id" =!= queryId)
      .select($"vec_id", $"cid",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
  }

  /** ANN recall audit: per query vector, how much of the exact cosine
    * top-k the IVF cell search recovers — the acceptance gate every
    * approximate index must pass before it replaces the exact path. The
    * brute side is affordable because it runs only for the `nQueries`
    * probes (each a broadcast against the scan), not all pairs; the IVF
    * side reuses the very assignment the index would serve. Same
    * determinism discipline as the search paths: ranks on the ROUNDED
    * similarity (4dp) then vec_id, so ulp drift cannot flip ranks.
    */
  def annRecall(s: SparkSession, dir: String, nQueries: Int = 20,
                k: Int = 5, nlist: Int = 8): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val cents = e.filter($"vec_id" < nlist).select($"vec_id".as("cid"), $"v".as("cv"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    // feeds the probe set AND the cell search — checkpoint or the
    // centroid-assignment join runs twice
    val assigned = e.join(broadcast(cents))
      .select($"vec_id", $"v", $"cid",
        vectors.cosineSimilarity($"v", $"cv").as("sim"))
      .withColumn("rn", row_number().over(byVec))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cid")
      .localCheckpoint()
    val queries = assigned.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"cid".as("qcid"))
    val byQuery = Window.partitionBy($"qid").orderBy($"cs".desc, $"vec_id")
    val brute = e.join(broadcast(queries.select($"qid", $"qv")))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cs"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    val ivf = assigned.join(broadcast(queries), $"cid" === $"qcid")
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cs"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    brute
      .join(ivf.select($"qid", $"vec_id", lit(1).as("hit")),
        Seq("qid", "vec_id"), "left")
      .groupBy($"qid".as("query_id"))
      .agg(count(lit(1)).as("n_brute"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_overlap"))
      .select($"query_id", $"n_brute", $"n_overlap",
        round($"n_overlap".cast("double") / $"n_brute", 4).as("recall"))
      .orderBy($"query_id")
  }

  /** Incremental embedding dedup probe: banded-LSH candidates between a
    * NEW vector batch and the already-indexed corpus — the embedding
    * twin of `Dedup.incrementalLshPairs`, and the query a continuously-
    * embedding pipeline runs per ingest (re-pairing the whole corpus per
    * batch is off the table at scale). Per-vector buckets are
    * independent of the rest of the corpus, so side-restricted band
    * frames equal the full band table filtered — which is what lets the
    * index side be the STORED bucketed table ([[writeEmbeddingBandIndex]]
    * via [[embeddingBandIndexFor]]), read shuffle-free on its (band,
    * sig) bucketing. Candidates are verified with the exact cosine, same
    * as the batch pair generator. Cost scales with the BATCH, never the
    * corpus.
    */
  def incrementalEmbeddingPairs(s: SparkSession, dir: String,
                                batchPred: Column = col("vec_id") % 4 === 3,
                                threshold: Double = 0.3,
                                planesPerBand: Int = AutoPlanes,
                                nBands: Int = 24): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
      .withColumn("nrm", vectors.l2Norm($"v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint()
    // band width sized to the INDEX side (the corpus) — the batch probes
    // whatever granularity the stored index was built with
    val r = if (planesPerBand > 0) planesPerBand else autoPlanesPerBand(e.count())
    val batchBands = bandedPlaneBuckets(e.filter(batchPred), r, nBands)
    val indexBands = embeddingBandIndexFor(s, dir, batchPred, r, nBands)
    val cand = batchBands.alias("n")
      .join(indexBands.alias("i"),
        col("n.band") === col("i.band") && col("n.sig") === col("i.sig"))
      .select(col("n.vec_id").as("new_vec"), col("i.vec_id").as("index_vec"))
      .distinct()
    cand
      .join(e.select($"vec_id".as("new_vec"), $"v".as("va"), $"nrm".as("na")), Seq("new_vec"))
      .join(e.select($"vec_id".as("index_vec"), $"v".as("vb"), $"nrm".as("nb")), Seq("index_vec"))
      .select($"new_vec", $"index_vec",
        round(vectors.dot($"va", $"vb") / ($"na" * $"nb"), 4).as("cos_sim"))
      .filter($"cos_sim" >= threshold)
      .orderBy($"new_vec", $"index_vec")
  }

  /** Persist the corpus-side embedding band table as a warehouse table
    * bucketed (and sorted) by the probe join's key (band, sig) — the
    * write-once index the incremental embedding probe reads without
    * shuffling. `planesPerBand` must be the width probes will use
    * ([[autoPlanesPerBand]] of the corpus size for the auto scheme);
    * the sign projection is deterministic, so index and probe agree on
    * the scheme by construction.
    */
  def writeEmbeddingBandIndex(s: SparkSession, dir: String, table: String,
                              indexPred: Column, planesPerBand: Int,
                              nBands: Int = 24, nBuckets: Int = 8): Unit = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
    bandedPlaneBuckets(e.filter(indexPred), planesPerBand, nBands)
      .write.mode("overwrite")
      .bucketBy(nBuckets, "band", "sig").sortBy("band", "sig")
      .saveAsTable(table)
  }

  /** Build-once memo for the stored embedding band index (the embedding
    * twin of `Dedup.bandIndexFor`): first use per (dir, scheme) writes
    * the bucketed table, later probes read it; the key carries a corpus
    * version stamp, so a regenerated corpus keys a fresh build.
    */
  private[graft] def embeddingBandIndexFor(s: SparkSession, dir: String,
                                           batchPred: Column, planesPerBand: Int,
                                           nBands: Int): DataFrame =
    embeddingBandIndexByPred(s, dir, !batchPred, planesPerBand, nBands)

  /** The same build-once memo keyed directly on the INDEX-side
    * predicate (for callers whose index side is not simply the batch's
    * complement — e.g. the decontamination screen indexes the train
    * split only, leaving the val slice out of both sides).
    */
  private[graft] def embeddingBandIndexByPred(s: SparkSession, dir: String,
                                              indexPred: Column, planesPerBand: Int,
                                              nBands: Int): DataFrame = {
    val key = Seq(dir, Dedup.corpusStamp(s, dir, "embeddings"),
      "ix:" + indexPred.toString, planesPerBand, nBands).mkString("|")
    val table = "graft_emb_index_" + java.security.MessageDigest
      .getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    Dedup.indexBuildLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        Dedup.dropStaleLocation(s, table)
        writeEmbeddingBandIndex(s, dir, table, indexPred, planesPerBand, nBands)
      }
    }
    s.table(table)
  }

  /** Hard-negative mining for contrastive training: per probe vector,
    * the k most-similar vectors carrying a DIFFERENT label — close to
    * the anchor in embedding space yet semantically distinct, which is
    * exactly what a contrastive objective wants its negatives to be
    * (random negatives are too easy to teach anything). Shape is the
    * [[annRecall]] probe pattern: the probe set broadcasts against one
    * corpus scan, ranks on the ROUNDED similarity then vec_id so ulp
    * drift cannot flip ranks, and only the per-probe top-k survives to
    * the shuffle. At scale the scan side is the ANN index's candidate
    * set instead of the full corpus — same query, smaller left side.
    */
  def hardNegatives(s: SparkSession, dir: String, nQueries: Int = 20,
                    k: Int = 3): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", vectors.toDoubleArray($"embedding").as("v"))
    val probes = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"label".as("qlabel"), $"v".as("qv"))
    val byQuery = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    e.join(broadcast(probes), $"label" =!= $"qlabel")
      .select($"query_id", $"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(byQuery))
      .filter($"rank" <= k)
      .orderBy($"query_id", $"rank")
  }

  /** Near-dup clusters over the embedding space: connected components of
    * the [[embeddingNearDupPairs]] graph, each vector labelled with its
    * cluster's canonical (minimum) vec_id — the embedding-side twin of
    * the text pipeline's `Dedup.dedupAssignments`, reusing the same
    * pointer-jumping CC loop (localCheckpoint-truncated lineage,
    * O(log d) rounds). Covers exactly the vectors that appear in ≥ 1
    * pair, matching the text convention.
    */
  def embeddingClusters(s: SparkSession, dir: String,
                        threshold: Double = 0.3): DataFrame =
    // shared (checkpointed) pairs: dedupClusters unions the pair frame
    // with its own flip before materializing edges, so an un-checkpointed
    // pair plan would run the banding + exact-cosine verify TWICE
    embeddingClusters(s, sharedEmbeddingPairs(s, dir, threshold))

  /** One banding+verify pass, materialized for fan-out — the embedding
    * twin of `Dedup.sharedLshPairs`: feed this to [[embeddingClusters]]
    * (and any other consumer of the near-dup graph) so the hyperplane
    * projection, bucket self-join, and exact-cosine verify run once, not
    * once per consumer.
    */
  def sharedEmbeddingPairs(s: SparkSession, dir: String,
                           threshold: Double = 0.3): DataFrame =
    embeddingNearDupPairs(s, dir, threshold)
      .select(col("vec_a"), col("vec_b")).localCheckpoint()

  /** Clustering over a precomputed near-dup pair frame (vec_a, vec_b) —
    * normally [[sharedEmbeddingPairs]].
    */
  def embeddingClusters(s: SparkSession, pairFrame: DataFrame): DataFrame = {
    import s.implicits._
    Dedup.dedupClusters(
        pairFrame.select($"vec_a".as("doc_a"), $"vec_b".as("doc_b")))
      .select($"doc_id".as("vec_id"), $"canon_id")
      .orderBy($"vec_id")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * scoped to k-means cells. Every vector is assigned to its
    * max-cosine centroid (the same deterministic broadcast argmax as
    * [[ivfTopK]], so the oracle replays it); within each cell a vector
    * is a semantic duplicate iff some LOWER-id cell-mate sits above the
    * cosine threshold — keep-lowest-id, the same canonical-survivor
    * convention as the text dedup. The in-cell pairwise compare is the
    * point of the clustering: O(Σ c²) instead of n², and at 100 TB
    * `nlist` scales with n (cells stay bounded-size), so the cell
    * self-join's shuffle is on `cid` with bounded per-key mass — never
    * an all-pairs. The assignment frame feeds both sides of that join
    * and is checkpointed so the argmax runs once.
    *
    * Output per vector: its cell, the max cosine to a lower-id
    * cell-mate (sentinel -9 for cell minima — no NULLs in the hash),
    * and the keep verdict.
    */
  /** Sentinel for "derive nlist from the corpus size". */
  val AutoNlist: Int = 0

  /** Cells sized like the LSH buckets: nlist grows with n so expected
    * cell occupancy stays ≤ `targetCell` (floor 8 keeps the oracle's
    * deterministic seed at the test SFs) — in-cell pair mass stays
    * ~linear in n instead of quadratic, the same fixed-granularity
    * failure [[autoPlanesPerBand]] guards the band join against.
    */
  private[graft] def autoNlist(n: Long, targetCell: Long = 250L): Int =
    math.max(8, math.ceil(math.max(n, 1L).toDouble / targetCell).toInt)

  def semDedup(s: SparkSession, dir: String, nlist: Int = AutoNlist,
               threshold: Double = 0.3): DataFrame = {
    import s.implicits._
    val e0 = embDouble(s, dir)
    val k = if (nlist == AutoNlist) autoNlist(e0.count()) else nlist
    val e = e0
    val cents = e.filter($"vec_id" < k).select($"vec_id".as("cid"), $"v".as("cv"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    val assigned = e.join(broadcast(cents))
      .select($"vec_id", $"v", $"cid",
        vectors.cosineSimilarity($"v", $"cv").as("sim"))
      .withColumn("rn", row_number().over(byVec))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cid")
      .localCheckpoint()
    val lowerSims = assigned
      .join(assigned.select($"vec_id".as("b_id"), $"v".as("bv"),
          $"cid".as("b_cid")),
        $"cid" === $"b_cid" && $"b_id" < $"vec_id")
      .select($"vec_id",
        round(vectors.cosineSimilarity($"v", $"bv"), 4).as("cs"))
      .groupBy($"vec_id").agg(max($"cs").as("mx"))
    assigned.join(lowerSims, Seq("vec_id"), "left")
      .select($"vec_id", $"cid".as("cluster_id"),
        coalesce($"mx", lit(-9.0)).as("max_sim_lower"),
        (coalesce($"mx", lit(-9.0)) < threshold).as("kept"))
      .orderBy($"vec_id")
  }

  /** Quantized-serving recall audit: the acceptance gate for shipping
    * the int8 index [[quantizationStats]] describes. Corpus vectors are
    * dequantized (`round(x/scale)·scale` — the values an int8 index
    * actually serves); queries stay float, as at serving time. Per
    * probe: exact-float top-k vs top-k over the reconstructed corpus,
    * overlap = the recall quantization costs. Ranks use the ROUNDED
    * (4dp) similarity then vec_id, the same ulp-proof discipline as
    * [[annRecall]]; the reconstruction frame feeds both rank joins and
    * is checkpointed so the scan + quantize runs once. Both sides are
    * broadcast-probe scans — no all-pairs, cost is nQueries × corpus
    * scan, embarrassingly parallel at any scale.
    */
  def quantizedRecall(s: SparkSession, dir: String, nQueries: Int = 20,
                      k: Int = 5): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val recon = e
      .withColumn("scale", array_max(transform($"v", x => abs(x))) / 127.0)
      // zero vector → scale 0: reconstruction is the zero vector itself
      .withColumn("rq", transform($"v",
        x => when($"scale" === 0.0, 0.0).otherwise(round(x / $"scale") * $"scale")))
      .select($"vec_id", $"v", $"rq")
      .localCheckpoint()
    val queries = recon.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    val byQuery = Window.partitionBy($"qid").orderBy($"cs".desc, $"vec_id")
    val exact = recon.join(broadcast(queries)).filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cs"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    val quant = recon.join(broadcast(queries)).filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(vectors.cosineSimilarity($"rq", $"qv"), 4).as("cs"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    exact
      .join(quant.select($"qid", $"vec_id", lit(1).as("hit")),
        Seq("qid", "vec_id"), "left")
      .groupBy($"qid".as("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_overlap"))
      .select($"query_id", $"n_exact", $"n_overlap",
        round($"n_overlap".cast("double") / $"n_exact", 4).as("recall"))
      .orderBy($"query_id")
  }

  /** Semantic decontamination: the embedding-space twin of
    * `TextOps.decontamination` — n-gram overlap misses paraphrased eval
    * leaks, so the held-out split is ALSO screened by nearest-neighbor
    * cosine against the train split. Splits ride the same deterministic
    * md5 buckets as `TextOps.hashSplit` (train <80, test ≥90). Per eval
    * vector: the argmax-cosine train vector (rank on the ROUNDED 4dp
    * similarity then vec_id — ulp-proof, as every search path here) and
    * the contamination verdict at `threshold`. The eval side is
    * benchmark-suite sized, so it broadcasts and the train corpus
    * streams through one scan — no shuffle of the big side, cost linear
    * in train size at any scale.
    */
  def semanticDecontamination(s: SparkSession, dir: String,
                              threshold: Double = 0.3): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
      .withColumn("bucket", TextOps.hashBucket($"vec_id", "split:"))
    val train = e.filter($"bucket" < 80).select($"vec_id", $"v")
    val eval_ = e.filter($"bucket" >= 90)
      .select($"vec_id".as("eval_id"), $"v".as("ev"))
    // argmax as max(struct(cs, -vec_id)): struct ordering is (cs DESC →
    // max cs, then max -id → MIN vec_id), identical to the rank-1 row of
    // a (cs DESC, vec_id) window — but the aggregate partial-combines
    // map-side, so the shuffle carries one row per eval probe instead of
    // the full eval×train score matrix (measured 8.6 s → sub-second at
    // the 10x size; a window would sort 34M scored rows)
    train.join(broadcast(eval_))
      .select($"eval_id",
        struct(round(vectors.cosineSimilarity($"v", $"ev"), 4).as("cs"),
          (-$"vec_id").as("nid")).as("sc"))
      .groupBy($"eval_id").agg(max($"sc").as("m"))
      .select($"eval_id", (-$"m.nid").as("train_id"), $"m.cs".as("cos_sim"),
        ($"m.cs" >= threshold).as("contaminated"))
      .orderBy($"eval_id")
  }

  /** Index-probing semantic decontamination — the 100 TB form of
    * [[semanticDecontamination]]. The brute screen scans the whole train
    * corpus per release of the eval suite; here the train split's band
    * table is the PERSISTED bucketed index ([[embeddingBandIndexByPred]],
    * read shuffle-free on its (band, sig) bucketing), eval probes band
    * in-row and equi-join it, and only band-collision survivors pay the
    * exact cosine — per-screen cost scales with the eval suite and its
    * candidate set, never the corpus. Recall is the band scheme's,
    * measured by [[embeddingLshRecall]]; an eval doc whose nearest train
    * neighbor the bands miss reports the best CANDIDATE (or the -9/-1
    * sentinel if none), which is the honest contract of an indexed
    * screen — and a flagged doc is always genuinely contaminated
    * (exact-verified), so flags are a subset of the brute screen's.
    */
  def semanticDecontaminationIndexed(s: SparkSession, dir: String,
                                     threshold: Double = 0.3,
                                     planesPerBand: Int = AutoPlanes,
                                     nBands: Int = 24): DataFrame = {
    import s.implicits._
    val bucket = TextOps.hashBucket(col("vec_id"), "split:")
    val e = embDouble(s, dir)
      .withColumn("bucket", bucket)
      .withColumn("nrm", vectors.l2Norm($"v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint()
    val trainPred = TextOps.hashBucket(col("vec_id"), "split:") < 80
    // band width sized to the INDEX side (the train corpus)
    val r = if (planesPerBand > 0) planesPerBand
            else autoPlanesPerBand(e.filter($"bucket" < 80).count())
    val evalBands = bandedPlaneBuckets(
      e.filter($"bucket" >= 90).select($"vec_id", $"v"), r, nBands)
    val indexBands = embeddingBandIndexByPred(s, dir, trainPred, r, nBands)
    val cand = evalBands.alias("p")
      .join(indexBands.alias("i"),
        col("p.band") === col("i.band") && col("p.sig") === col("i.sig"))
      .select(col("p.vec_id").as("eval_id"), col("i.vec_id").as("train_id"))
      .distinct()
    val best = cand
      .join(e.select($"vec_id".as("eval_id"), $"v".as("ev"), $"nrm".as("ne")),
        Seq("eval_id"))
      .join(e.select($"vec_id".as("train_id"), $"v".as("tv"), $"nrm".as("nt")),
        Seq("train_id"))
      .select($"eval_id",
        struct(round(vectors.dot($"ev", $"tv") / ($"ne" * $"nt"), 4).as("cs"),
          (-$"train_id").as("nid")).as("sc"))
      .groupBy($"eval_id").agg(max($"sc").as("m"))
    e.filter($"bucket" >= 90).select($"vec_id".as("eval_id"))
      .join(best, Seq("eval_id"), "left")
      .select($"eval_id",
        coalesce(-$"m.nid", lit(-1L)).as("train_id"),
        coalesce($"m.cs", lit(-9.0)).as("cos_sim"),
        coalesce($"m.cs" >= threshold, lit(false)).as("contaminated"))
      .orderBy($"eval_id")
  }

  /** One Lloyd iteration of k-means over the embeddings — the training
    * step that produces the IVF coarse quantizer ([[ivfTopK]] freezes
    * its centroids at the seed assignment; this moves them). Assignment
    * is the same broadcast argmax-cosine join as the index itself; the
    * update is a per-(cluster, dimension) mean via posexplode + one
    * map-side-combined groupBy — never a collect, never a per-cluster
    * array build, so a 10^10-vector corpus streams through.
    *
    * Member coordinates are accumulated in FIXED-POINT (×10^6 longs):
    * integer sums are associative, so the reduction is bit-reproducible
    * at any parallelism (and engine-portable — float partial-sum order
    * is neither). The returned summary (member count + updated-centroid
    * L2 norm) is what a training loop logs per iteration; iterating is
    * this same plan with `cents` swapped for the update (localCheckpoint
    * per round, per the connected-components lineage discipline).
    */
  /** Full Lloyd training loop for the IVF coarse quantizer — iterate
    * [[kmeansStep]]'s assign/update plan to convergence. The loop
    * carries the same discipline as `Dedup.dedupClusters`: each round's
    * centroid frame is checkpointed (flat lineage, constant per-round
    * planning; strategy-pluggable — pass
    * `Dedup.reliableCheckpointStrategy` on a real cluster so a lost
    * executor doesn't restart training), the convergence signal (max centroid L2
    * shift) rides the round's single action, and every assignment is a
    * broadcast join — the vector corpus is scanned once per round and
    * never shuffled. Fixed-point (×10^6 long) coordinate sums keep every
    * round bit-reproducible at any parallelism, so the trained index is
    * identical on 1 core or 1000 executors.
    *
    * Returns one row per centroid: member count, final centroid norm,
    * rounds used, and whether the loop converged below `tol` (spec
    * covers the loop; the single step stays oracle-checked as
    * q_kmeans_step).
    */
  def kmeansTrain(s: SparkSession, dir: String, nlist: Int = 8,
                  maxIters: Int = 10, tol: Double = 1e-4,
                  checkpoint: (DataFrame, Boolean) => DataFrame =
                    Dedup.localCheckpointStrategy): DataFrame = {
    import s.implicits._
    val e = checkpoint(embDouble(s, dir), true)
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    def step(cents: DataFrame): DataFrame = {
      val assigned = e.join(broadcast(cents))
        .select($"vec_id", $"v", $"cid",
          vectors.cosineSimilarity($"v", $"cv").as("sim"))
        .withColumn("rn", row_number().over(byVec))
        .filter($"rn" === 1)
        .select($"vec_id", $"v", $"cid")
      assigned
        .select($"cid", posexplode($"v").as(Seq("d", "x")))
        .select($"cid", $"d", round($"x" * 1e6).cast("long").as("xf"))
        .groupBy($"cid", $"d")
        .agg(sum($"xf").as("sx"), count(lit(1)).as("n"))
        .groupBy($"cid")
        .agg(max($"n").as("n_members"),
          array_sort(collect_list(struct($"d", ($"sx".cast("double") / $"n" / 1e6).as("m"))))
            .as("dm"))
        .select($"cid", $"n_members", transform($"dm", x => x("m")).as("cv"))
    }
    var cents = checkpoint(e.filter($"vec_id" < nlist)
      .select($"vec_id".as("cid"), lit(0L).as("n_members"), $"v".as("cv")),
      true)
    var shift = Double.MaxValue
    var i = 0
    while (shift > tol && i < maxIters) {
      val next = checkpoint(step(cents), false)
      // one action per round: the shift agg materializes the checkpoint
      shift = next
        .join(cents.select($"cid", $"cv".as("prev")), Seq("cid"), "left")
        .agg(max(vectors.l2Distance($"cv", coalesce($"prev", $"cv"))))
        .first().getDouble(0)
      cents = next
      i += 1
    }
    cents.select($"cid", $"n_members",
      round(vectors.l2Norm($"cv"), 4).as("centroid_norm"),
      lit(i).as("n_rounds"), lit(shift <= tol).as("converged"))
      .orderBy($"cid")
  }

  def kmeansStep(s: SparkSession, dir: String, nlist: Int = 8): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val cents = e.filter($"vec_id" < nlist).select($"vec_id".as("cid"), $"v".as("cv"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    val assigned = e.join(broadcast(cents))
      .select($"vec_id", $"v", $"cid",
        vectors.cosineSimilarity($"v", $"cv").as("sim"))
      .withColumn("rn", row_number().over(byVec))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cid")
    assigned
      .select($"cid", posexplode($"v").as(Seq("d", "x")))
      .select($"cid", $"d", round($"x" * 1e6).cast("long").as("xf"))
      .groupBy($"cid", $"d")
      .agg(sum($"xf").as("sx"), count(lit(1)).as("n"))
      .groupBy($"cid")
      .agg(max($"n").as("n_members"), // n identical across dims of a cluster
        round(sqrt(sum(pow($"sx".cast("double") / $"n" / 1e6, 2))), 4)
          .as("centroid_norm"))
      .orderBy($"cid")
  }

  // --- product quantization (ADC) ---------------------------------------

  /** Per-vector per-subspace sub-vectors: `(vec_id, j, sub)` with
    * j ∈ [0, m) and `sub` the j-th `subDim`-slice of the vector. The
    * subspace explode is row-local (no shuffle) and each output row
    * carries only its slice — at 100 TB the PQ pipeline never moves the
    * full vectors after this projection.
    */
  private[graft] def pqSubvecs(e: DataFrame, m: Int, subDim: Int): DataFrame =
    e.select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("j"),
        col("v"))
      .select(col("vec_id"), col("j"),
        slice(col("v"), col("j") * subDim + 1, lit(subDim)).as("sub"))

  /** Product-quantization code assignment: codebook = the sub-vectors of
    * `vec_id < ncodes` (the sampled-data codebook, deterministic like the
    * IVF centroids so the oracle can replicate), every vector's j-th
    * slice assigned to its nearest codeword by FIXED-POINT squared L2
    * ([[graft.functions.vectors.l2SqFixed]]) — integer distances, so the
    * argmin has no ulp-tiebreak risk in any engine. One broadcast join
    * against the m·ncodes codebook; cost linear in corpus size.
    */
  private[graft] def pqAssigned(s: SparkSession, e: DataFrame,
                                m: Int, subDim: Int, ncodes: Int): DataFrame = {
    import s.implicits._
    val sv = pqSubvecs(e, m, subDim)
    val cb = pqSubvecs(e.filter($"vec_id" < ncodes), m, subDim)
      .select($"vec_id".as("cid"), $"j", $"sub".as("cv"))
    val byVecJ = Window.partitionBy($"vec_id", $"j").orderBy($"d", $"cid")
    sv.join(broadcast(cb), Seq("j"))
      .select($"vec_id", $"j", $"cid",
        vectors.l2SqFixed($"sub", $"cv").as("d"))
      .withColumn("rn", row_number().over(byVecJ))
      .filter($"rn" === 1)
      .select($"vec_id", $"j", $"cid")
  }

  /** PQ ADC top-k: the memory-bounded ANN serving path — each vector is
    * stored as m codebook ids (here 8 bytes vs 512, a 64× compression),
    * and search computes one m·ncodes lookup table from the query's EXACT
    * sub-vectors (asymmetric distance, Jégou et al.'s ADC), then scores
    * every vector by m table lookups — no vector arithmetic per
    * candidate at all. At scale the codes table is the only thing
    * scanned; the LUT broadcasts. Distances are fixed-point longs end to
    * end, so ranking is integer-exact; `adc_l2` is the human-readable
    * root only.
    */
  def pqTopK(s: SparkSession, dir: String, queryId: Long = 0L,
             k: Int = 10, m: Int = 8, ncodes: Int = 16): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val subDim = 64 / m
    val assigned = pqAssigned(s, e, m, subDim, ncodes)
    val cb = pqSubvecs(e.filter($"vec_id" < ncodes), m, subDim)
      .select($"vec_id".as("cid"), $"j", $"sub".as("cv"))
    val lut = pqSubvecs(e.filter($"vec_id" === queryId), m, subDim)
      .select($"j", $"sub".as("qsub"))
      .join(cb, Seq("j"))
      .select($"j", $"cid", vectors.l2SqFixed($"qsub", $"cv").as("qd"))
    assigned.join(broadcast(lut), Seq("j", "cid"))
      .groupBy($"vec_id")
      .agg(sum($"qd").as("adc"))
      .filter($"vec_id" =!= queryId)
      .select($"vec_id", $"adc",
        round(sqrt($"adc".cast("double") / 1000000000000.0), 4).as("adc_l2"))
      .orderBy($"adc", $"vec_id")
      .limit(k)
  }

  /** Persist the PQ codes table `(vec_id, j, cid)` — the build-once
    * artifact ADC serving scans instead of re-assigning the corpus per
    * query. Bucketed AND sorted by vec_id: the serving aggregation
    * (Σ over a vector's m codes) groups on vec_id, so a bucketed scan
    * feeds it with NO exchange — the codes never shuffle at query time.
    */
  def writePqIndex(s: SparkSession, dir: String, table: String,
                   m: Int = 8, ncodes: Int = 16, nBuckets: Int = 8): Unit = {
    pqAssigned(s, embDouble(s, dir), m, 64 / m, ncodes)
      .write.mode("overwrite")
      .bucketBy(nBuckets, "vec_id").sortBy("vec_id", "j")
      .saveAsTable(table)
  }

  /** Build-once memo for the stored PQ codes (same contract as
    * [[embeddingBandIndexByPred]]: first use per (dir, corpus stamp,
    * scheme) writes the table, later probes read it).
    */
  private[graft] def pqIndexFor(s: SparkSession, dir: String,
                                m: Int, ncodes: Int): DataFrame = {
    val key = Seq(dir, Dedup.corpusStamp(s, dir, "embeddings"),
      "pq", m, ncodes).mkString("|")
    val table = "graft_pq_index_" + java.security.MessageDigest
      .getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    Dedup.indexBuildLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        Dedup.dropStaleLocation(s, table)
        writePqIndex(s, dir, table, m, ncodes)
      }
    }
    s.table(table)
  }

  /** [[pqTopK]] served from the STORED codes table ([[writePqIndex]]) —
    * identical output (one oracle pins both), different cost shape: per
    * query only the m·ncodes LUT is computed fresh; the corpus-sized
    * work (sub-vector explode, codebook assignment) happened once at
    * index build. The bucketed layout means the per-vector code
    * aggregation runs exchange-free on the stored bucketing.
    */
  def pqTopKIndexed(s: SparkSession, dir: String, queryId: Long = 0L,
                    k: Int = 10, m: Int = 8, ncodes: Int = 16): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val subDim = 64 / m
    val codes = pqIndexFor(s, dir, m, ncodes)
    val cb = pqSubvecs(e.filter($"vec_id" < ncodes), m, subDim)
      .select($"vec_id".as("cid"), $"j", $"sub".as("cv"))
    val lut = pqSubvecs(e.filter($"vec_id" === queryId), m, subDim)
      .select($"j", $"sub".as("qsub"))
      .join(cb, Seq("j"))
      .select($"j", $"cid", vectors.l2SqFixed($"qsub", $"cv").as("qd"))
    codes.join(broadcast(lut), Seq("j", "cid"))
      .groupBy($"vec_id")
      .agg(sum($"qd").as("adc"))
      .filter($"vec_id" =!= queryId)
      .select($"vec_id", $"adc",
        round(sqrt($"adc".cast("double") / 1000000000000.0), 4).as("adc_l2"))
      .orderBy($"adc", $"vec_id")
      .limit(k)
  }

  /** Dominant principal direction of the embedding corpus by POWER
    * ITERATION — distributed numerical linear algebra with the engine's
    * bit-exactness discipline: per round ONE scan computes t = Σᵢ xᵢ(xᵢ·v)
    * (the covariance-free matrix-vector product) with per-term 1e-6
    * fixed-pointing and order-free long sums; the driver holds only the
    * 64-component vector (the LR/kmeans loop contract), renormalizes it
    * against the EXACT integer Σt² and broadcasts it back as literals.
    * Every round is therefore hash-identical to a sequential replay —
    * which is what lets the oracle unroll the iterations in SQL. The
    * direction is the whitening/diagnostic axis (how much of the corpus
    * variance is one direction — anisotropy screening for embedding
    * spaces, Mu & Viswanath 2018).
    *
    * Init = the exact-binary constant vector 1/8 (‖v₀‖=1 at dim 64);
    * sign follows the init deterministically.
    */
  def powerIteration(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir).localCheckpoint()
    val (vu, norm2) = powerDirection(s, e, iters)
    // the oracle carries norm2 through a HUGEINT→BIGINT cast that ERRORS
    // on overflow; match that contract instead of silently wrapping
    require(norm2.isValidLong,
      s"powerIteration: exact norm² $norm2 exceeds Long range — " +
        "rescale the fixed-point unit before emitting norm2_p")
    val rows = (0 until 64).map { d =>
      (d + 1, vu(d), norm2.toLong)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1))
      .toDF("d", "v_u", "norm2_p")
      .select($"d".cast("int").as("d"), $"v_u", $"norm2_p")
      .orderBy($"d")
  }

  /** The power-iteration loop — ONE implementation of the numerically
    * delicate body (fixed-point matvec, HALF_UP renormalization to match
    * SQL round(); math.rint would half-even), shared by
    * [[powerIteration]] and [[anisotropyReport]]. Returns the direction
    * in micro-units plus the FINAL round's exact integer Σt².
    */
  private def powerDirection(s: SparkSession, e: DataFrame,
                             iters: Int): (Array[Long], BigInt) = {
    import s.implicits._
    var vu = Array.fill(64)(125000L) // v0 = 1/8 per dim: exact binary, unit norm
    var norm2: BigInt = null
    for (_ <- 1 to iters) {
      val vArr = array(vu.toSeq.map(u => lit(u.toDouble / 1e6)): _*)
      val t = e.select($"v", vectors.dot($"v", vArr).as("sc"))
        .select(posexplode($"v").as(Seq("d", "x")), $"sc")
        .groupBy($"d")
        .agg(sum(round($"x" * $"sc" * 1e6).cast("long")).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val td = (0 until 64).map(d => t.getOrElse(d, 0L)).toArray
      norm2 = td.map(x => BigInt(x) * BigInt(x)).sum
      val nrm = math.sqrt(norm2.toDouble)
      vu = td.map(x => BigDecimal(x / nrm * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    (vu, norm2)
  }

  /** Embedding-space anisotropy report (Mu & Viswanath 2018, "All but
    * the Top"): how much of the corpus MEAN vector — the non-zero
    * common direction that inflates every cosine — lies along the
    * dominant principal direction, and what remains after projecting it
    * out. One row: mean-vector norm, its projection onto the
    * [[powerIteration]] direction, and the residual norm — a large
    * norm collapsing to a small residual says one common direction
    * explains the offset, and subtracting it (the paper's postprocess)
    * would de-bias cosines corpus-wide. Mean components come from exact
    * integer sums; every norm/projection is fixed-pointed through
    * integer squared terms, so the single output row is hash-exact.
    */
  def anisotropyReport(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir).localCheckpoint()
    val n = e.count()
    val sums = e.select(posexplode($"v").as(Seq("d", "x")))
      .groupBy($"d").agg(sum(round($"x" * 1e6).cast("long")).as("sx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mu = (0 until 64).map(d => sums.getOrElse(d, 0L).toDouble / n / 1e6).toArray
    val (vu, _) = powerDirection(s, e, iters)
    val v = vu.map(_.toDouble / 1e6)
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def normU(a: Array[Double]): Long = {
      val sq = a.map(x => r0(x * x * 1e12)).sum
      r0(math.sqrt(sq.toDouble / 1e12) * 1e6)
    }
    val projTerms = (0 until 64).map(d => r0(mu(d) * v(d) * 1e12)).sum
    val proj = projTerms.toDouble / 1e12
    val res = (0 until 64).map(d => mu(d) - proj * v(d)).toArray
    val row = Seq((n, normU(mu), r0(math.abs(proj) * 1e6), normU(res)))
    s.createDataFrame(s.sparkContext.parallelize(row, 1))
      .toDF("n_vecs", "mu_norm_u", "proj_u", "res_norm_u")
  }

  /** Matryoshka-truncation recall audit (Kusupati et al. 2022, MRL):
    * per probe, how much of the FULL-dimension cosine top-k the first
    * `prefixDim` coordinates alone recover — the acceptance gate for
    * serving truncated embeddings (4× less memory and bandwidth per
    * vector) from an index that stores only prefixes. Same probe-bounded
    * shape and rounded-rank determinism as [[annRecall]]; the prefix is
    * a zero-cost `slice`, no re-embedding.
    *
    * (Synthetic-embedding caveat: these vectors are not MRL-trained, so
    * recall here measures how much signal the leading coordinates happen
    * to carry — the AUDIT is the operator; on real Matryoshka embeddings
    * the same query reads high and justifies the truncation.)
    */
  def matryoshkaRecall(s: SparkSession, dir: String, prefixDim: Int = 16,
                       nQueries: Int = 20, k: Int = 5): DataFrame = {
    import s.implicits._
    reducedRecallCore(embDouble(s, dir)
      .select($"vec_id", $"v", slice($"v", 1, prefixDim).as("p")),
      nQueries, k)
  }

  /** Top-k recall of a REDUCED representation `p` against the full
    * vector `v` — the audit core shared by [[matryoshkaRecall]] (prefix
    * slice) and [[jlRecall]] (random projection): per probe, how much of
    * the full-dim cosine top-k the reduced-space cosine top-k recovers.
    */
  private def reducedRecallCore(e0: DataFrame, nQueries: Int,
                                k: Int): DataFrame = {
    val s = e0.sparkSession
    import s.implicits._
    val e = e0.localCheckpoint() // probe set + both scored scans read it
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"p".as("qp"))
    val byQuery = Window.partitionBy($"qid").orderBy($"cs".desc, $"vec_id")
    val full = e.join(broadcast(queries.select($"qid", $"qv")))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 4).as("cs"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    val pref = e.join(broadcast(queries.select($"qid", $"qp")))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(vectors.cosineSimilarity($"p", $"qp"), 4).as("cs"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    full
      .join(pref.select($"qid", $"vec_id", lit(1).as("hit")),
        Seq("qid", "vec_id"), "left")
      .groupBy($"qid".as("query_id"))
      .agg(count(lit(1)).as("n_full"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_overlap"))
      .select($"query_id", $"n_full", $"n_overlap",
        round($"n_overlap".cast("double") / $"n_full", 4).as("recall"))
      .orderBy($"query_id")
  }

  /** Johnson-Lindenstrauss projection recall audit: how much of the
    * full-dimension cosine top-k survives a dense random projection to
    * `projDim` dimensions — the acceptance gate for serving projected
    * embeddings (JL: pairwise geometry is preserved to 1±ε with
    * projDim = O(ln n / ε²); this measures the actual ε the corpus
    * pays). Planes reuse the [[planeComponent]] md5 scheme, so the
    * projection matrix is reproducible anywhere with no stored artifact.
    *
    * Cross-engine exactness: each projected coordinate is a per-term
    * fixed-point integer sum — round(plane·v·10⁴) summed over dims — so
    * the projected vectors are integer-valued doubles whose cosine
    * dot/norm terms stay exactly representable (|coord| ≤ 6.4·10⁵ at
    * unit-norm inputs → squared sums < 2⁵³), making the rounded cosine
    * bit-identical in Spark and the SQL oracle.
    */
  /** The JL-projected corpus (vec_id, v, p) — the reduced frame
    * [[jlRecall]] audits; exposed for the spec's sequential replay.
    */
  private[graft] def jlProjection(s: SparkSession, dir: String,
                                  projDim: Int = 16): DataFrame = {
    import s.implicits._
    // relational projection: explode the vector once, join the projDim×64
    // plane matrix as a broadcast table, integer-sum the fixed-point
    // terms per (vec, j). A projDim×dim unrolled expression tree was
    // measured 2.5× slower (1024 round/element_at ops per row blow the
    // codegen budget); rows here are vecs × dim × projDim — tiny
    // relative to any corpus scan, and the sum order can't matter
    // because the terms are integers
    val pl = s.createDataFrame((0 until projDim).flatMap(j =>
        (0 until 64).map(d => (j, d + 1, planeComponent(j, d)))))
      .toDF("j", "d", "pc")
    val e = embDouble(s, dir).localCheckpoint() // projection + final join
    val proj = e
      .select($"vec_id", posexplode($"v").as(Seq("d0", "x")))
      .select($"vec_id", ($"d0" + 1).as("d"), $"x")
      .join(broadcast(pl), "d")
      .groupBy($"vec_id", $"j")
      .agg(sum(round($"pc" * $"x" * 1e4).cast("long")).as("yu"))
      .groupBy($"vec_id")
      .agg(sort_array(collect_list(struct($"j", $"yu"))).as("ys"))
      .select($"vec_id", transform($"ys", y => y("yu").cast("double")).as("p"))
    e.join(proj, "vec_id").select($"vec_id", $"v", $"p")
  }

  def jlRecall(s: SparkSession, dir: String, projDim: Int = 16,
               nQueries: Int = 20, k: Int = 5): DataFrame =
    reducedRecallCore(jlProjection(s, dir, projDim), nQueries, k)

  /** Embedding-space label cohesion audit (a silhouette-lite): per
    * label, the mean cosine of members to their OWN label centroid vs
    * the mean of each member's best cosine to any OTHER label centroid
    * — the one-screen answer to "are these labels real clusters in this
    * embedding space", read before trusting label-conditioned sampling
    * or hard-negative mining on a new embedding model. separation_t > 0
    * means members sit closer to home than to any rival centroid.
    *
    * Determinism: centroids from fixed-point 1e-6 integer sums (the
    * kmeans discipline) divided exactly once; per-vector cosines rounded
    * to 4dp then scaled to integer ten-thousandths; per-label means as
    * NON-NEGATIVE floor divisions ((sum + 10000·n) div n − 10000 — a
    * plain div would trunc toward zero in Spark and floor in SQL on
    * negative sums). Cost: one posexplode aggregation (labels×dims
    * keys) + one broadcast-centroid scan; nothing pairwise.
    */
  /** Per-(vector, label-centroid) rounded cosine frame shared by
    * [[labelSilhouette]] and [[labelSuspects]].
    */
  /** McNemar's paired test for embedding truncation: does keeping only
    * the first `keepDims` of 64 dimensions change nearest-centroid
    * label accuracy SIGNIFICANTLY, judged on the same vectors (the
    * matryoshka question asked with the statistically correct pairing
    * — two independent accuracy numbers waste it; McNemar tests only
    * the discordant cells b and c). Everything is integer: micro-fixed
    * vectors, truncating-division centroids both engines share, squared
    * L2 in exact longs (|x| ≤ 1 ⇒ per-dim diff² ≤ 4e12, ×64 dims far
    * below 2⁶³), argmin by min(struct) with smallest-label tie-break,
    * and χ² = (b−c)²/(b+c) as one truncating milli division (null when
    * no discordance — the honest undefined). One broadcast of ≤
    * |labels| centroid rows against one scan; the d_half distance
    * reuses the d_full row, so truncation costs no second pass.
    */
  def mcnemarTruncation(s: SparkSession, dir: String,
                        keepDims: Int = 32): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label".cast("long").as("label"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)" +
          " * 1000000) AS BIGINT))").as("vu"))
      .localCheckpoint() // centroid agg + the scoring scan both read it
    val cents = e
      .select($"label", posexplode($"vu").as(Seq("d", "xf")))
      .groupBy($"label", $"d")
      .agg(sum($"xf").as("sx"), count(lit(1)).as("n"))
      .withColumn("cu", expr("sx div n"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"d", $"cu"))).as("dm"))
      .select($"label".as("clabel"),
        transform($"dm", x => x("cu")).as("cu_arr"))
    def sqDist(vuE: String, cuE: String) =
      s"aggregate(zip_with($vuE, $cuE, (a, b) -> (a - b) * (a - b))," +
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    val cells = e.join(broadcast(cents))
      .withColumn("d_full", expr(sqDist("vu", "cu_arr")))
      .withColumn("d_half", expr(sqDist(s"slice(vu, 1, $keepDims)",
        s"slice(cu_arr, 1, $keepDims)")))
      .groupBy($"vec_id", $"label")
      .agg(min(struct($"d_full", $"clabel")).as("mf"),
        min(struct($"d_half", $"clabel")).as("mh"))
      .withColumn("ok_a", $"mf.clabel" === $"label")
      .withColumn("ok_b", $"mh.clabel" === $"label")
      .agg(
        sum(when($"ok_a" && $"ok_b", 1L).otherwise(0L))
          .as("n_both_right"),
        sum(when($"ok_a" && !$"ok_b", 1L).otherwise(0L)).as("n_only_a"),
        sum(when(!$"ok_a" && $"ok_b", 1L).otherwise(0L)).as("n_only_b"),
        sum(when(!$"ok_a" && !$"ok_b", 1L).otherwise(0L))
          .as("n_both_wrong"))
    cells
      .withColumn("n_vecs", $"n_both_right" + $"n_only_a" + $"n_only_b"
        + $"n_both_wrong")
      .withColumn("acc_full_bp",
        expr("(n_both_right + n_only_a) * 10000 div n_vecs"))
      .withColumn("acc_half_bp",
        expr("(n_both_right + n_only_b) * 10000 div n_vecs"))
      .withColumn("chi2_milli", expr(
        "(n_only_a - n_only_b) * (n_only_a - n_only_b) * 1000" +
        " div nullif(n_only_a + n_only_b, 0)"))
      .withColumn("significant_5pct",
        coalesce($"chi2_milli" > 3841L, lit(false)))
  }

  private def labelCentroidScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", vectors.toDoubleArray($"embedding").as("v"))
      .localCheckpoint() // centroid agg + scoring scan both read it
    val cents = e
      .select($"label", posexplode($"v").as(Seq("d", "x")))
      .select($"label", $"d", round($"x" * 1e6).cast("long").as("xf"))
      .groupBy($"label", $"d")
      .agg(sum($"xf").as("sx"), count(lit(1)).as("n"))
      .select($"label", $"d", ($"sx".cast("double") / $"n" / 1e6).as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"d", $"m"))).as("dm"))
      .select($"label".as("clabel"), transform($"dm", x => x("m")).as("cv"))
    e.join(broadcast(cents))
      .select($"vec_id", $"label", $"clabel",
        round(vectors.cosineSimilarity($"v", $"cv"), 4).as("cs"))
  }

  def labelSilhouette(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = labelCentroidScores(s, dir)
    val intra = scored.filter($"label" === $"clabel")
      .select($"vec_id", $"label",
        round($"cs" * 10000).cast("long").as("it"))
    val inter = scored.filter($"label" =!= $"clabel")
      .groupBy($"vec_id").agg(max($"cs").as("mx"))
      .select($"vec_id", round($"mx" * 10000).cast("long").as("xt"))
    intra.join(inter, "vec_id")
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"), sum($"it").as("si"), sum($"xt").as("sx"))
      .select($"label", $"n_vecs",
        expr("(si + 10000 * n_vecs) div n_vecs - 10000").as("mean_intra_t"),
        expr("(sx + 10000 * n_vecs) div n_vecs - 10000").as("mean_inter_t"),
        expr("((si + 10000 * n_vecs) div n_vecs) - ((sx + 10000 * n_vecs) div n_vecs)")
          .as("separation_t"))
      .orderBy($"label")
  }

  /** The trained per-label centroids as a driver-side artifact
    * (n_labels × dim doubles — the bounded-artifact contract): what the
    * streaming ingest gate (`Streams.labelSuspectGate`) folds into its
    * scan expressions.
    */
  def labelCentroids(s: SparkSession, dir: String): Map[Int, Array[Double]] = {
    import s.implicits._
    Tables(s, dir, "embeddings")
      .select($"label", posexplode(vectors.toDoubleArray($"embedding"))
        .as(Seq("d", "x")))
      .select($"label", $"d", round($"x" * 1e6).cast("long").as("xf"))
      .groupBy($"label", $"d")
      .agg(sum($"xf").as("sx"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (lbl, rows) =>
        val byD = rows.map(r => r.getInt(1) ->
          (r.getLong(2).toDouble / r.getLong(3) / 1e6)).toMap
        lbl -> Array.tabulate(byD.size)(d => byD(d))
      }
  }

  /** Label-noise screening (the confident-learning signal reduced to
    * centroids): vectors whose cosine to their OWN label centroid is
    * beaten by some RIVAL centroid — the embeddings most likely to be
    * mislabeled, ranked by the margin. Reuses [[labelSilhouette]]'s
    * scored frame; the rival is the argmax over other-label centroids
    * with (cs desc, label) determinism. Output is the review queue a
    * labeling pipeline consumes — at 100 TB still one broadcast-centroid
    * scan plus a per-vector window over ≤ n_labels rows.
    */
  def labelSuspects(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = labelCentroidScores(s, dir).localCheckpoint()
    val intra = scored.filter($"label" === $"clabel")
      .select($"vec_id", $"label",
        round($"cs" * 10000).cast("long").as("intra_t"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"cs".desc, $"clabel")
    val rival = scored.filter($"label" =!= $"clabel")
      .withColumn("rn", row_number().over(byVec)).filter($"rn" === 1)
      .select($"vec_id", $"clabel".as("rival_label"),
        round($"cs" * 10000).cast("long").as("rival_t"))
    intra.join(rival, "vec_id")
      .filter($"rival_t" > $"intra_t")
      .select($"vec_id", $"label", $"rival_label",
        $"intra_t", $"rival_t", ($"rival_t" - $"intra_t").as("margin_t"))
      .orderBy($"vec_id")
  }

  /** Persist the IVF cell assignment `(vec_id, v, cid)` PARTITIONED by
    * cell — the build-once coarse index. Cell routing at query time then
    * prunes the scan to ONE partition directory (nlist-way layout), so
    * serving cost is ~corpus/nlist rows read and zero shuffle: the
    * physical realization of what [[ivfTopK]] recomputes per query.
    */
  def writeIvfIndex(s: SparkSession, dir: String, table: String,
                    nlist: Int = 8): Unit = {
    import s.implicits._
    val e = embDouble(s, dir)
    val cents = e.filter($"vec_id" < nlist)
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    e.join(broadcast(cents))
      .select($"vec_id", $"v", $"cid",
        vectors.cosineSimilarity($"v", $"cv").as("sim"))
      .withColumn("rn", row_number().over(byVec))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cid")
      .write.mode("overwrite")
      .partitionBy("cid")
      .saveAsTable(table)
  }

  /** Build-once memo for the stored IVF cells (same contract as
    * [[pqIndexFor]]).
    */
  private[graft] def ivfIndexFor(s: SparkSession, dir: String,
                                 nlist: Int): DataFrame = {
    val key = Seq(dir, Dedup.corpusStamp(s, dir, "embeddings"),
      "ivf", nlist).mkString("|")
    val table = "graft_ivf_index_" + java.security.MessageDigest
      .getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    Dedup.indexBuildLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        Dedup.dropStaleLocation(s, table)
        writeIvfIndex(s, dir, table, nlist)
      }
    }
    s.table(table)
  }

  /** [[ivfTopK]] served from the STORED cell table ([[writeIvfIndex]]) —
    * identical output (one oracle pins both), serving-shaped cost: the
    * query's cell id comes from a 1-row index lookup (the probe-side
    * artifact, like the PQ LUT), and the candidate scan is then a
    * LITERAL-cid filter — static partition pruning reads one of nlist
    * directories, no join, no exchange anywhere in the plan (the spec
    * asserts both).
    */
  def ivfTopKIndexed(s: SparkSession, dir: String, queryId: Long = 0L,
                     k: Int = 5, nlist: Int = 8): DataFrame = {
    import s.implicits._
    val idx = ivfIndexFor(s, dir, nlist)
    val q = idx.filter($"vec_id" === queryId).select($"cid", $"v").head()
    // partition-column type inference may read cid back as int
    val qcid = q.get(0).asInstanceOf[Number].longValue
    val qArr = array(q.getSeq[Double](1).map(lit): _*)
    idx.filter($"cid" === qcid && $"vec_id" =!= queryId)
      .select($"vec_id", $"cid".cast("long").as("cid"),
        round(vectors.cosineSimilarity($"v", qArr), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
  }

  /** IVF-PQ top-k: the composed production index (Jégou et al.'s
    * IVFADC) — the coarse quantizer routes the query to its centroid
    * cell, and ONLY that cell's PQ codes are scored by ADC lookups. At
    * scale this is the shape every billion-vector serving system runs:
    * the codes table is 64× compressed AND the scan touches ~1/nlist of
    * it; both probe-side artifacts (cell id, LUT) broadcast. Cell
    * routing reuses [[ivfTopK]]'s deterministic sampled-centroid argmax;
    * in-cell scoring is [[pqTopK]]'s integer-exact ADC — so the
    * composition inherits both oracles' determinism.
    */
  def ivfPqTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                k: Int = 10, nlist: Int = 8, m: Int = 8,
                ncodes: Int = 16): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir).localCheckpoint()
    val subDim = 64 / m
    val cents = e.filter($"vec_id" < nlist)
      .select($"vec_id".as("ccid"), $"v".as("cv"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"ccid")
    val casg = e.join(broadcast(cents))
      .select($"vec_id", $"ccid",
        vectors.cosineSimilarity($"v", $"cv").as("sim"))
      .withColumn("rn", row_number().over(byVec)).filter($"rn" === 1)
      .select($"vec_id", $"ccid")
      .localCheckpoint()
    val codes = pqAssigned(s, e, m, subDim, ncodes)
    val cb = pqSubvecs(e.filter($"vec_id" < ncodes), m, subDim)
      .select($"vec_id".as("cid"), $"j", $"sub".as("cv"))
    val lut = pqSubvecs(e.filter($"vec_id" === queryId), m, subDim)
      .select($"j", $"sub".as("qsub"))
      .join(cb, Seq("j"))
      .select($"j", $"cid", vectors.l2SqFixed($"qsub", $"cv").as("qd"))
    val qcell = casg.filter($"vec_id" === queryId).select($"ccid".as("qcid"))
    val cell = casg.join(broadcast(qcell), $"ccid" === $"qcid")
      .select($"vec_id")
    codes.join(cell, Seq("vec_id"), "left_semi")
      .join(broadcast(lut), Seq("j", "cid"))
      .groupBy($"vec_id").agg(sum($"qd").as("adc"))
      .filter($"vec_id" =!= queryId)
      .select($"vec_id", $"adc",
        round(sqrt($"adc".cast("double") / 1000000000000.0), 4).as("adc_l2"))
      .orderBy($"adc", $"vec_id")
      .limit(k)
  }

  /** PQ recall audit: per probe query, the share of the EXACT fixed-point
    * L2 top-k that ADC search recovers — the acceptance gate before the
    * 64×-compressed codes replace full vectors in serving. The exact side
    * runs only for the probe set (broadcast against one corpus scan),
    * the ADC side only joins the codes table with each probe's LUT —
    * both linear in corpus size.
    */
  def pqRecall(s: SparkSession, dir: String, nQueries: Int = 20,
               k: Int = 5, m: Int = 8, ncodes: Int = 16): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir).localCheckpoint()
    val subDim = 64 / m
    val assigned = pqAssigned(s, e, m, subDim, ncodes).localCheckpoint()
    val cb = pqSubvecs(e.filter($"vec_id" < ncodes), m, subDim)
      .select($"vec_id".as("cid"), $"j", $"sub".as("cv"))
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    val lut = pqSubvecs(e.filter($"vec_id" < nQueries), m, subDim)
      .select($"vec_id".as("qid"), $"j", $"sub".as("qsub"))
      .join(cb, Seq("j"))
      .select($"qid", $"j", $"cid", vectors.l2SqFixed($"qsub", $"cv").as("qd"))
    val byQuery = Window.partitionBy($"qid").orderBy($"d", $"vec_id")
    val exact = e.join(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", vectors.l2SqFixed($"v", $"qv").as("d"))
      .withColumn("rn", row_number().over(byQuery))
      .filter($"rn" <= k)
    val byQueryAdc = Window.partitionBy($"qid").orderBy($"adc", $"vec_id")
    val adc = assigned.join(broadcast(lut), Seq("j", "cid"))
      .filter($"vec_id" =!= $"qid")
      .groupBy($"qid", $"vec_id")
      .agg(sum($"qd").as("adc"))
      .withColumn("rn", row_number().over(byQueryAdc))
      .filter($"rn" <= k)
    exact
      .join(adc.select($"qid", $"vec_id", lit(1).as("hit")),
        Seq("qid", "vec_id"), "left")
      .groupBy($"qid".as("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_overlap"))
      .select($"query_id", $"n_exact", $"n_overlap",
        round($"n_overlap".cast("double") / $"n_exact", 4).as("recall"))
      .orderBy($"query_id")
  }

  /** Maximal Marginal Relevance re-ranking — the diversity-aware final
    * stage of a retrieval pipeline: from each query's cosine top-`poolN`
    * pool, greedily pick `k` results maximizing
    * lambda*sim(q,d) - (1-lambda)*max_{d' selected} sim(d,d'), so the
    * second-best near-duplicate of the first pick loses to a fresh
    * region of the pool. lambda is fixed at 0.7 and enters as the
    * integer pair (7, 3): scores are exact longs in 1e-5 cosine units
    * (cs_u*10), so the greedy argmax and its vec_id tie-break are
    * deterministic on both engines — no float comparison anywhere in
    * the selection.
    *
    * Shape at scale: pool selection is the indexable part (swap the
    * brute scan for the IVF/LSH path — [[annRecall]] audits that
    * substitution); everything after operates on nQueries*poolN rows.
    * The greedy rounds are genuinely sequential (each pick changes the
    * penalty), so the loop runs k-1 tiny barrier stages over
    * per-query-parallel frames — checkpointed per round (lineage rule).
    */
  def mmrRerank(s: SparkSession, dir: String, nQueries: Int = 8,
                poolN: Int = 20, k: Int = 5): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    val byQ = Window.partitionBy($"qid").orderBy($"cs_u".desc, $"vec_id")
    val pool = e.join(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", $"v",
        round(vectors.cosineSimilarity($"v", $"qv") * 10000)
          .cast("long").as("cs_u"))
      .withColumn("rn", row_number().over(byQ))
      .filter($"rn" <= poolN)
      .select($"qid", $"vec_id", $"v", $"cs_u")
      .repartition(8, $"qid")
      .localCheckpoint()
    val pairs = pool.select($"qid", $"vec_id".as("a"), $"v".as("av"))
      .join(pool.select($"qid", $"vec_id".as("b"), $"v".as("bv")),
        Seq("qid"))
      .filter($"a" =!= $"b")
      .select($"qid", $"a", $"b",
        round(vectors.cosineSimilarity($"av", $"bv") * 10000)
          .cast("long").as("sim_u"))
      .localCheckpoint()
    val poolSlim = pool.select($"qid", $"vec_id", $"cs_u")
    var selected = poolSlim
      .withColumn("rn", row_number().over(byQ)).filter($"rn" === 1)
      .select($"qid", $"vec_id", lit(1).as("rank"), $"cs_u",
        (lit(7L) * $"cs_u").as("score_u"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val byScore = Window.partitionBy($"qid")
        .orderBy($"score_u".desc, $"vec_id")
      val pick = poolSlim
        .join(selected.select($"qid", $"vec_id"), Seq("qid", "vec_id"),
          "left_anti")
        .join(pairs.withColumnRenamed("a", "vec_id"),
          Seq("qid", "vec_id"))
        .join(selected.select($"qid", $"vec_id".as("b")), Seq("qid", "b"))
        .groupBy($"qid", $"vec_id")
        .agg(first($"cs_u").as("cs_u"), max($"sim_u").as("ms_u"))
        .select($"qid", $"vec_id", lit(r).as("rank"), $"cs_u",
          (lit(7L) * $"cs_u" - lit(3L) * $"ms_u").as("score_u"))
        .withColumn("rn", row_number().over(byScore))
        .filter($"rn" === 1).drop("rn")
      selected = selected.union(pick).localCheckpoint()
    }
    selected
      .select($"qid".as("query_id"), $"rank", $"vec_id", $"cs_u",
        $"score_u")
      .orderBy($"query_id", $"rank")
  }

  /** kNN label-agreement audit — the embedding-space label-noise screen
    * that needs no centroids: each vector's k exact nearest neighbors
    * vote, and a label whose members' neighborhoods disagree with them
    * is either noisy or not linearly separated (both worth knowing
    * before training on the labels). Complements [[labelSuspects]]
    * (centroid rivalry): kNN agreement sees multi-modal labels a single
    * centroid misrepresents. Emits per label: member count, mean
    * agreement in basis points, and how many members lose their own
    * neighborhood vote (agree < k/2) — the per-label noise shortlist
    * size.
    *
    * Determinism: neighbor ranks on 1e-4-quantized cosine with vec_id
    * tie-break; agreement counts are integers; the mean is an integer
    * floor-division.
    *
    * Shape at scale: candidates come from the banded sign-LSH bucket
    * join ([[bandedPlaneBuckets]], the same scheme every near-dup path
    * rides), so the pair space is bucket-bounded — never corpus², and
    * no corpus-sized broadcast anywhere. Each vector votes among its
    * COLLISION SURVIVORS' top-k (a vector with no collisions keeps
    * agree = 0 and counts as a suspect — isolation in LSH space is
    * itself a noise signal); [[knnBandedRecall]] audits what the
    * bucket join trades against brute-force kNN on probe vectors.
    */
  def knnLabelAgreement(s: SparkSession, dir: String, k: Int = 5,
                        planesPerBand: Int = AutoPlanes,
                        nBands: Int = 24): DataFrame = {
    import s.implicits._
    val e0 = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", vectors.toDoubleArray($"embedding").as("v"))
    val r = if (planesPerBand > 0) planesPerBand
            else autoPlanesPerBand(e0.count())
    val e = e0
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint() // band projection and both verify joins read it
    val bands = bandedPlaneBuckets(e, r, nBands, 64).localCheckpoint()
    // DIRECTED candidates (each vector ranks its own neighborhood) —
    // shuffle equi-join on (band, sig); no side is corpus-broadcast
    val cand = bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val byA = Window.partitionBy($"a").orderBy($"cs_u".desc, $"b")
    val voted = cand
      .join(e.select($"vec_id".as("a"), $"label".as("la"), $"v".as("av")),
        Seq("a"))
      .join(e.select($"vec_id".as("b"), $"label".as("lb"), $"v".as("bv")),
        Seq("b"))
      .select($"a", $"la", $"b", $"lb",
        round(vectors.cosineSimilarity($"av", $"bv") * 10000)
          .cast("long").as("cs_u"))
      .withColumn("rn", row_number().over(byA))
      .filter($"rn" <= k)
      .groupBy($"a")
      .agg(sum(when($"la" === $"lb", 1L).otherwise(0L)).as("agree"))
    // keep collision-free vectors (agree = 0) so n_vecs stays the label
    // member count — isolation reads as noise, not as absence
    val perVec = e.select($"vec_id".as("a"), $"label".as("la"))
      .join(voted, Seq("a"), "left")
      .select($"a", $"la", coalesce($"agree", lit(0L)).as("agree"))
    perVec.groupBy($"la".as("label"))
      .agg(count(lit(1)).as("n_vecs"), sum($"agree").as("sum_agree"),
        sum(when($"agree" * 2 < k, 1L).otherwise(0L)).as("n_suspect"))
      .select($"label", $"n_vecs",
        expr(s"sum_agree * 10000 div (n_vecs * $k)").as("agree_bp"),
        $"n_suspect")
      .orderBy($"label")
  }

  /** Recall audit for [[knnLabelAgreement]]'s banded candidate swap —
    * the [[annRecall]] pattern: for every probe vector (vec_id <
    * nProbes), compare its brute-force exact top-k (probe×corpus — a
    * bounded broadcast of PROBES, never the corpus) against the banded
    * collision survivors' top-k, and report overlap in basis points
    * plus how many probes lose their plurality-label vote under the
    * swap. This is the one-row acceptance gate that turns "LSH kNN is
    * close enough" from hope into data.
    */
  def knnBandedRecall(s: SparkSession, dir: String, k: Int = 5,
                      planesPerBand: Int = AutoPlanes, nBands: Int = 24,
                      nProbes: Int = 100): DataFrame = {
    import s.implicits._
    val e0 = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", vectors.toDoubleArray($"embedding").as("v"))
    val r = if (planesPerBand > 0) planesPerBand
            else autoPlanesPerBand(e0.count())
    val e = e0
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint() // probes, brute scan, and band projection read it
    val probes = e.filter($"vec_id" < nProbes)
      .select($"vec_id".as("a"), $"label".as("la"), $"v".as("av"))
    val byA = Window.partitionBy($"a").orderBy($"cs_u".desc, $"b")
    // exact side: probe×corpus via broadcast of the PROBES (bounded by
    // nProbes at any corpus size — the affordable brute force)
    val exact = e.select($"vec_id".as("b"), $"label".as("lb"), $"v".as("bv"))
      .join(broadcast(probes), $"a" =!= $"b")
      .select($"a", $"la", $"b", $"lb",
        round(vectors.cosineSimilarity($"av", $"bv") * 10000)
          .cast("long").as("cs_u"))
      .withColumn("rn", row_number().over(byA))
      .filter($"rn" <= k)
      .localCheckpoint() // overlap join and exact-vote agg both read it
    // banded side: the same collision candidates knnLabelAgreement ranks
    val bands = bandedPlaneBuckets(e, r, nBands, 64).localCheckpoint()
    val banded = bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") =!= col("y.vec_id") &&
          col("x.vec_id") < nProbes)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
      .join(e.select($"vec_id".as("a"), $"label".as("la"), $"v".as("av")),
        Seq("a"))
      .join(e.select($"vec_id".as("b"), $"label".as("lb"), $"v".as("bv")),
        Seq("b"))
      .select($"a", $"la", $"b", $"lb",
        round(vectors.cosineSimilarity($"av", $"bv") * 10000)
          .cast("long").as("cs_u"))
      .withColumn("rn", row_number().over(byA))
      .filter($"rn" <= k)
      .localCheckpoint()
    val overlap = exact.select($"a", $"b")
      .join(banded.select($"a", $"b"), Seq("a", "b"))
      .groupBy($"a").agg(count(lit(1)).as("hits"))
    def votes(df: DataFrame, name: String) = df
      .groupBy($"a")
      .agg(sum(when($"la" === $"lb", 1L).otherwise(0L)).as(name))
    probes.select($"a")
      .join(overlap, Seq("a"), "left")
      .join(votes(exact, "agree_exact"), Seq("a"), "left")
      .join(votes(banded, "agree_banded"), Seq("a"), "left")
      .select($"a", coalesce($"hits", lit(0L)).as("hits"),
        coalesce($"agree_exact", lit(0L)).as("ae"),
        coalesce($"agree_banded", lit(0L)).as("ab"))
      .agg(count(lit(1)).as("n_probes"),
        sum($"hits").as("nn_hits"),
        expr(s"sum(hits) * 10000 div (count(1) * $k)").as("recall_bp"),
        sum(when($"hits" === k, 1L).otherwise(0L)).as("n_probes_full"),
        sum(when(($"ae" * 2 < k) =!= ($"ab" * 2 < k), 1L).otherwise(0L))
          .as("n_vote_flips"))
  }

  /** Margin-criterion bitext mining — the ratio test parallel-corpus
    * miners use instead of a raw cosine threshold: a candidate pair
    * (x, y) scores cos(x,y) divided by the mean of each side's top-k
    * neighborhood similarity, so a "hubby" vector that is close to
    * everything (high absolute cosine to half the corpus) stops winning
    * and only pairs that stand OUT of both local neighborhoods survive.
    * The two "languages" are the even/odd vec_id halves; candidates are
    * the forward top-k of each x.
    *
    * Determinism: similarities quantize to 1e-4 longs; the margin is
    * the pure-integer basis-point ratio 2k*cs_u*10^4 div (sumk_x +
    * sumk_y), and both engines filter cs_u > 0 and a positive
    * denominator first, so integer division never sees a negative
    * operand (where div/floor-div semantics would diverge).
    *
    * Shape at scale: the candidate set is the cross-half slice of the
    * banded sign-LSH bucket join ([[bandedPlaneBuckets]] — the
    * [[incrementalEmbeddingPairs]] shape with parity instead of
    * batch/index), so the pair space is bucket-bounded, never
    * |A|×|B|, and no corpus-sized broadcast anywhere. Neighborhood
    * sums are top-k AMONG COLLISION SURVIVORS — the neighborhoods an
    * ANN-served miner actually sees; the margin arithmetic is
    * unchanged.
    *
    * Margin saturation on dup-dense corpora is DESIGNED behavior, not
    * a recall bug: in a corpus where most vectors have many near-twins
    * (the 10× stress dir duplicates every embedding several times),
    * every neighborhood's top-k sum inflates toward the pair's own
    * similarity, the ratio 2k·cs/(Σx+Σy) approaches 1 for ALL pairs,
    * and nothing clears the 1.02 margin — the criterion is correctly
    * reporting that no pair stands OUT of its neighborhood. Mining
    * yield returns the moment the corpus has distinguished pairs.
    *
    * Pipelines that already materialized the cross-half candidate
    * similarities (e.g. to share one banding pass across several
    * consumers — the [[sharedEmbeddingPairs]] discipline) should call
    * the [[bitextMine(s:org\.apache\.spark\.sql\.SparkSession,sims:org\.apache\.spark\.sql\.DataFrame,k:Int,marginBp:Long)*]]
    * overload with [[sharedCrossHalfSims]]' output; this entry builds
    * that frame once (checkpointed — the margin windows and verify
    * joins never re-band) and delegates.
    */
  def bitextMine(s: SparkSession, dir: String, k: Int = 4,
                 marginBp: Long = 10200L,
                 planesPerBand: Int = AutoPlanes,
                 nBands: Int = 24): DataFrame =
    bitextMine(s, sharedCrossHalfSims(s, dir, planesPerBand, nBands),
      k, marginBp)

  /** One cross-half collision + exact-cosine pass, materialized for
    * fan-out: (x, y, cs_u) for every even/odd bucket collision, cosine
    * quantized to 1e-4 longs. Checkpointed so every consumer (the
    * mining margin windows, recall audits, diagnostics) reads the
    * single materialized frame instead of re-running the collision and
    * verify joins.
    *
    * Collision source: the two STORED band indexes (even half, odd
    * half), both bucketed by (band, sig) via [[embeddingBandIndexByPred]]
    * — so after the write-once build, the collision join reads both
    * sides shuffle-free on their bucketing (no band re-projection, no
    * exchange; BucketingSpec pins the no-exchange shape). Banding is
    * deterministic per vector, so the stored side-restricted tables
    * equal the fresh band frame filtered — candidates are bit-identical
    * to the previous in-query banding.
    */
  def sharedCrossHalfSims(s: SparkSession, dir: String,
                          planesPerBand: Int = AutoPlanes,
                          nBands: Int = 24): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, $"vec_id")
      .localCheckpoint() // both verify joins read it
    // corpus size off the materialized checkpoint — no second scan
    val r = if (planesPerBand > 0) planesPerBand
            else autoPlanesPerBand(e.count())
    val evenBands = embeddingBandIndexByPred(s, dir, $"vec_id" % 2 === 0,
      r, nBands)
    val oddBands = embeddingBandIndexByPred(s, dir, $"vec_id" % 2 === 1,
      r, nBands)
    val cand = evenBands.alias("bx")
      .join(oddBands.alias("by"),
        col("bx.band") === col("by.band") && col("bx.sig") === col("by.sig"))
      .select(col("bx.vec_id").as("x"), col("by.vec_id").as("y"))
      // pin the dedup + verify width (r13, the bandedPairsCore rule):
      // 1.4M candidate rows are ~16 bytes each, so AQE's byte-based
      // coalesce ran the distinct merge AND both cosine-verify joins on
      // ONE task (event-log: 1.4M records into a single-task stage,
      // 1.2–1.8s per run). The keyed repartition is coalesce-exempt and
      // the aggregate reuses its distribution.
      .repartition(
        s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("x"), col("y"))
      .distinct()
    cand
      .join(e.select($"vec_id".as("x"), $"v".as("xv")), Seq("x"))
      .join(e.select($"vec_id".as("y"), $"v".as("yv")), Seq("y"))
      .select($"x", $"y",
        round(vectors.cosineSimilarity($"xv", $"yv") * 10000)
          .cast("long").as("cs_u"))
      .localCheckpoint()
  }

  /** Margin mining over a precomputed candidate-similarity frame
    * (x, y, cs_u) — normally [[sharedCrossHalfSims]]' output.
    */
  def bitextMine(s: SparkSession, sims: DataFrame, k: Int,
                 marginBp: Long): DataFrame = {
    import s.implicits._
    val byX = Window.partitionBy($"x").orderBy($"cs_u".desc, $"y")
    val byY = Window.partitionBy($"y").orderBy($"cs_u".desc, $"x")
    // NOT checkpointed despite two consumers (the neighborhood rollup
    // and the final margin select): the byX exchange is reused between
    // them, and a measured checkpoint here cost +1.5s (barrier +
    // materialization) instead of saving a window pass
    val fwd = sims.withColumn("rn", row_number().over(byX))
      .filter($"rn" <= k)
    val sax = fwd.groupBy($"x").agg(sum($"cs_u").as("sax_u"))
    val say = sims.withColumn("rn", row_number().over(byY))
      .filter($"rn" <= k)
      .groupBy($"y").agg(sum($"cs_u").as("say_u"))
    // sax/say are per-vector (corpus-sized): plain shuffle joins — AQE
    // may still broadcast at small SF, but nothing FORCES a corpus
    // broadcast at scale
    fwd.select($"x", $"y", $"rn".as("fwd_rank"), $"cs_u")
      .filter($"cs_u" > 0)
      .join(sax, Seq("x"))
      .join(say, Seq("y"))
      .filter($"sax_u" + $"say_u" > 0)
      .withColumn("margin_bp",
        expr(s"(2 * $k * cs_u * 10000) div (sax_u + say_u)"))
      .filter($"margin_bp" >= marginBp)
      .select($"x".as("x_id"), $"y".as("y_id"), $"fwd_rank", $"cs_u",
        $"margin_bp")
      .orderBy($"x_id", $"y_id")
  }

  /** Greedy k-center seeding (Gonzalez 1985 farthest-point traversal):
    * k maximally spread vectors, each round picking the point farthest
    * from the current set — the 2-approximation for the k-center
    * objective and the standard diversity seeding for kmeans++-style
    * init, eval panels, and coreset starts (the embedding-space
    * complement of [[graft.operators.TextOps.coverageSelect]]'s n-gram
    * coverage greedy). Distances are [[graft.functions.vectors.l2SqFixed]]
    * integers, so the argmax and the `least` relaxation have no
    * ulp-tiebreak risk in any engine; each round relaxes the
    * checkpointed per-point min-distance frame with ONE broadcast
    * center and sends exactly one winner row to the driver. `picked_d`
    * is the chosen point's distance at selection time (= the coverage
    * radius of the previous set); `radius_after` is the k-center
    * objective after adding it — the spec pins both against the
    * textbook sequential traversal.
    */
  def kCenterSeeds(s: SparkSession, dir: String, k: Int = 6): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir).localCheckpoint()
    def relaxWith(minD: DataFrame, centerId: Long): DataFrame = {
      val cv = e.filter($"vec_id" === centerId).select($"v".as("cv"))
      minD.crossJoin(broadcast(cv))
        .select($"vec_id", $"v",
          least($"md", vectors.l2SqFixed($"v", $"cv")).as("md"))
        .localCheckpoint()
    }
    val seed = e.crossJoin(broadcast(
        e.filter($"vec_id" === 0L).select($"v".as("cv"))))
      .select($"vec_id", $"v", vectors.l2SqFixed($"v", $"cv").as("md"))
      .localCheckpoint()
    var minD = seed
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    picks += ((1, 0L, 0L, minD.agg(max($"md")).head().getLong(0)))
    for (r <- 2 to k) {
      val win = minD.select($"vec_id", $"md")
        .orderBy($"md".desc, $"vec_id").limit(1).collect()(0)
      val (wid, wd) = (win.getLong(0), win.getLong(1))
      minD = relaxWith(minD, wid)
      picks += ((r, wid, wd, minD.agg(max($"md")).head().getLong(0)))
    }
    picks.toSeq.toDF("round", "vec_id", "picked_d", "radius_after")
      .orderBy($"round")
  }

  /** KNN-Shapley data valuation (Jia et al. 2019's exact closed form):
    * for each test-split probe, EVERY training vector's Shapley value
    * for the K-NN label-agreement utility, via the suffix recursion
    * s₍N₎ = 1[y₍N₎=y]/N, s₍i₎ = s₍i₎₊₁ + (1[yᵢ=y] − 1[yᵢ₊₁=y])·
    * min(K,i)/(K·i) — the data-pricing operator ("which training docs
    * actually help predictions") that Monte-Carlo Shapley pays
    * thousands of utility evaluations for, here exact in ONE ranked
    * pass per probe. Fixed-point micro terms with TRUNCATING division
    * (numerators are genuinely negative when a wrong-label vector
    * displaces a right-label one; Spark `div` and DuckDB `//` both
    * truncate, so the drift-free convention is trunc, not floor);
    * the suffix sum is one descending-rank window. Output: top-25
    * training vectors by summed value across probes. Scale: the pair
    * frame is probes×train (probe-bounded, never corpus²), ranked by
    * a per-probe window — the annRecall shape.
    */
  def knnShapley(s: SparkSession, dir: String, k: Int = 5,
                 nProbes: Int = 40, topN: Int = 25): DataFrame = {
    import s.implicits._
    val eb = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", vectors.toDoubleArray($"embedding").as("v"))
      .withColumn("bucket", TextOps.hashBucketMod($"vec_id", "split:", 100L))
      .localCheckpoint() // probe and train sides both read it
    val probes = eb.filter($"bucket" >= 90).orderBy($"vec_id").limit(nProbes)
      .select($"vec_id".as("a"), $"label".as("la"), $"v".as("av"))
    val train = eb.filter($"bucket" < 90)
      .select($"vec_id".as("b"), $"label".as("lb"), $"v".as("bv"))
    val nTrain = train.count()
    val byA = Window.partitionBy($"a").orderBy($"cs_u".desc, $"b")
    val asc = Window.partitionBy($"a").orderBy($"rk")
    val suffix = Window.partitionBy($"a").orderBy($"rk".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = train.join(broadcast(probes))
      .select($"a", $"la", $"b", $"lb",
        round(vectors.cosineSimilarity($"av", $"bv") * 10000)
          .cast("long").as("cs_u"))
      .withColumn("rk", row_number().over(byA).cast("long"))
      .withColumn("ind", when($"la" === $"lb", 1L).otherwise(0L))
      .withColumn("ind_next", lead($"ind", 1).over(asc))
      .withColumn("term_u",
        when($"rk" === lit(nTrain), expr(s"1000000 * ind div $nTrain"))
          .otherwise(expr(
            s"(ind - ind_next) * 1000000 * least($k, rk) div ($k * rk)")))
      .withColumn("s_u", sum($"term_u").over(suffix))
    ranked.groupBy($"b", $"lb")
      .agg(count(lit(1)).as("n_probes"), sum($"s_u").as("sum_s_u"))
      .orderBy($"sum_s_u".desc, $"b").limit(topN)
      .withColumn("rank", row_number()
        .over(Window.orderBy($"sum_s_u".desc, $"b")).cast("int"))
      .select($"rank", $"b".as("vec_id"), $"lb".as("label"),
        $"n_probes", $"sum_s_u")
      .orderBy($"rank")
  }

  /** Per-label embedding centroid shift — how far each label's mean
    * vector sits from the corpus mean, the one-number-per-slice audit
    * for "is this subpopulation embedded somewhere else" (a large
    * shift on a source/label slice predicts that classifiers and ANN
    * recall behave differently there; near-zero shifts mean the slice
    * is interchangeable with the corpus). Exactness: components
    * quantize to 1e-6 longs BEFORE any aggregation (integer sums are
    * order-free where float means are not), centroids are floor
    * divisions, the shift is the integer L2² of centroid deltas plus
    * one IEEE sqrt+floor — every step engine-identical. Scale: one
    * fan-out of (label, dim, x_u) into a map-side-combined groupBy on
    * ≤ |labels|·dim keys; the GLOBAL centroid derives from the label
    * rollup (one corpus scan total, no second pass); everything after
    * is |labels|·dim-bounded.
    */
  def labelCentroidShift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byLabel = Tables(s, dir, "embeddings")
      .select($"label",
        posexplode(vectors.toDoubleArray($"embedding")).as(Seq("d", "x")))
      .select($"label", $"d", round($"x" * 1e6).cast("long").as("xu"))
      .groupBy($"label", $"d")
      .agg(sum($"xu").as("sx"), count(lit(1)).as("n"))
      .localCheckpoint() // global rollup + join side both read it
    val global = byLabel.groupBy($"d")
      .agg(sum($"sx").as("gx"), sum($"n").as("gn"))
    byLabel.join(global, Seq("d"))
      .withColumn("dd", expr("sx div n - gx div gn"))
      .groupBy($"label")
      .agg(max($"n").as("n_vecs"),
        sum($"dd" * $"dd").as("dist_sq_u2")) // ≤ dim·(2e6)² ≪ 2⁶³
      .select($"label", $"n_vecs", $"dist_sq_u2",
        floor(sqrt($"dist_sq_u2".cast("double"))).cast("long").as("shift_u"))
      .orderBy($"label")
  }
}
