package graft.functions.aggregates

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the typed aggregators' core claims — the ones the
  * oracle checks rely on. Both are exercised as pure reduce/merge folds
  * over randomized streams AND randomized partition splits, because
  * "deterministic at any parallelism" is exactly a statement about
  * arbitrary merge trees, which example-based specs can't sweep.
  */
class AggregatorPropertySpec extends AnyFunSuite {

  private def passes(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  /** Random stream + random cut points -> partials reduced per slice,
    * merged left-to-right (merge trees reduce to this by associativity
    * of the claim under test).
    */
  private def foldPartitioned[B, A](zero: B, xs: List[A], cuts: List[Int],
                                    reduce: (B, A) => B,
                                    merge: (B, B) => B): B = {
    val bounded = cuts.map(c => math.abs(c % (xs.size + 1))).distinct.sorted
    val slices = (0 +: bounded :+ xs.size).distinct.sorted
      .sliding(2).collect { case Seq(a, b) if b > a => xs.slice(a, b) }
    slices.map(_.foldLeft(zero)(reduce)).foldLeft(zero)(merge)
  }

  test("BottomK: any partitioning yields the global k smallest, in order") {
    val gen = for {
      k <- Gen.choose(1, 8)
      xs <- Gen.listOf(Gen.zip(Gen.alphaStr.map(_.take(6)), Gen.choose(0L, 50L)))
      cuts <- Gen.listOf(Gen.choose(0, 1000))
    } yield (k, xs, cuts)
    passes(Prop.forAll(gen) { case (k, xs, cuts) =>
      val agg = new BottomK(k)
      val got = agg.finish(
        foldPartitioned(agg.zero, xs, cuts, agg.reduce, agg.merge))
      got == xs.sorted.take(k) // duplicates kept: they are distinct picks
    })
  }

  test("SpaceSavingTopK: counts bracket truth within floor(N/capacity) per merge tree") {
    val gen = for {
      cap <- Gen.choose(2, 10)
      xs <- Gen.listOf(Gen.choose(0, 15).map(i => s"k$i"))
      cuts <- Gen.listOf(Gen.choose(0, 1000))
    } yield (cap, xs, cuts)
    passes(Prop.forAll(gen) { case (cap, xs, cuts) =>
      val agg = new SpaceSavingTopK(cap, cap)
      val got = agg.finish(
        foldPartitioned(agg.zero, xs, cuts, agg.reduce, agg.merge)).toMap
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      val sizeOk = got.size == math.min(cap.toLong, truth.size.toLong)
      // the audit's claim (TextOps.topkAudit): overestimate bounded by
      // floor(N/capacity); the lower side is not claimed under merges
      val boundOk = got.forall { case (key, c) =>
        c <= truth.getOrElse(key, 0L) + n / cap
      }
      sizeOk && boundOk
    })
  }

  test("SpaceSavingTopK: exact when capacity covers the vocabulary") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(0, 7).map(i => s"k$i"))
      cuts <- Gen.listOf(Gen.choose(0, 1000))
    } yield (xs, cuts)
    passes(Prop.forAll(gen) { case (xs, cuts) =>
      val agg = new SpaceSavingTopK(16, 16)
      val got = agg.finish(
        foldPartitioned(agg.zero, xs, cuts, agg.reduce, agg.merge)).toMap
      got == xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    })
  }
}
