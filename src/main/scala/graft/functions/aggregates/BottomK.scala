package graft.functions.aggregates

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact fixed-size group sample: the k elements with the smallest
  * (priority, id) per group, as a typed mergeable `Aggregator`. With an
  * id-hash priority this is deterministic uniform sampling-without-
  * replacement ("bottom-k sketch") — the standard way to draw EXACTLY k
  * per group reproducibly, where a keep-rate filter
  * (`TextOps.stratifiedSample`) only controls the expected size.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY priority)`? The
  * window shuffles and sorts EVERY row of every group; this aggregator
  * carries at most k entries per (partition, group) into the shuffle —
  * the same partial-aggregation shape as a map-side combined count. At
  * 100 TB with million-row groups the window moves the corpus; this
  * moves k rows per group per partition. State is bounded at k pairs
  * regardless of group size, and min-k selection is associative and
  * commutative, so any merge order gives the identical sample (what
  * makes the result SQL-oracle-checkable against the window form).
  */
class BottomK(k: Int)
  extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  require(k > 0, "k must be positive")

  private val ord = Ordering[(String, Long)]

  // Invariant: every buffer is SORTED (zero trivially; reduce inserts in
  // place; merge is a sorted merge). Once a buffer holds k entries the
  // hot path is a single comparison against the max — the earlier
  // sort-per-row trim was O(k log k) on every row past k, this is O(1)
  // reject / O(k) insert, and inserts die out as the bottom-k stabilizes.
  private def insertionPoint(b: Seq[(String, Long)], x: (String, Long)): Int = {
    var lo = 0
    var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lteq(b(mid), x)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(b: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] =
    if (b.size >= k && ord.gteq(x, b.last)) b
    else {
      val i = insertionPoint(b, x)
      val inserted = (b.take(i) :+ x) ++ b.drop(i)
      if (inserted.size > k) inserted.take(k) else inserted
    }

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] = {
    val out = Vector.newBuilder[(String, Long)]
    var i = 0
    var j = 0
    var n = 0
    val lim = math.min(k, a.size + b.size)
    while (n < lim) {
      if (j >= b.size || (i < a.size && ord.lteq(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[(String, Long)]): Seq[(String, Long)] = b

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
