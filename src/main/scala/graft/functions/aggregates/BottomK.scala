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

  private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
    if (s.size <= k) s else s.sorted.take(k)

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(b: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] =
    trim(b :+ x)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(b: Seq[(String, Long)]): Seq[(String, Long)] = b.sorted

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
