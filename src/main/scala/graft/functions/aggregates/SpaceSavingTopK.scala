package graft.functions.aggregates

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * typed Spark `Aggregator`: bounded `capacity` counters per group,
  * mergeable, single pass.
  *
  * Why a sketch when `topTokensPerLang` computes exact top-k in two
  * phases? The exact path shuffles the full distinct-key space — fine
  * for word vocabularies, unbounded for high-cardinality keys (URLs,
  * n-grams, user ids at 100 TB). This sketch caps per-group state at
  * `capacity` entries regardless of key cardinality, with the classic
  * guarantee: any key with true count > N/capacity is retained, and
  * reported counts overestimate by at most the smallest tracked count.
  * With capacity ≥ distinct keys it degrades to exact counting (the
  * property the spec pins it on).
  *
  * Usage: `ds.groupByKey(_.lang).agg(new SpaceSavingTopK(1024, 5).toColumn)`.
  */
class SpaceSavingTopK(capacity: Int, k: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(capacity >= k, "capacity must be at least k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        // evict the smallest counter; the newcomer inherits its count + 1
        // (deterministic tie-break on key so merge order can't flip results)
        val (minKey, minCount) = b.minBy { case (key0, c) => (c, key0) }
        b - minKey + (key -> (minCount + 1))
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    // sum counts keywise, then trim back to capacity keeping the largest
    // (standard space-saving merge; keeps the overestimate-only property)
    val summed = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else summed.toSeq
      .sortBy { case (key, c) => (-c, key) }
      .take(capacity).toMap
  }

  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder()
}
