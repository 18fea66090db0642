package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row
  * with rightTime <= leftTime on the same key. Spark has no built-in
  * as-of join; this composes one from a union + running last_value
  * (SURVEY custom-operator preference (a): compose existing ops).
  *
  * Scale shape: one shuffle on the key, one window sort within
  * partitions — same cost envelope as a sort-merge join. No per-key
  * driver loops, no range cross-product: the union trick turns the
  * temporal predicate into a linear scan inside each key partition.
  * Skewed keys behave like any window skew (salt or split upstream).
  */
object AsOf {

  /** @param payload right-side columns carried onto matched left rows
    * @param rightTieBreak deterministic winner among right rows sharing
    *   (key, time): the one with the greatest tie-break value
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
               right: DataFrame, rightKey: String, rightTime: String,
               payload: Seq[String], rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lWithNullPayload = payload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__tie", col(rightTieBreak))
    val rWithNullLeft = leftCols.foldLeft(r0)((df, c) =>
      if (payload.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (leftCols ++ payload ++ Seq("__k", "__t", "__is_left", "__tie")).distinct
    val u = lWithNullPayload.select(cols.map(col): _*)
      .unionByName(rWithNullLeft.select(cols.map(col): _*))
    // right rows order before left at equal time (ASOF's >= semantics);
    // among right rows at identical (key,time), greatest tie-break wins —
    // nulls first so a NULL tie-break loses to any concrete value
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_left"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct per right row (null marker for left rows): per-column
    // last() calls would tear the match — a null field in the matched
    // right row back-filled from an older row, a composite that never
    // existed — and would drop matches whose first payload field is null
    val carried = u
      .withColumn("__p", when(col("__is_left") === 0,
        struct(payload.map(col): _*)).otherwise(lit(null)))
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    carried
      .filter(col("__is_left") === 1 && col("__m").isNotNull)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"__m.$c").as(c))): _*)
  }

  /** FORWARD as-of join — for each left row, the EARLIEST right row with
    * rightTime >= leftTime on the same key (the "next event after"
    * direction: next scheduled maintenance, next price revision, the
    * label-after-feature join in training-data assembly where backward
    * would leak). Mirror image of [[asofJoin]]: same union + one window,
    * frame flipped to [current, following] with `first` instead of
    * `last`; right rows sort AFTER left at equal time so `>=` matches,
    * and among right rows at identical (key, time) the greatest
    * tie-break sorts first and wins. Identical scale shape: one shuffle,
    * one in-partition sort, no range cross-product.
    */
  def asofJoinForward(left: DataFrame, leftKey: String, leftTime: String,
                      right: DataFrame, rightKey: String, rightTime: String,
                      payload: Seq[String], rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lWithNullPayload = payload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__tie", col(rightTieBreak))
    val rWithNullLeft = leftCols.foldLeft(r0)((df, c) =>
      if (payload.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (leftCols ++ payload ++ Seq("__k", "__t", "__is_left", "__tie")).distinct
    val u = lWithNullPayload.select(cols.map(col): _*)
      .unionByName(rWithNullLeft.select(cols.map(col): _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_left").desc, col("__tie").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = u
      .withColumn("__p", when(col("__is_left") === 0,
        struct(payload.map(col): _*)).otherwise(lit(null)))
      .withColumn("__m", first(col("__p"), ignoreNulls = true).over(w))
    carried
      .filter(col("__is_left") === 1 && col("__m").isNotNull)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"__m.$c").as(c))): _*)
  }

  /** Bench/oracle instance: each event joined to the user's most recent
    * order at event time (right side deduped to one row per
    * (custkey, orderdate) — as-of requires unique right timestamps for a
    * well-defined answer).
    */
  def eventOrderAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // dedup to one row per (custkey, orderdate) via max(struct): struct
    // ordering is lexicographic on the leading o_orderkey, so this picks
    // the same row as a row_number window but with map-side partial
    // aggregation instead of a full sort
    val orders = Tables(s, dir, "orders")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max(struct($"o_orderkey", $"o_totalprice")).as("m"))
      .select($"o_custkey", $"o_orderdate",
        $"m.o_orderkey".as("o_orderkey"), $"m.o_totalprice".as("o_totalprice"))
    val events = Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"ts")
    asofJoin(events, "user_id", "ts", orders, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
      .orderBy($"event_id")
  }

  /** Forward twin of [[eventOrderAsof]], flipped to the direction the
    * data has mass in: each ORDER joined to the customer's FIRST event
    * at/after order time (right side deduped to one row per (user, ts)).
    */
  def orderNextEventAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables(s, dir, "events")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("event_id"))
    val orders = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    asofJoinForward(orders, "o_custkey", "o_orderdate",
      events, "user_id", "ts", Seq("event_id"), "event_id")
      .select($"o_orderkey", $"o_custkey", $"event_id")
      .orderBy($"o_orderkey")
  }
}
