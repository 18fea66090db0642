package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("funnelStages: one row per user, stages monotone vs. raw event presence") {
    val stages = Events.funnelStages(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val users = Tables(spark, sf, "events")
      .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(stages.keySet === users)
    assert(stages.values.forall(s => s >= 0 && s <= 3))
    // a user with no view at all must be stage 0
    val viewers = Tables(spark, sf, "events")
      .filter($"event_type" === "view")
      .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    stages.foreach { case (u, s) =>
      if (!viewers.contains(u)) assert(s === 0)
      else assert(s >= 1)
    }
    // recount stage-3 users independently: purchase after click after view
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val expected3 = ev.collect { case (u, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      val s3 = views.nonEmpty && {
        val v = views.min
        val clicks = rows.filter(r => r._2 == "click" && r._3 > v).map(_._3)
        clicks.nonEmpty && {
          val c = clicks.min
          rows.exists(r => r._2 == "purchase" && r._3 > c)
        }
      }
      u -> s3
    }.filter(_._2).map(_._1).toSet
    assert(stages.filter(_._2 == 3).keySet === expected3)
  }
}
