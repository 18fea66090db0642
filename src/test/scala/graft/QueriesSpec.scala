package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Whole-surface smoke + plan audit: every SparkEntry query must execute
  * at sf0.001 and must never plan a true cartesian product (broadcast
  * nested loops against 1-row scalar frames are legitimate; an unbounded
  * CartesianProductExec at 100 TB is always a bug).
  */
class QueriesSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001 without a cartesian product") {
      val df = fn(spark, sf)
      assert(!planNodes(df).exists(_.isInstanceOf[CartesianProductExec]),
        df.queryExecution.executedPlan.toString.take(2000))
    }
  }

  test("oracleSql keys are a subset of queries keys, and entry returns rows") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet).toString)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
