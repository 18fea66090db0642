package graft

import org.apache.spark.sql.functions._

/** The optional JDBC connector (SURVEY §2.1 S7), exercised against the
  * embedded Derby engine Spark already ships for its Hive metastore — a
  * real JDBC driver + SQL engine in-JVM, so the read path, predicate
  * pushdown into the remote DB, and the write path all run end-to-end
  * without a network database. (The reference reads its tables over JDBC
  * from Postgres — `data/GtfsDAO.java:36-48`; only the URL differs.)
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate(
      "CREATE TABLE agency (agency_id INT NOT NULL, agency_name VARCHAR(64), PRIMARY KEY (agency_id))")
    (1 to 5).foreach(i =>
      st.executeUpdate(s"INSERT INTO agency VALUES ($i, 'agency-$i')"))
    st.close(); c.close()
  }

  test("jdbc source reads a live table with its schema") {
    seeded
    val df = Tables.jdbc(spark, url, "agency")
    assert(df.columns.map(_.toLowerCase).toSeq === Seq("agency_id", "agency_name"))
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows === (1 to 5).map(i => (i, s"agency-$i")).toSet)
  }

  test("filters push down into the remote database, not into Spark") {
    seeded
    val df = Tables.jdbc(spark, url, "agency").filter($"agency_id" > 3)
    assert(df.count() === 2)
    // the JDBC relation must carry the predicate (PushedFilters), so the
    // DB does the filtering — at scale the difference between shipping 2
    // rows and shipping the table
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toUpperCase.contains("GREATERTHAN(AGENCY_ID,3)"),
      s"predicate not pushed into the JDBC scan:\n$plan")
  }

  test("write path round-trips through the database") {
    seeded
    val out = Seq((100L, "w-a"), (101L, "w-b")).toDF("run_id", "tag")
    out.write.mode("overwrite")
      .jdbc(url, "runs", new java.util.Properties())
    val back = Tables.jdbc(spark, url, "runs")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === Set((100L, "w-a"), (101L, "w-b")))
  }
}
