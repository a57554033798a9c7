package graft.streaming

import graft.SparkSpec
import graft.sql.SqlSurface
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The SQL `INSERT INTO <system>.<topic> SELECT ...` surface — the
  * statement shape of all four reference samza.sql files (e.g.
  * /root/reference/src/main/java/samza/examples/sql/samza-sql-filter/
  * src/main/sql/samza.sql:4-7) run end-to-end: parse the INSERT target,
  * plan the SELECT over a streaming view, return the wired writer. */
case class SqlProfile(memberId: Long, firstName: String, lastName: String,
                   company: String, title: String)

class SqlInsertSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val profiles = Seq(
    SqlProfile(1, "Ada", "L", "EngineCo", "  Product Manager "),
    SqlProfile(2, "Ben", "K", "DataCo", "engineer"),
    SqlProfile(3, "Cyd", "M", "PlanCo", "PRODUCT MANAGER"))

  test("parseInsert handles the verbatim reference statement shape") {
    // comments + casing + qualified FROM, as in samza-sql-filter's file
    val stmt =
      """-- Filter Profile change-capture stream by 'Product Manager'
        |-- title and project basic profile data to a kafka topic.
        |
        |INSERT INTO kafka.ProductManagerProfiles
        |SELECT memberId, firstName, lastName, company
        |FROM kafka.ProfileChanges
        |WHERE standardize(title) = 'product manager'""".stripMargin
    val ins = SqlSurface.parseInsert(stmt)
    assert(ins.system == "kafka")
    assert(ins.target == "ProductManagerProfiles")
    assert(ins.select.startsWith("SELECT memberId"))
    // lowercase `insert into` + backticked stream (samza-sql-groupby shape)
    val ins2 = SqlSurface.parseInsert(
      "insert into kafka.groupbyTopic select count(*) as Views from kafka.`PageViewEvent`")
    assert(ins2.system == "kafka" && ins2.target == "groupbyTopic")
    // dotted topic names are idiomatic Kafka: first dot splits, the
    // target keeps the rest
    val ins3 = SqlSurface.parseInsert(
      "INSERT INTO kafka.page.views.v2 SELECT a FROM kafka.b")
    assert(ins3.system == "kafka" && ins3.target == "page.views.v2")
    assertThrows[IllegalArgumentException](
      SqlSurface.parseInsert("SELECT 1"))
  }

  test("system qualifiers strip from FROM/JOIN but real db.table survives") {
    assert(SqlSurface.stripSystemQualifiers(
      "SELECT a FROM kafka.Views JOIN kinesis.`Users` ON x = y") ==
      "SELECT a FROM Views JOIN `Users` ON x = y")
    assert(SqlSurface.stripSystemQualifiers(
      "SELECT a FROM warehouse.facts") == "SELECT a FROM warehouse.facts")
  }

  test("INSERT INTO memory.<name> runs a reference statement end-to-end") {
    SqlSurface.registerUdfs(spark)
    val in = MemoryStream[SqlProfile]
    in.addData(profiles)
    in.toDS().createOrReplaceTempView("ProfileChanges")
    val writer = SqlSurface.insertInto(spark,
      """INSERT INTO memory.pm_profiles
        |SELECT memberId, firstName, lastName, company
        |FROM kafka.ProfileChanges
        |WHERE standardize(title) = 'product manager'""".stripMargin)
    val q = writer.start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("pm_profiles")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    // standardize = lower(trim): both PM spellings match, the engineer drops
    assert(out.toSeq == Seq((1L, "Ada", "L", "EngineCo"), (3L, "Cyd", "M", "PlanCo")))
  }

  test("a grouped INSERT (samza-sql-groupby shape) runs in update mode end-to-end") {
    val in = MemoryStream[SqlProfile]
    in.addData(profiles)
    in.toDS().createOrReplaceTempView("ProfileChanges")
    // the reference's aggregating statement shape
    // (samza-sql-groupby/src/main/sql/samza.sql:7-10): grouped counts,
    // continuously re-emitted — update mode is inferred from the plan
    val q = SqlSurface.insertInto(spark,
      """insert into kafka.groupbyTopic
        |  select company, count(*) as Views
        |  from kafka.ProfileChanges
        |  group by company""".stripMargin
        .replace("kafka.groupbyTopic", "memory.grouped_out"))
      .start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("grouped_out").as[(String, Long)].collect().toMap
    assert(out == Map("EngineCo" -> 1L, "DataCo" -> 1L, "PlanCo" -> 1L))
  }

  test("INSERT INTO file.<leaf> lands parquet under options(path)/<leaf>") {
    val in = MemoryStream[SqlProfile]
    in.addData(profiles)
    in.toDS().createOrReplaceTempView("ProfileChanges")
    val base = java.nio.file.Files.createTempDirectory("sql-insert-file").toString
    // the statement's named destination is the leaf directory under the
    // caller's base path (documented sink mapping) — pin the composition
    // end-to-end, trailing slash and all
    val q = SqlSurface.insertInto(spark,
      "INSERT INTO file.pm_out SELECT memberId, company FROM kafka.ProfileChanges",
      Map("path" -> (base + "/"), "checkpoint" -> s"$base/ck"))
      .start()
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(s"$base/pm_out")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "EngineCo"), (2L, "DataCo"), (3L, "PlanCo")))
  }

  test("INSERT INTO kafka.<topic> returns a wired writer; unknown system throws") {
    val in = MemoryStream[SqlProfile]
    in.toDS().createOrReplaceTempView("ProfileChanges")
    // no broker in this sandbox: assert the wiring is built (format/topic
    // options accepted) without starting it
    SqlSurface.insertInto(spark,
      "INSERT INTO kafka.out SELECT memberId FROM kafka.ProfileChanges",
      Map("brokers" -> "b:9092", "checkpoint" -> "/tmp/sql-insert-ck"))
    assertThrows[IllegalArgumentException](SqlSurface.insertInto(spark,
      "INSERT INTO kafka.out SELECT memberId FROM kafka.ProfileChanges"))
    assertThrows[IllegalArgumentException](SqlSurface.insertInto(spark,
      "INSERT INTO nowhere.out SELECT memberId FROM kafka.ProfileChanges"))
  }
}
