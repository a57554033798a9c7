package graft.sql

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Entry point C (SURVEY.md §3.3): the SQL surface. The reference runs
  * Calcite-planned `INSERT INTO <sink> SELECT ...` statements over streams
  * (the four samza.sql examples); here Catalyst plans the same statements
  * over temp views — batch or streaming — and the INSERT INTO sink maps to
  * the caller's writer (writeStream for topics, write for tables).
  *
  * The reference's SQL UDFs (SURVEY.md §2.3 P6-P7) register on the session:
  *  - `standardize(s)` — canonicalize a string for comparison
  *    (samza-sql-filter/src/main/sql/samza.sql:7)
  *  - `get_sql_field(json, path)` — pull a field out of a nested/opaque
  *    record; opaque payloads here are JSON strings, so this is
  *    get_json_object with the reference's dotted-path syntax
  *    (samza-sql-casewhen/src/main/sql/samza.sql:7-8)
  *
  * The native graft functions (cosine_sim, word_shingles) come from
  * `spark.sql.extensions=graft.GraftExtensions` instead — full Catalyst
  * expressions with codegen, not UDFs.
  */
object SqlSurface {

  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("standardize",
      (s: String) => if (s == null) null else s.trim.toLowerCase)
    spark.udf.register("get_sql_field", (json: String, path: String) => {
      if (json == null || path == null) null
      else {
        // dotted path -> JsonPath; evaluated with the session-independent
        // JacksonParser route via Dataset API would need a session, so use
        // a tiny manual descent over Jackson's tree model.
        val mapper = SqlSurface.mapper
        var node = mapper.readTree(json)
        val parts = path.split("\\.")
        var i = 0
        while (node != null && i < parts.length) { node = node.get(parts(i)); i += 1 }
        if (node == null || node.isNull) null
        else if (node.isValueNode) node.asText()
        else node.toString
      }
    })
  }

  @transient lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Register every testdata table as a temp view. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  /** Run a SQL statement over the registered views. */
  def sql(spark: SparkSession, statement: String): DataFrame = spark.sql(statement)
}
