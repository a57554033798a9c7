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

  /** Both functions register as NATIVE expression builders, not UDFs:
    *  - `standardize(s)` compiles to `lower(trim(s))` — whole-stage
    *    codegen, no boxing, and Catalyst can constant-fold / push it;
    *  - `get_sql_field(json, 'a.b')` compiles to
    *    `get_json_object(json, '$.a.b')` — the dotted path concatenates
    *    onto '$.' at plan time, the optimizer constant-folds it to a
    *    literal JsonPath, and GetJsonObject's streaming parser (shared,
    *    path compiled once) replaces the old per-row Jackson tree
    *    materialization. Same null semantics: null input, null/missing
    *    path, or malformed JSON all yield null.
    */
  def registerUdfs(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, GetJsonObject, Literal, Lower, StringTrim, Concat}
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.registerNativeFunction(spark, "standardize", (args: Seq[Expression]) => {
      require(args.length == 1, "standardize(str)")
      Lower(StringTrim(args.head))
    })
    ColumnBridge.registerNativeFunction(spark, "get_sql_field", (args: Seq[Expression]) => {
      require(args.length == 2, "get_sql_field(json, dotted_path)")
      GetJsonObject(args.head, Concat(Seq(Literal("$."), args(1))))
    })
  }

  /** Register every testdata table as a temp view. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  /** Run a SQL statement over the registered views. */
  def sql(spark: SparkSession, statement: String): DataFrame = spark.sql(statement)
}
