package graft

/** The SQL surface of the native expressions: the builders GraftExtensions
  * injects at session build are registered here at runtime (same list,
  * GraftExtensions.registerAll) and evaluated end-to-end through
  * `spark.sql`. */
class ExtensionsSpec extends SparkSpec {

  test("cosine_sim, word_shingles and hamming_dist evaluate through SQL") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  round(cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 4) AS cs,
        |  word_shingles('a b c d', 3) AS sh,
        |  hamming_dist('1010', '1001') AS hd
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getLong(2) == 2L)
  }
}
