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

  test("nfc_normalize folds decomposed forms, is idempotent, and preserves NFC input") {
    GraftExtensions.registerAll(spark)
    val decomposed = "café"   // e + combining acute (5 code points)
    val composed = "café"      // é (4 code points)
    val r = spark.sql(
      s"""SELECT nfc_normalize('$decomposed') AS n1,
         |  nfc_normalize('$composed') AS n2,
         |  nfc_normalize(nfc_normalize('$decomposed')) AS n3,
         |  length(nfc_normalize('$decomposed')) AS len,
         |  nfc_normalize(CAST(NULL AS STRING)) AS nn
         |""".stripMargin).collect()(0)
    assert(r.getString(0) == composed, "decomposed must fold to the composed form")
    assert(r.getString(1) == composed, "NFC input must pass through unchanged")
    assert(r.getString(2) == composed, "normalization must be idempotent")
    assert(r.getInt(3) == 4, "the combining mark must merge into one code point")
    assert(r.isNullAt(4), "null in, null out")
  }
}
