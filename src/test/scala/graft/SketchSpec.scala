package graft

import org.apache.spark.sql.functions._

/** The oracle queries use EXACT percentile/distinct (cross-engine
  * checkable); at 100 TB the scale path is the sketch versions —
  * approx_percentile (KLL-style rank sketch, bounded memory per group)
  * and approx_count_distinct (HyperLogLog++, fixed ~few-KB state vs a
  * hash set of every key). These tests pin the advertised accuracy on
  * real data so "swap exact for approx at scale" is a measured claim. */
class SketchSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("approx_percentile tracks the exact percentile within 2% relative error") {
    val ev = Tables.load(spark, d, "events")
    val both = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.5)").as("exact_p50"),
      expr("approx_percentile(value, 0.5, 10000)").as("approx_p50"),
      expr("percentile(value, 0.95)").as("exact_p95"),
      expr("approx_percentile(value, 0.95, 10000)").as("approx_p95"))
    both.collect().foreach { r =>
      val (e50, a50) = (r.getDouble(1), r.getAs[Number](2).doubleValue())
      val (e95, a95) = (r.getDouble(3), r.getAs[Number](4).doubleValue())
      assert(math.abs(a50 - e50) / e50 < 0.02, s"${r.get(0)}: p50 $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"${r.get(0)}: p95 $a95 vs $e95")
    }
  }

  test("approx_count_distinct stays within 3x the configured rsd of exact") {
    val ev = Tables.load(spark, d, "events")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), rsd = 0.05).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.15,
      s"HLL estimate $approx vs exact $exact exceeds 3x rsd")
  }
}
