package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for named queries to
  * `<outDir>/<query>_<suffix>.txt` under the BENCH session configuration
  * (same master/shuffle width/AQE/SessionTuning as `Bench`), so the
  * committed plan evidence in `plans/` reflects what the bench actually
  * runs. Not part of the driver contract.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <suffix> <query ...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query ...>")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      val fn = SparkEntry.queries.get(q)
        .orElse(Bench.fastLanes.get(q))
        .getOrElse(sys.error(s"unknown query: $q"))
      val plan = fn(spark, d).queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
