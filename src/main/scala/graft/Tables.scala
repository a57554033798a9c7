package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine operators take DataFrames; this is the only place that knows
  * the on-disk layout. At cluster scale the same API would point at a
  * partitioned table root instead of a single file — `spark.read.parquet`
  * handles both, and filter/column pushdown reaches the scan either way.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    // long (spark.sql.legacy.parquet.nanosAsLong=true, set by our session
    // builders). Convert to a microsecond timestamp with integer division —
    // `/ 1000.0` in double would lose precision at 1.7e18 ns — matching
    // DuckDB's ns→µs truncation exactly.
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // timestamp[us] with no zone reads as TIMESTAMP_NTZ, which some
      // chronon functions (unix_micros) reject. Sessions pin UTC, so the
      // cast is a wall-clock identity and restores the TIMESTAMP type the
      // whole operator surface (and its DuckDB oracle twins) was built on.
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
