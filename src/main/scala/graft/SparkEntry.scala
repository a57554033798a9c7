package graft

import graft.functions.TextFunctions
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract: every operator from SURVEY.md §2 (batch form) plus the
  * training-data-pipeline extensions, each wired to the testdata tables with
  * an exact DuckDB oracle twin.
  *
  * Conventions that keep the oracle compare honest:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - every floating-point aggregate is rounded (2–6 dp) in BOTH engines, so
  *    summation-order ulp drift can't flip the hash;
  *  - every query ends in a full deterministic ORDER BY in both engines;
  *  - integer-ish outputs are cast to bigint on whichever side needs it
  *    (DuckDB len() is bigint, its sum(int) is hugeint, Spark size() is int).
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesA.m ++ QueriesB.m

  /** DuckDB twins. Shared fragments are built programmatically so the two
    * sides can't drift apart silently. */
  def oracleSql: Map[String, String] = OraclesA.m ++ OraclesB.m
}
