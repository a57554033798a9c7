package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Batch relational helper coverage not already pinned by the oracle. */
class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 10k rows where 90% share one hot key
    val left = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"), col("id").as("payload"))
    val right = Seq((1L, "hot"), (11L, "cold"), (21L, "cold2")).toDF("k", "v")
    val plain = left.join(right, "k")
    val salted = RelationalOps.saltedJoin(left, right, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "v").as[(Long, Long, String)].collect().sorted
    val b = salted.select("k", "payload", "v").as[(Long, Long, String)].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("intervalJoin only pairs rows inside the time bound") {
    val l = Seq((1L, ts(1000)), (2L, ts(5000))).toDF("user_id", "ts")
    val r = Seq((1L, ts(1000 + 1800)), (1L, ts(1000 + 7200)), (2L, ts(4000))).toDF("user_id", "ts")
    val out = RelationalOps.intervalJoin(l, r, "user_id", "ts", "ts", "1 HOUR")
    // user1: +30min in, +2h out; user2: r.ts before l.ts -> out
    assert(out.count() == 1)
  }
}
