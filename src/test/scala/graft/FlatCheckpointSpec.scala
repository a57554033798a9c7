package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Regression gate for the checkpointed-self-join statistics pathology
  * (found in round 10): `localCheckpoint` copies the originating plan's
  * `sizeInBytes` ESTIMATE into the truncated leaf, a self-join SQUARES
  * it, and the BigInteger doubles in bit length every loop round — past
  * ~25 rounds the stats visitor dies with "BigInteger would overflow
  * supported range". Every loop kernel must checkpoint through
  * [[ColumnBridge.flatCheckpoint]], which drops the inherited estimate.
  *
  * Two gates: (1) a live repro that plain localCheckpoint compounds the
  * estimate within 4 rounds while flatCheckpoint holds it flat; (2) a
  * source gate that no main-source call site uses bare
  * `.checkpoint(`/`.localCheckpoint(` outside the bridge itself. */
class FlatCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def sizeBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  private def selfJoin(df: DataFrame): DataFrame =
    df.as("l").join(df.as("r"), col("l.id") === col("r.id"))
      .select(col("l.id").as("id"))

  test("plain localCheckpoint compounds sizeInBytes across self-join " +
      "rounds; flatCheckpoint holds it flat") {
    val base = spark.range(64).toDF("id")

    // plain lane: the estimate's bit length roughly doubles per round
    var plain = base.localCheckpoint()
    val bits0 = sizeBits(selfJoin(plain))
    var plainBits = Vector.empty[Int]
    for (_ <- 1 to 4) {
      plain = selfJoin(plain).localCheckpoint()
      plainBits :+= sizeBits(plain)
    }
    assert(plainBits.last > 2 * bits0,
      s"expected compounding estimate, got $bits0 -> $plainBits")
    assert(plainBits == plainBits.sorted && plainBits.distinct == plainBits,
      s"expected strictly growing bit lengths, got $plainBits")

    // flat lane: every round re-plans from the conf default — constant
    var flat = ColumnBridge.flatCheckpoint(base)
    var flatBits = Vector.empty[Int]
    for (_ <- 1 to 4) {
      flat = ColumnBridge.flatCheckpoint(selfJoin(flat))
      flatBits :+= sizeBits(flat)
    }
    assert(flatBits.distinct.size == 1,
      s"expected a flat estimate across rounds, got $flatBits")
    // and the data itself is identical either way
    assert(flat.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      plain.orderBy("id").collect().map(_.getLong(0)).toSeq)
  }

  test("source gate: every bare .checkpoint/.localCheckpoint call site " +
      "in main source is annotated one-shot (loops must use flatCheckpoint)") {
    // A bare localCheckpoint is legitimate EXACTLY when it runs once —
    // inherited originStats then help downstream broadcast decisions.
    // Such sites must carry a `// ckpt: one-shot` annotation within the
    // two preceding lines (the unpartitioned-Window audit convention);
    // anything unannotated is treated as a prospective loop kernel and
    // must route through ColumnBridge.flatCheckpoint instead.
    def scalaFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) scalaFiles(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil
      }
    val scanned = scalaFiles(new java.io.File("src/main/scala"))
    // A wrong CWD makes listFiles return null and the gate pass vacuously
    // — fail LOUDLY instead, so the audit can never silently stop gating.
    assert(scanned.nonEmpty,
      s"source gate found no .scala files under src/main/scala (cwd = " +
        s"${new java.io.File(".").getAbsolutePath}) — the checkpoint audit " +
        "would pass vacuously; run the suite from the repo root")
    val offenders = scanned
      .filterNot(_.getPath.endsWith("org/apache/spark/sql/graft/bridge.scala"))
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        val lines = try src.getLines().toVector finally src.close()
        lines.zipWithIndex.collect {
          case (line, i)
              if (line.contains(".checkpoint(") ||
                line.contains(".localCheckpoint(")) &&
                !lines.slice(math.max(0, i - 2), i + 1)
                  .exists(_.contains("ckpt: one-shot")) =>
            s"${f.getPath}:${i + 1}: $line"
        }
      }
    assert(offenders.isEmpty,
      "unannotated checkpoint call sites must route through " +
        "ColumnBridge.flatCheckpoint (or carry `// ckpt: one-shot — " +
        s"<reason>` if they provably run once):\n${offenders.mkString("\n")}")
  }
}
