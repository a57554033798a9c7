package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** K3 in the reference's actual output format: Avro container files rolled
  * every `maxRecordsPerFile` records — the blob-roll knob
  * (AzureBlobApplication.java:119-139 writes PageViewAvroRecord with
  * maxMessagesPerBlob=2, azure-blob-application.properties:43).
  *
  * The spark-avro DataSource is not on this classpath, but Avro itself is
  * (Spark ships avro/avro-mapred for shuffle internals), so the writer uses
  * the plain Avro `DataFileWriter` directly over Hadoop `FileSystem`
  * streams: the same code path writes file://, hdfs:// or abfs:// — the
  * reference's Azure blob target is a URI scheme here, not a code change.
  *
  * Scale shape: one writer per PARTITION (`foreachPartition`), zero driver
  * involvement, schema shipped once as JSON; file count = ceil(rows /
  * maxRecordsPerFile) summed over partitions, names
  * `part-<batch>-<partition>-<seq>.avro` so concurrent tasks and batches
  * never collide. */
object AvroSink {

  /** Spark → Avro schema for the flat column types the sinks carry
    * (nested structs would recurse the same way; the reference's records
    * are flat, PageViewAvroRecord.java:28-29). Every field is
    * union(null, T) so nullable columns round-trip. */
  def avroSchema(st: StructType, name: String = "GraftRecord"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other =>
          throw new IllegalArgumentException(s"avro sink: unsupported column type $other (${f.name})")
      }
      val sch = Schema.createUnion(java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
      fields.add(new Schema.Field(f.name, sch, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Batch write: every partition rolls its own sequence of container
    * files. `batchTag` namespaces file names (streaming passes the
    * micro-batch id).
    *
    * Task-attempt safety: speculative or retried attempts of the same
    * partition must not write the same destination path concurrently, so
    * each attempt streams into `.inprogress-<taskAttemptId>-<name>` and
    * PUBLISHES by rename on file completion. Partition content is
    * deterministic per batch, so the publish is idempotent: the rename
    * loser (destination already present) just discards its temp file.
    * A failed attempt's partial temp file is deleted in the finally. */
  def writeRolled(df: DataFrame, dir: String, maxRecordsPerFile: Int,
                  batchTag: Long = 0L): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val st = df.schema
    // Avro Schema is not serializable-stable across versions — ship JSON.
    val schemaJson = avroSchema(st).toString
    val fieldTypes = st.fields.map(_.dataType)
    // The SESSION's effective Hadoop conf (spark.hadoop.*, fs.defaultFS,
    // object-store credentials) must reach the executor — a bare
    // `new Configuration()` only sees classpath XML and breaks abfs/s3
    // targets. Configuration isn't serializable; ship its entries.
    val hadoopConfMap: Map[String, String] = {
      val hc = df.sparkSession.sparkContext.hadoopConfiguration
      val b = Map.newBuilder[String, String]
      val it = hc.iterator()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    // broadcast, not closure capture: the conf is ~1000 entries and would
    // otherwise reserialize into every task of every micro-batch
    val confBc = df.sparkSession.sparkContext.broadcast(hadoopConfMap)
    df.foreachPartition { (it: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val pid = TaskContext.getPartitionId()
      val attemptId = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
      val conf = new Configuration(false)
      confBc.value.foreach { case (k, v) => conf.set(k, v) }
      val outDir = new Path(dir)
      val fs = outDir.getFileSystem(conf)
      fs.mkdirs(outDir)
      var writer: DataFileWriter[GenericRecord] = null
      var tmpPath: Path = null
      var finalPath: Path = null
      var inFile = 0
      var seq = 0
      def publish(): Unit = if (writer != null) {
        writer.close()
        writer = null
        if (!fs.rename(tmpPath, finalPath)) {
          // rename=false is only benign when another attempt already
          // published this file; any other cause (lease, quota, perms,
          // missing parent) must FAIL the task, not silently drop rows
          if (fs.exists(finalPath)) fs.delete(tmpPath, false)
          else throw new java.io.IOException(s"avro publish failed: $tmpPath -> $finalPath")
        }
      }
      def roll(): Unit = {
        publish()
        val name = f"part-$batchTag%05d-$pid%05d-$seq%05d.avro"
        finalPath = new Path(outDir, name)
        tmpPath = new Path(outDir, s".inprogress-$attemptId-$name")
        writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, fs.create(tmpPath, true))
        inFile = 0
        seq += 1
      }
      try {
        it.foreach { row =>
          if (writer == null || inFile >= maxRecordsPerFile) roll()
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fieldTypes.length) {
            val v =
              if (row.isNullAt(i)) null
              else fieldTypes(i) match {
                case TimestampType => java.lang.Long.valueOf(
                  row.getAs[java.sql.Timestamp](i).getTime * 1000L +
                    row.getAs[java.sql.Timestamp](i).getNanos / 1000 % 1000)
                case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
                case _ => row.get(i).asInstanceOf[AnyRef]
              }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
          inFile += 1
        }
        publish()
      } finally if (writer != null) {
        writer.close()
        fs.delete(tmpPath, false)
      }
    }
  }

  /** Streaming write: per-micro-batch rolled Avro via foreachBatch — the
    * exact lifecycle of the reference's per-message blob writer, with the
    * batch id in the file name for exactly-once-per-batch idempotence. */
  def rolledAvro[T](ds: Dataset[T], dir: String, checkpoint: String,
                    maxRecordsPerFile: Int): DataStreamWriter[T] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        writeRolled(batch.toDF(), dir, maxRecordsPerFile, batchId)
      }
}
