package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink breadth — the Spark-native analog of the reference's
  * connector modules (presto-hive's file formats, presto-base-jdbc, the
  * csv/json record decoders in presto-record-decoder). A reference
  * "connector" contributes three things: a table namespace, a schema, and
  * a data layout; here the namespace is a temp view, the schema is either
  * the file's own metadata (parquet/orc) or an explicit StructType, and
  * the layout is the format's splittability.
  *
  * Scale rules encoded in these helpers:
  *  - Schema is EXPLICIT for schemaless formats (csv/json): inference
  *    reads the whole input once just to guess types — never at 100 TB.
  *  - JDBC reads take a partition column + bounds, the reference's
  *    `presto-base-jdbc` split-generation analog; without them a JDBC
  *    table arrives through a single connection on a single task.
  *  - Writers go through `DataFrameWriter` so bucketing/partitioning
  *    compose (Engine.writeBucketed remains the co-located-join path).
  *
  * Kafka/Elasticsearch connectors need their Spark connector jars (absent
  * in this environment) — the streaming file source (streaming/Streams
  * .scala) covers the continuous-ingest shape instead.
  */
object Sources {

  /** CSV with explicit schema (header validated against it when present). */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE") // bad rows → nulls, like the reference's decoder
      .csv(path)

  /** JSON Lines with explicit schema (one object per line — splittable;
    * multiline JSON is not and stays out of the scale path).
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Self-describing columnar formats: schema rides the footer. */
  def parquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
  def orc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  /** Whole-line text (decoders layer on top via the function registry). */
  def text(spark: SparkSession, path: String): DataFrame = spark.read.text(path)

  /** Hive-style SequenceFile sink (HiveStorageFormat.SEQUENCEFILE with
    * LazySimpleSerDe framing: each value is one ctrl-A(\u0001)-delimited text
    * record, keys are null — `presto-hive/.../HiveStorageFormat.java:53`
    * pairs SequenceFileOutputFormat with LazySimpleSerDe). SQL NULL is
    * encoded as the serde's `\N` marker. Splittable at sync markers, so
    * it parallelizes like the other container formats.
    */
  def writeSequenceFile(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io.{NullWritable, Text}
    import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
    val n = df.schema.length
    df.rdd.map { row =>
      val line = (0 until n).map(i =>
        if (row.isNullAt(i)) "\\N" else row.get(i).toString).mkString("\u0001")
      (NullWritable.get(), new Text(line))
    }.saveAsNewAPIHadoopFile(path, classOf[NullWritable], classOf[Text],
      classOf[SequenceFileOutputFormat[NullWritable, Text]])
  }

  /** SequenceFile scan under the declared-schema rule (csv/jsonLines
    * analog). The Hadoop reader REUSES its Writable instances, so the
    * value is copied out before anything else touches the record — the
    * same bridge rule as the Avro connector.
    */
  def sequenceFile(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.hadoop.io.{NullWritable, Text}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val lines = spark.sparkContext
      .sequenceFile(path, classOf[NullWritable], classOf[Text])
      .map { case (_, v) => v.toString }
    val fields = schema.fields
    val rows = lines.map { line =>
      val parts = line.split("\u0001", -1)
      Row.fromSeq(fields.zipWithIndex.map { case (f, i) =>
        decodeTextField(f.dataType, if (i < parts.length) parts(i) else "\\N")
      }.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Decode one serde text field under the declared-schema rule (shared
    * by the SequenceFile and RCFile readers; `\N` is SQL NULL).
    */
  private def decodeTextField(
      dt: org.apache.spark.sql.types.DataType, raw: String): Any = {
    import org.apache.spark.sql.types._
    if (raw == "\\N") null
    else dt match {
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case DoubleType => raw.toDouble
      case FloatType => raw.toFloat
      case BooleanType => raw.toBoolean
      case StringType => raw
      case other => throw new IllegalArgumentException(
        s"no text-serde mapping for $other — extend Sources.decodeTextField")
    }
  }

  /** RCFile columnar sink in the text encoding (HiveStorageFormat.RCTEXT:
    * RCFileOutputFormat + ColumnarSerDe — `presto-hive/.../
    * HiveStorageFormat.java:53-93`; the reference reads it through
    * ColumnarTextHiveRecordCursor). Each row group stores columns
    * contiguously — the reference's page-oriented layout argument — and
    * fields travel as UTF-8 bytes with the `\N` null marker.
    */
  def writeRcText(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.hive.ql.io.{RCFile, RCFileOutputFormat}
    import org.apache.hadoop.hive.serde2.columnar.{BytesRefArrayWritable, BytesRefWritable}
    val n = df.schema.length
    // Hive's own write path (RCFileOutputFormat.getHiveRecordWriter) takes
    // the final path explicitly rather than MapReduce's task work dir —
    // mirrored here with one container file per task. The mapPartitions is
    // the same foreign-writer codec boundary as the multimodal decoder: no
    // Catalyst sink speaks this container. Each task writes to an
    // attempt-unique dotfile and renames into place only after a clean
    // close, so a failed or speculative attempt never leaves a truncated
    // container at the final path; the session's Hadoop conf rides along
    // so the path resolves against the session filesystem.
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      val conf = new Configuration(confSer.value)
      RCFileOutputFormat.setColumnNumber(conf, n)
      val finalP = new Path(path, f"part-$idx%05d.rc")
      val fs = finalP.getFileSystem(conf)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(tc => s"${tc.stageAttemptNumber()}-${tc.taskAttemptId()}")
        .getOrElse(java.util.UUID.randomUUID().toString)
      val tmpP = new Path(path, f".part-$idx%05d.rc.$attempt.tmp")
      var ok = false
      val w = new RCFile.Writer(fs, conf, tmpP)
      try {
        it.foreach { row =>
          val braw = new BytesRefArrayWritable(n)
          var i = 0
          while (i < n) {
            val s = if (row.isNullAt(i)) "\\N" else row.get(i).toString
            val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            braw.set(i, new BytesRefWritable(b, 0, b.length))
            i += 1
          }
          w.append(braw)
        }
        w.close()
        if (fs.exists(finalP)) fs.delete(finalP, false)
        // rename may return false instead of throwing (e.g. HDFS when the
        // destination reappears between the delete and the rename, or a
        // missing parent) — a silent false would commit NOTHING while the
        // job reports success, the truncated-output class this tmp-file
        // protocol exists to prevent; throw so the task fails and retries
        if (!fs.rename(tmpP, finalP))
          throw new java.io.IOException(s"rename $tmpP -> $finalP failed")
        ok = true
        Iterator.empty[Int]
      } finally if (!ok) {
        try w.close() catch { case _: Throwable => () }
        fs.delete(tmpP, false)
        ()
      }
    }.count()
    ()
  }

  /** RCFile scan under the declared-schema rule. Field bytes are copied
    * out of the REUSED `BytesRefArrayWritable` before anything else runs
    * (the same bridge rule as the Avro and SequenceFile readers).
    */
  def rcText(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.hadoop.hive.ql.io.RCFileInputFormat
    import org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable
    import org.apache.hadoop.io.LongWritable
    import org.apache.spark.sql.Row
    val fields = schema.fields
    val rows = spark.sparkContext.hadoopFile(
        path, classOf[RCFileInputFormat[LongWritable, BytesRefArrayWritable]],
        classOf[LongWritable], classOf[BytesRefArrayWritable])
      .map { case (_, v) =>
        val vals = (0 until v.size()).map { i =>
          val r = v.get(i)
          new String(r.getData, r.getStart, r.getLength,
            java.nio.charset.StandardCharsets.UTF_8)
        }
        Row.fromSeq(fields.zipWithIndex.map { case (f, i) =>
          decodeTextField(f.dataType, if (i < vals.length) vals(i) else "\\N")
        }.toSeq)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Parallel JDBC read — presto-base-jdbc's split generation: Spark
    * issues `numPartitions` range predicates on `partitionColumn` so the
    * table streams through that many concurrent connections.
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)

  /** Single-connection JDBC read — small dimension tables only. */
  def jdbcTable(
      spark: SparkSession,
      url: String,
      table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Overwrite,
      props: Properties = new Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Write in a named file format, optionally hive-style partitioned —
    * partition columns become directory keys the reader prunes on.
    */
  def write(
      df: DataFrame,
      path: String,
      format: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Register a DataFrame under a table name — the connector's namespace
    * contribution (temp view; `Engine`'s catalog pattern).
    */
  def register(spark: SparkSession, name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)
}
