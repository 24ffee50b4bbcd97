package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.avro.util.Utf8
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file connector — the third record-decoder format of the
  * reference (`presto-record-decoder/src/main/java/io/prestosql/decoder/
  * avro/AvroColumnDecoder.java`; json and csv analogs live in
  * [[Sources]]). Spark's bundled `spark-avro` module is not on this
  * classpath, but avro + avro-mapred are, so the connector goes through
  * the Hadoop `AvroKeyInputFormat`/`AvroKeyOutputFormat` pair — the same
  * container-file framing the reference decodes.
  *
  * Scale notes:
  *  - Container files are SPLITTABLE (sync markers every block), so a
  *    100 TB Avro table parallelizes like parquet at the file-split
  *    level; the input format handles split alignment.
  *  - The schema is EXPLICIT and travels as its canonical JSON string
  *    (`Schema` itself is not serializable); each task parses it once
  *    per partition, never per record.
  *  - Record↔Row bridging happens immediately inside the scan stage —
  *    `AvroKey` is not serializable, so the datum is copied out before
  *    any shuffle boundary can see it (the standard Hadoop-RDD rule).
  *
  * Type mapping (declared, never inferred — SURVEY §1.1): long↔long,
  * int↔int, double↔double, string↔string (Avro `Utf8` decoded at the
  * bridge), boolean↔boolean. Nullable columns map to `["null", T]`
  * unions, the reference decoder's nullability convention.
  */
object Avro {

  /** Avro record schema (canonical JSON) for a Spark schema. */
  def avroSchemaJson(schema: StructType, recordName: String): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case other => throw new IllegalArgumentException(
        s"no Avro mapping for $other — extend Avro.avroSchemaJson")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$recordName", "fields": [$fields]}"""
  }

  /** Distributed write of `df` as Avro container files under `path`. */
  def write(df: DataFrame, path: String, recordName: String = "row"): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema, recordName)
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    val names = sparkSchema.fieldNames
    df.rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(json) // once per partition
      it.map { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < names.length) {
          rec.put(names(i), if (row.isNullAt(i)) null else row.get(i))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Parallel read of Avro container files with the DECLARED schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
      recordName: String = "row"): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", avroSchemaJson(schema, recordName))
    val fields = schema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        conf)
      .map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          vals(i) = rec.get(fields(i).name) match {
            case u: Utf8 => u.toString
            case v => v
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }
}
