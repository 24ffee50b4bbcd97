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
