package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Sources

/** Connector-breadth spec: every source/sink round-trips real data with
  * schema fidelity, and the JDBC path proves parallel split reads against
  * an embedded Derby database (the presto-base-jdbc analog).
  */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("graft_sources").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sample = {
    val sp = spark; import sp.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5), (4L, null, 4.5))
      .toDF("id", "name", "score")
  }

  private val sampleSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv round-trip with explicit schema and header") {
    val p = s"$dir/csv_rt"
    Sources.write(sample, p, "csv") // default writer emits no header
    val noHeader = Sources.csv(spark, p, sampleSchema, header = false)
    assert(noHeader.count() == 4)
    sample.write.mode("overwrite").option("header", "true").csv(p + "_h")
    val got = Sources.csv(spark, p + "_h", sampleSchema)
    assert(got.schema == sampleSchema)
    assert(got.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.filter(col("name").isNull).count() == 1)
  }

  test("json lines round-trip with explicit schema (no inference pass)") {
    val p = s"$dir/json_rt"
    Sources.write(sample, p, "json")
    val got = Sources.jsonLines(spark, p, sampleSchema)
    assert(got.schema == sampleSchema)
    assert(got.agg(sum("score")).collect()(0).getDouble(0) == 12.0)
  }

  test("orc round-trip is self-describing") {
    val p = s"$dir/orc_rt"
    Sources.write(sample, p, "orc")
    val got = Sources.orc(spark, p)
    assert(got.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(got.count() == 4)
  }

  test("hive-partitioned write prunes on the partition key") {
    val p = s"$dir/part_rt"
    Sources.write(sample.withColumn("bucket", col("id") % 2), p, "parquet",
      partitionBy = Seq("bucket"))
    val got = Sources.parquet(spark, p).filter(col("bucket") === 1)
    assert(got.count() == 2)
    val scan = got.queryExecution.executedPlan.toString
    // directory pruning: the physical scan carries the partition filter
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"), scan)
  }

  test("jdbc parallel read against embedded Derby (presto-base-jdbc analog)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    Sources.writeJdbc(sample.na.fill("?", Seq("name")), url, "people")
    val got = Sources.jdbc(spark, url, "people",
      partitionColumn = "id", lowerBound = 1L, upperBound = 5L, numPartitions = 3)
    assert(got.rdd.getNumPartitions == 3) // split generation really happened
    assert(got.count() == 4)
    assert(got.agg(sum("score")).collect()(0).getDouble(0) == 12.0)
    val one = Sources.jdbcTable(spark, url, "people").filter(col("id") === 2)
      .collect()(0)
    assert(one.getString(1) == "beta")
  }

  test("sequencefile round-trip preserves values and the \\N null marker") {
    val p = s"$dir/seq_rt"
    Sources.writeSequenceFile(sample, p)
    val got = Sources.sequenceFile(spark, p, sampleSchema)
    assert(got.schema == sampleSchema)
    val rows = got.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("alpha"), Some("beta"), Some("gamma"), None),
      "the null name must survive the \\N serde marker")
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, 2.5, 3.5, 4.5))
  }

  test("rcfile round-trip preserves values and nulls through the columnar layout") {
    val p = s"$dir/rc_rt"
    Sources.writeRcText(sample, p)
    val got = Sources.rcText(spark, p, sampleSchema)
    assert(got.schema == sampleSchema)
    val rows = got.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("alpha"), Some("beta"), Some("gamma"), None))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, 2.5, 3.5, 4.5))
  }

  test("text source reads whole lines for decoder layering") {
    val p = s"$dir/text_rt"
    sample.select(concat_ws(",", col("id"), col("score")).as("value"))
      .write.mode("overwrite").text(p)
    val got = Sources.text(spark, p)
      .select(split(col("value"), ",").getItem(0).cast("long").as("id"))
    assert(got.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
