package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{TimestampTz => Tz}

/** The packed timestamp-with-time-zone value type: encoding roundtrips
  * (including pre-1970 instants through the arithmetic shift), reference
  * at_timezone semantics, DST wall-clock presentation, and instant-based
  * ordering across zones.
  */
class TimestampTzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(colv: org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    val sp = spark; import sp.implicits._
    Seq(1).toDF("x").select(colv.as("v")).collect()(0)
  }

  test("pack/unpack roundtrips instant and zone, including pre-1970") {
    val ts = to_timestamp(lit("1960-06-01 12:00:00.250"))
    val packed = Tz.pack(ts, lit("Asia/Tokyo"))
    assert(one(Tz.instantMillis(packed)).getLong(0) ==
      java.time.Instant.parse("1960-06-01T12:00:00.250Z").toEpochMilli)
    assert(one(Tz.zoneId(packed)).getString(0) == "Asia/Tokyo")
  }

  test("at_timezone preserves the instant and changes only the presentation") {
    val ts = to_timestamp(lit("2021-07-01 00:00:00"))
    val la = Tz.pack(ts, lit("America/Los_Angeles"))
    val re = Tz.atTimezone(la, lit("Asia/Kathmandu"))
    assert(one(Tz.instantMillis(re) === Tz.instantMillis(la)).getBoolean(0))
    assert(one(Tz.toVarchar(re)).getString(0) ==
      "2021-07-01 05:45:00.000 Asia/Kathmandu")
    assert(one(Tz.toVarchar(la)).getString(0) ==
      "2021-06-30 17:00:00.000 America/Los_Angeles")
  }

  test("DST spring-forward: the skipped LA hour never appears in wall time") {
    // 2021-03-14 10:00 UTC is 2am PST → clocks jump to 3am PDT
    val before = Tz.pack(to_timestamp(lit("2021-03-14 09:30:00")), lit("America/Los_Angeles"))
    val after = Tz.pack(to_timestamp(lit("2021-03-14 10:30:00")), lit("America/Los_Angeles"))
    assert(one(Tz.toVarchar(before)).getString(0)
      .startsWith("2021-03-14 01:30:00.000"))
    assert(one(Tz.toVarchar(after)).getString(0)
      .startsWith("2021-03-14 03:30:00.000"))
    assert(one(Tz.extract("hour", after)).getLong(0) == 3L)
  }

  test("unknown zone packs to NULL (TRY-style), not an error") {
    val packed = Tz.pack(to_timestamp(lit("2021-01-01 00:00:00")), lit("Mars/Olympus"))
    assert(one(isnull(packed)).getBoolean(0))
  }

  test("ordering across zones is by instant, not by wall time or zone key") {
    val sp = spark; import sp.implicits._
    // Tokyo wall 09:00 on Jan 2 = 00:00Z Jan 2; LA wall 17:00 Jan 1 = 01:00Z Jan 2
    val rows = Seq(
      ("tokyo", "2021-01-02 00:00:00", "Asia/Tokyo"),
      ("la", "2021-01-02 01:00:00", "America/Los_Angeles"),
      ("utc", "2021-01-01 23:00:00", "UTC")).toDF("name", "ts", "zone")
    val ordered = rows
      .select(col("name"), Tz.pack(to_timestamp(col("ts")), col("zone")).as("p"))
      .orderBy(Tz.instantMillis(col("p")).asc)
      .collect().map(_.getString(0)).toSeq
    assert(ordered == Seq("utc", "tokyo", "la"))
  }
}
