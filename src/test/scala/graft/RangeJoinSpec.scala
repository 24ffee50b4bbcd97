package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.RangeJoin

/** The bucketed point-in-interval join must be VALUE-IDENTICAL to the
  * naive theta join it replaces (same contract as every other scale-path
  * vs baseline pair: minhashLsh↔jaccardPairs, assignByAnn↔assignByJoin),
  * across bucket widths, boundary values, invalid intervals, and nulls.
  */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pts(rows: Seq[(Long, Double)]) =
    spark.createDataFrame(rows).toDF("pid", "x")
  private def ivs(rows: Seq[(Long, Double, Double)]) =
    spark.createDataFrame(rows).toDF("iid", "lo", "hi")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the naive theta join on seeded random workloads, auto and explicit widths") {
    for (seed <- Seq(42, 7, 1234)) {
      val rnd = new scala.util.Random(seed)
      val p = pts((0 until 500).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200)))
      val i = ivs((0 until 80).map { j =>
        val lo = rnd.nextDouble() * 900 - 200
        (j.toLong, lo, lo + rnd.nextDouble() * 60)
      })
      val naive = pairsOf(p.join(i, col("x") >= col("lo") && col("x") <= col("hi")))
      assert(naive.nonEmpty, s"seed $seed must produce matches")
      for (w <- Seq(0.0, 1.0, 30.0, 5000.0)) { // auto, narrow, ~span, one-bucket-for-everything
        val got = pairsOf(RangeJoin.pointInInterval(p, "x", i, "lo", "hi", bucketWidth = w))
        assert(got == naive, s"seed $seed width $w diverges from the theta join")
      }
    }
  }

  test("BETWEEN contract: inclusive bounds, hi<lo and null bounds/points match nothing") {
    val p = pts(Seq((1L, 10.0), (2L, 20.0), (3L, 15.0)))
      .unionByName(spark.sql("SELECT 4L AS pid, CAST(NULL AS DOUBLE) AS x"))
    val i = ivs(Seq((100L, 10.0, 20.0), (200L, 30.0, 25.0)))
      .unionByName(spark.sql("SELECT 300L AS iid, CAST(NULL AS DOUBLE) AS lo, 99.0 AS hi"))
    val got = pairsOf(RangeJoin.pointInInterval(p, "x", i, "lo", "hi"))
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L)),
      "both endpoints are inclusive; inverted/null intervals and null points drop")
  }

  test("empty interval table yields an empty result with the joined schema") {
    val p = pts(Seq((1L, 10.0)))
    val got = RangeJoin.pointInInterval(p, "x", ivs(Nil), "lo", "hi")
    assert(got.columns.toSeq == Seq("pid", "x", "iid", "lo", "hi"))
    assert(got.count() == 0)
  }

  test("a domain-spanning interval with a tiny width fails loudly, not quadratically") {
    val p = pts(Seq((1L, 10.0)))
    val i = ivs(Seq((100L, 0.0, 1e9)))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "x", i, "lo", "hi", bucketWidth = 1.0)
    }
    assert(e.getMessage.contains("raise bucketWidth"))
  }

  test("overlapping column names are refused up front") {
    val p = pts(Seq((1L, 10.0)))
    val i = ivs(Seq((100L, 0.0, 20.0))).withColumnRenamed("iid", "pid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "x", i, "lo", "hi")
    }
    assert(e.getMessage.contains("rename overlapping columns"))
  }

  test("each qualifying pair is emitted exactly once even when an interval spans many buckets") {
    val p = pts(Seq((1L, 55.0)))
    val i = ivs(Seq((100L, 0.0, 100.0)))
    // width 10 → the interval replicates into 11 buckets; the point must
    // still match once (it lives in exactly one bucket)
    val got = RangeJoin.pointInInterval(p, "x", i, "lo", "hi", bucketWidth = 10.0)
    assert(got.count() == 1)
  }

  test("left-outer variant: unmatched and null points survive once with null interval columns") {
    val rnd = new scala.util.Random(42)
    val p = pts((0 until 300).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200)))
      .unionByName(spark.sql("SELECT 999L AS pid, CAST(NULL AS DOUBLE) AS x"))
    val i = ivs((0 until 40).map { j =>
      val lo = rnd.nextDouble() * 900 - 200
      (j.toLong, lo, lo + rnd.nextDouble() * 60)
    })
    val naive = p.join(i, col("x") >= col("lo") && col("x") <= col("hi"), "left")
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    for (w <- Seq(0.0, 25.0)) {
      val got = RangeJoin.pointInIntervalLeft(p, "x", i, "lo", "hi", bucketWidth = w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(got.sorted == naive.sorted, s"width $w diverges from the naive left join")
    }
    // empty interval table: every point survives, nulls across
    val none = RangeJoin.pointInIntervalLeft(p, "x", ivs(Nil), "lo", "hi")
    assert(none.count() == p.count())
    assert(none.filter(col("iid").isNotNull).count() == 0)
  }

  private def ivsB(rows: Seq[(Long, Double, Double)]) =
    spark.createDataFrame(rows).toDF("jid", "lo2", "hi2")

  test("interval overlap matches the naive theta join across widths, each pair exactly once") {
    val rnd = new scala.util.Random(13)
    val a = ivs((0 until 150).map { j =>
      val lo = rnd.nextDouble() * 800 - 100
      (j.toLong, lo, lo + rnd.nextDouble() * 80)
    })
    val b = ivsB((0 until 120).map { j =>
      val lo = rnd.nextDouble() * 800 - 100
      (j.toLong, lo, lo + rnd.nextDouble() * 40)
    })
    val naive = a.join(b, col("lo") <= col("hi2") && col("lo2") <= col("hi"))
      .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive.nonEmpty && naive.size == naive.toSet.size)
    for (w <- Seq(0.0, 5.0, 60.0, 3000.0)) {
      val got = RangeJoin.intervalOverlap(a, "lo", "hi", b, "lo2", "hi2", bucketWidth = w)
        .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.toSet.size, s"width $w emitted a duplicate pair")
      assert(got.toSet == naive.toSet, s"width $w diverges from the theta join")
    }
  }

  test("zero-span intervals under auto width run as an equi join, not one giant bucket") {
    // equality-as-interval: every interval is a point. The old auto width
    // floored at Double.MinPositiveValue, collapsing EVERY value into one
    // or two buckets — a silent near-cross join. Now: plain equi join.
    val p = pts(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 10.0)))
    val i = ivs(Seq((100L, 10.0, 10.0), (200L, 20.0, 20.0), (300L, 99.0, 99.0)))
    val got = RangeJoin.pointInInterval(p, "x", i, "lo", "hi")
    assert(pairsOf(got) == Set((1L, 100L), (4L, 100L), (2L, 200L)))
    assert(got.queryExecution.executedPlan.toString.contains("HashedRelation") ||
      !got.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "the fallback must be a hash join, not a nested loop")
    // left-outer variant keeps unmatched points
    val left = RangeJoin.pointInIntervalLeft(p, "x", i, "lo", "hi")
    assert(left.count() == 4)
    assert(left.filter(col("pid") === 3L && col("iid").isNull).count() == 1)
    // overlap variant: two point sets overlap iff equal
    val b = ivsB(Seq((7L, 10.0, 10.0), (8L, 50.0, 50.0)))
    val ov = RangeJoin.intervalOverlap(i, "lo", "hi", b, "lo2", "hi2")
      .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ov == Set((100L, 7L)))
  }

  test("a tiny explicit width over a wide domain refuses on bucket-id overflow") {
    // 1e-300-wide buckets over values ~1e3: every floor(x/w) saturates the
    // long cast to Long.MaxValue — one giant bucket, silently quadratic.
    // Zero-span intervals so the replication cap (which fires first on any
    // spanning interval) stays quiet and the overflow guard is what trips.
    val p = pts(Seq((1L, 500.0)))
    val i = ivs(Seq((100L, 500.0, 500.0)))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "x", i, "lo", "hi", bucketWidth = 1e-300)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("timestamp domains: event times into session windows, auto width") {
    // the temporal shape of the declared events_time_in_window query:
    // double-cast timestamps bucket as epoch seconds
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val p = spark.createDataFrame(
      (0 until 200).map(m => (m.toLong, ts(m.toLong)))).toDF("pid", "t")
    val i = spark.createDataFrame(Seq(
      (100L, ts(10), ts(40)), (200L, ts(35), ts(60)), (300L, ts(180), ts(500))))
      .toDF("iid", "w_lo", "w_hi")
    val naive = p.join(i, col("t") >= col("w_lo") && col("t") <= col("w_hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangeJoin.pointInInterval(p, "t", i, "w_lo", "w_hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("interval overlap includes touching endpoints and drops inverted intervals") {
    val a = ivs(Seq((1L, 0.0, 10.0), (2L, 50.0, 40.0)))
    val b = ivsB(Seq((7L, 10.0, 20.0), (8L, 11.0, 20.0)))
    val got = RangeJoin.intervalOverlap(a, "lo", "hi", b, "lo2", "hi2")
      .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L)), "hi == lo2 touches (closed intervals); inverted a#2 never matches")
  }
}
