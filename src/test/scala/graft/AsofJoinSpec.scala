package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.AsofJoin

/** The windowed as-of operator must be VALUE-IDENTICAL to the naive
  * per-row formulation (left-join on key + range predicate, then max by
  * (time, tiebreak) per left row) it replaces — the same scale-path vs
  * baseline lock as RangeJoinSpec, plus the edge contract: inclusive
  * bounds, deterministic ties, null keys/times, empty right side.
  */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def lhs(rows: Seq[(Long, Long, Long)]) = // (k, lid, lt)
    spark.createDataFrame(rows).toDF("k", "lid", "lt")
  private def rhs(rows: Seq[(Long, Long, Long)]) = // (k, rt, v)
    spark.createDataFrame(rows).toDF("k", "rt", "v")

  /** Naive baseline: theta left-join + per-left-row argmax on (rt, v). */
  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Long])] =
    l.join(r, l("k") === r("k") && col("rt") <= col("lt"), "left")
      .groupBy(l("k").as("k"), col("lid"), col("lt"))
      .agg(max(struct(col("rt"), col("v"))).as("m"))
      .select(col("k"), col("lid"), col("m").getField("v").as("v"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet

  private def got(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Long])] =
    AsofJoin.backward(l, r, on = Seq("k"), leftTime = "lt", rightTime = "rt",
        payload = Seq("v"), rightTiebreak = Seq("v"))
      .select("k", "lid", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet

  test("matches the naive per-row argmax on a seeded random workload") {
    val rnd = new scala.util.Random(7)
    val l = lhs((0 until 400).map(i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(100).toLong)))
    val r = rhs((0 until 300).map(j =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, j.toLong + 1000)))
    val n = naive(l, r)
    assert(n.exists(_._3.isDefined) && n.exists(_._3.isEmpty),
      "workload must exercise both matched and unmatched rows")
    assert(got(l, r) == n)
  }

  test("inclusive bound and deterministic max-tiebreak on tied timestamps") {
    val l = lhs(Seq((1L, 10L, 50L)))
    val r = rhs(Seq((1L, 50L, 7L), (1L, 50L, 9L), (1L, 49L, 8L)))
    // rt == lt matches (inclusive); among the two rt=50 rows the larger v wins
    assert(got(l, r) == Set((1L, 10L, Some(9L))))
  }

  test("null left key/time rows come back unmatched, never dropped; null right rows never match") {
    val l = spark.sql(
      """SELECT * FROM VALUES (1L, 10L, 50L), (CAST(NULL AS BIGINT), 11L, 50L),
        |(1L, 12L, CAST(NULL AS BIGINT)) AS t(k, lid, lt)""".stripMargin)
    val r = spark.sql(
      """SELECT * FROM VALUES (1L, 40L, 5L), (1L, CAST(NULL AS BIGINT), 6L),
        |(CAST(NULL AS BIGINT), 40L, 7L) AS t(k, rt, v)""".stripMargin)
    val out = AsofJoin.backward(l, r, Seq("k"), "lt", "rt", Seq("v"), Seq("v"))
      .select("lid", "v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(out == Map(10L -> Some(5L), 11L -> None, 12L -> None),
      "one row out per row in; only the valid (key, time) pair matches the valid right row")
  }

  test("empty right side preserves every left row with a null payload") {
    val l = lhs(Seq((1L, 10L, 50L), (2L, 11L, 60L)))
    assert(got(l, rhs(Nil)) == Set((1L, 10L, None), (2L, 11L, None)))
  }

  test("forward matches the naive per-row argmin on a seeded random workload") {
    val rnd = new scala.util.Random(11)
    val l = lhs((0 until 400).map(i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(100).toLong)))
    val r = rhs((0 until 300).map(j =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, j.toLong + 1000)))
    // naive forward: earliest rt >= lt; ties by MAX v → min over (rt, -v)
    val naive = l.join(r, l("k") === r("k") && col("rt") >= col("lt"), "left")
      .groupBy(l("k").as("k"), col("lid"), col("lt"))
      .agg(min(struct(col("rt"), (-col("v")).as("nv"))).as("m"))
      .select(col("k"), col("lid"), (-col("m.nv")).as("v"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
    val fwd = AsofJoin.forward(l, r, Seq("k"), "lt", "rt", Seq("v"), Seq("v"))
      .select("k", "lid", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
    assert(naive.exists(_._3.isDefined) && naive.exists(_._3.isEmpty))
    assert(fwd == naive)
  }

  test("forward is inclusive and resolves ties to the max tiebreak") {
    val l = lhs(Seq((1L, 10L, 50L)))
    val r = rhs(Seq((1L, 50L, 7L), (1L, 50L, 9L), (1L, 51L, 8L)))
    val got = AsofJoin.forward(l, r, Seq("k"), "lt", "rt", Seq("v"), Seq("v"))
      .select("lid", "v").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(10L -> 9L), "rt == lt matches; max v wins among the tied rt=50 rows")
  }

  test("within tolerance: out-of-tolerance matches come back unmatched, not dropped") {
    val l = lhs(Seq((1L, 10L, 50L), (1L, 11L, 90L)))
    val r = rhs(Seq((1L, 47L, 5L), (1L, 60L, 6L)))
    // backward with |lt - rt| <= 5: lid 10 matches rt=47 (gap 3); lid 11's
    // nearest prior is rt=60 (gap 30) — nulled, the row survives
    val got = AsofJoin.backward(l, r, Seq("k"), "lt", "rt", Seq("v"), Seq("v"),
        within = Some((lt, rt) => lt - rt <= 5))
      .select("lid", "v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map(10L -> Some(5L), 11L -> None))
    // merge_asof contract: the NEAREST match is judged — a nearer
    // out-of-tolerance row hides a farther in-tolerance one
    val r2 = rhs(Seq((1L, 44L, 7L), (1L, 49L, 8L)))
    val got2 = AsofJoin.backward(l.filter(col("lid") === 10L), r2,
        Seq("k"), "lt", "rt", Seq("v"), Seq("v"),
        within = Some((lt, rt) => lt - rt <= 3))
      .select("lid", "v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got2 == Map(10L -> Some(8L)), "rt=49 (gap 1) is nearest and in tolerance")
  }

  /** Null-key-safe extractor: (k?, lid, v?) — the equivalence corpus below
    * deliberately includes null-key left rows, which `got` cannot hold. */
  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Option[Long], Long, Option[Long])] =
    df.select("k", "lid", "v").collect()
      .map(x => (if (x.isNullAt(0)) None else Some(x.getLong(0)), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet

  test("two-phase sliced arm ≡ the single-window arm across slice widths") {
    val rnd = new scala.util.Random(99)
    // hot key 0 carries ~half of both sides — the skew shape the sliced
    // arm exists for — plus nulls on both sides and tie-dense times
    def key() = if (rnd.nextBoolean()) 0L else rnd.nextInt(10).toLong + 1L
    val l = lhs((0 until 600).map(i => (key(), i.toLong, rnd.nextInt(50).toLong)))
      .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) k, 9999L lid, 5L lt"))
      .unionByName(spark.sql("SELECT 3L k, 9998L lid, CAST(NULL AS BIGINT) lt"))
    val r = rhs((0 until 400).map(j => (key(), rnd.nextInt(50).toLong, j.toLong)))
      .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) k, 7L rt, 777L v"))
    val expected = rowsOf(AsofJoin.backward(l, r, on = Seq("k"),
      leftTime = "lt", rightTime = "rt", payload = Seq("v"),
      rightTiebreak = Seq("v")))
    // widths: sub-unit (every time its own slice), mid, and wider than
    // the whole 0..49 domain (degenerates to the single-window plan)
    for (w <- Seq(1.0, 7.0, 1000.0)) {
      val sliced = rowsOf(AsofJoin.backwardSliced(l, r, on = Seq("k"),
        leftTime = "lt", rightTime = "rt", payload = Seq("v"),
        sliceWidth = w, rightTiebreak = Seq("v")))
      assert(sliced == expected, s"sliceWidth $w diverges")
    }
  }

  test("forward sliced arm ≡ the single-window forward arm across slice widths") {
    val rnd = new scala.util.Random(311)
    def key() = if (rnd.nextBoolean()) 0L else rnd.nextInt(10).toLong + 1L
    val l = lhs((0 until 600).map(i => (key(), i.toLong, rnd.nextInt(50).toLong)))
      .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) k, 9999L lid, 5L lt"))
    val r = rhs((0 until 400).map(j => (key(), rnd.nextInt(50).toLong, j.toLong)))
    val expected = rowsOf(AsofJoin.forward(l, r, on = Seq("k"),
      leftTime = "lt", rightTime = "rt", payload = Seq("v"),
      rightTiebreak = Seq("v")))
    for (w <- Seq(1.0, 7.0, 1000.0)) {
      val sliced = rowsOf(AsofJoin.forwardSliced(l, r, on = Seq("k"),
        leftTime = "lt", rightTime = "rt", payload = Seq("v"),
        sliceWidth = w, rightTiebreak = Seq("v")))
      assert(sliced == expected, s"forward sliceWidth $w diverges")
    }
  }

  test("sliced arm honors the within tolerance on the resolved nearest match") {
    val l = lhs(Seq((1L, 10L, 100L), (1L, 11L, 30L)))
    val r = rhs(Seq((1L, 95L, 5L), (1L, 10L, 6L)))
    val within = Some((lt: org.apache.spark.sql.Column,
        rt: org.apache.spark.sql.Column) => lt - rt <= 10L)
    val base = AsofJoin.backward(l, r, Seq("k"), "lt", "rt", Seq("v"),
        within = within)
      .select("lid", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    val sliced = AsofJoin.backwardSliced(l, r, Seq("k"), "lt", "rt", Seq("v"),
        sliceWidth = 20.0, within = within)
      .select("lid", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(base == Set((10L, Some(5L)), (11L, None)),
      "lid 11's nearest (rt=6, 24 back) is out of tolerance -> unmatched")
    assert(sliced == base)
    // the forward direction shares the tolerance path: view at 10 probes
    // forward; nearest following right is rt=95 (85 ahead) -> out of a
    // 10-step tolerance; at 90 the same match is within it
    val fwd = Some((lt: org.apache.spark.sql.Column,
        rt: org.apache.spark.sql.Column) => rt - lt <= 10L)
    val fl = lhs(Seq((1L, 20L, 10L), (1L, 21L, 90L)))
    val fr = rhs(Seq((1L, 95L, 7L)))
    val fBase = AsofJoin.forward(fl, fr, Seq("k"), "lt", "rt", Seq("v"), within = fwd)
      .select("lid", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    val fSliced = AsofJoin.forwardSliced(fl, fr, Seq("k"), "lt", "rt", Seq("v"),
        sliceWidth = 20.0, within = fwd)
      .select("lid", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(fBase == Set((20L, None), (21L, Some(7L))))
    assert(fSliced == fBase)
  }

  test("auto ≡ backward ≡ backwardSliced on skewed and unskewed corpora; the plan picks by measurement") {
    val rnd = new scala.util.Random(513)
    // skewed: hot key 0 carries ~half of both sides; unskewed: uniform keys
    def mk(hot: Boolean) = {
      def key() = if (hot && rnd.nextBoolean()) 0L else rnd.nextInt(10).toLong + 1L
      val l = lhs((0 until 600).map(i => (key(), i.toLong, rnd.nextInt(50).toLong)))
        .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) k, 9999L lid, 5L lt"))
      val r = rhs((0 until 400).map(j => (key(), rnd.nextInt(50).toLong, j.toLong)))
      (l, r)
    }
    for (hot <- Seq(true, false)) {
      val (l, r) = mk(hot)
      val expected = rowsOf(AsofJoin.backward(l, r, Seq("k"), "lt", "rt",
        Seq("v"), rightTiebreak = Seq("v")))
      // force BOTH arms through auto with a budget bracketing the hot key
      for (budget <- Seq(5L, 1000000L)) {
        val a = rowsOf(AsofJoin.auto(l, r, Seq("k"), "lt", "rt", Seq("v"),
          rightTiebreak = Seq("v"), maxKeyRowsPerTask = budget))
        assert(a == expected, s"auto diverges (hot=$hot, budget=$budget)")
      }
      // and forward too
      val fExpected = rowsOf(AsofJoin.forward(l, r, Seq("k"), "lt", "rt",
        Seq("v"), rightTiebreak = Seq("v")))
      val fAuto = rowsOf(AsofJoin.auto(l, r, Seq("k"), "lt", "rt", Seq("v"),
        rightTiebreak = Seq("v"), forward = true, maxKeyRowsPerTask = 5L))
      assert(fAuto == fExpected, s"forward auto diverges (hot=$hot)")
    }
    // the decision itself: the hottest key's measured rows drive the arm
    val (l, r) = mk(true)
    val hotRows = l.filter(col("k") === 0L).count() + r.filter(col("k") === 0L).count()
    val pSingle = AsofJoin.plan(l, r, Seq("k"), "lt", "rt",
      maxKeyRowsPerTask = hotRows)
    assert(!pSingle.sliced && pSingle.maxKeyRows == hotRows,
      "a budget at the hot key's size keeps the single-window arm")
    val pSliced = AsofJoin.plan(l, r, Seq("k"), "lt", "rt",
      maxKeyRowsPerTask = hotRows - 1)
    assert(pSliced.sliced && pSliced.sliceWidth > 0,
      "a budget below the hot key switches to the sliced arm")
    assert(pSliced.span > 0 && pSliced.sliceWidth <= pSliced.span / 16,
      "the derived width spreads the history over >= 16 slices")
    // degenerate histories never slice: a single shared timestamp has no
    // span, and empty inputs have no stats
    val flat = AsofJoin.plan(
      lhs(Seq((0L, 1L, 5L), (0L, 2L, 5L))), rhs(Seq((0L, 5L, 9L))),
      Seq("k"), "lt", "rt", maxKeyRowsPerTask = 1L)
    assert(!flat.sliced, "zero-span history cannot be sliced by time")
    assert(!AsofJoin.plan(lhs(Nil), rhs(Nil), Seq("k"), "lt", "rt").sliced)

    // the SAMPLED stats pass: scaled estimate, same rows through auto
    // either way (semantics never depend on the arm), and degenerate
    // fractions refused
    val pS = AsofJoin.plan(l, r, Seq("k"), "lt", "rt",
      maxKeyRowsPerTask = hotRows - 1, statsSampleFraction = 0.5)
    assert(pS.maxKeyRows > 0, "the sampled estimate scales back by 1/f")
    // only the COUNT is sampled: span (hence slice sizing) comes from
    // an exact full-union min/max, so a sample that misses the extremes
    // can never under-size the slices — the sampled plan's span equals
    // the exact plan's, bit for bit
    assert(pS.span == pSliced.span,
      s"sampled span ${pS.span} must equal the exact span ${pSliced.span}")
    val expected = rowsOf(AsofJoin.backward(l, r, Seq("k"), "lt", "rt",
      Seq("v"), rightTiebreak = Seq("v")))
    val aS = rowsOf(AsofJoin.auto(l, r, Seq("k"), "lt", "rt", Seq("v"),
      rightTiebreak = Seq("v"), maxKeyRowsPerTask = 5L,
      statsSampleFraction = 0.5))
    assert(aS == expected, "sampled-plan auto must return identical rows")
    intercept[IllegalArgumentException](
      AsofJoin.plan(l, r, Seq("k"), "lt", "rt", statsSampleFraction = 0.0))
    intercept[IllegalArgumentException](
      AsofJoin.plan(l, r, Seq("k"), "lt", "rt", statsSampleFraction = 1.5))
  }

  test("colliding payload names are refused up front") {
    val l = lhs(Seq((1L, 10L, 50L)))
    val r = rhs(Seq((1L, 40L, 5L))).withColumnRenamed("v", "lid")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(l, r, Seq("k"), "lt", "rt", Seq("lid"))
    }
    assert(e.getMessage.contains("rename first"))
  }
}
