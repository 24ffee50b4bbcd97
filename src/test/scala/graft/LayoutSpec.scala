package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Layout

/** Z-order layout: the Morton interleave itself (hand-computed bit
  * cases), row preservation through zorderWrite, and the property the
  * layout exists for — a selective predicate on EITHER interleaved
  * column overlaps few files, where a linear sort prunes only its own
  * leading column.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("zValue interleaves bits: bit (i*n + j) of z is bit i of column j's bucket") {
    // 2-bit buckets over [0, 3]: bucket == value, so z is the textbook
    // Morton number of (x, y)
    val df = spark.createDataFrame(Seq(
      (0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L), (2L, 1L)))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(
        (col("x"), 0.0, 3.0), (col("y"), 0.0, 3.0)), bits = 2))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((3L, 0L)) == 5L)  // x=11b -> z bits 0 and 2
    assert(got((0L, 3L)) == 10L) // y=11b -> z bits 1 and 3
    assert(got((3L, 3L)) == 15L)
    assert(got((1L, 2L)) == 9L)  // x bit0 -> z bit0; y bit1 -> z bit3
    assert(got((2L, 1L)) == 6L)  // x bit1 -> z bit2; y bit0 -> z bit1
  }

  test("nulls bucket to zero and a constant column contributes nothing") {
    val df = spark.createDataFrame(Seq((Some(2L), 7L), (None, 7L)))
      .toDF("x", "c")
      .withColumn("z", Layout.zValue(Seq(
        (col("x"), 0.0, 3.0), (col("c"), 7.0, 7.0)), bits = 2))
    val z = df.collect().map(r => (r.isNullAt(0), r.getLong(2))).toMap
    assert(z(false) == 4L) // x bucket 2 interleaved alone (c always 0)
    assert(z(true) == 0L)  // null -> bucket 0
  }

  test("zorderWrite preserves rows and prunes BOTH dimensions' bands") {
    // a 128x128 uniform grid: any selective band on x OR y should touch
    // a small fraction of z-ordered files; a linear x-sort layout prunes
    // x-bands but a y-band hits every file
    val rnd = new scala.util.Random(5)
    val rows = for (x <- 0 until 128; y <- 0 until 128)
      yield (x.toLong, y.toLong, rnd.nextInt(1000).toLong)
    val df = spark.createDataFrame(rows).toDF("x", "y", "v")
    val base = Files.createTempDirectory("graft_zorder").toString
    val zLoc = s"$base/z"
    val linLoc = s"$base/lin"
    Layout.zorderWrite(spark, df, zLoc, Seq("x", "y"), nFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(linLoc)

    // row preservation, exact
    val back = spark.read.parquet(zLoc).select("x", "y", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(back.toSeq == rows.sorted)

    val yBand = col("y") < 13        // ~10% of the y domain
    val xBand = col("x") < 13
    val linFiles = spark.read.parquet(linLoc).inputFiles.length.toLong
    assert(Layout.filesWithMatches(spark, linLoc, yBand) == linFiles,
      "the linear layout cannot prune the second dimension (the counterfactual)")
    val zY = Layout.filesWithMatches(spark, zLoc, yBand)
    val zX = Layout.filesWithMatches(spark, zLoc, xBand)
    assert(zY <= linFiles / 2, s"y-band must prune under z-order, touched $zY")
    assert(zX <= linFiles / 2, s"x-band must prune under z-order, touched $zX")
    // the 2-D box overlaps at most what either band does
    val box = Layout.filesWithMatches(spark, zLoc, xBand && yBand)
    assert(box <= math.min(zX, zY))
  }

  test("quantile quantizer keeps pruning under value skew where uniform collapses") {
    // x is VALUE-skewed (6th power of the grid coordinate): ~39% of rows
    // fall below ONE uniform bucket width, so the uniform quantizer folds
    // the whole dense region into bucket 0 — a selective band INSIDE it
    // then carries no curve resolution and scatters over most files. The
    // rank (equal-depth) quantizer spreads the same region over ~10% of
    // the rank domain and keeps the band clustered.
    def pow6(i: Long): Long = i * i * i * i * i * i
    val rows = for (i <- 0 until 128; j <- 0 until 128)
      yield (pow6(i.toLong), j.toLong, (i * 128 + j).toLong)
    val df = spark.createDataFrame(rows).toDF("x", "y", "v")
    val base = Files.createTempDirectory("graft_zskew").toString
    Layout.zorderWrite(spark, df, s"$base/uni", Seq("x", "y"), nFiles = 16)
    Layout.zorderWrite(spark, df, s"$base/rank", Seq("x", "y"), nFiles = 16,
      quantile = true)
    val band = col("x") <= pow6(12L) // coords 0..12, ~10% of rows
    // value lock before any pruning claim: both layouts hold the same rows
    def agg(p: String) = spark.read.parquet(p).filter(band)
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(agg(s"$base/uni") == agg(s"$base/rank"))
    val fUni = Layout.filesWithMatches(spark, s"$base/uni", band)
    val fRank = Layout.filesWithMatches(spark, s"$base/rank", band)
    assert(fRank * 2 <= fUni,
      s"rank buckets must at least halve the dense-band file overlap: $fRank vs $fUni")
    // ~7/16 is the inherent Morton overlap for a 1-D band × the full
    // other dimension — the same ≤-half bound the uniform-grid test pins
    assert(fRank <= 8, s"the ~10% dense band should cluster under rank buckets, got $fRank")
    // the unskewed second column prunes under BOTH quantizers
    val yBand = col("y") < 13
    assert(Layout.filesWithMatches(spark, s"$base/rank", yBand) <= 8)
  }

  test("zorderWriteAuto picks the rank arm exactly when a column is value-skewed") {
    def pow6(i: Long): Long = i * i * i * i * i * i
    val base = Files.createTempDirectory("graft_zauto").toString
    // skewed x (6th power): the densest uniform-width window holds ~39%
    // of the equal-depth cuts, far past the 25% threshold → rank
    val skewRows = for (i <- 0 until 128; j <- 0 until 128)
      yield (pow6(i.toLong), j.toLong, (i * 128 + j).toLong)
    val skewDf = spark.createDataFrame(skewRows).toDF("x", "y", "v")
    assert(Layout.zorderWriteAuto(spark, skewDf, s"$base/skew", Seq("x", "y"), nFiles = 16),
      "a 6th-power column must flag as skewed")
    // auto's layout equals the explicit rank arm's pruning on the dense band
    val band = col("x") <= pow6(12L)
    assert(Layout.filesWithMatches(spark, s"$base/skew", band) <= 8)
    // the auto write holds exactly the input rows
    assert(spark.read.parquet(s"$base/skew").agg(sum(col("v"))).head().getLong(0) ==
      skewDf.agg(sum(col("v"))).head().getLong(0))

    // uniform grid: no window concentrates mass → uniform arm
    val flatRows = for (i <- 0 until 128; j <- 0 until 128)
      yield (i.toLong, j.toLong, (i * 128 + j).toLong)
    val flatDf = spark.createDataFrame(flatRows).toDF("x", "y", "v")
    assert(!Layout.zorderWriteAuto(spark, flatDf, s"$base/flat", Seq("x", "y"), nFiles = 16),
      "an evenly-spread column must not flag as skewed")
    assert(Layout.filesWithMatches(spark, s"$base/flat", col("x") < 13) <= 8)
  }
}
