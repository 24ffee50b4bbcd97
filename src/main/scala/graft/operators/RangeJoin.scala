package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the scale path for the range-predicate
  * joins the reference executes as a nested loop
  * (`presto-main/.../operator/NestedLoopJoinOperator.java`, with the range
  * filter applied post-product) and Spark likewise plans as
  * BroadcastNestedLoopJoin. A nested loop is O(|points| × |intervals|)
  * regardless of selectivity — correct and fine for a 25-row dimension,
  * a cluster-killer when both sides are large.
  *
  * The bucket trick turns it into one EQUI join: quantize the domain into
  * buckets of width `w`; an interval [lo, hi] is replicated into the
  * ⌈span/w⌉+1 buckets it overlaps, a point belongs to exactly ONE bucket,
  * the join runs hash-partitioned on the bucket id, and the exact
  * `lo ≤ p ≤ hi` predicate verifies survivors. Because a point has a
  * single bucket, each qualifying (point, interval) pair is emitted
  * exactly once — no dedup pass. Cost: shuffle ∝ |points| +
  * |intervals| × avg(span)/w, then per-bucket hash probes; both sides
  * scale out with ordinary shuffle parallelism, and AQE's skew split
  * applies to hot buckets like any other shuffle join.
  *
  * Bucket width defaults to the intervals' AVERAGE span (computed with one
  * bounded 1-row aggregate on the interval table — the same scalar-stats
  * discipline as the LSH index sizing), which keeps expected interval
  * replication ≈ 2 rows. `maxBucketsPerInterval` refuses a pathological
  * width choice loudly (one domain-spanning interval with a tiny `w` would
  * replicate into millions of rows) rather than letting the explode run
  * away — the [[graft.llm.Dedup.guardQuadratic]] stance applied to
  * interval replication.
  */
object RangeJoin {

  /** Inner-join `points` to every row of `intervals` whose
    * [`loCol`, `hiCol`] contains `pointCol` (both bounds inclusive, the
    * SQL BETWEEN contract; intervals with hi < lo match nothing, and NULL
    * bounds or points never match). Output columns = points' ++ intervals'
    * (names must be disjoint).
    *
    * @param bucketWidth           quantization width; <= 0 means auto
    *                              (average interval span)
    * @param maxBucketsPerInterval loud upper bound on the replication of
    *                              one interval
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double = 0.0,
      maxBucketsPerInterval: Int = 10000): DataFrame =
    pointInIntervalJoin(points, pointCol, intervals, loCol, hiCol,
      bucketWidth, maxBucketsPerInterval, leftOuter = false)

  /** LEFT OUTER enrichment variant: points matching no interval (and
    * points with a NULL value) come back once with null interval columns
    * instead of dropping — the lookup-table shape (IP→geo, price→band)
    * where the unmatched rows must survive. Same bucket mechanics: a
    * point has exactly one bucket, so matched points emit once per
    * containing interval and unmatched points exactly once.
    */
  def pointInIntervalLeft(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double = 0.0,
      maxBucketsPerInterval: Int = 10000): DataFrame =
    pointInIntervalJoin(points, pointCol, intervals, loCol, hiCol,
      bucketWidth, maxBucketsPerInterval, leftOuter = true)

  private def pointInIntervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int,
      leftOuter: Boolean): DataFrame = {
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval output flattens both sides; rename overlapping columns first: ${overlap.mkString(", ")}")

    val iv = intervals.filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
      col(loCol) <= col(hiCol))

    // One bounded 1-row stats action on the INTERVAL table (never the
    // points): average span sizes the bucket, max span guards replication,
    // max |bound| guards bucket-id overflow.
    val stats = iv.agg(
      avg(col(hiCol).cast("double") - col(loCol).cast("double")).as("avg_span"),
      max(col(hiCol).cast("double") - col(loCol).cast("double")).as("max_span"),
      max(greatest(abs(col(loCol).cast("double")), abs(col(hiCol).cast("double"))))
        .as("max_abs"))
      .collect()(0)
    if (stats.isNullAt(0)) { // no valid intervals
      return if (!leftOuter) emptyResult(points, iv)
      else points.select(points.columns.toSeq.map(col) ++
        intervals.schema.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    }
    if (bucketWidth <= 0 && stats.getDouble(0) == 0.0) {
      // All valid intervals are zero-span — exact keys in interval
      // clothing (equality-as-interval lookups). There is no data-derived
      // width; the old Double.MinPositiveValue floor collapsed every
      // value into one or two buckets (a silent near-cross join that
      // still passed the replication guard, max_span/w = 0). A zero-span
      // interval IS its bound, so run the plain equi join instead.
      val cond = points(pointCol) === iv(loCol)
      return if (!leftOuter) points.filter(col(pointCol).isNotNull).join(iv, cond)
      else points.join(iv, cond, "left_outer")
    }
    val w =
      if (bucketWidth > 0) bucketWidth
      else stats.getDouble(0)
    val worst = stats.getDouble(1) / w
    require(worst <= maxBucketsPerInterval,
      f"pointInInterval: an interval spans $worst%.0f buckets at width $w%s " +
        f"(cap $maxBucketsPerInterval%d) — raise bucketWidth or split the interval")
    // a tiny width against a wide domain silently saturates the LONG cast
    // (every bucket id becomes Long.MaxValue — one giant bucket); refuse
    require(stats.getDouble(2) / w < 4.0e18,
      f"pointInInterval: bucket ids overflow at width $w%s over a domain " +
        f"reaching ${stats.getDouble(2)}%s — pass a larger explicit bucketWidth")

    val ivB = iv.withColumn("__rj_bucket",
      explode(sequence(
        floor(col(loCol).cast("double") / w).cast("long"),
        floor(col(hiCol).cast("double") / w).cast("long"))))
    if (!leftOuter) {
      val ptB = points
        .filter(col(pointCol).isNotNull)
        .withColumn("__rj_bucket", floor(col(pointCol).cast("double") / w).cast("long"))
      ptB.join(ivB, Seq("__rj_bucket"))
        .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
        .drop("__rj_bucket")
    } else {
      // the range predicate rides IN the join condition so an unmatched
      // (or null-valued) point emits exactly one null-extended row; a
      // null point gets a null bucket, which matches nothing
      val ivB2 = ivB.withColumnRenamed("__rj_bucket", "__rj_bucket_r")
      points
        .withColumn("__rj_bucket", floor(col(pointCol).cast("double") / w).cast("long"))
        .join(ivB2,
          col("__rj_bucket") === col("__rj_bucket_r") &&
            col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol),
          "left_outer")
        .drop("__rj_bucket", "__rj_bucket_r")
    }
  }

  /** Interval-overlap join — every (left, right) pair whose closed
    * intervals intersect: `lLo ≤ rHi AND rLo ≤ lHi`. Both sides
    * replicate into their covering buckets, so one true pair can collide
    * in SEVERAL buckets; the classic dedup rule makes each pair emit
    * exactly once without a distinct pass: the overlap's START,
    * `greatest(lLo, rLo)`, lies inside both intervals, so both copies
    * exist in its bucket and ONLY that bucket's collision is kept. Width
    * auto-sizes to the average span across both sides (one 1-row stats
    * aggregate); the same replication cap guards pathological widths.
    */
  def intervalOverlap(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      bucketWidth: Double = 0.0,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"intervalOverlap output flattens both sides; rename overlapping columns first: ${overlapCols.mkString(", ")}")

    def valid(lo: String, hi: String) =
      col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi)
    val l = left.filter(valid(lLo, lHi))
    val r = right.filter(valid(rLo, rHi))

    val spans = l.select((col(lHi).cast("double") - col(lLo).cast("double")).as("s"),
        greatest(abs(col(lLo).cast("double")), abs(col(lHi).cast("double"))).as("b"))
      .unionByName(r.select((col(rHi).cast("double") - col(rLo).cast("double")).as("s"),
        greatest(abs(col(rLo).cast("double")), abs(col(rHi).cast("double"))).as("b")))
    val stats = spans.agg(avg(col("s")).as("a"), max(col("s")).as("m"),
      max(col("b")).as("max_abs")).collect()(0)
    if (stats.isNullAt(0)) return left.limit(0).crossJoin(right.limit(0))
    if (bucketWidth <= 0 && stats.getDouble(0) == 0.0) {
      // every interval on BOTH sides is zero-span: two point sets overlap
      // iff equal — the equi join, not an arbitrary quantization (see
      // pointInIntervalJoin's zero-span note)
      return l.join(r, l(lLo) === r(rLo))
    }
    val w =
      if (bucketWidth > 0) bucketWidth
      else stats.getDouble(0)
    val worst = stats.getDouble(1) / w
    require(worst <= maxBucketsPerInterval,
      f"intervalOverlap: an interval spans $worst%.0f buckets at width $w%s " +
        f"(cap $maxBucketsPerInterval%d) — raise bucketWidth or split the interval")
    require(stats.getDouble(2) / w < 4.0e18,
      f"intervalOverlap: bucket ids overflow at width $w%s over a domain " +
        f"reaching ${stats.getDouble(2)}%s — pass a larger explicit bucketWidth")

    def buckets(lo: String, hi: String) = explode(sequence(
      floor(col(lo).cast("double") / w).cast("long"),
      floor(col(hi).cast("double") / w).cast("long")))
    val lB = l.withColumn("__rj_bucket", buckets(lLo, lHi))
    val rB = r.withColumn("__rj_bucket", buckets(rLo, rHi))
    lB.join(rB, Seq("__rj_bucket"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(floor(greatest(col(lLo), col(rLo)).cast("double") / w).cast("long") ===
        col("__rj_bucket"))
      .drop("__rj_bucket")
  }

  /** Zero-row frame with the joined schema (points' ++ intervals' columns). */
  private def emptyResult(points: DataFrame, intervals: DataFrame): DataFrame =
    points.limit(0).crossJoin(intervals.limit(0))
}
