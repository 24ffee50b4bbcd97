package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF (backward) join as a first-class operator — for every left row,
  * attach the payload of the LATEST right row with the same key and
  * `rightTime ≤ leftTime` (inclusive), or nulls when no prior right row
  * exists (LEFT semantics). The time-series lookup every event pipeline
  * needs; the reference has no ASOF at all (Presto 323 predates it), and
  * a naive formulation is a per-key range join — quadratic per key on
  * exactly the hot keys that matter.
  *
  * Spark shape (the `events_asof_join` pattern, generalized): union the
  * two sides with a side tag, ONE window per key ordered by
  * (time, side, tiebreak) carrying `last(payload, ignoreNulls)` over the
  * unbounded-preceding frame, keep the left rows. Cost: one shuffle on
  * the key columns, per-key state is a single struct — never a
  * click×view product. Right rows sort BEFORE left rows at equal
  * timestamps, which is what makes the join inclusive; among right rows
  * tied on the timestamp, `rightTiebreak` (ascending, last wins — i.e.
  * the MAX) makes the pick deterministic where SQL ASOF is free to
  * return any tied row.
  *
  * Null contract (SQL equality, not GROUP BY): right rows with a null
  * key or null time can never match and are dropped; left rows with a
  * null key or null time come back unmatched (payload nulls), never
  * silently dropped — one row out per row in, the same contract as
  * [[graft.llm.Dedup.semanticDedup]].
  */
object AsofJoin {

  /** @param on            equi-key column names (present on both sides)
    * @param leftTime      left probe-time column
    * @param rightTime     right event-time column (must be
    *                      order-comparable with leftTime)
    * @param payload       right columns to attach; names must not collide
    *                      with left's
    * @param rightTiebreak payload field names resolving right rows tied
    *                      on (key, time): ascending order, last (max) wins
    * @param within        optional tolerance (the pandas merge_asof
    *                      analog): a predicate over (leftTime,
    *                      matchedRightTime) — a match failing it comes
    *                      back as unmatched (payload nulls), the row is
    *                      never dropped. Evaluated on the NEAREST match
    *                      only, exactly merge_asof's contract: a nearer
    *                      out-of-tolerance right row hides farther
    *                      in-tolerance ones
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: Seq[String] = Nil,
      within: Option[(Column, Column) => Column] = None): DataFrame =
    join(left, right, on, leftTime, rightTime, payload, rightTiebreak,
      within, forward = false)

  /** The forward variant: for every left row, the EARLIEST right row with
    * `rightTime ≥ leftTime` (inclusive) — "the first click after each
    * impression". Same single-shuffle union+window shape, with the time
    * ordering reversed; ties on (key, time) still resolve to the MAX
    * tiebreak.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: Seq[String] = Nil,
      within: Option[(Column, Column) => Column] = None): DataFrame =
    join(left, right, on, leftTime, rightTime, payload, rightTiebreak,
      within, forward = true)

  /** The skew arm of [[backward]]: identical semantics, two-phase plan.
    * The single-window shape serializes each key's FULL history onto one
    * task (inherent to a per-key ordered scan); when one key carries a
    * large share of both sides — the planted-hot-key rehearsal — that
    * task becomes the straggler. This arm decomposes the scan by
    * (key, time-slice), the same decomposition the bucketed range join
    * applies to intervals:
    *
    *  1. IN-SLICE pass: the [[backward]] union+window, partitioned by
    *     (key, slice) where slice = ⌊time/sliceWidth⌋ — a hot key's
    *     history spreads over history/sliceWidth tasks. Each left row
    *     resolves its nearest prior right row WITHIN its own slice.
    *  2. BOUNDARY pass: one row per (key, slice) — the slice's FINAL
    *     right payload (max_by over (time, tiebreak)) — then a small
    *     per-key window over slice ids carries the last non-null payload
    *     forward across slice boundaries. This frame is |keys| × |active
    *     slices|, orders of magnitude below the row count.
    *  3. A left row's nearest prior match = its in-slice match, else the
    *     boundary carry (every earlier-slice right row is strictly
    *     older than every in-slice one, so the coalesce IS the nearest).
    *
    * `within` tolerance and the null contract behave exactly as in
    * [[backward]] (spec-locked equivalent on seeded corpora).
    *
    * @param sliceWidth time-slice width in the time column's double-cast
    *   units (epoch seconds for timestamps). Pick ≈ history span / (10 ×
    *   cores): wide enough that the boundary frame stays tiny, narrow
    *   enough to break the hot key up.
    */
  def backwardSliced(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      sliceWidth: Double,
      rightTiebreak: Seq[String] = Nil,
      within: Option[(Column, Column) => Column] = None): DataFrame =
    slicedJoin(left, right, on, leftTime, rightTime, payload, sliceWidth,
      rightTiebreak, within, forward = false)

  /** The forward counterpart of [[backwardSliced]] — [[forward]]'s
    * semantics through the same per-(key, time-slice) decomposition: the
    * in-slice window scans time DESCENDING (the running prefix holds the
    * future, `last` lands on the nearest following right row) and the
    * boundary carry walks slice ids descending, pulling each slice's
    * EARLIEST right payload from strictly later slices. */
  def forwardSliced(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      sliceWidth: Double,
      rightTiebreak: Seq[String] = Nil,
      within: Option[(Column, Column) => Column] = None): DataFrame =
    slicedJoin(left, right, on, leftTime, rightTime, payload, sliceWidth,
      rightTiebreak, within, forward = true)

  /** The measured single-vs-sliced decision for one (left, right, key)
    * shape — what [[auto]] acts on, exposed so specs and rehearsals can
    * assert the CHOICE, not just the values.
    *
    * @param sliced      whether the sliced arm was picked
    * @param sliceWidth  derived slice width (meaningful when sliced)
    * @param maxKeyRows  the hottest key's row count across BOTH sides —
    *                    exactly the rows the single-window arm would
    *                    serialize onto one task
    * @param span        the time span (double-cast units) the history covers
    */
  final case class AutoPlan(sliced: Boolean, sliceWidth: Double,
      maxKeyRows: Long, span: Double)

  /** Default per-task hot-key budget: the SCALE_r14 `asofskew` rehearsal
    * put the single-vs-sliced crossover at roughly a 1M-row hot
    * partition on 32 cores / 100 GiB (single wins at 159k hot rows,
    * sliced wins from ~794k), so the switch fires from 512k — past the
    * measured win region either way, and a hot key under it is
    * scan-bound, not sort-bound. At 100 TB the same number is "what one
    * executor task can sort without spilling". */
  val DefaultMaxKeyRowsPerTask: Long = 1L << 19

  /** Size the join in ONE bounded stats pass (the RangeJoin sizing
    * discipline — `RangeJoin.pointInInterval`'s 1-row interval stats):
    * per-key counts over the union both arms would shuffle anyway, rolled
    * up to (hottest key, time span) in a single action. The sliced arm is
    * picked only when the hottest key exceeds the task budget AND the
    * history has a span to slice; the width then spreads that key over
    * ≥4× budget-sized slices (capped at 4096 — the boundary-carry frame
    * stays |keys| × slices, orders below the row count).
    */
  def plan(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      maxKeyRowsPerTask: Long = DefaultMaxKeyRowsPerTask,
      statsSampleFraction: Double = 1.0): AutoPlan = {
    require(on.nonEmpty, "asof join needs at least one key column")
    require(maxKeyRowsPerTask > 0, "maxKeyRowsPerTask must be positive")
    require(statsSampleFraction > 0.0 && statsSampleFraction <= 1.0,
      "statsSampleFraction must be in (0, 1]")
    def keyed(df: DataFrame, time: String): DataFrame =
      df.filter((on.map(col) :+ col(time)).map(_.isNotNull).reduce(_ && _))
        .select(on.map(col) :+ col(time).cast("double").as("__asof_t"): _*)
    val full = keyed(left, leftTime).unionByName(keyed(right, rightTime))
    // statsSampleFraction < 1 bounds the pass's SHUFFLE at scale: the
    // per-key partials shrink by the fraction and the hottest-key count
    // scales back up by 1/f. The arm decision only needs the estimate's
    // ORDER OF MAGNITUDE (the single/sliced crossover spans a decade —
    // SCALE_r14 asofskew measured single winning to 159k hot rows and
    // sliced from 794k), so a 1% Bernoulli sample resolves it: at the
    // 512k-row budget the sampled hot key is ~5120 ± 72 (Poisson), a
    // ±1.4% relative error — three orders under the decision's decade of
    // slack. Deterministic seed: the same inputs plan the same arm.
    val u =
      if (statsSampleFraction < 1.0)
        full.sample(withReplacement = false, statsSampleFraction, seed = 42L)
      else full
    val row = u.groupBy(on.map(col): _*)
      .agg(count(lit(1)).as("__n"), min(col("__asof_t")).as("__mn"),
        max(col("__asof_t")).as("__mx"))
      .agg(max(col("__n")).as("n"), min(col("__mn")).as("mn"), max(col("__mx")).as("mx"))
      .collect()(0)
    if (row.isNullAt(0)) return AutoPlan(sliced = false, 0.0, 0L, 0.0)
    val maxKeyRows = math.round(row.getLong(0) / statsSampleFraction)
    // ONLY the per-key count rides the sample — min/max come from the
    // FULL union, because a Bernoulli sample that misses the extremes
    // underestimates the span, and sliceWidth = span / nSlices would
    // then pack boundary slices too tight. The exact pass is a global
    // min/max: one partial row per partition, no per-key shuffle —
    // cheap at any scale, so the sampled arm's published span is EXACT,
    // not an estimate.
    val (mn, mx) =
      if (statsSampleFraction < 1.0) {
        val r2 = full.agg(min(col("__asof_t")).as("mn"),
          max(col("__asof_t")).as("mx")).collect()(0)
        (r2.getDouble(0), r2.getDouble(1))
      } else (row.getDouble(1), row.getDouble(2))
    val span = mx - mn
    // a zero-span history cannot be sliced by time (every row lands in
    // one slice) — the single arm is the only arm
    if (maxKeyRows <= maxKeyRowsPerTask || span <= 0.0)
      AutoPlan(sliced = false, 0.0, maxKeyRows, span)
    else {
      val nSlices = math.min(4096L,
        math.max(16L, 4L * ((maxKeyRows + maxKeyRowsPerTask - 1) / maxKeyRowsPerTask)))
      AutoPlan(sliced = true, math.max(span / nSlices, Double.MinPositiveValue),
        maxKeyRows, span)
    }
  }

  /** The self-sizing arm: runs [[plan]]'s one bounded stats pass, then
    * executes [[backward]]/[[forward]] or the sliced variant with the
    * derived width — the SCALE_r14 deployment rule ("switch when one
    * key's history approaches what a single task can sort"), enforced by
    * measurement instead of left to the caller. Semantics are identical
    * across arms (spec-locked), so the switch is free of behavior risk.
    */
  def auto(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: Seq[String] = Nil,
      within: Option[(Column, Column) => Column] = None,
      forward: Boolean = false,
      maxKeyRowsPerTask: Long = DefaultMaxKeyRowsPerTask,
      statsSampleFraction: Double = 1.0): DataFrame = {
    val p = plan(left, right, on, leftTime, rightTime, maxKeyRowsPerTask,
      statsSampleFraction)
    if (p.sliced)
      slicedJoin(left, right, on, leftTime, rightTime, payload, p.sliceWidth,
        rightTiebreak, within, forward)
    else
      join(left, right, on, leftTime, rightTime, payload, rightTiebreak,
        within, forward)
  }

  private def slicedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      sliceWidth: Double,
      rightTiebreak: Seq[String],
      within: Option[(Column, Column) => Column],
      forward: Boolean): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one key column")
    require(payload.nonEmpty, "asof join needs at least one payload column")
    require(sliceWidth > 0, "sliceWidth must be positive")
    require(rightTiebreak.forall(payload.contains),
      "rightTiebreak fields must be payload columns")
    require(!payload.contains("__asof_rt"), "__asof_rt is reserved")
    val overlap = left.columns.toSet.intersect(payload.toSet)
    require(overlap.isEmpty,
      s"payload columns collide with left's; rename first: ${overlap.mkString(", ")}")

    def slice(time: Column): Column =
      floor(time.cast("double") / sliceWidth).cast("long")
    def keyedCond(time: String): Column =
      (on.map(col) :+ col(time)).map(_.isNotNull).reduce(_ && _)

    val payStruct = struct(payload.map(col) :+ col(rightTime).as("__asof_rt"): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType
    val payFields = payType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val rowStruct = struct(left.columns.toSeq.map(col): _*)
    val rowType = left.select(rowStruct.as("r")).schema("r").dataType

    val rT = right.filter(keyedCond(rightTime)).select(
      on.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        payStruct.as("__asof_pay"),
        lit(null).cast(rowType).as("__asof_row")): _*)
    val lT = left.filter(keyedCond(leftTime)).select(
      on.map(col) ++ Seq(
        col(leftTime).as("__asof_t"),
        lit(1).as("__asof_side"),
        lit(null).cast(payType).as("__asof_pay"),
        rowStruct.as("__asof_row")): _*)

    // phase 1: the backward window, partitioned by (key, slice). BOTH
    // window columns share one partition+order spec, so Spark computes
    // them in a single WindowExec over ONE shuffle of the union — the
    // running frame resolves each left row's in-slice match, the full
    // frame tags every row with its slice's FINAL right payload (the
    // boundary-carry source), and the scan is evaluated exactly once.
    val sliced = rT.unionByName(lT).withColumn("__asof_slice", slice(col("__asof_t")))
    val tOrd = if (forward) col("__asof_t").desc else col("__asof_t").asc
    val pw = Window.partitionBy((on :+ "__asof_slice").map(col): _*)
      .orderBy(Seq(tOrd, col("__asof_side").asc) ++
        rightTiebreak.map(f => col("__asof_pay").getField(f).asc): _*)
    val frame = sliced
      .withColumn("__asof_in", last(col("__asof_pay"), ignoreNulls = true)
        .over(pw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__asof_fin", last(col("__asof_pay"), ignoreNulls = true)
        .over(pw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

    // phase 2: one row per (key, slice) — __asof_fin is constant within a
    // partition, and the groupBy keys match the window's partitioning, so
    // this aggregation runs in place with no further exchange. The carry
    // window then walks each key's slice ids (a frame orders of magnitude
    // below the row count) pulling the last non-null final payload from
    // STRICTLY earlier slices.
    val slices = frame.groupBy((on :+ "__asof_slice").map(col): _*)
      .agg(first(col("__asof_fin")).as("__asof_fin"))
    val wCarry = Window.partitionBy(on.map(col): _*)
      .orderBy(if (forward) col("__asof_slice").desc else col("__asof_slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = slices
      .withColumn("__asof_carry", last(col("__asof_fin"), ignoreNulls = true).over(wCarry))
      .select((on :+ "__asof_slice").map(col) :+ col("__asof_carry"): _*)

    // phase 3: nearest = in-slice if present, else the boundary carry
    // (every earlier-slice right row is strictly older than any in-slice
    // one, so the coalesce IS the nearest); the big side keeps its
    // (key, slice) partitioning, only the small boundary frame moves
    val joined = frame.filter(col("__asof_side") === 1)
      .join(boundary, on :+ "__asof_slice", "left_outer")
      .withColumn("__asof_match", coalesce(col("__asof_in"), col("__asof_carry")))
    val kept = within match {
      case None => col("__asof_match")
      case Some(p) => when(col("__asof_match").isNotNull &&
        p(col("__asof_t"), col("__asof_match").getField("__asof_rt")),
        col("__asof_match"))
    }
    val matched = joined.select(
      left.columns.toSeq.map(c => col("__asof_row").getField(c).as(c)) ++
        payload.map(f => kept.getField(f).as(f)): _*)
    val unmatched = left.filter(!keyedCond(leftTime)).select(
      left.columns.toSeq.map(col) ++
        payload.map(f => lit(null).cast(payFields(f).dataType).as(f)): _*)
    matched.unionByName(unmatched)
  }

  private def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: Seq[String],
      within: Option[(Column, Column) => Column],
      forward: Boolean): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one key column")
    require(payload.nonEmpty, "asof join needs at least one payload column")
    require(rightTiebreak.forall(payload.contains),
      "rightTiebreak fields must be payload columns")
    require(!payload.contains("__asof_rt"), "__asof_rt is reserved")
    val overlap = left.columns.toSet.intersect(payload.toSet)
    require(overlap.isEmpty,
      s"payload columns collide with left's; rename first: ${overlap.mkString(", ")}")

    // the matched right row's time rides inside the payload struct so a
    // `within` tolerance can be evaluated after the window resolves the
    // nearest match
    val payStruct = struct(payload.map(col) :+ col(rightTime).as("__asof_rt"): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType
    val rowStruct = struct(left.columns.toSeq.map(col): _*)
    val rowType = left.select(rowStruct.as("r")).schema("r").dataType
    val payFields = payType.asInstanceOf[org.apache.spark.sql.types.StructType]

    def keyedCond(time: String): Column =
      (on.map(col) :+ col(time)).map(_.isNotNull).reduce(_ && _)

    val rT = right.filter(keyedCond(rightTime)).select(
      on.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        payStruct.as("__asof_pay"),
        lit(null).cast(rowType).as("__asof_row")): _*)
    val lT = left.filter(keyedCond(leftTime)).select(
      on.map(col) ++ Seq(
        col(leftTime).as("__asof_t"),
        lit(1).as("__asof_side"),
        lit(null).cast(payType).as("__asof_pay"),
        rowStruct.as("__asof_row")): _*)

    // Backward scans time ascending (last prior right row wins); forward
    // scans DESCENDING, so the unbounded-preceding prefix holds the
    // future and `last` lands on the nearest following right row. Right
    // rows sort before left at equal time either way (inclusive bound),
    // and tied right rows keep tiebreak-ascending order so `last` picks
    // the max.
    val tOrd = if (forward) col("__asof_t").desc else col("__asof_t").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(Seq(tOrd, col("__asof_side").asc) ++
        rightTiebreak.map(f => col("__asof_pay").getField(f).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val kept = within match {
      case None => col("__asof_match")
      case Some(p) => when(col("__asof_match").isNotNull &&
        p(col("__asof_t"), col("__asof_match").getField("__asof_rt")),
        col("__asof_match"))
    }
    val matched = rT.unionByName(lT)
      .withColumn("__asof_match", last(col("__asof_pay"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(left.columns.toSeq.map(c => col("__asof_row").getField(c).as(c)) ++
        payload.map(f => kept.getField(f).as(f)): _*)

    // left rows that can never match (null key or time) bypass the
    // window and come back unmatched — one row out per row in
    val unmatched = left.filter(!keyedCond(leftTime)).select(
      left.columns.toSeq.map(col) ++
        payload.map(f => lit(null).cast(payFields(f).dataType).as(f)): _*)
    matched.unionByName(unmatched)
  }
}
