package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional file
  * clustering for min/max pruning. A linear sort clusters ONE column:
  * predicates on it prune files via parquet row-group/file stats, but a
  * predicate on any other column touches every file. Interleaving the
  * bits of several columns' quantized ranks orders rows along a
  * space-filling curve, so each file covers a small HYPER-RECTANGLE of
  * the combined domain and a selective predicate on ANY of the z-ed
  * columns (or a box over several) overlaps few files. This is the
  * layout lever behind Delta's OPTIMIZE ZORDER BY and Iceberg's
  * rewrite with zorder — the reference has no analog (hive bucketing
  * hashes, which prunes equality only; `presto-main`'s stats pruning
  * consumes whatever layout exists, it cannot create one).
  *
  * Quantization: each column buckets UNIFORMLY over its [min, max]
  * (one 1-row stats aggregate for the frame — the RangeJoin/LSH sizing
  * discipline), `bits` bits per column, nulls to bucket 0. Uniform
  * buckets degrade under heavy value skew (ranks would be exact but
  * need a per-column global sort); the curve still interleaves
  * whatever resolution survives, and the declared-query flag plus the
  * LayoutSpec pruning probes measure effectiveness rather than assume
  * it. Everything is built-in codegen'd expressions (shifts, masks,
  * floor) — no UDF in the write path.
  */
object Layout {

  /** The interleaved z-value of `cols` over the given [min, max] ranges:
    * bit `i * n + j` of the result is bit `i` of column `j`'s bucket.
    * `bits * cols.size` must fit a long (≤ 63).
    */
  def zValue(cols: Seq[(Column, Double, Double)], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits * cols.size <= 63, s"${cols.size} columns × $bits bits overflow a long")
    val top = (1 << bits) - 1
    val bucketed = cols.map { case (c, mn, mx) =>
      val b =
        if (mx > mn)
          floor((c.cast("double") - lit(mn)) / lit((mx - mn) / (top + 1))).cast("long")
        else lit(0L) // constant column: no information to interleave
      coalesce(least(lit(top.toLong), greatest(lit(0L), b)), lit(0L))
    }
    interleave(bucketed, bits)
  }

  /** The bit interleave shared by both quantizer arms: bit `i * n + j`
    * of the result is bit `i` of bucket column `j`. */
  private def interleave(bucketed: Seq[Column], bits: Int): Column = {
    val n = bucketed.size
    var z: Column = lit(0L)
    for (i <- 0 until bits; (b, j) <- bucketed.zipWithIndex) {
      z = z.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j))
    }
    z
  }

  /** The RANK-based (equal-depth) quantizer arm: bucket = how many of the
    * column's sorted quantile cut points the value has passed — a BINARY
    * SEARCH over the 2^bits−1 cuts, where each of the `bits` rounds is
    * staged as its OWN projection column (`withRankBuckets` appends
    * `__zrank_<j>`): the cursor reference inside a round is then a plain
    * attribute, which is what keeps the expression tree LINEAR in `bits`.
    * The two obvious formulations both fail at scale and are kept out on
    * purpose: a fold over the literal cuts array is O(2^bits) interpreted
    * work per row-column (measured ~10× the uniform arm's entire write
    * wall at 6M rows), and a self-nesting `when(cursor…, cursor…,
    * cursor…)` Column triples the tree per round — 3^bits nodes, each
    * carrying its own copy of the 255-double literal (a 568 MB plan
    * string and a driver OOM at the rehearsal). Per-round projections
    * still fuse into one whole-stage-codegen stage, so each row-column
    * pays exactly `bits` `element_at`+compare ops. Where the uniform
    * quantizer collapses a heavy-hitter value region into one bucket
    * (losing all curve resolution there), ranks spread it across buckets
    * by construction — equal-depth histograms, applied to the z-curve.
    * Nulls to bucket 0, like [[zValue]] (a null comparison falls through
    * every round, leaving the cursor at 0).
    */
  private def withRankBuckets(df: DataFrame,
      cols: Seq[(String, Array[Double])], bits: Int): (DataFrame, Seq[Column]) = {
    val top = (1 << bits) - 1
    var work = df
    val names = cols.zipWithIndex.map { case ((c, cuts), j) =>
      val name = s"__zrank_$j"
      if (cuts.isEmpty) work = work.withColumn(name, lit(0L))
      else {
        require(cuts.length == top,
          s"rank quantization needs exactly $top cut points, got ${cuts.length}")
        val arr = lit(cuts)
        work = work.withColumn(name, lit(0L))
        var step = 1 << (bits - 1)
        while (step >= 1) {
          // cuts is 0-indexed conceptually; element_at is 1-based, so
          // probing "cut #(cursor + step)" is element_at(cursor + step)
          val cursor = col(name)
          val probe = element_at(arr, (cursor + lit(step.toLong)).cast("int"))
          work = work.withColumn(name,
            when(col(c).cast("double") >= probe, cursor + lit(step.toLong))
              .otherwise(cursor))
          step >>= 1
        }
        work = work.withColumn(name,
          coalesce(least(lit(top.toLong), greatest(lit(0L), col(name))), lit(0L)))
      }
      name
    }
    (work, names.map(col))
  }

  /** Write `df` to `path` as `nFiles` parquet files clustered along the
    * z-curve of `cols`: range-partition on the z-value (equal-depth file
    * cuts via Spark's range sampling), sort within each file, drop the
    * helper column. Each file then covers a compact region of the
    * multi-column domain, which is what min/max pruning consumes.
    *
    * Quantizer pick rule (both arms cost ONE 1-row stats pass + one range
    * shuffle): `quantile = false` buckets uniformly over [min, max] —
    * right when values spread roughly evenly over their range; set
    * `quantile = true` when a column is value-skewed (heavy-hitter
    * ranges, Zipf keys, exponential ids) — uniform buckets then collapse
    * the dense region into one bucket and a selective predicate inside it
    * prunes nothing, while rank buckets keep equal-depth resolution
    * everywhere (measured in LayoutSpec and the `zorder` rehearsal).
    */
  def zorderWrite(spark: SparkSession, df: DataFrame, path: String,
      cols: Seq[String], nFiles: Int, bits: Int = 8,
      quantile: Boolean = false): Unit = {
    val zed =
      if (!quantile) {
        val aggs = cols.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val ranges = cols.zipWithIndex.map { case (c, i) =>
          (c, (if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i),
            if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)))
        }.toMap
        uniformZed(df, cols, ranges, bits)
      } else {
        // one approx_percentile pass instead of min/max: 2^bits − 1
        // equal-depth cut points per column. Accuracy 2500 keeps the rank
        // error (~1/2500) well under a bucket's width (1/256) at a
        // fraction of the summary-merge cost of the 10000 default.
        val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
        val aggs = cols.map(c => percentile_approx(col(c).cast("double"),
          lit(probs), lit(2500)))
        val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val ranked = cols.zipWithIndex.map { case (c, i) =>
          (c, if (stats.isNullAt(i)) Array.empty[Double]
            else stats.getSeq[Double](i).toArray)
        }.toMap
        rankZed(df, cols, ranked, bits)
      }
    writeByZ(zed, path, nFiles)
  }

  /** The two arm builders, shared by [[zorderWrite]] and
    * [[zorderWriteAuto]] so the layouts cannot diverge. */
  private def uniformZed(df: DataFrame, cols: Seq[String],
      ranges: Map[String, (Double, Double)], bits: Int): DataFrame =
    df.withColumn("__zorder", zValue(cols.map { c =>
      val (mn, mx) = ranges(c); (col(c), mn, mx) }, bits))

  private def rankZed(df: DataFrame, cols: Seq[String],
      cuts: Map[String, Array[Double]], bits: Int): DataFrame = {
    val (work, buckets) = withRankBuckets(df, cols.map(c => (c, cuts(c))), bits)
    work.withColumn("__zorder", interleave(buckets, bits))
      .drop(buckets.indices.map(j => s"__zrank_$j"): _*)
  }

  /** Cluster a z-valued frame into `nFiles` curve-contiguous partitions
    * (equal-depth file cuts via Spark's range sampling) and drop the
    * helper — the write-agnostic half of [[writeByZ]], shared with
    * [[zorderRewrite]]'s staged commit. */
  private def clusterByZ(zed: DataFrame, nFiles: Int): DataFrame =
    zed.repartitionByRange(nFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")

  private def writeByZ(zed: DataFrame, path: String, nFiles: Int): Unit =
    clusterByZ(zed, nFiles).write.mode("overwrite").parquet(path)

  /** Self-enforcing quantizer pick — the manual rule ("set `quantile =
    * true` when a column is value-skewed") measured into a switch, the
    * same discipline as `AsofJoin.auto` and RangeJoin's width sizing.
    * ONE stats pass computes both arms' inputs (min/max AND the
    * equal-depth cuts); a column is skew-flagged when ≥
    * `skewMassThreshold` of its mass (that fraction of the 2^bits − 1
    * equal-depth cut points) collapses inside a single uniform bucket
    * width — exactly the geometry under which the uniform arm loses all
    * curve resolution in the dense region (the `zorder` rehearsal's
    * measured failure shape). Any skew-flagged column picks the rank arm
    * for the whole write (its cuts are already in hand, so the pick
    * costs nothing beyond this one pass); otherwise uniform, which is
    * marginally cheaper to bucket. Returns whether the rank arm ran.
    */
  def zorderWriteAuto(spark: SparkSession, df: DataFrame, path: String,
      cols: Seq[String], nFiles: Int, bits: Int = 8,
      skewMassThreshold: Double = 0.25): Boolean = {
    val (zed, skewed) = autoZed(df, cols, bits, skewMassThreshold)
    writeByZ(zed, path, nFiles)
    skewed
  }

  /** The shared auto-arm builder: one combined stats pass, the skew
    * geometry check, and the picked arm's z-valued frame — returned
    * unwritten so [[zorderWriteAuto]] and [[zorderRewrite]] commit the
    * SAME layout through their different write paths. */
  private def autoZed(df: DataFrame, cols: Seq[String], bits: Int,
      skewMassThreshold: Double): (DataFrame, Boolean) = {
    val top = (1 << bits) - 1
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val aggs = cols.map(c => percentile_approx(col(c).cast("double"),
      lit(probs), lit(2500))) ++
      cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = cols.size
    def cutsOf(i: Int): Array[Double] =
      if (stats.isNullAt(i)) Array.empty[Double] else stats.getSeq[Double](i).toArray
    def rangeOf(i: Int): (Double, Double) =
      (if (stats.isNullAt(n + 2 * i)) 0.0 else stats.getDouble(n + 2 * i),
        if (stats.isNullAt(n + 2 * i + 1)) 0.0 else stats.getDouble(n + 2 * i + 1))
    val skewed = cols.indices.exists { i =>
      val cuts = cutsOf(i)
      val (mn, mx) = rangeOf(i)
      if (cuts.isEmpty || mx <= mn) false
      else {
        val width = (mx - mn) / (top + 1)
        // densest uniform-bucket window: max count of equal-depth cuts
        // within one width — each adjacent cut pair holds 1/2^bits of
        // the mass, so count/|cuts| ≈ the window's mass fraction
        var maxRun = 0
        var lo = 0
        cuts.indices.foreach { hi =>
          while (cuts(hi) - cuts(lo) > width) lo += 1
          maxRun = math.max(maxRun, hi - lo + 1)
        }
        maxRun.toDouble / cuts.length >= skewMassThreshold
      }
    }
    val zed =
      if (skewed)
        rankZed(df, cols,
          cols.zipWithIndex.map { case (c, i) => c -> cutsOf(i) }.toMap, bits)
      else
        uniformZed(df, cols,
          cols.zipWithIndex.map { case (c, i) => c -> rangeOf(i) }.toMap, bits)
    (zed, skewed)
  }

  /** Re-cluster a LIVE table along the z-curve IN PLACE, committed
    * through the merge-on-read manifest protocol — the engine's `OPTIMIZE
    * … ZORDER BY` (Delta's statement; the reference has no layout writer
    * at all). Under the single-writer lock: the RESOLVED view (tombstones
    * applied — the rewrite folds them for free) clusters with the
    * auto-picked quantizer ([[zorderWriteAuto]]'s skew rule), stages
    * OUTSIDE the live set via [[CowCore.stage]], moves in as
    * sequence-named parts, and publishes ONE manifest holding only the
    * new files and NO tombstone batches. Readers overlapping the rewrite
    * keep their complete pre-state (replaced files and batches are
    * retained for older manifests until vacuum), snapshots survive, and a
    * crash strands only an unreferenced stage directory — the same
    * commit shape as [[MorDelete.compact]]. On an analyzed table the
    * NEW files publish write-path stats in the same commit (the old
    * entries described a layout that is gone), so pruning never lapses;
    * a never-analyzed table stays stats-free. Partitioned layouts are
    * refused: the z-curve REPLACES directory partitioning as the
    * clustering (write the curve over the partition column instead).
    * Returns whether the rank (skew) quantizer arm ran.
    */
  def zorderRewrite(spark: SparkSession, path: String, cols: Seq[String],
      nFiles: Int = 0, bits: Int = 8,
      skewMassThreshold: Double = 0.25,
      targetFileBytes: Long = 128L << 20): Boolean = MorDelete.withWriterLock(path) {
    MorDelete.ensureManaged(spark, path)
    val st = MorDelete.liveState(spark, path)
    require(st.dataFiles.nonEmpty, s"nothing to rewrite: no live data files at $path")
    val base = java.nio.file.Paths.get(path).toAbsolutePath
    val resolved = MorDelete.read(spark, path)
    // the partition probe reads PATHS, not footers, so it is exact even
    // mid-evolution (a renamed column's logical name is absent from old
    // footers and would false-positive a schema-vs-file compare)
    require(MorDelete.partitionColsFromPaths(path, st).isEmpty,
      s"z-order rewrite replaces directory partitioning with curve clustering " +
        s"and does not preserve partition directories; table at $path is " +
        "partitioned — use rewriteFiles (layout-preserving), or z-order the " +
        "partition column itself on a flat copy instead")
    // default file count is SIZE-TARGETED (~targetFileBytes per file off
    // the live bytes), so the rewrite also bin-packs a small-files table
    // — the other half of what OPTIMIZE exists for; pass nFiles to pin a
    // count instead
    val target =
      if (nFiles > 0) nFiles
      else math.max(1, math.ceil(st.dataFiles
        .map(f => new java.io.File(f).length()).sum.toDouble / targetFileBytes).toInt)
    val seq = MorDelete.maxSeq(spark, path)
    val (zed, skewed) = autoZed(resolved, cols, bits, skewMassThreshold)
    val newFiles = CowCore.moveIn(
      CowCore.stage(spark, base, Nil, clusterByZ(zed, target)),
      base, prefix = s"part-mor$seq-")
    // the old per-file stats described a layout that is gone; the NEW
    // files publish write-path stats in this same commit (the rewrite
    // materialized the resolved view at the logical schema, so the
    // computation runs even on a just-migrated evolved table). The
    // analyzed COLUMN SET carries either way so the maintenance loop
    // keeps healing pre-r16 tables.
    MorDelete.publishManifest(path, seq,
      st.copy(dataFiles = newFiles, batches = Nil,
        stats = Maintenance.writePathStats(spark, path,
          st.copy(schemaLog = Nil), newFiles),
        schemaLog = Nil))
    skewed
  }

  /** Physically rewrite a LIVE table's files WITHOUT re-clustering — the
    * plain `OPTIMIZE` bin-pack plus the schema-evolution migration path:
    * the resolved view (tombstones folded, columns at the LOGICAL schema)
    * re-materializes as ~`targetFileBytes` files, committed with one
    * atomic manifest rename that clears the evolution log (every new file
    * now carries the logical schema physically, so uniform-schema readers
    * — the stats FileIndex, [[MorDelete.compact]], [[Maintenance
    * .analyze]] — re-engage). Same retention/crash shape as
    * [[zorderRewrite]]. Returns the new live file count.
    */
  def rewriteFiles(spark: SparkSession, path: String, nFiles: Int = 0,
      targetFileBytes: Long = 128L << 20): Long = MorDelete.withWriterLock(path) {
    MorDelete.ensureManaged(spark, path)
    val st = MorDelete.liveState(spark, path)
    require(st.dataFiles.nonEmpty, s"nothing to rewrite: no live data files at $path")
    val base = java.nio.file.Paths.get(path).toAbsolutePath
    val resolved = MorDelete.read(spark, path)
    // a Hive-partitioned layout is PRESERVED: the resolved view carries
    // the partition columns as data, and the staged write re-materializes
    // them into col=value directories (partitionBy) — this is the
    // schema-evolution migration path for partitioned tables too, so
    // every new file carries the logical DATA schema physically while
    // the directory layout (and with it partition pruning) survives
    val partCols = MorDelete.partitionColsFromPaths(path, st)
    val target =
      if (nFiles > 0) nFiles
      else math.max(1, math.ceil(st.dataFiles
        .map(f => new java.io.File(f).length()).sum.toDouble / targetFileBytes).toInt)
    val seq = MorDelete.maxSeq(spark, path)
    val newFiles = CowCore.moveIn(
      CowCore.stage(spark, base, partCols, resolved.repartition(target)),
      base, prefix = s"part-mor$seq-")
    MorDelete.publishManifest(path, seq,
      st.copy(dataFiles = newFiles, batches = Nil,
        stats = Maintenance.writePathStats(spark, path,
          st.copy(schemaLog = Nil), newFiles),
        schemaLog = Nil))
    newFiles.size.toLong
  }

  /** Pruning effectiveness probe: how many files of the table at `path`
    * contain at least one row matching `predicate` — the lower bound on
    * the I/O any stats-pruning reader pays for that predicate under this
    * layout. One metadata-projected distinct, bounded by file count.
    */
  def filesWithMatches(spark: SparkSession, path: String, predicate: Column): Long =
    spark.read.parquet(path).filter(predicate)
      .select(col("_metadata.file_path")).distinct().count()
}
