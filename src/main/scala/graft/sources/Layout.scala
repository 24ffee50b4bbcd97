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
    var z: Column = lit(0L)
    for (i <- 0 until bits; (b, j) <- bucketed.zipWithIndex) {
      z = z.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * cols.size + j))
    }
    z
  }

  /** The RANK-based (equal-depth) quantizer arm: bucket = how many of the
    * column's quantile cut points the value has passed — computed as one
    * fold over a LITERAL cuts array (codegen'd built-ins, no UDF; 2^bits
    * comparisons per row-column, paid once at write time). Where the
    * uniform quantizer collapses a heavy-hitter value region into one
    * bucket (losing all curve resolution there), ranks spread it across
    * buckets by construction — equal-depth histograms, applied to the
    * z-curve. Nulls to bucket 0, like [[zValue]].
    */
  def zValueRanks(cols: Seq[(Column, Array[Double])], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zValueRanks needs at least one column")
    require(bits * cols.size <= 63, s"${cols.size} columns × $bits bits overflow a long")
    val top = (1 << bits) - 1
    val bucketed = cols.map { case (c, cuts) =>
      val b =
        if (cuts.isEmpty) lit(0L)
        else aggregate(lit(cuts), lit(0L),
          (acc, cut) => acc + when(c.cast("double") >= cut, 1L).otherwise(0L))
      coalesce(least(lit(top.toLong), greatest(lit(0L), b)), lit(0L))
    }
    var z: Column = lit(0L)
    for (i <- 0 until bits; (b, j) <- bucketed.zipWithIndex) {
      z = z.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * cols.size + j))
    }
    z
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
    val z =
      if (!quantile) {
        val aggs = cols.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val ranges = cols.zipWithIndex.map { case (c, i) =>
          val (mn, mx) =
            (if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i),
              if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1))
          (col(c), mn, mx)
        }
        zValue(ranges, bits)
      } else {
        // one approx_percentile pass instead of min/max: 2^bits − 1
        // equal-depth cut points per column
        val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
        val aggs = cols.map(c => percentile_approx(col(c).cast("double"),
          lit(probs), lit(10000)))
        val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val ranked = cols.zipWithIndex.map { case (c, i) =>
          val cuts =
            if (stats.isNullAt(i)) Array.empty[Double]
            else stats.getSeq[Double](i).toArray
          (col(c), cuts)
        }
        zValueRanks(ranked, bits)
      }
    df.withColumn("__zorder", z)
      .repartitionByRange(nFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode("overwrite").parquet(path)
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
