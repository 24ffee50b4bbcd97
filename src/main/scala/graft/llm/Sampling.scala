package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / ordering operators for training-data curation.
  *
  * All are deterministic — bit-identical output for a given input no
  * matter the cluster size, partitioning, or number of retries — the
  * property a 100 TB curation run needs so a re-run (or a per-partition
  * task retry) cannot silently change the training set. This is the same
  * stance as the engine's bernoulli sample (`sample_bernoulli`'s
  * determinism contract): sampling is a FUNCTION of the data, not of the
  * execution. Cost profiles differ: `stratified` is a pure map-side
  * filter (no RNG state, no shuffle); `deterministicShuffle` is a
  * distributed range-partitioned SORT — one exchange (range partitioning
  * on the seeded hash) plus a per-partition sort, the unavoidable price
  * of a total order over the corpus.
  */
object Sampling {

  /** Class-balanced systematic sampling: keep a row iff
    * `id mod 1000 < permille(class)`. Rates are integer permille so the
    * bar is exact; classes absent from `permille` use `defaultPermille`.
    * For uniformly-distributed ids the realized rate converges to the
    * requested one per class; ids correlated with the class column should
    * be hashed first (pass `xxhash64(col)` as `idCol`).
    */
  def stratified(df: DataFrame, classCol: String, idCol: Column,
      permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    require((permille.values ++ Seq(defaultPermille)).forall(p => p >= 0 && p <= 1000),
      "permille rates must be in [0, 1000]")
    val bar = permille.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col(classCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(idCol, lit(1000)) < bar)
  }

  /** Mixture-weight solver for corpus composition: given a target token
    * budget PER CLASS (source, domain, language …), compute the integer
    * permille sampling rate that `stratified` needs to realize that mix —
    * `min(1000, floor(1000 · target / tokens(class)))`, i.e. downsample
    * overrepresented classes toward the target and keep underrepresented
    * ones whole (rates never upsample; repeat epochs handle deficits).
    * Returns (class, toks, permille) — one row per class, computed with a
    * single map-side-combined aggregation over the corpus; feed the result
    * into `stratified` for the actual cut. This is the static mixing step
    * every large-corpus training run performs before shuffling.
    */
  def mixturePermille(df: DataFrame, classCol: String, tokens: Column,
      targetPerClass: Long): DataFrame = {
    require(targetPerClass > 0, "targetPerClass must be positive")
    df.groupBy(col(classCol))
      .agg(sum(tokens).cast("long").as("toks"))
      .withColumn("permille",
        least(lit(1000L), floor(lit(1000.0) * targetPerClass / col("toks"))).cast("long"))
  }

  /** Reproducible corpus shuffle: order by a seeded hash of the id (ties
    * broken by the id itself, so the order is total). Changing the seed
    * gives an independent epoch permutation; the same seed always gives
    * the same one. Plans as a range-partitioned distributed sort — an
    * exchange is inherent to any global reordering.
    */
  def deterministicShuffle(df: DataFrame, idCol: Column, seed: Long): DataFrame =
    df.orderBy(xxhash64(idCol, lit(seed)), idCol)
}
