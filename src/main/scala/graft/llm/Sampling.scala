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

  /** Exact-COUNT class-balanced sample: the first `k` rows per class
    * under the caller's deterministic ordering — "take 10k docs per
    * language", the fixed-budget counterpart of [[stratified]]'s
    * rate-based cut (a rate can only approximate a count, and
    * overshoots/undershoots per class). Pass a seeded hash as the first
    * `by` column for a uniform draw (`xxhash64(id, lit(seed))`; declared
    * queries use `md5(cast(id as string))` so DuckDB can reproduce the
    * order), and a unique tiebreak column last for retry-stability.
    *
    * Scale shape: row_number-then-filter lowers to WindowGroupLimit
    * (plan-locked in PlanSpec) — every map task pre-prunes to its local
    * top-k per class BEFORE the exchange, so the shuffle carries
    * O(partitions × classes × k) rows and per-class reducer state is k
    * rows, never the class. No per-class skew: a 90%-of-corpus class
    * costs the same as a 1% class after the map-side prune.
    */
  def takePerClass(df: DataFrame, classCol: String, k: Int,
      by: Seq[Column]): DataFrame = {
    require(k >= 1, "takePerClass needs k >= 1")
    require(by.nonEmpty, "takePerClass needs a deterministic ordering")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol)).orderBy(by.map(_.asc): _*)
    df.withColumn("__tpc_rn", row_number().over(w))
      .filter(col("__tpc_rn") <= k)
      .drop("__tpc_rn")
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

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws a reproducible uniform u(id, seed)
    * and the k rows with the largest u^(1/w) win — equivalently the
    * largest ln(u)/w, which is what is ranked (rows with w ≤ 0 carry no
    * sampling mass and are EXCLUDED before ranking; rows with
    * larger weight win proportionally more often, exactly the weighted
    * reservoir semantics a curation pass wants for quality- or
    * domain-weighted subcorpus draws).
    *
    * Determinism + cross-engine parity: u is built from md5 (identical on
    * every engine) — the first 13 hex chars as a 52-bit integer, then
    * (i + 0.5) / 2^52, strictly inside (0,1) so ln is finite. The rank
    * key is ROUND(ln(u)/w, 9) with the id as tiebreak, so a final-ulp
    * ln difference between libm implementations cannot reorder
    * (the [[graft.llm.Relevance]] discipline).
    *
    * Scale shape: the key is map-side arithmetic; `orderBy(...).limit(k)`
    * plans as TakeOrderedAndProject — per-partition top-k, then a single
    * bounded merge — never a global sort materialization. The final
    * row_number window runs over k rows only.
    *
    * Output: (id, weight DOUBLE — the exact value the key used, rank),
    * rank 1..k.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: Long): DataFrame = {
    val hex13 = substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 13)
    val u = (conv(hex13, 16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    val key = round(log(u) / weight.cast("double"), 9)
    // weight is emitted as DOUBLE — the same value the ranking key used
    // (a long truncation would misreport fractional quality weights);
    // non-positive weights have no Efraimidis–Spirakis mass (ln(u)/w
    // flips sign or divides by zero) and are excluded, not ranked
    val top = df
      .select(col(idCol).as("id"), weight.cast("double").as("weight"), key.as("__k"))
      .filter(col("weight") > 0)
      .orderBy(col("__k").desc, col("id").asc)
      .limit(k)
    top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__k").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("weight"), col("rank"))
  }

  /** Leakage-safe train/validation split: near-duplicate documents MUST
    * land on the same side, or validation loss silently measures
    * memorization of training near-copies (the split analog of
    * benchmark decontamination). Every near-dup cluster (transitive
    * closure over `pairs` via [[Dedup.connectedComponents]]) is collapsed
    * to its min-id representative; the split decision hashes the
    * REPRESENTATIVE, so all members inherit one verdict by construction.
    * Unpaired documents are their own representative. The hash is the
    * [[weightedSample]] md5-hex trick (salt ":split"), so the val set is
    * a deterministic function of content relationships — re-runs and
    * late-arriving replicas of a clustered doc cannot flip sides.
    *
    * Scale: the labels frame is bounded by pair-touched documents (the
    * near-dup minority), joined back on id (AQE broadcasts when it fits);
    * bucketing is map-only. CC is O(log diameter) rounds on the pair
    * graph, not the corpus.
    *
    * @param pairs near-dup pair frame `(id_a, id_b)` from any [[Dedup]]
    *              tier (minhash, simhash, embedding, semantic)
    * @return (id, rep, bucket, split) — bucket in [0,1000), split =
    *         'val' iff bucket < valPermille
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      valPermille: Int = 100): DataFrame = {
    require(valPermille >= 0 && valPermille <= 1000,
      "valPermille must be in [0, 1000]")
    val labels = Dedup.connectedComponents(pairs)
    docs.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("rep"))
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(col("rep").cast("string"), lit(":split"))),
          1, 13), 16, 10).cast("long"), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < valPermille, lit("val")).otherwise(lit("train")))
  }

  /** Per-class quality pruning (the "keep the best keepPermille‰ of every
    * source" curation rule): rank documents within each class by
    * (score DESC, id ASC) and keep `rank <= ceil(n_class ·
    * keepPermille / 1000)` — integer arithmetic end to end, so the keep
    * boundary is bit-deterministic and a tie at the bar resolves by id,
    * never by float luck.
    *
    * Scale: one shuffle on the class key; rank and class count share the
    * same window partition (one sort, two window functions). The exact
    * per-class total order is the cost of exact permille semantics — for
    * a single monster class at 100 TB, take the map-only path instead:
    * solve an approximate score threshold per class (approx_percentile)
    * and filter, accepting the sketch's rank error at the boundary.
    *
    * @return (id, class, score, rk, n_cls) for kept rows
    */
  def qualityPrune(df: DataFrame, idCol: String, classCol: String,
      score: Column, keepPermille: Int): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      "keepPermille must be in [0, 1000]")
    import org.apache.spark.sql.expressions.Window
    val byCls = Window.partitionBy(col("cls"))
    df.select(col(idCol).as("id"), col(classCol).as("cls"), score.as("score"))
      .withColumn("rk", row_number()
        .over(byCls.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .withColumn("n_cls", count(lit(1)).over(byCls).cast("long"))
      .filter(col("rk") <=
        floor((col("n_cls") * keepPermille + lit(999)) / lit(1000)).cast("long"))
  }
}
