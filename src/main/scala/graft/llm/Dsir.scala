package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): estimate bag-of-hashed-ngrams generative models on
  * a small TARGET corpus (the distribution you want, e.g. curated English
  * prose) and on the RAW corpus, weight every raw document by the
  * log-likelihood ratio of the two models over its hashed n-gram features,
  * then select by weight. This is the standard pretraining-data curation
  * step between heuristic filtering ([[TextOps.gopherRules]]) and model
  * scoring ([[NgramLm.bigramCrossEntropy]]): cheaper than an LM, targeted
  * unlike heuristics. The reference engine has no counterpart (it is a SQL
  * engine); this sits in the LLM tier beside [[Relevance]] and reuses its
  * oracle-hash discipline.
  *
  * Scale shape (100 TB):
  *  - the feature space is HASHED to a fixed bucket count `nBuckets`
  *    (paper: 10k), so BOTH model tables are bounded by nBuckets rows —
  *    independent of corpus size and vocabulary. Model fitting is one
  *    explode + groupBy(bucket) shuffle per side with map-side combine;
  *  - model totals are 1-row aggregates, cross-joined in (AQE broadcasts
  *    single-row frames; no driver collect);
  *  - scoring joins each document's per-bucket counts to the ratio table
  *    on bucket: the build side is ≤ nBuckets rows, hint-broadcast — the
  *    scoring pass is map-only at any corpus size, and uniform by
  *    construction (hashing spreads Zipf mass across buckets, so there is
  *    no hot-key regime to salt — contrast [[NgramLm]], whose join keys
  *    are raw words);
  *  - resampling: [[selectTopK]] is the deterministic variant (top-k by
  *    log-weight); for the paper's stochastic Gumbel-top-k, compose with
  *    [[Sampling.weightedSample]] over exp-normalized weights;
  *  - oracle-hash discipline: `ln` inputs are exact (integer counts +
  *    α = 0.5 arithmetic), each bucket's log-ratio is rounded to 9 dp and
  *    cast to DECIMAL once, per-doc sums are decimal-exact and therefore
  *    partial-aggregation-order-proof (the Q.scala §7.5 rule).
  *
  * The default bucket function is a positional char-code hash (below)
  * chosen because the DuckDB oracle can recompute it bit-identically;
  * production deployments would pass `hashExpr = xxhash64(w)`-style
  * columns via [[bucketOf]]'s seam — the pipeline shape is identical.
  */
object Dsir {

  /** Smoothing constant — 0.5 is exact in binary (the NgramLm rule). */
  val Alpha = 0.5

  private def tokensOf(text: Column): Column = split(lower(text), " ")

  /** Positional char-code hash of a word into [0, nBuckets): the sum of
    * codepoint(c_i) · i over the word's characters, mod nBuckets. Weak as
    * hashes go, but (a) collisions are PART of the DSIR feature map, and
    * (b) both engines compute it from the same primitives (`ascii`/`ord`,
    * char-based `substr`), so the differential covers the whole pipeline.
    */
  def bucketOf(w: Column, nBuckets: Int): Column =
    pmod(
      aggregate(
        transform(sequence(lit(1), length(w)), i => ascii(w.substr(i, lit(1))).cast("long") * i),
        lit(0L), (acc, x) => acc + x),
      lit(nBuckets.toLong))

  /** All hashed n-gram features of a document: unigram buckets plus
    * bigram buckets (b1·31 + b2 mod nBuckets), as one array. */
  def featureBuckets(text: Column, nBuckets: Int): Column = {
    val uni = transform(tokensOf(text), w => bucketOf(w, nBuckets))
    val n = greatest(size(uni) - 1, lit(0))
    val bi = zip_with(slice(uni, lit(1), n), slice(uni, lit(2), n),
      (a, b) => pmod(a * 31 + b, lit(nBuckets.toLong)))
    concat(uni, bi)
  }

  /** `(b, c)` hashed-feature counts over a corpus — ≤ nBuckets rows. */
  def featureCounts(docs: DataFrame, textCol: String, nBuckets: Int): DataFrame =
    docs.filter(length(col(textCol)) > 0)
      .select(explode(featureBuckets(col(textCol), nBuckets)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))

  /** Per-bucket log-likelihood ratio table `(b, lr)` of the smoothed
    * target model over the smoothed raw model:
    * lr(b) = ln((c_p(b)+α)/(t_p+α·B)) − ln((c_q(b)+α)/(t_q+α·B)),
    * rounded to 9 dp. Bounded by nBuckets rows; buckets unseen on BOTH
    * sides are absent (a scored document over the same raw corpus never
    * references them).
    */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
      nBuckets: Int, alpha: Double = Alpha): DataFrame = {
    val p = featureCounts(target, textCol, nBuckets)
      .select(col("b"), col("c").as("cp"))
    val q = featureCounts(raw, textCol, nBuckets)
      .select(col("b"), col("c").as("cq"))
    val tots = p.agg(sum(col("cp")).as("tp")).crossJoin(q.agg(sum(col("cq")).as("tq")))
    p.join(q, Seq("b"), "full_outer")
      .crossJoin(tots)
      .select(col("b"),
        round(
          log((coalesce(col("cp"), lit(0L)) + lit(alpha)) /
              (col("tp") + lit(alpha * nBuckets))) -
          log((coalesce(col("cq"), lit(0L)) + lit(alpha)) /
              (col("tq") + lit(alpha * nBuckets))), 9).as("lr"))
  }

  /** DSIR importance log-weight of every document in `raw` against a
    * model pair fit on (`target`, `raw`): logw = Σ_b c_doc(b) · lr(b).
    * Output `(id, n_feats, logw)` — logw ROUND(…, 6); documents with no
    * feature (empty text) are dropped. The ratio join broadcasts
    * (≤ nBuckets rows); the scoring pass is otherwise map-side only.
    */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, nBuckets: Int = 1024,
      alpha: Double = Alpha): DataFrame = {
    val ratios = logRatios(target, raw, textCol, nBuckets, alpha)
    val docFeats = raw
      .filter(length(col(textCol)) > 0)
      .select(col(idCol).as("id"),
        explode(featureBuckets(col(textCol), nBuckets)).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
    docFeats.join(broadcast(ratios), Seq("b"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_feats"),
        // Operand precisions are deliberately narrow: decimal(18,9) ×
        // decimal(9,0) → decimal(28,9), under Spark's 38-digit cap. A
        // wider lr operand (24,9 × bigint-as-20,0 = 45 digits) trips the
        // precision-loss rule, which TRIMS SCALE to 6 and silently rounds
        // every product — the sum stops being exact and order-proof.
        round(sum(col("lr").cast("decimal(18,9)") * col("c").cast("decimal(9,0)"))
          .cast("double"), 6)
          .as("logw"))
  }

  /** Deterministic DSIR selection: the k raw documents with the highest
    * importance log-weight (ties broken by id ascending). One global
    * top-k (TakeOrderedAndProject — no full sort materializes). For the
    * paper's stochastic resample, feed exp-normalized weights to
    * [[Sampling.weightedSample]] instead.
    */
  def selectTopK(weights: DataFrame, k: Int): DataFrame =
    weights
      .orderBy(col("logw").desc_nulls_last, col("id").asc_nulls_last)
      .limit(k)
}
