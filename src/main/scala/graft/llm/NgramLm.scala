package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality filtering (Wenzek et al.
  * 2020, arXiv:1911.00359): train bigram counts on a reference sub-corpus,
  * then score every document by its smoothed bigram cross-entropy — the
  * classic perplexity filter that ranks documents by how much they look
  * like the reference distribution (low cross-entropy = fluent/in-domain,
  * high = boilerplate, lists, wrong language). The reference engine has no
  * LM scoring; this sits beside [[Relevance]] (same posting-list shapes)
  * and [[TextOps.qualityScore]] (the model-free heuristics it upgrades).
  *
  * Scale shape (100 TB):
  *  - training is ONE explode + groupBy shuffle keyed (w1, w2) with
  *    map-side combine; context counts c(w1) are DERIVED from the bigram
  *    table by a second, vocabulary-sized aggregation — the corpus is
  *    never re-read;
  *  - the vocabulary size |V| is a 1-row distinct-count aggregate,
  *    cross-joined in (AQE broadcasts single-row frames);
  *  - scoring joins doc-bigrams to the count tables on (w1, w2) / w1 —
  *    shuffle joins whose build sides are count tables (sublinear in
  *    corpus size, broadcastable for bounded vocabularies); stop-word
  *    bigrams are the classic skew keys, and the ENGINE owns their
  *    mitigation: AQE's OptimizeSkewedJoin cannot split these joins —
  *    its pattern requires Sort-over-shuffle on BOTH sides, but the
  *    count-table side here is an aggregate whose grouping partitioning
  *    the join reuses (Sort(HashAggregate(stage))), so the rule never
  *    matches (measured: the rule's debug log fires on a plain join,
  *    never on this plan; PlanSpec locks the salted shape instead).
  *    [[bigramCrossEntropy]] therefore salts hot keys itself, driven by
  *    the count tables it already has: any key whose count exceeds
  *    `saltRows` splits into ⌈count/saltRows⌉ salt cells — stream rows
  *    pick a deterministic cell (xxhash64 of the doc id), count rows
  *    replicate across cells — so no join partition carries more than
  *    ~saltRows rows of any one key, with the candidate/join semantics
  *    EXACTLY preserved (each stream row still meets its one count row);
  *  - oracle-hash discipline: `ln` is the one transcendental — its INPUT
  *    is exact (integer counts + α = 0.5 arithmetic is exact in doubles),
  *    its output is rounded to 9 dp, cast to DECIMAL and summed
  *    associatively, so partial-aggregation order cannot perturb bits
  *    (the [[Relevance]] / Q.scala §7.5 rule).
  */
object NgramLm {

  /** Laplace-style additive smoothing constant — 0.5 is exact in binary,
    * so (c + α) arithmetic stays bit-deterministic. */
  val Alpha = 0.5

  private def tokensOf(text: Column): Column = split(lower(text), " ")

  /** Adjacent-token pairs of a document as an array of (w1, w2) structs —
    * zip of the token array against itself shifted by one; empty for
    * documents of fewer than two tokens.
    */
  def bigramsOf(text: Column): Column = {
    val ws = tokensOf(text)
    val n = greatest(size(ws) - 1, lit(0))
    zip_with(slice(ws, lit(1), n), slice(ws, lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** `(w1, w2, c12)` bigram counts over the reference corpus. */
  def trainBigrams(ref: DataFrame, textCol: String): DataFrame =
    ref.select(explode(bigramsOf(col(textCol))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))

  /** The salted left join of the header's stop-word rule: keys of `table`
    * whose `cntCol` exceeds `saltRows` split into ⌈cnt/saltRows⌉ cells;
    * each stream row picks one cell deterministically (xxhash64 of
    * `saltSrc`), each table row replicates across its cells. The hot-key
    * frame is bounded by the Zipf head (keys with > saltRows
    * occurrences) and broadcasts into both sides; semantics are exactly
    * a left join on `keys` — every stream row meets its one table row.
    */
  private def saltedLeftJoin(
      stream: DataFrame, table: DataFrame, keys: Seq[String],
      cntCol: String, saltSrc: Column, saltRows: Long): DataFrame = {
    val hot = table.filter(col(cntCol) > saltRows)
      .select(keys.map(col) :+
        ceil(col(cntCol).cast("double") / saltRows).cast("int").as("__ns"): _*)
    val streamS = stream.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__ns").isNull, lit(0))
          .otherwise(pmod(xxhash64(saltSrc), col("__ns")).cast("int")))
      .drop("__ns")
    val tableS = table.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        explode(sequence(lit(0), coalesce(col("__ns"), lit(1)).cast("int") - 1)))
      .drop("__ns")
    streamS.join(tableS, keys :+ "__salt", "left").drop("__salt")
  }

  /** Score every document against a bigram LM trained on `ref`:
    * cross-entropy = −mean over the document's bigrams of
    * ln((c(w1,w2) + α) / (c(w1) + α·|V|)), unseen bigrams/contexts
    * falling back to the smoothed floor. Output:
    * (id, n_bigrams, oov_bigrams, xent) — xent ROUND(…, 6); documents
    * with fewer than two tokens are dropped (no bigram to score).
    *
    * @param saltRows hot-key salting threshold for the two count-table
    *   joins (see the header's stop-word rule — AQE cannot split these).
    *   A key with more than saltRows stream occurrences splits into
    *   count-proportional salt cells; the default only engages at
    *   genuinely skewed volumes, so small-corpus plans stay flat.
    */
  def bigramCrossEntropy(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, alpha: Double = Alpha,
      saltRows: Long = 4000000L): DataFrame = {
    // empty-text ref rows are excluded BEFORE training, mirroring the
    // scored side's filter: an empty document would otherwise contribute
    // an '' token to |V| (split('') = ['']) and shift every xent value
    val ref_ = ref.filter(length(col(textCol)) > 0)
    val big = trainBigrams(ref_, textCol)
    val ctx = big.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = ref_
      .select(explode(tokensOf(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val stream = docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol).as("id"), explode(bigramsOf(col(textCol))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val scored =
      saltedLeftJoin(
        saltedLeftJoin(stream, big, Seq("w1", "w2"), "c12", col("id"), saltRows),
        ctx, Seq("w1"), "c1", col("id"), saltRows)
      .crossJoin(vocab)
      .select(col("id"), col("c12"),
        log((coalesce(col("c12"), lit(0L)) + lit(alpha)) /
            (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))).as("lp"))
    scored
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("c12").isNull, 1)).as("oov_bigrams"),
        round(-(sum(round(col("lp"), 9).cast("decimal(24,9)")).cast("double"))
          / count(lit(1)), 6).as("xent"))
  }

  /** CCNet head/middle/tail perplexity buckets, exact-rank tier (Wenzek
    * 2020 §4.3: per-language documents are ranked by LM score and cut into
    * thirds; training mixes keep head+middle and drop or down-weight tail).
    * ntile(3) within each class over (xent asc, id asc) — a total order,
    * so bucket assignment is deterministic and integer-exact: this is the
    * DIFFERENTIAL tier, the role jaccardPairs plays for minhashLsh. The
    * per-class window is one sort of the scored frame; at 100 TB use
    * [[perplexityBucketsByCuts]], which never ranks the corpus.
    *
    * Returns `scored` plus (tercile, bucket).
    */
  def perplexityBucketsExact(
      scored: DataFrame, idCol: String, classCol: String,
      xentCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol)).orderBy(col(xentCol).asc, col(idCol).asc)
    scored
      .withColumn("tercile", ntile(3).over(w))
      .withColumn("bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
  }

  /** The 100 TB bucket path: per-class cut points from ONE aggregation
    * (percentile at 1/3 and 2/3 — swap in `percentile_approx` over a
    * per-class sample in deployment, exactly CCNet's procedure: its cuts
    * come from a histogram of a sample, not a global sort), broadcast
    * back, assignment map-only. The corpus is never sorted or ranked.
    * Bucket semantics at the cut values differ from the rank-exact tier
    * only by tie handling at the boundary quantiles (ntile splits ties by
    * id; a value cut sends equal xents to one side) — the sampled-cut
    * path trades that edge for scale, which is why the exact tier above
    * exists as its verification baseline.
    */
  def perplexityBucketsByCuts(
      scored: DataFrame, classCol: String, xentCol: String): DataFrame = {
    val cuts = scored.groupBy(col(classCol))
      .agg(
        expr(s"percentile($xentCol, 1.0D/3.0D)").as("__c1"),
        expr(s"percentile($xentCol, 2.0D/3.0D)").as("__c2"))
    scored.join(broadcast(cuts), Seq(classCol))
      .withColumn("bucket",
        when(col(xentCol) <= col("__c1"), "head")
          .when(col(xentCol) <= col("__c2"), "middle").otherwise("tail"))
      .drop("__c1", "__c2")
  }
}
