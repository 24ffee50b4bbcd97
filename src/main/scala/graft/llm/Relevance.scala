package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF / BM25 relevance scoring over a document corpus — the retrieval
  * primitive a training-data pipeline uses for corpus curation (rank
  * documents against a topic probe), decontamination triage (score overlap
  * candidates before the expensive shingle check), and quality mixing
  * (per-domain relevance weights). The reference engine has no built-in
  * full-text scoring; this sits in the LLM tier next to
  * [[TextOps.qualityScore]] and the [[Dedup]] family.
  *
  * Scale notes (100 TB):
  *  - the posting build is ONE shuffle keyed (doc_id, term) with map-side
  *    combine; document length is computed BEFORE the explode and rides
  *    the shuffle as a carried constant — no second pass over the corpus;
  *  - for search, the term filter (`isin` on the literal query list) is
  *    applied directly after the explode, BEFORE the shuffle, so only
  *    query-matching tokens are ever keyed — the inverted-index access
  *    pattern without materializing an index;
  *  - term statistics (document frequency) aggregate to a frame bounded
  *    by |query terms| (search) or |vocabulary| (tfIdf) — both sublinear
  *    in corpus size — and join back: hint-broadcast for the
  *    query-bounded search frame, AQE-chosen for the vocabulary-sized
  *    tfIdf frame (a web-corpus vocabulary can exceed broadcast limits);
  *  - corpus scalars (N, avgdl) are a 1-row aggregate cross-joined in
  *    (AQE broadcasts single-row frames; no driver collect);
  *  - oracle-hash discipline: `ln` (the one transcendental) is evaluated
  *    only per TERM, never per row; per-doc contributions are rounded,
  *    cast to exact DECIMAL and summed associatively, then presented as
  *    ROUND(double, 6) — partial-aggregation order cannot perturb bits
  *    (the Q.scala §7.5 rule).
  */
object Relevance {

  /** BM25 tuning constants (the Robertson defaults). */
  val K1 = 1.2
  val B = 0.75

  def tokensOf(text: Column): Column = split(lower(text), " ")

  /** `(id, term, tf, dl)`: per-document term frequencies with the
    * document's token count carried alongside. One shuffle.
    */
  def docTermFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withLen = docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol), size(tokensOf(col(textCol))).as("dl"))
    withLen
      .select(col(idCol), col("dl"), explode(tokensOf(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** `(n_docs, avgdl)` — 1 row. avg of exact integer sums: deterministic. */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) > 0)
      .agg(count(lit(1)).as("n_docs"),
        avg(size(tokensOf(col(textCol))).cast("long")).as("avgdl"))

  /** `(id, term, tfidf)` over the whole vocabulary: tf × ln(N/df),
    * rounded to 9 decimals (one `ln` per distinct term; the window the
    * caller may put on top orders by this rounded value so a final-ULP
    * libm difference cannot reorder rows).
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dt = docTermFreqs(docs, idCol, textCol)
    val df_ = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val n = corpusStats(docs, textCol).select("n_docs")
    // no broadcast hint on the df frame: it is VOCABULARY-sized, and a
    // web-corpus vocabulary exceeds broadcast/driver limits at 100 TB —
    // AQE picks broadcast when the measured size fits, shuffle-join on
    // term otherwise (the hint stays only in bm25Search, where the frame
    // is bounded by |queryTerms|)
    dt.join(df_, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 9)
          .as("tfidf"))
  }

  /** Top-k documents for a bag-of-words query under BM25:
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))` (always positive).
    * Returns `(id, matched_terms, score)` in (score DESC, id ASC) order.
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 20,
      k1: Double = K1, b: Double = B): DataFrame = {
    val withLen = docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol), size(tokensOf(col(textCol))).as("dl"))
    // term filter sits between the explode and the shuffle: only tokens
    // matching the query list are ever keyed
    val posting = withLen
      .select(col(idCol), col("dl"), explode(tokensOf(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // df over the full corpus for each query term: posting is already
    // 1 row per (doc, term), so df = count per term; ≤ |queryTerms| rows
    val stats = posting.groupBy("term").agg(count(lit(1)).as("df"))
    val scalars = corpusStats(docs, textCol)
    val contrib = posting
      .join(broadcast(stats), "term")
      .crossJoin(broadcast(scalars))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    contrib
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("matched_terms"),
        sum(round(col("contrib"), 9).cast("decimal(24,9)"))
          .cast("double").as("score_raw"))
      .select(col(idCol), col("matched_terms"),
        round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc_nulls_last, col(idCol).asc_nulls_last)
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): fuse any
    * number of independently-ranked candidate lists into one ranking by
    * `score(d) = Σ_lists 1/(rrfK + rank_list(d))` — the standard hybrid
    * retrieval combiner (BM25 lexical ranks ⊕ embedding-cosine semantic
    * ranks) because it needs no score calibration between lists, only
    * ranks.
    *
    * Each input frame must carry `(idCol, rankCol)` with ranks 1-based;
    * lists are typically topK-truncated, so the union is Σ topK rows —
    * the fuse aggregation is bounded by candidate count, never corpus
    * size, and its output broadcasts into whatever join follows.
    *
    * Oracle-hash discipline: each reciprocal contribution is ROUND(…, 9)
    * and cast to DECIMAL(18,9) before the sum, so the per-document score
    * is an exact decimal sum (order-proof); presented as ROUND(double, 6).
    *
    * @return (id, n_lists, rrf_score) — n_lists = how many input lists
    *         surfaced the document (its coverage); callers join per-list
    *         ranks back on id for provenance columns
    */
  def rrfFuse(ranked: Seq[DataFrame], idCol: String,
      rankCol: String = "rank", rrfK: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    require(rrfK >= 0, "rrfK must be >= 0")
    ranked.map(df => df.select(col(idCol).as("id"), col(rankCol).as("rank")))
      .reduce(_ unionByName _)
      .select(col("id"),
        round(lit(1.0) / (lit(rrfK) + col("rank")), 9)
          .cast("decimal(18,9)").as("contrib"))
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_lists"),
        round(sum(col("contrib")).cast("double"), 6).as("rrf_score"))
  }
}
