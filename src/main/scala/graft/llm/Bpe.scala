package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding: the tokenizer-training step of an LLM
  * data pipeline (Sennrich et al. 2016), expressed Spark-first.
  *
  * Shape at 100 TB:
  *  - training never iterates over the corpus. ONE corpus pass builds the
  *    distinct-word frequency table (the working set — vocabulary-bounded,
  *    ~10⁶ rows regardless of corpus size); every Lloyd-style merge round
  *    then runs on that table: explode adjacent symbol pairs (weighted by
  *    word frequency), one map-side-combined aggregation keyed by pair,
  *    and a bounded `limit(1).collect()` of the argmax (the same
  *    bounded-collect discipline as Kmeans' k-row centroid fetch);
  *  - merge application is a literal `replace` chain — whole-stage
  *    codegen'd string kernels, no UDF anywhere;
  *  - encoding is MAP-ONLY (no shuffle, no state): the learned merges are
  *    baked into the expression as literals, so tokenizing 100 TB is one
  *    embarrassingly-parallel pass, exactly how production tokenizers run.
  *
  * Merge-application semantics (the cross-engine subtlety): BPE replaces
  * occurrences of the top pair LEFT-TO-RIGHT, non-overlapping — "a a a"
  * under merge (a,a) becomes [aa, a], and consecutive occurrences "a b a b"
  * under (a,b) merge BOTH. A naive single-space needle `' a b '` misses the
  * second of two adjacent occurrences (the shared boundary space is
  * consumed by the first match), so symbols are temporarily re-delimited
  * with DOUBLE spaces — every token then owns a space on each side, the
  * needle `' a  b '` matches each occurrence independently, and the
  * single-space-padded replacement `' ab '` restores the invariant.
  * `replace` scans left-to-right in both Spark and DuckDB, so the oracle
  * replays the identical algorithm.
  */
object Bpe {

  /** A learned merge: rank (1-based), the pair ("a b"), and its count. */
  final case class Merge(rank: Long, pair: String, cnt: Long)

  /** Initial symbol string for a word: chars space-joined, end-of-word
    * marker `_` appended — "data" → "d a t a _".
    */
  def initSymbols(word: Column): Column =
    concat(regexp_replace(word, "(.)", "$1 "), lit("_"))

  /** The vocabulary working set: `(word, freq, syms)` from one corpus
    * pass. Words restricted to `[a-z]+` so the symbol alphabet cannot
    * collide with the space delimiter or the `_` marker.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) > 0)
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", initSymbols(col("word")))

  /** Adjacent symbol pairs of a syms string, each as "left right". */
  def adjacentPairs(syms: Column): Column = {
    val arr = split(syms, " ")
    val n = size(arr)
    zip_with(slice(arr, lit(1), n - 1), slice(arr, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Apply one merge to a syms string via the doubled-delimiter replace. */
  def applyMergeOnce(syms: Column, left: String, right: String): Column = {
    val needle = s" $left  $right "
    val merged = s" $left$right "
    trim(replace(
      replace(
        concat(lit(" "), replace(syms, lit(" "), lit("  ")), lit(" ")),
        lit(needle), lit(merged)),
      lit("  "), lit(" ")))
  }

  /** Fold a literal merge list over a word column: word → final syms. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initSymbols(word)) { case (s, (l, r)) =>
      applyMergeOnce(s, l, r)
    }

  /** Train `nMerges` BPE merges. Each round is one aggregation over the
    * vocabulary table plus a 1-row collect; the corpus is read once.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var wf = wordFreqs(docs, textCol).persist(lvl)
    wf.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1L
    var done = false
    while (r <= nMerges && !done) {
      val top = wf
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        out += Merge(r, pair, cnt)
        val Array(l, rt) = pair.split(" ", 2)
        val next = wf
          .withColumn("syms", applyMergeOnce(col("syms"), l, rt))
          .persist(lvl)
        next.count()
        wf.unpersist()
        wf = next
        r += 1
      }
    }
    wf.unpersist()
    out.toSeq
  }

  /** The learned merge table as a frame: `(rank, pair, cnt)`. */
  def trainDf(spark: SparkSession, docs: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, nMerges).toDF("rank", "pair", "cnt")
  }

  /** Map-only encoding pass: per document, the word count and the BPE
    * token count under a FIXED merge list. No shuffle — the merge chain
    * is literal replaces inside a higher-order fold.
    */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col(idCol),
        filter(split(lower(col(textCol)), " "),
          w => w.rlike("^[a-z]+$")).as("ws"))
      .select(col(idCol),
        size(col("ws")).cast("long").as("n_words"),
        aggregate(
          transform(col("ws"),
            w => size(split(encodeWord(w, merges), " ")).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_tokens"))
}
