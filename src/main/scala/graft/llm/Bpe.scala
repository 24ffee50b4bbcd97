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
  *  - encoding has two tiers: [[encodeTokenCounts]] bakes the merges in
  *    as a literal replace chain — MAP-ONLY (no shuffle), but each merge
  *    adds ~6 expression nodes, so it holds only to a few hundred merges
  *    before JVM/codegen method-size limits; [[encodeTokenCountsJoined]]
  *    keeps the merges as a TABLE and encodes the DISTINCT-word
  *    vocabulary iteratively (rounds bounded by word length, not merge
  *    count), then joins token counts back to the corpus — the form that
  *    holds at a production tokenizer's ~30k merges.
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
  def applyMergeOnce(syms: Column, left: String, right: String): Column =
    applyMergeCol(syms, lit(s"$left $right"))

  /** [[applyMergeOnce]] with the pair as a COLUMN value ("left right") —
    * the kernel the join-based encoder needs, where the pair to apply
    * arrives from the merge table rather than as a plan-time literal.
    * Identical algorithm (the literal form delegates here).
    */
  def applyMergeCol(syms: Column, pair: Column): Column = {
    val needle = concat(lit(" "), replace(pair, lit(" "), lit("  ")), lit(" "))
    val merged = concat(lit(" "), replace(pair, lit(" "), lit("")), lit(" "))
    trim(replace(
      replace(
        concat(lit(" "), replace(syms, lit(" "), lit("  ")), lit(" ")),
        needle, merged),
      lit("  "), lit(" ")))
  }

  /** Fold a literal merge list over a word column: word → final syms. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initSymbols(word)) { case (s, (l, r)) =>
      applyMergeOnce(s, l, r)
    }

  /** Train `nMerges` BPE merges. Each round is one aggregation over the
    * vocabulary table plus a 1-row collect; the corpus is read once.
    *
    * Every round ends in an EAGER localCheckpoint (default
    * `checkpointEvery = 1`), keeping the logical plan exactly one round
    * deep. The persist-chain alternative (checkpointEvery > 1: persist +
    * count between checkpoints) truncates EXECUTION but not the PLAN, and
    * the growth is worse than the linear lineage it looks like: round r's
    * InMemoryRelation embeds round r−1's entire cached plan, so
    * plan-DESCRIPTION strings compound MULTIPLICATIVELY — by round ~20 at
    * even a toy vocabulary, AQE's per-job physicalPlanDescription events
    * were traversing billion-character trees (measured in the round-11
    * rehearsal: 1.6e9-char plan strings before round 25; the run was
    * abandoned, which is the measurement). `spark.sql.maxPlanStringLength`
    * bounds what is STORED, not the traversal. Materialization cost is a
    * wash (persist+count already ran a job per round), so per-round
    * checkpointing is strictly better; the parameter survives only so the
    * rehearsal can measure the legacy chain.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      checkpointEvery: Int = 1): Seq[Merge] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Deterministic reclamation of a superseded round's blocks. For a
    // persist()ed frame, Dataset.unpersist suffices; for a
    // localCheckpoint(true)'d frame it is a NO-OP — the blocks belong to
    // the internal checkpointed RDD (pinned inside the LogicalRDD leaf),
    // not to the cache-manager entry — so the ~vocabulary-sized block set
    // of every retired round would otherwise linger until the
    // ContextCleaner GC'd the RDD reference. Unpersisting at the RDD
    // level frees each generation as soon as its successor is
    // materialized: at most TWO generations of blocks live at any point
    // in a 2,000-merge train. The retired frame is never referenced
    // again (its lineage is truncated, so a recompute after unpersist
    // would fail loudly, not silently).
    def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist()
    }
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
        val applied = wf.withColumn("syms", applyMergeOnce(col("syms"), l, rt))
        // RDD-level release only when the successor is CHECKPOINTED
        // (self-contained — its blocks reference no predecessor); a
        // merely-persisted successor (the legacy checkpointEvery > 1
        // chains the rehearsal measures) still carries lineage through
        // wf, so a lost-block recompute must find wf's blocks intact —
        // there, plain unpersist (a no-op on a checkpointed wf, the
        // pre-existing GC-driven behavior that chain already pays for)
        val nextCheckpointed = r % checkpointEvery == 0
        val next =
          if (nextCheckpointed) applied.localCheckpoint(true)
          else { val p = applied.persist(lvl); p.count(); p }
        if (nextCheckpointed) release(wf) else wf.unpersist()
        wf = next
        r += 1
      }
    }
    release(wf)
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

  /** Encode a DISTINCT-word frame against a merge TABLE — the encoder
    * that survives production merge counts. [[encodeWord]] folds the
    * merge list into one literal replace chain: ~6 expression nodes per
    * merge, so a real tokenizer's ~30k merges exceed JVM/codegen
    * method-size limits long before execution. This form keeps the merge
    * list as DATA:
    *
    *  - each round, every word's adjacent symbol pairs join the
    *    (broadcast — bounded by nMerges, the k-centroid argument of
    *    [[Kmeans.assignByJoin]]) merge table and the word applies its
    *    LOWEST-RANK applicable merge via [[applyMergeCol]];
    *  - rounds repeat until no word has an applicable pair. Per round a
    *    word's applied rank strictly increases (a merge can only create
    *    pairs involving its own output token, which BPE training can
    *    only have learned at a HIGHER rank), so this greedy min-rank
    *    loop replays [[encodeWord]]'s rank-order fold EXACTLY — byte
    *    equality is locked in BpeSpec — while the round count is bounded
    *    by the longest word's symbol count (≈ word length), NOT by
    *    nMerges: 30k merges still converge in ≲ 25 rounds on natural
    *    words;
    *  - each round ends in a localCheckpoint, so the logical plan stays
    *    one round deep and per-round cost is a (vocabulary-sized) scan +
    *    broadcast join — never corpus-sized.
    *
    * Precondition: `merges` is rank-ordered with every pair's two tokens
    * predating it (any [[train]] output satisfies this — it is the
    * definition of a BPE merge list).
    *
    * Input: any frame with a `word` column (deduplicated here).
    * Output: (word, syms, n_tokens).
    */
  def encodeVocab(words: DataFrame, merges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val m = broadcast(
      merges.select(col("rank").cast("long").as("__rank"), col("pair").as("__pair")))
    var state = words.select(col("word")).distinct()
      .withColumn("syms", initSymbols(col("word")))
      .localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val best = state
        .select(col("word"), explode(array_distinct(adjacentPairs(col("syms")))).as("__pair"))
        .join(m, "__pair")
        .groupBy(col("word"))
        .agg(min(struct(col("__rank"), col("__pair"))).as("__b"))
        .select(col("word"), col("__b.__pair").as("__mp"))
      val next = state.join(best, Seq("word"), "left")
        .select(col("word"),
          when(col("__mp").isNull, col("syms"))
            .otherwise(applyMergeCol(col("syms"), col("__mp"))).as("syms"),
          col("__mp").isNotNull.as("__active"))
        .localCheckpoint(true)
      converged = next.filter(col("__active")).isEmpty
      state = next.select(col("word"), col("syms"))
      rounds += 1
    }
    require(converged,
      s"BPE encode did not converge in $maxRounds rounds — a word longer " +
        "than maxRounds symbols keeps merging; raise maxRounds")
    state.withColumn("n_tokens", size(split(col("syms"), " ")).cast("long"))
  }

  /** [[encodeTokenCounts]] against a merge TABLE: per-document word and
    * BPE token counts at production merge counts. The corpus is read
    * once and never carries the merge chain — words explode to (id,
    * word), join the [[encodeVocab]]-encoded vocabulary (vocabulary-
    * sized; AQE broadcasts it when it fits), and one aggregation keyed
    * by id folds the counts back. Same output contract as the literal
    * form, including (id, 0, 0) rows for documents with no encodable
    * word — locked byte-equal in BpeSpec.
    */
  def encodeTokenCountsJoined(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val base = docs.select(col(idCol),
      filter(split(lower(col(textCol)), " "), w => w.rlike("^[a-z]+$")).as("ws"))
    val words = base.select(col(idCol), explode(col("ws")).as("word"))
    val encoded = encodeVocab(words.select(col("word")), merges)
      .select(col("word"), col("n_tokens").as("__wt"))
    val sums = words.join(encoded, "word")
      .groupBy(col(idCol))
      .agg(sum(col("__wt")).as("__t"))
    base.select(col(idCol), size(col("ws")).cast("long").as("n_words"))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol), col("n_words"),
        coalesce(col("__t"), lit(0L)).as("n_tokens"))
  }
}
