package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication operators, each a DataFrame → DataFrame plan
  * with no driver-side iteration (the one exception: [[Dedup.connectedComponents]]
  * carries a bounded iteration-control loop — see its scaladoc):
  *
  *  - exact:       hash-groupBy on a canonical key (one shuffle on the hash)
  *  - minhashLsh:  shingle → MinHash → band → bucket-join → verify; the
  *                 candidate join shuffles on (band, bucket) so only
  *                 colliding docs ever meet — the 100-TB path, vs the
  *                 quadratic all-pairs verify
  *  - simhashPairs: 64-bit SimHash, banded into 16-bit chunks (pigeonhole:
  *                 hamming ≤ 3 ⇒ some chunk equal), verified by bit_count
  *  - jaccardPairs: exact all-pairs (small inputs / verification oracle)
  *  - embeddingPairs: exact cosine all-pairs above a threshold
  *
  * Reference analog: the setdigest MinHash type and jaccard_index scalar
  * (presto-main/.../type/setdigest/SetDigestFunctions.java) — re-expressed
  * as relational plans instead of per-row sketch values.
  */
object Dedup {

  /** Exact duplicates by md5 of a key expression: emits one row per
    * duplicate *group* (n > 1) with the keeper (min id) and members.
    */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.select(col(idCol), md5(col(keyCol)).as("dup_key"))
      .groupBy(col("dup_key"))
      .agg(count(lit(1)).as("n_dups"),
        min(col(idCol)).as("keeper"),
        sort_array(collect_list(col(idCol))).as("members"))
      .filter(col("n_dups") > 1)

  /** Segment-level (sub-document) duplication profile — the C4/MassiveText
    * line-dedup rule generalized to fixed-width word windows: split every
    * document into consecutive `segWords`-word segments, count how many of
    * a document's segments also appear in at least one OTHER document, and
    * emit per-document (id, n_segs, dup_segs). Downstream curation either
    * drops high-fraction documents or cuts the duplicated segments out;
    * within-document repetition is deliberately NOT counted here (that is
    * the repetition-ratio quality rule's job).
    *
    * Scale shape: segments travel as xxhash64 longs, never strings, so the
    * corpus-wide segment table is 8 bytes + id per segment. One shuffle
    * hash-partitions segments to count distinct containing docs; the join
    * back to the per-doc side reuses the same (seg) partitioning, and the
    * final per-doc rollup shuffles ids — all linear in total segment count,
    * the same cost envelope as exact dedup. No driver-side state.
    */
  def segmentDuplication(
      df: DataFrame,
      idCol: String,
      text: org.apache.spark.sql.Column,
      segWords: Int = 16): DataFrame = {
    require(segWords >= 1, "segWords must be >= 1")
    val chunks = segIndex(tokenized(df, idCol, text), segWords)
    chunks.join(segDocCounts(chunks), "seg")
      .groupBy("id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("nd") > 1, 1).otherwise(0)).cast("long").as("dup_segs"))
  }

  /** (id, word-array) per document with at least one word — the shared
    * front of the segment operators.
    */
  private def tokenized(df: DataFrame, idCol: String,
      text: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol).as("id"), split(text, " ").as("w"))
      .filter(size(col("w")) >= 1)

  /** (id, i, seg) — one row per consecutive `segWords`-word window, seg =
    * xxhash64 of the joined window. THE segment boundary arithmetic: both
    * the duplication profile and the cut derive from this one definition,
    * so they can never disagree about where a segment starts.
    */
  private def segIndex(base: DataFrame, segWords: Int): DataFrame =
    base.select(col("id"),
        explode(sequence(lit(1),
          ceil(size(col("w")) / lit(segWords.toDouble)).cast("int"))).as("i"),
        col("w"))
      .select(col("id"), col("i"),
        xxhash64(array_join(
          slice(col("w"), (col("i") - 1) * segWords + 1, lit(segWords)), " ")).as("seg"))

  /** (seg, nd) — distinct containing-document count per segment. */
  private def segDocCounts(chunks: DataFrame): DataFrame =
    chunks.groupBy("seg").agg(countDistinct(col("id")).as("nd"))

  /** Segment-level CUT — the transform twin of [[segmentDuplication]]:
    * remove every `segWords`-word segment that also appears in at least
    * one other document and rebuild the document from the surviving
    * segments, in their original order (the C4 rule applied at segment
    * granularity: boilerplate and cross-posted passages vanish, unique
    * prose stays). Within-document repeats are kept — they are one
    * document's own content, not corpus contamination. Documents whose
    * every segment is shared elsewhere are dropped entirely (nothing
    * survives to rebuild).
    *
    * Same scale shape as the profile: hashes travel, not strings; the
    * rebuild joins the (small) kept-index sets back to the tokenized
    * corpus on id and reslices — no shuffle ever carries segment text.
    */
  def segmentCut(
      df: DataFrame,
      idCol: String,
      text: org.apache.spark.sql.Column,
      segWords: Int = 16): DataFrame = {
    require(segWords >= 1, "segWords must be >= 1")
    val base = tokenized(df, idCol, text)
    val chunks = segIndex(base, segWords)
    val keptIdx = chunks.join(segDocCounts(chunks), "seg")
      .filter(col("nd") === 1)
      .groupBy("id").agg(array_sort(collect_list(col("i"))).as("ks"))
    base.join(keptIdx, "id")
      .select(col("id"),
        array_join(flatten(transform(col("ks"),
          i => slice(col("w"), (i - 1) * segWords + 1, lit(segWords)))), " ")
          .as("clean_text"))
  }

  /** Sliding-window EXACT-SUBSTRING duplicate spans (the ExactSubstr rule
    * of Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499, at token-window granularity): every
    * `windowTokens`-token window is fingerprinted at EVERY offset — contrast
    * [[segmentDuplication]]'s fixed 16-word grid, which cannot see a
    * duplicated passage that straddles a grid boundary. A window occurrence
    * is DUPLICATED when the same fingerprint occurs earlier in corpus order
    * (doc id, then offset); the first occurrence is canonical and is never
    * marked, so exactly one copy of every repeated passage survives a cut.
    * Per document, duplicated window starts merge into maximal contiguous
    * covered intervals (gaps-and-islands over a running max-end), giving one
    * row per duplicated SPAN.
    *
    * Scale shape (100 TB):
    *  - the window stream is one row per corpus token (the magnitude
    *    [[NgramLm]] shuffles for bigrams); window TEXT never travels —
    *    the xxhash64 fingerprint is computed below the shuffle and only
    *    (fp, id, p) rows are keyed;
    *  - canonical selection is groupBy(fp).min(struct(id, p)) — a map-side
    *    combinable aggregation, NOT row_number over the fp partition, so a
    *    degenerate fingerprint (one boilerplate window repeated millions of
    *    times) costs one combiner cell, never one hot sorted partition; the
    *    canon table is pre-filtered to fingerprints seen more than once, so
    *    the mark join's build side carries only the duplicated minority and
    *    unique windows (the bulk of a corpus) never survive the inner join;
    *  - island merging is a per-document window function whose state is one
    *    document's dup-window list — bounded by document length, never
    *    corpus size.
    *
    * @return (id, span_start, span_end, span_tokens) — 1-based inclusive
    *         token positions, one row per maximal duplicated span
    */
  def substringSpans(
      df: DataFrame,
      idCol: String,
      text: org.apache.spark.sql.Column,
      windowTokens: Int = 16): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    val W = windowTokens
    val base = tokenized(df, idCol, text).filter(size(col("w")) >= W)
    val wins = base
      .select(col("id"),
        explode(sequence(lit(1), size(col("w")) - (W - 1))).as("p"), col("w"))
      .select(col("id"), col("p"),
        xxhash64(array_join(slice(col("w"), col("p"), lit(W)), " ")).as("fp"))
    val canon = wins.groupBy("fp")
      .agg(count(lit(1)).as("cnt"), min(struct(col("id"), col("p"))).as("c"))
      .filter(col("cnt") > 1)
      .select(col("fp"), col("c"))
    val dup = wins.join(canon, "fp")
      .filter(!(col("c.id") === col("id") && col("c.p") === col("p")))
      .select("id", "p")
    val wDoc = Window.partitionBy("id").orderBy("p")
    val prevEnd = max(col("p") + lit(W - 1))
      .over(wDoc.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("new_isl",
        when(col("p") > coalesce(prevEnd, lit(-1)), 1).otherwise(0))
      .withColumn("island", sum(col("new_isl"))
        .over(wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("id", "island")
      .agg(min(col("p")).as("span_start"), (max(col("p")) + lit(W - 1)).as("span_end"))
      .select(col("id"), col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long").as("span_tokens"))
  }

  /** The transform twin of [[substringSpans]]: cut every duplicated span
    * out of each affected document and rebuild its text from the surviving
    * token positions, order preserved (canonical first occurrences stay by
    * the span rule, so the corpus keeps exactly one copy of each repeated
    * passage). Emits only documents that had at least one span — untouched
    * documents need no rewrite. A document whose every position is covered
    * rebuilds to the empty string (kept, clean_words = 0 — callers drop or
    * threshold).
    *
    * The rebuild joins the spans (per-doc bounded arrays) back to the
    * tokenized corpus on id and filters positions with a per-row `exists`
    * over the document's own span list — no shuffle carries text except
    * the final per-doc rebuild itself.
    *
    * @return (id, clean_text, clean_words)
    */
  def substringCut(
      df: DataFrame,
      idCol: String,
      text: org.apache.spark.sql.Column,
      windowTokens: Int = 16): DataFrame = {
    val W = windowTokens
    val base = tokenized(df, idCol, text).filter(size(col("w")) >= W)
    val spAgg = substringSpans(df, idCol, text, W)
      .groupBy("id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("sps"))
    base.join(spAgg, "id")
      .select(col("id"),
        transform(
          filter(sequence(lit(1), size(col("w"))),
            p => !exists(col("sps"),
              sp => p >= sp.getField("s") && p <= sp.getField("e"))),
          p => element_at(col("w"), p)).as("kept"))
      .select(col("id"), array_join(col("kept"), " ").as("clean_text"),
        size(col("kept")).cast("long").as("clean_words"))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * @param elems column expression producing the document's element array
    *              (token set or shingle set), already distinct
    * @param k     signature length; bands*rowsPerBand must equal k
    * @param threshold verified Jaccard threshold for emitted pairs
    * @param hotBucketCap buckets wider than this (degenerate: thousands of
    *              near-identical docs hashing into one band bucket) would
    *              re-quadratize the candidate self-join (w² pairs); they are
    *              instead STAR-LINKED — every member pairs with the bucket's
    *              minimum id only (w−1 pairs). Verification still filters
    *              exactly, and greedy min-id clustering (dropDuplicates)
    *              removes the same duplicates: each member is tied to the
    *              representative directly. The trade: within a degenerate
    *              bucket the output lists representative pairs, not all
    *              member-member pairs.
    */
  /** The shared banded-LSH candidate machinery: given an exploded
    * (group…, id[, payload…]) frame, emit the deduped candidate pair set
    * — all (id_a < id_b) pairs within buckets up to `cap` wide, star
    * pairs (min-id representative, member) within wider ones, so a
    * degenerate bucket contributes w−1 candidates instead of w²/2. One
    * definition serves the minhash, simhash, and embedding tiers: the
    * hot-bucket bound, the renamed-right-side self-join (two distinct
    * attributes — no lineage-ambiguity resolution), and the
    * collapse-before-verify dedup cannot drift between them.
    *
    * @param grpCols bucket key columns (e.g. band/bucket, chunk_idx/chunk)
    * @param payload columns carried through to the output as `<c>_a` /
    *                `<c>_b` beside id (simhash rides its 64-bit hash
    *                along so star pairs need no join back); the bucket
    *                representative is min(struct(id, payload…)), which
    *                orders by id first — identical to min(id)
    * @return (id_a[, payload_a…], id_b[, payload_b…]) candidate pairs
    */
  private[llm] def bandedCandidates(
      exploded: DataFrame,
      grpCols: Seq[String],
      payload: Seq[String],
      cap: Int): DataFrame = {
    val aCols = "id" +: payload
    val rep =
      if (payload.isEmpty) min(col("id"))
      else min(struct(aCols.map(col): _*))
    // Bucket width + representative via a map-side-combinable GROUP BY,
    // not count(1).over(Window.partitionBy(bucket)): the window form
    // sorts every bucket onto one task BEFORE the cap can act, so a
    // degenerate bucket (one band value over 20% of the corpus) becomes
    // a single-task sort of w rows — the exact hot-spot the cap exists
    // to bound. The aggregate combines partial counts map-side (O(1)
    // state per bucket per task), and the join back hashes on the same
    // (band, bucket) key the window needed anyway — a streaming hash
    // probe, no sort, no single-task accumulation. Same shape as
    // [[substringSpans]]' canonical-window selection. Width-1 buckets —
    // the vast majority of any banded corpus — are dropped by the
    // `__bw > 1` filter before the join, so they never reach the
    // self-join at all.
    val stats = exploded
      .groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("__bw"), rep.as("__bmin"))
      .filter(col("__bw") > 1)
    // persisted: three consumers (both self-join sides + the star pairs)
    // would otherwise each redo the explode + shuffle + join
    val banded = exploded.join(stats, grpCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val normal = banded.filter(col("__bw") <= cap)
    val left = normal.select(
      grpCols.map(col) ++ aCols.map(c => col(c).as(s"${c}_a")): _*)
    val right = normal.select(
      grpCols.map(c => col(c).as(s"${c}_r")) ++ aCols.map(c => col(c).as(s"${c}_b")): _*)
    val cond = grpCols.map(c => col(c) === col(s"${c}_r")).reduce(_ && _) &&
      col("id_a") < col("id_b")
    val allPairs = left.join(right, cond)
      .select(aCols.map(c => col(s"${c}_a")) ++ aCols.map(c => col(s"${c}_b")): _*)
    val repId = if (payload.isEmpty) col("__bmin") else col("__bmin.id")
    val starPairs = banded.filter(col("__bw") > cap && col("id") =!= repId)
      .select((if (payload.isEmpty) Seq(col("__bmin").as("id_a"))
        else aCols.map(c => col(s"__bmin.$c").as(s"${c}_a"))) ++
        aCols.map(c => col(c).as(s"${c}_b")): _*)
    allPairs.unionByName(starPairs).dropDuplicates("id_a", "id_b")
  }

  def minhashLsh(
      df: DataFrame,
      idCol: String,
      elems: org.apache.spark.sql.Column,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      hotBucketCap: Int = 1000): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands

    // (id, k longs) per doc — the native MinhashSignature expression (flat
    // JVM loop, not interpreted lambdas); persisted so banding, the
    // candidate self-join and the estimate join all reuse one hashing pass.
    val sigs = df
      .select(col(idCol).as("id"), TextOps.minhashSignature(elems, k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Candidates: docs sharing any band bucket, via the shared
    // bandedCandidates machinery — join on ids only (the element arrays
    // would multiply the shuffle by the collision count), multi-band
    // collisions collapsed BEFORE verification so each candidate pair is
    // screened exactly once, hot buckets star-linked.
    val candidates = bandedCandidates(
      sigs
        .select(col("id"), explode(TextOps.lshBands(col("sig"), bands, rows)).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")),
      grpCols = Seq("band", "bucket"), payload = Nil, cap = hotBucketCap)

    // Screen: estimated Jaccard = fraction of agreeing signature slots —
    // k integer compares per pair against the cached signatures. A 0.2
    // slack below the threshold is ~3σ at k=32, so true pairs survive.
    val estSlack = 0.2
    val screened = candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est") >= threshold - estSlack)
      .select(col("id_a"), col("id_b"))

    // Verify survivors exactly: recompute elements only for docs still in
    // play — broadcast the (small) id set into a semi filter so the exact
    // Jaccard touches a vanishing fraction of the corpus. The element
    // arrays travel as xxhash64 longs, not shingle strings: Jaccard of the
    // hashed sets equals Jaccard of the string sets (a within-doc
    // collision needs ~2^64/n² odds), at a fraction of the join's shuffle
    // bytes and comparison cost.
    val candIds = screened
      .select(explode(array(col("id_a"), col("id_b"))).as("__cid")).distinct()
    // persisted: the candidate set is tiny, and without the barrier
    // CollapseProject would inline the element computation past the verify
    // joins — recomputing it per PAIR (×2) instead of per doc.
    val candElems = df
      .join(broadcast(candIds), df(idCol) === col("__cid"))
      .select(col("__cid").as("id"), transform(elems, e => xxhash64(e)).as("elems"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    screened
      .join(candElems.select(col("id").as("id_a"), col("elems").as("elems_a")), "id_a")
      .join(candElems.select(col("id").as("id_b"), col("elems").as("elems_b")), "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("elems_a"), col("elems_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs with hamming distance ≤ maxHamming.
    * The 64-bit hash is split into 4 16-bit chunks; by pigeonhole any pair
    * within hamming ≤ 3 shares at least one chunk, so the candidate join
    * shuffles on (chunk index, chunk value) rather than comparing all pairs.
    *
    * @param hotChunkCap chunk buckets wider than this (any corpus ≫ 2¹⁶
    *   docs guarantees repeated chunk values — candidates would grow
    *   ~n²/2¹⁶ per chunk index) are STAR-LINKED like minhashLsh's hot
    *   buckets: each member pairs with the bucket's minimum id only (w−1
    *   pairs instead of w²/2). Greedy min-id clustering removes the same
    *   duplicates; within a capped bucket the output lists representative
    *   pairs, not all member-member pairs.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      elems: org.apache.spark.sql.Column,
      maxHamming: Int = 3,
      hotChunkCap: Int = 10000): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding guarantees recall only up to hamming 3")

    val hashed = df.select(col(idCol).as("id"), TextOps.simhash64(elems).as("sim"))
    // the shared bandedCandidates machinery over (chunk_idx, chunk)
    // buckets; `sim` rides along as payload — min(struct(id, sim))
    // carries the representative's hash so star pairs need no join back
    val chunked = hashed.select(col("id"), col("sim"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk_idx"),
          call_function("shiftright", col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk")))).as("cc"))
      .select(col("id"), col("sim"), col("cc.chunk_idx").as("chunk_idx"), col("cc.chunk").as("chunk"))

    bandedCandidates(chunked, grpCols = Seq("chunk_idx", "chunk"),
        payload = Seq("sim"), cap = hotChunkCap)
      .withColumn("hamming", TextOps.hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Refuse to run an O(n²) baseline on an input it cannot afford: these
    * exist as verification oracles and small-slice tools, and a silent
    * cross join over a 100-TB table is a cluster-killer, not a slow query.
    * The probe counts at most maxRows+1 rows (limit lets Spark stop the
    * scan early), so the guard's cost is bounded by the bound itself, not
    * by the input — a full count() would itself scan the 100-TB table.
    */
  private[llm] def guardQuadratic(df: DataFrame, what: String, scalePath: String,
      maxRows: Long): DataFrame = {
    // the probe must be able to count maxRows+1 rows, so the bound itself
    // must fit the limit(): beyond ~2^31 rows a quadratic baseline is
    // indefensible anyway
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"$what: maxRows must be in (0, ${Int.MaxValue})")
    val n = df.limit(maxRows.toInt + 1).count()
    require(n <= maxRows,
      s"$what is O(n²) and got more than $maxRows rows: it is the exact " +
        s"verification baseline, not the scale path — use $scalePath for large " +
        s"inputs, or pass maxRows explicitly after sizing the slice")
    df
  }

  /** Exact all-pairs Jaccard above a threshold — quadratic; the verifier
    * for minhashLsh and the right tool only for small slices (guarded).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      elems: org.apache.spark.sql.Column,
      threshold: Double,
      maxRows: Long = 100000): DataFrame = {
    val s = guardQuadratic(df.select(col(idCol).as("id"), elems.as("elems")),
      "jaccardPairs", "minhashLsh", maxRows)
    val a = s.select(col("id").as("id_a"), col("elems").as("elems_a"))
    val b = s.select(col("id").as("id_b"), col("elems").as("elems_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", TextOps.jaccard(col("elems_a"), col("elems_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs embedding cosine similarity above a threshold
    * (quadratic — guarded; the scale path is Similarity.lshTopK).
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxRows: Long = 100000): DataFrame = {
    val s = guardQuadratic(df.select(col(idCol).as("id"), col(vecCol).as("v")),
      "embeddingPairs", "Similarity.lshTopK", maxRows)
    val a = s.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = s.select(col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs at scale — the LSH twin of
    * [[embeddingPairs]] (which is the quadratic verification baseline):
    * multi-table random-hyperplane LSH generates candidates, exact cosine
    * verifies them. The near-dup regime (re-encoded identical content,
    * cosine ≈ 1) is where sign-LSH is sharpest: a pair at cosine c agrees
    * on one hyperplane with p = 1 − arccos(c)/π, lands in the same bucket
    * of one table with p^nPlanes, and is missed by ALL tables with
    * (1 − p^nPlanes)^nTables — at the defaults and c = 0.9997 that is
    * ~1e-11; recall is tunable by table count without touching the index
    * granularity.
    *
    * Plan shape (the 100 TB path): ONE native kernel call computes all
    * nTables·nPlanes sign bits per vector; tables are bit-slices of that
    * signature, exploded into (table, bucket) rows. The candidate
    * self-join shuffles on (table, bucket) — only colliding vectors ever
    * meet — with oversized buckets STAR-LINKED exactly like
    * [[minhashLsh]]'s hot buckets (clustered embeddings make bucket skew
    * the known sign-LSH failure mode; the star bounds any bucket's
    * candidate count at w−1 while greedy min-id clustering still removes
    * the same duplicates). Verification joins the (small) surviving id
    * set back to the vectors and re-ranks exactly, so false candidates
    * cost one cosine each, never a shuffle of the corpus.
    *
    * @param threshold verified cosine threshold for emitted pairs
    * @param nTables   independent LSH tables (recall knob)
    * @param nPlanes   hyperplanes per table — 2^nPlanes buckets/table
    *                  (granularity knob; production corpora want 14–18)
    * @param dim       embedding dimensionality (vectors of any other
    *                  length hash to bucket 0, matching lsh_sign_bucket)
    * @param hotBucketCap buckets wider than this emit star pairs, not
    *                  all pairs — see [[minhashLsh]]'s trade description
    *
    * Cache ownership: like [[minhashLsh]], the hashed/banded frames are
    * persisted for their multiple consumers inside the RETURNED lazy
    * plan, so this function cannot release them itself — the caller
    * frees them with `spark.catalog.clearCache()` between queries (as
    * Bench does) or by unpersisting after materializing the result.
    */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nTables: Int = 6,
      nPlanes: Int = 6,
      dim: Int = 64,
      hotBucketCap: Int = 100000): DataFrame = {
    require(nTables * nPlanes <= 62, "nTables * nPlanes must fit one long signature")
    val tableMask = (1L << nPlanes) - 1

    // (id, vec, 62-bit signature) — hashed once, reused by the bucket
    // explode and the verify join (two consumers; persist avoids a second
    // full hashing pass over the corpus).
    val hashed = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.lshBucket(col(vecCol), nTables * nPlanes, dim).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // bit-slice the signature into per-table buckets; candidate pairs
    // via the shared bandedCandidates machinery (the minhashLsh pattern)
    val candidates = bandedCandidates(
      hashed.select(col("id"),
          explode(transform(sequence(lit(0), lit(nTables - 1)),
            t => struct(t.as("table"),
              call_function("shiftright", col("sig"), t * nPlanes)
                .bitwiseAND(lit(tableMask)).as("bucket")))).as("tb"))
        .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket")),
      grpCols = Seq("table", "bucket"), payload = Nil, cap = hotBucketCap)

    // exact verify: one cosine per surviving candidate
    candidates
      .join(hashed.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(hashed.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus embeddings with k-means, then
    * prune near-duplicates WITHIN each cluster — the partitioning trick
    * that turns an O(n²) all-pairs cosine into Σ cᵢ² intra-cluster work,
    * with k sized ∝ n so cluster widths stay roughly constant as the
    * corpus grows.
    *
    * Spark shape, stage by stage:
    *  1. assignment is [[Kmeans.assign]]'s MAP-ONLY kernel (centroids
    *     travel as literals, no join, no shuffle);
    *  2. a cluster id is just a bucket key, so candidate pairs come from
    *     the SAME shared [[bandedCandidates]] machinery as the minhash /
    *     simhash / embedding-LSH tiers — clusters wider than
    *     `hotClusterCap` degrade to star pairs around the min-id member
    *     instead of exploding quadratically;
    *  3. exact cosine verification touches candidates only.
    *
    * Survivor rule: a row is dropped iff it has ANY verified neighbor
    * with a smaller id (`dup_of` = the smallest such id); survivors have
    * `dup_of` NULL. This is the engine's deterministic min-id greedy
    * convention ([[dropDuplicates]]) rather than the paper's
    * keep-lowest-centroid-similarity rule — documented divergence: the
    * paper's rule needs the per-cluster argmin as a second pass, the
    * min-id rule is one aggregation and retry-stable.
    *
    * Output: (id, cluster, keep, dup_of) — integer/boolean only, no
    * floating column, so the result is oracle-hash-stable by construction.
    * ONE ROW PER CORPUS ROW, always: vectors with no assignable cell
    * (zero-norm or wrong-dimension — cosine NULL against every centroid)
    * come back with cluster NULL and keep=true instead of being dropped.
    *
    * Cache ownership: the projected vector frame is persisted for its two
    * consumers (assign + verify); the caller releases with
    * `spark.catalog.clearCache()` as for [[embeddingNearDup]].
    *
    * @param centroids     small (cluster, centroid) frame, e.g.
    *                      [[Kmeans.train]]'s output — collected driver-side
    *                      bounded by k
    * @param threshold     verified cosine at-or-above which two members of
    *                      one cluster are semantic duplicates
    * @param hotClusterCap clusters wider than this star-link to their
    *                      min-id member (connectivity preserved
    *                      approximately, cost linearly)
    * @param litKCap       centroid count up to which assignment uses the
    *                      literal-expression rung ([[Kmeans.assign]];
    *                      codegen method-size ceiling ≈ 1000)
    * @param annKCap       centroid count up to which assignment uses the
    *                      broadcast-join rung ([[Kmeans.assignByJoin]]);
    *                      past it, the IVF rung ([[Kmeans.assignByAnn]],
    *                      nlist ≈ √k, nprobe = nlist/8) — SemDeDup's
    *                      k ∝ n sizing makes this the 100-TB path.
    *                      Defaults are production values; tests lower
    *                      them to pin rung behavior on small tables
    * @param annNlist      rung-3 coarse-cell count override (0 = auto,
    *                      ⌈√k⌉ floored at 16)
    * @param annNprobe     rung-3 probed-cell count override (0 = auto,
    *                      nlist/8 floored at 2; clamped to nlist). THE
    *                      recall/cost dial: nprobe = nlist is exact
    *                      (spec-locked equal to rung 2); the end-to-end
    *                      dup-recall curve per setting is measured in
    *                      SCALE_r13.md's knob sweep
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      threshold: Double,
      hotClusterCap: Int = 1000,
      litKCap: Int = 1000,
      annKCap: Int = 4096,
      annNlist: Int = 0,
      annNprobe: Int = 0): DataFrame = {
    require(litKCap >= 1 && annKCap >= litKCap,
      "rung thresholds must satisfy 1 <= litKCap <= annKCap")
    val vecs = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Assignment climbs the [[Kmeans]] rung ladder on the centroid count
    // (a probe bounded by annKCap+1, then an exact count only once past
    // it — both actions on the k-row centroid frame, never the corpus):
    //  1. k ≤ litKCap: literal-expression argmax (codegen ceiling ≈ 1000);
    //  2. k ≤ annKCap: broadcast join + map-side max_by — lifts the
    //     expression ceiling but stays n × k cosines, flop-bound once
    //     k ≳ 4096 (SemDeDup sizes k ∝ n, so a fixed rung 2 is the
    //     measured past-regime cliff: 62.8 s at 40× in SCALE_r10);
    //  3. past annKCap: [[Kmeans.assignByAnn]] — IVF over the CENTROID
    //     table, nlist ≈ √k coarse cells, each vector scoring only its
    //     nprobe best cells: n × (√k + k·nprobe/√k) cosines. nprobe =
    //     nlist/8 (the SCALE_r11-measured 64/8 shape at k = 4096,
    //     12.73 s vs rung 2's 19.15 s). Rung 3 is approximate in
    //     ASSIGNMENT only — a vector probed into a near-miss cell can
    //     lose its true cluster (recall bounded in KmeansSpec; exact at
    //     nprobe = nlist, spec-locked equal to rung 2) — while PRECISION
    //     is untouched: every emitted pair still passes the exact cosine
    //     verify below, the same bounded-recall/exact-precision trade as
    //     the hot-bucket star link.
    val kProbe = centroids.limit(annKCap + 1).count()
    val assigned =
      if (kProbe > annKCap) {
        val k = centroids.count()
        val nlist = if (annNlist > 0) annNlist
          else math.max(16, math.ceil(math.sqrt(k.toDouble)).toInt)
        val nprobe = if (annNprobe > 0) math.min(annNprobe, nlist)
          else math.max(2, nlist / 8)
        Kmeans.assignByAnn(vecs, "id", "__v", centroids, nlist = nlist, nprobe = nprobe)
      } else if (kProbe > litKCap)
        Kmeans.assignByJoin(vecs, "id", "__v", centroids)
      else Kmeans.assign(vecs, "id", "__v", centroids)
    val candidates = bandedCandidates(
      assigned.select(col("id"), col("cluster")),
      grpCols = Seq("cluster"), payload = Nil, cap = hotClusterCap)
    val verified = candidates
      .join(vecs.select(col("id").as("id_a"), col("__v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("__v").as("v_b")), "id_b")
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val dupOf = verified.groupBy(col("id_b").as("id"))
      .agg(min(col("id_a")).as("dup_of"))
    // every corpus row survives to the output: rows whose cosine is NULL
    // against every centroid (zero-norm or wrong-dimension vectors) have
    // no cell to be deduplicated in, so they emit cluster NULL with
    // keep=true rather than silently vanishing — a downstream join on
    // this result never loses documents
    vecs.select(col("id"))
      .join(assigned.select(col("id"), col("cluster")), Seq("id"), "left")
      .join(dupOf, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        col("dup_of").isNull.as("keep"), col("dup_of"))
  }

  /** Keep one representative per near-duplicate cluster: given verified
    * pairs, drop every id that appears as the larger member of a pair with
    * a smaller keeper (greedy min-id clustering — one pass, no iteration).
    */
  def dropDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("id_b").as("loser")).distinct()
    df.join(losers, df(idCol) === losers("loser"), "left_anti")
  }

  /** Window-based exact dedup keeping the first row per key — the
    * row_number() ≤ 1 pattern (TopNRowNumber / WindowGroupLimit at scale).
    */
  def keepFirst(df: DataFrame, keyCol: String, orderCol: String): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Connected components over an undirected pair list: label every vertex
    * with the MINIMUM id reachable from it — the canonical cluster id for
    * near-duplicate groups, upgrading the one-pass greedy star of
    * [[dropDuplicates]] to true transitive clusters (a–b, b–c ⇒ one
    * cluster even though a–c was never emitted as a pair).
    *
    * Iterative min-label propagation: each round joins labels across edges
    * and keeps the per-vertex minimum — all distributed joins/aggregations
    * over the EDGE set (pairs, not the corpus), converging in
    * O(cluster diameter) rounds (near-dup clusters are shallow; hub-and-
    * spoke from star-linked hot buckets has diameter 2). The driver-side
    * loop carries only iteration control; the convergence probe is a
    * `limit(1).count()` — bounded, never a full-result count. `maxIter`
    * bounds pathological chains (a 100 TB run would rather fail loudly
    * than spin).
    *
    * Returns (id, cluster) — one row per vertex that appears in `pairs`.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // localCheckpoint (not just persist): the batched self-joins below
    // reference their input ~4× per round, so whatever plan `edges`
    // carries is CLONED 4^batch times into every downstream tree — with
    // the caller's full pair-generation pipeline still attached, plan
    // construction and listener plan-rendering blow up long before any
    // task runs. The checkpoint pins the (pair-sized, corpus-independent)
    // edge set and makes the per-round tree a trivial scan.
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    // Per-round Spark ACTIONS, not per-round compute, dominate when the
    // pair graph is small relative to the corpus (the common dedup case),
    // so: (a) each round folds in pointer doubling — min over the label's
    // own label, covering the 2^k-hop neighborhood by round k, so chains
    // converge in O(log diameter) rounds (cluster(v) always names a vertex
    // of v's component, so the label-of-label stays in-component); and
    // (b) rounds are BATCHED into one lazy plan with a single convergence
    // probe per batch — a star graph settles in one batch = one job.
    val batch = 3
    var i = 0
    var converged = false
    // every frame persisted/checkpointed by this call, unpersisted as it
    // goes stale; the finally drains whatever is still live on a failure
    // path (mid-batch job error, non-convergence) so nothing — edges,
    // batch intermediates, or a just-checkpointed settled frame — can
    // outlive the call in the block manager. On success only the returned
    // labels stay cached (the caller owns them).
    val live = scala.collection.mutable.ListBuffer[DataFrame](labels)
    try {
      while (!converged && i < maxIter) {
        var cur = labels
        for (_ <- 0 until math.min(batch, maxIter - i)) {
          val viaNeighbor = edges
            .join(cur, edges("dst") === cur("id"))
            .select(edges("src").as("id"), col("cluster"))
          val viaLabel = cur.select(col("id"), col("cluster").as("mid"))
            .join(cur.select(col("id").as("mid_r"), col("cluster").as("cluster")),
              col("mid") === col("mid_r"))
            .select(col("id"), col("cluster"))
          cur = cur.unionByName(viaNeighbor).unionByName(viaLabel)
            .groupBy("id").agg(min("cluster").as("cluster"))
            .persist(lvl)
          live += cur
        }
        // localCheckpoint truncates the LOGICAL plan, not just execution:
        // cur references itself 4× per round, so without the cut the
        // analyzed tree grows 4^rounds across batches and the driver OOMs
        // planning, long before any executor does real work
        val settled = cur.localCheckpoint(true)
        live += settled
        // no change across the whole batch = fixpoint (labels only decrease)
        converged = settled
          .join(labels.withColumnRenamed("cluster", "prev"), "id")
          .filter(col("cluster") =!= col("prev"))
          .limit(1).count() == 0
        labels = settled
        live.filter(_ ne settled).foreach(_.unpersist())
        live.filterInPlace(_ eq settled)
        i += math.min(batch, maxIter - i)
      }
    } finally {
      edges.unpersist()
      if (!converged) live.foreach(_.unpersist())
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "— raise maxIter only after checking the pair graph for unexpected long chains")
    labels
  }

  /** Exact all-pairs containment above a threshold — the quadratic
    * verification baseline for [[containmentPairs]], same role
    * [[jaccardPairs]] plays for [[minhashLsh]] (guarded).
    *
    * Containment C(a,b) = |A∩B| / min(|A|,|B|): the subset-duplicate
    * measure — a wire story embedded verbatim in a long page has tiny
    * Jaccard (the page's extra text inflates the union) but containment
    * ≈ 1, so a Jaccard-only dedup pass keeps both copies.
    */
  def containmentPairsExact(
      df: DataFrame,
      idCol: String,
      elems: org.apache.spark.sql.Column,
      threshold: Double,
      maxRows: Long = 100000): DataFrame = {
    val s = guardQuadratic(
      df.select(col(idCol).as("id"), array_distinct(elems).as("elems")),
      "containmentPairsExact", "containmentPairs", maxRows)
    val a = s.select(col("id").as("id_a"), col("elems").as("elems_a"))
    val b = s.select(col("id").as("id_b"), col("elems").as("elems_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("containment",
        size(array_intersect(col("elems_a"), col("elems_b"))).cast("double") /
          least(size(col("elems_a")), size(col("elems_b"))))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Containment near-duplicates at scale — an inverted-index self-join
    * in the all-pairs-similarity-search shape (Bayardo, Ma & Srikant,
    * WWW'07): explode distinct elements (as xxhash64 longs), join postings
    * on the element so only docs SHARING an element ever meet, count
    * co-occurrences per pair as the candidate screen, then verify the
    * survivors exactly. No signature approximation anywhere — the index
    * join is exact on elements, so unlike minhashLsh the only recall loss
    * is the explicit stop-element prune.
    *
    * Two bounds keep the index join corpus-scale:
    *  - stop elements: an element appearing in more than `maxDf` docs is
    *    dropped from the index (its posting list alone would emit ~df²/2
    *    candidate rows — boilerplate shingles are the skew key of this
    *    plan). A true pair is missed only if EVERY shared element is that
    *    hot; the same bounded-recall deployment knob as minhashLsh's
    *    hotBucketCap.
    *  - sound count screen: C ≥ t implies |A∩B| ≥ ⌈t·min(|A|,|B|)⌉, and
    *    the indexed overlap understates |A∩B| by at most min(sA,sB) stop
    *    elements (sX = how many of X's elements were pruned), so
    *    candidates keep only pairs with indexed overlap ≥ ⌈t·min⌉ −
    *    min(sA,sB) — no true pair with ≥ 1 indexed shared element is
    *    screened out.
    *
    * Verification re-joins the (small) surviving id set back to the full
    * element arrays — broadcast-semi, one exact intersect per candidate,
    * never a shuffle of the corpus. Returns (id_a, id_b, containment).
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      elems: org.apache.spark.sql.Column,
      threshold: Double,
      maxDf: Int = 1000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    // one pass: hashed distinct elements + full size per doc; persisted for
    // the posting explode and the verification joins
    val base = df
      .select(col(idCol).as("id"),
        array_distinct(transform(elems, e => xxhash64(e))).as("elems"))
      .withColumn("sz", size(col("elems")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = base.select(col("id"), col("sz"), explode(col("elems")).as("el"))
    val dfc = postings.groupBy(col("el")).agg(count(lit(1)).as("__df"))
    val indexed = postings.join(dfc.filter(col("__df") <= maxDf), "el")
    // per-doc pruned-element count: sz − indexed size (0 when no prune fires)
    val idxSz = indexed.groupBy(col("id"), col("sz"))
      .agg(count(lit(1)).as("isz"))
      .select(col("id"), (col("sz") - col("isz")).as("stops"))
    val lhs = indexed.select(col("el"), col("id").as("id_a"), col("sz").as("sz_a"))
    val rhs = indexed.select(col("el").as("el_r"), col("id").as("id_b"), col("sz").as("sz_b"))
    val candidates = lhs
      .join(rhs, col("el") === col("el_r") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("ov"))
      .join(idxSz.select(col("id").as("id_a"), col("stops").as("st_a")), "id_a")
      .join(idxSz.select(col("id").as("id_b"), col("stops").as("st_b")), "id_b")
      .filter(col("ov") >=
        ceil(lit(threshold) * least(col("sz_a"), col("sz_b"))) -
          least(col("st_a"), col("st_b")))
      .select(col("id_a"), col("id_b"))
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("__cid")).distinct()
    val candElems = base
      .join(broadcast(candIds), col("id") === col("__cid"))
      .select(col("id"), col("elems"), col("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidates
      .join(candElems.select(col("id").as("id_a"),
        col("elems").as("elems_a"), col("sz").as("sz_a")), "id_a")
      .join(candElems.select(col("id").as("id_b"),
        col("elems").as("elems_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("containment",
        size(array_intersect(col("elems_a"), col("elems_b"))).cast("double") /
          least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Incremental dedup of a NEW batch against a FROZEN kept corpus — the
    * production cadence (crawl snapshots arrive; the corpus only grows;
    * re-deduplicating the whole corpus per snapshot is the O(total²)
    * mistake this avoids). Within-batch duplicates are [[minhashLsh]]'s
    * job; this operator answers only "is each batch doc already IN the
    * corpus", so every join here is batch×corpus, never corpus×corpus.
    *
    * Two layers, mirroring the full-corpus family:
    *  - exact: the batch key left-joins the corpus's (key → min id) table
    *    — one shuffle on the key hash, `exact_of` = the matching corpus id;
    *  - near: MinHash band buckets, CROSS-frame — batch band rows join
    *    corpus band rows on (band, bucket), so only colliding docs meet.
    *    Hot CORPUS buckets (boilerplate bands) collapse to their min-id
    *    representative before the join — each batch doc in such a bucket
    *    is checked against the representative only, the cross-frame analog
    *    of bandedCandidates' star link and the same bounded-recall trade.
    *    Signature screen (est ≥ threshold − 0.2, ~3σ at k=32) then exact
    *    Jaccard on hashed elements verify the survivors; `dup_of` = the
    *    minimum corpus id whose VERIFIED jaccard ≥ threshold.
    *
    * In deployment the corpus side of `sigs`/`bands` is precomputed once
    * and persisted with the corpus (signatures are append-only state);
    * computing it here keeps the operator self-contained.
    *
    * Returns one row per batch doc: (id, exact_of, dup_of) — both nullable
    * corpus ids; a doc is fresh iff both are null.
    */
  def incremental(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      key: org.apache.spark.sql.Column,
      elems: org.apache.spark.sql.Column,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      hotBucketCap: Int = 1000): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val exactOf = corpus
      .select(key.as("__key"), col(idCol).as("cid"))
      .groupBy(col("__key")).agg(min(col("cid")).as("exact_of"))

    val sigsB = batch
      .select(col(idCol).as("id"), TextOps.minhashSignature(elems, k).as("sig"))
      .persist(lvl)
    val sigsC = corpus
      .select(col(idCol).as("id"), TextOps.minhashSignature(elems, k).as("sig"))
      .persist(lvl)
    def bandRows(sigs: DataFrame): DataFrame = sigs
      .select(col("id"), explode(TextOps.lshBands(col("sig"), bands, rows)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // hot corpus buckets reduce to one representative row pre-join —
    // width via a map-side-combinable groupBy + join back on the same
    // (band, bucket) key, not a window count, for the same degenerate-
    // bucket reason as [[bandedCandidates]]: a boilerplate band over 20%
    // of the corpus must not sort onto one task just to be measured
    val cb = bandRows(sigsC)
    val cstats = cb.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bw"), min(col("id")).as("__bmin"))
    val corpusBands = cb.join(cstats, Seq("band", "bucket"))
      .filter(col("__bw") <= hotBucketCap || col("id") === col("__bmin"))
      .select(col("band"), col("bucket"), col("id").as("id_c"))
    val candidates = bandRows(sigsB)
      .join(corpusBands, Seq("band", "bucket"))
      .select(col("id").as("id_b"), col("id_c"))
      .dropDuplicates("id_b", "id_c")
    val screened = candidates
      .join(sigsB.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .join(sigsC.select(col("id").as("id_c"), col("sig").as("sig_c")), "id_c")
      .withColumn("est",
        size(filter(zip_with(col("sig_b"), col("sig_c"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est") >= threshold - 0.2)
      .select(col("id_b"), col("id_c"))
    def candElems(src: DataFrame, ids: DataFrame): DataFrame = src
      .join(broadcast(ids), col(idCol) === col("__cid"))
      .select(col("__cid").as("id"), transform(elems, e => xxhash64(e)).as("elems"))
      .persist(lvl)
    val elB = candElems(batch, screened.select(col("id_b").as("__cid")).distinct())
    val elC = candElems(corpus, screened.select(col("id_c").as("__cid")).distinct())
    val dupOf = screened
      .join(elB.select(col("id").as("id_b"), col("elems").as("elems_b")), "id_b")
      .join(elC.select(col("id").as("id_c"), col("elems").as("elems_c")), "id_c")
      .filter(TextOps.jaccard(col("elems_b"), col("elems_c")) >= threshold)
      .groupBy(col("id_b")).agg(min(col("id_c")).as("dup_of"))

    batch.select(col(idCol).as("id"), key.as("__key"))
      .join(exactOf, Seq("__key"), "left")
      .join(dupOf, col("id") === col("id_b"), "left")
      .select(col("id"), col("exact_of"), col("dup_of"))
  }

  /** One micro-batch of STREAMING greedy dedup against a signature-
    * carrying survivor corpus — the step function [[graft.streaming
    * .Streams.morDedupMaintain]] drives from a change feed.
    *
    * Greedy (first-arrival-wins) semantics: a batch doc SURVIVES iff no
    * smaller id in (persisted survivors ∪ this batch) is a verified
    * near-duplicate — the strict `id_c < id_b` rule, applied over the
    * UNION so same-batch duplicates resolve exactly like cross-batch
    * ones. Exact duplicates need no separate layer here: identical text
    * ⇒ identical shingle set ⇒ identical MinHash signature ⇒ ALL bands
    * collide (deterministic recall 1.0) and exact Jaccard 1 verifies.
    *
    * The corpus side joins on its STORED signatures (`sigCol`) — the
    * persisted signature store — so per-batch cost is: one columnar scan
    * of (id, sig) over the survivors (no corpus text is read, nothing
    * re-shingles), band shuffles ∝ batch + survivor count, and text-
    * level verification ∝ candidate pairs only (both sides' elems
    * compute on demand behind a broadcast id semi-join). At 100 TB the
    * survivor-band side would additionally be bucketed by (band,
    * bucket) so the candidate join co-locates without a shuffle; the
    * hot-bucket min-id representative cap bounds boilerplate buckets
    * exactly like [[bandedCandidates]].
    *
    * Returns one row per batch doc: (id, sig, dup_of, keep) — `sig` so
    * the caller persists the signature with the survivor, `dup_of` the
    * smallest verified duplicate (null for survivors).
    */
  def incrementalKeep(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      elems: org.apache.spark.sql.Column,
      sigCol: String = "__sig",
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.9,
      hotBucketCap: Int = 1000): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sigsB = batch
      .select(col(idCol).as("id"), TextOps.minhashSignature(elems, k).as("sig"))
      .persist(lvl)
    val sigsC = corpus.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val unionSigs = sigsC.unionByName(sigsB)
    def bandRows(sigs: DataFrame): DataFrame = sigs
      .select(col("id"), explode(TextOps.lshBands(col("sig"), bands, rows)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val ub = bandRows(unionSigs)
    val ustats = ub.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bw"), min(col("id")).as("__bmin"))
    val unionBands = ub.join(ustats, Seq("band", "bucket"))
      .filter(col("__bw") <= hotBucketCap || col("id") === col("__bmin"))
      .select(col("band"), col("bucket"), col("id").as("id_c"))
    val candidates = bandRows(sigsB)
      .join(unionBands, Seq("band", "bucket"))
      .filter(col("id_c") < col("id"))
      .select(col("id").as("id_b"), col("id_c"))
      .dropDuplicates("id_b", "id_c")
    val screened = candidates
      .join(sigsB.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .join(unionSigs.select(col("id").as("id_c"), col("sig").as("sig_c")), "id_c")
      .withColumn("est",
        size(filter(zip_with(col("sig_b"), col("sig_c"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est") >= threshold - 0.2)
      .select(col("id_b"), col("id_c"))
    // verification reads TEXT only for candidate ids — corpus candidates
    // come from the survivor docs, batch candidates from the batch
    def candElems(src: DataFrame, ids: DataFrame): DataFrame = src
      .join(broadcast(ids), col(idCol) === col("__cid"))
      .select(col("__cid").as("id"), transform(elems, e => xxhash64(e)).as("elems"))
    val candIdsC = screened.select(col("id_c").as("__cid")).distinct()
    val candIdsB = screened.select(col("id_b").as("__cid")).distinct()
    val elC = candElems(corpus, candIdsC)
      .unionByName(candElems(batch, candIdsC)).persist(lvl)
    val elB = candElems(batch, candIdsB).persist(lvl)
    val dupOf = screened
      .join(elB.select(col("id").as("id_b"), col("elems").as("elems_b")), "id_b")
      .join(elC.select(col("id").as("id_c"), col("elems").as("elems_c")), "id_c")
      .filter(TextOps.jaccard(col("elems_b"), col("elems_c")) >= threshold)
      .groupBy(col("id_b")).agg(min(col("id_c")).as("dup_of"))
    sigsB
      .join(dupOf, col("id") === col("id_b"), "left")
      .select(col("id"), col("sig"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
  }
}
