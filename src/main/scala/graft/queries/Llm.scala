package graft.queries

import graft.{Q, Tables}
import graft.llm.{Dedup, Kmeans, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the training-data pipeline operators
  * (graft.llm.*): text analysis, deduplication, similarity search, and
  * multimodal plumbing over the driver's `documents`/`embeddings` tables.
  * DuckDB oracles replicate the exact formulas with list/string functions
  * where expressible; LSH/ANN operators get rows-only checks here and
  * recall/determinism properties in LlmSpec.
  */
object Llm {

  /** The DuckDB formulation of TextOps.qualityScore over a column named
    * `text` — the same formula llm_text_quality's oracle hash-verifies
    * term by term; reused by the clean-corpus pipeline oracle.
    */
  private val duckQuality: String =
    """((
      |    least(len(string_split(text, ' ')) / 20.0, 1.0) +
      |    CASE WHEN (length(text) - len(string_split(text, ' ')) + 1.0) / len(string_split(text, ' ')) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END +
      |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |      t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','at','by','be','this'], t))) AS DOUBLE)
      |      / greatest(len(string_split(text, ' ')), 1) BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END +
      |    1.0) / 4.0)""".stripMargin

  val qs: Map[String, Q] = Map(

    // ---- text quality metrics (TextOps.qualityScore family) ----
    "llm_text_quality" -> Q.df(
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  ROUND((length(text) - len(string_split(text, ' ')) + 1.0) / len(string_split(text, ' ')), 6) AS mean_word_len,
        |  ROUND(CAST(len(list_filter(string_split(text, ' '),
        |    t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','at','by','be','this'], t))) AS DOUBLE)
        |    / greatest(len(string_split(text, ' ')), 1), 6) AS stopword_ratio,
        |  ROUND((
        |    least(len(string_split(text, ' ')) / 20.0, 1.0) +
        |    CASE WHEN (length(text) - len(string_split(text, ' ')) + 1.0) / len(string_split(text, ' ')) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END +
        |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','at','by','be','this'], t))) AS DOUBLE)
        |      / greatest(len(string_split(text, ' ')), 1) BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END +
        |    1.0) / 4.0, 6) AS quality
        |FROM documents
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextOps.nTokens(col("text")).as("n_tokens"),
        round(TextOps.meanWordLen(col("text")), 6).as("mean_word_len"),
        round(TextOps.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- PII scrubbing (TextOps.redactPii): the corpus text gets a
    //      deterministic PII suffix injected IN-QUERY (the synthetic
    //      corpus contains none), then the email/IP/phone chain redacts
    //      it; DuckDB re-runs the same RE2-subset patterns ('g' flag —
    //      DuckDB replaces first-match by default where Spark replaces
    //      all) ----
    "llm_pii_redact" -> Q.df(
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        concat(substr(text, 1, 40), ' contact u', CAST(doc_id AS VARCHAR),
        |               '@ex.org or +1 555-01', CAST(doc_id % 100 AS VARCHAR),
        |               ' at 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7'),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS redacted
        |FROM documents
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val injected = concat(
        substring(col("text"), 1, 40),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@ex.org or +1 555-01"), (col("doc_id") % 100).cast("string"),
        lit(" at 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
      d.select(col("doc_id"), TextOps.redactPii(injected).as("redacted"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- BPE-ish token counting (TextOps.tokenCountRegex) ----
    "llm_token_count" -> Q.df(
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS n_subtokens,
        |  n_chars
        |FROM documents
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      // \s in the Spark pattern ≡ literal space in the duck pattern: the
      // corpus is single-space-delimited and both engines agree on it.
      Tables.t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCountRegex(col("text")).as("n_subtokens"),
        col("n_chars"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- rolling-hash document fingerprint (TextOps.fingerprint) ----
    "llm_fingerprint" -> Q.df(
      """SELECT doc_id,
        |  list_min(list_transform(generate_series(1, greatest(length(text) - 7, 1)),
        |    i -> md5(substr(text, i, 8)))) AS fp
        |FROM documents
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text"), 8).as("fp"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- stopword-list language id (TextOps.langId) ----
    "llm_lang_id" -> Q.df(
      """SELECT doc_id, lang AS labeled,
        |  CASE
        |    WHEN greatest(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'und'
        |    WHEN c_de = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'de'
        |    WHEN c_en = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'en'
        |    WHEN c_es = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'es'
        |    WHEN c_fr = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'fr'
        |    ELSE 'zh' END AS predicted
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_intersect(list_distinct(string_split(text, ' ')), ['der','die','das','und','ist','nicht','ein','mit','für','von'])) AS c_de,
        |    len(list_intersect(list_distinct(string_split(text, ' ')), ['the','and','of','to','in','is','that','it','for','with'])) AS c_en,
        |    len(list_intersect(list_distinct(string_split(text, ' ')), ['el','la','los','y','es','no','una','con','para','que'])) AS c_es,
        |    len(list_intersect(list_distinct(string_split(text, ' ')), ['le','la','les','et','est','pas','une','avec','pour','que'])) AS c_fr,
        |    len(list_intersect(list_distinct(string_split(text, ' ')), ['的','是','不','了','在','有','我','他','这','中'])) AS c_zh
        |  FROM documents) t
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "documents").select(
        col("doc_id"), col("lang").as("labeled"),
        TextOps.langId(col("text")).as("predicted"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- BM25 relevance search (Relevance.bm25Search) ----
    // Bag-of-words retrieval over the corpus: the curation/triage scorer
    // a pipeline runs before expensive decontamination checks. The term
    // list mixes the corpus's one rare token ('dup', df≈5% of docs) with
    // common ones so idf actually discriminates. Oracle-hash discipline:
    // ln appears once per TERM (≤4 evaluations), per-doc contributions
    // are rounded to 9dp, decimal-summed (associative), then ROUND(…,6);
    // the ORDER BY is total (score DESC, doc_id ASC), so the LIMIT-20
    // set is engine-stable.
    "llm_bm25_search" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, lower(text) AS text, len(string_split(lower(text),' ')) AS dl
        |  FROM documents WHERE length(text) > 0),
        |scalars AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
        |toks AS (SELECT doc_id, dl, unnest(string_split(text,' ')) AS term FROM d),
        |posting AS (
        |  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
        |  FROM toks WHERE term IN ('dup','join','filter','scan')
        |  GROUP BY doc_id, term),
        |stats AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
        |contrib AS (
        |  SELECT p.doc_id,
        |    ln(1.0 + (s2.n_docs - s.df + 0.5) / (s.df + 0.5))
        |      * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s2.avgdl)) AS c
        |  FROM posting p JOIN stats s USING (term) CROSS JOIN scalars s2)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS matched_terms,
        |  ROUND(CAST(SUM(CAST(ROUND(c, 9) AS DECIMAL(24,9))) AS DOUBLE), 6) AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score DESC NULLS LAST, doc_id ASC NULLS LAST
        |LIMIT 20""".stripMargin) { (s, dir) =>
      graft.llm.Relevance.bm25Search(Tables.t(s, dir, "documents"),
        "doc_id", "text", Seq("dup", "join", "filter", "scan"), topK = 20)
    },

    // ---- TF-IDF top terms per document (Relevance.tfIdf) ----
    // The per-document keyword extraction pass (topic labels for mixture
    // buckets). Window orders by the 9dp-ROUNDED tf-idf with a term
    // tiebreak, so a final-ulp ln() difference between libm and
    // java.lang.Math cannot reorder ranks.
    "llm_tfidf_terms" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, lower(text) AS text FROM documents WHERE length(text) > 0),
        |toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM d),
        |posting AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |stats AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM d),
        |tfidf AS (
        |  SELECT p.doc_id, p.term,
        |    ROUND(p.tf * ln(CAST(n.n_docs AS DOUBLE) / s.df), 9) AS tfidf
        |  FROM posting p JOIN stats s USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM tfidf WHERE doc_id < 30)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id ASC NULLS LAST, rk ASC NULLS LAST""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = graft.llm.Relevance.tfIdf(
        Tables.t(s, dir, "documents"), "doc_id", "text")
        .filter(col("doc_id") < 30)
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      tf.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "term", "tfidf")
        .orderBy(col("doc_id").asc_nulls_last, col("rk").asc_nulls_last)
    },

    // ---- within-document duplicate-line removal (TextOps.dedupLines) ----
    // The boilerplate cleaner: repeated lines collapse to their first
    // occurrence, order preserved. The corpus text is single-line, so the
    // query first reshapes each document into 6-word lines and PLANTS a
    // duplicate of line 1, guaranteeing the removal path decides on every
    // document; natural within-doc repetition adds more. The oracle
    // replays reshape → plant → first-occurrence filter and md5s the
    // cleaned text.
    "llm_dedup_lines" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 200 AND length(text) > 0),
        |c AS (SELECT doc_id,
        |    list_transform(range(0, len(ws), 6),
        |      s -> array_to_string(ws[s + 1 : s + 6], ' ')) AS chunks
        |  FROM d),
        |l AS (SELECT doc_id, list_prepend(chunks[1], chunks) AS lines FROM c),
        |k AS (SELECT doc_id, len(lines) AS n_in,
        |    list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
        |  FROM l)
        |SELECT doc_id, CAST(n_in AS BIGINT) AS n_lines_in,
        |  CAST(len(kept) AS BIGINT) AS n_lines_out,
        |  md5(array_to_string(kept, chr(10))) AS clean_md5
        |FROM k
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ws = split(col("text"), " ")
      val chunks = transform(sequence(lit(0), size(ws) - 1, lit(6)),
        st => array_join(slice(ws, st + 1, lit(6)), " "))
      val lines = concat(array(element_at(chunks, 1)), chunks)
      val cleaned = graft.llm.TextOps.dedupLines(array_join(lines, "\n"))
      Tables.t(s, dir, "documents")
        .filter(col("doc_id") < 200 && length(col("text")) > 0)
        .select(col("doc_id"),
          size(lines).cast("long").as("n_lines_in"),
          size(split(cleaned, "\n")).cast("long").as("n_lines_out"),
          md5(cleaned).as("clean_md5"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- Gopher document-quality rules (TextOps.gopherRules) ----
    // The Rae et al. 2021 Appendix-A filter set, all INTEGER arithmetic
    // (ratios compared by cross-multiplication) so every verdict is
    // bit-stable. The oracle recomputes each rule from scratch with
    // DuckDB's list machinery; output is doc_id + 8 booleans.
    "llm_gopher_rules" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, text,
        |    string_split_regex(text, '\s+') AS ws,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE doc_id < 300),
        |m AS (SELECT doc_id,
        |    len(ws) AS n,
        |    COALESCE(list_sum(list_transform(ws, w -> strlen(w))), 0) AS sumlen,
        |    len(lines) AS nlines,
        |    len(list_filter(lines, l -> starts_with(ltrim(l), '-')
        |      OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS bullets,
        |    len(list_filter(lines, l -> ends_with(rtrim(l), '...')
        |      OR ends_with(rtrim(l), '…'))) AS elines,
        |    strlen(text) - strlen(replace(text, '#', '')) AS hashes,
        |    (strlen(text) - strlen(replace(text, '...', ''))) / 3
        |      + (length(text) - length(replace(text, '…', ''))) AS ells,
        |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alphas,
        |    len(list_intersect(list_distinct(ws),
        |      ['the','be','to','of','and','that','have','with'])) AS stops
        |  FROM d)
        |SELECT doc_id,
        |  n >= 50 AND n <= 100000 AS word_count,
        |  3 * n <= sumlen AND sumlen <= 10 * n AS word_length,
        |  10 * (hashes + ells) <= n AS symbol_ratio,
        |  10 * bullets <= nlines AS bullet_lines,
        |  10 * elines < 3 * nlines AS ellipsis_lines,
        |  10 * alphas >= 8 * n AS alpha_words,
        |  stops >= 2 AS stop_words,
        |  (n >= 50 AND n <= 100000) AND (3 * n <= sumlen AND sumlen <= 10 * n)
        |    AND (10 * (hashes + ells) <= n) AND (10 * bullets <= nlines)
        |    AND (10 * elines < 3 * nlines) AND (10 * alphas >= 8 * n)
        |    AND (stops >= 2) AS keep
        |FROM m
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), graft.llm.TextOps.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- overlapping token chunking (TextOps.chunkOverlap) ----
    // The RAG/embedding-prep split: 64-token windows at stride 48 (25%
    // overlap). Map-only — tokenize, explode start offsets, slice. The
    // oracle re-chunks with DuckDB's list machinery (scalar range() +
    // expression slicing) and md5-fingerprints each chunk text so the
    // hash gate covers the exact reconstructed text without shipping it.
    "llm_chunk_overlap" -> Q.df(
      """SELECT doc_id, CAST(s / 48 AS BIGINT) AS chunk_idx,
        |  CAST(len(ws[s + 1 : s + 64]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(ws[s + 1 : s + 64], ' ')) AS chunk_md5
        |FROM (SELECT doc_id, ws, unnest(range(0, len(ws), 48)) AS s
        |      FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |            FROM documents WHERE doc_id < 100))
        |ORDER BY doc_id ASC NULLS LAST, chunk_idx ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.llm.TextOps.chunkOverlap(
          Tables.t(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", window = 64, stride = 48)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id").asc_nulls_last, col("chunk_idx").asc_nulls_last)
    },

    // ---- CCNet-style bigram-LM cross-entropy scoring (NgramLm) ----
    // Train bigram counts on the even-doc_id half of the corpus, score
    // the first 200 documents (both halves — the odd half is genuinely
    // held out) by smoothed bigram cross-entropy. The oracle retrains
    // and rescores the same LM in SQL: lateral generate_series produces
    // the adjacent-pair explode, ln inputs are exact count arithmetic,
    // and per-doc sums follow the ROUND(lp,9) → DECIMAL(24,9) → DOUBLE
    // associative-sum discipline (the BM25/tf-idf ln-parity rule).
    "llm_ngram_lm_score" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws
        |  FROM documents WHERE length(text) > 0),
        |refbg AS (
        |  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12
        |  FROM (SELECT unnest(list_zip(ws, ws[2:])) AS p
        |        FROM d WHERE doc_id % 2 = 0)
        |  WHERE p[2] IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT w1, SUM(c12) AS c1 FROM refbg GROUP BY w1),
        |voc AS (SELECT COUNT(DISTINCT w) AS v
        |  FROM (SELECT unnest(ws) AS w FROM d WHERE doc_id % 2 = 0)),
        |db AS (
        |  SELECT doc_id, p[1] AS w1, p[2] AS w2
        |  FROM (SELECT doc_id, unnest(list_zip(ws, ws[2:])) AS p
        |        FROM d WHERE doc_id < 200)
        |  WHERE p[2] IS NOT NULL),
        |sc AS (
        |  SELECT db.doc_id, refbg.c12,
        |    ln((COALESCE(refbg.c12, 0) + 0.5) / (COALESCE(ctx.c1, 0) + 0.5 * voc.v)) AS lp
        |  FROM db LEFT JOIN refbg USING (w1, w2)
        |  LEFT JOIN ctx USING (w1) CROSS JOIN voc)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(COUNT(*) FILTER (c12 IS NULL) AS BIGINT) AS oov_bigrams,
        |  ROUND(-CAST(SUM(CAST(ROUND(lp, 9) AS DECIMAL(24,9))) AS DOUBLE) / COUNT(*), 6) AS xent
        |FROM sc GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      graft.llm.NgramLm.bigramCrossEntropy(
          docs.filter(col("doc_id") < 200), "doc_id", "text",
          ref = docs.filter(col("doc_id") % 2 === 0))
        .select(col("id").as("doc_id"), col("n_bigrams"),
          col("oov_bigrams"), col("xent"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- BPE tokenizer training (Bpe.train) ----
    // Six merge rounds over the corpus vocabulary. The working set after
    // the one corpus pass is the distinct-word table, so every round is a
    // vocab-sized pair aggregation + a 1-row argmax collect. The oracle
    // re-learns the merges from scratch in chained DuckDB CTEs (pair
    // explode → weighted count → argmax with the same count-DESC/pair-ASC
    // tiebreak → doubled-delimiter replace), so the differential covers
    // the full training algorithm, not just its output shape.
    "llm_bpe_train" -> Q.df(duckBpeTrain(6)) { (s, dir) =>
      graft.llm.Bpe.trainDf(s, Tables.t(s, dir, "documents"), "text", 6)
        .select(col("rank"), col("pair"), col("cnt"))
        .orderBy(col("rank").asc_nulls_last)
    },

    // ---- BPE encoding (Bpe.encodeTokenCounts) ----
    // Tokenize-and-count under a FIXED literal merge list — the map-only
    // pass that runs over the full corpus at 100 TB (no shuffle: the
    // merge chain is literal replaces inside a higher-order fold;
    // BpeSpec locks the zero-Exchange plan). Integer outputs end to end.
    "llm_bpe_encode" -> Q.df(
      s"""SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(COALESCE(list_sum(list_transform(ws,
         |    w -> len(string_split(${duckBpeEncodeChain("w")}, ' ')))), 0) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id,
         |        list_filter(string_split(lower(text),' '),
         |          w -> regexp_matches(w, '^[a-z]+$$')) AS ws
         |      FROM documents WHERE doc_id < 100)
         |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.llm.Bpe.encodeTokenCounts(
        Tables.t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", bpeEncodeMerges)
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- BPE encoding via the merge TABLE (Bpe.encodeTokenCountsJoined)
    // The production-merge-count encoder: merges ride as data (vocabulary
    // encoded iteratively by lowest applicable rank, token counts joined
    // back per document), so nothing grows with nMerges in the plan. The
    // oracle is the SAME literal-chain replay as llm_bpe_encode — the
    // differential pins the join-based applier byte-equal to the fold.
    "llm_bpe_encode_joined" -> Q.df(
      s"""SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(COALESCE(list_sum(list_transform(ws,
         |    w -> len(string_split(${duckBpeEncodeChain("w")}, ' ')))), 0) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id,
         |        list_filter(string_split(lower(text),' '),
         |          w -> regexp_matches(w, '^[a-z]+$$')) AS ws
         |      FROM documents WHERE doc_id < 100)
         |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val mergesDf = bpeEncodeMerges.zipWithIndex
        .map { case ((l, r), i) => ((i + 1).toLong, s"$l $r") }
        .toDF("rank", "pair")
      graft.llm.Bpe.encodeTokenCountsJoined(
        Tables.t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", mergesDf)
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- corpus token-distribution report (Zipf head coverage) ----
    // The vocabulary-sizing diagnostic a tokenizer/mixture design needs:
    // how much of the corpus the top-10/100/1000 token types cover. One
    // tokenize-explode-count shuffle (map-side combined) builds the
    // vocabulary-sized type-count table; the rank window runs over that
    // table, never the corpus (vocab ≪ corpus — the same sublinearity
    // argument as TF-IDF's stats frame). Ties rank by (count DESC, token
    // ASC), so the report is deterministic; all-integer output.
    "llm_token_distribution" -> Q.sql(
      spark = """WITH toks AS (
        |  SELECT explode(split(lower(text), ' ')) AS w
        |  FROM documents WHERE length(text) > 0),
        |counts AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        |ranked AS (SELECT c,
        |    ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rk
        |  FROM counts)
        |SELECT COUNT(*) AS n_types,
        |  SUM(c) AS n_tokens,
        |  SUM(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS top10_tokens,
        |  SUM(CASE WHEN rk <= 100 THEN c ELSE 0 END) AS top100_tokens,
        |  SUM(CASE WHEN rk <= 1000 THEN c ELSE 0 END) AS top1000_tokens
        |FROM ranked""".stripMargin,
      duck = """WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents WHERE length(text) > 0),
        |counts AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        |ranked AS (SELECT c,
        |    ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rk
        |  FROM counts)
        |SELECT COUNT(*) AS n_types,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS BIGINT) AS top10_tokens,
        |  CAST(SUM(CASE WHEN rk <= 100 THEN c ELSE 0 END) AS BIGINT) AS top100_tokens,
        |  CAST(SUM(CASE WHEN rk <= 1000 THEN c ELSE 0 END) AS BIGINT) AS top1000_tokens
        |FROM ranked""".stripMargin),

    // ---- corpus-statistics quality scoring (token rarity) ----
    // The corpus-level companion of llm_text_quality's per-document
    // metrics: every document scored by the CORPUS frequency of its
    // tokens (one tokenize → explode pass builds the frequency table, a
    // broadcast-friendly join scores each token in place — the same
    // two-pass shape TF-IDF / unigram-LM perplexity filters use at
    // 100 TB, with no driver-side vocabulary). High avg_token_freq =
    // boilerplate built from the corpus's most common words; low = rare
    // vocabulary. All-integer arithmetic (counts, exact division at the
    // end) so cross-engine equality is bitwise — no transcendental logs
    // whose last ulp could differ between libm implementations.
    "llm_token_rarity" -> Q.sql(
      spark = """WITH toks AS (
        |  SELECT doc_id, tok
        |  FROM documents LATERAL VIEW explode(split(lower(text), ' ')) t AS tok
        |  WHERE length(text) > 0),
        |freq AS (SELECT tok, COUNT(*) AS cf FROM toks GROUP BY tok)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(cf) AS BIGINT) AS freq_mass,
        |  ROUND(CAST(SUM(cf) AS DOUBLE) / COUNT(*), 4) AS avg_token_freq
        |FROM toks JOIN freq USING (tok)
        |GROUP BY doc_id
        |ORDER BY avg_token_freq DESC NULLS LAST, doc_id ASC NULLS LAST
        |LIMIT 100""".stripMargin,
      duck = """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents WHERE len(text) > 0),
        |freq AS (SELECT tok, COUNT(*) AS cf FROM toks GROUP BY tok)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(cf) AS BIGINT) AS freq_mass,
        |  ROUND(CAST(SUM(cf) AS DOUBLE) / COUNT(*), 4) AS avg_token_freq
        |FROM toks JOIN freq USING (tok)
        |GROUP BY doc_id
        |ORDER BY avg_token_freq DESC NULLS LAST, doc_id ASC NULLS LAST
        |LIMIT 100""".stripMargin),

    // ---- embedding int8 quantization ----
    // The serving/index-compression step after dedup+ANN: per-vector
    // symmetric int8 quantization (scale = max|x|, q = round(x/scale*127))
    // as a pure map-side expression chain — no shuffle, no state, exactly
    // what runs over 10^9 vectors before an index build. The oracle
    // recomputes the same math in DuckDB; elements are CAST to DOUBLE
    // first on both sides (float→double is exact) so the arithmetic is
    // engine-identical, and both engines round halves away from zero.
    // over_err counts elements whose dequantization error exceeds one
    // quantization step — must be 0 everywhere, making the column a
    // cross-engine proof of the error bound, not just of the digits.
    "llm_embedding_quantize" -> Q.sql(
      spark = """WITH v AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id < 50),
        |s AS (
        |  SELECT vec_id, e, array_max(transform(e, x -> abs(x))) AS scale FROM v)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  array_join(transform(e, x -> CAST(CAST(round(x / scale * 127) AS INT) AS STRING)), ',') AS q8,
        |  CAST(size(filter(transform(e, x -> abs(round(x / scale * 127) / 127 * scale - x)),
        |    d -> d > scale / 127)) AS BIGINT) AS over_err
        |FROM s
        |ORDER BY vec_id ASC NULLS LAST""".stripMargin,
      duck = """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id < 50),
        |s AS (
        |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM v)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  array_to_string(list_transform(e, x -> CAST(CAST(round(x / scale * 127) AS INT) AS VARCHAR)), ',') AS q8,
        |  CAST(len(list_filter(list_transform(e, x -> abs(round(x / scale * 127) / 127 * scale - x)),
        |    d -> d > scale / 127)) AS BIGINT) AS over_err
        |FROM s
        |ORDER BY vec_id ASC NULLS LAST""".stripMargin),

    // ---- sharded sequence packing ----
    // Pretraining-style concatenate-and-chunk: documents are concatenated
    // in a deterministic order and cut into fixed token windows; a doc's
    // pack is where its first token lands (window cumsum minus own count,
    // integer-divided by the context length). Packing runs WITHIN
    // deterministic shards (doc_id mod 8): a global-order cumsum would be
    // a single-partition window — the sharded form is how packing
    // actually distributes (packs never cross shards, each shard's window
    // is an independent partition), and re-running at any parallelism
    // gives bit-identical packs. All-integer arithmetic end to end.
    "llm_sequence_packing" -> Q.sql(
      spark = """WITH toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard, size(split(text, ' ')) AS n_tok
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, shard, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_tok
        |  FROM toks)
        |SELECT shard, CAST(start_tok DIV 2048 AS BIGINT) AS pack_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        |FROM cum
        |GROUP BY shard, start_tok DIV 2048
        |ORDER BY shard ASC NULLS LAST, pack_id ASC NULLS LAST
        |LIMIT 200""".stripMargin,
      duck = """WITH toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, shard, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_tok
        |  FROM toks)
        |SELECT shard, CAST(start_tok // 2048 AS BIGINT) AS pack_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        |FROM cum
        |GROUP BY shard, start_tok // 2048
        |ORDER BY shard ASC NULLS LAST, pack_id ASC NULLS LAST
        |LIMIT 200""".stripMargin),

    // ---- intra-document repetition (Gopher/RefinedWeb duplicate-n-gram
    //      rule) ----
    // Boilerplate/spam filter: fraction of a document's 3-grams that are
    // repeats of an earlier 3-gram in the SAME document. Pure map-side
    // expression work (raw grams built inline — TextOps.wordShingles
    // dedupes by design, and this rule needs the duplicates); integer
    // counts and one exact final division, so cross-engine equality is
    // bitwise ----
    "llm_repetition" -> Q.df(
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')) AS grams
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3)
        |SELECT doc_id,
        |  CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS dup_grams,
        |  ROUND(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams), 6) AS dup_ratio
        |FROM sh
        |WHERE len(grams) - len(list_distinct(grams)) > 0
        |ORDER BY dup_ratio DESC NULLS LAST, doc_id ASC NULLS LAST
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val grams = transform(
        sequence(lit(1), greatest(size(toks) - 2, lit(1))),
        i => array_join(slice(toks, i, lit(3)), " "))
      Tables.t(s, dir, "documents")
        .filter(size(toks) >= 3)
        .select(col("doc_id"), grams.as("grams"))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          (size(col("grams")) - size(array_distinct(col("grams")))).cast("long").as("dup_grams"),
          round((size(col("grams")) - size(array_distinct(col("grams")))).cast("double")
            / size(col("grams")), 6).as("dup_ratio"))
        .filter(col("dup_grams") > 0)
        .orderBy(col("dup_ratio").desc_nulls_last, col("doc_id").asc_nulls_last)
        .limit(100)
    },

    // ---- benchmark decontamination (shared-shingle containment) ----
    // The train/eval overlap check every pretraining corpus runs: an
    // eval set's shingle fingerprints (here: docs 0-29 as the stand-in
    // benchmark, 3-word shingles) are BROADCAST against the corpus — the
    // corpus never shuffles on content, only the final per-doc count
    // groups by doc_id. Shingles travel as xxhash64 longs (collision odds
    // ~n²/2⁶⁴ — the same containment-safe hashing the minhash verify step
    // documents), a fraction of the broadcast bytes of raw trigrams; the
    // DuckDB oracle recomputes on the raw strings, so the hash shortcut
    // is itself under test. Output: corpus docs ranked by how many
    // distinct benchmark shingles they contain.
    "llm_decontaminate" -> Q.df(
      """WITH ev AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS sh
        |  FROM documents WHERE doc_id < 30),
        |docsh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS sh
        |  FROM documents WHERE doc_id >= 30)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS shared_shingles
        |FROM docsh JOIN ev USING (sh)
        |GROUP BY doc_id
        |ORDER BY shared_shingles DESC NULLS LAST, doc_id ASC NULLS LAST
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val sh3 = array_distinct(transform(
        TextOps.wordShingles(col("text"), 3), e => xxhash64(e)))
      val ev = d.filter(col("doc_id") < 30)
        .select(explode(sh3).as("sh")).distinct()
      val corp = d.filter(col("doc_id") >= 30)
        .select(col("doc_id"), explode(sh3).as("sh"))
      corp.join(broadcast(ev), Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("shared_shingles"))
        .orderBy(col("shared_shingles").desc_nulls_last, col("doc_id").asc_nulls_last)
        .limit(100)
    },

    // ---- BM25-triaged decontamination (Relevance → Dedup composed) ----
    // The end-to-end pipeline the Relevance header promises: a CHEAP
    // BM25 candidate cut (term filter between explode and shuffle — the
    // inverted-index access pattern — over the corpus half) feeds the
    // EXPENSIVE shingle-containment verify, which now runs only on the
    // topK-bounded candidate set (broadcast-joined into the corpus scan)
    // instead of every corpus document. At 100 TB the verify's shingle
    // explode is the dominant cost, so the triage turns a corpus-wide
    // pass into a 200-document one. The oracle replays both stages —
    // the BM25 formula AND the shingle join — end to end in SQL.
    "llm_decontaminate_triaged" -> Q.df(
      """WITH corp AS (
        |  SELECT doc_id, lower(text) AS ltext, len(string_split(lower(text),' ')) AS dl
        |  FROM documents WHERE doc_id >= 30 AND length(text) > 0),
        |scalars AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM corp),
        |toks AS (SELECT doc_id, dl, unnest(string_split(ltext,' ')) AS term FROM corp),
        |posting AS (
        |  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
        |  FROM toks WHERE term IN ('dup','join','filter','scan')
        |  GROUP BY doc_id, term),
        |stats AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
        |contrib AS (
        |  SELECT p.doc_id,
        |    ln(1.0 + (s2.n_docs - s.df + 0.5) / (s.df + 0.5))
        |      * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s2.avgdl)) AS c
        |  FROM posting p JOIN stats s USING (term) CROSS JOIN scalars s2),
        |cand AS (
        |  SELECT doc_id,
        |    ROUND(CAST(SUM(CAST(ROUND(c, 9) AS DECIMAL(24,9))) AS DOUBLE), 6) AS score
        |  FROM contrib GROUP BY doc_id
        |  ORDER BY score DESC NULLS LAST, doc_id ASC NULLS LAST
        |  LIMIT 200),
        |ev AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS sh
        |  FROM documents WHERE doc_id < 30),
        |docsh AS (
        |  SELECT d.doc_id, cand.score, unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(d.text, ' ')) - 2, 1)),
        |      i -> array_to_string((string_split(d.text, ' '))[i:i+2], ' ')))) AS sh
        |  FROM documents d JOIN cand USING (doc_id))
        |SELECT doc_id, score, CAST(COUNT(*) AS BIGINT) AS shared_shingles
        |FROM docsh JOIN ev USING (sh)
        |GROUP BY doc_id, score
        |ORDER BY shared_shingles DESC NULLS LAST, doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val cand = graft.llm.Relevance.bm25Search(
          d.filter(col("doc_id") >= 30), "doc_id", "text",
          Seq("dup", "join", "filter", "scan"), topK = 200)
        .select(col("doc_id"), col("score"))
      val sh3 = array_distinct(transform(
        TextOps.wordShingles(col("text"), 3), e => xxhash64(e)))
      val ev = d.filter(col("doc_id") < 30)
        .select(explode(sh3).as("sh")).distinct()
      d.join(broadcast(cand), Seq("doc_id"))
        .select(col("doc_id"), col("score"), explode(sh3).as("sh"))
        .join(broadcast(ev), Seq("sh"))
        .groupBy(col("doc_id"), col("score"))
        .agg(count(lit(1)).as("shared_shingles"))
        .orderBy(col("shared_shingles").desc_nulls_last, col("doc_id").asc_nulls_last)
    },

    // ---- exact dedup on canonical vocabulary key (Dedup.exact) ----
    // members serialized to a comma string: the driver's pandas comparator
    // cannot sort array-typed cells.
    "llm_dedup_exact" -> Q.df(
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')) AS dup_key,
        |  COUNT(*) AS n_dups, MIN(doc_id) AS keeper,
        |  array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM documents
        |GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY dup_key ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
        .withColumn("vocab_key", concat_ws(",", sort_array(TextOps.tokenSet(col("text")))))
      Dedup.exact(d, "doc_id", "vocab_key")
        .withColumn("members", concat_ws(",", transform(col("members"), m => m.cast("string"))))
        .orderBy(col("dup_key").asc_nulls_last)
    },

    // ---- exact all-pairs n-gram Jaccard dedup (Dedup.jaccardPairs) ----
    "llm_dedup_jaccard" -> Q.df(
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        |FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS sh FROM documents WHERE doc_id < 80) a
        |JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS sh FROM documents WHERE doc_id < 80) b
        |  ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9
        |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 80)
      Dedup.jaccardPairs(d, "doc_id", TextOps.tokenSet(col("text")), 0.9)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // ---- MinHash + LSH near-dup candidates (Dedup.minhashLsh) ----
    // Bigram shingles, not raw token sets: this synthetic corpus draws
    // from a tiny vocabulary, so token-set signatures collapse thousands
    // of docs into one LSH bucket and the verify step goes quadratic —
    // exactly the degenerate case shingling exists to prevent.
    //
    // Oracle form (the sketch banding itself is engine-specific): the full
    // LSH pipeline runs over the whole corpus, then is differenced against
    // the exact all-pairs Jaccard ground truth on a bounded doc_id slice —
    // DuckDB recomputes the slice's shingle sets and exact Jaccards, and
    // every exact pair at 0.9 (well above the 0.8 LSH operating point, so
    // band-collision probability is 1-(1-0.9^4)^8 ≈ 0.9998 per pair) must
    // have been found by LSH. The jaccard VALUES cross-check the shingle +
    // set-intersection math engine-to-engine. The slice bound (doc_id <
    // 500) spans the whole sf0.01 corpus — 25 ground-truth pairs, all at
    // J ≥ 0.909, so the recall column is exercised by the hard gate — yet
    // stays a fixed-size slice (125k comparisons) at any larger SF.
    "llm_dedup_minhash" -> Q.df(
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents WHERE doc_id < 500)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard,
        |  true AS lsh_found
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9
        |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin) { (s, dir) =>
      // headline timing comes from Registry.benchOverrides — the operator
      // alone, without this query's exact-Jaccard verify slice
      val d = Tables.t(s, dir, "documents")
      val sh = TextOps.wordShingles(col("text"), 2)
      val lsh = Dedup.minhashLsh(d, "doc_id", sh, k = 32, bands = 8, threshold = 0.8)
        .select(col("id_a"), col("id_b"), lit(true).as("found"))
      // slice intersections run on xxhash64 longs, not shingle strings —
      // Jaccard of the hashed sets equals Jaccard of the string sets
      // (within-doc collision odds ~2⁻⁶⁴·n²), at a fraction of the
      // comparison cost; DuckDB's oracle recomputes on strings
      Dedup.jaccardPairs(d.filter(col("doc_id") < 500), "doc_id",
          transform(sh, e => xxhash64(e)), 0.9)
        .join(lsh, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"),
          coalesce(col("found"), lit(false)).as("lsh_found"))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // Transitive near-dup clusters (Dedup.connectedComponents): exact
    // jaccard pairs on the oracle slice, then min-label propagation to
    // full connected components (a-b + b-c => one cluster even when a-c
    // never surfaced as a pair). The DuckDB oracle recomputes the SAME
    // clusters independently via a recursive-CTE transitive closure over
    // the same edge set — labels, sizes, and full member lists must all
    // agree.
    "llm_dedup_clusters" -> Q.df(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents WHERE doc_id < 500),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT cluster_id, COUNT(*) AS sz,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
        |FROM labels
        |GROUP BY cluster_id
        |ORDER BY cluster_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(d.filter(col("doc_id") < 500), "doc_id",
        transform(TextOps.wordShingles(col("text"), 2), e => xxhash64(e)), 0.9)
      Dedup.connectedComponents(pairs)
        .groupBy(col("cluster").as("cluster_id"))
        .agg(count(lit(1)).as("sz"),
          concat_ws(",", transform(sort_array(collect_list(col("id"))),
            i => i.cast("string"))).as("members"))
        .orderBy(col("cluster_id").asc_nulls_last)
    },

    // ---- segment-level duplication profile (Dedup.segmentDuplication) ----
    // The C4/MassiveText sub-document rule: 16-word segments hashed
    // corpus-wide, per-doc duplicated-segment counts rolled up per source.
    // The oracle recomputes over raw segment STRINGS (DuckDB list slicing)
    // while the operator travels xxhash64 longs — agreement also certifies
    // the hashing introduces no collision at this scale.
    "llm_dedup_segments" -> Q.df(
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
        |idx AS (SELECT doc_id, source, w,
        |    unnest(generate_series(1, CAST(ceil(len(w)/16.0) AS BIGINT))) AS i
        |  FROM toks),
        |chunks AS (SELECT doc_id, source,
        |    array_to_string(w[((i-1)*16+1):(i*16)], ' ') AS seg
        |  FROM idx),
        |seg_counts AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd
        |  FROM chunks GROUP BY seg),
        |perdoc AS (SELECT c.doc_id, c.source, COUNT(*) AS n_segs,
        |    SUM(CASE WHEN sc.nd > 1 THEN 1 ELSE 0 END) AS dup_segs
        |  FROM chunks c JOIN seg_counts sc ON c.seg = sc.seg
        |  GROUP BY c.doc_id, c.source)
        |SELECT source, CAST(SUM(dup_segs) AS BIGINT) AS dup_segs,
        |  CAST(SUM(n_segs) AS BIGINT) AS n_segs,
        |  ROUND(CAST(SUM(dup_segs) AS DOUBLE) / SUM(n_segs), 6) AS dup_frac
        |FROM perdoc GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      Dedup.segmentDuplication(d, "doc_id", col("text"), segWords = 16)
        .join(d.select(col("doc_id").as("id"), col("source")), "id")
        .groupBy("source")
        .agg(sum(col("dup_segs")).cast("long").as("dup_segs"),
          sum(col("n_segs")).cast("long").as("n_segs"),
          round(sum(col("dup_segs")).cast("double") / sum(col("n_segs")), 6)
            .as("dup_frac"))
        .orderBy(col("source").asc_nulls_last)
    },

    // ---- mixture-weight solver (Sampling.mixturePermille) ----
    // Static corpus mixing: per-source token mass and the permille rate
    // stratified sampling needs to hit an 800-token/source target mix.
    "llm_mixture_weights" -> Q.df(
      """WITH per_src AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source)
        |SELECT source, toks,
        |  CAST(LEAST(1000, FLOOR(1000.0 * 800 / toks)) AS BIGINT) AS permille
        |FROM per_src
        |ORDER BY source ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.llm.Sampling.mixturePermille(Tables.t(s, dir, "documents"),
          "source", size(split(col("text"), " ")), targetPerClass = 800L)
        .orderBy(col("source").asc_nulls_last)
    },

    // ---- segment-level cut (Dedup.segmentCut) ----
    // The transform twin of the duplication profile: cross-doc duplicated
    // segments removed, text rebuilt from the survivors in order. The
    // oracle rebuilds with DuckDB list slicing over raw strings and the
    // md5 of the rebuilt text must agree byte-for-byte — a far stronger
    // check than counts (one word out of order or one boundary off by one
    // flips the hash).
    "llm_dedup_segment_cut" -> Q.df(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 1),
        |idx AS (SELECT doc_id, w,
        |    unnest(generate_series(1, CAST(ceil(len(w)/16.0) AS BIGINT))) AS i
        |  FROM toks),
        |chunks AS (SELECT doc_id, w, i,
        |    array_to_string(w[((i-1)*16+1):(i*16)], ' ') AS seg FROM idx),
        |seg_counts AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd
        |  FROM chunks GROUP BY seg),
        |kept AS (SELECT c.doc_id, c.i FROM chunks c
        |  JOIN seg_counts sc ON c.seg = sc.seg WHERE sc.nd = 1),
        |rebuilt AS (
        |  SELECT t.doc_id,
        |    array_to_string(flatten(list_transform(list_sort(list(k.i)),
        |      i -> t.w[((i-1)*16+1):(i*16)])), ' ') AS clean_text
        |  FROM toks t JOIN kept k ON t.doc_id = k.doc_id
        |  GROUP BY t.doc_id, t.w)
        |SELECT doc_id, md5(clean_text) AS clean_md5,
        |  CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS clean_words
        |FROM rebuilt ORDER BY doc_id ASC NULLS LAST
        |LIMIT 200""".stripMargin) { (s, dir) =>
      Dedup.segmentCut(Tables.t(s, dir, "documents"), "doc_id", col("text"), 16)
        .select(col("id").as("doc_id"), md5(col("clean_text")).as("clean_md5"),
          size(split(col("clean_text"), " ")).cast("long").as("clean_words"))
        .orderBy(col("doc_id").asc_nulls_last)
        .limit(200)
    },

    // ---- mixture solve + apply, end to end ----
    // The full static-mixing loop: solve per-source permille rates from a
    // 400-token/source target (mixturePermille), broadcast the tiny rate
    // table back onto the corpus, and cut with the same deterministic
    // permille bar stratified sampling uses — then report what the cut
    // realized. The corpus never shuffles: the only exchange is the rate
    // aggregation itself; the apply side is a broadcast join + map-side
    // filter. (Realized mass tracks the target only as well as ids mix
    // per class — synthetic round-robin ids at tiny SF overshoot; hash
    // the id first when ids correlate with the class, per the operator
    // docs.)
    "llm_mixture_apply" -> Q.df(
      """WITH per_src AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |rates AS (SELECT source,
        |    CAST(LEAST(1000, FLOOR(1000.0 * 400 / toks)) AS BIGINT) AS permille
        |  FROM per_src),
        |kept AS (SELECT d.source, len(string_split(d.text, ' ')) AS dtoks
        |  FROM documents d JOIN rates r ON d.source = r.source
        |  WHERE d.doc_id % 1000 < r.permille)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
        |  CAST(SUM(dtoks) AS BIGINT) AS kept_toks
        |FROM kept GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val rates = graft.llm.Sampling.mixturePermille(
        d, "source", size(split(col("text"), " ")), targetPerClass = 400L)
      d.join(broadcast(rates.select(col("source"), col("permille"))), "source")
        .filter(pmod(col("doc_id"), lit(1000)) < col("permille"))
        .groupBy("source")
        .agg(count(lit(1)).as("kept_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("kept_toks"))
        .orderBy(col("source").asc_nulls_last)
    },

    // ---- SimHash near-dup candidates (Dedup.simhashPairs) ----
    // Oracle form: SimHash values are engine-specific, but the banding
    // CONSTRUCTION has a mathematical guarantee DuckDB can demand without
    // computing a single hash — pigeonhole completeness. For every pair in
    // a bounded slice, membership in the full-corpus banded output must
    // equal membership under the exact hamming-distance filter; the oracle
    // asserts the equivalence holds for every slice pair.
    "llm_dedup_simhash" -> Q.df(
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b, true AS consistent
        |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        |WHERE a.doc_id < 40 AND b.doc_id < 40
        |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val elems = TextOps.tokenSet(col("text"))
      val banded = Dedup.simhashPairs(d, "doc_id", elems, maxHamming = 3)
        .select(col("id_a"), col("id_b"), lit(true).as("in_banded"))
      val hashed = d.filter(col("doc_id") < 40)
        .select(col("doc_id"), TextOps.simhash64(elems).as("sim"))
      val a = hashed.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
      val b = hashed.select(col("doc_id").as("id_b"), col("sim").as("sim_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("in_exact", TextOps.hamming64(col("sim_a"), col("sim_b")) <= 3)
        .join(banded, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"),
          (coalesce(col("in_banded"), lit(false)) === col("in_exact")).as("consistent"))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // ---- embedding cosine near-dup pairs (Dedup.embeddingPairs) ----
    "llm_embedding_pairs" -> Q.df(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)
        |    / NULLIF(
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (x, y) -> x + y)) *
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(b.embedding)),
        |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)), 0.0), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 150 AND b.vec_id < 150
        |  AND list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)
        |    / NULLIF(
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (x, y) -> x + y)) *
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(b.embedding)),
        |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)), 0.0) >= 0.3
        |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings").filter(col("vec_id") < 150)
      Dedup.embeddingPairs(e, "vec_id", "embedding", 0.3)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // ---- embedding cosine near-dup at scale (Dedup.embeddingNearDup) ----
    // The fixture has no organic near-dup embeddings (max pairwise cosine
    // < 0.6), so the near-dup regime is PLANTED inside the query, on both
    // engines identically: every 5th vector gets a copy under a diagonal
    // perturbation (component j scaled by 1 + 0.01·((j mod 5 − 2)/2),
    // double arithmetic — cosine ≈ 0.99997, never exactly 1, so the LSH
    // tables genuinely disagree on some planes). The oracle is the exact
    // all-pairs join at the same threshold: green means candidate
    // generation RECALLED every true pair (miss odds ~1e-11/pair at the
    // 6×6 defaults) and the exact verify agreed with DuckDB bit-for-bit;
    // false candidates are invisible because verification prunes them.
    "llm_dedup_embedding" -> Q.df(
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 300),
        |copies AS (
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_transform(generate_series(1, len(v)),
        |      i -> v[i] * (1.0 + 0.01 * ((CAST((i - 1) % 5 AS DOUBLE) - 2.0) / 2.0))) AS v
        |  FROM base WHERE vec_id % 5 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM copies)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (x, y) -> x + y)
        |    / NULLIF(
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])), (x, y) -> x + y)) *
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])), (x, y) -> x + y)), 0.0), 6) AS cos
        |FROM u a JOIN u b ON a.vec_id < b.vec_id
        |WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (x, y) -> x + y)
        |    / NULLIF(
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])), (x, y) -> x + y)) *
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])), (x, y) -> x + y)), 0.0) >= 0.98
        |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val base = Tables.t(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val copies = base.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          expr("transform(v, (x, j) -> x * (1.0 + 0.01 * ((CAST(j % 5 AS DOUBLE) - 2.0) / 2.0)))").as("v"))
      Dedup.embeddingNearDup(base.unionByName(copies), "vec_id", "v", threshold = 0.98)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // ---- SemDeDup semantic dedup (Dedup.semanticDedup) ----
    // Cluster-then-prune over the planted 4-cluster k-means corpus plus
    // 1%-perturbed copies of every 10th vector. At threshold 0.9995 the
    // duplicate structure is exactly the vec_id mod 28 pattern groups
    // (the corpus formula repeats with period 28) together with the
    // planted copies (cos ≈ 0.99997); the widest NON-dup intra-cluster
    // cosine is 0.99491 — a ≥4e-4 margin on both sides of the threshold,
    // so a final-ulp cosine difference cannot flip membership. The oracle
    // replays assign → intra-cluster pairs → min-id survivor in SQL;
    // output is integer/boolean only (no floating column to hash).
    "llm_dedup_semantic" -> Q.df(
      s"""WITH $duckKmeansCorpus,
         |copies AS (
         |  SELECT vec_id + 100000 AS vec_id,
         |    list_transform(generate_series(1, 16),
         |      i -> vec[i] * (1.0 + 0.01 * ((CAST((i - 1) % 5 AS DOUBLE) - 2.0) / 2.0))) AS vec
         |  FROM corpus WHERE vec_id % 10 = 0),
         |u AS (SELECT * FROM corpus UNION ALL SELECT * FROM copies),
         |cents AS (
         |  SELECT c + 1 AS cluster, list_transform(generate_series(0, 15), j -> CAST(
         |    (CASE WHEN j % 4 = c THEN 40 ELSE 0 END) + (c * 7 + j * 3) % 10 AS DOUBLE)) AS cen
         |  FROM generate_series(0, 3) g(c)),
         |a AS (SELECT vec_id, vec, cluster FROM (
         |    SELECT u.vec_id, u.vec, cents.cluster,
         |      row_number() OVER (PARTITION BY u.vec_id
         |        ORDER BY ${duckCos16("u.vec", "cen")} DESC, cents.cluster DESC) AS rn
         |    FROM u CROSS JOIN cents) t WHERE rn = 1),
         |pairs AS (
         |  SELECT a1.vec_id AS ia, a2.vec_id AS ib
         |  FROM a a1 JOIN a a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
         |  WHERE ${duckCos16("a1.vec", "a2.vec")} >= 0.9995),
         |dup AS (SELECT ib AS vec_id, MIN(ia) AS dup_of FROM pairs GROUP BY ib)
         |SELECT a.vec_id, a.cluster, dup.dup_of IS NULL AS keep, dup.dup_of
         |FROM a LEFT JOIN dup USING (vec_id)
         |ORDER BY vec_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val base = kmeansCorpus(s, dir)
      val copies = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          expr("transform(vec, (x, j) -> x * (1.0 + 0.01 * ((CAST(j % 5 AS DOUBLE) - 2.0) / 2.0)))").as("vec"))
      val cents = s.range(4).select((col("id") + 1).as("cluster"), expr(
        """transform(sequence(0, 15), j -> CAST(
          |  (CASE WHEN j % 4 = id THEN 40 ELSE 0 END) + (id * 7 + j * 3) % 10 AS DOUBLE))""".stripMargin)
        .as("centroid"))
      Dedup.semanticDedup(base.unionByName(copies), "vec_id", "vec",
          cents, threshold = 0.9995)
        .select(col("id").as("vec_id"), col("cluster"), col("keep"), col("dup_of"))
        .orderBy(col("vec_id").asc_nulls_last)
    },

    // ---- exact brute-force ANN top-k (Similarity.bruteForceTopK) ----
    "llm_ann_bruteforce" -> Q.df(
      """SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)
        |    / NULLIF(
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (x, y) -> x + y)) *
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(b.embedding)),
        |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)), 0.0) AS cos,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)
        |      / NULLIF(
        |        sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list_transform(generate_series(1, len(a.embedding)),
        |            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (x, y) -> x + y)) *
        |        sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list_transform(generate_series(1, len(b.embedding)),
        |            i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)), 0.0) DESC,
        |      b.vec_id ASC) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 5) t
        |WHERE rank <= 3
        |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 3)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
    },

    // ---- bucketed LSH ANN (Similarity.lshTopK) ----
    // Oracle form: which neighbors LSH surfaces is bucket-layout-specific,
    // so the oracle checks the ANN contract — every query returns a full
    // top-3, and each returned neighbor belongs to the exact brute-force
    // top-20 for that query (recall@3-in-20, computed by differencing
    // against bruteForceTopK inside the same plan; on this corpus the
    // deepest LSH pick sits at exact rank 17 — the embeddings are
    // near-isotropic, the hard case for 4 hyperplanes).
    "llm_ann_lsh" -> Q.df(
      """SELECT a.vec_id AS query_id, r.r AS rank, true AS in_exact_top20
        |FROM embeddings a, generate_series(1, 3) r(r)
        |WHERE a.vec_id < 20
        |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin,
      headline = true) { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 20)
      val lsh = Similarity.lshTopK(queries, e, "vec_id", "embedding", k = 3, nPlanes = 4)
      val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("neighbor_id"), lit(true).as("in_exact"))
      lsh.join(exact, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("rank"),
          coalesce(col("in_exact"), lit(false)).as("in_exact_top20"))
        .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
    },

    // ---- IVF ANN (Similarity.ivfTopK) — the centroid-partitioned scale
    //      path beside LSH; same differencing oracle: full top-3 per
    //      query, every neighbor inside the exact brute-force top-20 ----
    "llm_ann_ivf" -> Q.df(
      """SELECT a.vec_id AS query_id, r.r AS rank, true AS in_exact_top20
        |FROM embeddings a, generate_series(1, 3) r(r)
        |WHERE a.vec_id < 20
        |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 20)
      val ivf = Similarity.ivfTopK(queries, e, "vec_id", "embedding", k = 3,
        nlist = 16, nprobe = 4)
      val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("neighbor_id"), lit(true).as("in_exact"))
      ivf.join(exact, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("rank"),
          coalesce(col("in_exact"), lit(false)).as("in_exact_top20"))
        .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
    },

    // ---- IVF ANN over TRAINED centroids (Kmeans.train +
    //      Similarity.ivfTopKTrained) — the standard train-then-probe
    //      inverted-file build: cells adapt to the data distribution
    //      where ivfTopK's hashed corpus sample does not. Same
    //      differencing oracle as llm_ann_ivf: a full top-3 per query,
    //      every neighbor inside the exact brute-force top-20
    //      (recall@3-in-20); probing half the cells (nprobe 8 of
    //      nlist 16) holds that contract on the near-isotropic corpus,
    //      the hard case for any bucketed index. ----
    "llm_ann_ivf_trained" -> Q.df(
      """SELECT a.vec_id AS query_id, r.r AS rank, true AS in_exact_top20
        |FROM embeddings a, generate_series(1, 3) r(r)
        |WHERE a.vec_id < 20
        |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 20)
      val cents = Kmeans.train(e, "vec_id", "embedding", k = 16, iters = 2)
      val ivf = Similarity.ivfTopKTrained(queries, e, "vec_id", "embedding",
        k = 3, centroids = cents, nprobe = 8)
      val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("neighbor_id"), lit(true).as("in_exact"))
      ivf.join(exact, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("rank"),
          coalesce(col("in_exact"), lit(false)).as("in_exact_top20"))
        .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
    },

    // ---- end-to-end corpus cleaning: quality filter → near-dup removal →
    //      kept docs with metrics. The composition a real training-data
    //      job runs. Oracle form: DuckDB re-derives the ENTIRE pipeline
    //      exactly — the quality filter (same formula as llm_text_quality's
    //      proven oracle), exact token-set Jaccard pairs at 0.95, and
    //      greedy min-id loser removal. The LSH tier must therefore find
    //      every exact 0.95-pair among the qualified docs (collision
    //      probability 1-(1-0.95^4)^8 ≈ 0.99999 per pair) or the kept sets
    //      diverge. LlmSpec keeps the structural invariants ----
    "llm_pipeline_clean_corpus" -> Q.df(
      s"""WITH q AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id < 2000 AND $duckQuality >= 0.7),
        |tok AS (SELECT doc_id, text, list_distinct(string_split(text, ' ')) AS sh FROM q),
        |losers AS (
        |  SELECT DISTINCT b.doc_id AS doc_id
        |  FROM tok a JOIN tok b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.95)
        |SELECT doc_id, lang, ROUND($duckQuality, 6) AS quality,
        |  len(string_split(text, ' ')) AS n_tokens
        |FROM q WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      // bounded doc_id slice + effectively-uncapped buckets: star-linked
      // hot buckets (the scale default) change WHICH pairs emerge, so the
      // exact-pair oracle only matches when capping cannot engage — the
      // slice bounds the quadratic risk instead (sf0.1 showed a 266-doc
      // divergence on the unbounded corpus once buckets crossed the cap)
      val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 2000)
      val qualified = d.filter(TextOps.qualityScore(col("text")) >= 0.7)
      val pairs = Dedup.minhashLsh(qualified, "doc_id",
        TextOps.tokenSet(col("text")), k = 32, bands = 8, threshold = 0.95,
        hotBucketCap = 2000)
      Dedup.dropDuplicates(qualified, "doc_id", pairs)
        .select(col("doc_id"), col("lang"),
          round(TextOps.qualityScore(col("text")), 6).as("quality"),
          TextOps.nTokens(col("text")).as("n_tokens"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- multimodal plumbing (Multimodal.imageFeatures / audioFrames) —
    //      stub decoders; the decode output is a hash of the payload bytes
    //      (not DuckDB-derivable), so the oracle checks the pipeline
    //      contract: exactly one output row per input doc (the
    //      repartition/mapPartitions plumbing loses and duplicates
    //      nothing), the fixed schema constants, and the decoders' value
    //      ranges. Feature VALUES stay locked by LlmSpec determinism.
    "llm_multimodal_image" -> Q.df(
      """SELECT doc_id AS media_id, 3 AS n_channels, 16 AS feat_len,
        |  true AS dims_in_range, true AS feat_in_range
        |FROM documents
        |ORDER BY media_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val media = graft.llm.Multimodal.mediaFromText(
        Tables.t(s, dir, "documents"), "doc_id", "text", "image")
      graft.llm.Multimodal.imageFeatures(media, partitions = 8)
        .select(
          col("media_id"),
          col("n_channels"),
          size(col("feature")).as("feat_len"),
          (col("width").between(64, 1920) && col("height").between(64, 1080))
            .as("dims_in_range"),
          forall(col("feature"), x => x.between(-1.0f, 1.0f)).as("feat_in_range"))
        .orderBy(col("media_id").asc_nulls_last)
    },

    // ---- feature resize (Multimodal.resizeFeatures): the post-decode
    //      dimension cut. Stub-decoded feature VALUES are not
    //      DuckDB-derivable, so the oracle checks the contract — one row
    //      per doc, the new length, the value range, and that the resized
    //      vector is exactly the original's prefix (verified in-plan by
    //      re-deriving the original features: the stub decoder is
    //      deterministic on payload bytes, locked by LlmSpec). ----
    "llm_multimodal_resize" -> Q.df(
      """SELECT doc_id AS media_id, 8 AS feat_len, true AS in_range,
        |  true AS is_prefix
        |FROM documents
        |ORDER BY media_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val media = graft.llm.Multimodal.mediaFromText(
        Tables.t(s, dir, "documents"), "doc_id", "text", "image")
      val feats = graft.llm.Multimodal.imageFeatures(media, partitions = 8)
      graft.llm.Multimodal.resizeFeatures(feats, 8)
        .join(feats.select(col("media_id"), col("feature").as("orig")), "media_id")
        .select(col("media_id"),
          size(col("feature")).as("feat_len"),
          forall(col("feature"), x => x.between(-1.0f, 1.0f)).as("in_range"),
          (col("feature") === slice(col("orig"), 1, 8)).as("is_prefix"))
        .orderBy(col("media_id").asc_nulls_last)
    },

    // Video frame-sample: the codec-boundary EXPLODE (one blob → k
    // strided frame rows). The sampled count, stride arithmetic, and
    // frame timestamps are contract-checkable: always exactly k=8 rows
    // (stub clips have ≥ 30 frames), indices {0, s, …, 7s} with
    // s = ⌊n/8⌋ < n, ts = idx·1000 DIV 30.
    "llm_multimodal_video" -> Q.df(
      """SELECT doc_id AS media_id, CAST(8 AS BIGINT) AS n_sampled,
        |  0 AS first_idx, true AS stride_uniform, true AS ts_ok,
        |  true AS feat_ok
        |FROM documents
        |ORDER BY media_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val media = graft.llm.Multimodal.mediaFromText(
        Tables.t(s, dir, "documents"), "doc_id", "text", "video")
      graft.llm.Multimodal.videoFrames(media, k = 8, partitions = 8)
        .groupBy(col("media_id"))
        .agg(
          count(lit(1)).as("n_sampled"),
          min(col("frame_idx")).as("first_idx"),
          expr("""bool_and(frame_idx % stride = 0)
                 |AND max(frame_idx) = 7 * max(stride)
                 |AND count(DISTINCT frame_idx) = 8
                 |AND max(frame_idx) < max(n_frames)""".stripMargin)
            .as("stride_uniform"),
          expr("bool_and(ts_ms = CAST(frame_idx AS BIGINT) * 1000 DIV 30)")
            .as("ts_ok"),
          expr("""bool_and(size(feature) = 12)
                 |AND bool_and(forall(feature, x -> x >= -1.0 AND x <= 1.0))"""
            .stripMargin).as("feat_ok"))
        .orderBy(col("media_id").asc_nulls_last)
    },

    "llm_multimodal_audio" -> Q.df(
      """SELECT doc_id AS media_id, 16000 AS sample_rate, 4 AS n_frames,
        |  true AS frame_shape_ok, true AS samples_in_range
        |FROM documents
        |ORDER BY media_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val media = graft.llm.Multimodal.mediaFromText(
        Tables.t(s, dir, "documents"), "doc_id", "text", "audio")
      graft.llm.Multimodal.audioFrames(media, partitions = 8)
        .select(
          col("media_id"),
          col("sample_rate"),
          size(col("frames")).as("n_frames"),
          forall(col("frames"), f => size(f) === 8).as("frame_shape_ok"),
          col("n_samples").between(1000L, 65000L).as("samples_in_range"))
        .orderBy(col("media_id").asc_nulls_last)
    },

    // Deterministic class-balanced sampling (llm/Sampling.scala):
    // downsample English to 50% and every other language to 10% by id
    // residue — a pure map-side filter DuckDB re-derives exactly (no RNG,
    // no shuffle, re-run-stable at any cluster size).
    "llm_sample_stratified" -> Q.df(
      """SELECT lang, COUNT(*) AS kept,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(30,8))) AS DOUBLE) AS chars_kept
        |FROM documents
        |WHERE doc_id % 1000 < CASE WHEN lang = 'en' THEN 500 ELSE 100 END
        |GROUP BY lang
        |ORDER BY lang ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.llm.Sampling.stratified(Tables.t(s, dir, "documents"),
          "lang", col("doc_id"), Map("en" -> 500), defaultPermille = 100)
        .groupBy("lang")
        .agg(count(lit(1)).as("kept"),
          call_function("dsum8", col("n_chars")).as("chars_kept"))
        .orderBy(col("lang").asc_nulls_last)
    },

    // Exact-COUNT class-balanced sampling (Sampling.takePerClass): the
    // 40 md5-smallest docs per language — the fixed-budget counterpart
    // of the rate-based stratified cut. md5(doc_id) is the
    // engine-independent draw (same construction as llm_sample_weighted);
    // id_sum pins the exact member SET per class, not just the count.
    // Plan lowers to WindowGroupLimit: map-side top-k per class prunes
    // below the exchange (locked in PlanSpec).
    "llm_sample_per_class" -> Q.df(
      """WITH r AS (
        |  SELECT lang, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, COUNT(*) AS kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(30,8))) AS DOUBLE) AS chars_kept
        |FROM r WHERE rn <= 40
        |GROUP BY lang
        |ORDER BY lang ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.llm.Sampling.takePerClass(Tables.t(s, dir, "documents"), "lang", 40,
          by = Seq(md5(col("doc_id").cast("string")), col("doc_id")))
        .groupBy("lang")
        .agg(count(lit(1)).as("kept"),
          sum(col("doc_id")).as("id_sum"),
          call_function("dsum8", col("n_chars")).as("chars_kept"))
        .orderBy(col("lang").asc_nulls_last)
    },

    // ---- weighted sampling without replacement (Sampling.weightedSample)
    // Efraimidis–Spirakis: rank by ROUND(ln(u)/w, 9) with u a
    // reproducible md5-derived uniform (md5 is engine-independent — the
    // only cross-engine-safe hash in both dialects) and w = token count.
    // The oracle re-derives the identical keys and ranking in DuckDB, so
    // the differential covers the u construction, the key algebra, and
    // the top-k ordering; weight rides as the exact DOUBLE the key used
    // (an integer count here, so double-exact on both engines).
    "llm_sample_weighted" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, len(string_split(lower(text), ' ')) AS w
        |  FROM documents WHERE length(text) > 0),
        |keyed AS (
        |  SELECT doc_id, w,
        |    ROUND(ln((CAST(('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 13)) AS BIGINT) + 0.5)
        |          / 4503599627370496.0) / w, 9) AS k
        |  FROM d),
        |top AS (SELECT doc_id, w, k FROM keyed WHERE w > 0 ORDER BY k DESC, doc_id LIMIT 50)
        |SELECT doc_id AS id, CAST(w AS DOUBLE) AS weight,
        |  CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS rank
        |FROM top
        |ORDER BY rank ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.llm.Sampling.weightedSample(
          Tables.t(s, dir, "documents").filter(length(col("text")) > 0),
          "doc_id", size(split(lower(col("text")), " ")), k = 50, seed = 7)
        .orderBy(col("rank").asc_nulls_last)
    },

    // Reproducible epoch shuffle (llm/Sampling.scala): two independent
    // evaluations of the same seeded permutation must assign every doc
    // the same position — the oracle re-derives the contract as trivially
    // true plus the slice count (the sample_bernoulli determinism-oracle
    // pattern).
    "llm_shuffle_deterministic" -> Q.df(
      """SELECT COUNT(*) AS n, true AS stable
        |FROM documents WHERE doc_id < 200""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val slice = Tables.t(s, dir, "documents").filter(col("doc_id") < 200)
      // different input partitionings on the two sides defeat exchange
      // reuse, so the position agreement is a real cross-execution check
      def positions(parts: Int) = graft.llm.Sampling
        .deterministicShuffle(slice.repartition(parts, col("doc_id")), col("doc_id"), seed = 42)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(xxhash64(col("doc_id"), lit(42L)), col("doc_id"))).as("pos"))
      positions(4)
        .join(positions(16).withColumnRenamed("pos", "pos_b"), "doc_id")
        .agg(count(lit(1)).as("n"),
          (count(lit(1)) === sum(when(col("pos") === col("pos_b"), 1).otherwise(0)))
            .as("stable"))
    },

    // ---- k-means assignment (Kmeans.assign) ----
    // Planted 4-cluster corpus (see kmeansCorpus): INTEGER-valued vectors
    // make every dot product and norm² an exact integer in DOUBLE, so the
    // cosines are bit-equal across engines (sqrt and division are
    // correctly rounded on identical inputs) and the argmax can never
    // flip on float noise — the oracle independently recomputes the full
    // n×k scoring and takes the same (cos DESC, cluster DESC) argmax.
    "llm_kmeans_assign" -> Q.df(
      s"""WITH $duckKmeansCorpus,
         |cents AS (
         |  SELECT c + 1 AS cluster, list_transform(generate_series(0, 15), j -> CAST(
         |    (CASE WHEN j % 4 = c THEN 40 ELSE 0 END) + (c * 7 + j * 3) % 10 AS DOUBLE)) AS cen
         |  FROM generate_series(0, 3) g(c))
         |SELECT vec_id, cluster, ROUND(cos, 6) AS cos FROM (
         |  SELECT corpus.vec_id, cents.cluster, ${duckCos16("vec", "cen")} AS cos,
         |    row_number() OVER (PARTITION BY corpus.vec_id
         |      ORDER BY ${duckCos16("vec", "cen")} DESC, cents.cluster DESC) AS rn
         |  FROM corpus CROSS JOIN cents) t
         |WHERE rn = 1
         |ORDER BY vec_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val cents = s.range(4).select((col("id") + 1).as("cluster"), expr(
        """transform(sequence(0, 15), j -> CAST(
          |  (CASE WHEN j % 4 = id THEN 40 ELSE 0 END) + (id * 7 + j * 3) % 10 AS DOUBLE))""".stripMargin)
        .as("centroid"))
      Kmeans.assign(kmeansCorpus(s, dir), "vec_id", "vec", cents)
        .select(col("id").as("vec_id"), col("cluster"), round(col("cos"), 6).as("cos"))
        .orderBy(col("vec_id").asc_nulls_last)
    },

    // ---- IVF-accelerated k-means assignment (Kmeans.assignByAnn) ----
    // Rung 3 of the assignment ladder: a coarse quantizer over a
    // 64-centroid table, probed exhaustively (nprobe = nlist = 16) so the
    // result is EXACTLY the n×k argmax — the whole inverted-file plumbing
    // (hashed coarse sample, per-row literal probe ranking, salted cell
    // join, map-side max) runs under a DuckDB oracle that recomputes the
    // exact argmax over all 64 centroids. The approximate regime
    // (nprobe < nlist) is recall-measured in KmeansSpec; integer-valued
    // vectors and centroids keep every cosine bit-equal cross-engine.
    "llm_kmeans_assign_ann" -> Q.df(
      s"""WITH $duckKmeansCorpus,
         |cents AS (
         |  SELECT c + 1 AS cluster, list_transform(generate_series(0, 15), j -> CAST(
         |    (CASE WHEN j % 16 = c % 16 THEN 40 ELSE 0 END) + (c * 7 + j * 3) % 10 AS DOUBLE)) AS cen
         |  FROM generate_series(0, 63) g(c))
         |SELECT vec_id, cluster, ROUND(cos, 6) AS cos FROM (
         |  SELECT corpus.vec_id, cents.cluster, ${duckCos16("vec", "cen")} AS cos,
         |    row_number() OVER (PARTITION BY corpus.vec_id
         |      ORDER BY ${duckCos16("vec", "cen")} DESC, cents.cluster DESC) AS rn
         |  FROM corpus CROSS JOIN cents) t
         |WHERE rn = 1
         |ORDER BY vec_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val cents = s.range(64).select((col("id") + 1).as("cluster"), expr(
        """transform(sequence(0, 15), j -> CAST(
          |  (CASE WHEN j % 16 = id % 16 THEN 40 ELSE 0 END) + (id * 7 + j * 3) % 10 AS DOUBLE))""".stripMargin)
        .as("centroid"))
      Kmeans.assignByAnn(kmeansCorpus(s, dir), "vec_id", "vec", cents,
          nlist = 16, nprobe = 16)
        .select(col("id").as("vec_id"), col("cluster"), round(col("cos"), 6).as("cos"))
        .orderBy(col("vec_id").asc_nulls_last)
    },

    // ---- k-means training, two full Lloyd rounds (Kmeans.train) ----
    // initByLowestId puts the init centroids at vec_id 0..3 (one per
    // planted cluster); the oracle REPLAYS both rounds in SQL — assign by
    // (cos DESC, cluster DESC) argmax, recompute centroids as elementwise
    // SUMS (cosine is scale-invariant, so sums and means assign
    // identically, and integer sums are exact in any order) — and checks
    // the final per-cluster membership count and centroid norm².
    "llm_kmeans_train" -> Q.df(
      s"""WITH $duckKmeansCorpus,
         |c0 AS (SELECT vec_id + 1 AS cluster, vec AS cen FROM corpus WHERE vec_id < 4),
         |a1 AS (SELECT vec_id, vec, cluster FROM (
         |    SELECT corpus.vec_id, corpus.vec, c0.cluster,
         |      row_number() OVER (PARTITION BY corpus.vec_id
         |        ORDER BY ${duckCos16("vec", "cen")} DESC, c0.cluster DESC) AS rn
         |    FROM corpus CROSS JOIN c0) t WHERE rn = 1),
         |c1 AS (SELECT cluster, list(s ORDER BY j) AS cen FROM (
         |    SELECT cluster, j, SUM(vec[j + 1]) AS s
         |    FROM a1 CROSS JOIN generate_series(0, 15) g(j)
         |    GROUP BY cluster, j) t GROUP BY cluster),
         |a2 AS (SELECT vec_id, vec, cluster FROM (
         |    SELECT corpus.vec_id, corpus.vec, c1.cluster,
         |      row_number() OVER (PARTITION BY corpus.vec_id
         |        ORDER BY ${duckCos16("vec", "cen")} DESC, c1.cluster DESC) AS rn
         |    FROM corpus CROSS JOIN c1) t WHERE rn = 1),
         |c2 AS (SELECT cluster, list(s ORDER BY j) AS cen FROM (
         |    SELECT cluster, j, SUM(vec[j + 1]) AS s
         |    FROM a2 CROSS JOIN generate_series(0, 15) g(j)
         |    GROUP BY cluster, j) t GROUP BY cluster)
         |SELECT c2.cluster, n.n, ${duckDot16("cen", "cen")} AS norm2
         |FROM c2 JOIN (SELECT cluster, COUNT(*) AS n FROM a2 GROUP BY cluster) n
         |  ON c2.cluster = n.cluster
         |ORDER BY c2.cluster ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Kmeans.train(kmeansCorpus(s, dir), "vec_id", "vec",
          k = 4, iters = 2, dim = 16, initByLowestId = true)
        .select(col("cluster"), col("n"),
          aggregate(col("centroid"), lit(0.0), (a, x) => a + x * x).as("norm2"))
        .orderBy(col("cluster").asc_nulls_last)
    },

    // ---- DSIR importance weighting (Dsir.importanceWeights) ----
    // Target model = English even-id docs, raw model = the whole corpus;
    // every document scored by the hashed-ngram log-likelihood ratio
    // (Xie 2023). The oracle re-fits BOTH models and recomputes every
    // bucket hash (positional char-code mod 1024), ratio, and per-doc
    // decimal sum from the raw text — the full pipeline, not its output
    // shape. Presented for doc_id < 300.
    "llm_dsir_weights" -> Q.df(
      s"""$duckDsirWeights
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
         |  ROUND(CAST(SUM(CAST(lr AS DECIMAL(24,9)) * c) AS DOUBLE), 6) AS logw
         |FROM doc JOIN r USING (b)
         |WHERE doc_id < 300
         |GROUP BY doc_id
         |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      graft.llm.Dsir.importanceWeights(d, "doc_id", "text",
          target = d.filter(col("lang") === "en" && col("doc_id") % 2 === 0))
        .filter(col("id") < 300)
        .select(col("id").as("doc_id"), col("n_feats"), col("logw"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- DSIR selection (Dsir.selectTopK): the deterministic top-k by
    //      importance weight — one global TakeOrderedAndProject, ties
    //      broken by id so the k-boundary is bit-deterministic. ----
    "llm_dsir_select" -> Q.df(
      s"""$duckDsirWeights,
         |w AS (
         |  SELECT doc_id,
         |    ROUND(CAST(SUM(CAST(lr AS DECIMAL(24,9)) * c) AS DOUBLE), 6) AS logw
         |  FROM doc JOIN r USING (b) GROUP BY doc_id)
         |SELECT doc_id, logw FROM w
         |ORDER BY logw DESC NULLS LAST, doc_id ASC NULLS LAST
         |LIMIT 50""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val w = graft.llm.Dsir.importanceWeights(d, "doc_id", "text",
        target = d.filter(col("lang") === "en" && col("doc_id") % 2 === 0))
      graft.llm.Dsir.selectTopK(w, 50)
        .select(col("id").as("doc_id"), col("logw"))
    },

    // ---- sliding-window exact-substring spans (Dedup.substringSpans) ----
    // The ExactSubstr tier (Lee et al. 2021) the fixed-grid segment
    // operators cannot express: duplicated passages are found at EVERY
    // token offset and merged into maximal spans. The corpus is planted
    // (plantedDocs: two fixed boilerplate sentences spliced mid-doc and
    // at the tail of every document) so the gaps-and-islands merge decides
    // on every document — natural duplication at sf0.01 only produces
    // whole-prefix spans. The oracle replays fingerprint → first-occurrence
    // rule → island merge on raw window strings (the engine ships xxhash64
    // fingerprints instead of strings below its shuffle; same spans).
    "llm_dedup_substring_spans" -> Q.df(
      s"""$duckSubstringSpans
         |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
         |  CAST(MAX(p) + 7 AS BIGINT) AS span_end,
         |  CAST(MAX(p) + 7 - MIN(p) + 1 AS BIGINT) AS span_tokens
         |FROM isl2 GROUP BY doc_id, island
         |ORDER BY doc_id ASC NULLS LAST, span_start ASC NULLS LAST
         |LIMIT 300""".stripMargin) { (s, dir) =>
      Dedup.substringSpans(plantedDocs(s, dir), "doc_id", col("text"), 8)
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"))
        .orderBy(col("doc_id").asc_nulls_last, col("span_start").asc_nulls_last)
        .limit(300)
    },

    // ---- exact-substring cut (Dedup.substringCut) ----
    // The transform twin: covered positions removed, text rebuilt from the
    // survivors in order; first occurrences stay (one copy of every
    // repeated passage survives corpus-wide). md5 of the rebuilt text must
    // agree byte-for-byte — one boundary off by one flips the hash.
    "llm_dedup_substring_cut" -> Q.df(
      s"""$duckSubstringSpans,
         |spans AS (SELECT doc_id, MIN(p) AS s, MAX(p) + 7 AS e
         |  FROM isl2 GROUP BY doc_id, island),
         |sp_agg AS (SELECT doc_id, list({'s': s, 'e': e}) AS sps
         |  FROM spans GROUP BY doc_id),
         |rebuilt AS (
         |  SELECT t.doc_id,
         |    list_transform(
         |      list_filter(generate_series(1, len(t.w)),
         |        p -> len(list_filter(a.sps, sp -> p >= sp.s AND p <= sp.e)) = 0),
         |      p -> t.w[p]) AS kept
         |  FROM toks t JOIN sp_agg a USING (doc_id))
         |SELECT doc_id, md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5,
         |  CAST(len(kept) AS BIGINT) AS clean_words
         |FROM rebuilt ORDER BY doc_id ASC NULLS LAST
         |LIMIT 200""".stripMargin) { (s, dir) =>
      Dedup.substringCut(plantedDocs(s, dir), "doc_id", col("text"), 8)
        .select(col("id").as("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("clean_words"))
        .orderBy(col("doc_id").asc_nulls_last)
        .limit(200)
    },

    // ---- hybrid retrieval via reciprocal-rank fusion (Relevance.rrfFuse) ----
    // BM25 lexical top-30 ⊕ embedding-cosine semantic top-30 (query = the
    // probe terms / vector 0 over the same ids), fused by
    // Σ 1/(60 + rank) — no score calibration crosses the lists, only
    // ranks, so the fuse is exact decimal arithmetic over integers and
    // hash-stable by construction. The oracle recomputes BOTH retrievals
    // (the llm_bm25_search CTE chain; the ann-bruteforce cosine) and the
    // fusion; per-list ranks ride along as provenance columns.
    "llm_retrieval_hybrid" -> Q.df(
      s"""WITH d AS (
         |  SELECT doc_id, lower(text) AS text, len(string_split(lower(text),' ')) AS dl
         |  FROM documents WHERE length(text) > 0),
         |scalars AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
         |toks AS (SELECT doc_id, dl, unnest(string_split(text,' ')) AS term FROM d),
         |posting AS (
         |  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
         |  FROM toks WHERE term IN ('dup','join','filter','scan')
         |  GROUP BY doc_id, term),
         |stats AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
         |contrib AS (
         |  SELECT p.doc_id,
         |    ln(1.0 + (s2.n_docs - s.df + 0.5) / (s.df + 0.5))
         |      * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s2.avgdl)) AS c
         |  FROM posting p JOIN stats s USING (term) CROSS JOIN scalars s2),
         |bm AS (
         |  SELECT doc_id,
         |    ROUND(CAST(SUM(CAST(ROUND(c, 9) AS DECIMAL(24,9))) AS DOUBLE), 6) AS score
         |  FROM contrib GROUP BY doc_id
         |  ORDER BY score DESC NULLS LAST, doc_id ASC NULLS LAST LIMIT 30),
         |bmr AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank FROM bm),
         |sem0 AS (
         |  SELECT b.vec_id AS doc_id,
         |    row_number() OVER (ORDER BY $duckCosAB DESC, b.vec_id ASC) AS rank
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id = 0),
         |semr AS (SELECT doc_id, rank FROM sem0 WHERE rank <= 30),
         |u AS (SELECT doc_id, rank FROM bmr UNION ALL SELECT doc_id, rank FROM semr),
         |f AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
         |    ROUND(CAST(SUM(CAST(ROUND(CAST(1.0 AS DOUBLE)/(60+rank), 9)
         |      AS DECIMAL(18,9))) AS DOUBLE), 6) AS rrf_score
         |  FROM u GROUP BY doc_id)
         |SELECT f.doc_id, CAST(br.rank AS BIGINT) AS lex_rank,
         |  CAST(sr.rank AS BIGINT) AS sem_rank, f.n_lists, f.rrf_score
         |FROM f LEFT JOIN bmr br USING (doc_id) LEFT JOIN semr sr USING (doc_id)
         |ORDER BY rrf_score DESC NULLS LAST, doc_id ASC NULLS LAST""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val d = Tables.t(s, dir, "documents")
        val e = Tables.t(s, dir, "embeddings")
        val lex = graft.llm.Relevance.bm25Search(d, "doc_id", "text",
            Seq("dup", "join", "filter", "scan"), topK = 30)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("doc_id", "rank")
        val sem = Similarity.bruteForceTopK(e.filter(col("vec_id") === 0), e,
            "vec_id", "embedding", 30)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        graft.llm.Relevance.rrfFuse(Seq(lex, sem), "doc_id")
          .join(lex.select(col("doc_id").as("id"),
            col("rank").cast("long").as("lex_rank")), Seq("id"), "left")
          .join(sem.select(col("doc_id").as("id"),
            col("rank").cast("long").as("sem_rank")), Seq("id"), "left")
          .select(col("id").as("doc_id"), col("lex_rank"), col("sem_rank"),
            col("n_lists"), col("rrf_score"))
          .orderBy(col("rrf_score").desc_nulls_last, col("doc_id").asc_nulls_last)
    },

    // ---- leakage-safe split (Sampling.leakageSafeSplit) ----
    // Near-dup clusters (transitive closure over exact-Jaccard 0.9 pairs,
    // the llm_dedup_clusters graph) collapse to their min-id
    // representative; the train/val verdict hashes the REPRESENTATIVE, so
    // every member of a cluster provably lands on one side. The oracle
    // recomputes the closure with a recursive CTE and the same md5-hex
    // bucket arithmetic as the weighted-sampling oracle.
    "llm_split_leakage_safe" -> Q.df(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents WHERE doc_id < 500),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        |  FROM reach GROUP BY src),
        |alldocs AS (SELECT doc_id FROM documents WHERE doc_id < 500),
        |rep AS (SELECT a.doc_id, COALESCE(l.cluster_id, a.doc_id) AS rep
        |  FROM alldocs a LEFT JOIN labels l USING (doc_id)),
        |b AS (SELECT doc_id, rep,
        |    CAST(('0x' || substr(md5(rep::VARCHAR || ':split'), 1, 13)) AS BIGINT)
        |      % 1000 AS bucket
        |  FROM rep)
        |SELECT doc_id, CAST(rep AS BIGINT) AS rep, CAST(bucket AS BIGINT) AS bucket,
        |  CASE WHEN bucket < 100 THEN 'val' ELSE 'train' END AS split
        |FROM b ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 500)
      val pairs = Dedup.jaccardPairs(d, "doc_id",
        transform(TextOps.wordShingles(col("text"), 2), e => xxhash64(e)), 0.9)
      graft.llm.Sampling.leakageSafeSplit(d, "doc_id", pairs, valPermille = 100)
        .select(col("id").as("doc_id"), col("rep"), col("bucket"), col("split"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- per-source quality pruning (Sampling.qualityPrune) ----
    // Keep the best 600‰ of every source by the shared quality formula —
    // integer rank arithmetic against ceil(n·q/1000), ties at the bar
    // resolved by doc_id, so the keep boundary cannot drift on floats.
    "llm_quality_prune" -> Q.df(
      s"""WITH scored AS (
         |  SELECT doc_id, source, ROUND($duckQuality, 6) AS score
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, source, score,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id ASC) AS rk,
         |    COUNT(*) OVER (PARTITION BY source) AS n_cls
         |  FROM scored)
         |SELECT doc_id, source, score, CAST(rk AS BIGINT) AS rk,
         |  CAST(n_cls AS BIGINT) AS n_cls
         |FROM ranked
         |WHERE rk <= (n_cls * 600 + 999) // 1000
         |ORDER BY source ASC NULLS LAST, rk ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      graft.llm.Sampling.qualityPrune(d, "doc_id", "source",
          round(TextOps.qualityScore(col("text")), 6), keepPermille = 600)
        .select(col("id").as("doc_id"), col("cls").as("source"), col("score"),
          col("rk"), col("n_cls"))
        .orderBy(col("source").asc_nulls_last, col("rk").asc_nulls_last)
    },

    // ---- CCNet perplexity buckets (NgramLm.perplexityBucketsExact) ----
    // The rank-exact head/middle/tail cut over the bigram-LM scores, per
    // source class (CCNet buckets per language; the driver corpus's
    // class column is `source`). The oracle re-derives the xent values
    // with the full llm_ngram_lm_score SQL and then applies the SAME
    // total-order NTILE — a two-operator differential (LM scoring feeding
    // window bucketing). The 100 TB path is perplexityBucketsByCuts
    // (sampled percentile cuts, map-only assign — never ranks the
    // corpus); LlmSpec pins the two tiers' agreement away from cut ties.
    "llm_ppl_buckets" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS ws
        |  FROM documents WHERE length(text) > 0),
        |refbg AS (
        |  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12
        |  FROM (SELECT unnest(list_zip(ws, ws[2:])) AS p
        |        FROM d WHERE doc_id % 2 = 0)
        |  WHERE p[2] IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT w1, SUM(c12) AS c1 FROM refbg GROUP BY w1),
        |voc AS (SELECT COUNT(DISTINCT w) AS v
        |  FROM (SELECT unnest(ws) AS w FROM d WHERE doc_id % 2 = 0)),
        |db AS (
        |  SELECT doc_id, source, p[1] AS w1, p[2] AS w2
        |  FROM (SELECT doc_id, source, unnest(list_zip(ws, ws[2:])) AS p
        |        FROM d WHERE doc_id < 200)
        |  WHERE p[2] IS NOT NULL),
        |sc AS (
        |  SELECT db.doc_id, db.source,
        |    ln((COALESCE(refbg.c12, 0) + 0.5) / (COALESCE(ctx.c1, 0) + 0.5 * voc.v)) AS lp
        |  FROM db LEFT JOIN refbg USING (w1, w2)
        |  LEFT JOIN ctx USING (w1) CROSS JOIN voc),
        |scored AS (
        |  SELECT doc_id, source,
        |    ROUND(-CAST(SUM(CAST(ROUND(lp, 9) AS DECIMAL(24,9))) AS DOUBLE) / COUNT(*), 6) AS xent
        |  FROM sc GROUP BY doc_id, source)
        |SELECT doc_id, source, xent,
        |  CASE NTILE(3) OVER (PARTITION BY source ORDER BY xent ASC, doc_id ASC)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM scored
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      val scored = graft.llm.NgramLm.bigramCrossEntropy(
          docs.filter(col("doc_id") < 200), "doc_id", "text",
          ref = docs.filter(col("doc_id") % 2 === 0))
        .join(docs.select(col("doc_id").as("id"), col("source")), "id")
      graft.llm.NgramLm.perplexityBucketsExact(scored, "id", "source", "xent")
        .select(col("id").as("doc_id"), col("source"), col("xent"), col("bucket"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- containment near-dup (Dedup.containmentPairs) ----
    // The subset-duplicate tier Jaccard cannot see: C = |A∩B|/min(|A|,|B|)
    // over 2-word shingles. Same differential contract as llm_dedup_minhash:
    // the exact quadratic baseline runs on the doc_id < 500 slice (hashed
    // shingles) and LEFT-joins the scale path's verdicts — `idx_found`
    // asserts the inverted-index path (Bayardo all-pairs shape: postings
    // join + sound count screen + exact verify) finds every exact pair,
    // which on this slice is recall-exact by construction (maxDf = 1000 >
    // slice size, so the stop-element prune cannot fire).
    "llm_dedup_containment" -> Q.df(
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents WHERE doc_id < 500)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / least(len(a.sh), len(b.sh)), 6) AS containment,
        |  true AS idx_found
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / least(len(a.sh), len(b.sh)) >= 0.9
        |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 500)
      val sh = TextOps.wordShingles(col("text"), 2)
      val hashed = transform(sh, e => xxhash64(e))
      val scale = Dedup.containmentPairs(d, "doc_id", sh, threshold = 0.9,
          maxDf = 1000)
        .select(col("id_a"), col("id_b"), lit(true).as("found"))
      Dedup.containmentPairsExact(d, "doc_id", hashed, 0.9)
        .join(scale, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 6).as("containment"),
          coalesce(col("found"), lit(false)).as("idx_found"))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // ---- incremental dedup vs a frozen corpus (Dedup.incremental) ----
    // The production cadence: a new snapshot (doc_id ≥ 300) deduped
    // against the kept corpus (doc_id < 300) without ever joining corpus
    // to corpus. The oracle recomputes both layers exhaustively in DuckDB
    // — exact_of by byte-equal text, dup_of as the minimum corpus id at
    // true shingle-Jaccard ≥ 0.9 — so the differential asserts the
    // cross-frame LSH (k=64/bands=16: per-pair miss ~(1−0.9⁴)¹⁶ ≈ 4e-8)
    // recalls every qualifying batch→corpus edge on this slice.
    "llm_dedup_incremental" -> Q.df(
      """WITH corp AS (
        |  SELECT doc_id, text,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents WHERE doc_id < 300),
        |bat AS (
        |  SELECT doc_id, text,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents WHERE doc_id >= 300),
        |ex AS (
        |  SELECT b.doc_id, MIN(c.doc_id) AS exact_of
        |  FROM bat b JOIN corp c ON b.text = c.text GROUP BY b.doc_id),
        |nr AS (
        |  SELECT b.doc_id, MIN(c.doc_id) AS dup_of
        |  FROM bat b JOIN corp c
        |    ON CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
        |      / (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))) >= 0.9
        |  GROUP BY b.doc_id)
        |SELECT bat.doc_id AS id, ex.exact_of, nr.dup_of
        |FROM bat LEFT JOIN ex ON bat.doc_id = ex.doc_id
        |LEFT JOIN nr ON bat.doc_id = nr.doc_id
        |ORDER BY id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      Dedup.incremental(
          batch = d.filter(col("doc_id") >= 300),
          corpus = d.filter(col("doc_id") < 300),
          idCol = "doc_id", key = col("text"),
          elems = TextOps.wordShingles(col("text"), 2),
          k = 64, bands = 16, threshold = 0.9)
        .orderBy(col("id").asc_nulls_last)
    },

    // ---- CDF-driven incremental dedup (Streams.morDedupMaintain) ----
    // The exactly-once corpus-maintenance composition: documents stream
    // into a MoR source table in three ascending commits, the change
    // feed drives greedy MinHash dedup against the survivor table's own
    // persisted signatures, and the STREAMED survivor set must equal the
    // BATCH dedup of the full corpus — DuckDB recomputes the latter
    // exhaustively (a doc survives iff no smaller doc_id has true
    // shingle-Jaccard ≥ 0.9; the data's near-dup graph is transitively
    // closed, so greedy-by-arrival and min-neighbor agree). The
    // `exactly_once` flag pins the replay-proof half: an empty restart
    // commits nothing and a forced replay of the last batch is provably
    // applied.
    "llm_dedup_cdf_stream" -> Q.df(
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
        |  FROM documents),
        |dup AS (
        |  SELECT b.doc_id FROM d b JOIN d a ON a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9
        |  GROUP BY b.doc_id)
        |SELECT d.doc_id, true AS exactly_once
        |FROM d LEFT JOIN dup ON d.doc_id = dup.doc_id
        |WHERE dup.doc_id IS NULL
        |ORDER BY d.doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      import graft.sources.{MorDelete, MorUpsert}
      import graft.streaming.Streams
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_llm_cdf_${
        java.lang.ProcessHandle.current().pid()}"
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(wipe)
        f.delete(); ()
      }
      wipe(new java.io.File(root))
      val (src, rep, ckpt) = (s"$root/src", s"$root/dedup", s"$root/ckpt")
      val docs = Tables.t(s, dir, "documents").select("doc_id", "text")
      docs.limit(0).coalesce(1).write.parquet(src)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 3
      // three ascending commits — arrival order = id order, the greedy
      // precondition the oracle's min-neighbor rule relies on
      Seq(col("doc_id") <= cut,
        col("doc_id") > cut && col("doc_id") <= 2 * cut,
        col("doc_id") > 2 * cut).foreach { slice =>
        MorUpsert.merge(s, src, docs.filter(slice), Seq("doc_id")); ()
      }
      def maintain(): Unit = {
        Streams.morDedupMaintain(s, src, rep, "doc_id",
          TextOps.wordShingles(col("text"), 2), ckpt,
          appId = "llm-cdf-dedup", maxSeqsPerBatch = Some(1L)); ()
      }
      maintain()
      // exactly-once: an empty restart is a no-op, and a forced replay
      // of the last applied batch proves itself already applied
      val v0 = MorDelete.currentSeq(s, rep)
      maintain()
      val restartNoop = MorDelete.currentSeq(s, rep) == v0
      val lastBatch = MorDelete.liveState(s, rep).txns("llm-cdf-dedup")
      val replaySkipped = MorUpsert.applyChanges(s, rep,
        MorDelete.read(s, rep).limit(1).withColumn("_change_type", lit("insert")),
        Seq("doc_id"), txn = Some(("llm-cdf-dedup", lastBatch))).replaySkipped
      MorDelete.read(s, rep).select(col("doc_id"))
        .withColumn("exactly_once", lit(restartNoop && replaySkipped))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- quality-aware near-dup survivors (clusters + max-quality) ----
    // Upgrades the min-id survivor rule: within each transitive near-dup
    // ---- first-per-key dedup (Dedup.keepFirst): the row_number() ≤ 1
    //      pattern — Spark plans the rank-1 filter as WindowGroupLimit
    //      (the TopNRowNumber analog), so no partition ever materializes
    //      past its first row. The oracle replays the same window. ----
    "llm_dedup_keep_first" -> Q.df(
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang ORDER BY doc_id ASC) AS rn
        |  FROM documents) t
        |WHERE rn = 1
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Dedup.keepFirst(Tables.t(s, dir, "documents"), "lang", "doc_id")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // cluster keep the HIGHEST-quality member (ties to the smaller id) —
    // the policy a curation pipeline actually wants (the canonical copy,
    // not the accidentally-smallest id). Composes connectedComponents
    // with the quality score; the oracle re-derives the clusters via the
    // recursive-CTE closure AND the keeper via the same
    // (quality DESC, id ASC) argmax.
    "llm_dedup_keep_best" -> Q.df(
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
         |      i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh
         |  FROM documents WHERE doc_id < 500),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (
         |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |q AS (
         |  SELECT doc_id, ROUND($duckQuality, 6) AS quality FROM documents),
         |ranked AS (
         |  SELECT l.cluster_id, l.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY q.quality DESC, l.doc_id ASC) AS rk,
         |    COUNT(*) OVER (PARTITION BY l.cluster_id) AS sz
         |  FROM labels l JOIN q ON l.doc_id = q.doc_id)
         |SELECT cluster_id, doc_id AS keeper, quality AS best_quality,
         |  CAST(sz AS BIGINT) AS sz
         |FROM ranked WHERE rk = 1
         |ORDER BY cluster_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(d.filter(col("doc_id") < 500), "doc_id",
        transform(TextOps.wordShingles(col("text"), 2), e => xxhash64(e)), 0.9)
      val quality = d.select(col("doc_id").as("id"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster"))
        .orderBy(col("quality").desc, col("id").asc)
      Dedup.connectedComponents(pairs)
        .join(quality, "id")
        .withColumn("rk", row_number().over(w))
        .withColumn("sz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))))
        .filter(col("rk") === 1)
        .select(col("cluster").as("cluster_id"), col("id").as("keeper"),
          col("quality").as("best_quality"), col("sz").cast("long").as("sz"))
        .orderBy(col("cluster_id").asc_nulls_last)
    },

    // ---- token-budget training plan (epochs per source) ----
    // The mixing table a training run is configured from (the Llama/
    // Gopher "epochs over the dataset" column): given a token budget
    // split uniformly across sources, how many passes over each source
    // realize its share — epochs > 1 flags oversampling (repeated data),
    // effective_toks is the no-repeat alternative. One aggregation over
    // the corpus; everything downstream is arithmetic on the per-source
    // table (row count = |sources|, never corpus-sized).
    "llm_token_budget_plan" -> Q.sql(
      spark = """WITH per_src AS (
        |  SELECT source, CAST(SUM(size(split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |plan AS (
        |  SELECT source, toks,
        |    CAST(FLOOR(CAST(50000 AS DOUBLE) / COUNT(*) OVER ()) AS BIGINT) AS target_toks
        |  FROM per_src)
        |SELECT source, toks, target_toks,
        |  ROUND(CAST(target_toks AS DOUBLE) / toks, 4) AS epochs,
        |  target_toks > toks AS oversampled,
        |  LEAST(toks, target_toks) AS effective_toks
        |FROM plan
        |ORDER BY source ASC NULLS LAST""".stripMargin,
      duck = """WITH per_src AS (
        |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |plan AS (
        |  SELECT source, toks,
        |    CAST(FLOOR(CAST(50000 AS DOUBLE) / COUNT(*) OVER ()) AS BIGINT) AS target_toks
        |  FROM per_src)
        |SELECT source, toks, target_toks,
        |  ROUND(CAST(target_toks AS DOUBLE) / toks, 4) AS epochs,
        |  target_toks > toks AS oversampled,
        |  LEAST(toks, target_toks) AS effective_toks
        |FROM plan
        |ORDER BY source ASC NULLS LAST""".stripMargin)
  )

  /** The ann-bruteforce cosine of `a.embedding` · `b.embedding` in DuckDB
    * list primitives (float components cast to DOUBLE, left-to-right
    * reduce — the same association order as the engine's kernel).
    */
  private def duckCosAB: String =
    """list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(generate_series(1, len(a.embedding)),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)
      |    / NULLIF(
      |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(generate_series(1, len(a.embedding)),
      |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (x, y) -> x + y)) *
      |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(generate_series(1, len(b.embedding)),
      |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)), 0.0)""".stripMargin

  /** Fixed boilerplate the substring-span queries splice into every
    * document (the llm_dedup_lines plant precedent): a mid-doc snippet and
    * a tail snippet shared across all documents guarantee duplicated
    * windows away from position 1, multi-island documents, and a canonical
    * first occurrence that must survive the cut.
    */
  private val PlantMid =
    "subscribe to our newsletter for weekly updates and exclusive offers today"
  private val PlantTail =
    "all rights reserved contact support for license terms and conditions"

  /** The planted corpus both substring-span queries run on: text split in
    * half, [[PlantMid]] spliced between the halves, [[PlantTail]] appended.
    * Both dialects build the identical string (single-space joins).
    */
  private def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.t(s, dir, "documents")
    d.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 16)
      .withColumn("half", floor(size(col("w")) / lit(2)).cast("int"))
      .select(col("doc_id"),
        concat_ws(" ",
          array_join(slice(col("w"), lit(1), col("half")), " "),
          lit(PlantMid),
          array_join(slice(col("w"), col("half") + 1,
            size(col("w")) - col("half")), " "),
          lit(PlantTail)).as("text"))
  }

  /** Shared CTE prefix of the substring-span oracles: the planted corpus,
    * its token arrays, the per-offset 8-token window strings, the
    * first-occurrence rule (row_number over the window string — the oracle
    * groups raw strings where the engine ships xxhash64 fingerprints), and
    * the gaps-and-islands merge of duplicated window starts.
    */
  private def duckSubstringSpans: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    array_to_string(w[1:half], ' ') ||
      |    ' subscribe to our newsletter for weekly updates and exclusive offers today ' ||
      |    array_to_string(w[(half+1):len(w)], ' ') ||
      |    ' all rights reserved contact support for license terms and conditions' AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w,
      |          CAST(floor(len(string_split(text, ' ')) / 2) AS BIGINT) AS half
      |        FROM documents WHERE len(string_split(text, ' ')) >= 16)),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM planted
      |  WHERE len(string_split(text, ' ')) >= 8),
      |wins AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS p FROM toks),
      |fps AS (SELECT doc_id, p, array_to_string(w[p:(p+7)], ' ') AS seg FROM wins),
      |marked AS (SELECT doc_id, p,
      |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, p) AS rn FROM fps),
      |dup AS (SELECT doc_id, p FROM marked WHERE rn > 1),
      |isl AS (SELECT doc_id, p,
      |    CASE WHEN p > COALESCE(MAX(p + 7) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_isl
      |  FROM dup),
      |isl2 AS (SELECT doc_id, p,
      |    SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM isl)""".stripMargin

  /** Shared CTE prefix of the DSIR oracles: feature hashing (positional
    * char-code bucket, unigrams + b1·31+b2 bigrams, mod 1024), both
    * smoothed models, the per-bucket log-ratio table, and per-doc bucket
    * counts — the DuckDB replay of Dsir.featureBuckets/logRatios.
    * (α = 0.5, so α·B = 512.0 exactly.)
    */
  private def duckDsirWeights: String =
    """WITH d AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
      |  FROM documents WHERE length(text) > 0),
      |ub AS (
      |  SELECT doc_id, lang,
      |    list_transform(ws, w ->
      |      COALESCE(list_sum(list_transform(generate_series(1, length(w)),
      |        i -> ord(substr(w, i, 1)) * i)), 0) % 1024) AS us
      |  FROM d),
      |fb AS (
      |  SELECT doc_id, lang,
      |    list_concat(us, list_transform(generate_series(1, greatest(len(us) - 1, 0)),
      |      j -> (us[j] * 31 + us[j + 1]) % 1024)) AS bs
      |  FROM ub),
      |p AS (SELECT b, COUNT(*) AS cp
      |  FROM (SELECT unnest(bs) AS b FROM fb WHERE lang = 'en' AND doc_id % 2 = 0)
      |  GROUP BY b),
      |q AS (SELECT b, COUNT(*) AS cq FROM (SELECT unnest(bs) AS b FROM fb) GROUP BY b),
      |tots AS (SELECT (SELECT SUM(cp) FROM p) AS tp, (SELECT SUM(cq) FROM q) AS tq),
      |r AS (
      |  SELECT COALESCE(p.b, q.b) AS b,
      |    ROUND(ln((COALESCE(cp, 0) + 0.5) / (tp + 512.0)) -
      |          ln((COALESCE(cq, 0) + 0.5) / (tq + 512.0)), 9) AS lr
      |  FROM p FULL JOIN q ON p.b = q.b CROSS JOIN tots),
      |doc AS (
      |  SELECT doc_id, b, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(bs) AS b FROM fb) GROUP BY doc_id, b)""".stripMargin

  /** Planted 4-cluster corpus for the k-means oracles: component j of the
    * vector for id v is anchor(v % 4)[j] + noise(v, j), all SMALL INTEGERS
    * held in DOUBLE — dots, norms², and centroid sums are exact (hence
    * order-independent) on both engines, and the anchor blocks (+40 on
    * dims where j % 4 = c) keep inter-cluster margins far beyond any
    * rounding, so Lloyd assignment is bit-deterministic.
    */
  /** The fixed merge list the encode query bakes in as literals (training
    * drift cannot break encoding — any merge list is a valid tokenizer).
    * Ordered: later merges consume earlier merges' output symbols.
    * (def, not val: `qs` above interpolates at class-init time.)
    */
  private[queries] def bpeEncodeMerges: Seq[(String, String)] = Seq(
    ("e r", "er"), ("e _", "e_"), ("n _", "n_"),
    ("er _", "er_"), ("o w", "ow"), ("ow _", "ow_"))

  /** One BPE merge application in DuckDB — the doubled-delimiter replace,
    * byte-for-byte the same algorithm as Bpe.applyMergeOnce.
    */
  private def duckApplyMerge(s: String, needle: String, merged: String): String =
    s"""trim(replace(replace(' ' || replace($s,' ','  ') || ' ',
       |      ' ' || replace($needle, ' ', '  ') || ' ',
       |      ' ' || replace($merged, ' ', '') || ' '),
       |      '  ', ' '))""".stripMargin

  /** The full DuckDB replay of Bpe.train over the documents corpus:
    * chained CTEs — wK (vocab after k merges) → pK (weighted adjacent
    * pairs) → mK (argmax with the count-DESC, pair-ASC tiebreak) — ending
    * in the UNION of the learned merge rows. Self-contained: the oracle
    * LEARNS the merges itself, it does not trust the Spark side's.
    */
  private def duckBpeTrain(nMerges: Int): String = {
    def pairs(w: String) =
      s"""  SELECT pair, SUM(freq) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(generate_series(1, len(string_split(syms,' '))-1),
         |      i -> string_split(syms,' ')[i] || ' ' || string_split(syms,' ')[i+1])) AS pair
         |    FROM $w)
         |  GROUP BY pair""".stripMargin
    def argmax(p: String) =
      s"SELECT pair, cnt FROM $p ORDER BY cnt DESC, pair ASC LIMIT 1"
    def applied(prev: String, m: String) =
      s"""  SELECT word, freq,
         |    ${duckApplyMerge("syms", s"(SELECT pair FROM $m)", s"(SELECT pair FROM $m)")} AS syms
         |  FROM $prev""".stripMargin
    val ctes = scala.collection.mutable.ArrayBuffer(
      """w0 AS (
        |  SELECT word, COUNT(*) AS freq,
        |    regexp_replace(word, '(.)', '\1 ', 'g') || '_' AS syms
        |  FROM (SELECT unnest(string_split(lower(text),' ')) AS word
        |        FROM documents WHERE length(text) > 0)
        |  WHERE regexp_matches(word, '^[a-z]+$')
        |  GROUP BY word)""".stripMargin)
    for (i <- 1 to nMerges) {
      ctes += s"p$i AS (\n${pairs(s"w${i - 1}")})"
      ctes += s"m$i AS (${argmax(s"p$i")})"
      if (i < nMerges) ctes += s"w$i AS (\n${applied(s"w${i - 1}", s"m$i")})"
    }
    val finals = (1 to nMerges)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, pair, CAST(cnt AS BIGINT) AS cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"WITH ${ctes.mkString(",\n")}\nSELECT * FROM ($finals) ORDER BY rank ASC NULLS LAST"
  }

  /** The literal-merge encode chain over a DuckDB lambda variable. */
  private def duckBpeEncodeChain(w: String): String =
    bpeEncodeMerges.foldLeft(s"regexp_replace($w, '(.)', '\\1 ', 'g') || '_'") {
      case (s, (l, r)) => duckApplyMerge(s, s"'$l $r'", s"'$l $r'")
    }

  private def kmeansCorpus(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "embeddings")
      .filter(col("vec_id") < 400)
      .select(col("vec_id"), expr(
        """transform(sequence(0, 15), j -> CAST(
          |  (CASE WHEN j % 4 = vec_id % 4 THEN 40 ELSE 0 END)
          |  + ((vec_id % 4) * 7 + j * 3) % 10
          |  + ((vec_id * 31 + j * 17) % 7) - 3 AS DOUBLE))""".stripMargin).as("vec"))

  /** The same corpus in DuckDB list functions (a WITH clause body).
    * (def, not val: `qs` above interpolates it at class-init time.) */
  private def duckKmeansCorpus: String =
    """corpus AS (
      |  SELECT vec_id, list_transform(generate_series(0, 15), j -> CAST(
      |    (CASE WHEN j % 4 = vec_id % 4 THEN 40 ELSE 0 END)
      |    + ((vec_id % 4) * 7 + j * 3) % 10
      |    + ((vec_id * 31 + j * 17) % 7) - 3 AS DOUBLE)) AS vec
      |  FROM embeddings WHERE vec_id < 400)""".stripMargin

  /** Exact 16-dim dot product / cosine over two list columns in DuckDB —
    * same sequential fold and same sqrt(na)*sqrt(nb) denominator as the
    * native CosineSimilarityExpr kernel, so doubles match bit for bit.
    */
  private def duckDot16(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, 16), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  private def duckCos16(a: String, b: String): String =
    s"(${duckDot16(a, b)} / NULLIF(sqrt(${duckDot16(a, a)}) * sqrt(${duckDot16(b, b)}), 0.0))"
}
