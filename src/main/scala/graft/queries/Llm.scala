package graft.queries

import graft.{Q, Tables}
import graft.llm.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Declared queries for the training-data pipeline operators
  * (graft.llm.*): text analysis, deduplication, similarity search, and
  * multimodal plumbing over the driver's `documents`/`embeddings` tables.
  * DuckDB oracles replicate the exact formulas with list/string functions
  * where expressible; LSH/ANN operators get rows-only checks here and
  * recall/determinism properties in LlmSpec.
  */
object Llm {

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

    // ---- MinHash + LSH near-dup candidates (Dedup.minhashLsh) — sketch
    //      banding is engine-specific; recall vs exact pairs is proven in
    //      LlmSpec, the driver records a rows-only check ----
    // Bigram shingles, not raw token sets: this synthetic corpus draws
    // from a tiny vocabulary, so token-set signatures collapse thousands
    // of docs into one LSH bucket and the verify step goes quadratic —
    // exactly the degenerate case shingling exists to prevent.
    "llm_dedup_minhash" -> Q.noOracle(headline = true) { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      Dedup.minhashLsh(d, "doc_id", TextOps.wordShingles(col("text"), 2),
        k = 32, bands = 8, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    },

    // ---- SimHash near-dup candidates (Dedup.simhashPairs) ----
    "llm_dedup_simhash" -> Q.noOracle() { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      Dedup.simhashPairs(d, "doc_id", TextOps.tokenSet(col("text")), maxHamming = 3)
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

    // ---- bucketed LSH ANN (Similarity.lshTopK) — recall vs brute force
    //      proven in LlmSpec; rows-only here ----
    "llm_ann_lsh" -> Q.noOracle(headline = true) { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 20)
      Similarity.lshTopK(queries, e, "vec_id", "embedding", k = 3, nPlanes = 4)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
    },

    // ---- end-to-end corpus cleaning: quality filter → near-dup removal →
    //      kept docs with metrics. The composition a real training-data
    //      job runs; invariants (kept ⊆ input, no surviving near-dup pair,
    //      quality floor) are asserted in LlmSpec ----
    "llm_pipeline_clean_corpus" -> Q.noOracle() { (s, dir) =>
      val d = Tables.t(s, dir, "documents")
      val qualified = d.filter(TextOps.qualityScore(col("text")) >= 0.7)
      val pairs = Dedup.minhashLsh(qualified, "doc_id",
        TextOps.tokenSet(col("text")), k = 32, bands = 8, threshold = 0.95)
      Dedup.dropDuplicates(qualified, "doc_id", pairs)
        .select(col("doc_id"), col("lang"),
          round(TextOps.qualityScore(col("text")), 6).as("quality"),
          TextOps.nTokens(col("text")).as("n_tokens"))
        .orderBy(col("doc_id").asc_nulls_last)
    },

    // ---- multimodal plumbing (Multimodal.imageFeatures / audioFrames) —
    //      stub decoders; schema + distribution tested in LlmSpec ----
    // feature/frame arrays serialized to strings for the driver's
    // array-hostile rows-only comparator (pandas sort of ndarray cells).
    "llm_multimodal_image" -> Q.noOracle() { (s, dir) =>
      val media = graft.llm.Multimodal.mediaFromText(
        Tables.t(s, dir, "documents"), "doc_id", "text", "image")
      graft.llm.Multimodal.imageFeatures(media, partitions = 8)
        .withColumn("feature",
          concat_ws(",", transform(col("feature"), x => format_number(x, 4))))
        .orderBy(col("media_id").asc_nulls_last)
    },

    "llm_multimodal_audio" -> Q.noOracle() { (s, dir) =>
      val media = graft.llm.Multimodal.mediaFromText(
        Tables.t(s, dir, "documents"), "doc_id", "text", "audio")
      graft.llm.Multimodal.audioFrames(media, partitions = 8)
        .withColumn("frames",
          concat_ws(";", transform(col("frames"),
            f => concat_ws(",", transform(f, x => format_number(x, 4))))))
        .orderBy(col("media_id").asc_nulls_last)
    }
  )
}
