package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for training-data pipelines —
  * tokenization, shingling, MinHash/SimHash signatures, fingerprints,
  * quality metrics, language scoring. Everything here is a pure expression
  * composition (whole-stage codegen'd, no UDFs), so these run at scan
  * speed and scale linearly with the corpus; the reference's analog is the
  * setdigest/MinHash machinery (presto-main/.../type/setdigest/) plus the
  * string/array function families (SURVEY.md §2.1).
  */
object TextOps {

  /** Whitespace tokens, original order preserved. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Distinct token set — the unit for set-similarity dedup. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Distinct word n-gram shingles joined by single spaces — the native
    * flat-loop expression (sketches.WordShingles, registered as
    * `word_shingles`); string-identical to [[wordShinglesLambda]], which
    * the equivalence spec locks it against.
    */
  def wordShingles(text: Column, n: Int): Column =
    call_function("word_shingles", text, lit(n))

  /** The pure-Column lambda formulation (slower: interpreted HOFs allocate
    * a slice + join per position) — kept as the independent reference
    * implementation for the equivalence spec.
    */
  def wordShinglesLambda(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** MinHash signature of an element array: k minimums of k derived hash
    * functions h_j(x) = h1(x) + j·h2(x) (Carter–Wegman double hashing, as
    * real MinHash implementations use — reference analog:
    * setdigest/SetDigest.java's MinHash component). Each element is
    * string-hashed exactly twice; the k derived values are integer math,
    * which matters because lambda expressions run interpreted.
    */
  /** Per-element (h1, h2) hash pairs — stage this as its OWN column before
    * deriving the signature: a lambda body is re-evaluated per outer-lambda
    * iteration (no common-subexpression elimination inside interpreted
    * HOFs), so inlining the string hashing under the k-loop would hash
    * every element k times instead of twice. 31-bit components keep
    * h1 + j·h2 far below Long.MaxValue (ANSI mode errors on wrap-around).
    */
  def minhashElementHashes(elems: Column): Column = {
    val mask = lit(0x7FFFFFFFL)
    transform(elems,
      e => struct(xxhash64(e).bitwiseAND(mask).as("h1"),
        xxhash64(e, lit(1)).bitwiseAND(mask).as("h2")))
  }

  /** Signature from staged element hashes — a single fold over the
    * elements that updates all k running minimums per step. One pass means
    * the hash structs are evaluated once per element even after Catalyst
    * inlines the staged column into the lambda (CollapseProject), where a
    * per-j array_min formulation would recompute them k times.
    */
  def minhashFromHashes(hashes: Column, k: Int): Column = {
    val ks = typedLit((0 until k).map(_.toLong))
    // (h1 + j·h2) mod p, p = 2³¹−1: the mod is load-bearing — without the
    // wraparound the family is monotone in j·h2 and the element with the
    // smallest h2 wins the argmin for all large j, collapsing the slots
    // into near-perfect correlation (see MinhashSignature.scala).
    val p = lit(2147483647L)
    aggregate(hashes, array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc, ks,
        (m, j) => least(m, (s.getField("h1") % p + j * (s.getField("h2") % p)) % p)))
  }

  /** Native single-expression signature (sketches.MinhashSignature,
    * registered as `minhash_signature`): a flat JVM loop — two hashes per
    * element, k minimum updates on one long[k] — instead of the
    * interpreted staged-lambda fold above. Hash-identical to it (locked
    * by spec).
    */
  def minhashSignature(elems: Column, k: Int): Column =
    call_function("minhash_signature", elems, lit(k))

  /** LSH banding of a MinHash signature: `bands` structs of
    * (band index, hash of that band's rows). Docs sharing any band bucket
    * become candidate pairs — the standard S-curve construction.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(slice(sig, b * rows + 1, lit(rows))).as("bucket")))

  /** Exact Jaccard similarity of two element arrays (assumed distinct). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** 64-bit SimHash over an element array: majority vote per bit position
    * of the elements' xxhash64 values (Charikar 2002, "Similarity
    * estimation techniques from rounding algorithms"). Native flat-loop
    * expression (sketches.SimHash64Expr), value-identical to
    * [[simhash64Lambda]] (locked by spec).
    */
  def simhash64(elems: Column): Column = call_function("simhash64", elems)

  /** The interpreted double-fold formulation — the equivalence spec's
    * independent reference implementation.
    */
  def simhash64Lambda(elems: Column): Column = {
    val votes = aggregate(
      elems,
      array_repeat(lit(0L), 64),
      (acc, e) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(e), b).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (a, bit) => a.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Document fingerprint: minimum hash over sliding character w-grams
    * (a deterministic winnowing-style rolling-hash selection; md5 so an
    * external engine can reproduce it byte-for-byte). Native flat-loop
    * expression (sketches.RollingFingerprint), value-identical to
    * [[fingerprintLambda]] (locked by spec and the llm_fingerprint oracle).
    */
  def fingerprint(text: Column, w: Int = 8): Column =
    call_function("rolling_fingerprint", text, lit(w))

  /** The interpreted lambda formulation — the equivalence spec's
    * independent reference implementation.
    */
  def fingerprintLambda(text: Column, w: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (w - 1), lit(1))),
      i => md5(substring(text, lit(i), lit(w)))))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — the usual cheap proxy for subword counts.
    */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality metrics for filter pipelines: token count, mean word length,
    * punctuation ratio, stopword ratio, and a blended [0,1] score.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "at", "by", "be", "this")

  def nTokens(text: Column): Column = size(tokens(text))

  def meanWordLen(text: Column): Column =
    (length(text) - size(tokens(text)) + 1).cast("double") / size(tokens(text))

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Blended quality score in [0,1]: enough tokens, sane word lengths,
    * some-but-not-too-many stopwords, little punctuation noise.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(nTokens(text).cast("double") / lit(20.0), lit(1.0))
    val wordScore = when(meanWordLen(text).between(3.0, 10.0), 1.0).otherwise(0.5)
    val stopScore = when(stopwordRatio(text).between(0.01, 0.6), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    (lenScore + wordScore + stopScore + punctScore) / 4.0
  }

  /** The Gopher document-quality rules (Rae et al. 2021, Appendix A —
    * the repetition-free subset; cross-document repetition lives in the
    * [[Dedup]] tier). Every rule is INTEGER arithmetic (counts compared
    * by cross-multiplication, never a float ratio), so the verdicts are
    * bit-stable across engines and partitionings. Returns a struct of
    * per-rule booleans plus the conjunction:
    *  - word_count: 50 ≤ n ≤ 100,000;
    *  - word_length: mean word length in [3, 10] (3n ≤ Σlen ≤ 10n);
    *  - symbol_ratio: ('#' + '…') occurrences ≤ 0.1 per word;
    *  - bullet_lines: ≤ 10% of lines start with a bullet;
    *  - ellipsis_lines: < 30% of lines end with an ellipsis;
    *  - alpha_words: ≥ 80% of words contain a letter;
    *  - stop_words: ≥ 2 distinct hits from the paper's 8-word list.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(text: Column): Column = {
    val ws = tokens(text)
    val n = size(ws)
    val sumLen = aggregate(ws, lit(0), (a, w) => a + length(w))
    val lines = split(text, "\n")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l =>
      startswith(ltrim(l), lit("-")) || startswith(ltrim(l), lit("*")) ||
        startswith(ltrim(l), lit("•"))))
    val ellipsisLines = size(filter(lines, l =>
      endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    // both ellipsis spellings count, as the docstring (and the Gopher
    // rule) says: ASCII '...' (3 chars each) plus Unicode '…' (1 char)
    val ellipses = (length(text) - length(replace(text, lit("..."), lit("")))) / 3 +
      (length(text) - length(replace(text, lit("…"), lit(""))))
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val stopHits = size(array_intersect(array_distinct(ws),
      array(gopherStopwords.map(lit): _*)))
    val rules = Seq(
      "word_count" -> (n >= 50 && n <= 100000),
      "word_length" -> (lit(3) * n <= sumLen && sumLen <= lit(10) * n),
      "symbol_ratio" -> (lit(10) * (hashes + ellipses) <= n),
      "bullet_lines" -> (lit(10) * bulletLines <= nLines),
      "ellipsis_lines" -> (lit(10) * ellipsisLines < lit(3) * nLines),
      "alpha_words" -> (lit(10) * alphaWords >= lit(8) * n),
      "stop_words" -> (stopHits >= 2))
    struct(rules.map { case (name, c) => c.as(name) } :+
      rules.map(_._2).reduce(_ && _).as("keep"): _*)
  }

  /** Within-document duplicate-line removal (the boilerplate cleaner:
    * repeated headers/footers/navigation lines collapse to their first
    * occurrence, original order preserved). Map-only — a first-occurrence
    * index filter over the line array; O(lines²) per DOCUMENT, which is
    * bounded and tiny, never corpus-quadratic. The cross-document analog
    * is [[Dedup.segmentCut]].
    */
  def dedupLines(text: Column): Column = {
    val lines = split(text, "\n")
    array_join(
      filter(lines, (l, i) => array_position(lines, l) === (i + 1).cast("long")),
      "\n")
  }

  /** Language-ID by stopword-list hits — the n-gram-free heuristic tier.
    * Scores each candidate language by distinct-token overlap with its
    * stopword list and picks the argmax (ties break by list order).
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "avec", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "con", "para", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "有", "我", "他", "这", "中"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokenSet(text)
    langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
  }

  /** Predicted language code, 'und' when nothing matches. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0 && acc === "und", lit(lang)).otherwise(acc)
    }
  }

  /** PII scrubbing for training corpora: emails, IPv4 literals, then
    * phone-like digit runs → typed placeholder tags. Email runs first —
    * the local part is a digit run the phone pattern would bite into —
    * and the placeholders contain no digits, so later passes cannot
    * re-match earlier replacements. A pure codegen'd regexp_replace chain
    * (per-row, no shuffle); the patterns stay inside the RE2-compatible
    * subset, so engines on RE2 (as the reference's re2j-backed functions,
    * presto-main/.../type/Re2JRegexpType.java) agree with Java's
    * semantics here.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
      "\\+?[0-9][0-9 -]{6,}[0-9]", "<PHONE>")

  /** Overlapping fixed-width token chunking (the RAG/embedding-prep
    * split: window tokens per chunk, stride tokens between chunk starts,
    * stride < window ⇒ adjacent chunks overlap by window − stride).
    * Chunk starts are 0, stride, 2·stride, … < n, so every token appears
    * in ≥ 1 chunk and the trailing chunk may be short — the standard
    * fixed-stride rule, deterministic at any partitioning.
    *
    * Map-only: tokenize → explode the start offsets → slice. No shuffle;
    * output rows ≈ corpus tokens / stride. Output:
    * (id, chunk_idx, n_tokens, chunk_text).
    */
  def chunkOverlap(
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be positive")
    docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col("id"), col("__ws"),
        explode(sequence(lit(0), size(col("__ws")) - 1, lit(stride))).as("__s"))
      .select(col("id"),
        (col("__s") / stride).cast("long").as("chunk_idx"),
        slice(col("__ws"), col("__s") + 1, lit(window)).as("__c"))
      .select(col("id"), col("chunk_idx"),
        size(col("__c")).cast("long").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }
}
