package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.{Dedup, Multimodal, Similarity, TextOps}

/** Property tests for the LLM-pipeline operators — the guarantees the
  * DuckDB oracle cannot express: LSH recall against exact computation,
  * pigeonhole completeness of SimHash banding, ANN recall, and
  * deterministic multimodal plumbing.
  */
class LlmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs: DataFrame = Tables.t(spark, sfDir, "documents")
  private def embs: DataFrame = Tables.t(spark, sfDir, "embeddings")

  test("redactPii scrubs emails, phones, and IPs; order protects the email local part") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      "mail a.b+x@c-corp.io call +1 650 555-0199 from 192.168.0.1",
      "no pii here at all",
      "double first.last@a.io second@b.org and 10.0.0.1").toDF("t")
      .select(llm.TextOps.redactPii(org.apache.spark.sql.functions.col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(rows(0) == "mail <EMAIL> call <PHONE> from <IP>")
    assert(rows(1) == "no pii here at all")
    assert(rows(2) == "double <EMAIL> <EMAIL> and <IP>")
  }

  test("minhash-lsh recall: finds every exact pair at its threshold") {
    val elems = TextOps.tokenSet(col("text"))
    val exact = Dedup.jaccardPairs(docs, "doc_id", elems, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", elems, k = 32, bands = 8, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes LSH precise; recall is the probabilistic part
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh -- exact}")
    assert(exact.nonEmpty, "test corpus should contain >=1 near-dup pair")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("minhash-lsh all-unique corpus: every bucket a singleton, zero pairs, no crash") {
    val sp = spark; import sp.implicits._
    // vocabulary-disjoint docs — no two share a shingle, so every
    // (band, bucket) is width 1 and the `__bw > 1` stats filter drops
    // the ENTIRE banded frame before the self-join (the path the
    // map-side bucket-width rewrite introduced: singletons never reach
    // the join at all)
    val uniq = (1L to 40L)
      .map(i => (i, s"token${i}a token${i}b token${i}c token${i}d"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(uniq, "doc_id", TextOps.tokenSet(col("text")),
      k = 32, bands = 8, threshold = 0.5)
    assert(pairs.count() === 0L, "no shared shingles must mean no candidate pairs")
    spark.catalog.clearCache()
  }

  test("minhash-lsh never compares all pairs (bucket-join plan)") {
    val plan = Dedup.minhashLsh(docs, "doc_id", TextOps.tokenSet(col("text")))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cross"), "candidate generation must not cross-join")
  }

  test("simhash banding is complete for hamming <= 3 (pigeonhole)") {
    val elems = TextOps.tokenSet(col("text"))
    // all-pairs ground truth over a slice
    val d = docs.filter(col("doc_id") < 60)
    val hashed = d.select(col("doc_id"), TextOps.simhash64(elems).as("sim"))
    val a = hashed.select(col("doc_id").as("ia"), col("sim").as("sa"))
    val b = hashed.select(col("doc_id").as("ib"), col("sim").as("sb"))
    val exact = a.join(b, col("ia") < col("ib"))
      .withColumn("h", TextOps.hamming64(col("sa"), col("sb")))
      .filter(col("h") <= 3)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashPairs(d, "doc_id", elems, maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact, s"banded=${banded.size} exact=${exact.size}")
  }

  test("simhash hot-chunk cap bounds the adversarial all-identical corpus") {
    val sp = spark; import sp.implicits._
    // 200 identical docs: every chunk bucket has width 200 — uncapped, the
    // candidate join would materialize 4 × 200²/2 pairs; capped at 10 it
    // must star-link, emitting exactly the n−1 (representative, member)
    // pairs that greedy min-id clustering needs.
    val n = 200
    val d = (1 to n).map(i => (i.toLong, "identical text payload repeated verbatim"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "doc_id", TextOps.tokenSet(col("text")),
      maxHamming = 3, hotChunkCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == n - 1, s"expected ${n - 1} star pairs, got ${pairs.size}")
    assert(pairs.forall(_._1 == 1L), "every capped pair must link to the min-id representative")
    // and clustering still removes all duplicates
    val kept = Dedup.dropDuplicates(d, "doc_id",
      Dedup.simhashPairs(d, "doc_id", TextOps.tokenSet(col("text")),
        maxHamming = 3, hotChunkCap = 10))
    assert(kept.count() == 1)
  }

  test("synthetic duplicates are found by every dedup tier") {
    val sp = spark; import sp.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),  // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
      (4L, "completely different content about database engines and columnar storage systems"))
      .toDF("doc_id", "text")
    val exact = Dedup.exact(base, "doc_id", "text").collect()
    assert(exact.length == 1 && exact(0).getAs[Long]("n_dups") == 2)

    val near = Dedup.jaccardPairs(base, "doc_id", TextOps.tokenSet(col("text")), 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((1L, 2L)) && near.contains((1L, 3L)) && near.contains((2L, 3L)))
    assert(!near.exists(p => p._1 == 4L || p._2 == 4L))

    val lsh = Dedup.minhashLsh(base, "doc_id", TextOps.tokenSet(col("text")),
      k = 32, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((1L, 2L)), "identical docs must always collide")
  }

  test("segment duplication counts cross-doc segments, not within-doc repeats") {
    val sp = spark; import sp.implicits._
    // 4-word segments: doc 1 and 2 share their first segment exactly;
    // doc 3 repeats its own segment twice (within-doc only); doc 4 unique.
    val base = Seq(
      (1L, "a b c d e f g h"),         // segs: "a b c d", "e f g h"
      (2L, "a b c d x y z w"),         // shares "a b c d" with doc 1
      (3L, "p q r s p q r s"),         // own segment twice, no other doc
      (4L, "unique words only here"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDuplication(base, "doc_id", col("text"), segWords = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (2L, 1L), "doc 1: 2 segments, 1 shared cross-doc")
    assert(out(2L) == (2L, 1L), "doc 2: 2 segments, 1 shared cross-doc")
    assert(out(3L) == (2L, 0L), "within-doc repetition is not cross-doc duplication")
    assert(out(4L) == (1L, 0L))
    // partial tail segment: 5 words at segWords=4 -> 2 segments
    val tail = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val t = Dedup.segmentDuplication(tail, "doc_id", col("text"), 4).collect()
    assert(t.head.getLong(1) == 2L)
  }

  test("segment cut removes cross-doc segments, keeps own repeats, in order") {
    val sp = spark; import sp.implicits._
    val base = Seq(
      (1L, "a b c d e f g h"),          // shares "a b c d" with doc 2
      (2L, "a b c d x y z w"),
      (3L, "p q r s p q r s"),          // own repeat — must survive whole
      (4L, "a b c d"))                   // nothing survives — dropped
      .toDF("doc_id", "text")
    val out = Dedup.segmentCut(base, "doc_id", col("text"), segWords = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "e f g h", "shared leading segment must be cut")
    assert(out(2L) == "x y z w")
    assert(out(3L) == "p q r s p q r s", "within-doc repeats are not contamination")
    assert(!out.contains(4L), "fully-duplicated doc drops entirely")
  }

  test("substring spans: first occurrence canonical, overlaps merge, islands split") {
    val sp = spark; import sp.implicits._
    val base = Seq(
      (1L, "a b c d e f g h"),            // the canonical source — no spans
      (2L, "x1 x2 a b c d e y1 y2"),      // one copied passage mid-doc
      (3L, "p q r s p q r s"),            // within-doc repeat: second copy marked
      (4L, "a b c z1 z2 d e f"))          // two copied passages, a gap between
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(base, "doc_id", col("text"), windowTokens = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
    assert(!spans.contains(1L), "every window of doc 1 is canonical")
    assert(spans(2L) == List((3L, 7L, 5L)), "overlapping dup windows merge to one span")
    assert(spans(3L) == List((5L, 8L, 4L)), "a document's own repeat IS a duplicate " +
      "(the ExactSubstr rule — contrast segmentCut, which keeps own repeats)")
    assert(spans(4L) == List((1L, 3L, 3L), (6L, 8L, 3L)), "a gap splits islands")
  }

  test("substring cut rebuilds survivors in order; full coverage yields empty") {
    val sp = spark; import sp.implicits._
    val base = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x1 x2 a b c d e y1 y2"),
      (3L, "p q r s p q r s"),
      (4L, "a b c z1 z2 d e f"),
      (5L, "a b c d e f g h"))            // exact copy of doc 1 — fully covered
      .toDF("doc_id", "text")
    val out = Dedup.substringCut(base, "doc_id", col("text"), windowTokens = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(!out.contains(1L), "untouched documents are not rewritten")
    assert(out(2L) == (("x1 x2 y1 y2", 4L)))
    assert(out(3L) == (("p q r s", 4L)), "exactly one copy of the repeat survives")
    assert(out(4L) == (("z1 z2", 2L)))
    assert(out(5L) == (("", 0L)), "fully-duplicated doc rebuilds empty, stays visible")
  }

  test("leakage-safe split: every near-dup cluster lands on one side") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1-2-3 (one cluster via transitivity), pair 10-11, isolates rest
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = graft.llm.Sampling.leakageSafeSplit(docs, "doc_id", pairs, 250)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out.size == 40)
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L,
      "transitive closure collapses the chain to min-id rep 1")
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1,
      "cluster {1,2,3} must be entirely train or entirely val")
    assert(out(10L)._2 == out(11L)._2, "pair {10,11} splits together")
    assert(out(20L)._1 == 20L, "unpaired docs are their own representative")
    val valFrac = out.values.count(_._2 == "val").toDouble / out.size
    assert(valFrac > 0.0 && valFrac < 1.0, s"split is degenerate: valFrac=$valFrac")
  }

  test("quality prune keeps ceil(n*q/1000) per class; bar ties resolve by id") {
    val sp = spark; import sp.implicits._
    // class a: 5 rows scores 5,4,3,2,1 -> keep ceil(5*600/1000)=3 (ids 1,2,3)
    // class b: 3 rows all score 7 (tied) -> keep ceil(3*600/1000)=2, ids 11,12
    val rows = Seq(
      (1L, "a", 5.0), (2L, "a", 4.0), (3L, "a", 3.0), (4L, "a", 2.0), (5L, "a", 1.0),
      (11L, "b", 7.0), (12L, "b", 7.0), (13L, "b", 7.0)).toDF("id0", "cls0", "q")
    val kept = graft.llm.Sampling.qualityPrune(rows, "id0", "cls0", col("q"), 600)
      .collect().map(r => r.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 11L, 12L))
  }

  test("takePerClass: exactly k per big class, whole small classes, partitioning-invariant") {
    val sp = spark; import sp.implicits._
    val rows = ((1L to 20L).map(i => (i, "big")) ++ Seq((101L, "tiny"), (102L, "tiny")))
      .toDF("id0", "cls0")
    def draw(parts: Int) = graft.llm.Sampling.takePerClass(
        rows.repartition(parts), "cls0", k = 5,
        by = Seq(md5(col("id0").cast("string")), col("id0")))
      .collect().map(r => r.getLong(0)).toSet
    val got = draw(3)
    assert(got.count(_ <= 20L) == 5, "exactly k from the 20-row class")
    assert(got.intersect(Set(101L, 102L)) == Set(101L, 102L),
      "classes smaller than k keep every row")
    assert(draw(7) == got, "the draw is deterministic under any partitioning")
  }

  test("mixture permille downsamples overrepresented classes to the target") {
    val sp = spark; import sp.implicits._
    val base = Seq(
      ("big", 4000L), ("big", 4000L),       // 8000 tokens -> permille 100
      ("fit", 500L), ("fit", 300L),         // 800 tokens  -> exactly 1000
      ("small", 10L))                       // 10 tokens   -> capped at 1000
      .toDF("source", "toks")
    val out = graft.llm.Sampling.mixturePermille(base, "source", col("toks"), 800L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("big") == (8000L, 100L))
    assert(out("fit") == (800L, 1000L))
    assert(out("small") == (10L, 1000L), "never upsample past keeping everything")
  }

  test("dropDuplicates keeps exactly one representative per cluster") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", TextOps.tokenSet(col("text")), 0.9)
    val kept = Dedup.dropDuplicates(docs, "doc_id", pairs)
    val removed = docs.count() - kept.count()
    val losers = pairs.select("id_b").distinct().count()
    assert(removed == losers)
  }

  test("ann lsh recall against brute force") {
    val queries = embs.filter(col("vec_id") < 30)
    val exact = Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, embs, "vec_id", "embedding", 5, nPlanes = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.35, s"ANN recall $recall too low for 4 planes + multi-probe")
    assert(approx.nonEmpty)
  }

  test("ann results deterministic across partitionings") {
    val queries = embs.filter(col("vec_id") < 10)
    val r1 = Similarity.lshTopK(queries, embs, "vec_id", "embedding", 3, nPlanes = 4)
      .collect().map(_.toString).sorted
    val r2 = Similarity.lshTopK(queries.repartition(7), embs.repartition(5),
        "vec_id", "embedding", 3, nPlanes = 4)
      .collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
  }

  test("ann ivf recall against brute force") {
    val queries = embs.filter(col("vec_id") < 30)
    val exact = Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(queries, embs, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // nprobe/nlist = 1/4 of the corpus is scanned; recall must beat that
    // share by a wide margin (the cells concentrate near neighbors)
    assert(recall >= 0.35, s"IVF recall $recall too low for nprobe=4/nlist=16")
    assert(approx.nonEmpty)
  }

  test("ann ivf deterministic across partitionings, full top-k per query") {
    val queries = embs.filter(col("vec_id") < 10)
    val r1 = Similarity.ivfTopK(queries, embs, "vec_id", "embedding", 3)
      .collect().map(_.toString).sorted
    val r2 = Similarity.ivfTopK(queries.repartition(7), embs.repartition(5),
        "vec_id", "embedding", 3)
      .collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
    assert(r1.length == queries.count() * 3, "every query must fill its top-k")
  }

  test("multimodal image features: schema, determinism, full coverage") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "image")
    val f1 = Multimodal.imageFeatures(media, partitions = 4)
    assert(f1.schema == Multimodal.imageFeatureSchema)
    assert(f1.count() == docs.count())
    val f2 = Multimodal.imageFeatures(media, partitions = 9)
    val s1 = f1.orderBy("media_id").collect().map(_.toString)
    val s2 = f2.orderBy("media_id").collect().map(_.toString)
    assert(s1.sameElements(s2), "decode must be deterministic across partitionings")
    val row = f1.filter(col("media_id") === 0).collect()(0)
    assert(row.getAs[Int]("width") >= 64 && row.getAs[Int]("n_channels") == 3)
    assert(row.getAs[scala.collection.Seq[Float]]("feature").length == 16)
  }

  test("multimodal audio frames: fixed frame shape") {
    val media = Multimodal.mediaFromText(docs.limit(20), "doc_id", "text", "audio")
    val frames = Multimodal.audioFrames(media)
    assert(frames.schema == Multimodal.audioFeatureSchema)
    val row = frames.collect()(0)
    val fr = row.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("frames")
    assert(fr.length == 4 && fr.forall(_.length == 8))
    assert(row.getAs[Int]("sample_rate") == 16000)
  }

  test("multimodal video frames: explode shape, determinism across partitionings") {
    val media = Multimodal.mediaFromText(docs.limit(40), "doc_id", "text", "video")
    val f1 = Multimodal.videoFrames(media, k = 8, partitions = 4)
    assert(f1.schema == Multimodal.videoFrameSchema)
    assert(f1.count() == 40 * 8, "each blob must explode to exactly k frame rows")
    val f2 = Multimodal.videoFrames(media, k = 8, partitions = 9)
    val s1 = f1.orderBy("media_id", "frame_idx").collect().map(_.toString)
    val s2 = f2.orderBy("media_id", "frame_idx").collect().map(_.toString)
    assert(s1.sameElements(s2), "decode must be deterministic across partitionings")
    val one = f1.filter(col("media_id") === 0).orderBy("frame_idx").collect()
    val stride = one.head.getAs[Int]("stride")
    assert(one.map(_.getAs[Int]("frame_idx")).sameElements((0 until 8).map(_ * stride)),
      "frames must be the k strided indices spanning the clip")
    assert(one.forall(r => r.getAs[Int]("frame_idx") < r.getAs[Int]("n_frames")))
    assert(one.forall(r =>
      r.getAs[Long]("ts_ms") == r.getAs[Int]("frame_idx").toLong * 1000L / 30L))
  }

  test("clean-corpus pipeline invariants") {
    val kept = Registry.all("llm_pipeline_clean_corpus").fn(spark, sfDir)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(allIds) && keptIds.nonEmpty)
    // LSH recall is probabilistic (documented): on this corpus several
    // hundred pairs sit at the threshold, so allow a ~1% residual rather
    // than zero — the property is that dedup removed (nearly) all of them
    val survivors = docs.filter(col("doc_id").isin(keptIds.toSeq: _*))
    val residual = Dedup.jaccardPairs(survivors, "doc_id", TextOps.tokenSet(col("text")), 0.95)
      .count()
    val before = Dedup.jaccardPairs(docs, "doc_id", TextOps.tokenSet(col("text")), 0.95).count()
    assert(residual <= math.max(2L, before / 100),
      s"$residual of $before near-dup pairs survived the pipeline")
    // quality floor holds
    assert(kept.filter(col("quality") < 0.7).count() == 0)
  }

  test("language id picks a deterministic argmax with und fallback") {
    val sp = spark; import sp.implicits._
    val d = Seq(
      (1L, "the cat and the dog in the house"),
      (2L, "der hund und die katze ist nicht hier"),
      (3L, "le chat et le chien est pas une"),
      (4L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("native minhash signature is hash-identical to the lambda fold") {
    val lambdaForm = docs.limit(50).select(
      TextOps.minhashFromHashes(
        TextOps.minhashElementHashes(TextOps.tokenSet(col("text"))), 32).as("sig"))
      .collect().map(_.getSeq[Long](0).toList).toList
    val nativeForm = docs.limit(50).select(
      TextOps.minhashSignature(TextOps.tokenSet(col("text")), 32).as("sig"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(lambdaForm == nativeForm)
  }

  test("native word shingles are string-identical to the lambda form") {
    for (n <- Seq(2, 3)) {
      val lambdaForm = docs.limit(80).select(
        TextOps.wordShinglesLambda(col("text"), n).as("s"))
        .collect().map(_.getSeq[String](0).toList).toList
      val nativeForm = docs.limit(80).select(
        TextOps.wordShingles(col("text"), n).as("s"))
        .collect().map(_.getSeq[String](0).toList).toList
      assert(lambdaForm == nativeForm, s"n=$n")
    }
    // degenerate: fewer words than n, leading/trailing whitespace
    val sp = spark; import sp.implicits._
    val edge = Seq((1L, "one"), (2L, " two words "), (3L, "")).toDF("doc_id", "text")
    val l = edge.select(TextOps.wordShinglesLambda(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    val v = edge.select(TextOps.wordShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(l == v, s"$l vs $v")
  }

  test("native fingerprint is value-identical to the lambda form") {
    val rows = docs.limit(80).select(
      TextOps.fingerprint(col("text"), 8).as("n"),
      TextOps.fingerprintLambda(col("text"), 8).as("l")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    // short-text edge: text shorter than the window
    val sp = spark; import sp.implicits._
    val edge = Seq((1L, "abc"), (2L, "ümlaut ünïcode")).toDF("doc_id", "text")
    val e = edge.select(TextOps.fingerprint(col("text"), 8).as("n"),
      TextOps.fingerprintLambda(col("text"), 8).as("l")).collect()
    e.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("native simhash is value-identical to the lambda fold") {
    val rows = docs.limit(80).select(
      TextOps.simhash64(TextOps.tokenSet(col("text"))).as("n"),
      TextOps.simhash64Lambda(TextOps.tokenSet(col("text"))).as("l")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("with-ties and top-n plans pre-prune per partition (WindowGroupLimit)") {
    Tables.ensure(spark, sfDir)
    val plan = PrestoSql.sql(spark,
      "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC FETCH FIRST 5 ROWS WITH TIES")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("native cosine and sign bucket are value-identical to the lambda forms") {
    val d = embs.filter(col("vec_id") < 60)
    val joined = d.select(col("vec_id").as("i"), col("embedding").as("a"))
      .join(d.select((col("vec_id") - 1).as("i"), col("embedding").as("b")), "i")
    val cos = joined.select(
      Similarity.cosine(col("a"), col("b")).as("n"),
      Similarity.cosineLambda(col("a"), col("b")).as("l")).collect()
    assert(cos.nonEmpty)
    cos.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-exact
    val buckets = embs.limit(100).select(
      Similarity.lshBucket(col("embedding"), 8, 64).as("n"),
      Similarity.lshBucketLambda(col("embedding"), 8, 64).as("l")).collect()
    buckets.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("hot-bucket cap keeps degenerate minhash candidates linear") {
    val sp = spark; import sp.implicits._
    // adversarial corpus: 400 identical docs — every band bucket holds all
    // 400, which uncapped would mean 400·399/2 ≈ 80k candidate pairs
    val d = (1L to 400L).map(i => (i, "the same exact text repeated in every document"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(d, "doc_id", TextOps.tokenSet(col("text")),
      threshold = 0.9, hotBucketCap = 50)
    val got = pairs.collect()
    // star-linking: every doc pairs with the representative (min id) only
    assert(got.length == 399, s"expected 399 star pairs, got ${got.length}")
    assert(got.forall(_.getLong(0) == 1L), "all pairs must link to the min-id representative")
    // greedy min-id clustering still removes every duplicate
    assert(Dedup.dropDuplicates(d, "doc_id", pairs).count() == 1L)
  }

  test("embedding near-dup: LSH recalls every exact pair on a planted corpus") {
    // the fixture has no organic near-dups (max pairwise cosine < 0.6), so
    // plant them: every 3rd vector gets a diagonally perturbed copy
    // (cosine ≈ 0.99997 — close to but never exactly 1, so some planes do
    // flip and recall is genuinely probabilistic, ~1e-11 miss/pair)
    val base = embs.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val planted = base.unionByName(base.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(v, (x, j) -> x * (1.0 + 0.01 * ((CAST(j % 5 AS DOUBLE) - 2.0) / 2.0)))").as("v")))
    val exact = Dedup.embeddingPairs(planted, "vec_id", "v", 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDup(planted, "vec_id", "v", threshold = 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted corpus should contain >=1 near-dup pair")
    // exact verification makes LSH precise; the planted regime makes the
    // probabilistic recall side effectively certain — demand equality
    assert(lsh == exact, s"missed: ${exact -- lsh}; extra: ${lsh -- exact}")
  }

  test("embedding near-dup never compares all pairs (bucket-join plan)") {
    val plan = Dedup.embeddingNearDup(embs, "vec_id", "embedding", threshold = 0.98)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cross"), "candidate generation must not cross-join")
  }

  test("embedding near-dup hot-bucket cap star-links an all-identical corpus") {
    val sp = spark; import sp.implicits._
    // 300 identical vectors: every table's one bucket holds all 300, which
    // uncapped would mean 300·299/2 ≈ 45k candidate pairs per table
    val v = (0 until 64).map(i => math.sin(i + 1)).toArray
    val d = (1L to 300L).map(i => (i, v)).toDF("vec_id", "v")
    val pairs = Dedup.embeddingNearDup(d, "vec_id", "v",
      threshold = 0.99, hotBucketCap = 50)
    val got = pairs.collect()
    assert(got.length == 299, s"expected 299 star pairs, got ${got.length}")
    assert(got.forall(_.getLong(0) == 1L), "all pairs must link to the min-id representative")
    assert(Dedup.dropDuplicates(d, "vec_id", pairs).count() == 1L)
  }

  test("small buckets keep full pair enumeration under the cap") {
    val sp = spark; import sp.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "completely different words here now")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(d, "doc_id", TextOps.tokenSet(col("text")), threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("ann hot-bucket salting preserves the exact result set") {
    val q = embs.filter(col("vec_id") < 20)
    val unsalted = Similarity.lshTopK(q, embs, "vec_id", "embedding", 3, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // cap of 10 forces every populated sign bucket to salt into many cells
    val salted = Similarity.lshTopK(q, embs, "vec_id", "embedding", 3, nPlanes = 4,
      hotBucketCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(salted == unsalted, "salting must not change the candidate set or ranking")
  }

  test("quadratic baselines refuse oversized inputs") {
    val sp = spark; import sp.implicits._
    val big = sp.range(0, 2000).select(col("id").as("doc_id"),
      concat(lit("text "), col("id").cast("string")).as("text"))
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(big, "doc_id", TextOps.tokenSet(col("text")), 0.9,
        maxRows = 1000).count()
    }
    intercept[IllegalArgumentException] {
      Dedup.embeddingPairs(embs, "vec_id", "embedding", 0.5, maxRows = 100).count()
    }
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(embs, embs, "vec_id", "embedding", 3,
        maxProduct = 1000).count()
    }
  }

  test("quality score bounds and monotone token credit") {
    val sp = spark; import sp.implicits._
    val d = Seq(
      (1L, "short"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps running through the long field with great speed today")
    ).toDF("doc_id", "text")
    val scores = d.select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(scores(2L) > scores(1L))
  }

  test("connected components: chains, triangles, and isolated pairs resolve transitively") {
    // chain 1-2-3-4 (diameter 3, needs real propagation), triangle 10-11-12,
    // isolated pair 20-21; shuffled across partitions
    val pairs = spark.createDataFrame(
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L),
        (10L, 12L), (21L, 20L))).toDF("id_a", "id_b").repartition(5)
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: a 70-deep chain converges across batches via pointer doubling") {
    // diameter 69 — far past one 3-round batch, so this exercises the
    // batch boundary (checkpoint + convergence probe + unpersist
    // bookkeeping) and the doubling arm's O(log diameter) round count
    // (maxIter = 20 < 69 plain label-propagation rounds: without
    // doubling this CANNOT converge). Ids DESCEND along the chain so
    // the min label must propagate against edge orientation.
    val n = 70
    val pairs = spark.createDataFrame(
        (0 until n - 1).map(i => (1000L - i, 1000L - i - 1)))
      .toDF("id_a", "id_b").repartition(7)
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 1000L - (n - 1)),
      s"all $n chain members must carry the min id ${1000L - (n - 1)}")
  }

  test("connected components fail loudly instead of spinning past maxIter") {
    val pairs = spark.createDataFrame(
        (0 until 69).map(i => (1000L - i, 1000L - i - 1)))
      .toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connected components subsume the greedy star on real slice pairs") {
    val elems = TextOps.tokenSet(col("text"))
    val pairs = Dedup.jaccardPairs(docs.filter(col("doc_id") < 200), "doc_id", elems, 0.8)
    val cc = Dedup.connectedComponents(pairs)
    // every pair lands in one cluster, and each cluster's label is its min member
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.select("id_a", "id_b").collect().foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters")
    }
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min, s"cluster $label label is not its min member")
    }
  }

  test("semanticDedup prunes within clusters only, min-id survivor rule") {
    val sp = spark; import sp.implicits._
    // two well-separated clusters on axes; ids 1,2 identical (dup pair in
    // cluster A), id 3 near-dup of 1; id 10 alone in cluster B, id 11 a
    // dup of 10; id 12 orthogonal-ish but still closest to B's centroid.
    val corpus = Seq(
      (1L, Seq(10.0, 0.0, 0.1, 0.0)),
      (2L, Seq(10.0, 0.0, 0.1, 0.0)),
      (3L, Seq(10.0, 0.0, 0.1001, 0.0)),
      (10L, Seq(0.0, 10.0, 0.0, 0.2)),
      (11L, Seq(0.0, 10.0, 0.0, 0.2)),
      (12L, Seq(0.0, 10.0, 0.0, 3.0)))
      .toDF("id", "vec")
    val cents = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cluster", "centroid")
    val out = Dedup.semanticDedup(corpus, "id", "vec", cents, threshold = 0.999)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out(1L) == ((1L, true, None)))
    assert(out(2L) == ((1L, false, Some(1L))))
    assert(out(3L) == ((1L, false, Some(1L))), "near-dup must link to min id")
    assert(out(10L) == ((2L, true, None)))
    assert(out(11L) == ((2L, false, Some(10L))))
    assert(out(12L)._2, "dissimilar member of the same cluster must survive")
    spark.catalog.clearCache()
  }

  test("semanticDedup auto-switches to join assignment past the literal-k ceiling") {
    val sp = spark; import sp.implicits._
    // 1200 centroids (> the 1000 literal ceiling) on distinct rays; two
    // corpus points per first ray, exact duplicates — the join-assign
    // path must produce the same assign-then-prune outcome
    val cents = (1L to 1200L)
      .map(c => (c, Seq(1.0, c.toDouble / 1200.0, 0.0))).toDF("cluster", "centroid")
    val corpus = Seq(
      (1L, Seq(1.0, 1.0 / 1200.0, 0.0)), (2L, Seq(1.0, 1.0 / 1200.0, 0.0)))
      .toDF("id", "vec")
    val out = Dedup.semanticDedup(corpus, "id", "vec", cents, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)))
    spark.catalog.clearCache()
  }

  test("semanticDedup rung 3: ANN assignment past annKCap matches the exact rungs") {
    val sp = spark; import sp.implicits._
    // 8 well-separated axis centroids; every corpus vector EQUALS one
    // centroid (cos = 1.0 with its true cell), so the IVF probe's top
    // cell is the true centroid's own cell and rung 3's assignment is
    // deterministic-equal to rung 1's even at nprobe < nlist. Lowered
    // caps force the rung: kProbe = 8 > annKCap = 4 rides assignByAnn
    // (nlist = max(16, ceil(sqrt(8))) = 16 >= k, every centroid its own
    // coarse cell).
    val cents = (1L to 8L)
      .map(c => (c, (0 until 8).map(d => if (d == c - 1) 10.0 else 0.0)))
      .toDF("cluster", "centroid")
    val corpus = (1L to 16L)
      .map(i => (i, (0 until 8).map(d => if (d == ((i - 1) % 8).toInt) 10.0 else 0.0)))
      .toDF("id", "vec")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    val viaAnn = key(Dedup.semanticDedup(corpus, "id", "vec", cents,
      threshold = 0.999, litKCap = 2, annKCap = 4))
    spark.catalog.clearCache()
    val viaLit = key(Dedup.semanticDedup(corpus, "id", "vec", cents, threshold = 0.999))
    assert(viaAnn == viaLit, s"rung 3 diverged from rung 1: $viaAnn vs $viaLit")
    // and the dedup outcome itself: ids 9..16 duplicate ids 1..8
    (1L to 8L).foreach(i => assert(viaAnn(i) == ((i, true, None))))
    (9L to 16L).foreach(i =>
      assert(viaAnn(i) == ((i - 8, false, Some(i - 8)))))
    spark.catalog.clearCache()
  }

  test("semanticDedup hot-cluster cap star-links instead of exploding") {
    val sp = spark; import sp.implicits._
    // 50 identical vectors in one cluster, cap 5: star pairs around the
    // min id still drop every non-min member, with 49 candidate pairs
    // instead of 1225.
    val corpus = (1L to 50L).map(i => (i, Seq(5.0, 1.0, 0.0))).toDF("id", "vec")
    val cents = Seq((1L, Seq(1.0, 0.0, 0.0))).toDF("cluster", "centroid")
    val out = Dedup.semanticDedup(corpus, "id", "vec", cents,
        threshold = 0.999, hotClusterCap = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && (2L to 50L).forall(!out(_)))
    spark.catalog.clearCache()
  }

  test("dedupLines keeps first occurrences in order, drops later repeats") {
    val sp = spark; import sp.implicits._
    val out = Seq("hdr\nbody a\nhdr\nbody b\nhdr\nbody a").toDF("text")
      .select(TextOps.dedupLines(col("text")).as("c")).collect()(0).getString(0)
    assert(out == "hdr\nbody a\nbody b")
  }

  test("gopherRules: each rule fires on its own planted violation") {
    val sp = spark; import sp.implicits._
    val good = (("the quick brown fox jumps with the energy of a dozen " +
      "that have come and gone to be first ") * 3).trim // 54 plain words
    val docs = Seq(
      (1L, good),
      (2L, "too short to pass"),                              // word_count
      (3L, good + " " + ("# " * 30).trim),                    // symbol_ratio
      (4L, good + "\n- a\n- b\n* c\n• d\n- e\n- f\n- g\n- h\n- i\n- j\n- k"), // bullet_lines
      (5L, ("0 1 2 3 4 5 6 7 8 9 " * 6).trim))                // alpha_words (+stop_words)
      .toDF("doc_id", "text")
    val out = TextOps.gopherRules(col("text"))
    val rows = docs.select(col("doc_id"), out.as("g")).select(col("doc_id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"), "the clean doc must pass every rule")
    assert(!rows(2L).getAs[Boolean]("word_count"))
    assert(!rows(3L).getAs[Boolean]("symbol_ratio") && rows(3L).getAs[Boolean]("word_count"))
    assert(!rows(4L).getAs[Boolean]("bullet_lines"))
    assert(!rows(5L).getAs[Boolean]("alpha_words") && !rows(5L).getAs[Boolean]("stop_words"))
    assert(Seq(2L, 3L, 4L, 5L).forall(i => !rows(i).getAs[Boolean]("keep")))
  }

  test("chunkOverlap: fixed-stride starts, truncated tail, full coverage") {
    val sp = spark; import sp.implicits._
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.chunkOverlap(doc, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    // starts 0,3,6,9 → t1-t4, t4-t7, t7-t10, t10
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out(0)._3 == "t1 t2 t3 t4" && out(1)._3 == "t4 t5 t6 t7" && out(3)._3 == "t10")
  }

  test("weighted sampling favors heavy weights and is partitioning-independent") {
    val sp = spark; import sp.implicits._
    // 50 heavy rows (w=500) vs 950 light rows (w=1): heavies should own
    // most of a k=20 draw; any light majority means weights are ignored
    val rows = (1L to 1000L).map(i => (i, if (i <= 50) 500L else 1L)).toDF("doc_id", "w")
    def draw(parts: Int) = graft.llm.Sampling.weightedSample(
        rows.repartition(parts, col("doc_id")), "doc_id", col("w"), k = 20, seed = 13)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    val a = draw(3)
    assert(a == draw(11), "same seed must draw the same sample at any partitioning")
    val heavies = a.count(_._2 == 500.0)
    assert(heavies >= 15, s"w=500 rows must dominate the draw, got $heavies/20")
    assert(a.map(_._3) == (1L to 20L).toList, "ranks must be 1..k")
  }

  test("bigram LM cross-entropy: hand-computed smoothing, oov, holdout") {
    val sp = spark; import sp.implicits._
    val ref = Seq((0L, "a b a b a"), (2L, "a b c")).toDF("doc_id", "text")
    // bigram counts: (a,b)=3, (b,a)=2, (b,c)=1; c1: a=3, b=3; V=3
    val score = Seq((1L, "a b z"), (3L, "")).toDF("doc_id", "text")
    val out = graft.llm.NgramLm.bigramCrossEntropy(score, "doc_id", "text", ref)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L), "empty docs have no bigram to score")
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") == 2)
    assert(r1.getAs[Long]("oov_bigrams") == 1, "(b,z) is unseen")
    def lp(c12: Long, c1: Long) =
      BigDecimal(math.log((c12 + 0.5) / (c1 + 0.5 * 3)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = (-(lp(3, 3) + lp(0, 3)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("xent") == expected)
  }

  test("containment: index path ≡ exact baseline; stop-prune only narrows") {
    val elems = TextOps.wordShingles(col("text"), 2)
    val hashed = transform(elems, e => xxhash64(e))
    def pairSet(df: DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.containmentPairsExact(docs, "doc_id", hashed, 0.9))
    // maxDf above the corpus size: the prune cannot fire, recall is exact
    val full = pairSet(Dedup.containmentPairs(docs, "doc_id", elems, 0.9,
      maxDf = 100000))
    assert(exact.nonEmpty, "test corpus should contain >=1 containment pair")
    assert(full == exact, s"index path diverged: missing ${exact -- full}, " +
      s"extra ${full -- exact}")
    // a small doc fully inside a big one is containment's reason to exist:
    // verify at least one emitted pair sits BELOW the jaccard threshold
    val jac = pairSet(Dedup.jaccardPairs(docs, "doc_id", hashed, 0.9))
    assert(jac.subsetOf(exact), "jaccard >= t implies containment >= t")
    // aggressive stop-prune: still precise (verify is exact), never wider
    val pruned = pairSet(Dedup.containmentPairs(docs, "doc_id", elems, 0.9,
      maxDf = 5))
    assert(pruned.subsetOf(exact), "stop-prune may narrow recall, not precision")
  }

  test("incremental dedup: batch-only rows, exact layer, near recall") {
    val d = docs
    val corpus = d.filter(col("doc_id") < 25)
    val batch = d.filter(col("doc_id") >= 25)
    val elems = TextOps.wordShingles(col("text"), 2)
    val out = Dedup.incremental(batch, corpus, "doc_id", col("text"), elems,
        k = 64, bands = 16, threshold = 0.9)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == batchIds, "one row per batch doc, no corpus rows")
    // exact layer vs a direct text join
    val expectExact = batch.select(col("doc_id"), col("text"))
      .join(corpus.select(col("text"), col("doc_id").as("cid")), "text")
      .groupBy("doc_id").agg(min("cid").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.collect { case (id, Some(e), _) => id -> e }.toMap == expectExact)
    // near layer: every id the operator points at must be a true >=0.9
    // jaccard corpus neighbor, and the MIN such neighbor (exhaustive check
    // against the quadratic cross baseline)
    val hashed = transform(elems, e => xxhash64(e))
    val b = batch.select(col("doc_id").as("id_b"), hashed.as("eb"))
    val c = corpus.select(col("doc_id").as("id_c"), hashed.as("ec"))
    val expectNear = b.crossJoin(c)
      .filter(TextOps.jaccard(col("eb"), col("ec")) >= 0.9)
      .groupBy("id_b").agg(min("id_c").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotNear = out.collect { case (id, _, Some(n)) => id -> n }.toMap
    assert(gotNear == expectNear,
      s"missing ${expectNear.toSet -- gotNear.toSet}, extra ${gotNear.toSet -- expectNear.toSet}")
    assert(expectNear.nonEmpty, "slice should contain >=1 cross near-dup")
  }

  test("perplexity buckets: cut path agrees with rank path off-boundary") {
    val sp = spark; import sp.implicits._
    val frame = (1 to 90).map(i => (i.toLong, "s" + (i % 3), i.toDouble))
      .toDF("id", "cls", "xent")
    val exact = graft.llm.NgramLm
      .perplexityBucketsExact(frame, "id", "cls", "xent")
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cuts = graft.llm.NgramLm.perplexityBucketsByCuts(frame, "cls", "xent")
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // distinct xent per class and n divisible by 3: the two tiers agree
    // everywhere except possibly AT an interpolated cut — on this frame
    // percentile lands between ranks, so assignment must be identical
    assert(exact == cuts, s"diverged at ${exact.toSet -- cuts.toSet}")
    // rank tier: each class splits 10/10/10
    val sizes = graft.llm.NgramLm.perplexityBucketsExact(frame, "id", "cls", "xent")
      .groupBy("cls", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sizes.values.forall(_ == 10), s"uneven terciles: $sizes")
    // monotonicity inside a class: max(head) < min(middle) < ... by xent
    val byBucket = graft.llm.NgramLm.perplexityBucketsExact(frame, "id", "cls", "xent")
      .filter(col("cls") === "s0")
      .collect().map(r => r.getAs[String]("bucket") -> r.getAs[Double]("xent"))
    def maxOf(b: String) = byBucket.filter(_._1 == b).map(_._2).max
    def minOf(b: String) = byBucket.filter(_._1 == b).map(_._2).min
    assert(maxOf("head") < minOf("middle") && maxOf("middle") < minOf("tail"))
  }
}
