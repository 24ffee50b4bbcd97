package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Bpe

/** BPE trainer/encoder properties the oracle replay can't see: the
  * left-to-right non-overlapping merge semantics on adversarial words,
  * the classic textbook training vector, partitioning independence, and
  * the zero-shuffle encode plan.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def onWord(word: String, merges: Seq[(String, String)]): String = {
    val sp = spark; import sp.implicits._
    Seq(word).toDF("w")
      .select(Bpe.encodeWord(col("w"), merges).as("s"))
      .collect()(0).getString(0)
  }

  test("merge application is left-to-right non-overlapping (greedy), like reference BPE") {
    // "aaa" under (a,a): first two symbols merge, the third survives
    assert(onWord("aaa", Seq(("a", "a"))) == "aa a _")
    // consecutive shared-boundary occurrences BOTH merge
    assert(onWord("abab", Seq(("a", "b"))) == "ab ab _")
    // merged symbols participate in later merges
    assert(onWord("abab", Seq(("a", "b"), ("ab", "ab"))) == "abab _")
    // end-of-word marker merges too
    assert(onWord("ab", Seq(("a", "b"), ("ab", "_"))) == "ab_")
  }

  test("train reproduces the textbook low/lower/newest merges") {
    val sp = spark; import sp.implicits._
    // Sennrich-style toy corpus: low ×5, lower ×2, newest ×6, widest ×3
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, "text", 4)
    // est appears in newest+widest (9 words): e s → es (9), es t → est (9),
    // est _ → est_ (9) dominate; tie-breaks are count DESC then pair ASC
    assert(merges.map(_.pair).take(3) == Seq("e s", "es t", "est _"))
    assert(merges.take(3).forall(_.cnt == 9L))
  }

  test("training is partitioning-independent") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val a = Bpe.train(docs.repartition(1), "text", 4)
    val b = Bpe.train(docs.repartition(13), "text", 4)
    assert(a == b)
  }

  test("encode plan is map-only: zero Exchange nodes") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val plan = Bpe.encodeTokenCounts(docs, "doc_id", "text",
      Seq(("e r", "er"), ("er _", "er_"))).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty, s"expected no shuffle, found: $exchanges")
  }

  test("join-based vocabulary encoder is byte-equal to the literal fold on trained merges") {
    val sp = spark; import sp.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val learned = Bpe.train(docs, "text", 8)
    val mergesDf = learned.map(m => (m.rank, m.pair)).toDF("rank", "pair")
    val asPairs = learned.map(m => { val Array(l, r) = m.pair.split(" ", 2); (l, r) })
    val vocab = Bpe.wordFreqs(docs, "text").select("word")
    val literal = vocab
      .select(col("word"), Bpe.encodeWord(col("word"), asPairs).as("syms"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val joined = Bpe.encodeVocab(vocab, mergesDf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(joined.keySet == literal.keySet)
    val diffs = literal.collect { case (w, s) if joined(w) != s => (w, s, joined(w)) }
    assert(diffs.isEmpty, s"joined encoder diverged from literal fold on: ${diffs.take(5)}")
  }

  test("join-based encoder handles the adversarial greedy cases like the literal fold") {
    val sp = spark; import sp.implicits._
    // the same cases the literal-fold test pins, plus a no-merge word
    val cases = Seq(
      ("aaa", Seq(("a", "a"))),
      ("abab", Seq(("a", "b"), ("ab", "ab"))),
      ("ab", Seq(("a", "b"), ("ab", "_"))),
      ("zq", Seq(("a", "b"))))
    cases.foreach { case (word, merges) =>
      val mergesDf = merges.zipWithIndex
        .map { case ((l, r), i) => ((i + 1).toLong, s"$l $r") }.toDF("rank", "pair")
      val got = Bpe.encodeVocab(Seq(word).toDF("word"), mergesDf)
        .collect()(0).getString(1)
      assert(got == onWord(word, merges), s"word=$word merges=$merges")
    }
  }

  test("encodeTokenCountsJoined matches encodeTokenCounts, including zero-word documents") {
    val sp = spark; import sp.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "12345 ??? 678")).toDF("doc_id", "text")) // no encodable word
    val learned = Bpe.train(docs, "text", 6)
    val mergesDf = learned.map(m => (m.rank, m.pair)).toDF("rank", "pair")
    val asPairs = learned.map(m => { val Array(l, r) = m.pair.split(" ", 2); (l, r) })
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lit_ = key(Bpe.encodeTokenCounts(docs, "doc_id", "text", asPairs))
    val join_ = key(Bpe.encodeTokenCountsJoined(docs, "doc_id", "text", mergesDf))
    assert(lit_ == join_)
    assert(lit_.exists { case (id, w, t) => id == 900001L && w == 0L && t == 0L })
  }

  test("each merge is monotonic: token counts never increase, and strictly drop where the pair occurs") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val learned = Bpe.train(docs, "text", 4)
      .map(m => { val Array(l, r) = m.pair.split(" ", 2); (l, r) })
    def total(merges: Seq[(String, String)]): Long =
      Bpe.encodeTokenCounts(docs, "doc_id", "text", merges)
        .agg(sum("n_tokens")).collect()(0).getLong(0)
    val counts = (0 to learned.size).map(i => total(learned.take(i)))
    assert(counts.sliding(2).forall { case Seq(a, b) => b < a },
      s"each learned merge must strictly reduce the corpus token count: $counts")
  }
}
