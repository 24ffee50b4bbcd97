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
