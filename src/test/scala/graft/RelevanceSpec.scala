package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Relevance

/** Hand-computed BM25/TF-IDF vectors plus the distribution properties the
  * oracle can't see: partitioning independence and the inverted-index
  * filter placement (the `isin` must sit below the posting shuffle).
  */
class RelevanceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def tinyCorpus = {
    val sp = spark; import sp.implicits._
    Seq((1L, "cat sat"), (2L, "cat cat dog"), (3L, "bird"))
      .toDF("doc_id", "text")
  }

  test("bm25Search matches the hand-computed score on a 3-doc corpus") {
    // N=3, avgdl=2. doc1 'cat sat': tf(cat)=1, dl=2 ⇒ denom = 1 + 1.2·(0.25
    // + 0.75·2/2) = 2.2 = tf·(k1+1) ⇒ contribution is exactly idf(cat) =
    // ln(1 + (3−2+0.5)/(2+0.5)) = ln(1.6).
    val out = Relevance.bm25Search(tinyCorpus, "doc_id", "text",
      Seq("cat", "bird"), topK = 10).collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(byId(1L) - math.log(1.6)) < 1e-6)
    // doc3 'bird': tf=1, dl=1 ⇒ denom = 1 + 1.2·(0.25+0.375) = 1.75;
    // idf(bird) = ln(1 + 2.5/1.5)
    val expected3 = math.log(1.0 + 2.5 / 1.5) * 2.2 / 1.75
    assert(math.abs(byId(3L) - expected3) < 1e-6)
    // matched_terms: each doc matches exactly one query term
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("rare terms dominate: every doc containing the df=5% token outranks the rest") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val top = Relevance.bm25Search(docs, "doc_id", "text",
      Seq("dup", "join"), topK = 500).collect()
    val dupDocs = docs.filter(array_contains(split(lower(col("text")), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dupDocs.nonEmpty)
    val scores = top.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val worstDup = dupDocs.map(scores).min
    val bestRest = (scores.keySet -- dupDocs).map(scores).max
    assert(worstDup > bestRest,
      s"a dup-bearing doc ($worstDup) should outscore every non-dup doc ($bestRest)")
  }

  test("tfIdf is partitioning-independent (bit-identical at 1 and 13 partitions)") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def run(parts: Int) =
      Relevance.tfIdf(docs.repartition(parts), "doc_id", "text")
        .orderBy("doc_id", "term").collect().toSeq
    assert(run(1) == run(13))
  }

  test("bm25 posting filter sits below the aggregate (pre-shuffle), not above it") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val plan = Relevance.bm25Search(docs, "doc_id", "text", Seq("dup"))
      .queryExecution.optimizedPlan
    // the term IN-filter must apply to the exploded generator output
    // BEFORE any Aggregate node consumes it
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan}
    def found(p: LogicalPlan): Boolean = p match {
      case Filter(cond, child: Generate)
        if cond.references.exists(_.name == "term") => true
      case other => other.children.exists(found)
    }
    assert(found(plan), "expected Filter(term IN …) directly over the Generate")
  }

  test("rrfFuse sums 1/(k+rank) across lists; coverage counts lists, not rows") {
    val sp = spark; import sp.implicits._
    val listA = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val listB = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = Relevance.rrfFuse(Seq(listA, listB), "doc_id", rrfK = 60)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def c(rank: Int): BigDecimal =
      BigDecimal(1.0 / (60 + rank)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def s6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L) == ((1L, s6(c(1)))))
    assert(out(20L) == ((2L, s6(c(2) + c(1)))), "both lists contribute to doc 20")
    assert(out(30L) == ((1L, s6(c(3)))))
    assert(out(40L) == ((1L, s6(c(2)))))
  }
}
