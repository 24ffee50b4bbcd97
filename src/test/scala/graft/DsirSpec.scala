package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Dsir

/** Hand-computed DSIR vectors (bucket hash, smoothed log-ratio, importance
  * weight), the decimal-scale regression the oracle caught (a 45-digit
  * product silently trims scale 9 → 6), partitioning independence of the
  * weighted sum, and the top-k plan shape.
  */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("bucketOf is the positional char-code hash mod nBuckets") {
    val sp = spark; import sp.implicits._
    val df = Seq("ab", "", "zz").toDF("w")
      .select(Dsir.bucketOf(col("w"), 1024).as("b"))
    // "ab" = 97·1 + 98·2 = 293; "" = empty sum = 0; "zz" = 122·1+122·2 = 366
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(293L, 0L, 366L))
  }

  test("featureBuckets = unigram buckets ++ (b1·31 + b2) mod B bigram buckets") {
    val sp = spark; import sp.implicits._
    val bs = Seq("ab ab").toDF("t")
      .select(Dsir.featureBuckets(col("t"), 1024).as("bs"))
      .collect().head.getSeq[Long](0)
    // unigrams [293, 293]; bigram (293·31 + 293) mod 1024 = 9376 mod 1024 = 160
    assert(bs == Seq(293L, 293L, 160L))
  }

  test("logRatios matches the smoothed two-model formula on planted counts") {
    val sp = spark; import sp.implicits._
    // nBuckets=4, single-char words with codepoint mod 4 as the bucket.
    // target: "d d" → bucket 0 twice (100·1 mod 4 = 0). raw: "d e" →
    // buckets 0 and 1. tp=2, tq=2 (unigrams) + 1 bigram each side.
    val target = Seq((1L, "d d")).toDF("doc_id", "text")
    val raw = Seq((1L, "d e")).toDF("doc_id", "text")
    val r = Dsir.logRatios(target, raw, "text", 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // target features: u=[0,0], bigram (0·31+0)%4=0 → counts {0:3}, tp=3
    // raw features: u=[0,1], bigram (0·31+1)%4=1 → counts {0:1, 1:2}, tq=3
    val a = 0.5; val ab = a * 4
    def lr(cp: Long, cq: Long): Double =
      math.log((cp + a) / (3 + ab)) - math.log((cq + a) / (3 + ab))
    assert(math.abs(r(0L) - BigDecimal(lr(3, 1)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(math.abs(r(1L) - BigDecimal(lr(0, 2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("logw is the exact decimal sum of c·lr — the 38-digit trim regression") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en" && col("doc_id") % 2 === 0)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", target)
    // Recompute one document's weight exactly on the driver from the SAME
    // rounded lr table. If the aggregate's product had been trimmed to
    // scale 6 (the decimal(24,9) × bigint overflow), per-product rounding
    // accumulates to ~1e-6·n_feats and this equality fails.
    val lrMap = Dsir.logRatios(target, docs, "text", 1024)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    val feats = docs.filter(length(col("text")) > 0)
      .filter(col("doc_id") === 1)
      .select(explode(Dsir.featureBuckets(col("text"), 1024)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = feats.map { case (b, c) => lrMap(b) * c }.sum
    val expected = BigDecimal(exact.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = w.filter(col("id") === 1).collect().head.getDouble(2)
    assert(got == expected, s"logw $got != exact-decimal $expected")
  }

  test("importanceWeights is partitioning-independent (bit-identical at 1 and 13)") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      Dsir.importanceWeights(d, "doc_id", "text",
          target = d.filter(col("lang") === "en" && col("doc_id") % 2 === 0))
        .orderBy("id").collect().toSeq
    }
    assert(run(1) == run(13))
  }

  test("selectTopK plans a global top-k, not a full sort") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      target = docs.filter(col("lang") === "en"))
    val sel = Dsir.selectTopK(w, 10)
    val phys = sel.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$phys")
    // ties broken by id: the boundary is deterministic
    val ids = sel.collect().map(_.getLong(0)).toSeq
    assert(ids.size == 10 && ids.distinct.size == 10)
  }
}
