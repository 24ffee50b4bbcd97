package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Behavior specs for the custom aggregates — the properties the DuckDB
  * oracle cannot check: HLL error bounds at scale, invariance of results
  * under partitioning (the distributed-correctness property), and
  * serialization through Spark's partial/final aggregation path.
  */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
    spark.range(0, 100000).createOrReplaceTempView("r100k")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("hll exact at small cardinality, near-exact in linear-counting range") {
    assert(one("SELECT cardinality(approx_set(id % 50)) FROM r100k") == 50L)
    val est700 = one("SELECT cardinality(approx_set(id % 700)) FROM r100k").asInstanceOf[Long]
    assert(math.abs(est700 - 700L) <= 14, s"estimate $est700")  // ±2%
  }

  test("hll error within 5% at 100k distinct") {
    val est = one("SELECT cardinality(approx_set(id)) FROM r100k").asInstanceOf[Long]
    assert(math.abs(est - 100000L) < 5000, s"estimate $est")
  }

  test("hll merge equals direct sketch") {
    val direct = one("SELECT cardinality(approx_set(id % 3000)) FROM r100k")
    val merged = one(
      """SELECT cardinality(merge(s)) FROM
        |  (SELECT id % 7 AS g, approx_set(id % 3000) AS s FROM r100k GROUP BY id % 7)""".stripMargin)
    assert(direct == merged)
  }

  test("hll survives repartitioning (partial/final serialization)") {
    val a = one("SELECT cardinality(approx_set(id % 1234)) FROM r100k")
    val df = spark.table("r100k").repartition(13)
    df.createOrReplaceTempView("r100k_rep")
    val b = one("SELECT cardinality(approx_set(id % 1234)) FROM r100k_rep")
    assert(a == b, s"$a vs $b")
    assert(math.abs(a.asInstanceOf[Long] - 1234L) <= 25)
  }

  private def bytes(sql: String): Seq[Byte] =
    one(sql).asInstanceOf[Array[Byte]].toSeq

  test("checksum is order- and partitioning-independent") {
    val a = bytes("SELECT checksum(id) FROM r100k")
    spark.table("r100k").repartition(17).createOrReplaceTempView("r100k_17")
    val b = bytes("SELECT checksum(id) FROM r100k_17")
    spark.table("r100k").orderBy(org.apache.spark.sql.functions.col("id").desc)
      .createOrReplaceTempView("r100k_desc")
    val c = bytes("SELECT checksum(id) FROM r100k_desc")
    assert(a == b && b == c && a.length == 8)
  }

  test("checksum detects content difference") {
    val a = bytes("SELECT checksum(id) FROM r100k")
    val d = bytes("SELECT checksum(id + 1) FROM r100k")
    assert(a != d)
  }

  test("checksum is the WRAPPING 64-bit sum of per-row xxhash64 (reference algebra)") {
    // closed form: exact decimal sum of the row hashes, reduced mod 2^64,
    // mapped into signed-long range, big-endian bytes
    val exact = one("SELECT SUM(CAST(xxhash64(id) AS DECIMAL(38,0))) FROM r100k")
      .asInstanceOf[java.math.BigDecimal].toBigInteger
    val wrapped = exact.mod(java.math.BigInteger.ONE.shiftLeft(64))
    val asLong = wrapped.longValue() // truncating BigInteger→long IS the 2^64 wrap
    val expect = java.nio.ByteBuffer.allocate(8).putLong(asLong).array().toSeq
    assert(bytes("SELECT checksum(id) FROM r100k") == expect)
  }

  test("histogram matches groupBy counts through a shuffle") {
    val m = one(
      "SELECT histogram(id % 5) FROM (SELECT id FROM r100k DISTRIBUTE BY id % 11)")
      .asInstanceOf[Map[Long, Long]]
    assert(m == Map(0L -> 20000L, 1L -> 20000L, 2L -> 20000L, 3L -> 20000L, 4L -> 20000L))
  }

  test("map_union first-wins and multimap collects all") {
    val mu = one(
      """SELECT map_union(map(CAST(id % 2 AS STRING), id)) FROM
        |  (SELECT id FROM r100k WHERE id < 4)""".stripMargin)
      .asInstanceOf[Map[String, Long]]
    assert(mu.keySet == Set("0", "1"))
    val mm = one(
      """SELECT multimap_agg(CAST(id % 2 AS STRING), id) FROM
        |  (SELECT id FROM r100k WHERE id < 4)""".stripMargin)
      .asInstanceOf[Map[String, scala.collection.Seq[Long]]]
    assert(mm("0").sorted == Seq(0L, 2L) && mm("1").sorted == Seq(1L, 3L))
  }

  test("min_by/max_by n-variants") {
    val top = one("SELECT max_by(id, id % 100, 2) FROM (SELECT id FROM r100k WHERE id < 200)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(top.forall(v => v % 100 == 99))
    val bottom = one("SELECT min_by(id, id, 3) FROM r100k")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(bottom == Seq(0L, 1L, 2L))
    // bounded-heap state survives shuffle merge and strings order correctly
    val names = one("SELECT max_by(CAST(id AS STRING), id, 3) FROM " +
      "(SELECT id FROM r100k DISTRIBUTE BY id % 13)")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(names == Seq("99999", "99998", "99997"))
  }

  test("array_agg keeps nulls") {
    val got = one("SELECT array_agg(NULLIF(id % 3, 1)) FROM (SELECT id FROM r100k WHERE id < 5)")
      .asInstanceOf[scala.collection.Seq[Any]]
    assert(got.size == 5 && got.count(_ == null) == 2)
  }

  test("qdigest quantiles within tolerance on uniform data") {
    val med = one("SELECT value_at_quantile(qdigest_agg(CAST(id AS DOUBLE)), 0.5) FROM r100k")
      .asInstanceOf[Double]
    assert(math.abs(med - 50000.0) < 2500, s"median $med")
    val p99 = one("SELECT value_at_quantile(qdigest_agg(CAST(id AS DOUBLE)), 0.99) FROM r100k")
      .asInstanceOf[Double]
    assert(math.abs(p99 - 99000.0) < 2500, s"p99 $p99")
    val qv = one("SELECT quantile_at_value(qdigest_agg(CAST(id AS DOUBLE)), 25000.0) FROM r100k")
      .asInstanceOf[Double]
    assert(math.abs(qv - 0.25) < 0.03, s"quantile_at_value $qv")
    val multi = one("SELECT values_at_quantiles(qdigest_agg(CAST(id AS DOUBLE)), array(0.1, 0.9)) FROM r100k")
      .asInstanceOf[scala.collection.Seq[Double]]
    assert(multi.length == 2 && multi(0) < multi(1))
  }

  test("qdigest two-level merge approximates direct sketch") {
    val direct = one("SELECT value_at_quantile(qdigest_agg(CAST(id AS DOUBLE)), 0.5) FROM r100k")
      .asInstanceOf[Double]
    val merged = one(
      """SELECT value_at_quantile(merge(s), 0.5) FROM
        |  (SELECT id % 7 AS g, qdigest_agg(CAST(id AS DOUBLE)) AS s FROM r100k GROUP BY id % 7)""".stripMargin)
      .asInstanceOf[Double]
    assert(math.abs(direct - merged) < 5000, s"direct $direct merged $merged")
  }

  test("merge still unions hll sketches after qdigest generalization") {
    val merged = one(
      """SELECT cardinality(merge(s)) FROM
        |  (SELECT id % 5 AS g, approx_set(id % 777) AS s FROM r100k GROUP BY id % 5)""".stripMargin)
      .asInstanceOf[Long]
    assert(math.abs(merged - 777L) <= 16)
  }

  test("reduce_agg folds with user lambda") {
    assert(one("SELECT reduce_agg(id, CAST(0 AS BIGINT), (a, b) -> a + b, (a, b) -> a + b) " +
      "FROM (SELECT id FROM r100k WHERE id < 100)") == 4950L)
  }

  test("reduce_agg combine lambda runs on merge (distinct from input lambda)") {
    // 4 explicit partitions → 4 initialized partial states → exactly 3
    // combines in the final merge; the +1000000 marker in combineFn (and
    // NOT in inputFn) is therefore applied exactly 3 times. This fails on
    // any implementation that collects the group and ignores combineFn.
    spark.range(0, 40, 1, 4).createOrReplaceTempView("r40p4")
    val got = one(
      "SELECT reduce_agg(id, CAST(0 AS BIGINT), (a, b) -> a + b, (a, b) -> a + b + 1000000) FROM r40p4")
    assert(got == 780L + 3000000L, s"got $got")
  }

  test("reduce_agg state is O(1): group size far beyond any collect buffer") {
    assert(one("SELECT reduce_agg(id, CAST(0 AS BIGINT), (a, b) -> a + b, (a, b) -> a + b) FROM r100k")
      == 4999950000L)
  }

  test("reduce_agg with non-numeric state (string fold) and empty-input null") {
    val s = one("SELECT reduce_agg(CAST(id AS STRING), '', (a, b) -> concat(a, b), (a, b) -> concat(a, b)) " +
      "FROM (SELECT id FROM r100k WHERE id < 4 ORDER BY id) t").asInstanceOf[String]
    assert(s.sorted == "0123", s"got $s")
    assert(one("SELECT reduce_agg(id, CAST(0 AS BIGINT), (a, b) -> a + b, (a, b) -> a + b) " +
      "FROM r100k WHERE id < 0") == null)
  }

  // ---- setdigest (reference type/setdigest/SetDigestFunctions.java) ----

  test("setdigest exact below saturation: cardinality, jaccard, intersection") {
    assert(one("SELECT cardinality(make_set_digest(id % 500)) FROM r100k") == 500L)
    // A = {0..499}, B = {250..749}: |A∩B| = 250, |A∪B| = 750
    val row = spark.sql(
      """SELECT jaccard_index(a.d, b.d) AS j, intersection_cardinality(a.d, b.d) AS i
        |FROM (SELECT make_set_digest(id % 500) AS d FROM r100k) a,
        |     (SELECT make_set_digest(id % 500 + 250) AS d FROM r100k) b""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - 250.0 / 750.0) < 1e-12, s"jaccard ${row.getDouble(0)}")
    assert(row.getLong(1) == 250L)
  }

  test("setdigest KMV estimate within 5% at 100k distinct (saturated)") {
    val est = one("SELECT cardinality(make_set_digest(id)) FROM r100k").asInstanceOf[Long]
    assert(math.abs(est - 100000L) < 5000, s"estimate $est")
  }

  test("setdigest saturated jaccard within 0.05 of truth") {
    // A = {0..49999}, B = {25000..74999}: true J = 25000/75000 = 1/3
    val j = one(
      """SELECT jaccard_index(a.d, b.d)
        |FROM (SELECT make_set_digest(id) AS d FROM r100k WHERE id < 50000) a,
        |     (SELECT make_set_digest(id + 25000) AS d FROM r100k WHERE id < 50000) b""".stripMargin)
      .asInstanceOf[Double]
    assert(math.abs(j - 1.0 / 3.0) < 0.05, s"jaccard $j")
  }

  test("setdigest merge equals direct digest and survives repartitioning") {
    val direct = one("SELECT cardinality(make_set_digest(id % 3000)) FROM r100k")
    val merged = one(
      """SELECT cardinality(merge(s)) FROM
        |  (SELECT id % 7 AS g, make_set_digest(id % 3000) AS s FROM r100k GROUP BY id % 7)""".stripMargin)
    assert(direct == merged)
    spark.table("r100k").repartition(13).createOrReplaceTempView("r100k_sd_rep")
    assert(one("SELECT cardinality(make_set_digest(id % 3000)) FROM r100k_sd_rep") == direct)
  }

  test("setdigest hash_counts tracks multiplicities") {
    val m = one("SELECT hash_counts(make_set_digest(id % 4)) FROM r100k")
      .asInstanceOf[scala.collection.Map[Long, Int]]
    assert(m.size == 4)
    assert(m.values.forall(_ == 25000), s"counts ${m.values.toSeq}")
  }

  test("merge rejects mixed sketch families") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT merge(s) FROM (
          |  SELECT approx_set(id) AS s FROM r100k WHERE id < 10
          |  UNION ALL
          |  SELECT make_set_digest(id) AS s FROM r100k WHERE id < 10)""".stripMargin).collect()
    }
    assert(e.getMessage != null)
  }

  test("approx_most_frequent exact below saturation, any partitioning") {
    // 200 distinct keys, capacity 256: no partial can evict, so the top-10
    // must equal the exact GROUP BY top-10 even across forced merges
    spark.sql("SELECT id, CAST(id % 200 AS STRING) AS k FROM r100k")
      .repartition(13).createOrReplaceTempView("amf_in")
    val got = spark.sql(
      "SELECT map_entries(approx_most_frequent(10, k, 256)) FROM amf_in")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = spark.sql(
      """SELECT k, COUNT(*) AS n FROM amf_in GROUP BY k
        |ORDER BY n DESC, k ASC LIMIT 10""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact, s"got $got")
  }

  test("approx_most_frequent retains zipfian heavy hitters under eviction") {
    // zipf-ish stream: key j appears ~100000/(j+1) times, 1000 distinct,
    // capacity 64 << 1000 so eviction is constant; the guarantees under
    // test: estimate >= true count (SpaceSaving never undercounts) and
    // the undisputed heavy hitters survive
    spark.range(0, 100000).selectExpr(
        "CAST(CAST(floor(100000 / (id + 1)) AS INT) % 1000 AS STRING) AS k")
      .repartition(5).createOrReplaceTempView("amf_zipf")
    val got = spark.sql(
      "SELECT map_entries(approx_most_frequent(5, k, 64)) FROM amf_zipf")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = spark.sql(
      """SELECT k, COUNT(*) AS n FROM amf_zipf GROUP BY k
        |ORDER BY n DESC LIMIT 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    exact.foreach { case (k, n) =>
      assert(got.contains(k), s"heavy hitter $k lost (exact count $n, got $got)")
      assert(got(k) >= n, s"$k undercounted: ${got(k)} < $n")
      assert(got(k) <= n + 100000L / 64 * 5, s"$k overshoot beyond bound: ${got(k)} vs $n")
    }
  }

  test("approx_most_frequent deterministic under eviction with tied counts") {
    // The regime the trim tie-break exists for: capacity 64 << 1000
    // distinct keys and a long tail of keys sharing the SAME count, so the
    // post-merge trim must cut within an equal-count cohort. Which keys
    // survive must be a function of the data (count desc, key asc) — never
    // of HashMap iteration order — so two evaluations of the same plan
    // must agree entry-for-entry, including entry order.
    spark.range(0, 30000).selectExpr(
        "CAST(CASE WHEN id % 3 = 0 THEN id % 10 ELSE 10 + id % 1000 END AS STRING) AS k")
      .repartition(7).createOrReplaceTempView("amf_ties")
    def run(): Seq[(String, Long)] = spark.sql(
      "SELECT map_entries(approx_most_frequent(20, k, 64)) FROM amf_ties")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val a = run()
    val b = run()
    assert(a == b, s"eviction-regime output varied across runs:\n$a\n$b")
    assert(a.nonEmpty && a.size <= 20)
  }
}
