package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DDL/DML surface parity (SURVEY.md §3 — the reference executes these as
  * coordinator-side tasks, execution/<Verb><Object>Task.java, 32 files):
  * CREATE TABLE (+AS), INSERT, CREATE/DROP VIEW, DESCRIBE, SHOW, EXPLAIN,
  * ANALYZE ... COMPUTE STATISTICS, DELETE-equivalent (overwrite), and
  * session properties (SET ≈ spark.conf). All statements run against a
  * session-local warehouse + in-process metastore.
  */
class DdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // getOrCreate may reuse a session built by an earlier suite in this
    // JVM, silently dropping builder confs — set the dynamic ones directly
    spark.conf.set("spark.sql.cbo.enabled", "true")
    Tables.ensure(spark, "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CREATE TABLE AS SELECT + INSERT INTO + SELECT back") {
    spark.sql("DROP TABLE IF EXISTS t_nation_copy")
    spark.sql(
      """CREATE TABLE t_nation_copy USING parquet AS
        |SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 10""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM t_nation_copy").collect()(0).getLong(0) == 10)
    spark.sql("INSERT INTO t_nation_copy VALUES (99, 'NEWLAND', 0)")
    assert(spark.sql("SELECT COUNT(*) FROM t_nation_copy").collect()(0).getLong(0) == 11)
    spark.sql("INSERT OVERWRITE t_nation_copy SELECT n_nationkey, n_name, n_regionkey FROM nation")
    assert(spark.sql("SELECT COUNT(*) FROM t_nation_copy").collect()(0).getLong(0) == 25)
  }

  test("CREATE VIEW / DROP VIEW") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW v_big_orders AS " +
      "SELECT * FROM orders WHERE o_totalprice > 300000")
    val n = spark.sql("SELECT COUNT(*) FROM v_big_orders").collect()(0).getLong(0)
    assert(n > 0)
    spark.sql("DROP VIEW v_big_orders")
    intercept[Exception](spark.sql("SELECT * FROM v_big_orders").collect())
  }

  test("catalog view lifecycle: CREATE OR REPLACE / SHOW CREATE TABLE / pushdown / DROP") {
    // the ddl_view_roundtrip companion: a PERMANENT (catalog) view — the
    // kind SHOW CREATE TABLE renders — whose body scans parquet paths
    // (Spark refuses permanent views over session-temp views)
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP VIEW IF EXISTS v_cat_orders")
    spark.sql(
      s"""CREATE OR REPLACE VIEW v_cat_orders AS
         |SELECT o_orderkey, o_custkey, o_totalprice
         |FROM parquet.`$dir/orders.parquet`""".stripMargin)
    // SHOW CREATE TABLE must render a re-runnable CREATE VIEW statement
    val ddl = spark.sql("SHOW CREATE TABLE v_cat_orders").collect()(0).getString(0)
    assert(ddl.contains("CREATE VIEW") && ddl.contains("v_cat_orders"),
      s"SHOW CREATE TABLE shape: $ddl")
    assert(ddl.contains("SELECT"), s"view text missing from: $ddl")
    // a predicate through the view must reach the parquet scan
    val plan = spark.sql("SELECT * FROM v_cat_orders WHERE o_custkey <= 10")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_custkey"),
      s"filter through the view did not push into the scan:\n$plan")
    // and the view recreates: REPLACE with a narrower body takes effect
    spark.sql(
      s"""CREATE OR REPLACE VIEW v_cat_orders AS
         |SELECT o_orderkey FROM parquet.`$dir/orders.parquet` WHERE o_orderkey <= 5""".stripMargin)
    assert(spark.sql("SELECT * FROM v_cat_orders").columns.toSeq == Seq("o_orderkey"))
    spark.sql("DROP VIEW v_cat_orders")
    intercept[Exception](spark.sql("SELECT * FROM v_cat_orders").collect())
  }

  test("DESCRIBE and SHOW surface") {
    val cols = spark.sql("DESCRIBE nation").collect().map(_.getString(0)).toSet
    assert(Set("n_nationkey", "n_name", "n_regionkey").subsetOf(cols))
    val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(tables.contains("nation") && tables.contains("lineitem"))
    val fns = spark.sql("SHOW FUNCTIONS LIKE 'strpos'").collect()
    assert(fns.nonEmpty, "registered compat function should be visible in SHOW FUNCTIONS")
  }

  test("EXPLAIN renders a physical plan") {
    val plan = spark.sql("EXPLAIN SELECT COUNT(*) FROM lineitem WHERE l_quantity > 10")
      .collect()(0).getString(0)
    assert(plan.contains("HashAggregate") || plan.contains("AdaptiveSparkPlan"))
  }

  test("ANALYZE TABLE computes stats that the optimizer can read") {
    spark.sql("DROP TABLE IF EXISTS t_stats")
    spark.sql("CREATE TABLE t_stats USING parquet AS SELECT * FROM customer")
    spark.sql("ANALYZE TABLE t_stats COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE t_stats COMPUTE STATISTICS FOR COLUMNS c_custkey, c_acctbal")
    spark.sql("REFRESH TABLE t_stats")
    val desc = spark.sql("DESCRIBE EXTENDED t_stats c_custkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("distinct_count").exists(_ != "NULL"))
    val nCustomers = spark.table("customer").count()
    val stats = spark.table("t_stats").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong == nCustomers))
  }

  test("bucketed join elides shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Engine.writeBucketed(spark.table("orders"), "b_orders", 4, Seq("o_orderkey"))
    Engine.writeBucketed(
      spark.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", 4, Seq("o_orderkey"))
    // co-located bucketed sides: sort-merge join without exchanges
    val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == spark.table("lineitem").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", adaptive)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted join equals plain join and spreads hot keys") {
    import org.apache.spark.sql.functions._
    val fact = spark.table("lineitem")
    val dim = spark.table("orders").select("o_orderkey", "o_orderpriority")
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey")).count()
    val salted = Engine.saltedJoin(
      fact.withColumnRenamed("l_orderkey", "o_orderkey"), dim,
      "o_orderkey", saltFactor = 8, saltBy = col("l_linenumber")).count()
    assert(salted == plain)
  }

  test("SET session properties round-trip") {
    spark.sql("SET spark.sql.shuffle.partitions=7")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    spark.sql("SET spark.sql.shuffle.partitions=2")
  }

  test("DELETE-equivalent: filtered INSERT OVERWRITE") {
    spark.sql("DROP TABLE IF EXISTS t_del")
    spark.sql("DROP TABLE IF EXISTS t_del_stage")
    spark.sql("CREATE TABLE t_del USING parquet AS SELECT * FROM supplier")
    // parquet tables have no row-level DELETE (DSv2 SupportsDelete needed);
    // the reference's DELETE maps to stage-then-overwrite-excluding-predicate
    val cutoff = spark.sql("SELECT CAST(AVG(s_suppkey) AS BIGINT) FROM t_del").collect()(0).getLong(0)
    spark.sql(s"CREATE TABLE t_del_stage USING parquet AS SELECT * FROM t_del WHERE s_suppkey > $cutoff")
    spark.sql("INSERT OVERWRITE t_del SELECT * FROM t_del_stage")
    assert(spark.sql("SELECT MIN(s_suppkey) FROM t_del").collect()(0).getLong(0) > cutoff)
  }

  test("EXPLAIN ANALYZE surfaces runtime metrics off the executed plan") {
    import org.apache.spark.sql.functions._
    val q = Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_orderkey") < 500)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
    val stats = ExplainAnalyze.run(q)

    // exact invariants the data pins down
    val expectFiltered = Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_orderkey") < 500).count()
    assert(ExplainAnalyze.first(stats, "Filter", "numOutputRows").contains(expectFiltered))
    val groups = q.count()
    assert(ExplainAnalyze.first(stats, "HashAggregate", "numOutputRows").contains(groups))

    // structural invariants: a shuffle happened and moved bytes; the scan
    // reported its own output; pre-order puts the final agg above the scan
    val shuffleBytes = stats.filter(_.metric == "shuffleBytesWritten").map(_.value)
    assert(shuffleBytes.nonEmpty && shuffleBytes.exists(_ > 0),
      s"expected a shuffle with bytes > 0 in:\n${stats.mkString("\n")}")
    val scanOrd = stats.collectFirst {
      case ExplainAnalyze.OpStat(o, op, "numOutputRows", _) if op.contains("Scan") => o }
    val aggOrd = stats.collectFirst {
      case ExplainAnalyze.OpStat(o, "HashAggregate", "numOutputRows", _) => o }
    assert(scanOrd.nonEmpty && aggOrd.nonEmpty && aggOrd.get < scanOrd.get,
      "final aggregate must sit above the scan in pre-order")
  }

  test("catalog table lifecycle: ALTER TABLE RENAME / COMMENT ON / DROP (the native-DDL audit claims)") {
    // locks the README statement-family audit rows that claim Spark-native
    // support for the reference's ALTER TABLE RENAME TO (SqlBase.g4:52)
    // and COMMENT ON TABLE (SqlBase.g4:53)
    spark.sql("DROP TABLE IF EXISTS t_lifecycle")
    spark.sql("DROP TABLE IF EXISTS t_lifecycle2")
    spark.sql("CREATE TABLE t_lifecycle USING parquet AS SELECT 1 AS a, 'x' AS b")
    spark.sql("COMMENT ON TABLE t_lifecycle IS 'graft lifecycle probe'")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED t_lifecycle").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Comment").exists(_.contains("graft lifecycle probe")),
      "COMMENT ON TABLE must land in the catalog")
    spark.sql("ALTER TABLE t_lifecycle RENAME TO t_lifecycle2")
    assert(spark.sql("SELECT a FROM t_lifecycle2").collect()(0).getInt(0) == 1)
    intercept[Exception](spark.sql("SELECT * FROM t_lifecycle").collect())
    spark.sql("DROP TABLE t_lifecycle2")
    intercept[Exception](spark.sql("SELECT * FROM t_lifecycle2").collect())
  }
}
