package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Dialect-shim spec: Presto-surface SQL texts run unmodified through
  * PrestoSql.sql against the graft registry.
  */
class PrestoSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("double-quoted identifiers") {
    assert(PrestoSql.translate("SELECT \"n_name\" FROM nation")
      == "SELECT `n_name` FROM nation")
    assert(PrestoSql.translate("SELECT \"weird \"\"col\"\"\" FROM t")
      == "SELECT `weird \"col\"` FROM t")
    val rows = PrestoSql.sql(spark,
      "SELECT \"n_name\" FROM nation WHERE \"n_nationkey\" = 3").collect()
    assert(rows.length == 1)
  }

  test("string literals are never rewritten") {
    assert(PrestoSql.translate("SELECT 'he said \"hi\"' AS s")
      == "SELECT 'he said \"hi\"' AS s")
    assert(PrestoSql.translate("SELECT 'it''s' AS s") == "SELECT 'it''s' AS s")
    assert(PrestoSql.sql(spark, "SELECT 'day' AS s").collect()(0).getString(0) == "day")
  }

  test("quoted datetime units unquote only inside unit functions") {
    assert(PrestoSql.translate("SELECT date_add('day', 1, ts) FROM t")
      == "SELECT date_add(DAY, 1, ts) FROM t")
    assert(PrestoSql.translate("SELECT date_diff('hour', a, b) FROM t")
      == "SELECT date_diff(HOUR, a, b) FROM t")
    // 'day' elsewhere stays a string
    assert(PrestoSql.translate("SELECT concat('day', x) FROM t")
      == "SELECT concat('day', x) FROM t")
    val d = PrestoSql.sql(spark,
      "SELECT date_add('day', 30, TIMESTAMP '2024-01-01 00:00:00') AS due")
      .collect()(0).getTimestamp(0)
    assert(d.toString.startsWith("2024-01-31"))
  }

  test("FETCH FIRST n ROWS ONLY becomes LIMIT") {
    val rows = PrestoSql.sql(spark,
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey FETCH FIRST 5 ROWS ONLY")
      .collect()
    assert(rows.length == 5)
    intercept[IllegalArgumentException](
      PrestoSql.translate("SELECT x FROM t FETCH FIRST 5 ROWS WITH TIES"))
  }

  test("FETCH FIRST WITH TIES desugars to a rank filter") {
    spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (2, 'c'), (3, 'd') AS t(x, y)")
      .createOrReplaceTempView("ties_t")
    val got = PrestoSql.sql(spark,
      "SELECT x, y FROM ties_t ORDER BY x DESC FETCH FIRST 2 ROWS WITH TIES")
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    // top-2 by x desc: 3 (rank 1) then BOTH 2s (rank 2, tied)
    assert(got == Seq((2, "b"), (2, "c"), (3, "d")), s"got $got")
    // multi-key order with direction suffixes parses too
    val multi = PrestoSql.sql(spark,
      "SELECT x, y FROM ties_t ORDER BY x ASC NULLS LAST, y DESC FETCH FIRST 1 ROWS WITH TIES")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(multi == Seq((1, "a")), s"got $multi")
  }

  test("regexp_replace with lambda and 2-arg delete form") {
    val r = spark.sql(
      "SELECT regexp_replace('ab12cd', '([a-z]+)', x -> upper(element_at(x, 1)))").collect()(0).getString(0)
    assert(r == "AB12CD")
    // capture groups: swap pairs
    val swap = spark.sql(
      "SELECT regexp_replace('a1b2', '([a-z])([0-9])', x -> concat(element_at(x, 2), element_at(x, 1)))")
      .collect()(0).getString(0)
    assert(swap == "1a2b")
    // 2-arg form deletes matches (Presto semantics)
    assert(spark.sql("SELECT regexp_replace('a1b2c3', '[0-9]')").collect()(0).getString(0) == "abc")
    // string 3-arg form still the builtin
    assert(spark.sql("SELECT regexp_replace('aaa', 'a', 'b')").collect()(0).getString(0) == "bbb")
    // null lambda result is an error, as in the reference
    val e = intercept[Exception] {
      spark.sql("SELECT regexp_replace('abc', '(a)', x -> CAST(NULL AS STRING))").collect()
    }
    assert(e.getMessage != null)
  }

  test("PREPARE / EXECUTE ... USING / DEALLOCATE session surface") {
    val ps = new PrestoSql.Prepared(spark)
    ps.statement("PREPARE pq FROM SELECT o_orderpriority, count(*) AS n FROM orders " +
      "WHERE o_totalprice > ? GROUP BY o_orderpriority ORDER BY o_orderpriority")
    assert(ps.statement("EXECUTE pq USING 100000").collect().nonEmpty)
    // arity mismatch mirrors the reference's error text
    val e1 = intercept[IllegalArgumentException] { ps.statement("EXECUTE pq USING 1, 2") }
    assert(e1.getMessage.contains("Incorrect number of parameters"))
    // '?' inside a string literal is NOT a parameter marker
    ps.statement("PREPARE pq2 FROM SELECT count(*) AS n FROM orders " +
      "WHERE o_orderpriority <> '?' AND o_totalprice > ?")
    assert(ps.statement("EXECUTE pq2 USING 0").collect()(0).getLong(0) > 0)
    // parameterless EXECUTE routes through the dialect shim (quoted
    // identifiers + FETCH FIRST)
    ps.statement("PREPARE pq3 FROM SELECT \"o_orderpriority\" FROM orders " +
      "GROUP BY \"o_orderpriority\" ORDER BY \"o_orderpriority\" FETCH FIRST 2 ROWS ONLY")
    assert(ps.statement("EXECUTE pq3").collect().length == 2)
    // deallocate, then execute → the reference's not-found error
    ps.statement("DEALLOCATE PREPARE pq")
    val e2 = intercept[IllegalArgumentException] { ps.statement("EXECUTE pq") }
    assert(e2.getMessage.contains("Prepared statement not found"))
    // '?' inside -- and /* */ comments is text, not a marker (the
    // reference's lexer drops comments before parameters are counted)
    ps.statement("PREPARE pq4 FROM SELECT count(*) AS n /* really? */ FROM orders " +
      "WHERE o_totalprice > ? -- is this the final total?\n")
    assert(ps.statement("EXECUTE pq4 USING 0").collect()(0).getLong(0) > 0)
    // EXECUTE ... USING takes the same dialect path as parameterless
    // EXECUTE: WITH TIES desugars with the bound values in place
    ps.statement("PREPARE pq5 FROM SELECT o_orderpriority, count(*) AS n FROM orders " +
      "WHERE o_totalprice > ? GROUP BY o_orderpriority " +
      "ORDER BY n DESC FETCH FIRST 1 ROWS WITH TIES")
    val tied = ps.statement("EXECUTE pq5 USING 50000").collect()
    assert(tied.nonEmpty, "parameterized WITH TIES must execute, not throw")
    assert(tied.map(_.getLong(1)).distinct.length == 1,
      "WITH TIES keeps exactly the tied top group")
  }

  test("EXECUTE USING string values bind identically on both paths (backslashes)") {
    val ps = new PrestoSql.Prepared(spark)
    // Presto treats backslash as a literal character in strings; the
    // positional-parameter path binds it natively, and the WITH TIES
    // splice path must render it so Spark's escape-interpreting parser
    // round-trips the same bytes (incl. a trailing backslash, which
    // unescaped would eat the closing quote)
    val tricky = """pre\nfix\"""
    ps.statement("PREPARE bs1 FROM SELECT ? AS v FROM nation WHERE n_nationkey = 0")
    assert(ps.statement(s"EXECUTE bs1 USING '${tricky.replace("\\", "\\\\")}'")
      .collect()(0).getString(0) == tricky)
    // same value through the WITH TIES (renderLiteral splice) path
    ps.statement("PREPARE bs2 FROM SELECT n_name, ? AS v FROM nation " +
      "ORDER BY n_nationkey FETCH FIRST 1 ROWS WITH TIES")
    assert(ps.statement(s"EXECUTE bs2 USING '${tricky.replace("\\", "\\\\")}'")
      .collect()(0).getString(1) == tricky)
  }

  test("Presto CREATE VIEW / DROP VIEW surface runs through the dialect shim") {
    // reference grammar SqlBase.g4:75-78 — CREATE [OR REPLACE] VIEW is
    // surface-identical in Spark; double-quoted identifiers still rewrite
    val dir = "/root/testdata/sf0.001"
    PrestoSql.sql(spark, "DROP VIEW IF EXISTS v_presto_nations")
    PrestoSql.sql(spark,
      s"""CREATE OR REPLACE VIEW v_presto_nations AS
         |SELECT "n_name", "n_regionkey" FROM parquet.`$dir/nation.parquet`""".stripMargin)
    val rows = PrestoSql.sql(spark,
      "SELECT \"n_name\" FROM v_presto_nations WHERE \"n_regionkey\" = 1").collect()
    assert(rows.length == 5)
    PrestoSql.sql(spark, "DROP VIEW v_presto_nations")
    intercept[Exception](
      PrestoSql.sql(spark, "SELECT * FROM v_presto_nations").collect())
  }

  test("SHOW metadata statements read the catalog") {
    val ps = new PrestoSql.Prepared(spark)
    val tables = ps.statement("SHOW TABLES").collect().map(_.getString(0))
    assert(tables.contains("orders"), s"registered views must list; got ${tables.mkString(",")}")
    val cols = ps.statement("SHOW COLUMNS FROM orders").collect().map(_.getString(0))
    assert(cols.contains("o_orderkey") && cols.contains("o_totalprice"))
    val fns = ps.statement("SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(fns.contains("approx_distinct"), "registered compat functions must list")
    assert(ps.statement("SHOW SCHEMAS").collect().nonEmpty)
    // DESCRIBE / DESC are the reference's aliases for SHOW COLUMNS FROM
    val desc = ps.statement("DESCRIBE orders").collect().map(_.getString(0))
    assert(desc.toSeq == cols.toSeq, "DESCRIBE must equal SHOW COLUMNS FROM")
    assert(ps.statement("DESC orders").collect().length == cols.length)
    assert(ps.statement("SHOW CATALOGS").collect().map(_.getString(0))
      .contains("spark_catalog"))
    val session = ps.statement("SHOW SESSION").collect()
    assert(session.map(_.getString(0)).contains("spark.sql.session.timeZone"))
  }

  test("DESCRIBE INPUT / OUTPUT describe a prepared statement without executing it") {
    val ps = new PrestoSql.Prepared(spark)
    ps.statement("PREPARE dq FROM SELECT o_orderkey, o_totalprice > ? AS big, " +
      "\"o_orderpriority\" FROM orders WHERE o_custkey = ?")
    val in = ps.statement("DESCRIBE INPUT dq").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(in == Seq((1L, "unknown"), (2L, "unknown")))
    val out = ps.statement("DESCRIBE OUTPUT dq").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("o_orderkey", "big", "o_orderpriority"))
    val byName = out.map(r => r.getString(0) -> ((r.getString(4), r.getLong(5)))).toMap
    assert(byName("o_orderkey") == (("bigint", 8L)))
    assert(byName("big") == (("boolean", 1L)), "? bound to NULL must still type the comparison")
    assert(byName("o_orderpriority") == (("varchar", 0L)), "varchar is not fixed-width")
    // parameterless statement: DESCRIBE INPUT returns zero rows
    ps.statement("PREPARE dq2 FROM SELECT 1 AS x")
    assert(ps.statement("DESCRIBE INPUT dq2").collect().isEmpty)
    // unknown statement: the reference's not-found error
    val e = intercept[IllegalArgumentException] { ps.statement("DESCRIBE OUTPUT nope") }
    assert(e.getMessage.contains("not found"))
  }

  test("SHOW STATS FOR computes the reference's seven-column shape live") {
    val ps = new PrestoSql.Prepared(spark)
    val rows = ps.statement("SHOW STATS FOR nation").collect()
    val byCol = rows.map(r => Option(r.getString(0)) -> r).toMap
    // one row per column + the summary row (ShowStatsRewrite.java:217)
    assert(rows.length == spark.table("nation").schema.length + 1)
    val summary = byCol(None)
    assert(summary.getDouble(4) == 25.0, "summary row carries row_count")
    assert(summary.isNullAt(2) && summary.isNullAt(5))
    val key = byCol(Some("n_nationkey"))
    assert(key.getDouble(2) == 25.0, "exact NDV")
    assert(key.getDouble(3) == 0.0, "nulls fraction")
    assert(key.getString(5) == "0" && key.getString(6) == "24", "low/high rendered")
    assert(key.isNullAt(1), "data_size reported for strings only")
    assert(byCol(Some("n_name")).getDouble(1) > 0, "string data_size = byte sum")
  }

  test("SHOW STATS FOR (query), SET SESSION, RESET SESSION") {
    val ps = new PrestoSql.Prepared(spark)
    // the grammar's #showStatsForQuery form — stats of a derived relation
    val rows = ps.statement(
      "SHOW STATS FOR (SELECT n_name FROM nation WHERE n_nationkey < 5)").collect()
    assert(rows.length == 2, "one column row + the summary row")
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == "n_name"))
    assert(rows.find(_.isNullAt(0)).get.getDouble(4) == 5.0, "filtered row_count")
    ps.statement("SET SESSION spark.graft.probe = 'on'")
    assert(spark.conf.get("spark.graft.probe") == "on")
    ps.statement("RESET SESSION spark.graft.probe")
    assert(spark.conf.getOption("spark.graft.probe").isEmpty)
  }

  test("transaction statements are rejected with the divergence message, not a parse error") {
    // reference grammar SqlBase.g4:104-106; README "Known divergences"
    val ps = new PrestoSql.Prepared(spark)
    for (stmt <- Seq("START TRANSACTION", "START TRANSACTION ISOLATION LEVEL SERIALIZABLE",
        "COMMIT", "COMMIT WORK", "ROLLBACK", "rollback work;")) {
      val e = intercept[UnsupportedOperationException](ps.statement(stmt))
      assert(e.getMessage.contains("single-statement"), s"$stmt: ${e.getMessage}")
    }
    // ...and a column merely NAMED commit must still fall through to SQL
    assert(ps.statement("SELECT 1 AS commit_count").collect().head.getInt(0) == 1)
  }

  test("DELETE FROM / UPDATE statements route onto the CoW engines with row counts") {
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqldml").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_sqldml")
    spark.sql(s"CREATE TABLE g_spec_sqldml USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    val n0 = spark.table("g_spec_sqldml").count()
    // quoted-identifier predicate exercises the dialect translation
    val del = ps.statement("DELETE FROM g_spec_sqldml WHERE \"n_regionkey\" = 2")
    assert(del.columns.toSeq == Seq("rows"))
    val nDel = del.head().getLong(0)
    assert(nDel > 0 && spark.table("g_spec_sqldml").count() == n0 - nDel)
    assert(spark.table("g_spec_sqldml").filter("n_regionkey = 2").count() == 0)
    val upd = ps.statement(
      "UPDATE g_spec_sqldml SET n_name = concat(n_name, '!') WHERE n_nationkey % 2 = 0")
      .head().getLong(0)
    assert(upd == spark.table("g_spec_sqldml").filter("n_name LIKE '%!'").count())
    // DELETE with no WHERE empties the table and reports every row
    val all = ps.statement("DELETE FROM g_spec_sqldml").head().getLong(0)
    assert(all == n0 - nDel && spark.table("g_spec_sqldml").count() == 0)
    // a non-parquet relation is refused loudly, not mangled
    spark.sql("CREATE OR REPLACE TEMP VIEW g_spec_sqldml_v AS SELECT 1 AS x")
    val e = intercept[Exception](ps.statement("DELETE FROM g_spec_sqldml_v WHERE x = 1"))
    assert(e.getMessage.toLowerCase.contains("parquet") ||
      e.getMessage.toLowerCase.contains("table or view"))
    spark.sql("DROP TABLE IF EXISTS g_spec_sqldml")
  }

  test("SQL DML on a sidecar-bearing table routes MERGE-ON-READ; reads see the resolved view") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlmor").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlmor")
    spark.sql(s"CREATE TABLE g_spec_sqlmor USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    // one programmatic batch puts the table in MoR mode and declares the key
    sources.MorDelete.delete(spark, loc, col("n_nationkey") === 0L, Seq("n_nationkey"))
    def files() = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val before = files()
    // DELETE statement text: must tombstone, never rewrite
    val nDel = ps.statement("DELETE FROM g_spec_sqlmor WHERE n_regionkey = 2")
      .head().getLong(0)
    assert(files() == before, "SQL DELETE on a MoR table must touch zero table files")
    assert(nDel > 0)
    val resolved = sources.MorDelete.read(spark, loc)
    assert(resolved.filter("n_regionkey = 2").count() == 0)
    // SQL reads after MoR DML resolve the tombstone-applied view
    val viaSql = ps.statement("SELECT count(*) AS c FROM g_spec_sqlmor").head().getLong(0)
    assert(viaSql == resolved.count(),
      "SELECT statements must read the MoR-resolved view, not the raw files")
    // UPDATE statement text: routes through the sidecar-keyed merge
    val nUpd = ps.statement(
      "UPDATE g_spec_sqlmor SET n_name = concat(n_name, '!') WHERE n_nationkey % 2 = 0")
      .head().getLong(0)
    assert(before.forall { case (f, m) => files().get(f).contains(m) },
      "SQL UPDATE on a MoR table must leave every pre-existing file untouched " +
        "(replacements append as sequence-named parts)")
    val after = sources.MorDelete.read(spark, loc)
    assert(nUpd == after.filter("n_name LIKE '%!'").count() && nUpd > 0)
    // assigning a KEY column is refused loudly (key identity links the
    // replacement to its tombstone)
    val e = intercept[IllegalArgumentException](ps.statement(
      "UPDATE g_spec_sqlmor SET n_nationkey = n_nationkey + 1"))
    assert(e.getMessage.contains("key"))
    spark.catalog.dropTempView("g_spec_sqlmor")
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlmor")
  }

  test("FOR VERSION AS OF pins a SQL read at a snapshot sequence; literals never rewrite") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlver").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlver")
    spark.sql(s"CREATE TABLE g_spec_sqlver USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    val total = spark.table("g_spec_sqlver").count()
    sources.MorDelete.delete(spark, loc, col("n_nationkey") === 0L, Seq("n_nationkey"))
    val snap = sources.MorDelete.currentSeq(spark, loc)
    ps.statement("DELETE FROM g_spec_sqlver WHERE n_regionkey = 2")
    // the pinned read sees the snapshot (first delete applied, second not)
    val pinned = ps.statement(
      s"SELECT count(*) AS c FROM g_spec_sqlver FOR VERSION AS OF $snap")
      .head().getLong(0)
    assert(pinned == total - 1,
      "FOR VERSION AS OF must resolve the manifest pinned at that sequence")
    // the unpinned read reflects both commits (negative control)
    val current = ps.statement("SELECT count(*) AS c FROM g_spec_sqlver")
      .head().getLong(0)
    assert(current < pinned)
    // composes inside a larger query (join of two versions of the table)
    val delta = ps.statement(
      s"""SELECT count(*) AS gone FROM g_spec_sqlver FOR VERSION AS OF $snap v
         |WHERE v.n_nationkey NOT IN (SELECT n_nationkey FROM g_spec_sqlver)""".stripMargin)
      .head().getLong(0)
    assert(delta == pinned - current)
    // quote-awareness: the phrase inside a string literal is untouched
    val lit = ps.statement(
      "SELECT 'x FOR VERSION AS OF 1 y' AS s").head().getString(0)
    assert(lit == "x FOR VERSION AS OF 1 y")
    // composes through the SHOW STATS (query) arm too
    assert(ps.statement(
      s"SHOW STATS FOR (SELECT * FROM g_spec_sqlver FOR VERSION AS OF $snap)")
      .count() > 0)
    // an expired snapshot fails loudly, never silently serves partials
    sources.Maintenance.vacuum(loc, retentionMs = 0, stageGraceMs = 0)
    val e = intercept[IllegalStateException](ps.statement(
      s"SELECT count(*) AS c FROM g_spec_sqlver FOR VERSION AS OF $snap"))
    assert(e.getMessage.contains("expired") || e.getMessage.contains("no retained snapshot"))
    spark.catalog.dropTempView("g_spec_sqlver")
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlver")
  }

  test("FOR TIMESTAMP AS OF resolves the manifest committed at that instant; EXECUTE rewrites too") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlts").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlts")
    spark.sql(s"CREATE TABLE g_spec_sqlts USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    sources.MorDelete.delete(spark, loc, col("n_nationkey") === 0L, Seq("n_nationkey"))
    val afterFirst = sources.MorDelete.read(spark, loc).count()
    Thread.sleep(30)
    val tMid = System.currentTimeMillis()
    Thread.sleep(30)
    // SQL DML so the resolved view shadows the table for plain SELECTs
    ps.statement("DELETE FROM g_spec_sqlts WHERE n_regionkey = 2")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    val tsLit = java.time.Instant.ofEpochMilli(tMid)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(fmt)
    // both grammar shapes resolve the between-the-commits snapshot
    val pinned = ps.statement(
      s"SELECT count(*) AS c FROM g_spec_sqlts FOR TIMESTAMP AS OF TIMESTAMP '$tsLit'")
      .head().getLong(0)
    assert(pinned == afterFirst,
      "FOR TIMESTAMP AS OF must resolve the manifest committed at or before the instant")
    assert(ps.statement(
      s"SELECT count(*) AS c FROM g_spec_sqlts FOR TIMESTAMP AS OF '$tsLit'")
      .head().getLong(0) == afterFirst)
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_sqlts")
      .head().getLong(0) < pinned)
    // a PREPARE'd body takes the identical rewrite at EXECUTE time
    ps.statement(
      s"PREPARE q_ts FROM SELECT count(*) AS c FROM g_spec_sqlts FOR TIMESTAMP AS OF '$tsLit'")
    assert(ps.statement("EXECUTE q_ts").head().getLong(0) == afterFirst)
    // the phrase inside a string literal is untouched
    assert(ps.statement("SELECT 'a FOR TIMESTAMP AS OF ''2020-01-01'' b' AS s")
      .head().getString(0) == "a FOR TIMESTAMP AS OF '2020-01-01' b")
    // an instant predating the history fails loudly
    val e = intercept[IllegalStateException](ps.statement(
      "SELECT count(*) AS c FROM g_spec_sqlts FOR TIMESTAMP AS OF '2000-01-01'"))
    assert(e.getMessage.contains("predates") || e.getMessage.contains("no retained"))
    spark.catalog.dropTempView("g_spec_sqlts")
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlts")
  }

  test("time travel: quoted-identifier apostrophes don't flip parity; schema-qualified pins don't collide") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    // an apostrophe inside a double-quoted identifier must not open a
    // phantom string span — the literal after it would otherwise be
    // scanned as code and its phrase rewritten (or crash on a missing
    // table)
    val r = ps.statement("SELECT 1 AS \"x's\", 'see t FOR VERSION AS OF 5' AS b").head()
    assert(r.getString(1) == "see t FOR VERSION AS OF 5")
    // same-named tables in two schemas pinned in ONE statement must
    // resolve through two distinct views, not silently share one
    spark.sql("CREATE DATABASE IF NOT EXISTS g_tt_a")
    spark.sql("CREATE DATABASE IF NOT EXISTS g_tt_b")
    val locA = java.nio.file.Files.createTempDirectory("graft_tta").toString + "/t"
    val locB = java.nio.file.Files.createTempDirectory("graft_ttb").toString + "/t"
    spark.sql(s"CREATE TABLE g_tt_a.t USING parquet LOCATION '$locA' AS SELECT * FROM nation")
    spark.sql(s"CREATE TABLE g_tt_b.t USING parquet LOCATION '$locB' AS SELECT * FROM region")
    sources.MorDelete.delete(spark, locA, col("n_nationkey") === 0L, Seq("n_nationkey"))
    sources.MorDelete.delete(spark, locB, col("r_regionkey") === 0L, Seq("r_regionkey"))
    val snapA = sources.MorDelete.currentSeq(spark, locA)
    val snapB = sources.MorDelete.currentSeq(spark, locB)
    val counts = ps.statement(
      s"""SELECT
         |  (SELECT count(*) FROM g_tt_a.t FOR VERSION AS OF $snapA) AS a,
         |  (SELECT count(*) FROM g_tt_b.t FOR VERSION AS OF $snapB) AS b""".stripMargin)
      .head()
    assert(counts.getLong(0) == 24L && counts.getLong(1) == 4L,
      s"each schema's pin must read its own table, got ${counts.mkString(", ")}")
    spark.sql("DROP DATABASE g_tt_a CASCADE")
    spark.sql("DROP DATABASE g_tt_b CASCADE")
  }

  test("SQL CoW DML derives its row count from the rewrite itself — no separate count scan") {
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlonescan").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_onescan")
    spark.sql(s"CREATE TABLE g_spec_onescan USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM orders")
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val nDel = ps.statement("DELETE FROM g_spec_onescan WHERE o_orderkey % 10 = 3")
        .head().getLong(0)
      // the execution-listener bus is async: poll until the count of
      // table-scanning actions reaches the expected floor AND stays
      // stable (a lone stable reading below 2 is just a slow bus, not a
      // missing action) BEFORE running any further query
      def scans() = plans.synchronized { plans.count(_.contains(loc)) }
      val deadline = System.currentTimeMillis() + 20000
      var last = -1
      while (System.currentTimeMillis() < deadline &&
        { val s = scans(); val settle = s == last && s >= 2; last = s; !settle })
        Thread.sleep(300)
      // exactly TWO actions read the table: touched-file discovery and the
      // rewrite write (whose Observation carries the deleted-row count) —
      // the old third action, a full predicate count just for the `rows`
      // result, is gone
      assert(last == 2, s"expected exactly discovery + rewrite actions over the table, saw $last")
      assert(nDel > 0 && spark.table("g_spec_onescan").filter("o_orderkey % 10 = 3").count() == 0)
    } finally {
      spark.listenerManager.unregister(listener)
      spark.sql("DROP TABLE IF EXISTS g_spec_onescan")
    }
  }

  test("UPDATE splits SET/WHERE with the quote-aware scanner, not a regex") {
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlquote").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlquote")
    spark.sql(s"CREATE TABLE g_spec_sqlquote USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    // a SET literal containing ' WHERE ' (the r14-advice mis-split): the
    // real WHERE is the second one
    val n = ps.statement(
      "UPDATE g_spec_sqlquote SET n_name = concat(n_name, ' WHERE x') WHERE n_nationkey = 1")
      .head().getLong(0)
    assert(n == 1)
    assert(spark.table("g_spec_sqlquote").filter("n_name LIKE '% WHERE x'").count() == 1)
    // a doubled-quote escape carrying WHERE inside the literal
    val n2 = ps.statement(
      "UPDATE g_spec_sqlquote SET n_name = 'it''s WHERE y' WHERE n_nationkey = 2")
      .head().getLong(0)
    assert(n2 == 1)
    assert(spark.table("g_spec_sqlquote").filter("n_nationkey = 2")
      .head().getString(1) == "it's WHERE y")
    // no WHERE at all still updates everything
    val n3 = ps.statement("UPDATE g_spec_sqlquote SET n_comment = 'x'").head().getLong(0)
    assert(n3 == spark.table("g_spec_sqlquote").count())
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlquote")
  }

  test("SQL DELETE with an IN (SELECT …) predicate resolves through Dataset.filter") {
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlsubq").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlsubq")
    spark.sql(s"CREATE TABLE g_spec_sqlsubq USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM orders")
    val expected = spark.sql(
      """SELECT count(*) FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)
      .head().getLong(0)
    val nDel = ps.statement(
      """DELETE FROM g_spec_sqlsubq WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)
      .head().getLong(0)
    assert(nDel == expected, s"subquery DELETE must remove exactly the semi-join rows")
    assert(spark.sql(
      """SELECT count(*) FROM g_spec_sqlsubq WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)
      .head().getLong(0) == 0)
    spark.sql("DROP TABLE IF EXISTS g_spec_sqlsubq")
  }

  test("MERGE INTO statement: the classic upsert shape routes onto CowMerge") {
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlmerge").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_merge")
    spark.sql(s"CREATE TABLE g_spec_merge USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    // source: re-region nations 0-4 and bring 3 new ones, with a key
    // named differently (nid) so the ON clause exercises the rename
    val n = ps.statement(
      """MERGE INTO g_spec_merge AS t
        |USING (SELECT n_nationkey AS nid, n_name, n_regionkey + 100 AS n_regionkey
        |       FROM nation WHERE n_nationkey < 5
        |       UNION ALL
        |       SELECT n_nationkey + 1000, 'new_' || n_name, n_regionkey
        |       FROM nation WHERE n_nationkey < 3) AS s
        |ON t.n_nationkey = s.nid
        |WHEN MATCHED THEN UPDATE SET n_regionkey = s.n_regionkey
        |WHEN NOT MATCHED THEN INSERT""".stripMargin).head().getLong(0)
    assert(n == 8, s"5 updates + 3 inserts, got $n")
    val after = spark.table("g_spec_merge")
    assert(after.filter("n_nationkey < 5 AND n_regionkey >= 100").count() == 5,
      "matched rows take the source's SET value")
    assert(after.filter("n_nationkey < 5 AND n_name LIKE 'new_%'").count() == 0,
      "unassigned columns keep their target values")
    assert(after.filter("n_nationkey >= 1000").count() == 3, "unmatched rows insert")
    // insert-only merge: no rewrite pass at all
    val n2 = ps.statement(
      """MERGE INTO g_spec_merge t
        |USING (SELECT n_nationkey + 2000 AS n_nationkey, n_name, n_regionkey
        |       FROM nation WHERE n_nationkey < 2) s
        |ON t.n_nationkey = s.n_nationkey
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
    assert(n2 == 2 && spark.table("g_spec_merge").filter("n_nationkey >= 2000").count() == 2)
    // conditional / DELETE clauses on a plain table are refused with guidance
    val e = intercept[IllegalArgumentException](ps.statement(
      """MERGE INTO g_spec_merge t USING nation s ON t.n_nationkey = s.n_nationkey
        |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("merge-on-read"))
    spark.sql("DROP TABLE IF EXISTS g_spec_merge")
  }

  test("MERGE INTO on a MoR table: full clause surface, ANSI SET semantics, zero files touched") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlmorm").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_morm")
    spark.sql(s"CREATE TABLE g_spec_morm USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    sources.MorDelete.delete(spark, loc, col("n_nationkey") === -1L, Seq("n_nationkey"))
    // the no-op delete above only enters MoR mode (manifests, no batch)
    def files() = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val before = files()
    val origName3 = spark.table("g_spec_morm").filter("n_nationkey = 3")
      .head().getString(1)
    val n = ps.statement(
      """MERGE INTO g_spec_morm AS t
        |USING (SELECT n_nationkey, n_name, n_regionkey
        |       FROM nation WHERE n_nationkey < 6
        |       UNION ALL
        |       SELECT n_nationkey + 3000, 'ins_' || n_name, n_regionkey
        |       FROM nation WHERE n_nationkey < 2) AS s
        |ON t.n_nationkey = s.n_nationkey
        |WHEN MATCHED AND s.n_nationkey < 2 THEN DELETE
        |WHEN MATCHED AND s.n_regionkey >= 0 THEN UPDATE SET n_regionkey = s.n_regionkey + 50
        |WHEN NOT MATCHED THEN INSERT""".stripMargin).head().getLong(0)
    assert(before.forall { case (f, m) => files().get(f).contains(m) },
      "MoR MERGE must leave every pre-existing file untouched " +
        "(replacements/inserts append as sequence-named parts)")
    val after = sources.MorDelete.read(spark, loc)
    assert(after.filter("n_nationkey < 2").count() == 0, "delete clause claims keys 0-1")
    // matched keys 2-5 all pass the update condition; delete has priority on 0-1
    assert(after.filter("n_nationkey IN (2,3,4,5) AND n_regionkey >= 50").count() == 4)
    assert(after.filter("n_nationkey = 3").head().getString(1) == origName3,
      "SET must preserve unassigned target columns (ANSI), not replace the row")
    assert(after.filter("n_nationkey >= 3000").count() == 2, "inserts append")
    assert(n == 2 + 4 + 2, s"rows = deleted keys + updated keys + inserts, got $n")
    spark.catalog.dropTempView("g_spec_morm")
    spark.sql("DROP TABLE IF EXISTS g_spec_morm")
  }

  test("ANALYZE / VACUUM / OPTIMIZE statements route the maintenance layer by table mode") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlmaint").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_maint")
    spark.sql(s"CREATE TABLE g_spec_maint USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM orders")
    // plain table: ANALYZE (the reference grammar's bare shape) takes the
    // catalog-statistics path; OPTIMIZE without ZORDER has nothing to fold
    assert(ps.statement("ANALYZE g_spec_maint").columns.toSeq == Seq("result"))
    val e0 = intercept[IllegalArgumentException](ps.statement("OPTIMIZE g_spec_maint"))
    assert(e0.getMessage.contains("ZORDER"))

    // merge-on-read mode: ANALYZE publishes per-file stats into the manifest
    sources.MorDelete.delete(spark, loc, col("o_orderkey") % 10 === 3, Seq("o_orderkey"))
    val live = sources.MorDelete.read(spark, loc).count()
    val analyzed = ps.statement("ANALYZE g_spec_maint").head().getLong(0)
    assert(analyzed > 0 && sources.MorDelete.liveState(spark, loc).stats.nonEmpty,
      "ANALYZE on a MoR table must publish manifest file stats")

    // OPTIMIZE folds the tombstones atomically; the view is unchanged
    val rewritten = ps.statement("OPTIMIZE g_spec_maint").head().getLong(0)
    assert(rewritten > 0 && sources.MorDelete.liveState(spark, loc).batches.isEmpty)
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_maint").head().getLong(0) == live)

    // OPTIMIZE … ZORDER BY re-clusters in place through the manifest protocol
    val q = ps.statement("OPTIMIZE g_spec_maint ZORDER BY (o_orderkey, o_custkey)")
    assert(q.columns.toSeq == Seq("quantizer"))
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_maint").head().getLong(0) == live)

    // VACUUM RETAIN 0 HOURS reclaims the superseded layouts and snapshots
    val v = ps.statement("VACUUM g_spec_maint RETAIN 0 HOURS")
    assert(v.columns.toSeq == Seq("dirs_removed", "files_removed", "bytes_reclaimed"))
    assert(v.head().getLong(2) > 0, "the folded originals must reclaim bytes")
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_maint").head().getLong(0) == live)
    spark.catalog.dropTempView("g_spec_maint")
    spark.sql("DROP TABLE IF EXISTS g_spec_maint")
  }

  test("DESCRIBE HISTORY lists the versions; RESTORE TABLE rolls back by version and instant") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlrestore").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_restore")
    spark.sql(s"CREATE TABLE g_spec_restore USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    sources.MorDelete.delete(spark, loc, col("n_nationkey") === 0L, Seq("n_nationkey"))
    val v1 = sources.MorDelete.currentSeq(spark, loc)
    val afterFirst = sources.MorDelete.read(spark, loc).count()
    Thread.sleep(30)
    val tMid = System.currentTimeMillis()
    Thread.sleep(30)
    ps.statement("DELETE FROM g_spec_restore WHERE n_regionkey = 2")

    val h = ps.statement("DESCRIBE HISTORY g_spec_restore")
    assert(h.columns.toSeq == Seq("version", "ordinal", "committed_at",
      "data_files", "tombstone_batches", "stats_files", "operation",
      "stats_missing"))
    assert(h.count() >= 3, "genesis + two DML commits must be listed")
    assert(h.select("operation").collect().map(_.getString(0)).toSet
      .contains("DELETE"))
    assert(h.select("version").collect().map(_.getLong(0)).contains(v1))

    // roll back by VERSION: the live view (and plain SELECT statements,
    // via the refreshed resolved view) return to the pinned state
    val nv = ps.statement(s"RESTORE TABLE g_spec_restore TO VERSION AS OF $v1")
      .head().getLong(0)
    assert(nv > v1)
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_restore")
      .head().getLong(0) == afterFirst)

    // damage again, then roll back by INSTANT (session-zone bound)
    ps.statement("DELETE FROM g_spec_restore WHERE n_regionkey = 1")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    val tsLit = java.time.Instant.ofEpochMilli(tMid)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(fmt)
    ps.statement(s"RESTORE TABLE g_spec_restore TO TIMESTAMP AS OF '$tsLit'")
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_restore")
      .head().getLong(0) == afterFirst,
      "the instant between the commits restores the first-delete state")
    // an instant predating the history refuses loudly
    val e = intercept[IllegalStateException](ps.statement(
      "RESTORE TABLE g_spec_restore TO TIMESTAMP AS OF '2000-01-01'"))
    assert(e.getMessage.contains("predates") || e.getMessage.contains("no retained"))
    spark.catalog.dropTempView("g_spec_restore")
    spark.sql("DROP TABLE IF EXISTS g_spec_restore")
  }

  test("ALTER TABLE column statements evolve the manifest schema; RENAME TO follows the view") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlalter").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_alter")
    spark.sql("DROP TABLE IF EXISTS g_spec_alter2")
    spark.sql(s"CREATE TABLE g_spec_alter USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    def files() = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val before = files()

    // ADD COLUMN: metadata-only, NULL over old files, SQL-visible at once
    ps.statement("ALTER TABLE g_spec_alter ADD COLUMN score DOUBLE")
    assert(files() == before, "ADD COLUMN must touch zero files")
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_alter WHERE score IS NULL")
      .head().getLong(0) == 25)

    // RENAME COLUMN: old physical name maps through the evolution log
    ps.statement("ALTER TABLE g_spec_alter RENAME COLUMN n_name TO remark")
    assert(files() == before, "RENAME COLUMN must touch zero files")
    val viaSql = ps.statement(
      "SELECT count(*) AS c FROM g_spec_alter WHERE length(remark) > 0").head().getLong(0)
    assert(viaSql == 25)

    // DROP COLUMN: projected away for SQL reads, files untouched
    ps.statement("ALTER TABLE g_spec_alter DROP COLUMN n_regionkey")
    assert(files() == before, "DROP COLUMN must touch zero files")
    assert(!ps.statement("SELECT * FROM g_spec_alter").columns.contains("n_regionkey"))
    assert(intercept[Exception](
      ps.statement("SELECT n_regionkey FROM g_spec_alter").collect())
      .getMessage.toLowerCase.contains("n_regionkey"))

    // the evolved schema statements refuse the retired name loudly
    val e = intercept[IllegalArgumentException](
      ps.statement("ALTER TABLE g_spec_alter ADD COLUMN n_regionkey INT"))
    assert(e.getMessage.contains("previously"))

    // CHECK constraints gate the write boundary from SQL: a violating
    // UPDATE (which routes through the merge engine) refuses loudly
    ps.statement("ALTER TABLE g_spec_alter ADD CONSTRAINT pos_score CHECK (score >= 0)")
    // declare the sidecar key without touching the view (a phantom key)
    sources.MorDelete.deleteKeys(spark, loc,
      spark.range(999, 1000).select(org.apache.spark.sql.functions.col("id")
        .as("n_nationkey")), Seq("n_nationkey"))
    val ec = intercept[IllegalArgumentException](ps.statement(
      "UPDATE g_spec_alter SET score = -1 WHERE n_nationkey = 3"))
    assert(ec.getMessage.contains("pos_score"))
    ps.statement("UPDATE g_spec_alter SET score = 2 WHERE n_nationkey = 3")
    assert(ps.statement(
      "SELECT count(*) AS c FROM g_spec_alter WHERE score = 2").head().getLong(0) == 1)
    ps.statement("ALTER TABLE g_spec_alter DROP CONSTRAINT pos_score")
    ps.statement("UPDATE g_spec_alter SET score = -1 WHERE n_nationkey = 3")

    // RENAME TO: catalog renames, nothing moves on disk (the UPDATEs
    // above appended sequence-named parts — snapshot anew), the resolved
    // view (and with it the evolved schema) follows the new name
    val beforeRename = files()
    ps.statement("ALTER TABLE g_spec_alter RENAME TO g_spec_alter2")
    assert(files() == beforeRename)
    assert(ps.statement("SELECT count(*) AS c FROM g_spec_alter2").head().getLong(0) == 25)
    assert(!ps.statement("SELECT * FROM g_spec_alter2").columns.contains("n_regionkey"))
    assert(ps.statement("SELECT * FROM g_spec_alter2").columns.contains("remark"))
    spark.catalog.dropTempView("g_spec_alter2")
    spark.sql("DROP TABLE IF EXISTS g_spec_alter2")
  }

  test("table_changes('t', from[, to]) reads the change feed from SQL") {
    import org.apache.spark.sql.functions._
    val ps = new PrestoSql.Prepared(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_sqlcdf").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS g_spec_cdf")
    spark.sql(s"CREATE TABLE g_spec_cdf USING parquet LOCATION '$loc' " +
      "AS SELECT * FROM nation")
    sources.MorDelete.delete(spark, loc, col("n_nationkey") < 5, Seq("n_nationkey"))
    val v1 = sources.MorDelete.currentSeq(spark, loc)
    ps.statement("DELETE FROM g_spec_cdf WHERE n_regionkey = 2")
    val del2 = sources.MorDelete.readChanges(spark, loc, v1).count()

    // full range: both commits' deletes, version-attributed
    val rows = ps.statement(
      "SELECT _change_type, _commit_version, count(*) AS n " +
        "FROM table_changes('g_spec_cdf', 0) GROUP BY 1, 2 ORDER BY 2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("delete", 1L, 5L), ("delete", 2L, del2)))
    // ranged form slices; the unquoted identifier spelling parses too
    val ranged = ps.statement(
      s"SELECT count(*) AS n FROM table_changes(g_spec_cdf, $v1, ${v1 + 1})")
      .head().getLong(0)
    assert(ranged == del2)
    // a string literal CONTAINING the phrase is never rewritten
    val literal = ps.statement("SELECT 'table_changes(g_spec_cdf, 0)' AS s")
      .head().getString(0)
    assert(literal == "table_changes(g_spec_cdf, 0)")
    // and it composes through PREPARE/EXECUTE (rewrite at EXECUTE time)
    ps.statement("PREPARE cdfq FROM SELECT count(*) AS n FROM table_changes('g_spec_cdf', 0)")
    assert(ps.statement("EXECUTE cdfq").head().getLong(0) == 5L + del2)
    spark.catalog.dropTempView("g_spec_cdf")
    spark.sql("DROP TABLE IF EXISTS g_spec_cdf")
  }

  test("a realistic reference-dialect query end to end") {
    val df = PrestoSql.sql(spark,
      "SELECT \"o_orderpriority\", count(*) AS \"n orders\",\n" +
        "  approx_distinct(\"o_custkey\") AS nc\n" +
        "FROM orders\n" +
        "WHERE \"o_orderdate\" >= date_add('day', -36500, TIMESTAMP '2024-01-01 00:00:00')\n" +
        "GROUP BY \"o_orderpriority\"\n" +
        "ORDER BY \"o_orderpriority\"\n" +
        "FETCH FIRST 3 ROWS ONLY")
    val rows = df.collect()
    assert(rows.length == 3 && rows.forall(_.getLong(1) > 0))
  }
}
