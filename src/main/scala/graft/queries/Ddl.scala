package graft.queries

import graft.Q

/** Declared queries for the writer/DML surface (TableWriter/TableFinish,
  * DELETE — reference TableWriterOperator.java, DeleteOperator.java),
  * upgrading them from spec-only to oracle-checked: each query executes
  * the DDL/DML against external parquet tables under a scratch location,
  * reads the result back, and emits an aggregate DuckDB re-derives from
  * the source tables. The side effects are idempotent (drop + recreate)
  * so Verify reruns are stable.
  */
object Ddl {

  private val scratch = "/tmp/graft_ddl"

  private def drop(s: org.apache.spark.sql.SparkSession, table: String, dir: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val f = new java.io.File(dir)
    def rec(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rec)
      x.delete(); ()
    }
    if (f.exists()) rec(f)
  }

  val qs: Map[String, Q] = Map(

    // CTAS writes half of orders, INSERT INTO appends the other half, and
    // the read-back aggregate must equal DuckDB's over the source table —
    // the full TableWriter/TableFinish round trip.
    "ddl_ctas_insert_roundtrip" -> Q.df(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin) { (s, dir) =>
      drop(s, "g_ctas_orders", s"$scratch/g_ctas_orders")
      s.sql(
        s"""CREATE TABLE g_ctas_orders USING parquet
           |LOCATION '$scratch/g_ctas_orders'
           |AS SELECT * FROM orders WHERE o_orderkey % 2 = 0""".stripMargin)
      s.sql("INSERT INTO g_ctas_orders SELECT * FROM orders WHERE o_orderkey % 2 <> 0")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total
          |FROM g_ctas_orders GROUP BY o_orderpriority
          |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin)
    },

    // DELETE as stage-then-swap (parquet has no DSv2 row-level delete; the
    // reference's DeleteOperator semantics map to materializing the
    // retained set): the surviving aggregate must equal DuckDB's
    // NOT-predicate aggregate over the source.
    "ddl_delete_roundtrip" -> Q.df(
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS acctbal
        |FROM supplier WHERE NOT (s_nationkey % 5 = 0)
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      drop(s, "g_del_supplier", s"$scratch/g_del_supplier")
      drop(s, "g_del_supplier_stage", s"$scratch/g_del_supplier_stage")
      s.sql(
        s"""CREATE TABLE g_del_supplier USING parquet
           |LOCATION '$scratch/g_del_supplier'
           |AS SELECT * FROM supplier""".stripMargin)
      // DELETE FROM g_del_supplier WHERE s_nationkey % 5 = 0:
      s.sql(
        s"""CREATE TABLE g_del_supplier_stage USING parquet
           |LOCATION '$scratch/g_del_supplier_stage'
           |AS SELECT * FROM g_del_supplier WHERE NOT (s_nationkey % 5 = 0)""".stripMargin)
      s.sql(
        """SELECT s_nationkey, COUNT(*) AS n,
          |  CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS acctbal
          |FROM g_del_supplier_stage GROUP BY s_nationkey
          |ORDER BY s_nationkey ASC NULLS LAST""".stripMargin)
    }
  )
}
