package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Window-function coverage — the reference's WindowOperator machinery
  * (operator/WindowOperator.java, frames operator/window/FrameInfo.java,
  * ranking/value functions in the operator/window/ package registered at
  * FunctionRegistry.java:404-414) plus the specialized RowNumberOperator /
  * TopNRowNumberOperator (plan/TopNRowNumberNode.java, rule
  * optimizations/WindowFilterPushDown.java) which Spark mirrors with
  * WindowGroupLimit.
  *
  * Scale: window partitions hash-shuffle on partitionBy keys; none of these
  * queries sorts globally except where the final ORDER BY demands it, and
  * top-n-per-group filters push the group limit below the sort (rank<=k →
  * WindowGroupLimitExec), so the full partition never materializes at scale.
  */
object Windows {

  val qs: Map[String, Q] = Map(

    // Ranking family: row_number/rank/dense_rank (RowNumberFunction.java,
    // RankFunction.java, DenseRankFunction.java) — DataFrame API.
    "window_ranking" -> Q.df(
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM orders
        |WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey ASC NULLS LAST, rn ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val w = W.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.t(s, dir, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy(col("o_custkey").asc_nulls_last, col("rn").asc_nulls_last)
    },

    // ntile / percent_rank / cume_dist (NTileFunction.java,
    // PercentRankFunction.java, CumulativeDistributionFunction.java).
    "window_distribution" -> Q.sqlSame(
      """SELECT o_orderkey,
        |  ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC) AS quartile,
        |  percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC) AS pr,
        |  cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC) AS cd
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // lead/lag with defaults (LagFunction.java, LeadFunction.java).
    "window_lead_lag" -> Q.sqlSame(
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1, CAST(-1 AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS prev_key,
        |  lead(o_orderkey, 1, CAST(-1 AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS next_key
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin),

    // IGNORE NULLS value functions (Presto supports IGNORE NULLS on
    // lag/lead/first/last/nth — StatementAnalyzer; dialects place the
    // modifier differently, hence per-dialect texts). Partitioned by
    // priority so the window hash-distributes — an unpartitioned ORDER BY
    // window moves the whole input through one task at scale.
    "window_ignore_nulls" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  lag(NULLIF(o_orderstatus, 'O')) IGNORE NULLS OVER w AS last_closed,
        |  first_value(NULLIF(o_orderstatus, 'O')) IGNORE NULLS OVER w AS first_closed
        |FROM orders WHERE o_orderkey < 1000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey ASC)
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  lag(NULLIF(o_orderstatus, 'O') IGNORE NULLS) OVER w AS last_closed,
        |  first_value(NULLIF(o_orderstatus, 'O') IGNORE NULLS) OVER w AS first_closed
        |FROM orders WHERE o_orderkey < 1000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey ASC)
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // first/last/nth over full-partition frame (FirstValueFunction.java,
    // LastValueFunction.java, NthValueFunction.java).
    "window_first_last_nth" -> Q.sqlSame(
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin),

    // Aggregate-as-window, running total over ROWS frame
    // (AggregateWindowFunction.java; FrameInfo ROWS).
    "window_running_sum" -> Q.df(
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val w = W.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      Tables.t(s, dir, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(30,8)")).over(w)
            .cast("double").as("running_spend"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    },

    // Sliding ROWS frame (moving aggregate), partitioned so the window
    // hash-distributes instead of single-tasking a global sort.
    "window_sliding_avg" -> Q.sqlSame(
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS moving_avg
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // RANGE frame with peer groups (Presto RANGE limited to
    // UNBOUNDED/CURRENT — StatementAnalyzer.java:1519; peers share
    // order-key value, WindowPartition.java:102-144).
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
    // the final ORDER BY lists every output column so the order is total.
    "window_range_peers" -> Q.sqlSame(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_upto_qty
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST,
        |  l_quantity ASC NULLS LAST, n_upto_qty ASC NULLS LAST""".stripMargin),

    // Value-offset RANGE frame (Spark superset of Presto's RANGE — SURVEY
    // §2.1 window table). Partitioned by status: value-RANGE frames sort
    // within their partition, and an unpartitioned one is a single-task
    // global sort at scale.
    "window_range_value" -> Q.sqlSame(
      """SELECT o_orderkey, o_totalprice,
        |  COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
        |    RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS n_within_1000
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // Top-N per group: row_number + filter (TopNRowNumberOperator /
    // WindowFilterPushDown → Spark WindowGroupLimit).
    "window_topn_per_group" -> Q.df(
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) t
        |WHERE rn <= 3
        |ORDER BY c_nationkey ASC NULLS LAST, c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val w = W.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey").asc_nulls_last, col("c_acctbal").desc_nulls_last,
          col("c_custkey").asc_nulls_last)
    },

    // Multiple windows in one select (GatherAndMergeWindows / CollapseWindow).
    // rank() (not row_number) because the window order key is non-unique in
    // the synthetic lineitem — ties then get equal, engine-independent values.
    "window_multiple" -> Q.sqlSame(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_total,
        |  rank() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC) AS supp_seq
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST,
        |  supp_seq ASC NULLS LAST""".stripMargin)
  )
}
