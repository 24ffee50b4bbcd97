package graft.queries

import graft.Q

/** TPC-DS-class query shapes adapted to the driver schema — the reference
  * benchmarks 103 TPC-DS queries (presto-benchto-benchmarks/.../tpcds.yaml,
  * sql/presto/tpcds/q*.sql); this module re-expresses the six structural
  * families that dominate that suite and that the TPC-H-ish queries do not
  * cover: dim-heavy star joins with date rollups (q3), multi-dim averages
  * (q7), cross-border brand analysis (q19), ROLLUP with a window function
  * ranking within grouping level (q36/q86), multi-channel UNION ALL
  * re-aggregation (q71), and count-band join-backs (q34/q73).
  *
  * Scale notes: every star join broadcasts its dims (part/customer/
  * supplier/nation stay far under the broadcast threshold at any SF); the
  * fact table shuffles only on GROUP BY keys; rollup/window phases operate
  * on the aggregated (small) side. All sums go through the exact-decimal
  * pattern so partial-agg order cannot perturb bit equality.
  */
object Tpcds {

  val qs: Map[String, Q] = Map(

    // ---- q3-style: yearly brand revenue (date dim + item dim star, topn)
    "tpcds_q3_brand_by_year" -> Q.sqlSame(
      """SELECT year(o_orderdate) AS d_year, p_brand,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS sum_agg
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_type = 'PROMO' AND month(o_orderdate) = 12
        |GROUP BY year(o_orderdate), p_brand
        |ORDER BY d_year ASC NULLS LAST, sum_agg DESC NULLS LAST, p_brand ASC NULLS LAST
        |LIMIT 100""".stripMargin),

    // ---- q7-style: multi-measure averages across a 4-way star ----
    "tpcds_q7_avg_by_item" -> Q.sqlSame(
      """SELECT p_type,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) AS agg1,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) AS agg2,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) AS agg3,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS agg4
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderpriority LIKE '1%'
        |GROUP BY p_type
        |ORDER BY p_type ASC NULLS LAST""".stripMargin),

    // ---- q19-style: brand revenue where buyer and supplier sit in
    //      different nations (the cross-border analog of q19's
    //      store-zip <> customer-zip filter) ----
    "tpcds_q19_cross_border_brand" -> Q.sqlSame(
      """SELECT n1.n_name AS supp_nation, p_brand,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS ext_price
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN part ON p_partkey = l_partkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |WHERE p_size BETWEEN 1 AND 10
        |  AND c_nationkey <> s_nationkey
        |  AND year(o_orderdate) = 1996
        |GROUP BY n1.n_name, p_brand
        |ORDER BY ext_price DESC NULLS LAST, supp_nation ASC NULLS LAST, p_brand ASC NULLS LAST
        |LIMIT 100""".stripMargin),

    // ---- q36/q86-style: margin ROLLUP over the geography hierarchy with
    //      a rank() within each grouping level — window over aggregate
    //      over rollup, the TPC-DS signature chain ----
    "tpcds_q36_rollup_rank" -> Q.sqlSame(
      """SELECT lochierarchy, r_name, n_name,
        |  ROUND(gross_margin, 6) AS gross_margin,
        |  RANK() OVER (PARTITION BY lochierarchy
        |               ORDER BY ROUND(gross_margin, 6) ASC, r_name ASC NULLS FIRST,
        |                        n_name ASC NULLS FIRST) AS rank_within_parent
        |FROM (
        |  SELECT r_name, n_name,
        |    GROUPING(r_name) + GROUPING(n_name) AS lochierarchy,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - l_quantity * 100.0 AS DECIMAL(30,8))) AS DOUBLE)
        |      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS gross_margin
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  GROUP BY ROLLUP (r_name, n_name)) t
        |ORDER BY lochierarchy DESC NULLS LAST, r_name ASC NULLS LAST,
        |  n_name ASC NULLS LAST""".stripMargin),

    // ---- q71-style: three order-priority "channels" re-aggregated after
    //      UNION ALL (the web/catalog/store union shape) ----
    "tpcds_q71_channel_union" -> Q.sqlSame(
      """SELECT p_brand, channel,
        |  CAST(SUM(CAST(ext_price AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT l_partkey AS partkey, 'urgent' AS channel,
        |    l_extendedprice * (1 - l_discount) AS ext_price
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT l_partkey, 'high', l_extendedprice * (1 - l_discount)
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderpriority = '2-HIGH'
        |  UNION ALL
        |  SELECT l_partkey, 'other', l_extendedprice * (1 - l_discount)
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) ch
        |JOIN part ON p_partkey = partkey
        |WHERE p_type = 'ECONOMY'
        |GROUP BY p_brand, channel
        |ORDER BY p_brand ASC NULLS LAST, channel ASC NULLS LAST""".stripMargin),

    // ---- q34/q73-style: orders whose line count sits in a band, joined
    //      back to the customer dim (count-distribution join-back) ----
    "tpcds_q34_lines_band" -> Q.sqlSame(
      """SELECT c_name, c_custkey, o_orderkey, cnt
        |FROM (
        |  SELECT l_orderkey AS okey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING COUNT(*) BETWEEN 5 AND 7) ln
        |JOIN orders ON o_orderkey = okey
        |JOIN customer ON c_custkey = o_custkey
        |WHERE o_orderstatus = 'F'
        |ORDER BY cnt DESC NULLS LAST, c_name ASC NULLS LAST, o_orderkey ASC NULLS LAST
        |LIMIT 200""".stripMargin)
  )
}
