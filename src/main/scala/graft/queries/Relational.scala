package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Relational-operator coverage beyond the TPC-H suite, one declared query
  * per operator family from SURVEY.md §2.1: join variants
  * (operator/LookupJoinOperators.java:45-62, NestedLoopJoinOperator.java,
  * HashSemiJoinOperator.java), set operations (plan/UnionNode.java,
  * ImplementIntersectAndExceptAsUnion.java), grouping sets
  * (operator/GroupIdOperator.java), sorts/limits (OrderByOperator.java,
  * TopNOperator.java, ImplementOffset.java), unnest
  * (operator/unnest/UnnestOperator.java), values (ValuesOperator.java),
  * distinct-limit (DistinctLimitOperator.java), mark-distinct
  * (MarkDistinctOperator.java), and aggregate functions
  * (operator/aggregation/, FunctionRegistry.java:415-642).
  *
  * Scale stance: dims are broadcast (explicit hint or AQE), fact-side
  * aggregations run partial/final, and every query is expressible as a
  * single declarative plan with no driver-side iteration.
  */
object Relational {

  val qs: Map[String, Q] = Map(

    // ================= joins =================

    // Broadcast inner join, DataFrame API (DetermineJoinDistributionType
    // REPLICATED analog — dim side explicitly broadcast).
    "join_inner_broadcast" -> Q.df(
      """SELECT n_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val sup = Tables.t(s, dir, "supplier")
      val nat = Tables.t(s, dir, "nation")
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          call_function("dsum8", col("s_acctbal")).as("total_bal"))
        .orderBy(col("n_name").asc_nulls_last)
    },

    // LEFT OUTER with null-producing right side (LookupJoinOperator PROBE_OUTER).
    "join_left_outer" -> Q.sqlSame(
      """SELECT o_orderkey, o_orderstatus, big.max_qty
        |FROM orders
        |LEFT JOIN (
        |  SELECT l_orderkey, MAX(l_quantity) AS max_qty
        |  FROM lineitem WHERE l_quantity >= 49 GROUP BY l_orderkey) big
        |ON o_orderkey = big.l_orderkey
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // RIGHT OUTER (LOOKUP_OUTER analog).
    "join_right_outer" -> Q.sqlSame(
      """SELECT big.l_orderkey AS k, big.n_lines, o_orderkey, o_orderstatus
        |FROM (
        |  SELECT l_orderkey, COUNT(*) AS n_lines
        |  FROM lineitem WHERE l_quantity >= 49 GROUP BY l_orderkey) big
        |RIGHT JOIN orders ON o_orderkey = big.l_orderkey
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // FULL OUTER join of two disjoint-ish aggregates (FULL_OUTER variant).
    "join_full_outer" -> Q.sqlSame(
      """SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_customers, s.n_suppliers
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
        |      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
        |      FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
        |ON c.nk = s.nk
        |ORDER BY nationkey ASC NULLS LAST""".stripMargin),

    // LEFT SEMI via DataFrame API (HashSemiJoinOperator / SemiJoinNode).
    "join_left_semi" -> Q.df(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val cust = Tables.t(s, dir, "customer")
      val big = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc_nulls_last)
    },

    // LEFT ANTI via DataFrame API (semi join + NOT(match) filter analog).
    "join_left_anti" -> Q.df(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val cust = Tables.t(s, dir, "customer")
      val recent = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc_nulls_last)
    },

    // CROSS JOIN (NestedLoopJoinOperator).
    "join_cross" -> Q.sqlSame(
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin),

    // Skew-salted equi-join (Engine.saltedJoin): the manual mitigation for
    // the hot-key regime AQE's skew split cannot handle (dim too big to
    // broadcast, downstream distribution pinned — SCALE_r08.md's skew
    // notes). The salt is a deterministic hash, so the result is a pure
    // function of the data; the oracle runs the UNSALTED join — value
    // equality proves the salt spreads and reassembles without dropping
    // or duplicating a single row.
    "join_salted_skew" -> Q.df(
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin) { (s, dir) =>
      graft.Engine.saltedJoin(
          Tables.t(s, dir, "lineitem"),
          Tables.t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
          "l_orderkey", saltFactor = 8, saltBy = col("l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(call_function("dsum8", col("l_extendedprice")), 2)
            .as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    },

    // Non-equi theta join (NestedLoop + filter; BroadcastNestedLoopJoinExec).
    "join_non_equi" -> Q.sqlSame(
      """SELECT n1.n_nationkey AS a, n2.n_nationkey AS b
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_nationkey < n2.n_nationkey
        | AND n1.n_regionkey = n2.n_regionkey
        |ORDER BY a ASC NULLS LAST, b ASC NULLS LAST""".stripMargin),

    // Point-in-interval range join on the BUCKETED scale path
    // (operators/RangeJoin.scala): the same BETWEEN predicate the oracle
    // executes as a nested loop runs here as ONE hash join on quantized
    // buckets + exact verify — the shape that survives two large sides at
    // 100 TB, where join_non_equi's nested loop cannot. Auto bucket width
    // (= avg interval span, 200.0 here) exercises the 1-row stats sizing.
    "join_range_bucketed" -> Q.df(duck =
      """SELECT p_partkey, COUNT(*) AS n_in_band,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS qty_in_band
        |FROM part JOIN lineitem
        |  ON l_extendedprice BETWEEN p_retailprice * 10 - 100
        |                         AND p_retailprice * 10 + 100
        |WHERE p_partkey <= 200
        |GROUP BY p_partkey
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      headline = true) { (s, dir) =>
      val bands = Tables.t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          (col("p_retailprice") * 10 - 100).as("band_lo"),
          (col("p_retailprice") * 10 + 100).as("band_hi"))
      val points = Tables.t(s, dir, "lineitem")
        .select(col("l_extendedprice"), col("l_quantity"))
      graft.operators.RangeJoin.pointInInterval(
          points, "l_extendedprice", bands, "band_lo", "band_hi")
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_in_band"),
          call_function("dsum8", col("l_quantity")).as("qty_in_band"))
        .orderBy(col("p_partkey").asc_nulls_last)
    },

    // The LEFT OUTER enrichment form of the bucketed range join: every
    // point survives, unmatched ones once with null band columns (the
    // lookup-table shape). The oracle runs the raw LEFT JOIN BETWEEN;
    // the unmatched bulk collapses under band_key = -1.
    "join_range_bucketed_left" -> Q.df(
      """SELECT COALESCE(p_partkey, -1) AS band_key, COUNT(*) AS n
        |FROM lineitem LEFT JOIN (
        |  SELECT p_partkey, p_retailprice * 10 - 100 AS band_lo,
        |         p_retailprice * 10 + 100 AS band_hi
        |  FROM part WHERE p_partkey <= 200) bands
        |ON l_extendedprice BETWEEN band_lo AND band_hi
        |GROUP BY COALESCE(p_partkey, -1)
        |ORDER BY band_key ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val bands = Tables.t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          (col("p_retailprice") * 10 - 100).as("band_lo"),
          (col("p_retailprice") * 10 + 100).as("band_hi"))
      val points = Tables.t(s, dir, "lineitem").select(col("l_extendedprice"))
      graft.operators.RangeJoin.pointInIntervalLeft(
          points, "l_extendedprice", bands, "band_lo", "band_hi")
        .groupBy(coalesce(col("p_partkey"), lit(-1L)).as("band_key"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("band_key").asc_nulls_last)
    },

    // Interval-overlap join on the bucketed scale path: two interval
    // tables (price bands off part, balance bands off supplier), pairs
    // wherever the closed intervals intersect. The oracle runs the raw
    // overlap theta join; the Spark side buckets BOTH sides and dedups
    // by the overlap-start rule (RangeJoin.intervalOverlap) — one hash
    // shuffle, no nested loop, each true pair emitted exactly once.
    "join_interval_overlap" -> Q.df(
      """WITH a AS (
        |  SELECT p_partkey, p_retailprice * 10 - 150 AS a_lo,
        |         p_retailprice * 10 + 150 AS a_hi
        |  FROM part WHERE p_partkey <= 400),
        |b AS (
        |  SELECT s_suppkey, s_nationkey, s_acctbal AS b_lo,
        |         s_acctbal + 400 AS b_hi
        |  FROM supplier)
        |SELECT s_nationkey, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT p_partkey) AS n_parts
        |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val a = Tables.t(s, dir, "part").filter(col("p_partkey") <= 400)
        .select(col("p_partkey"),
          (col("p_retailprice") * 10 - 150).as("a_lo"),
          (col("p_retailprice") * 10 + 150).as("a_hi"))
      val b = Tables.t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"),
          col("s_acctbal").as("b_lo"),
          (col("s_acctbal") + 400).as("b_hi"))
      graft.operators.RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("p_partkey")).as("n_parts"))
        .orderBy(col("s_nationkey").asc_nulls_last)
    },

    // ================= set operations =================

    "setop_union_all" -> Q.sqlSame(
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9990
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9900
        |) u ORDER BY k ASC NULLS LAST""".stripMargin),

    "setop_union_distinct" -> Q.sqlSame(
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9990
        |  UNION
        |  SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9900
        |) u ORDER BY k ASC NULLS LAST""".stripMargin),

    "setop_intersect" -> Q.sqlSame(
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
        |  INTERSECT
        |  SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9500
        |) u ORDER BY k ASC NULLS LAST""".stripMargin),

    "setop_except" -> Q.sqlSame(
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
        |  EXCEPT
        |  SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9500
        |) u ORDER BY k ASC NULLS LAST""".stripMargin),

    // ================= grouping sets / rollup / cube =================

    "agg_grouping_sets" -> Q.sqlSame(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |  COALESCE(l_linestatus, 'ALL') AS lstatus,
        |  GROUPING(l_returnflag) AS g_rflag, GROUPING(l_linestatus) AS g_lstatus,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY rflag ASC NULLS LAST, lstatus ASC NULLS LAST, g_rflag ASC NULLS LAST, g_lstatus ASC NULLS LAST""".stripMargin),

    "agg_rollup" -> Q.sqlSame(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |  COALESCE(l_linestatus, 'ALL') AS lstatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rflag ASC NULLS LAST, lstatus ASC NULLS LAST""".stripMargin),

    "agg_cube" -> Q.sqlSame(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |  COALESCE(l_linestatus, 'ALL') AS lstatus,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rflag ASC NULLS LAST, lstatus ASC NULLS LAST""".stripMargin),

    // ================= aggregate functions =================

    // count/sum/avg/min/max + FILTER clause (ImplementFilteredAggregations).
    "agg_filter_clause" -> Q.sqlSame(
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS sum_discounted,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // Multiple DISTINCT aggregates (MarkDistinctOperator analog).
    "agg_multi_distinct" -> Q.sqlSame(
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_custs,
        |  COUNT(DISTINCT o_orderpriority) AS n_prios,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS LAST""".stripMargin),

    // bool_and/bool_or/count_if (BooleanAndAggregation, CountIfAggregation).
    // COUNT_IF cast to BIGINT: DuckDB returns HUGEINT which the driver's
    // pandas comparator renders as float64 and hash-mismatches.
    "agg_boolean" -> Q.sqlSame(
      """SELECT l_returnflag,
        |  BOOL_AND(l_quantity > 0) AS all_positive,
        |  BOOL_OR(l_quantity > 49) AS any_huge,
        |  CAST(COUNT_IF(l_discount = 0.0) AS BIGINT) AS n_no_discount
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // bit_and/bit_or (BitwiseAndAggregation, BitwiseOrAggregation).
    "agg_bitwise" -> Q.sqlSame(
      """SELECT o_orderstatus,
        |  BIT_AND(o_orderkey) AS and_keys,
        |  BIT_OR(o_orderkey) AS or_keys
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS LAST""".stripMargin),

    // min_by/max_by (minmaxby/AbstractMinMaxBy.java) — keyed on a unique col.
    "agg_min_max_by" -> Q.sqlSame(
      """SELECT o_orderstatus,
        |  MIN_BY(o_orderpriority, o_orderkey) AS first_prio,
        |  MAX_BY(o_orderpriority, o_orderkey) AS last_prio
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS LAST""".stripMargin),

    // Statistical aggregates (VarianceAggregation, CentralMomentsAggregation,
    // DoubleCovarianceAggregation, DoubleRegressionAggregation) — expressed
    // as exact-decimal moment sums so both engines compute the identical
    // closed formula (engine-internal one-pass algorithms differ in low bits).
    // Final outputs rounded to 6 dp: the closed formulas subtract huge
    // near-equal doubles (sx*sx/n ~ 1e18), so the engines' decimal→double
    // cast rounding surfaces at ~1e-10 relative — rounding restores equality.
    // Output rounding is magnitude-aware: the decimal→double input casts
    // differ by 1 ulp between engines above ~15 significant digits (seen
    // at sf0.1), and the (sxx − sx²/n) cancellation amplifies that ulp
    // into the 6th decimal of a ~1e9 variance. 2dp on the variance terms
    // keeps 11 significant digits — far above the ulp noise — while corr
    // (normalized) stays at 6dp.
    "agg_statistics" -> Q.sqlSame(
      """SELECT l_returnflag,
        |  ROUND((sxx - sx * sx / n) / (n - 1), 2) AS var_samp_price,
        |  ROUND((sxx - sx * sx / n) / n, 2) AS var_pop_price,
        |  ROUND((sxy - sx * sy / n) / (n - 1), 2) AS covar_samp_price_qty,
        |  ROUND((sxy - sx * sy / n) / ((n - 1) * SQRT((sxx - sx * sx / n) / (n - 1)) * SQRT((syy - sy * sy / n) / (n - 1))), 6) AS corr_price_qty,
        |  ROUND((sxy - sx * sy / n) / (syy - sy * sy / n), 4) AS regr_slope_price_qty
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag) m
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // array_agg with deterministic order → string (arrayagg/ArrayAggregationFunction).
    "agg_array_collect" -> Q.sql(
      spark = """SELECT n_regionkey,
        |  concat_ws(',', sort_array(collect_list(n_name))) AS nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS LAST""".stripMargin),

    // checksum-style order-independent content hash (ChecksumAggregationFunction
    // — the reference's own verifier primitive): sum of per-row xxhash64.
    // DuckDB has no xxhash64, so the digest VALUE is not cross-checkable;
    // the oracle checks the property the digest exists for — invariance
    // under physical partitioning (4-way vs 32-way repartitionings of the
    // same rows must sum to the same digest) — plus group counts vs DuckDB.
    "agg_checksum_rows" -> Q.df(
      """SELECT l_returnflag, COUNT(*) AS n_rows, true AS chk_invariant
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      def chk(parts: Int) = li.repartition(parts, col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(expr("SUM(CAST(xxhash64(CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING)) AS DECIMAL(38,0)))")
            .as(s"chk_$parts"),
          count(lit(1)).as(s"cnt_$parts"))
      chk(4).join(chk(32), "l_returnflag")
        .select(col("l_returnflag"), col("cnt_4").as("n_rows"),
          (col("chk_4") === col("chk_32")).as("chk_invariant"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    },

    // geometric_mean (GeometricMeanAggregations) via exact log-sum rewrite.
    "agg_geometric_mean" -> Q.sqlSame(
      """SELECT l_returnflag,
        |  ROUND(EXP(CAST(SUM(CAST(LN(l_quantity) AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*)), 6) AS geo_mean_qty
        |FROM lineitem WHERE l_quantity > 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // ================= sorts / limits / distinct =================

    // Global sort with explicit null ordering (OrderByOperator; Presto
    // defaults NULLS LAST for ASC — SURVEY §7.4.4).
    "sort_nulls_ordering" -> Q.sqlSame(
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status
        |FROM orders WHERE o_orderkey < 3000
        |ORDER BY status ASC NULLS LAST, o_orderkey DESC NULLS LAST""".stripMargin),

    // Full 6-key distributed sort, no limit — the reference's
    // distributed_sort benchmark family (presto-benchto-benchmarks/.../
    // sql/presto/distributed_sort/, BASELINE.md row): Spark plans a
    // range-partitioned global sort (sampled split points, per-partition
    // sort, ordered output), its MergeOperator analog. (l_orderkey,
    // l_linenumber) makes the order total.
    "sort_distributed_6col" -> Q.sqlSame(
      """SELECT l_shipdate, l_returnflag, l_linestatus, l_quantity,
        |  l_extendedprice, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_shipdate ASC NULLS LAST, l_returnflag ASC NULLS LAST,
        |  l_linestatus ASC NULLS LAST, l_quantity DESC NULLS LAST,
        |  l_extendedprice ASC NULLS LAST, l_orderkey ASC NULLS LAST,
        |  l_linenumber ASC NULLS LAST""".stripMargin),

    // Top-N (TopNOperator → TakeOrderedAndProjectExec).
    "sort_topn" -> Q.sqlSame(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
        |LIMIT 25""".stripMargin),

    // LIMIT + OFFSET (LimitOperator + ImplementOffset).
    "sort_limit_offset" -> Q.sqlSame(
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey ASC NULLS LAST
        |LIMIT 10 OFFSET 20""".stripMargin),

    // FETCH FIRST n ROWS WITH TIES, desugared by PrestoSql.sql into a
    // rank() filter (the reference's ImplementLimitWithTies.java rewrite;
    // Spark optimizes rank<=n into WindowGroupLimit). The coarse bucket
    // key guarantees ties at the cut, so the result exceeds n rows and the
    // tied boundary group is fully included — the semantics LIMIT lacks.
    "limit_with_ties" -> Q.df(
      """SELECT o_orderkey, o_custkey, price_bucket FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS price_bucket,
        |    rank() OVER (ORDER BY CAST(FLOOR(o_totalprice / 10000) AS BIGINT) DESC) AS rk
        |  FROM orders WHERE o_orderkey < 2000) t
        |WHERE rk <= 10
        |ORDER BY price_bucket DESC, o_orderkey ASC""".stripMargin) { (s, dir) =>
      graft.PrestoSql.sql(s,
        """SELECT o_orderkey, o_custkey,
          |  CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS price_bucket
          |FROM orders WHERE o_orderkey < 2000
          |ORDER BY price_bucket DESC FETCH FIRST 10 ROWS WITH TIES""".stripMargin)
    },

    // DISTINCT + LIMIT fused (DistinctLimitOperator).
    "distinct_limit" -> Q.sqlSame(
      """SELECT DISTINCT o_orderpriority FROM orders
        |ORDER BY o_orderpriority ASC NULLS LAST
        |LIMIT 3""".stripMargin),

    // IS DISTINCT FROM operator (type/*Operators.java IS DISTINCT FROM).
    "expr_is_distinct_from" -> Q.sqlSame(
      """SELECT o_orderkey,
        |  NULLIF(o_orderstatus, 'O') IS DISTINCT FROM NULLIF(o_orderstatus, 'F') AS d
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // CASE / COALESCE / NULLIF scalar conditionals.
    "expr_conditionals" -> Q.sqlSame(
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status,
        |  GREATEST(o_totalprice, 150000.0) AS floor_price,
        |  LEAST(o_totalprice, 150000.0) AS cap_price
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ================= values / unnest / lateral =================

    // VALUES inline relation (ValuesOperator).
    "values_inline" -> Q.sqlSame(
      """SELECT id, name, CAST(score AS DOUBLE) AS score FROM (VALUES
        |  (1, 'alpha', 3.5), (2, 'beta', 1.25), (3, 'gamma', 9.0)) AS t(id, name, score)
        |ORDER BY id ASC NULLS LAST""".stripMargin),

    // UNNEST of a split array (UnnestOperator → Generate/explode).
    "unnest_words" -> Q.df(
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) w
        |GROUP BY word
        |ORDER BY n DESC NULLS LAST, word ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc_nulls_last, col("word").asc_nulls_last)
    },

    // UNNEST WITH ORDINALITY (posexplode; ArrayUnnester ordinality channel).
    "unnest_with_ordinality" -> Q.df(
      """SELECT p_partkey, pos, word
        |FROM (SELECT p_partkey,
        |        unnest(string_split(p_name, ' ')) AS word,
        |        unnest(generate_series(1, len(string_split(p_name, ' ')))) AS pos
        |      FROM part) u
        |WHERE p_partkey < 50
        |ORDER BY p_partkey ASC NULLS LAST, pos ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "part")
        .filter(col("p_partkey") < 50)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos0", "word")))
        .select(col("p_partkey"), (col("pos0") + 1).cast("long").as("pos"), col("word"))
        .orderBy(col("p_partkey").asc_nulls_last, col("pos").asc_nulls_last)
    },

    // LATERAL correlated subquery (CorrelatedJoinNode / lateral join).
    "lateral_topn_per_region" -> Q.sqlSame(
      """SELECT r_name, t.n_name, t.n_custs
        |FROM region, LATERAL (
        |  SELECT n_name, COUNT(*) AS n_custs
        |  FROM nation JOIN customer ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = r_regionkey
        |  GROUP BY n_name
        |  ORDER BY n_custs DESC NULLS LAST, n_name ASC NULLS LAST
        |  LIMIT 2) t
        |ORDER BY r_name ASC NULLS LAST, t.n_custs DESC NULLS LAST, t.n_name ASC NULLS LAST""".stripMargin),

    // Uncorrelated scalar subquery (EnforceSingleRowOperator).
    "subquery_scalar" -> Q.sqlSame(
      """SELECT o_orderkey, o_totalprice,
        |  o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) FROM orders) AS delta_from_mean
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // IN-list predicate (discrete TupleDomain pushdown analog).
    "filter_in_list" -> Q.sqlSame(
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#21') AND p_size IN (1, 5, 9)
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // BERNOULLI TABLESAMPLE (SampleNode) — the sampled row SET is
    // engine-specific, so the oracle checks the sampling contract instead:
    // the realized rate sits inside a 6σ binomial CI around p=0.1, and the
    // same seed draws the same sample (both booleans DuckDB-trivial).
    "sample_bernoulli" -> Q.df(
      "SELECT true AS rate_in_ci, true AS deterministic") { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"))
      val total = li.agg(count(lit(1)).as("n"))
      val k1 = li.sample(0.1, seed = 42).agg(count(lit(1)).as("k1"))
      val k2 = li.sample(0.1, seed = 42).agg(count(lit(1)).as("k2"))
      total.crossJoin(k1).crossJoin(k2)
        .select(
          (abs(col("k1") - lit(0.1) * col("n")) <=
            lit(6.0) * sqrt(col("n") * lit(0.1) * lit(0.9))).as("rate_in_ci"),
          (col("k1") === col("k2")).as("deterministic"))
    }
  )
}
