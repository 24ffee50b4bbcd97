package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Declared queries for the custom aggregate functions (SURVEY.md §7.3):
  * HLL sketches, histogram/map aggregates, checksum, min_by/max_by(n),
  * reduce_agg. Sketch estimates are engine-specific, so oracles pick
  * cardinalities small enough that the HLL linear-counting range is exact;
  * map outputs are stringified in sorted key order for stable comparison.
  */
object Sketches {

  val qs: Map[String, Q] = Map(

    // approx_set + cardinality, grouped — cardinalities here sit in the
    // linear-counting range where the estimate is exact
    // (ApproximateSetAggregation.java / HyperLogLogFunctions.java).
    "sketch_hll_cardinality" -> Q.sql(
      spark = """SELECT o_orderpriority,
        |  cardinality(approx_set(o_custkey % 40)) AS n_custs_approx,
        |  cardinality(approx_set(o_orderstatus)) AS n_status
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey % 40) AS n_custs_approx,
        |  COUNT(DISTINCT o_orderstatus) AS n_status
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin),

    // Two-level rollup: per-group sketches unioned with merge(), the
    // re-aggregation pattern HLL exists for (MergeHyperLogLogAggregation
    // .java) — a 100-TB-friendly distinct-count rollup.
    "sketch_hll_merge" -> Q.sql(
      spark = """SELECT cardinality(merge(s)) AS n_parts
        |FROM (SELECT l_returnflag, approx_set(l_partkey % 60) AS s
        |      FROM lineitem GROUP BY l_returnflag)""".stripMargin,
      duck = """SELECT COUNT(DISTINCT l_partkey % 60) AS n_parts
        |FROM lineitem""".stripMargin),

    // histogram → map<value, count>, stringified sorted for the oracle
    // (histogram/Histogram.java:147).
    "agg_histogram" -> Q.sql(
      spark = """SELECT o_orderpriority,
        |  concat_ws(',', sort_array(transform(map_entries(histogram(o_orderstatus)),
        |    e -> concat(e.key, ':', CAST(e.value AS STRING))))) AS status_hist
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderpriority,
        |  string_agg(o_orderstatus || ':' || CAST(n AS VARCHAR), ',' ORDER BY o_orderstatus) AS status_hist
        |FROM (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |      FROM orders GROUP BY o_orderpriority, o_orderstatus) t
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin),

    // map_agg(k, v) — one entry per distinct key (MapAggregationFunction
    // .java); keys here are unique per group so the result is total.
    "agg_map_agg" -> Q.sql(
      spark = """SELECT n_regionkey,
        |  concat_ws(',', sort_array(transform(map_entries(map_agg(n_name, n_nationkey)),
        |    e -> concat(e.key, '=', CAST(e.value AS STRING))))) AS nation_keys
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT n_regionkey,
        |  string_agg(n_name || '=' || CAST(n_nationkey AS VARCHAR), ','
        |    ORDER BY n_name || '=' || CAST(n_nationkey AS VARCHAR)) AS nation_keys
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey ASC NULLS LAST""".stripMargin),

    // multimap_agg(k, v) → map<k, array<v>> (multimapagg/) — values sorted
    // inside each key for determinism.
    "agg_multimap_agg" -> Q.sql(
      spark = """SELECT
        |  concat_ws(';', sort_array(transform(map_entries(multimap_agg(c_mktsegment, c_custkey % 13)),
        |    e -> concat(e.key, ':', concat_ws(',', sort_array(e.value)))))) AS seg_map
        |FROM customer WHERE c_custkey < 80""".stripMargin,
      duck = """SELECT string_agg(kv, ';' ORDER BY kv) AS seg_map
        |FROM (SELECT c_mktsegment || ':' ||
        |        string_agg(CAST(c_custkey % 13 AS VARCHAR), ',' ORDER BY c_custkey % 13) AS kv
        |      FROM customer WHERE c_custkey < 80
        |      GROUP BY c_mktsegment) t""".stripMargin),

    // map_union over per-row maps (MapUnionAggregation.java).
    "agg_map_union" -> Q.sql(
      spark = """SELECT
        |  concat_ws(',', sort_array(transform(map_entries(
        |    map_union(map(n_name, n_nationkey))),
        |    e -> concat(e.key, '=', CAST(e.value AS STRING))))) AS all_nations
        |FROM nation""".stripMargin,
      duck = """SELECT string_agg(n_name || '=' || CAST(n_nationkey AS VARCHAR), ','
        |    ORDER BY n_name || '=' || CAST(n_nationkey AS VARCHAR)) AS all_nations
        |FROM nation""".stripMargin),

    // min_by/max_by with n (MinNAggregationFunction.java — TypedHeap) —
    // unique o_totalprice makes the top-3 deterministic.
    "agg_min_max_by_n" -> Q.sql(
      spark = """SELECT o_orderpriority,
        |  concat_ws(',', transform(max_by(o_orderkey, o_totalprice, 3), x -> CAST(x AS STRING))) AS top3_orders,
        |  concat_ws(',', transform(min_by(o_orderkey, o_totalprice, 3), x -> CAST(x AS STRING))) AS bottom3_orders,
        |  max_by(o_orderkey, o_totalprice) AS best_order
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderpriority,
        |  array_to_string(list(o_orderkey ORDER BY o_totalprice DESC)[1:3], ',') AS top3_orders,
        |  array_to_string(list(o_orderkey ORDER BY o_totalprice ASC)[1:3], ',') AS bottom3_orders,
        |  arg_max(o_orderkey, o_totalprice) AS best_order
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin),

    // reduce_agg with integer state so the fold is order-independent
    // (ReduceAggregationFunction.java).
    "agg_reduce_agg" -> Q.sql(
      spark = """SELECT l_returnflag,
        |  reduce_agg(CAST(ROUND(l_quantity * 100) AS BIGINT), CAST(0 AS BIGINT),
        |    (a, b) -> a + b, (a, b) -> a + b) AS qty_centisum
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin,
      duck = """SELECT l_returnflag,
        |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_centisum
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // approx_percentile — scalar, array and weighted forms (reference:
    // ApproximateLongPercentileAggregations.java + Array siblings). Oracle:
    // quantile_disc for the unweighted forms (the GK summary at default
    // accuracy has ≤2-rank error over ~20k-row groups, invisible on a
    // 50-value domain); quantile_cont over weight-expanded rows for the
    // weighted form (which rides Spark's exact percentile-with-frequency).
    "agg_approx_percentile" -> Q.sql(
      spark = """SELECT l_returnflag,
        |  approx_percentile(CAST(l_quantity AS BIGINT), 0.5) AS med_qty,
        |  approx_percentile(CAST(l_quantity AS BIGINT), 0.75) AS p75_qty,
        |  array_join(transform(
        |    approx_percentile(CAST(l_quantity AS BIGINT), array(0.25, 0.5, 0.75)),
        |    x -> CAST(x AS STRING)), ',') AS quartiles,
        |  approx_percentile(CAST(l_quantity AS BIGINT), CAST(l_linenumber AS BIGINT), 0.5) AS med_wt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin,
      duck = """WITH base AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |         CAST(l_linenumber AS BIGINT) AS w
        |  FROM lineitem),
        |expanded AS (
        |  SELECT l_returnflag, q
        |  FROM (SELECT l_returnflag, q, unnest(generate_series(1, w)) FROM base)),
        |agg AS (
        |  SELECT l_returnflag,
        |    quantile_disc(q, 0.5) AS med_qty,
        |    quantile_disc(q, 0.75) AS p75_qty,
        |    array_to_string(quantile_disc(q, [0.25, 0.5, 0.75]), ',') AS quartiles
        |  FROM base GROUP BY l_returnflag),
        |wagg AS (
        |  SELECT l_returnflag, CAST(ROUND(quantile_cont(q, 0.5)) AS BIGINT) AS med_wt
        |  FROM expanded GROUP BY l_returnflag)
        |SELECT l_returnflag, med_qty, p75_qty, quartiles, med_wt
        |FROM agg JOIN wagg USING (l_returnflag)
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // setdigest value type (type/setdigest/SetDigestFunctions.java):
    // per-group sketches compared pairwise with jaccard_index /
    // intersection_cardinality, plus cardinality on the digest itself.
    // Each group holds ≤400 distinct hashes — far below the 8192-entry
    // saturation point, where the digest keeps every hash and all three
    // operations are EXACT (and deterministic), so the oracle computes
    // the true set statistics relationally.
    "sketch_setdigest" -> Q.sql(
      spark = """WITH d AS (SELECT o_orderpriority AS p, make_set_digest(o_custkey % 400) AS dig,
        |                  COUNT(*) AS n
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT a.p AS pa, b.p AS pb,
        |  ROUND(jaccard_index(a.dig, b.dig), 6) AS jac,
        |  intersection_cardinality(a.dig, b.dig) AS icard,
        |  cardinality(a.dig) AS card_a
        |FROM d a JOIN d b ON a.p < b.p
        |ORDER BY pa ASC NULLS LAST, pb ASC NULLS LAST""".stripMargin,
      duck = """WITH s AS (SELECT DISTINCT o_orderpriority AS p, o_custkey % 400 AS v FROM orders),
        |c AS (SELECT p, COUNT(*) AS n FROM s GROUP BY p),
        |i AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS icount
        |      FROM s a JOIN s b ON a.v = b.v AND a.p < b.p GROUP BY a.p, b.p)
        |SELECT i.pa, i.pb,
        |  ROUND(CAST(icount AS DOUBLE) / (ca.n + cb.n - icount), 6) AS jac,
        |  icount AS icard,
        |  ca.n AS card_a
        |FROM i JOIN c ca ON ca.p = i.pa JOIN c cb ON cb.p = i.pb
        |ORDER BY pa ASC NULLS LAST, pb ASC NULLS LAST""".stripMargin),

    // Two-level setdigest rollup through merge() — same re-aggregation
    // shape as the HLL/qdigest rollups; exact below saturation.
    "sketch_setdigest_merge" -> Q.sql(
      spark = """SELECT cardinality(merge(dig)) AS n_custs
        |FROM (SELECT o_orderpriority, make_set_digest(o_custkey % 400) AS dig
        |      FROM orders GROUP BY o_orderpriority)""".stripMargin,
      duck = """SELECT COUNT(DISTINCT o_custkey % 400) AS n_custs
        |FROM orders""".stripMargin),

    // approx_distinct, both arities (ApproximateCountDistinctAggregation
    // .java). Cardinalities sit deep in the linear-counting regime of the
    // chosen precisions (default ≈5% ⇒ 2^9 registers vs ≤12 distinct;
    // 0.0040625 ⇒ 2^17 registers vs ≤100 distinct), where the estimate is
    // exact — and the hash layout is deterministic, so a green run is
    // stable, not lucky.
    "agg_approx_distinct" -> Q.sql(
      spark = """SELECT o_orderpriority,
        |  approx_distinct(o_custkey % 12) AS d_def,
        |  approx_distinct(o_custkey % 100, 0.0040625) AS d_eps
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey % 12) AS d_def,
        |  COUNT(DISTINCT o_custkey % 100) AS d_eps
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin),

    // numeric_histogram (NumericHistogram.java — Ben-Haim & Tom-Tov
    // streaming histogram). With more buckets (60) than distinct inputs
    // (l_quantity has ≤50 integral values) no bin ever merges, so the
    // sketch is exactly the per-value counts; lpad makes string order =
    // numeric order on both sides.
    "agg_numeric_histogram" -> Q.sql(
      spark = """SELECT l_returnflag,
        |  concat_ws(',', sort_array(transform(
        |    map_entries(numeric_histogram(60, CAST(l_quantity AS DOUBLE))),
        |    e -> concat(lpad(CAST(CAST(ROUND(e.key) AS BIGINT) AS STRING), 2, '0'),
        |                ':', CAST(CAST(ROUND(e.value) AS BIGINT) AS STRING))))) AS qty_hist
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin,
      duck = """SELECT l_returnflag,
        |  string_agg(lpad(CAST(q AS VARCHAR), 2, '0') || ':' || CAST(n AS VARCHAR), ','
        |    ORDER BY lpad(CAST(q AS VARCHAR), 2, '0')) AS qty_hist
        |FROM (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS q, COUNT(*) AS n
        |      FROM lineitem GROUP BY 1, 2) t
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // qdigest quantile sketches — sketch BYTES are engine-specific by
    // design, so the oracle checks the published accuracy contract instead
    // (the determinize-then-diff move of presto-verifier/.../Validator.java):
    // each estimate must land inside the exact-percentile window computed in
    // the same query, and the boolean verdict is what DuckDB re-derives as
    // trivially true. Rank-error bound ±0.03 is 3× the sketch's configured
    // 0.01 (QuantileDigestAggregationFunction.java).
    "sketch_qdigest_quantiles" -> Q.df(
      """SELECT l_returnflag, true AS median_ok, true AS p99_ok, true AS frac_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin) { (s, dir) =>
      s.sql(
        """SELECT l_returnflag,
          |  value_at_quantile(qdigest_agg(l_extendedprice), 0.5)
          |    BETWEEN percentile(l_extendedprice, 0.47) AND percentile(l_extendedprice, 0.53) AS median_ok,
          |  value_at_quantile(qdigest_agg(l_extendedprice), 0.99)
          |    BETWEEN percentile(l_extendedprice, 0.96) AND MAX(l_extendedprice) AS p99_ok,
          |  ABS(quantile_at_value(qdigest_agg(l_extendedprice), 30000.0)
          |    - AVG(CASE WHEN l_extendedprice <= 30000.0 THEN 1.0 ELSE 0.0 END)) <= 0.03 AS frac_ok
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin)
    },

    // Two-level qdigest rollup through merge() — per-group sketches
    // re-aggregated without rescanning, the same scale pattern as HLL.
    // Oracle form: merged-sketch median must land within ±0.05 rank of the
    // exact global median (merge adds error on top of the leaf sketches).
    "sketch_qdigest_merge" -> Q.df(
      "SELECT true AS global_median_ok") { (s, dir) =>
      s.sql(
        """SELECT
          |  (SELECT value_at_quantile(merge(s), 0.5)
          |   FROM (SELECT l_returnflag, qdigest_agg(l_quantity) AS s
          |         FROM lineitem GROUP BY l_returnflag))
          |  BETWEEN (SELECT percentile(l_quantity, 0.45) FROM lineitem)
          |      AND (SELECT percentile(l_quantity, 0.55) FROM lineitem) AS global_median_ok""".stripMargin)
    },

    // checksum — DuckDB has no xxhash64, so the digest VALUE is not
    // cross-checkable; the oracle checks the property checksum exists for
    // (ChecksumAggregationFunction.java is Presto's own verifier
    // primitive): the digest is invariant under physical partitioning —
    // the same groups hashed under 4-way and 32-way repartitionings must
    // produce identical digests, and the group cardinalities match DuckDB.
    "agg_checksum" -> Q.df(
      """SELECT o_orderpriority, COUNT(*) AS n_rows, true AS chk_invariant
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      def chk(parts: Int) = o.repartition(parts, col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(expr("hex(checksum(o_orderkey))").as(s"chk_$parts"),
          count(lit(1)).as(s"cnt_$parts"))
      chk(4).join(chk(32), "o_orderpriority")
        .select(col("o_orderpriority"), col("cnt_4").as("n_rows"),
          (col("chk_4") === col("chk_32")).as("chk_invariant"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    },

    // approx_most_frequent (SpaceSaving heavy hitters; sketches/
    // SpaceSaving.scala) — top-5 words per document source. Capacity 1024
    // far exceeds the corpus vocabulary, so no partial ever evicts and the
    // summary is exactly the per-word counts (the SetDigest
    // exact-below-saturation stance); map entries are emitted in
    // (count desc, word asc) order, which the oracle re-derives exactly.
    // The eviction path (capacity < distinct) is property-tested in
    // SketchesSpec on a zipfian stream.
    "agg_approx_most_frequent" -> Q.sql(
      spark = """SELECT src,
        |  concat_ws(',', transform(
        |    map_entries(approx_most_frequent(5, word, 1024)),
        |    e -> concat(e.key, ':', CAST(e.value AS STRING)))) AS top_words
        |FROM (SELECT source AS src, explode(split(lower(text), ' ')) AS word
        |      FROM documents) t
        |WHERE word <> ''
        |GROUP BY src
        |ORDER BY src ASC NULLS LAST""".stripMargin,
      duck = """SELECT src,
        |  string_agg(word || ':' || CAST(n AS VARCHAR), ',' ORDER BY n DESC, word ASC) AS top_words
        |FROM (
        |  SELECT src, word, n,
        |    row_number() OVER (PARTITION BY src ORDER BY n DESC, word ASC) AS rk
        |  FROM (
        |    SELECT src, word, COUNT(*) AS n
        |    FROM (SELECT source AS src, unnest(string_split(lower(text), ' ')) AS word
        |          FROM documents) u
        |    WHERE word <> ''
        |    GROUP BY src, word) c) r
        |WHERE rk <= 5
        |GROUP BY src
        |ORDER BY src ASC NULLS LAST""".stripMargin)
  )
}
