package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions.{col, lit, timestamp_millis, unix_millis}

/** Oracle-checked queries exercising the Presto-named gap-fill functions
  * registered by [[graft.functions.Rewrites]]/[[graft.functions.Udfs]]
  * (reference surface: presto-main/.../metadata/FunctionRegistry.java:403-655).
  * The Spark texts use the reference's function names; the DuckDB side
  * spells the same value out of built-ins — proving the compat layer
  * computes the right thing, not merely that it parses.
  */
object Compat {

  val qs: Map[String, Q] = Map(

    // strpos/levenshtein_distance/codepoint (StringFunctions.java) +
    // hamming_distance + normalize (UDF side) — all value-checked.
    "compat_string_fns" -> Q.sql(
      spark = """SELECT p_partkey,
        |  strpos(p_name, 'a') AS pos_a,
        |  levenshtein_distance(p_brand, p_type) AS lev,
        |  codepoint(substr(p_name, 1, 1)) AS cp,
        |  hamming_distance(substr(rpad(p_name, 8, '_'), 1, 8), substr(rpad(p_brand, 8, '_'), 1, 8)) AS ham,
        |  normalize(p_name, 'NFC') AS norm,
        |  to_base(p_partkey, 16) AS hex_key,
        |  from_base(to_base(p_partkey, 16), 16) AS roundtrip
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  strpos(p_name, 'a') AS pos_a,
        |  levenshtein(p_brand, p_type) AS lev,
        |  ord(substr(p_name, 1, 1)) AS cp,
        |  hamming(substr(rpad(p_name, 8, '_'), 1, 8), substr(rpad(p_brand, 8, '_'), 1, 8)) AS ham,
        |  nfc_normalize(p_name) AS norm,
        |  printf('%x', p_partkey) AS hex_key,
        |  p_partkey AS roundtrip
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // Presto datetime field accessors (DateTimeFunctions.java): ISO
    // day-of-week/week-year vs Spark's Sunday-based dayofweek.
    "compat_datetime_fields" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  day_of_week(o_orderdate) AS dow_iso,
        |  day_of_year(o_orderdate) AS doy,
        |  week_of_year(o_orderdate) AS woy,
        |  year_of_week(o_orderdate) AS iso_year,
        |  last_day_of_month(o_orderdate) AS eom,
        |  to_unixtime(o_orderdate) AS epoch_d,
        |  CAST(from_unixtime(to_unixtime(o_orderdate)) AS TIMESTAMP_NTZ) AS ts_roundtrip
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  isodow(o_orderdate) AS dow_iso,
        |  dayofyear(o_orderdate) AS doy,
        |  weekofyear(o_orderdate) AS woy,
        |  isoyear(o_orderdate) AS iso_year,
        |  last_day(o_orderdate) AS eom,
        |  epoch(o_orderdate) AS epoch_d,
        |  CAST(to_timestamp(epoch(o_orderdate)) AS TIMESTAMP) AS ts_roundtrip
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // Presto 3-arg date_add/date_diff. Spark's parser owns these names at
    // the grammar level (unit must be an unquoted identifier — quoted
    // Presto-style units are rejected before function resolution, so a
    // registry override cannot intercept them); the unquoted form below is
    // semantically identical to Presto's date_add('day', 30, ts).
    "compat_datetime_arith" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  date_add(DAY, 30, o_orderdate) AS plus_30d,
        |  date_add(HOUR, -6, o_orderdate) AS minus_6h,
        |  date_diff(DAY, TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
        |  date_diff(HOUR, TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS hours_since
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS plus_30d,
        |  o_orderdate - INTERVAL 6 HOUR AS minus_6h,
        |  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
        |  date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS hours_since
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // MySQL `%`-patterns (date_format/date_parse) and Joda patterns
    // (format_datetime/parse_datetime), translated at analysis time —
    // DuckDB strftime uses C tokens (%M = minute) as its own dialect.
    "compat_datetime_patterns" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  date_format(o_orderdate, '%Y-%m-%d %H:%i:%s') AS mysql_fmt,
        |  date_parse(date_format(o_orderdate, '%Y-%m-%d %H:%i:%s'), '%Y-%m-%d %H:%i:%s') AS mysql_roundtrip,
        |  format_datetime(o_orderdate, 'yyyy/MM/dd HH:mm') AS joda_fmt,
        |  parse_datetime(format_datetime(o_orderdate, 'yyyy/MM/dd HH:mm'), 'yyyy/MM/dd HH:mm') AS joda_roundtrip
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS mysql_fmt,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS mysql_roundtrip,
        |  strftime(o_orderdate, '%Y/%m/%d %H:%M') AS joda_fmt,
        |  strptime(strftime(o_orderdate, '%Y/%m/%d %H:%M'), '%Y/%m/%d %H:%M') AS joda_roundtrip
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // URL family (UrlFunctions.java) over URLs synthesized from part rows.
    "compat_url_fns" -> Q.sql(
      spark = """SELECT p_partkey,
        |  url_extract_protocol(u) AS proto,
        |  url_extract_host(u) AS host,
        |  url_extract_port(u) AS port,
        |  url_extract_path(u) AS path,
        |  url_extract_query(u) AS query,
        |  url_extract_fragment(u) AS frag,
        |  url_extract_parameter(u, 'id') AS param_id
        |FROM (SELECT p_partkey,
        |        'https://shop.example.com:8443/cat/item?id=' || CAST(p_partkey AS STRING)
        |          || '&size=' || CAST(p_size AS STRING) || '#top' AS u
        |      FROM part WHERE p_partkey < 300) t
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  'https' AS proto,
        |  'shop.example.com' AS host,
        |  CAST(8443 AS BIGINT) AS port,
        |  '/cat/item' AS path,
        |  'id=' || CAST(p_partkey AS VARCHAR) || '&size=' || CAST(p_size AS VARCHAR) AS query,
        |  'top' AS frag,
        |  CAST(p_partkey AS VARCHAR) AS param_id
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ngrams/cardinality/contains (Array*Function.java) + JSON accessors
    // (JsonFunctions.java) over the events.props JSON column.
    // bigrams serialized to one string per row (nested array cells crash the
    // driver's pandas sorting comparator; values compared via the join).
    "compat_array_json" -> Q.sql(
      spark = """SELECT event_id,
        |  cardinality(split(event_type, '_')) AS n_tokens,
        |  contains(split(event_type, '_'), 'click') AS has_click,
        |  array_join(transform(ngrams(split(event_type, '_'), 2), g -> array_join(g, ' ')), ',') AS bigrams,
        |  json_extract_scalar(props, '$.k') AS k_scalar,
        |  json_array_get('[' || CAST(event_id AS STRING) || ',' ||
        |    CAST(event_id * 2 AS STRING) || ']', 1) AS second_el
        |FROM events WHERE event_id < 500
        |ORDER BY event_id ASC NULLS LAST""".stripMargin,
      duck = """SELECT event_id,
        |  len(string_split(event_type, '_')) AS n_tokens,
        |  list_contains(string_split(event_type, '_'), 'click') AS has_click,
        |  array_to_string(list_transform(
        |    list_transform(generate_series(1, greatest(len(string_split(event_type, '_')) - 1, 1)),
        |      i -> string_split(event_type, '_')[i:i+1]),
        |    g -> array_to_string(g, ' ')), ',') AS bigrams,
        |  json_extract_string(props, '$.k') AS k_scalar,
        |  json_extract_string('[' || CAST(event_id AS VARCHAR) || ',' ||
        |    CAST(event_id * 2 AS VARCHAR) || ']', '$[1]') AS second_el
        |FROM events WHERE event_id < 500
        |ORDER BY event_id ASC NULLS LAST""".stripMargin),

    // truncate/is_finite/wilson intervals (MathFunctions.java,
    // WilsonInterval.java) — DuckDB side uses the closed formulas.
    "compat_math_misc" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  truncate(o_totalprice / 1000.0) AS trunc_k,
        |  is_finite(o_totalprice) AS fin,
        |  is_infinite(o_totalprice * CAST('Infinity' AS DOUBLE)) AS inf_mul,
        |  ROUND(wilson_interval_lower(CAST(o_orderkey % 100 AS DOUBLE), 100.0, 1.96), 9) AS wil_lo,
        |  ROUND(wilson_interval_upper(CAST(o_orderkey % 100 AS DOUBLE), 100.0, 1.96), 9) AS wil_hi
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  trunc(o_totalprice / 1000.0) AS trunc_k,
        |  isfinite(o_totalprice) AS fin,
        |  isinf(o_totalprice * CAST('Infinity' AS DOUBLE)) AS inf_mul,
        |  ROUND(((p + z2n/2) - 1.96 * sqrt(p*(1-p)/100.0 + z2n/4/100.0)) / (1 + z2n), 9) AS wil_lo,
        |  ROUND(((p + z2n/2) + 1.96 * sqrt(p*(1-p)/100.0 + z2n/4/100.0)) / (1 + z2n), 9) AS wil_hi
        |FROM (SELECT o_orderkey, o_totalprice,
        |        CAST(o_orderkey % 100 AS DOUBLE) / 100.0 AS p,
        |        1.96 * 1.96 / 100.0 AS z2n
        |      FROM orders) t
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // Statistical CDFs (MathFunctions.java normal_cdf/inverse_normal_cdf/
    // beta_cdf/inverse_beta_cdf). The oracle replicates the SAME published
    // algorithms in SQL — Numerical Recipes Chebyshev erf for normal_cdf,
    // Acklam's central branch for the probit (p ∈ [.05,.94] stays in it) —
    // so both engines run identical double arithmetic; beta_cdf is checked
    // against closed forms (I_x(2,1)=x², I_x(2,2)=3x²−2x³) at 6 dp, inside
    // the Lentz continued fraction's ~1e-11 convergence.
    "compat_cdf" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  ROUND(normal_cdf(0.0, 1.0, x), 7) AS ncdf,
        |  ROUND(inverse_normal_cdf(0.0, 1.0, p), 7) AS incdf,
        |  ROUND(beta_cdf(2.0, 1.0, u), 6) AS bcdf_sq,
        |  ROUND(beta_cdf(2.0, 2.0, u), 6) AS bcdf_22,
        |  ROUND(inverse_beta_cdf(1.0, 1.0, p), 6) AS ibcdf_id
        |FROM (SELECT o_orderkey,
        |        CAST(o_orderkey % 600 AS DOUBLE) / 100.0 - 3.0 AS x,
        |        (CAST(o_orderkey % 90 AS DOUBLE) + 5.0) / 100.0 AS p,
        |        (CAST(o_orderkey % 80 AS DOUBLE) + 10.0) / 100.0 AS u
        |      FROM orders WHERE o_orderkey < 1000) t
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(o_orderkey % 600 AS DOUBLE) / 100.0 - 3.0 AS x,
        |    (CAST(o_orderkey % 90 AS DOUBLE) + 5.0) / 100.0 AS p,
        |    (CAST(o_orderkey % 80 AS DOUBLE) + 10.0) / 100.0 AS u
        |  FROM orders WHERE o_orderkey < 1000),
        |e1 AS (SELECT *, abs(x / sqrt(2.0)) AS z FROM base),
        |e2 AS (SELECT *, 1.0 / (1.0 + 0.5 * z) AS t FROM e1),
        |e3 AS (SELECT *, t * exp(-z*z - 1.26551223 + t*(1.00002368 + t*(0.37409196 +
        |  t*(0.09678418 + t*(-0.18628806 + t*(0.27886807 + t*(-1.13520398 +
        |  t*(1.48851587 + t*(-0.82215223 + t*0.17087277))))))))) AS ans FROM e2),
        |erf AS (SELECT *, CASE WHEN x >= 0 THEN 1.0 - ans ELSE ans - 1.0 END AS erfv FROM e3),
        |probit AS (SELECT *, p - 0.5 AS q, (p - 0.5) * (p - 0.5) AS r FROM erf)
        |SELECT o_orderkey,
        |  ROUND(0.5 * (1.0 + erfv), 7) AS ncdf,
        |  ROUND((((((-3.969683028665376e+01*r + 2.209460984245205e+02)*r + -2.759285104469687e+02)*r
        |    + 1.383577518672690e+02)*r + -3.066479806614716e+01)*r + 2.506628277459239e+00)*q /
        |    (((((-5.447609879822406e+01*r + 1.615858368580409e+02)*r + -1.556989798598866e+02)*r
        |    + 6.680131188771972e+01)*r + -1.328068155288572e+01)*r + 1.0), 7) AS incdf,
        |  ROUND(u * u, 6) AS bcdf_sq,
        |  ROUND(u * u * (3.0 - 2.0 * u), 6) AS bcdf_22,
        |  ROUND(p, 6) AS ibcdf_id
        |FROM probit
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // word_stem (WordStemFunction.java; independent Porter 1980
    // implementation — functions/Udfs.scala PorterStemmer). Known-answer
    // oracle: the published algorithm's outputs for its classic example
    // vocabulary, inlined as VALUES on the DuckDB side (DuckDB's own
    // stem() lives in the unavailable fts extension).
    "compat_word_stem" -> Q.sql(
      spark = """SELECT word, word_stem(word) AS stem
        |FROM VALUES ('caresses'), ('ponies'), ('caress'), ('cats'), ('feed'),
        |  ('agreed'), ('plastered'), ('motoring'), ('sing'), ('conflated'),
        |  ('troubled'), ('sized'), ('hopping'), ('tanned'), ('falling'),
        |  ('hissing'), ('fizzed'), ('failing'), ('filing'), ('happy'), ('sky'),
        |  ('relational'), ('conditional'), ('rational'), ('digitizer'),
        |  ('operator'), ('feudalism'), ('decisiveness'), ('hopefulness'),
        |  ('callousness'), ('triplicate'), ('formative'), ('running'),
        |  ('generalizations') AS t(word)
        |ORDER BY word ASC NULLS LAST""".stripMargin,
      duck = """SELECT word, stem
        |FROM (VALUES ('caresses','caress'), ('ponies','poni'), ('caress','caress'),
        |  ('cats','cat'), ('feed','feed'), ('agreed','agre'),
        |  ('plastered','plaster'), ('motoring','motor'), ('sing','sing'),
        |  ('conflated','conflat'), ('troubled','troubl'), ('sized','size'),
        |  ('hopping','hop'), ('tanned','tan'), ('falling','fall'),
        |  ('hissing','hiss'), ('fizzed','fizz'), ('failing','fail'),
        |  ('filing','file'), ('happy','happi'), ('sky','sky'),
        |  ('relational','relat'), ('conditional','condit'),
        |  ('rational','ration'), ('digitizer','digit'), ('operator','oper'),
        |  ('feudalism','feudal'), ('decisiveness','decis'),
        |  ('hopefulness','hope'), ('callousness','callous'),
        |  ('triplicate','triplic'), ('formative','form'), ('running','run'),
        |  ('generalizations','gener')) t(word, stem)
        |ORDER BY word ASC NULLS LAST""".stripMargin),

    // cosine_similarity over adjacent embedding pairs — sequential double
    // folds on both sides so float summation order is identical.
    "compat_cosine_similarity" -> Q.sql(
      spark = """SELECT a.vec_id,
        |  ROUND(cosine_similarity(a.embedding, b.embedding), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 200
        |ORDER BY a.vec_id ASC NULLS LAST""".stripMargin,
      duck = """SELECT a.vec_id,
        |  ROUND(
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.embedding)),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)
        |    / NULLIF(
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(a.embedding)),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))), (x, y) -> x + y)) *
        |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, len(b.embedding)),
        |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), (x, y) -> x + y)), 0.0),
        |  6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 200
        |ORDER BY a.vec_id ASC NULLS LAST""".stripMargin),

    // Aggregate rewrites: geometric_mean / approx_distinct / arbitrary
    // (GeometricMeanAggregations.java, ApproximateCountDistinctAggregation
    // .java, ArbitraryAggregationFunction.java). approx_distinct's sketch
    // differs per engine, so the oracle checks exact COUNT(DISTINCT) on a
    // column where the HLL answer is exact (small cardinality).
    "compat_aggregates" -> Q.sql(
      spark = """SELECT l_returnflag,
        |  ROUND(geometric_mean(l_quantity), 6) AS geo_qty,
        |  approx_distinct(l_linestatus) AS n_status,
        |  arbitrary(l_returnflag) AS any_flag
        |FROM lineitem WHERE l_quantity > 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin,
      duck = """SELECT l_returnflag,
        |  ROUND(exp(avg(ln(l_quantity))), 6) AS geo_qty,
        |  COUNT(DISTINCT l_linestatus) AS n_status,
        |  MIN(l_returnflag) AS any_flag
        |FROM lineitem WHERE l_quantity > 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    // Session/context functions (Presto's current_user / current_date /
    // current_timestamp / current_catalog / current_schema surface,
    // SessionFunctions + ConnectorSession). The VALUES are
    // session-specific by definition ("root"/"spark_catalog" vs
    // "duckdb"/"memory"), so the oracle compares the determinized
    // contract: each function resolves non-null, and the session's
    // timestamp/date cohere.
    // PREPARE / EXECUTE ... USING / DEALLOCATE (grammar SqlBase.g4
    // statements; presto-main execution/PrepareTask.java): the Spark side
    // runs through the session prepared-statement registry with positional
    // `?` parameters — one of them a USING *expression* the layer
    // constant-folds (20 + 5), as the reference's EXECUTE planning does —
    // and the oracle re-states the query with the literals inlined.
    "compat_prepare_execute" -> Q.df(
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(30,8))) AS DOUBLE) AS total
        |FROM part WHERE p_size <= 25 AND p_type = 'PROMO'
        |GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS LAST""".stripMargin) { (s, _) =>
      val ps = new graft.PrestoSql.Prepared(s)
      ps.statement(
        """PREPARE part_band FROM
          |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt,
          |  CAST(SUM(CAST(p_retailprice AS DECIMAL(30,8))) AS DOUBLE) AS total
          |FROM part WHERE p_size <= ? AND p_type = ?
          |GROUP BY p_brand
          |ORDER BY p_brand ASC NULLS LAST""".stripMargin)
      ps.statement("EXECUTE part_band USING 20 + 5, 'PROMO'")
    },

    // ---- DESCRIBE OUTPUT (DescribeOutputRewrite.java:116-126 shape) ----
    // The JDBC-client metadata surface: a prepared statement's output
    // schema, parameter markers bound to NULL at analysis time, nothing
    // executed. Type names in the reference's spelling, Type Size by the
    // FixedWidthType rule. The oracle pins the exact seven-column shape.
    "compat_describe_output" -> Q.df(
      """SELECT * FROM (VALUES
        |  ('o_orderkey', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR), 'bigint', CAST(8 AS BIGINT), CAST(NULL AS BOOLEAN)),
        |  ('o_totalprice', NULL, NULL, NULL, 'double', 8, NULL),
        |  ('o_orderpriority', NULL, NULL, NULL, 'varchar', 0, NULL))
        |  t("Column Name", "Catalog", "Schema", "Table", "Type", "Type Size", "Aliased")
        |ORDER BY "Column Name" ASC NULLS LAST""".stripMargin) { (s, _) =>
      val ps = new graft.PrestoSql.Prepared(s)
      ps.statement("PREPARE describe_probe FROM SELECT o_orderkey, o_totalprice, " +
        "o_orderpriority FROM orders WHERE o_totalprice > ?")
      ps.statement("DESCRIBE OUTPUT describe_probe")
        .orderBy(col("Column Name").asc_nulls_last)
    },

    // ---- SHOW STATS FOR (ShowStatsRewrite.java:217 shape) ----
    // The reference serves stored table statistics; this engine computes
    // the same seven-column shape live in one aggregation pass. The
    // oracle recomputes every cell per column (data_size = byte length
    // sum for strings, exact NDV, nulls fraction, min/max rendered as
    // strings) plus the row_count summary row.
    "compat_show_stats" -> Q.df(
      {
        def colRow(c: String, str: Boolean) =
          s"""SELECT '$c' AS column_name,
             |  ${if (str) s"CAST(SUM(strlen($c)) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"} AS data_size,
             |  CAST(COUNT(DISTINCT $c) AS DOUBLE) AS distinct_values_count,
             |  CAST(COUNT(*) FILTER ($c IS NULL) AS DOUBLE) / COUNT(*) AS nulls_fraction,
             |  CAST(NULL AS DOUBLE) AS row_count,
             |  CAST(MIN($c) AS VARCHAR) AS low_value,
             |  CAST(MAX($c) AS VARCHAR) AS high_value
             |FROM nation""".stripMargin
        Seq(colRow("n_nationkey", str = false), colRow("n_name", str = true),
          colRow("n_regionkey", str = false))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n", s"""
            |UNION ALL
            |SELECT NULL, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
            |  CAST(NULL AS DOUBLE), CAST(COUNT(*) AS DOUBLE),
            |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM nation)
            |ORDER BY column_name ASC NULLS LAST""".stripMargin)
      }) { (s, _) =>
      new graft.PrestoSql.Prepared(s).statement("SHOW STATS FOR nation")
        .orderBy(col("column_name").asc_nulls_last)
    },

    "compat_session_fns" -> Q.sqlSame(
      """SELECT
        |  current_user IS NOT NULL AS has_user,
        |  current_schema() IS NOT NULL AS has_schema,
        |  current_database() IS NOT NULL AS has_database,
        |  current_catalog() IS NOT NULL AS has_catalog,
        |  CAST(current_timestamp AS DATE) = current_date AS ts_on_current_date,
        |  year(current_date) BETWEEN 2020 AND 2100 AS date_plausible""".stripMargin),

    // ---- timestamp-with-time-zone compat surface (the reference's
    //      TimestampWithTimeZoneType.java + DateTimeFunctions.java
    //      at_timezone/with_timezone/timezone_hour/timezone_minute; the
    //      repo models TSTZ as instant + zone-aware functions, SURVEY
    //      §7.4.1). Cross-engine differential over real IANA zones:
    //      at_timezone ≡ from_utc_timestamp ≡ DuckDB
    //      timezone(tz, instant); with_timezone⁻¹ roundtrip
    //      to_utc∘from_utc = identity — THROUGH THE DST-FREE Kathmandu
    //      zone, because the identity is false in a DST zone's fall-back
    //      hour (the ambiguous wall time resolves to one offset, shifting
    //      instants from the other) and the fixture's ts values change
    //      across driver regenerations; timezone_hour/minute derived from
    //      the epoch delta (floor-div — Spark CAST truncates where DuckDB
    //      CAST rounds, so floor() pins both). The +6-month column pushes
    //      America/Los_Angeles across the DST boundary (-8 winter /
    //      -7 summer both asserted); Asia/Kathmandu exercises the +5:45
    //      fractional offset (timezone_minute = 45) ----
    // ---- timestamp with time zone as a packed VALUE type ----
    // The reference's DateTimeEncoding.java representation (millisUtc<<12
    // | zoneKey over a bounded zone dictionary), carried in a BIGINT:
    // pack, unpack, at_timezone (instant-preserving rezone), wall-clock
    // field extraction and the canonical CAST-AS-VARCHAR presentation.
    // The oracle recomputes the packing arithmetic and the per-zone wall
    // times independently (epoch_ms × 4096 + key; ICU timezone()), so
    // the encoding and the zone semantics are both differentially
    // checked. Zones are assigned per row (user_id % 16) across the full
    // 16-entry dictionary, DST-observing zones included.
    "compat_tstz_type" -> Q.df(
      {
        val zoneValues = graft.functions.TimestampTz.zoneKeys
          .map { case (k, z) => s"($k, '$z')" }.mkString(", ")
        s"""WITH zones(zkey, zone) AS (VALUES $zoneValues),
           |e AS (
           |  SELECT event_id,
           |    make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000) AS ts,
           |    CAST(user_id % 16 AS INT) AS zkey
           |  FROM events WHERE event_id < 2000),
           |p AS (
           |  SELECT event_id, ts, z.zone, z.zkey,
           |    epoch_ms(ts) * 4096 + z.zkey AS packed
           |  FROM e JOIN zones z USING (zkey))
           |SELECT event_id, packed,
           |  strftime(timezone(zone, timezone('UTC', ts)), '%Y-%m-%d %H:%M:%S.%g')
           |    || ' ' || zone AS canonical,
           |  epoch_ms(ts) AS instant_ms,
           |  zone AS zid,
           |  CAST(hour(timezone(zone, timezone('UTC', ts))) AS BIGINT) AS hour_at_zone,
           |  strftime(ts, '%Y-%m-%d %H:%M:%S.%g') || ' UTC' AS at_utc,
           |  TRUE AS instant_eq_cross_zone
           |FROM p
           |ORDER BY event_id ASC NULLS LAST""".stripMargin
      }) { (s, dir) =>
      import graft.functions.{TimestampTz => Tz}
      val e = Tables.t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .withColumn("zone", Tz.zoneName(col("user_id") % 16))
        .withColumn("packed", Tz.pack(col("ts"), col("zone")))
      e.select(
        col("event_id"),
        col("packed"),
        Tz.toVarchar(col("packed")).as("canonical"),
        Tz.instantMillis(col("packed")).as("instant_ms"),
        Tz.zoneId(col("packed")).as("zid"),
        Tz.extract("hour", col("packed")).as("hour_at_zone"),
        Tz.toVarchar(Tz.atTimezone(col("packed"), lit("UTC"))).as("at_utc"),
        (Tz.instantMillis(Tz.pack(col("ts"), lit("UTC"))) ===
          Tz.instantMillis(col("packed"))).as("instant_eq_cross_zone"))
        .orderBy(col("event_id").asc_nulls_last)
    },

    // ---- packed-tstz fuzz banks (FunctionFuzzer.generateTstz) ----
    // The property net for the timestamp-with-time-zone value type: the
    // Spark side drives the TimestampTz HELPERS as columns (pack bit
    // arithmetic, at_timezone, wall presentation/extraction, instant
    // ordering, pre-1970 shift edges); the oracle recomputes every value
    // from the raw instant with ICU arithmetic, never through the
    // encoding. Seeded, regeneration-locked in FuzzSpec.
    "fuzz_tstz_bank_1" -> tstzBank(3101L, 18),
    "fuzz_tstz_bank_2" -> tstzBank(3102L, 18),

    "compat_timestamp_tz" -> Q.sql(
      spark = """SELECT event_id,
        |  from_utc_timestamp(ts, 'America/Los_Angeles') AS la_wall,
        |  from_utc_timestamp(ts + INTERVAL 6 MONTH, 'America/Los_Angeles') AS la_wall_summer,
        |  from_utc_timestamp(ts, 'Asia/Kathmandu') AS ktm_wall,
        |  to_utc_timestamp(from_utc_timestamp(ts, 'Asia/Kathmandu'), 'Asia/Kathmandu') AS roundtrip,
        |  CAST(floor((unix_timestamp(from_utc_timestamp(ts, 'America/Los_Angeles')) - unix_timestamp(ts)) / 3600.0) AS INT) AS la_tz_hour,
        |  CAST(floor((unix_timestamp(from_utc_timestamp(ts + INTERVAL 6 MONTH, 'America/Los_Angeles')) - unix_timestamp(ts + INTERVAL 6 MONTH)) / 3600.0) AS INT) AS la_tz_hour_summer,
        |  CAST(floor((unix_timestamp(from_utc_timestamp(ts, 'Asia/Kathmandu')) - unix_timestamp(ts)) / 3600.0) AS INT) AS ktm_tz_hour,
        |  CAST(((unix_timestamp(from_utc_timestamp(ts, 'Asia/Kathmandu')) - unix_timestamp(ts)) % 3600) / 60 AS INT) AS ktm_tz_minute
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id ASC NULLS LAST""".stripMargin,
      duck = """SELECT event_id,
        |  timezone('America/Los_Angeles', timezone('UTC', CAST(ts AS TIMESTAMP))) AS la_wall,
        |  timezone('America/Los_Angeles', timezone('UTC', CAST(ts AS TIMESTAMP) + INTERVAL 6 MONTH)) AS la_wall_summer,
        |  timezone('Asia/Kathmandu', timezone('UTC', CAST(ts AS TIMESTAMP))) AS ktm_wall,
        |  CAST(ts AS TIMESTAMP) AS roundtrip,
        |  CAST(floor((epoch(timezone('America/Los_Angeles', timezone('UTC', CAST(ts AS TIMESTAMP)))) - epoch(CAST(ts AS TIMESTAMP))) / 3600.0) AS INT) AS la_tz_hour,
        |  CAST(floor((epoch(timezone('America/Los_Angeles', timezone('UTC', CAST(ts AS TIMESTAMP) + INTERVAL 6 MONTH))) - epoch(CAST(ts AS TIMESTAMP) + INTERVAL 6 MONTH)) / 3600.0) AS INT) AS la_tz_hour_summer,
        |  CAST(floor((epoch(timezone('Asia/Kathmandu', timezone('UTC', CAST(ts AS TIMESTAMP)))) - epoch(CAST(ts AS TIMESTAMP))) / 3600.0) AS INT) AS ktm_tz_hour,
        |  CAST((CAST(epoch(timezone('Asia/Kathmandu', timezone('UTC', CAST(ts AS TIMESTAMP)))) - epoch(CAST(ts AS TIMESTAMP)) AS BIGINT) % 3600) / 60 AS INT) AS ktm_tz_minute
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id ASC NULLS LAST""".stripMargin)
  )

  /** One generated tstz bank: the fuzzer's named Columns over the
    * ms-normalized events base (`__ts` mirrors the oracle's
    * make_timestamp(epoch_ms × 1000) truncation).
    */
  private def tstzBank(seed: Long, nCols: Int): Q = {
    val (duck, cols) = graft.functions.FunctionFuzzer.generateTstz(seed, nCols)
    Q.df(duck) { (s, dir) =>
      Tables.t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .withColumn("__ts", timestamp_millis(unix_millis(col("ts"))))
        .select(col("event_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("event_id").asc_nulls_last)
    }
  }
}
