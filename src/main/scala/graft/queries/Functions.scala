package graft.queries

import graft.Q

/** Scalar-function coverage — one declared query per function family from
  * SURVEY.md §2.1 (reference implementations under
  * presto-main/src/main/java/io/prestosql/operator/scalar/, registration
  * list metadata/FunctionRegistry.java:403-655). Every function here is a
  * Spark built-in (codegen'd, no UDFs — the Catalyst analog of the
  * reference's bytecode-compiled PageProcessor, sql/gen/ExpressionCompiler
  * .java); the declared queries prove value-level parity against DuckDB.
  *
  * Dialect notes: where Spark and DuckDB spell a function differently
  * (instr/strpos, date_format/strftime, sha2/sha256, transform/
  * list_transform, ...) the query carries per-dialect texts via Q.sql —
  * the *values* still must hash-match.
  */
object Functions {

  val qs: Map[String, Q] = Map(

    // ---- string basics (StringFunctions.java: length/upper/lower/substr/
    //      reverse/lpad/rpad/trim — all 1-based substr in both engines) ----
    "fn_string_basics" -> Q.sqlSame(
      """SELECT p_partkey,
        |  LENGTH(p_name) AS len,
        |  UPPER(p_brand) AS up, LOWER(p_type) AS lo,
        |  SUBSTR(p_name, 3, 5) AS sub,
        |  REVERSE(p_brand) AS rev,
        |  LPAD(p_brand, 12, '*') AS padl, RPAD(p_brand, 12, '*') AS padr,
        |  TRIM('  ' || p_brand || ' ') AS trimmed
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- split/concat/replace/position (StringFunctions.java:
    //      split_part/strpos/concat/replace) ----
    "fn_string_split" -> Q.sql(
      spark = """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  split_part(p_name, ' ', -1) AS last_word,
        |  instr(p_name, 'a') AS pos_a,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  replace(p_name, ' ', '_') AS snake
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  split_part(p_name, ' ', -1) AS last_word,
        |  strpos(p_name, 'a') AS pos_a,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  replace(p_name, ' ', '_') AS snake
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- edit distance (StringFunctions.java levenshtein_distance) ----
    "fn_levenshtein" -> Q.sqlSame(
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS dist
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- regex family (JoniRegexpFunctions.java: regexp_like/extract/
    //      replace; Catalyst RLIKE/regexp_extract/regexp_replace). DuckDB
    //      regexp_replace needs the 'g' flag to match Spark's replace-all. --
    "fn_regex" -> Q.sql(
      spark = """SELECT p_partkey,
        |  p_name RLIKE '^[a-m]' AS starts_low,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_token,
        |  regexp_replace(p_name, '[aeiou]', '.') AS devoweled
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  regexp_matches(p_name, '^[a-m]') AS starts_low,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_token,
        |  regexp_replace(p_name, '[aeiou]', '.', 'g') AS devoweled
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- regexp_replace with lambda (JoniRegexpFunctions.java lambda
    //      overload): the replacement function receives the capture groups
    //      as array<varchar> (element_at = 1-based in both dialects), plus
    //      Presto's 2-arg delete-matches form ----
    "fn_regex_lambda" -> Q.sql(
      spark = """SELECT p_partkey,
        |  regexp_replace(p_name, '([a-z]+)', x -> upper(element_at(x, 1))) AS shouted,
        |  regexp_replace(p_name, '(\\w)(\\w*)',
        |    x -> concat(upper(element_at(x, 1)), element_at(x, 2))) AS title_case,
        |  regexp_replace(p_name, '[aeiou]') AS devoweled
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  upper(p_name) AS shouted,
        |  array_to_string(list_transform(string_split(p_name, ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS title_case,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- match lambdas (ArrayAnyMatch/AllMatch/NoneMatch), 3-arg strpos
    //      (N-th occurrence), ISO-8601 conversions — the DuckDB side
    //      spells each out of list/closed-form primitives ----
    "fn_match_strpos_iso" -> Q.sql(
      spark = """SELECT p_partkey,
        |  any_match(split(p_name, ' '), x -> length(x) > 5) AS has_long,
        |  all_match(split(p_name, ' '), x -> length(x) >= 3) AS all_3plus,
        |  none_match(split(p_name, ' '), x -> x = 'widget') AS no_widget,
        |  strpos(p_name, 'e', 2) AS second_e,
        |  strpos(p_name, 'e', -1) AS last_e,
        |  to_iso8601(DATE '2024-03-01') AS iso_d,
        |  CAST(from_iso8601_timestamp('2024-03-01T10:30:00') AS STRING) AS iso_ts
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  len(list_filter(string_split(p_name, ' '), x -> length(x) > 5)) > 0 AS has_long,
        |  len(list_filter(string_split(p_name, ' '), x -> length(x) >= 3))
        |    = len(string_split(p_name, ' ')) AS all_3plus,
        |  len(list_filter(string_split(p_name, ' '), x -> x = 'widget')) = 0 AS no_widget,
        |  coalesce(list_filter(generate_series(1, length(p_name)),
        |    i -> p_name[i] = 'e')[2], 0) AS second_e,
        |  coalesce(list_filter(generate_series(1, length(p_name)),
        |    i -> p_name[i] = 'e')[-1], 0) AS last_e,
        |  '2024-03-01' AS iso_d,
        |  '2024-03-01 10:30:00' AS iso_ts
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- datetime field extraction (DateTimeFunctions.java: year/quarter/
    //      month/day/hour/minute, date_trunc). DuckDB date_trunc returns
    //      DATE for month granularity — cast back to TIMESTAMP. ----
    "fn_datetime_parts" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  YEAR(o_orderdate) AS y, QUARTER(o_orderdate) AS q,
        |  MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
        |  date_trunc('month', o_orderdate) AS month_start
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  YEAR(o_orderdate) AS y, QUARTER(o_orderdate) AS q,
        |  MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ---- datetime arithmetic (DateTimeFunctions.java date_add/date_diff) --
    "fn_datetime_arith" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  o_orderdate - INTERVAL 1 HOUR AS hour_before,
        |  datediff(o_orderdate, TIMESTAMP '1995-01-01 00:00:00') AS days_since_95
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  o_orderdate - INTERVAL 1 HOUR AS hour_before,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ---- datetime formatting + epoch (date_format/format_datetime and
    //      to_unixtime — Spark unix_timestamp = duck epoch) ----
    "fn_datetime_format" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS iso_day,
        |  date_format(o_orderdate, 'yyyy/MM') AS ym,
        |  unix_timestamp(o_orderdate) AS epoch_s
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  strftime(o_orderdate, '%Y/%m') AS ym,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ---- math core (MathFunctions.java: abs/ceil/floor/round/sqrt/exp/
    //      ln/log10/pow/mod/sign) — transcendentals rounded to 9 dp.
    //      CEIL/FLOOR cast to BIGINT and SIGN to DOUBLE on both sides:
    //      DuckDB returns DOUBLE/TINYINT where Spark returns BIGINT/DOUBLE,
    //      and the driver hash is type-sensitive. ----
    "fn_math_core" -> Q.sqlSame(
      """SELECT o_orderkey,
        |  ABS(-o_totalprice) AS abs_p,
        |  CAST(CEIL(o_totalprice) AS BIGINT) AS ceil_p,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_p,
        |  ROUND(o_totalprice, 1) AS round_p,
        |  ROUND(SQRT(o_totalprice), 9) AS sqrt_p,
        |  ROUND(LN(o_totalprice), 9) AS ln_p,
        |  ROUND(LOG10(o_totalprice), 9) AS log10_p,
        |  ROUND(POWER(o_totalprice, 0.5), 9) AS pow_half,
        |  MOD(o_orderkey, 7) AS mod7,
        |  CAST(SIGN(o_totalprice - 200000) AS DOUBLE) AS sgn
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ---- trig + angular conversion (MathFunctions.java trig block) ----
    "fn_math_trig" -> Q.sqlSame(
      """SELECT n_nationkey,
        |  ROUND(SIN(n_nationkey), 9) AS s, ROUND(COS(n_nationkey), 9) AS c,
        |  ROUND(ATAN2(n_nationkey, 10), 9) AS a2,
        |  ROUND(DEGREES(n_nationkey), 6) AS deg,
        |  ROUND(RADIANS(n_nationkey), 9) AS rad
        |FROM nation
        |ORDER BY n_nationkey ASC NULLS LAST""".stripMargin),

    // ---- width_bucket (MathFunctions.java:width_bucket) — DuckDB lacks it;
    //      oracle uses the equivalent closed formula ----
    "fn_width_bucket" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  width_bucket(o_totalprice, 0.0, 500000.0, 10) AS bucket
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0) + 1, 1), 11) AS BIGINT) AS bucket
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ---- bitwise scalars (BitwiseFunctions.java) ----
    "fn_bitwise" -> Q.sql(
      spark = """SELECT o_orderkey,
        |  o_orderkey & 255 AS band, o_orderkey | 4096 AS bor,
        |  o_orderkey ^ 1023 AS bxor,
        |  shiftleft(o_orderkey, 2) AS shl, shiftright(o_orderkey, 2) AS shr
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT o_orderkey,
        |  o_orderkey & 255 AS band, o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, 1023) AS bxor,
        |  o_orderkey << 2 AS shl, o_orderkey >> 2 AS shr
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin),

    // ---- TRY semantics (TryFunction.java/TryCastFunction.java →
    //      Spark try_cast/try_divide; ANSI mode stays on) ----
    "fn_try" -> Q.sql(
      spark = """SELECT p_partkey,
        |  try_cast(p_brand AS INT) AS not_a_number,
        |  try_cast(CAST(p_size AS STRING) AS INT) AS roundtrip,
        |  try_divide(p_retailprice, p_size - p_size) AS div_zero
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  try_cast(p_brand AS INT) AS not_a_number,
        |  try_cast(CAST(p_size AS STRING) AS INT) AS roundtrip,
        |  p_retailprice / NULLIF(p_size - p_size, 0) AS div_zero
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- generic TRY(expr) (TryFunction.java → graft TryEval rewrite):
    //      NULL on runtime error, value when the row succeeds. ok_small
    //      mixes failing rows (tinyint overflow when p_size*100 > 127)
    //      with succeeding ones in the SAME column — proving per-row
    //      catch, not constant-folding. ----
    "fn_try_generic" -> Q.sql(
      spark = """SELECT p_partkey,
        |  try(CAST(p_brand AS INT)) AS bad_cast,
        |  try(CAST(CAST(p_size AS STRING) AS INT)) AS ok_cast,
        |  CAST(try(p_retailprice / (p_size - p_size)) AS DOUBLE) AS div0,
        |  CAST(try(CAST(p_size AS TINYINT) * CAST(100 AS TINYINT)) AS INT) AS ok_small
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  try_cast(p_brand AS INT) AS bad_cast,
        |  CAST(p_size AS INT) AS ok_cast,
        |  CAST(NULL AS DOUBLE) AS div0,
        |  CAST(CASE WHEN p_size * 100 BETWEEN -128 AND 127
        |            THEN p_size * 100 END AS INT) AS ok_small
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- parse_presto_data_size (DataSizeFunctions.java): value×1024^k,
    //      truncated; invalid unit raises (NULL through try()) ----
    "fn_parse_data_size" -> Q.sql(
      spark = """SELECT p_partkey,
        |  CAST(parse_presto_data_size(CAST(p_size AS STRING) || 'kB') AS BIGINT) AS kb,
        |  CAST(parse_presto_data_size(CAST(p_size AS STRING) || 'MB') AS BIGINT) AS mb,
        |  CAST(parse_presto_data_size(CAST(p_size AS STRING) || '.5GB') AS BIGINT) AS gb_frac,
        |  CAST(parse_presto_data_size('2.3MB') AS BIGINT) AS frac_const,
        |  CAST(try(parse_presto_data_size(p_brand)) AS BIGINT) AS invalid
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  CAST(p_size AS BIGINT) * 1024 AS kb,
        |  CAST(p_size AS BIGINT) * 1048576 AS mb,
        |  CAST(FLOOR((p_size + 0.5) * 1073741824) AS BIGINT) AS gb_frac,
        |  CAST(2411724 AS BIGINT) AS frac_const,
        |  CAST(NULL AS BIGINT) AS invalid
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- hash/crypto (VarbinaryFunctions.java: md5/sha256/to_hex/
    //      to_base64; hex case-normalized — Spark upper, DuckDB lower) ----
    "fn_hash_crypto" -> Q.sql(
      spark = """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha2(p_name, 256) AS h_sha256,
        |  lower(hex(p_name)) AS h_hex,
        |  base64(CAST(p_name AS BINARY)) AS h_b64
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256,
        |  lower(hex(p_name)) AS h_hex,
        |  base64(CAST(p_name AS BLOB)) AS h_b64
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- differential fuzz banks (FunctionFuzzer): 3 × 42 randomized
    //      expression columns over nation in the dialect-common subset,
    //      seeded deterministically — the driver's DuckDB gate IS the
    //      differential check, re-run every round. FuzzSpec locks the
    //      generator's determinism so the SQL (and therefore the oracle
    //      hash) cannot drift between rounds ----
    "fuzz_expr_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generate(101L, 42)),
    "fuzz_expr_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generate(202L, 42)),
    "fuzz_expr_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generate(303L, 42)),
    "fuzz_expr_bank_4" -> Q.sqlSame(graft.functions.FunctionFuzzer.generate(606L, 42)),
    "fuzz_date_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDates(404L, 42)),
    "fuzz_date_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDates(707L, 42)),
    "fuzz_agg_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateAggs(505L, 40)),
    "fuzz_agg_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateAggs(808L, 40)),
    "fuzz_window_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateWindows(909L, 30)),
    "fuzz_window_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateWindows(1010L, 30)),
    "fuzz_rangewindow_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateRangeWindows(1101L, 20)),
    "fuzz_rangewindow_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateRangeWindows(1102L, 20)),
    // seeds picked for join-type coverage (501 INNER / 33 LEFT / 22 RIGHT /
    // 66 FULL) with non-vacuous, padding-exercising row sets at both SFs
    "fuzz_join_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoins(501L, 12)),
    "fuzz_join_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoins(33L, 12)),
    "fuzz_join_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoins(22L, 12)),
    "fuzz_join_bank_4" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoins(66L, 12)),
    // seeds 600-605 happen to draw all six set ops in order (INTERSECT,
    // UNION ALL, UNION, EXCEPT ALL, INTERSECT ALL, EXCEPT), each with
    // non-vacuous output and NULL-bearing rows at both SFs
    "fuzz_setop_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSetOps(600L, 9)),
    "fuzz_setop_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSetOps(601L, 9)),
    "fuzz_setop_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSetOps(602L, 9)),
    "fuzz_setop_bank_4" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSetOps(603L, 9)),
    "fuzz_setop_bank_5" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSetOps(604L, 9)),
    "fuzz_setop_bank_6" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSetOps(605L, 9)),
    // seeds 700-703 draw the four grouping shapes in order (GROUPING SETS
    // ((a),(b)), ROLLUP, CUBE, GROUPING SETS with the () grand total)
    "fuzz_groupingsets_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateGroupingSets(700L, 15)),
    "fuzz_groupingsets_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateGroupingSets(701L, 15)),
    "fuzz_groupingsets_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateGroupingSets(702L, 15)),
    "fuzz_groupingsets_bank_4" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateGroupingSets(703L, 15)),
    "fuzz_scalarsubq_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateScalarSubqueries(801L, 12)),
    "fuzz_scalarsubq_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateScalarSubqueries(802L, 12)),
    // sub-day sibling of the date banks: make_timestamp / INTERVAL
    // shifts / hour-minute truncation / extractors
    "fuzz_timestamp_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateTimestamps(1601L, 42)),
    "fuzz_timestamp_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateTimestamps(1602L, 42)),
    // seeds picked for shape coverage: 1506 semi∧semi, 1503 semi∧anti
    // on a nullable correlation key, 1502 null-aware NOT IN ∧ semi,
    // 1500 nested EXISTS(IN); each seed's predicates verifiably filter
    // (FuzzSpec rejects a bank that keeps all 25 nation rows)
    "fuzz_semianti_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSemiAnti(1506L)),
    "fuzz_semianti_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSemiAnti(1503L)),
    "fuzz_semianti_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSemiAnti(1502L)),
    "fuzz_semianti_bank_4" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateSemiAnti(1500L)),
    // aggregation over null-extending outer joins with HAVING: seeds
    // cover LEFT (1728: COUNT(rname) HAVING), RIGHT (1744: COUNT(*)
    // HAVING), FULL (1803: MIN…IS NOT NULL HAVING, NULL group key in
    // output), LEFT (1711: COUNT(*) <> COUNT(rname) — keeps exactly the
    // null-extended groups); FuzzSpec re-runs each with HAVING stripped
    // to prove the clause drops groups
    "fuzz_joinagg_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoinAggs(1728L, 12)),
    "fuzz_joinagg_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoinAggs(1744L, 12)),
    "fuzz_joinagg_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoinAggs(1803L, 12)),
    "fuzz_joinagg_bank_4" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateJoinAggs(1711L, 12)),
    // several DISTINCT aggregates over different expressions per query —
    // exercises Spark's Expand-based multi-distinct planning end to end
    "fuzz_distinctagg_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDistinctAggs(1301L, 25)),
    "fuzz_distinctagg_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDistinctAggs(1302L, 25)),
    // dual-dialect array/HOF banks: the generator emits (spark, duck)
    // texts in lockstep because lambdas/arrays spell differently
    // (transform/array(…)/size vs list_transform/[…]/len)
    "fuzz_array_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateArrays(1401L, 30); Q.sql(sp, dk) },
    "fuzz_array_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateArrays(1402L, 30); Q.sql(sp, dk) },
    "fuzz_array_bank_3" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateArrays(1403L, 30); Q.sql(sp, dk) },
    // dual-dialect struct/row banks: named_struct('a', x) vs {'a': x}
    // literals; nested access and whole-struct equality, scalar outputs
    "fuzz_struct_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateStructs(1901L, 24); Q.sql(sp, dk) },
    "fuzz_struct_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateStructs(1902L, 24); Q.sql(sp, dk) },
    // dual-dialect map banks: map('k', v)/try_element_at vs
    // MAP {'k': v}/(m[k])[1]; hit-and-miss lookups, concat, cardinality
    "fuzz_map_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateMaps(2001L, 24); Q.sql(sp, dk) },
    "fuzz_map_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateMaps(2002L, 24); Q.sql(sp, dk) },
    // TRY_CAST failure-semantics banks: per-row success/NULL interleaves
    // decided by the data (junk strings, overflow, narrow downcasts,
    // month>12 dates, boolean spellings, NaN doubles); decimal-string ->
    // int and hex strings excluded as documented dialect divergences
    "fuzz_trycast_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateTryCasts(2801L, 24)),
    "fuzz_trycast_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateTryCasts(2802L, 24)),
    // JSON-path banks: row-assembled documents walked by the native
    // Presto-JSONPath walker vs DuckDB's JSON extension (names differ:
    // json_extract_scalar/json_size vs json_extract_string/
    // json_array_length); drawn keys, past-the-end indexes, missing keys
    "fuzz_json_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateJson(2701L, 24); Q.sql(sp, dk) },
    "fuzz_json_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateJson(2702L, 24); Q.sql(sp, dk) },
    // string-function banks beyond the scalar grammar's basics:
    // position/left/right/repeat/translate/split_part (out-of-range ->
    // ''), dual-spelled startswith/starts_with prefix tests
    "fuzz_string_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateStrings(2601L, 30); Q.sql(sp, dk) },
    "fuzz_string_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateStrings(2602L, 30); Q.sql(sp, dk) },
    // IGNORE NULLS window value functions, both null-treatment polarities
    // (dual-dialect: the modifier sits outside the parens in Spark,
    // inside after the last argument in DuckDB)
    "fuzz_ignorenulls_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateIgnoreNullsWindows(2801L, 24); Q.sql(sp, dk) },
    "fuzz_ignorenulls_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateIgnoreNullsWindows(2802L, 24); Q.sql(sp, dk) },
    // LIKE / NOT LIKE / ILIKE / ESCAPE pattern matching (same text both)
    "fuzz_like_bank_1" -> Q.sqlSame(
      graft.functions.FunctionFuzzer.generateLikePatterns(2901L, 28)),
    "fuzz_like_bank_2" -> Q.sqlSame(
      graft.functions.FunctionFuzzer.generateLikePatterns(2902L, 28)),
    // decimal-arithmetic banks: exact money math under randomized (p,s)
    // casts; outputs canonicalized to DOUBLE (bit-identical on both
    // engines by the grammar's <2^53 unscaled bound — DECIMAL(38,10)
    // output was the round-9 driver-hash red)
    "fuzz_decimal_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDecimals(2501L, 20)),
    "fuzz_decimal_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDecimals(2502L, 20)),
    // decimal division/modulus banks: 5-smooth divisors keep the
    // quotient exact in Spark's decimal result scale AND exactly
    // double-representable operands on DuckDB's `/`-returns-DOUBLE
    // path; modulus is always exact with the truncated-division sign
    // rule both engines share
    "fuzz_decimaldiv_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDecimalDivMod(2901L, 20)),
    "fuzz_decimaldiv_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDecimalDivMod(2902L, 20)),
    // decimal saturated/overflow-cast banks: TRY_CAST to drawn (p,s)
    // with s >= source scale — rows overflow to NULL or pass exactly,
    // row-dependently (scale-REDUCING casts are a documented exclusion:
    // Spark HALF_UP vs DuckDB truncate)
    "fuzz_decimalsat_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDecimalSaturate(2951L, 20)),
    "fuzz_decimalsat_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateDecimalSaturate(2952L, 20)),
    // three-valued-logic predicate banks: BETWEEN on NULL bounds,
    // IN/NOT IN lists containing NULL, IS [NOT] DISTINCT FROM; every
    // predicate projected raw (NULLs intact) and decided
    "fuzz_predicate_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generatePredicates(2401L, 30)),
    "fuzz_predicate_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generatePredicates(2402L, 30)),
    // dual-dialect unnest banks: LATERAL VIEW posexplode (0-based + 1)
    // vs generate_subscripts+unnest zipped (1-based); empty arrays drop
    // rows from both shapes. Seeds: 2312 flat+transform, 2307
    // flat+filter (post-filter empties), 2301 aggregate-back
    "fuzz_unnest_bank_1" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateUnnest(2312L); Q.sql(sp, dk) },
    "fuzz_unnest_bank_2" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateUnnest(2307L); Q.sql(sp, dk) },
    "fuzz_unnest_bank_3" -> { val (sp, dk) =
      graft.functions.FunctionFuzzer.generateUnnest(2301L); Q.sql(sp, dk) },
    // ORDER BY/LIMIT/OFFSET selected-row-set banks: mixed directions,
    // explicit NULLS FIRST/LAST on NULL-injected keys, duplicate key
    // prefixes forcing tie fall-through; seeds picked so every bank has
    // NULL sort keys, a nonzero OFFSET, and both NULLS FIRST and DESC
    "fuzz_ordering_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateOrderings(2106L, 3)),
    "fuzz_ordering_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateOrderings(2108L, 3)),
    "fuzz_ordering_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateOrderings(2115L, 3)),
    // CTE-reuse banks: one aggregated WITH body referenced twice in a
    // key-misaligned self-join — inline-vs-materialize must not drift
    "fuzz_ctereuse_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateCteReuse(2201L, 8)),
    "fuzz_ctereuse_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateCteReuse(2202L, 8)),
    // seeds picked for lateral-shape coverage: 900 comma-LATERAL top-n
    // (5 outer rows vanish on empty laterals), 903 LEFT JOIN LATERAL
    // (5 NULL-padded rows), 905 single-row aggregate lateral
    "fuzz_lateral_bank_1" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateLaterals(900L)),
    "fuzz_lateral_bank_2" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateLaterals(903L)),
    "fuzz_lateral_bank_3" -> Q.sqlSame(graft.functions.FunctionFuzzer.generateLaterals(905L)),

    // ---- JSON family (JsonFunctions.java: json_extract_scalar →
    //      get_json_object; over the events.props JSON column) ----
    "fn_json" -> Q.sql(
      spark = """SELECT event_type,
        |  COUNT(*) AS n,
        |  SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
        |  MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS LAST""".stripMargin,
      duck = """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS LAST""".stripMargin),

    // ---- schema-declared record decode (the reference's JSON record
    //      decoder surface, json/JsonRowDecoder.java: message bytes →
    //      typed columns by declared schema) — from_json with an explicit
    //      schema, the Spark-native equivalent; null row on malformed
    //      input mirrors the decoder's null-on-undecodable contract ----
    "fn_record_decode_json" -> Q.sql(
      spark = """SELECT event_id,
        |  from_json(props, 'k INT').k AS k,
        |  from_json('not a record', 'k INT').k AS bad_k
        |FROM events WHERE event_id < 300
        |ORDER BY event_id ASC NULLS LAST""".stripMargin,
      duck = """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(NULL AS INT) AS bad_k
        |FROM events WHERE event_id < 300
        |ORDER BY event_id ASC NULLS LAST""".stripMargin),

    // ---- raw (fixed-offset binary) record decode — the reference's
    //      raw/RawColumnDecoder.java: each column is a byte slice
    //      [start:end) of the message, interpreted big-endian
    //      two's-complement at the declared width (getLong/getBoolean
    //      switch at RawColumnDecoder.java:233-264), varchar fields
    //      truncate-to-length (getSlice:288-291 via
    //      Varchars.truncateToLength), and a slice past the message end
    //      decodes to NULL (isNull:226-229, size == 0). The query packs a
    //      message per nation row (hex/unhex — codegen'd built-ins), then
    //      decodes BYTE@0, signed SHORT@1:3, INT@3:7, LONG@7:15 (two
    //      4-byte halves recombined with shiftleft|or, so no 2^63
    //      overflow), a varchar(8) tail, and a past-the-end NULL field;
    //      the oracle re-derives every field from the parquet source ----
    "fn_record_decode_raw" -> Q.sql(
      spark = """WITH enc AS (
        |  SELECT n_nationkey,
        |    unhex(concat(
        |      lpad(hex(n_nationkey), 2, '0'),
        |      lpad(hex((n_nationkey - 12 + 65536) % 65536), 4, '0'),
        |      lpad(hex(n_nationkey * 1000), 8, '0'),
        |      lpad(hex(CAST(n_regionkey AS BIGINT) * 1000000000), 16, '0'),
        |      hex(encode(n_name, 'UTF-8')))) AS msg
        |  FROM nation),
        |dec AS (
        |  SELECT n_nationkey,
        |    CAST(conv(hex(substring(msg, 1, 1)), 16, 10) AS INT) AS u_byte,
        |    CAST(conv(hex(substring(msg, 2, 2)), 16, 10) AS INT) AS u_short,
        |    CAST(conv(hex(substring(msg, 4, 4)), 16, 10) AS BIGINT) AS u_int,
        |    CAST(conv(hex(substring(msg, 8, 4)), 16, 10) AS BIGINT) AS hi,
        |    CAST(conv(hex(substring(msg, 12, 4)), 16, 10) AS BIGINT) AS lo,
        |    decode(substring(msg, 16, 127), 'UTF-8') AS tail,
        |    nullif(hex(substring(msg, 100, 4)), '') AS missing_hex
        |  FROM enc)
        |SELECT n_nationkey,
        |  CAST(IF(u_byte >= 128, u_byte - 256, u_byte) AS INT) AS f_byte,
        |  CAST(IF(u_short >= 32768, u_short - 65536, u_short) AS INT) AS f_short,
        |  CAST(IF(u_int >= 2147483648, u_int - 4294967296, u_int) AS INT) AS f_int,
        |  shiftleft(hi, 32) | lo AS f_long,
        |  left(tail, 8) AS f_name,
        |  CAST(conv(missing_hex, 16, 10) AS INT) AS f_missing
        |FROM dec
        |ORDER BY n_nationkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT n_nationkey,
        |  CAST(n_nationkey AS INT) AS f_byte,
        |  CAST(n_nationkey - 12 AS INT) AS f_short,
        |  CAST(n_nationkey * 1000 AS INT) AS f_int,
        |  CAST(n_regionkey AS BIGINT) * 1000000000 AS f_long,
        |  left(n_name, 8) AS f_name,
        |  CAST(NULL AS INT) AS f_missing
        |FROM nation
        |ORDER BY n_nationkey ASC NULLS LAST""".stripMargin),

    // ---- Presto JSONPath edge semantics (PrestoJson.scala / reference
    //      JsonExtract.java): the oracle hardcodes the reference's
    //      documented outputs (TestJsonExtract.java vectors), so DuckDB
    //      differentially pins scalar-vs-complex NULLs, numeric tokens
    //      on arrays, quoted dotted fields, trailing-comma leniency and
    //      real json_size — the behaviors get_json_object lacks ----
    "fn_json_presto" -> Q.sql(
      spark = """SELECT id,
        |  json_extract_scalar(j, p) AS k_scalar,
        |  json_extract(j, p) AS k_json,
        |  json_size(j, p) AS k_size
        |FROM (SELECT * FROM VALUES
        |  (1, '{"fuu": {"bar": 1}}', '$.fuu'),
        |  (2, '[0, 1, 2]', '$.1'),
        |  (3, '{"0": 0, "1": 1, }', '$.1'),
        |  (4, '{"foo.bar": 7}', '$["foo.bar"]'),
        |  (5, '{"a": "[1,2]"}', '$.a'),
        |  (6, 'not json', '$.a'),
        |  (7, '{"a": [10, 20, {"b": 5}]}', '$.a[2].b'),
        |  (8, '[[1,2],[3,4]]', '$[1]') AS t(id, j, p))
        |ORDER BY id ASC NULLS LAST""".stripMargin,
      duck = """SELECT * FROM (VALUES
        |  (1, NULL, '{"bar":1}', 1),
        |  (2, '1', '1', 0),
        |  (3, '1', '1', 0),
        |  (4, '7', '7', 0),
        |  (5, '[1,2]', '"[1,2]"', 0),
        |  (6, NULL, NULL, NULL),
        |  (7, '5', '5', 0),
        |  (8, NULL, '[3,4]', 2)) t(id, k_scalar, k_json, k_size)
        |ORDER BY id ASC NULLS LAST""".stripMargin),

    // ---- array basics (Array*Function.java: cardinality/contains/
    //      distinct/sort/element_at — Spark 1-based = duck 1-based).
    //      Array-typed output serialized with array_join: the driver's
    //      comparator sorts columns in pandas, which cannot hash ndarray
    //      cells. Values still compared element-for-element via the join. --
    "fn_array_basics" -> Q.sql(
      spark = """SELECT p_partkey,
        |  size(split(p_name, ' ')) AS n_words,
        |  array_contains(split(p_name, ' '), 'the') AS has_the,
        |  array_join(sort_array(array_distinct(split(p_name, ' '))), ',') AS uniq_sorted,
        |  element_at(split(p_name, ' '), 1) AS first_word
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT p_partkey,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  list_contains(string_split(p_name, ' '), 'the') AS has_the,
        |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq_sorted,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey ASC NULLS LAST""".stripMargin),

    // ---- higher-order lambdas (ArrayTransformFunction.java,
    //      ArrayFilterFunction.java, ArrayReduceFunction.java → Catalyst
    //      transform/filter/aggregate; sequential double fold on both
    //      sides so float addition order is identical) ----
    "fn_array_lambdas" -> Q.sql(
      spark = """SELECT vec_id,
        |  ROUND(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + x), 6) AS vec_sum,
        |  size(filter(embedding, x -> x > 0)) AS n_pos,
        |  ROUND(element_at(transform(embedding, x -> CAST(x AS DOUBLE) * 2), 1), 6) AS first_doubled
        |FROM embeddings WHERE vec_id < 200
        |ORDER BY vec_id ASC NULLS LAST""".stripMargin,
      duck = """SELECT vec_id,
        |  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, x) -> a + x), 6) AS vec_sum,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  ROUND(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[1], 6) AS first_doubled
        |FROM embeddings WHERE vec_id < 200
        |ORDER BY vec_id ASC NULLS LAST""".stripMargin),

    // ---- sequence generation (SequenceFunction.java → Spark sequence =
    //      duck generate_series, both inclusive; serialized for the
    //      array-hostile driver comparator) ----
    "fn_sequence" -> Q.sql(
      spark = """SELECT n_nationkey,
        |  array_join(sequence(1, n_nationkey + 1), ',') AS seq,
        |  size(sequence(1, n_nationkey + 1)) AS seq_len
        |FROM nation
        |ORDER BY n_nationkey ASC NULLS LAST""".stripMargin,
      duck = """SELECT n_nationkey,
        |  array_to_string(generate_series(1, n_nationkey + 1), ',') AS seq,
        |  len(generate_series(1, n_nationkey + 1)) AS seq_len
        |FROM nation
        |ORDER BY n_nationkey ASC NULLS LAST""".stripMargin)
  )
}
