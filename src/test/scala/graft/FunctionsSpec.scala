package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Unit coverage for the gap-fill functions that have no DuckDB oracle
  * (SURVEY.md §5.2 — the analog of the reference's per-function golden
  * asserts, presto-main/src/test/.../operator/scalar/FunctionAssertions).
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS x").collect()(0).get(0)

  // ---- Porter stemmer (known vectors from the published algorithm) ----
  test("word_stem classic vectors") {
    val vectors = Map(
      "caresses" -> "caress", "ponies" -> "poni", "caress" -> "caress",
      "cats" -> "cat", "feed" -> "feed", "agreed" -> "agre",
      "plastered" -> "plaster", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    vectors.foreach { case (in, want) =>
      assert(functions.PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("word_stem via SQL") {
    assert(one("word_stem('running')") == "run")
    assert(one("word_stem('Generalizations')") == "gener")
  }

  // ---- HMAC against RFC 4231 test case 2 ("Jefe" / "what do ya want...") --
  test("hmac_sha256 rfc4231 vector") {
    val got = one("hmac_sha256(to_utf8('Jefe'), to_utf8('what do ya want for nothing?'))")
    assert(got == "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }
  test("hmac_md5 rfc2202 vector") {
    val got = one("hmac_md5(to_utf8('Jefe'), to_utf8('what do ya want for nothing?'))")
    assert(got == "750c783e6ab0b503eaa86e310a5db738")
  }

  // ---- combinations ----
  test("combinations") {
    val got = one("combinations(array('a','b','c'), 2)")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]]
    assert(got.map(_.toList).toList == List(List("a", "b"), List("a", "c"), List("b", "c")))
  }

  // ---- IEEE-754 round trips ----
  test("ieee754 roundtrip") {
    assert(one("from_ieee754_64(to_ieee754_64(3.1415926535))") == 3.1415926535)
    assert(one("lower(hex(to_ieee754_64(1.0)))") == "3ff0000000000000")
    assert(one("from_ieee754_32(to_ieee754_32(CAST(0.5 AS FLOAT)))") == 0.5f)
  }

  // ---- hamming / normalize edge cases ----
  test("hamming_distance") {
    assert(one("hamming_distance('karolin', 'kathrin')") == 3L)
    assert(one("hamming_distance('', '')") == 0L)
    intercept[Exception](one("hamming_distance('ab', 'abc')"))
  }
  test("normalize forms") {
    // e + combining acute (NFD) normalizes to precomposed é (NFC)
    assert(one("normalize('é', 'NFC')") == "é")
    assert(one("normalize('é', 'NFD')") == "é")
  }

  // ---- datetime pattern dialect translators ----
  test("mysql pattern translation") {
    assert(functions.Patterns.mysqlToJava("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
    assert(functions.Patterns.mysqlToJava("%Y%m%d") == "yyyyMMdd")
    assert(functions.Patterns.mysqlToJava("%d/%b/%Y %T") == "dd/MMM/yyyy HH:mm:ss")
    // literal text is quoted so letters don't leak as pattern tokens
    assert(functions.Patterns.mysqlToJava("%Yq") == "yyyy'q'")
    intercept[IllegalArgumentException](functions.Patterns.mysqlToJava("%Q"))
  }
  test("joda pattern translation") {
    assert(functions.Patterns.jodaToJava("YYYY-MM-dd") == "yyyy-MM-dd")
    assert(functions.Patterns.jodaToJava("yyyy/MM/dd HH:mm") == "yyyy/MM/dd HH:mm")
    assert(functions.Patterns.jodaToJava("'at' YYYY") == "'at' yyyy")
  }
  test("date_parse end to end") {
    assert(one("CAST(date_parse('2024-03-15 14:30:00', '%Y-%m-%d %H:%i:%s') AS STRING)")
      == "2024-03-15 14:30:00")
    assert(one("CAST(parse_datetime('2024/03/15', 'YYYY/MM/dd') AS STRING)")
      == "2024-03-15 00:00:00")
  }

  // ---- ISO week fields vs known dates ----
  test("iso week fields") {
    // 2024-12-30 is a Monday in ISO week 1 of 2025
    assert(one("day_of_week(TIMESTAMP '2024-12-30 00:00:00')") == 1)
    assert(one("year_of_week(TIMESTAMP '2024-12-30 00:00:00')") == 2025)
    assert(one("week_of_year(TIMESTAMP '2024-12-30 00:00:00')") == 1)
    // 2023-01-01 is a Sunday in ISO week 52 of 2022
    assert(one("day_of_week(TIMESTAMP '2023-01-01 00:00:00')") == 7)
    assert(one("year_of_week(TIMESTAMP '2023-01-01 00:00:00')") == 2022)
  }

  // ---- misc rewrites ----
  test("from_base/to_base") {
    assert(one("from_base('ff', 16)") == 255L)
    assert(one("to_base(255, 16)") == "ff")
    assert(one("from_base('101', 2)") == 5L)
  }
  test("cosine_similarity") {
    val sim = one("cosine_similarity(array(1.0, 0.0), array(0.0, 1.0))")
    assert(sim == 0.0)
    val same = one("cosine_similarity(array(1.0, 2.0), array(2.0, 4.0))").asInstanceOf[Double]
    assert(math.abs(same - 1.0) < 1e-12)
    assert(one("cosine_similarity(array(0.0, 0.0), array(1.0, 1.0))") == null)
  }
  test("wilson interval") {
    val lo = one("wilson_interval_lower(86.0, 100.0, 1.96)").asInstanceOf[Double]
    val hi = one("wilson_interval_upper(86.0, 100.0, 1.96)").asInstanceOf[Double]
    assert(lo > 0.77 && lo < 0.79)   // known ~0.779 for 86/100 at 95%
    assert(hi > 0.90 && hi < 0.92)   // known ~0.912
  }
  test("split_to_map and split_to_multimap") {
    assert(one("split_to_map('a:1,b:2', ',', ':')['b']") == "2")
    val mm = one("split_to_multimap('a:1,b:2,a:3', ',', ':')")
      .asInstanceOf[Map[String, scala.collection.Seq[String]]]
    assert(mm("a") == Seq("1", "3") && mm("b") == Seq("2"))
  }

  test("at_timezone / with_timezone wall-clock conversion") {
    assert(one("CAST(at_timezone(TIMESTAMP_NTZ '2024-01-01 12:00:00', 'America/New_York') AS STRING)")
      == "2024-01-01 07:00:00")
    assert(one("CAST(with_timezone(TIMESTAMP_NTZ '2024-01-01 07:00:00', 'America/New_York') AS STRING)")
      == "2024-01-01 12:00:00")
  }

  test("numeric_histogram properties") {
    spark.range(0, 1000).createOrReplaceTempView("r1k")
    def hist(sql: String): Map[Double, Double] =
      spark.sql(sql).collect()(0).get(0).asInstanceOf[Map[Double, Double]]
    val m = hist("SELECT numeric_histogram(10, CAST(id AS DOUBLE)) FROM r1k")
    assert(m.size <= 10, s"bin cap violated: ${m.size}")
    assert(math.abs(m.values.sum - 1000.0) < 1e-6, "mass not conserved")
    assert(m.keys.min >= 0.0 && m.keys.max <= 999.0, "bin centers out of range")
    // stable under repartitioning in total mass and bin cap
    val m2 = hist("SELECT numeric_histogram(10, CAST(id AS DOUBLE)) FROM " +
      "(SELECT id FROM r1k DISTRIBUTE BY id % 7)")
    assert(m2.size <= 10 && math.abs(m2.values.sum - 1000.0) < 1e-6)
  }

  test("hex/base64/big-endian codecs") {
    assert(one("to_hex(to_utf8('abc'))") == "616263")
    assert(one("CAST(from_hex('616263') AS STRING)") == "abc")
    assert(one("to_base64url(to_utf8('ab?de>f'))") ==
      one("translate(base64(to_utf8('ab?de>f')), '+/', '-_')"))
    assert(one("CAST(from_base64url(to_base64url(to_utf8('hello'))) AS STRING)") == "hello")
    assert(one("from_big_endian_64(to_big_endian_64(123456789))") == 123456789L)
    assert(one("lower(hex(to_big_endian_64(1)))") == "0000000000000001")
  }

  test("regexp_split and truncate(x, n)") {
    assert(one("size(regexp_split('a1b22c333d', '[0-9]+'))") == 4)
    assert(one("truncate(3.789, 1)") == 3.7)
    assert(one("truncate(-3.789, 2)") == -3.78)
    assert(one("truncate(3.789)") == 3.0)
  }

  test("bit_count variants and width_bucket bins") {
    assert(one("bit_count(7)") == 3)
    assert(one("bit_count(-1, 8)") == 8L)   // low 8 bits of two's complement
    assert(one("bit_count(255, 4)") == 4L)
    assert(one("width_bucket(3.5, array(1.0, 2.0, 3.0, 4.0))") == 3L)
    assert(one("width_bucket(0.5, array(1.0, 2.0))") == 0L)
    assert(one("width_bucket(25.0, 0.0, 100.0, 10)") == 3L)
  }

  test("cosine_similarity sparse map form") {
    val simD = one("cosine_similarity(map('a', 1.0, 'b', 2.0), map('a', 1.0, 'b', 2.0))")
      .asInstanceOf[Double]
    assert(math.abs(simD - 1.0) < 1e-12)
    assert(one("cosine_similarity(map('a', 1.0), map('b', 1.0))") == 0.0)
  }

  test("normal cdf round trip") {
    val p = one("normal_cdf(0.0, 1.0, 1.96)").asInstanceOf[Double]
    assert(math.abs(p - 0.975) < 1e-3)
    val x = one("inverse_normal_cdf(0.0, 1.0, 0.975)").asInstanceOf[Double]
    assert(math.abs(x - 1.959964) < 1e-4)
    val mid = one("normal_cdf(10.0, 2.0, 10.0)").asInstanceOf[Double]
    assert(math.abs(mid - 0.5) < 1e-7)   // erf approximation |err| ~ 1.2e-7
  }

  test("beta cdf known values") {
    // Beta(2,2): CDF(x) = 3x² − 2x³ (closed form)
    val c = one("beta_cdf(2.0, 2.0, 0.3)").asInstanceOf[Double]
    assert(math.abs(c - (3 * 0.09 - 2 * 0.027)) < 1e-9)
    // Beta(1,1) is uniform
    assert(math.abs(one("beta_cdf(1.0, 1.0, 0.42)").asInstanceOf[Double] - 0.42) < 1e-9)
    val inv = one("inverse_beta_cdf(2.0, 2.0, beta_cdf(2.0, 2.0, 0.3))").asInstanceOf[Double]
    assert(math.abs(inv - 0.3) < 1e-9)
  }

  test("multimap_from_entries and json helpers") {
    val mm = one("multimap_from_entries(array(struct('a' AS key, 1 AS value), " +
      "struct('b' AS key, 2 AS value), struct('a' AS key, 3 AS value)))")
      .asInstanceOf[Map[String, scala.collection.Seq[Int]]]
    assert(mm("a") == Seq(1, 3) && mm("b") == Seq(2))
    assert(one("json_size('{\"a\": [1,2,3]}', '$.a')") == 3)
    assert(one("is_json_scalar('42')") == true)
    assert(one("is_json_scalar('[1,2]')") == false)
  }

  // Behavior vectors from the reference's TestJsonExtract.java — the edge
  // semantics where get_json_object diverges (PrestoJson.scala).
  test("presto json_extract_scalar: complex values are NULL, escapes decode") {
    assert(one("json_extract_scalar('{\"fuu\": {\"bar\": 1}}', '$.fuu')") == null)
    assert(one("json_extract_scalar('[1, 2, 3]', '$')") == null)
    assert(one("json_extract_scalar('{\"fuu\": 1}', '$.fuu')") == "1")
    assert(one("json_extract_scalar('{\"fuu\": null}', '$.fuu')") == null)
    assert(one("json_extract_scalar('{\"fuu\": 1}', '$.bar')") == null)
    assert(one("json_extract_scalar('\"abc\"', '$')") == "abc")
    assert(one("json_extract_scalar('123', '$')") == "123")
    assert(one("json_extract_scalar('null', '$')") == null)
    assert(one("json_extract_scalar('{\"fuu\": [0.1, 1, 2]}', '$.fuu[0]')") == "0.1")
    assert(one("json_extract_scalar('{\"fuu\": [0, [100, 101], 2]}', '$.fuu[1]')") == null)
    assert(one("json_extract_scalar('{\"fuu\": [0, [100, 101], 2]}', '$.fuu[1][1]')") == "101")
    // escaped characters decode in scalar mode
    assert(one("json_extract_scalar('{\"fuu\": [\"\\\\u0001\"]}', '$.fuu[0]')") == "\u0001")
  }

  test("presto json paths: numeric tokens, unquoted/quoted brackets, leniency") {
    // numeric path token matches arrays AND object fields
    assert(one("json_extract_scalar('[0, 1, 2]', '$.1')") == "1")
    assert(one("json_extract_scalar('[0, 1, 2]', '$[1]')") == "1")
    assert(one("json_extract_scalar('[0, 1, 2]', '$[\"1\"]')") == "1")
    assert(one("json_extract_scalar('{\"0\": 0, \"1\": 1, \"2\": 2, }', '$.1')") == "1")
    assert(one("json_extract_scalar('{\"0\": 0, \"1\": 1, \"2\": 2, }', '$[1]')") == "1")
    // fields starting with a digit
    assert(one("json_extract_scalar('{\"15day\": 0, \"30day\": 1}', '$.30day')") == "1")
    assert(one("json_extract_scalar('{\"15day\": 0, \"30day\": 1}', '$[30day]')") == "1")
    // quoted bracket token addresses a field whose name contains a dot
    assert(one("json_extract('{\"foo.bar\": 7}', '$[\"foo.bar\"]')") == "7")
    // unquoted bracket field
    assert(one("json_extract_scalar('{\"fuu\": 1}', '$[fuu]')") == "1")
    // malformed json is NULL, not an error
    assert(one("json_extract('not json at all', '$.a')") == null)
  }

  test("presto json_extract: compact re-serialization of complex values") {
    assert(one("json_extract('{}', '$')") == "{}")
    assert(one("json_extract('{\"fuu\": {\"bar\": 1}}', '$.fuu')") == "{\"bar\":1}")
    assert(one("json_extract('[1, 2, 3]', '$')") == "[1,2,3]")
    assert(one("json_extract('{\"fuu\": 1}', '$.fuu')") == "1")
    assert(one("json_extract('\"abc\"', '$')") == "\"abc\"")
    assert(one("json_extract('null', '$')") == "null")
    // escapes preserved (not decoded) in json mode
    assert(one("json_extract('{\"a\": \"ab\\\\u0001c\"}', '$.a')") == "\"ab\\u0001c\"")
  }

  test("function-audit gap fills: json_array_contains, millisecond, sha2, tz, to_milliseconds") {
    assert(one("json_array_contains('[1, 2, 3]', 2)") == true)
    assert(one("json_array_contains('[1, 2, 3]', 5)") == false)
    assert(one("json_array_contains('[true, false]', false)") == true)
    assert(one("json_array_contains('[\"a\", \"b\"]', 'b')") == true)
    assert(one("json_array_contains('[1.5, 2.5]', 2.5d)") == true)
    assert(one("json_array_contains('{\"a\": 1}', 1)") == null)
    assert(one("json_array_contains('bad', 1)") == null)
    assert(one("millisecond(TIMESTAMP '2024-01-02 03:04:05.321')") == 321L)
    // SHA-256 of empty input is the well-known digest
    assert(one("to_hex(sha256(CAST('' AS BINARY)))") ==
      "E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855")
    assert(one("length(sha512(CAST('x' AS BINARY)))") == 64)
    // UTC session: zone offset components are zero
    assert(one("timezone_hour(TIMESTAMP '2024-06-01 12:00:00')") == 0L)
    assert(one("timezone_minute(TIMESTAMP '2024-06-01 12:00:00')") == 0L)
    assert(one("to_milliseconds(parse_duration('3.2s'))") == 3200L)
    assert(one("to_milliseconds(INTERVAL '2' MINUTE)") == 120000L)
  }

  test("json_parse canonicalizes; json_format returns the text") {
    assert(one("json_parse('{\"a\" : 1,  \"b\": [1 , 2]}')") == "{\"a\":1,\"b\":[1,2]}")
    assert(one("json_parse('nope')") == null)
    assert(one("json_format(json_parse('[1, 2]'))") == "[1,2]")
  }

  test("presto json_size and is_json_scalar parse for real") {
    assert(one("json_size('{\"a\": 1, \"b\": {\"c\": 2}}', '$')") == 2)
    assert(one("json_size('{\"a\": 1, \"b\": {\"c\": 2}}', '$.b')") == 1)
    assert(one("json_size('[1, [2, 3], 4]', '$')") == 3)
    assert(one("json_size('{\"a\": 1}', '$.a')") == 0)
    assert(one("json_size('{\"a\": 1}', '$.missing')") == null)
    // json_array_get: negative index counts from the end; out-of-Int
    // indices are off-path NULL, not a crash
    assert(one("json_array_get('[10, 20, 30]', 1)") == "20")
    assert(one("json_array_get('[10, 20, 30]', -1)") == "30")
    assert(one("json_array_get('[\"a\", [1,2]]', -1)") == "[1,2]")
    assert(one("json_array_get('[10]', 5)") == null)
    assert(one("json_extract('[1,2]', '$[2147483648]')") == null)
    // a string VALUE whose text looks like a container is still a scalar —
    // the case the old first-character sniff got wrong
    assert(one("is_json_scalar('\"[1,2]\"')") == true)
    assert(one("json_size('{\"a\": \"[1,2]\"}', '$.a')") == 0)
    assert(one("is_json_scalar('{\"a\": 1}')") == false)
    assert(one("is_json_scalar('not json')") == null)
  }

  test("ngrams") {
    val got = one("ngrams(array('a','b','c','d'), 2)")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]]
    assert(got.map(_.toList).toList ==
      List(List("a", "b"), List("b", "c"), List("c", "d")))
    val short = one("ngrams(array('a'), 3)")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]]
    assert(short.map(_.toList).toList == List(List("a")))
  }

  // ---- 3-arg strpos / match lambdas / ISO-8601 family ----
  test("strpos with instance argument") {
    assert(one("strpos('a.b.c', '.', 1)") == 2L)
    assert(one("strpos('a.b.c', '.', 2)") == 4L)
    assert(one("strpos('a.b.c', '.', 3)") == 0L)
    assert(one("strpos('a.b.c', '.', -1)") == 4L)
    assert(one("strpos('a.b.c', '.', -2)") == 2L)
    assert(one("strpos('a.b.c', 'z', 1)") == 0L)
  }

  test("any_match / all_match / none_match") {
    assert(one("any_match(array(1, 2, 3), x -> x > 2)") == true)
    assert(one("all_match(array(1, 2, 3), x -> x > 2)") == false)
    assert(one("all_match(array(3, 4), x -> x > 2)") == true)
    assert(one("none_match(array(1, 2, 3), x -> x > 5)") == true)
    assert(one("none_match(array(1, 2, 3), x -> x > 2)") == false)
  }

  test("iso8601 conversions") {
    assert(one("to_iso8601(DATE '2024-03-01')") == "2024-03-01")
    assert(one("to_iso8601(TIMESTAMP '2024-03-01 10:30:00.125')")
      == "2024-03-01T10:30:00.125")
    assert(one("from_iso8601_date('2024-03-01')").toString == "2024-03-01")
    assert(one("CAST(from_iso8601_timestamp('2024-03-01T10:30:00') AS STRING)")
      == "2024-03-01 10:30:00")
    // zone offsets normalize to the session zone (UTC)
    assert(one("CAST(from_iso8601_timestamp('2024-03-01T10:30:00+02:00') AS STRING)")
      == "2024-03-01 08:30:00")
  }

  // ---- parse_duration (ParseDurationFunction.java) ----
  test("parse_duration units and errors") {
    assert(one("parse_duration('5m') = INTERVAL '5' MINUTE") == true)
    assert(one("parse_duration('1.5h') = INTERVAL '90' MINUTE") == true)
    assert(one("parse_duration('2d') = INTERVAL '48' HOUR") == true)
    assert(one("parse_duration('3.2ms') = INTERVAL '0 00:00:00.0032' DAY TO SECOND") == true)
    assert(one("try(parse_duration('7 parsecs'))") == null)
  }

  // ---- session functions (reference: current_user etc. resolved by the
  //      session context, StatementAnalyzer; Spark builtins supply them —
  //      values are session-dependent, so assert shape, not content) ----
  test("session functions resolve from the session context") {
    assert(one("current_user()") != null)
    assert(one("current_database()") != null)
    assert(one("current_timezone()") == "UTC") // pinned by the session conf
    val d = one("current_date()").asInstanceOf[java.sql.Date]
    assert(d.toLocalDate.getYear >= 2024)
    // current_timestamp is fixed within one query (query-start semantics,
    // same as the reference's per-query session time)
    val row = spark.sql("SELECT current_timestamp() AS a, current_timestamp() AS b")
      .collect()(0)
    assert(row.get(0) == row.get(1))
  }
}
