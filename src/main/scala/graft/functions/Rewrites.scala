package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import graft.functions.sketches._
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, Conv, DateAdd, DateDiff, DateFormatClass, Expression, GetJsonObject, LambdaFunction, StringLocate, TimestampAdd, TimestampDiff, TryEval, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy, ReduceAggPlaceholder}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DecimalType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.GraftSqlBridge.toCol
import org.apache.spark.sql.functions._

/** Presto-named functions expressed as *native Catalyst expression rewrites*
  * (SURVEY.md §7.2 step 3; the reference registration list is
  * presto-main/.../metadata/FunctionRegistry.java:403-655). Each builder
  * expands at analysis time into built-in expressions, so the executed plan
  * is identical to hand-written Spark SQL — whole-stage codegen'd, no UDF
  * boundary, no per-row dispatch. This is the Spark-first replacement for
  * the reference's bytecode specialization (sql/gen/ExpressionCompiler.java).
  */
object Rewrites {

  private type Builder = PartialFunction[Seq[Column], Column]
  private type Registry = (String, Builder)

  /** Column → catalyst Expression through the session's converter (see
    * GraftSqlBridge — the static path leaves unresolvable wrappers).
    */
  private def toExpr(c: Column)(implicit spark: SparkSession): Expression =
    GraftSqlBridge.toExpr(spark, c)

  /** Extract a required string literal (e.g. a datetime pattern) at
    * analysis time so dialect translation costs nothing per row.
    */
  private def litStr(c: Column, fn: String)(implicit spark: SparkSession): String = {
    val e = toExpr(c)
    if (!e.foldable) throw new IllegalArgumentException(
      s"graft $fn: pattern argument must be a literal string")
    String.valueOf(e.eval(null))
  }

  /** Seconds offset of the session zone at the instant: to_utc_timestamp
    * re-interprets the wall time in the session zone, so the difference IS
    * the zone offset (0 under the engine's UTC pin, correct elsewhere).
    */
  private def tzOffsetSecs(t: Column): Column =
    unix_seconds(t.cast("timestamp")) -
      unix_seconds(to_utc_timestamp(t.cast("timestamp"), call_function("current_timezone")))

  private def defs(implicit spark: SparkSession): Seq[Registry] = Seq(

    // ---------- strings (operator/scalar/StringFunctions.java) ----------
    // 3-arg form finds the N-th occurrence (StringFunctions.java stringPosition
    // with instance); negative instance counts from the end, like the reference
    "strpos" -> {
      case Seq(s, sub) => toCol(new StringLocate(toExpr(sub), toExpr(s)))
      case Seq(s, sub, inst) => call_function("strpos_instance", s, sub, inst) },
    "levenshtein_distance" -> { case Seq(a, b) => levenshtein(a, b) },
    "split_to_map" -> { case Seq(s, ed, kd) =>
      toCol(org.apache.spark.sql.catalyst.expressions.StringToMap(toExpr(s), toExpr(ed), toExpr(kd))) },
    // split_to_multimap keeps every value per key (SplitToMultimapFunction
    // .java): group the split k/v pairs by distinct key
    "split_to_multimap" -> { case Seq(s, ed, kd) =>
      val pairs = transform(call_function("split", s, ed),
        e => struct(call_function("substring_index", e, kd, lit(1)).as("k"),
          call_function("substring_index", e, kd, lit(-1)).as("v")))
      val keys = array_distinct(transform(pairs, p => p.getField("k")))
      map_from_arrays(keys,
        transform(keys, k0 =>
          transform(filter(pairs, p => p.getField("k") === k0), p => p.getField("v")))) },
    "codepoint" -> { case Seq(s) => ascii(s) },
    "to_utf8" -> { case Seq(s) => encode(s, "UTF-8") },
    "from_utf8" -> { case Seq(b) => decode(b, "UTF-8") },
    // Presto regexp_split(s, pattern) ≡ Spark split(s, regex) — same
    // regex-delimiter semantics, different name
    "regexp_split" -> { case Seq(s, p) => call_function("split", s, p) },
    // regexp_replace: Presto's 2-arg form deletes matches; the 3-arg form
    // dispatches on the replacement — a lambda gets the replace-with-
    // function HOF (JoniRegexpFunctions.java lambda overload; capture
    // groups arrive as array<varchar>), a string gets Spark's builtin
    // (emitted as the catalyst class directly — same-name override).
    "regexp_replace" -> {
      case Seq(s, p) =>
        toCol(org.apache.spark.sql.catalyst.expressions.RegExpReplace(
          toExpr(s), toExpr(p), toExpr(lit(""))))
      case Seq(s, p, r) => toExpr(r) match {
        case lf: LambdaFunction =>
          toCol(org.apache.spark.sql.catalyst.expressions.RegExpReplaceWithLambda(
            toExpr(s), toExpr(p), lf))
        case rep =>
          toCol(org.apache.spark.sql.catalyst.expressions.RegExpReplace(
            toExpr(s), toExpr(p), rep))
      } },
    "to_hex" -> { case Seq(b) => upper(hex(b)) },
    "from_hex" -> { case Seq(s) => unhex(s) },
    // varbinary digests (HashingFunctions.java) — Spark's sha2 emits hex
    // text, unhex restores the reference's varbinary output type
    "sha256" -> { case Seq(x) => unhex(sha2(x.cast("binary"), 256)) },
    "sha512" -> { case Seq(x) => unhex(sha2(x.cast("binary"), 512)) },
    "to_base64" -> { case Seq(b) => base64(b) },
    "from_base64" -> { case Seq(s) => unbase64(s) },
    // base64url: RFC 4648 §5 alphabet — translate +/ to -_
    "to_base64url" -> { case Seq(b) => translate(base64(b), "+/", "-_") },
    "from_base64url" -> { case Seq(s) => unbase64(translate(s, "-_", "+/")) },

    // ---------- math (operator/scalar/MathFunctions.java) ----------
    "from_base" -> { case Seq(s, r) => toCol(new Conv(toExpr(s), toExpr(r), toExpr(lit(10)))).cast("bigint") },
    "to_base" -> { case Seq(x, r) => lower(toCol(new Conv(toExpr(x.cast("string")), toExpr(lit(10)), toExpr(r)))) },
    "truncate" -> {
      case Seq(x) => (signum(x) * floor(abs(x))).cast("double")
      case Seq(x, n) =>   // truncate toward zero at n decimal places
        val scale = pow(lit(10.0), n)
        (signum(x) * floor(abs(x) * scale) / scale).cast("double") },
    "is_nan" -> { case Seq(x) => isnan(x) },
    "is_infinite" -> { case Seq(x) => abs(x) === lit(Double.PositiveInfinity) },
    "is_finite" -> { case Seq(x) => !isnan(x) && abs(x) =!= lit(Double.PositiveInfinity) },
    "infinity" -> { case Seq() => lit(Double.PositiveInfinity) },
    "nan" -> { case Seq() => lit(Double.NaN) },
    "e" -> { case Seq() => lit(math.E) },
    "bitwise_and" -> { case Seq(a, b) => a.bitwiseAND(b) },
    "bitwise_or" -> { case Seq(a, b) => a.bitwiseOR(b) },
    "bitwise_xor" -> { case Seq(a, b) => a.bitwiseXOR(b) },
    "bitwise_not" -> { case Seq(a) => toCol(org.apache.spark.sql.catalyst.expressions.BitwiseNot(toExpr(a))) },
    // bit_count(x, bits): population count of the low `bits` of the two's
    // complement representation (BitwiseFunctions.java); 1-arg delegates
    // to the 64-bit builtin (same-name override → direct expression)
    "bit_count" -> {
      case Seq(x) => toCol(org.apache.spark.sql.catalyst.expressions.BitwiseCount(toExpr(x)))
      case Seq(x, bits) =>
        val mask = when(bits === 64, lit(-1L))
          .otherwise(call_function("shiftleft", lit(1L), bits.cast("int")) - 1L)
        toCol(org.apache.spark.sql.catalyst.expressions.BitwiseCount(
          toExpr(x.cast("bigint").bitwiseAND(mask)))) },
    // cosine similarity: dense array<numeric> (the LLM-pipeline shape —
    // native flat-loop kernel, sketches.CosineSimilarityExpr) or the
    // reference's sparse map<k,double> form (MathFunctions.java
    // cosine_similarity), dispatched on resolved input type. Zero vectors
    // yield NULL (0/0) rather than an error.
    "cosine_similarity" -> { case Seq(a, b) =>
      def norm(v: Column) =
        sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
      if (toExpr(a).dataType.isInstanceOf[org.apache.spark.sql.types.MapType]) {
        val dot = aggregate(map_keys(a), lit(0.0),
          (acc, k0) => acc + coalesce(element_at(a, k0), lit(0.0)) * coalesce(element_at(b, k0), lit(0.0)))
        dot / nullif(norm(map_values(a)) * norm(map_values(b)), lit(0.0))
      } else {
        toCol(CosineSimilarityExpr(toExpr(a), toExpr(b)))
      } },
    // width_bucket array-of-bins variant (MathFunctions.java 2-arg form):
    // index = number of bin boundaries ≤ x; 4-arg form is the builtin
    // (same-name override → direct expression)
    "width_bucket" -> {
      case Seq(x, bins) => size(filter(bins, b => b <= x)).cast("bigint")
      case Seq(x, lo, hi, n) =>
        toCol(org.apache.spark.sql.catalyst.expressions.WidthBucket(
          toExpr(x), toExpr(lo), toExpr(hi), toExpr(n))) },
    // Wilson score interval (operator/scalar/WilsonInterval.java)
    "wilson_interval_lower" -> { case Seq(s, n, z) => wilson(s, n, z, lower = true) },
    "wilson_interval_upper" -> { case Seq(s, n, z) => wilson(s, n, z, lower = false) },

    // ---------- datetime (operator/scalar/DateTimeFunctions.java) ----------
    // ISO day-of-week 1=Mon..7=Sun (Spark dayofweek is 1=Sun..7=Sat)
    "day_of_week" -> { case Seq(t) => ((dayofweek(t) + lit(5)) % lit(7)) + lit(1) },
    "dow" -> { case Seq(t) => ((dayofweek(t) + lit(5)) % lit(7)) + lit(1) },
    "day_of_year" -> { case Seq(t) => dayofyear(t) },
    "doy" -> { case Seq(t) => dayofyear(t) },
    "day_of_month" -> { case Seq(t) => dayofmonth(t) },
    "week" -> { case Seq(t) => weekofyear(t) },
    "week_of_year" -> { case Seq(t) => weekofyear(t) },
    // ISO week-year = calendar year of that week's Thursday
    "year_of_week" -> { case Seq(t) => isoWeekYear(t) },
    "yow" -> { case Seq(t) => isoWeekYear(t) },
    "last_day_of_month" -> { case Seq(t) => last_day(t) },
    // at_timezone / with_timezone (DateTimeFunctions.java; the reference's
    // timestamp-with-time-zone type has no Spark counterpart — SURVEY
    // §7.4.1 — so these convert wall-clock representation instead:
    // at_timezone renders the instant in the target zone, with_timezone
    // interprets a wall-clock reading as being in the given zone)
    "at_timezone" -> { case Seq(t, z) => from_utc_timestamp(t, z) },
    "with_timezone" -> { case Seq(t, z) => to_utc_timestamp(t, z) },
    "from_unixtime" -> { case Seq(x) => timestamp_seconds(x) },
    // ISO-8601 family (DateTimeFunctions.java from_iso8601_* / to_iso8601):
    // Spark's timestamp/date casts accept ISO-8601 text (incl. 'T' and
    // zone offsets, normalized to the session zone); to_iso8601 dispatches
    // on the resolved input type like the reference's overloads.
    "from_iso8601_timestamp" -> { case Seq(s) => s.cast("timestamp") },
    "from_iso8601_date" -> { case Seq(s) => s.cast("date") },
    "to_iso8601" -> { case Seq(x) =>
      if (toExpr(x).dataType == org.apache.spark.sql.types.DateType)
        toCol(DateFormatClass(toExpr(x.cast("timestamp")), toExpr(lit("yyyy-MM-dd"))))
      else
        toCol(DateFormatClass(toExpr(x.cast("timestamp")),
          toExpr(lit("yyyy-MM-dd'T'HH:mm:ss.SSS")))) },
    "to_unixtime" -> { case Seq(t) => (unix_micros(t.cast("timestamp")).cast("double") / lit(1e6)) },
    // millisecond-of-second (DateTimeFunctions.java) — pmod keeps pre-epoch
    // timestamps in 0..999
    "millisecond" -> { case Seq(t) =>
      (pmod(unix_micros(t.cast("timestamp")), lit(1000000L)) / 1000).cast("bigint") },
    // to_milliseconds(day-time interval): epoch + interval → µs is exact
    // under the UTC session pin, avoiding the end-field truncation of a
    // direct interval cast
    "to_milliseconds" -> { case Seq(i) =>
      (unix_micros(to_timestamp(lit("1970-01-01 00:00:00")) + i) / 1000).cast("bigint") },
    // session-zone offset components at the instant (negative east→west
    // split mirrors the reference: -05:30 → hour -5, minute -30)
    "timezone_hour" -> { case Seq(t) =>
      (tzOffsetSecs(t) / 3600).cast("bigint") },
    "timezone_minute" -> { case Seq(t) =>
      ((tzOffsetSecs(t) % 3600) / 60).cast("bigint") },
    // MySQL-pattern parse; format side is handled by dialect sniffing below
    "date_parse" -> { case Seq(s, f) =>
      to_timestamp(s, Patterns.mysqlToJava(litStr(f, "date_parse"))) },
    // Spark's own date_format BUT with MySQL %-patterns auto-translated: a
    // literal pattern containing '%' cannot be a java.time pattern ('%' is
    // invalid there), so translation is unambiguous. NB: overridden names
    // must emit their catalyst expression directly — calling the same-named
    // DSL function inside the builder would re-enter this builder forever.
    "date_format" -> { case Seq(t, f) =>
      val p = litStr(f, "date_format")
      toCol(DateFormatClass(toExpr(t),
        toExpr(lit(if (p.contains("%")) Patterns.mysqlToJava(p) else p)))) },
    "format_datetime" -> { case Seq(t, f) =>
      toCol(DateFormatClass(toExpr(t),
        toExpr(lit(Patterns.jodaToJava(litStr(f, "format_datetime")))))) },
    "parse_datetime" -> { case Seq(s, f) =>
      to_timestamp(s, Patterns.jodaToJava(litStr(f, "parse_datetime"))) },
    // Presto 3-arg date_add('unit', n, ts) / date_diff('unit', a, b);
    // 2-arg forms keep the Spark built-ins' semantics (direct expressions,
    // same self-reference caveat as date_format).
    "date_add" -> {
      case Seq(u, n, t) => toCol(new TimestampAdd(litStr(u, "date_add").toUpperCase, toExpr(n), toExpr(t)))
      case Seq(d, n) => toCol(DateAdd(toExpr(d), toExpr(n))) },
    "date_diff" -> {
      case Seq(u, a, b) => toCol(new TimestampDiff(litStr(u, "date_diff").toUpperCase, toExpr(a), toExpr(b)))
      case Seq(end, start) => toCol(DateDiff(toExpr(end), toExpr(start))) },

    // ---------- sketch aggregates (SURVEY.md §7.3; HLL value type is
    //            BinaryType — see graft.functions.sketches.Hll) ----------
    "approx_set" -> { case Seq(x) => toCol(ApproxSetAgg(toExpr(x)).toAggregateExpression()) },
    // merge() unions HLL, qdigest or setdigest sketches, dispatching per blob
    "merge" -> { case Seq(x) => toCol(SketchUnionAgg(toExpr(x)).toAggregateExpression()) },
    // setdigest family (type/setdigest/SetDigestFunctions.java) — the
    // re-mergeable bottom-k MinHash sketch; exact below saturation
    "make_set_digest" -> { case Seq(x) => toCol(MakeSetDigestAgg(toExpr(x)).toAggregateExpression()) },
    "merge_set_digest" -> { case Seq(x) => toCol(SketchUnionAgg(toExpr(x)).toAggregateExpression()) },
    "jaccard_index" -> { case Seq(a, b) => toCol(JaccardIndex(toExpr(a), toExpr(b))) },
    "intersection_cardinality" -> { case Seq(a, b) => toCol(IntersectionCardinality(toExpr(a), toExpr(b))) },
    "hash_counts" -> { case Seq(x) => toCol(HashCounts(toExpr(x))) },
    "empty_approx_set" -> { case Seq() => lit(Hll.empty()) },
    // qdigest family (QuantileDigestAggregationFunction.java,
    // scalar/QuantileDigestFunctions.java)
    "qdigest_agg" -> { case Seq(x) => toCol(QDigestAgg(toExpr(x)).toAggregateExpression()) },
    "value_at_quantile" -> { case Seq(d, q) => toCol(ValueAtQuantile(toExpr(d), toExpr(q))) },
    "values_at_quantiles" -> { case Seq(d, q) => toCol(ValuesAtQuantiles(toExpr(d), toExpr(q))) },
    "quantile_at_value" -> { case Seq(d, v) => toCol(QuantileAtValue(toExpr(d), toExpr(v))) },
    // histogram / map aggregates (operator/aggregation/histogram/, Map*.java)
    "histogram" -> { case Seq(x) => toCol(HistogramAgg(toExpr(x)).toAggregateExpression()) },
    "map_agg" -> { case Seq(k, v) => toCol(MapAggAgg(toExpr(k), toExpr(v)).toAggregateExpression()) },
    "map_union" -> { case Seq(m) => toCol(MapUnionAgg(toExpr(m)).toAggregateExpression()) },
    "multimap_agg" -> { case Seq(k, v) => toCol(MultimapAggAgg(toExpr(k), toExpr(v)).toAggregateExpression()) },
    // checksum: order-independent content hash matching the reference's
    // shape (ChecksumAggregationFunction.java:132): per-row 64-bit hash
    // summed with WRAPPING 64-bit addition, emitted as an 8-byte varbinary.
    // The wrap is done in exact decimal then mapped back into long range
    // (ANSI-safe: the value is reduced mod 2^64 first). Residual drift vs
    // the reference: the row hash is Spark's xxhash64 (vs Presto's
    // type-specific XxHash64 blocks), so the BITS differ cross-engine, but
    // the algebra — commutative, wrapping, varbinary — is the same.
    "checksum" -> { case Seq(x) =>
      val two64 = lit(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64)))
      val two63 = lit(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(63)))
      val s = pmod(sum(xxhash64(x).cast(DecimalType(38, 0))), two64)
      val wrapped = when(s >= two63, s - two64).otherwise(s).cast("bigint")
      call_function("to_big_endian_64", wrapped) },
    // min_by/max_by n-variants (MinNAggregationFunction.java/TypedHeap.java);
    // 2-arg forms emit the catalyst builtins directly (same-name override)
    "min_by" -> {
      case Seq(x, y) => toCol(MinBy(toExpr(x), toExpr(y)).toAggregateExpression())
      case Seq(x, y, n) => toCol(MinMaxByNAgg(toExpr(x), toExpr(y), toExpr(n),
        isMax = false).toAggregateExpression()) },
    "max_by" -> {
      case Seq(x, y) => toCol(MaxBy(toExpr(x), toExpr(y)).toAggregateExpression())
      case Seq(x, y, n) => toCol(MinMaxByNAgg(toExpr(x), toExpr(y), toExpr(n),
        isMax = true).toAggregateExpression()) },
    // array_agg keeps NULL elements (arrayagg/ArrayAggregationFunction
    // .java) where Spark's collect_list/array_agg drop them: collect
    // non-null struct wrappers, then unwrap
    "array_agg" -> { case Seq(x) =>
      transform(collect_list(struct(x.as("v"))), s => s.getField("v")) },
    // numeric_histogram(buckets, x) (NumericHistogram.java — Ben-Haim &
    // Tom-Tov streaming histogram)
    "numeric_histogram" -> { case Seq(b, x) =>
      toCol(NumericHistogramAgg(toExpr(b), toExpr(x)).toAggregateExpression()) },
    // approx_most_frequent(buckets, x, capacity) — SpaceSaving heavy
    // hitters (post-reference in Presto; part of the corpus-stats surface:
    // top-k token counts with O(capacity) state per group). Exact while
    // distinct keys <= capacity on every partition.
    "approx_most_frequent" -> { case Seq(b, x, c) =>
      toCol(ApproxMostFrequentAgg(toExpr(b), toExpr(x), toExpr(c)).toAggregateExpression()) },
    // reduce_agg(x, init, inputFn, combineFn) (ReduceAggregationFunction
    // .java) — mergeable TypedImperativeAggregate: O(1) state per group,
    // combineFn actually runs on merge (see aggregate/ReduceAgg.scala).
    // The registry must return a *non-aggregate* HigherOrderFunction root
    // (the analyzer's lambda check rejects anything else after it wraps
    // AggregateFunctions in AggregateExpression), so: placeholder HOF here,
    // swapped for the real aggregate by graft.ResolveReduceAgg when the
    // GraftExtensions rule is installed. Without the extension, fall back
    // to a value-correct single-pass ArrayAggregate fold (collects the
    // group — O(group) memory, combineFn unused; null on empty input to
    // match the aggregate's semantics).
    "reduce_agg" -> { case Seq(x, init, inputFn, combineFn) =>
      if (reduceAggRuleInstalled)
        toCol(ReduceAggPlaceholder(toExpr(x), toExpr(init), toExpr(inputFn),
          toExpr(combineFn)))
      else {
        val arr = transform(collect_list(struct(x.as("v"))), s => s.getField("v"))
        val folded = toCol(ArrayAggregate(toExpr(arr), toExpr(init),
          toExpr(inputFn).asInstanceOf[LambdaFunction], LambdaFunction.identity))
        when(size(arr) > 0, folded)
      } },

    // ---------- arrays (operator/scalar/Array*Function.java) ----------
    // cardinality covers arrays/maps AND HLL sketches (Presto's HyperLogLog
    // type) — dispatch on the resolved input type.
    "cardinality" -> { case Seq(a) =>
      if (toExpr(a).dataType == BinaryType) toCol(HllCardinality(toExpr(a))) else size(a) },
    "contains" -> { case Seq(a, v) => array_contains(a, v) },
    "ngrams" -> { case Seq(a, n) =>
      transform(sequence(lit(1), greatest(size(a) - n + lit(1), lit(1))),
        i => slice(a, i, n)) },
    "zip" -> { case cols if cols.size >= 2 => arrays_zip(cols: _*) },
    // multimap_from_entries(array<struct<k,v>>) keeps every value per key
    // (MultimapFromEntriesFunction.java)
    "multimap_from_entries" -> { case Seq(entries) =>
      val keys = array_distinct(transform(entries, e => e.getField("key")))
      map_from_arrays(keys,
        transform(keys, k0 =>
          transform(filter(entries, e => e.getField("key") === k0),
            e => e.getField("value")))) },
    "array_ngrams" -> { case Seq(a, n) =>
      transform(sequence(lit(1), greatest(size(a) - n + lit(1), lit(1))),
        i => slice(a, i, n)) },

    // any_match/all_match/none_match (scalar/ArrayAnyMatchFunction.java +
    // All/None siblings) — Spark spells them exists/forall; emit the
    // catalyst HOFs directly so the lambda binds through the standard path
    "any_match" -> { case Seq(a, f) =>
      toCol(org.apache.spark.sql.catalyst.expressions.ArrayExists(toExpr(a), toExpr(f))) },
    "all_match" -> { case Seq(a, f) =>
      toCol(org.apache.spark.sql.catalyst.expressions.ArrayForAll(toExpr(a), toExpr(f))) },
    // none_match must keep a HigherOrderFunction ROOT (the analyzer's
    // lambda check rejects Not(exists(...))): forall with the negated
    // lambda body is the same three-valued result — any f-true → false,
    // some f-null and no f-true → null, else true.
    "none_match" -> { case Seq(a, f) =>
      toExpr(f) match {
        case lf: LambdaFunction =>
          toCol(org.apache.spark.sql.catalyst.expressions.ArrayForAll(toExpr(a),
            lf.copy(function = org.apache.spark.sql.catalyst.expressions.Not(lf.function))))
        case other => throw new IllegalArgumentException(
          s"none_match: second argument must be a lambda, got $other")
      } },

    // ---------- JSON (operator/scalar/JsonFunctions.java) ----------
    // Native Jackson walk over Presto's path dialect (PrestoJson.scala):
    // scalar-vs-complex NULLs, numeric tokens matching arrays AND object
    // fields, quoted bracket fields with dots, decoded escapes, lenient
    // trailing commas — the edges where get_json_object diverges
    // (JsonExtract.java; vectors from TestJsonExtract.java in
    // FunctionsSpec).
    "json_extract_scalar" -> { case Seq(j, p) =>
      toCol(PrestoJsonExtract(toExpr(j), toExpr(p), mode = 1)) },
    "json_extract" -> { case Seq(j, p) =>
      toCol(PrestoJsonExtract(toExpr(j), toExpr(p), mode = 0)) },
    // json_array_get: same native dialect; Presto's negative index counts
    // from the end (JsonFunctions.java), resolved via json_size($) — NULL
    // input or a non-array stays NULL through the size lookup.
    "json_array_get" -> { case Seq(j, i) =>
      val len = toCol(PrestoJsonExtract(toExpr(j), toExpr(lit("$")), mode = 2))
      val idx = when(i >= 0, i.cast("long")).otherwise(len.cast("long") + i.cast("long"))
      toCol(PrestoJsonExtract(toExpr(j),
        toExpr(concat(lit("$["), idx.cast("string"), lit("]"))), mode = 0)) },
    // json_parse canonicalizes through the Jackson walk (Presto's JSON
    // type stores the parsed canonical form: '{"a" : 1}' → '{"a":1}');
    // malformed input → NULL. json_format of a (string-represented) JSON
    // value is the text itself.
    "json_parse" -> { case Seq(s) =>
      toCol(PrestoJsonExtract(toExpr(s), toExpr(lit("$")), mode = 0)) },
    "json_format" -> { case Seq(j) => j },
    "json_size" -> { case Seq(j, p) =>
      toCol(PrestoJsonExtract(toExpr(j), toExpr(p), mode = 2)) },
    "is_json_scalar" -> { case Seq(j) => toCol(PrestoIsJsonScalar(toExpr(j))) },
    "json_array_contains" -> { case Seq(j, v) =>
      toCol(PrestoJsonArrayContains(toExpr(j), toExpr(v))) },

    // ---------- URL (operator/scalar/UrlFunctions.java) ----------
    "url_extract_protocol" -> { case Seq(u) => parse_url(u, lit("PROTOCOL")) },
    "url_extract_host" -> { case Seq(u) => parse_url(u, lit("HOST")) },
    "url_extract_path" -> { case Seq(u) => parse_url(u, lit("PATH")) },
    "url_extract_query" -> { case Seq(u) => parse_url(u, lit("QUERY")) },
    "url_extract_fragment" -> { case Seq(u) => parse_url(u, lit("REF")) },
    "url_extract_parameter" -> { case Seq(u, k) => parse_url(u, lit("QUERY"), k) },
    "url_extract_port" -> { case Seq(u) =>
      nullif(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:([0-9]+)", 1), lit("")).cast("bigint") },

    // ---------- conditionals / misc ----------
    "format" -> { case cols if cols.nonEmpty => call_function("format_string", cols: _*) },
    // Generic TRY(expr) (scalar/TryFunction.java): NULL instead of a
    // runtime error for the wrapped expression — Spark's TryEval is the
    // exact machinery its own try_add/try_divide use (codegen'd try/catch
    // around the child), so ANSI cast/arith/overflow errors become NULL.
    "try" -> { case Seq(x) => toCol(TryEval(toExpr(x))) },
    // parse_presto_data_size('2.3MB') → DECIMAL(38,0) bytes
    // (scalar/DataSizeFunctions.java: value × 1024^unit, truncated toward
    // zero). Pure-expression form: regex split + exact decimal factors via
    // a when-chain — codegen'd, no UDF; invalid input raises like the
    // reference (wrap in try() for NULL-on-bad-input).
    "parse_presto_data_size" -> { case Seq(s) =>
      val pat = "^(\\d+(?:\\.\\d+)?)([a-zA-Z]+)$"
      val num = regexp_extract(s, pat, 1).cast(DecimalType(24, 10))
      val unit = regexp_extract(s, pat, 2)
      val unitFactors = Seq("B", "kB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB")
        .zipWithIndex.map { case (u, k) =>
          u -> new java.math.BigDecimal(java.math.BigInteger.valueOf(1024).pow(k)) }
      val factor = unitFactors.tail
        .foldLeft(when(unit === unitFactors.head._1, lit(unitFactors.head._2))) {
          case (w, (u, f)) => w.when(unit === u, lit(f)) }
        .otherwise(raise_error(concat(lit("Invalid data size: '"), s, lit("'")))
          .cast(DecimalType(38, 0)))
      floor(num * factor).cast(DecimalType(38, 0)) },
    // parse_duration('3.2ms') → day-time interval
    // (scalar/ParseDurationFunction.java; units ns…d). Spark's
    // DayTimeIntervalType has µs resolution vs the reference's ms — a
    // superset; unknown units raise, as there.
    "parse_duration" -> { case Seq(s) =>
      val pat = "^\\s*(\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)\\s*$"
      val num = regexp_extract(s, pat, 1).cast("double")
      val unit = regexp_extract(s, pat, 2)
      val secsPer = Seq("ns" -> 1e-9, "us" -> 1e-6, "ms" -> 1e-3,
        "s" -> 1.0, "m" -> 60.0, "h" -> 3600.0, "d" -> 86400.0)
      val factor = secsPer.tail
        .foldLeft(when(unit === secsPer.head._1, lit(secsPer.head._2))) {
          case (w, (u, f)) => w.when(unit === u, lit(f)) }
        .otherwise(raise_error(
          concat(lit("Unknown duration unit in '"), s, lit("'"))).cast("double"))
      make_dt_interval(lit(0), lit(0), lit(0),
        (num * factor).cast(DecimalType(18, 6))) },

    // ---------- graft pipeline accelerators (NOT Presto surface) ----------
    // The LLM-dedup hot loops as single flat-loop native expressions; the
    // Column-DSL forms in llm/TextOps delegate here. Spec-locked to be
    // value-identical to their lambda formulations.
    "word_shingles" -> { case Seq(t, nn) =>
      toCol(WordShingles(toExpr(t), toExpr(nn))) },
    "simhash64" -> { case Seq(e) => toCol(SimHash64Expr(toExpr(e))) },
    "rolling_fingerprint" -> { case Seq(t, ww) =>
      toCol(RollingFingerprint(toExpr(t), toExpr(ww))) },
    "lsh_sign_bucket" -> { case Seq(v, np, dm) =>
      def intLit(c: Column, what: String): Int = toExpr(c).eval(null) match {
        case n: java.lang.Number => n.intValue
        case other => throw new IllegalArgumentException(
          s"lsh_sign_bucket: $what must be an integer literal, got $other")
      }
      toCol(LshSignBucket(toExpr(v), intLit(np, "nPlanes"), intLit(dm, "dim"))) },
    "minhash_signature" -> { case Seq(e, kk) =>
      val k = toExpr(kk).eval(null) match {
        case i: java.lang.Integer => i.intValue
        case n: java.lang.Number => n.intValue
        case d: org.apache.spark.sql.types.Decimal => d.toInt
        case other => throw new IllegalArgumentException(
          s"minhash_signature: k must be an integer literal, got $other")
      }
      toCol(MinhashSignature(toExpr(e), k)) },

    // ---------- aggregate rewrites (operator/aggregation/) ----------
    // dsum8(x) ≡ CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE) — the exact
    // fixed-point money sum on a codegen'd two-long buffer (see Dsum8's
    // scaladoc; bitwise equality spec-locked in Dsum8Spec). NOT Presto
    // surface: a graft accelerator for the engine's canonical
    // exact-decimal-sum pattern.
    "dsum8" -> { case Seq(x) =>
      toCol(org.apache.spark.sql.catalyst.expressions.aggregate.Dsum8(toExpr(x))
        .toAggregateExpression()) },
    // dsum8_dec(x) ≡ SUM(CAST(x AS DECIMAL(30,8))) as exact DECIMAL(38,8)
    // — the pre-aggregation building block for two-level rollup rewrites
    // (the outer decimal re-sum stays exact; the double cast happens above).
    "dsum8_dec" -> { case Seq(x) =>
      toCol(org.apache.spark.sql.catalyst.expressions.aggregate.Dsum8(toExpr(x),
        exactDecimal = true).toAggregateExpression()) },
    "geometric_mean" -> { case Seq(x) => exp(avg(log(x))) },
    "approx_distinct" -> {
      case Seq(x) => approx_count_distinct(x)
      case Seq(x, e) =>
        // a bare SQL literal like 0.0040625 parses as DECIMAL — accept any
        // numeric literal for the max-standard-error argument
        val sd = toExpr(e).eval(null) match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: java.lang.Number => n.doubleValue
          case other => throw new IllegalArgumentException(
            s"approx_distinct: max standard error must be a numeric literal, got $other")
        }
        toCol(org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus(
          toExpr(x), relativeSD = sd).toAggregateExpression()) },
    "arbitrary" -> { case Seq(x) => first(x, ignoreNulls = true) },
    // approx_percentile — the reference's most-used quantile aggregate
    // (ApproximateLongPercentileAggregations.java + Double/Real and Array
    // siblings). Scalar/array forms ride Spark's ApproximatePercentile
    // (GK summaries, mergeable, codegen'd); the weighted forms
    // (x, w, p[, accuracy]) ride Spark's exact percentile-with-frequency —
    // a valid "approximation" that is simply exact; Presto's weight is the
    // effective row count, so it casts to long. Results cast back to the
    // input type per the reference's signature (bigint in → bigint out).
    "approx_percentile" -> {
      case Seq(x, p) => approxPct(x, p)
      case Seq(x, w, p) => weightedPct(x, w, p)
      case Seq(x, w, p, _) => weightedPct(x, w, p)   // accuracy hint dropped
    }
  )

  /** True when the session was built with graft.GraftExtensions — the
    * reduce_agg placeholder can only resolve if the swap rule is present.
    */
  private def reduceAggRuleInstalled(implicit spark: SparkSession): Boolean =
    spark.sessionState.analyzer.extendedResolutionRules.exists(_ eq graft.ResolveReduceAgg)

  /** Spark's default ApproximatePercentile accuracy (1e4) bounds rank error
    * at n/10000 — the same envelope as the reference's qdigest default.
    */
  private def approxPct(x: Column, p: Column): Column =
    percentile_approx(x, p, lit(10000))

  /** Weighted percentile rides Spark's exact percentile-with-frequency.
    * Both the weight and the interpolated result are *rounded*, not
    * truncated: the reference's weight is a double treated as an effective
    * row count, and the DuckDB oracle rounds its continuous quantile the
    * same way — truncation on either side gives off-by-one mismatches
    * whenever the quantile interpolates to .5.
    */
  private def weightedPct(x: Column, w: Column, p: Column)(implicit spark: SparkSession): Column = {
    val exact = percentile(x, p, round(w).cast("long"))
    val xt = toExpr(x).dataType
    val arrayP = toExpr(p).dataType.isInstanceOf[ArrayType]
    xt match {
      case ByteType | ShortType | IntegerType | LongType =>
        if (arrayP) transform(exact, e => round(e)).cast(ArrayType(xt))
        else round(exact).cast(xt)
      case _ => exact
    }
  }

  private def wilson(s: Column, n: Column, z: Column, lower: Boolean): Column = {
    val p = s.cast("double") / n.cast("double")
    val z2n = z * z / n
    val center = p + z2n / lit(2.0)
    val spread = z * sqrt(p * (lit(1.0) - p) / n + z2n / (lit(4.0) * n))
    val num = if (lower) center - spread else center + spread
    num / (lit(1.0) + z2n)
  }

  private def isoWeekYear(t: Column)(implicit spark: SparkSession): Column = {
    val isoDow = ((dayofweek(t) + lit(5)) % lit(7)) + lit(1)
    // direct DateAdd: the date_add DSL name is overridden by this registry
    year(toCol(DateAdd(toExpr(t.cast("date")), toExpr(lit(4) - isoDow))))
  }

  def register(spark: SparkSession): Unit = {
    implicit val s: SparkSession = spark
    val registry = spark.sessionState.functionRegistry
    defs.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(
        name,
        (exprs: Seq[Expression]) =>
          toExpr(builder.applyOrElse(exprs.map(toCol), (cs: Seq[Column]) =>
            throw new IllegalArgumentException(
              s"graft $name: unsupported argument count ${cs.size}"))),
        "scala_udf")
    }
  }
}
