package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Locks the differential-fuzz layer (functions/FunctionFuzzer.scala).
  *
  * The actual cross-engine differential — Spark vs DuckDB over every
  * generated expression — runs in the driver's oracle gate, because the
  * fuzz banks are ordinary declared queries (`fuzz_expr_bank_*`,
  * `Q.sqlSame`). What this spec locks is everything that gate relies on:
  * the generator is deterministic (same seed → byte-identical SQL, so
  * the oracle hash cannot drift between rounds), the registry entries
  * are exactly regenerations, the SQL executes in Spark with the
  * declared shape, and the NULL plumbing (guarded `%`) actually
  * exercises three-valued logic rather than degenerating to all-null or
  * no-null columns.
  */
class FuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  test("generator is deterministic: same seed, same SQL") {
    assert(graft.functions.FunctionFuzzer.generate(101L, 42) ==
      graft.functions.FunctionFuzzer.generate(101L, 42))
    assert(graft.functions.FunctionFuzzer.generate(101L, 42) !=
      graft.functions.FunctionFuzzer.generate(202L, 42))
  }

  test("registry banks are exact regenerations (oracle hash cannot drift)") {
    val expected = Map(
      "fuzz_expr_bank_1" -> 101L, "fuzz_expr_bank_2" -> 202L,
      "fuzz_expr_bank_3" -> 303L, "fuzz_expr_bank_4" -> 606L)
    expected.foreach { case (name, seed) =>
      val q = Registry.all(name)
      assert(q.oracle.contains(graft.functions.FunctionFuzzer.generate(seed, 42)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    }
    for ((name, seed) <- Seq("fuzz_date_bank_1" -> 404L, "fuzz_date_bank_2" -> 707L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateDates(seed, 42)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for ((name, seed) <- Seq("fuzz_agg_bank_1" -> 505L, "fuzz_agg_bank_2" -> 808L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateAggs(seed, 40)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for ((name, seed) <- Seq("fuzz_window_bank_1" -> 909L, "fuzz_window_bank_2" -> 1010L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateWindows(seed, 30)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for ((name, seed) <- Seq("fuzz_rangewindow_bank_1" -> 1101L,
        "fuzz_rangewindow_bank_2" -> 1102L)) {
      val sql = Registry.all(name).oracle.get
      assert(sql == graft.functions.FunctionFuzzer.generateRangeWindows(seed, 20),
        s"$name's oracle SQL is not the seed-$seed regeneration")
      assert(sql.contains("RANGE BETWEEN") && sql.contains("PRECEDING"),
        s"$name: no value-RANGE frame in the generated SQL")
    }
    for ((name, seed) <- Seq("fuzz_join_bank_1" -> 501L, "fuzz_join_bank_2" -> 33L,
        "fuzz_join_bank_3" -> 22L, "fuzz_join_bank_4" -> 66L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateJoins(seed, 12)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for (i <- 1 to 6)
      assert(Registry.all(s"fuzz_setop_bank_$i").oracle
        .contains(graft.functions.FunctionFuzzer.generateSetOps(599L + i, 9)),
        s"fuzz_setop_bank_$i's oracle SQL is not the seed-${599 + i} regeneration")
    for (i <- 1 to 4)
      assert(Registry.all(s"fuzz_groupingsets_bank_$i").oracle
        .contains(graft.functions.FunctionFuzzer.generateGroupingSets(699L + i, 15)),
        s"fuzz_groupingsets_bank_$i's oracle SQL is not the seed-${699 + i} regeneration")
    for (i <- 1 to 2)
      assert(Registry.all(s"fuzz_scalarsubq_bank_$i").oracle
        .contains(graft.functions.FunctionFuzzer.generateScalarSubqueries(800L + i, 12)),
        s"fuzz_scalarsubq_bank_$i's oracle SQL is not the seed-${800 + i} regeneration")
    for ((name, seed) <- Seq("fuzz_lateral_bank_1" -> 900L, "fuzz_lateral_bank_2" -> 903L,
        "fuzz_lateral_bank_3" -> 905L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateLaterals(seed)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for (i <- 1 to 2)
      assert(Registry.all(s"fuzz_distinctagg_bank_$i").oracle
        .contains(graft.functions.FunctionFuzzer.generateDistinctAggs(1300L + i, 25)),
        s"fuzz_distinctagg_bank_$i's oracle SQL is not the seed-${1300 + i} regeneration")
    for (i <- 1 to 2)
      assert(Registry.all(s"fuzz_timestamp_bank_$i").oracle
        .contains(graft.functions.FunctionFuzzer.generateTimestamps(1600L + i, 42)),
        s"fuzz_timestamp_bank_$i's oracle SQL is not the seed-${1600 + i} regeneration")
    for ((name, seed) <- Seq("fuzz_semianti_bank_1" -> 1506L, "fuzz_semianti_bank_2" -> 1503L,
        "fuzz_semianti_bank_3" -> 1502L, "fuzz_semianti_bank_4" -> 1500L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateSemiAnti(seed)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for ((name, seed) <- Seq("fuzz_joinagg_bank_1" -> 1728L, "fuzz_joinagg_bank_2" -> 1744L,
        "fuzz_joinagg_bank_3" -> 1803L, "fuzz_joinagg_bank_4" -> 1711L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateJoinAggs(seed, 12)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for (i <- 1 to 3) {
      val (sp, dk) = graft.functions.FunctionFuzzer.generateArrays(1400L + i, 30)
      assert(Registry.all(s"fuzz_array_bank_$i").oracle.contains(dk),
        s"fuzz_array_bank_$i's oracle SQL is not the seed-${1400 + i} regeneration")
      assert(sp != dk,
        s"fuzz_array_bank_$i degenerated to one dialect — arrays/lambdas must differ")
    }
    for (i <- 1 to 2) {
      val (sp, dk) = graft.functions.FunctionFuzzer.generateStructs(1900L + i, 24)
      assert(Registry.all(s"fuzz_struct_bank_$i").oracle.contains(dk),
        s"fuzz_struct_bank_$i's oracle SQL is not the seed-${1900 + i} regeneration")
      assert(sp != dk,
        s"fuzz_struct_bank_$i degenerated to one dialect — struct spellings must differ")
    }
    for (i <- 1 to 2) {
      val (sp, dk) = graft.functions.FunctionFuzzer.generateMaps(2000L + i, 24)
      assert(Registry.all(s"fuzz_map_bank_$i").oracle.contains(dk),
        s"fuzz_map_bank_$i's oracle SQL is not the seed-${2000 + i} regeneration")
      assert(sp != dk,
        s"fuzz_map_bank_$i degenerated to one dialect — map spellings must differ")
    }
    for ((name, seed) <- Seq("fuzz_ordering_bank_1" -> 2106L,
        "fuzz_ordering_bank_2" -> 2108L, "fuzz_ordering_bank_3" -> 2115L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateOrderings(seed, 3)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for ((name, seed) <- Seq("fuzz_ctereuse_bank_1" -> 2201L, "fuzz_ctereuse_bank_2" -> 2202L))
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateCteReuse(seed, 8)),
        s"$name's oracle SQL is not the seed-$seed regeneration")
    for (i <- 1 to 2) {
      val (sp, dk) = graft.functions.FunctionFuzzer.generateIgnoreNullsWindows(2800L + i, 24)
      assert(Registry.all(s"fuzz_ignorenulls_bank_$i").oracle.contains(dk),
        s"fuzz_ignorenulls_bank_$i's oracle SQL is not the seed-${2800 + i} regeneration")
      assert(sp != dk && sp.contains("IGNORE NULLS OVER") && dk.contains("IGNORE NULLS)"),
        s"fuzz_ignorenulls_bank_$i: the dialects must place the modifier differently")
    }
    for (i <- 1 to 2) {
      val sql = graft.functions.FunctionFuzzer.generateLikePatterns(2900L + i, 28)
      assert(Registry.all(s"fuzz_like_bank_$i").oracle.contains(sql),
        s"fuzz_like_bank_$i's oracle SQL is not the seed-${2900 + i} regeneration")
      assert(sql.contains("ESCAPE '!'") && sql.contains("ILIKE") && sql.contains("NOT LIKE"),
        s"fuzz_like_bank_$i must cover the ESCAPE, ILIKE, and negated shapes")
    }
  }

  test("the tstz banks regenerate (oracle AND helper columns) and cover the surface") {
    for (i <- 1 to 2) {
      val seed = 3100L + i
      val (dk, cols) = graft.functions.FunctionFuzzer.generateTstz(seed, 18)
      assert(Registry.all(s"fuzz_tstz_bank_$i").oracle.contains(dk),
        s"fuzz_tstz_bank_$i's oracle SQL is not the seed-$seed regeneration")
      // the Spark side regenerates to identical expression trees
      val (_, cols2) = graft.functions.FunctionFuzzer.generateTstz(seed, 18)
      assert(cols.map { case (n, c) => (n, c.toString) } ==
        cols2.map { case (n, c) => (n, c.toString) },
        s"fuzz_tstz_bank_$i's Spark columns must be a pure function of the seed")
      // surface coverage: packing arithmetic, wall presentation, pre-1970
      assert(dk.contains("* 4096 +"), "a packed-value shape must be drawn")
      assert(dk.contains("timezone("), "a wall-clock shape must be drawn")
      assert(dk.contains("INTERVAL 1 YEAR"), "a pre-1970 instant must be drawn")
      assert(cols.size == 18)
    }
  }

  test("the trycast banks regenerate with both successes and failures per bank") {
    for (i <- 1 to 2) {
      val name = s"fuzz_trycast_bank_$i"
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateTryCasts(2800L + i, 24)),
        s"$name's oracle SQL is not the seed-${2800 + i} regeneration")
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.length == 25)
      val cells = rows.flatMap(r => (1 until r.length).map(r.isNullAt))
      assert(cells.contains(true) && cells.contains(false),
        s"$name: TRY_CAST must produce BOTH successes and NULLs")
    }
  }

  test("the json banks regenerate and exercise miss/past-the-end NULLs") {
    for (i <- 1 to 2) {
      val name = s"fuzz_json_bank_$i"
      val (sp, dk) = graft.functions.FunctionFuzzer.generateJson(2700L + i, 24)
      assert(Registry.all(name).oracle.contains(dk),
        s"$name's oracle SQL is not the seed-${2700 + i} regeneration")
      assert(sp != dk && sp.contains("json_extract_scalar")
        && dk.contains("json_extract_string"),
        s"$name: the dual dialect function names must differ")
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.length == 25)
      assert(rows.exists(r => (1 until r.length).exists(r.isNullAt)),
        s"$name: no NULLs — off-path extraction went unexercised")
    }
  }

  test("the string banks regenerate, diverge per dialect, and cover the family") {
    for (i <- 1 to 2) {
      val name = s"fuzz_string_bank_$i"
      val (sp, dk) = graft.functions.FunctionFuzzer.generateStrings(2600L + i, 30)
      assert(Registry.all(name).oracle.contains(dk),
        s"$name's oracle SQL is not the seed-${2600 + i} regeneration")
      assert(sp != dk, s"$name degenerated to one dialect — prefix tests must differ")
      for (f <- Seq("split_part", "position", "translate", "repeat"))
        assert(dk.contains(f), s"$name: $f missing from the bank")
      assert(Registry.all(name).fn(spark, sfDir).collect().length == 25)
    }
  }

  test("the decimal banks regenerate, keep a decimal payload, and canonicalize to DOUBLE") {
    import org.apache.spark.sql.types.DoubleType
    for (i <- 1 to 2) {
      val name = s"fuzz_decimal_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateDecimals(2500L + i, 20)),
        s"$name's oracle SQL is not the seed-${2500 + i} regeneration")
      assert(!sql.contains("/"), s"$name: division lives in the divmod banks, not here")
      assert(sql.contains("DECIMAL("), s"$name: the decimal-arithmetic payload vanished")
      val df = Registry.all(name).fn(spark, sfDir)
      val pinned = df.schema.fields.filter(_.name.startsWith("e"))
      // DOUBLE output is the driver-hash-stable canonical form (the
      // round-9 red: DECIMAL(38,10) hashes asymmetrically — pyarrow
      // decimal.Decimal vs DuckDB float64)
      assert(pinned.nonEmpty && pinned.forall(_.dataType == DoubleType),
        s"$name: output columns must all be DOUBLE (driver-hash-stable)")
      assert(df.collect().nonEmpty)
    }
  }

  test("the decimal division/modulus banks regenerate with exact-friendly divisors") {
    import org.apache.spark.sql.types.DoubleType
    for (i <- 1 to 2) {
      val name = s"fuzz_decimaldiv_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateDecimalDivMod(2900L + i, 20)),
        s"$name's oracle SQL is not the seed-${2900 + i} regeneration")
      assert(sql.contains("/") && sql.contains("%"),
        s"$name: must exercise both division and modulus")
      // every division's divisor must come from the 5-smooth literal set
      // (exactness contract: DuckDB's `/` on decimals returns DOUBLE, so
      // only terminating quotients of exactly-representable operands
      // land on the same bits as Spark's exact decimal quotient)
      val okDiv = Set("2", "4", "5", "8", "10", "16", "1.25", "2.5", "6.25")
      val divisorRe = """/ CAST\(([0-9.]+) AS DECIMAL""".r
      val found = divisorRe.findAllMatchIn(sql).map(_.group(1)).toSeq
      assert(found.nonEmpty, s"$name: no division divisors found")
      assert(found.forall(okDiv.contains),
        s"$name: non-5-smooth divisor leaked: ${found.filterNot(okDiv.contains)}")
      val df = Registry.all(name).fn(spark, sfDir)
      val pinned = df.schema.fields.filter(_.name.startsWith("e"))
      assert(pinned.nonEmpty && pinned.forall(_.dataType == DoubleType))
      assert(df.collect().nonEmpty)
    }
  }

  test("the decimal saturate banks regenerate and overflow row-dependently to NULL") {
    import org.apache.spark.sql.types.DoubleType
    for (i <- 1 to 2) {
      val name = s"fuzz_decimalsat_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generateDecimalSaturate(2950L + i, 20)),
        s"$name's oracle SQL is not the seed-${2950 + i} regeneration")
      assert(sql.contains("TRY_CAST"), s"$name: the overflow payload is TRY_CAST")
      // target scale never drops below the source scale 2 (scale-reducing
      // casts are the documented HALF_UP-vs-truncate divergence)
      val tgtRe = """TRY_CAST\(.*AS DECIMAL\((\d+),(\d+)\)\)""".r
      val scales = tgtRe.findAllMatchIn(sql).map(_.group(2).toInt).toSeq
      assert(scales.nonEmpty && scales.forall(_ >= 2),
        s"$name: scale-reducing TRY_CAST leaked (scales: $scales)")
      val df = Registry.all(name).fn(spark, sfDir)
      val pinned = df.schema.fields.filter(_.name.startsWith("e"))
      assert(pinned.nonEmpty && pinned.forall(_.dataType == DoubleType))
      val rows = df.collect()
      assert(rows.nonEmpty)
      // the overflow boundary must actually split: some nulls, some values
      val cells = for (r <- rows; f <- pinned) yield r.getAs[Any](f.name)
      assert(cells.exists(_ == null), s"$name: no row overflowed — boundary untested")
      assert(cells.exists(_ != null), s"$name: everything overflowed — boundary untested")
    }
  }

  test("the predicate banks carry UNKNOWN through raw columns") {
    for (i <- 1 to 2) {
      val name = s"fuzz_predicate_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(Registry.all(name).oracle
        .contains(graft.functions.FunctionFuzzer.generatePredicates(2400L + i, 30)),
        s"$name's oracle SQL is not the seed-${2400 + i} regeneration")
      assert(sql.contains("NOT IN") && sql.contains("DISTINCT FROM")
        && sql.contains("BETWEEN"), s"$name: missing a predicate family")
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.length == 25, s"$name: expected 25 nation rows")
      val nulls = rows.map(r => (1 until r.length).count(r.isNullAt)).sum
      assert(nulls > 0, s"$name: no NULL cells — UNKNOWN never surfaced raw")
    }
  }

  test("the unnest banks drop empty-array rows and keep ordinality arithmetic") {
    val shapes = (1 to 3).map { i =>
      val name = s"fuzz_unnest_bank_$i"
      val q = Registry.all(name)
      val dk = q.oracle.get
      val rows = q.fn(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name: vacuous unnest bank")
      val ks = rows.map(_.get(0).asInstanceOf[Number].longValue).distinct.length
      assert(ks < 25, s"$name: all 25 keys survived — no empty arrays were generated")
      if (dk.contains("GROUP BY")) "AGG" else "FLAT"
    }
    assert(shapes.toSet == Set("FLAT", "AGG"),
      s"unnest banks cover $shapes, want both the flat and aggregate-back shapes")
    for (i <- 1 to 3) {
      val (sp, dk) = graft.functions.FunctionFuzzer.generateUnnest(
        Seq(2312L, 2307L, 2301L)(i - 1))
      assert(Registry.all(s"fuzz_unnest_bank_$i").oracle.contains(dk),
        s"fuzz_unnest_bank_$i's oracle SQL is not its seed regeneration")
      assert(sp != dk, s"fuzz_unnest_bank_$i degenerated to one dialect")
    }
  }

  test("the ordering banks select a nontrivial row set under NULL sort keys") {
    for (i <- 1 to 3) {
      val name = s"fuzz_ordering_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(sql.contains("NULLS FIRST") && sql.contains("DESC")
        && "OFFSET [1-9]".r.findFirstIn(sql).nonEmpty,
        s"$name: missing NULLS FIRST, DESC, or a nonzero OFFSET")
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.nonEmpty && rows.length < 25,
        s"$name: OFFSET/LIMIT selected ${rows.length} of 25 rows — not a proper subset")
      assert(rows.exists(r => (1 until r.length).exists(r.isNullAt)),
        s"$name: no NULL sort keys in the selected set")
    }
  }

  test("the CTE-reuse banks consume both references with misaligned keys") {
    for (i <- 1 to 2) {
      val name = s"fuzz_ctereuse_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert("FROM base l JOIN base r".r.findFirstIn(sql).nonEmpty,
        s"$name: the CTE is not self-joined")
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.length == 5, s"$name: expected all 5 wrapped region groups")
    }
  }

  test("the map banks execute in Spark and exercise the miss->NULL path") {
    for (i <- 1 to 2) {
      val name = s"fuzz_map_bank_$i"
      val df = Registry.all(name).fn(spark, sfDir)
      val rows = df.collect()
      assert(rows.length == 25 && df.columns.length == 25,
        s"$name: expected 25 nation rows x (k + 24 expression columns)")
      val nulls = rows.map(r => (1 until r.length).count(r.isNullAt)).sum
      assert(nulls > 0, s"$name: no NULL cells — the miss-lookup path went unexercised")
    }
  }

  test("the struct banks execute in Spark with nested access and equality present") {
    for (i <- 1 to 2) {
      val name = s"fuzz_struct_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(sql.contains(".n.x") && sql.contains("= {'p'"),
        s"$name: missing nested access or whole-struct equality")
      val df = Registry.all(name).fn(spark, sfDir)
      assert(df.collect().length == 25 && df.columns.length == 25,
        s"$name: expected 25 nation rows x (k + 24 expression columns)")
    }
  }

  test("the semi/anti banks cover all four shapes, non-vacuously") {
    val shapes = (1 to 4).map { i =>
      val name = s"fuzz_semianti_bank_$i"
      val sql = Registry.all(name).oracle.get
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name: vacuous semi/anti bank")
      assert(rows.length < 25, s"$name: the subquery predicates filtered nothing")
      if (sql.contains("NOT IN")) "NULLAWARE_ANTI"
      else if (sql.contains("NOT EXISTS")) "SEMI_ANTI"
      else if (sql.contains("IN (SELECT r_regionkey FROM region WHERE r_regionkey IN")
        || sql.contains("AND x.r_regionkey IN")) "NESTED"
      else "SEMI_SEMI"
    }
    assert(shapes.toSet == Set("SEMI_SEMI", "SEMI_ANTI", "NULLAWARE_ANTI", "NESTED"),
      s"semi/anti banks do not cover all four shapes: $shapes")
  }

  test("the join-agg banks: HAVING drops groups, join types covered, NULL group present") {
    val joinTypes = scala.collection.mutable.Set[String]()
    var sawNullGroup = false
    for (i <- 1 to 4) {
      val name = s"fuzz_joinagg_bank_$i"
      val sql = Registry.all(name).oracle.get
      joinTypes += "FROM nation (LEFT|RIGHT|FULL) JOIN".r.findFirstMatchIn(sql).get.group(1)
      val kept = Registry.all(name).fn(spark, sfDir).collect()
      assert(kept.nonEmpty, s"$name: vacuous bank (HAVING dropped everything)")
      // re-run with the HAVING line stripped: the clause must be doing work
      val noHaving = sql.replaceAll("(?m)^HAVING .*\\n", "")
      Tables.ensure(spark, sfDir)
      val all = spark.sql(noHaving).collect()
      assert(kept.length < all.length,
        s"$name: HAVING kept all ${all.length} groups — vacuous predicate")
      sawNullGroup ||= kept.exists(_.isNullAt(0))
    }
    assert(joinTypes == Set("LEFT", "RIGHT", "FULL"),
      s"join-agg banks cover $joinTypes, want all three outer join types")
    assert(sawNullGroup, "no bank surfaced a NULL group key — null-extension untested")
  }

  test("the timestamp banks execute with sub-day structure (minutes survive)") {
    for (i <- 1 to 2) {
      val name = s"fuzz_timestamp_bank_$i"
      val sql = Registry.all(name).oracle.get
      assert(sql.contains("make_timestamp") && sql.contains("INTERVAL"),
        s"$name: missing construction or interval arithmetic")
      val df = Registry.all(name).fn(spark, sfDir)
      val rows = df.collect()
      assert(rows.length == 25 && df.columns.length == 43,
        s"$name: expected 25 nation rows × (k + 42 expression columns)")
    }
  }

  test("the distinct-agg banks plan through Expand (multi-distinct) over 5 regions") {
    for (i <- 1 to 2) {
      val name = s"fuzz_distinctagg_bank_$i"
      val q = Registry.all(name)
      assert(q.oracle.get.contains("COUNT(DISTINCT") && q.oracle.get.contains("SUM(DISTINCT"),
        s"$name: missing distinct aggregates in the generated SQL")
      val df = q.fn(spark, sfDir)
      assert(df.queryExecution.executedPlan.toString.contains("Expand"),
        s"$name: multiple distinct groups must lower through Expand")
      val rows = df.collect()
      assert(rows.length == 5 && df.columns.length == 26,
        s"$name: expected 5 region rows × (g + 25 aggregates)")
    }
  }

  test("the array banks execute with the declared shape and both dialects' HOFs") {
    for (i <- 1 to 3) {
      val name = s"fuzz_array_bank_$i"
      val dk = Registry.all(name).oracle.get
      assert(dk.contains("list_reduce"), s"$name: duck text lost its fold form")
      val df = Registry.all(name).fn(spark, sfDir)
      val rows = df.collect()
      assert(rows.length == 25 && df.columns.length == 31,
        s"$name: expected 25 nation rows × (k + 30 expression columns)")
      // the serialized-array columns (i % 5 == 0) must be strings — the
      // driver comparator cannot sort array cells
      assert(df.schema.fields.forall(f =>
        !f.dataType.typeName.startsWith("array")),
        s"$name: an array-typed output column leaked past serialization")
    }
  }

  test("the lateral banks cover cross-drop, left-pad, and aggregate shapes") {
    val cross = Registry.all("fuzz_lateral_bank_1").fn(spark, sfDir).collect()
    assert(cross.length < 25 && cross.nonEmpty,
      "comma-LATERAL bank must DROP outer rows whose lateral is empty")
    val left = Registry.all("fuzz_lateral_bank_2").fn(spark, sfDir).collect()
    assert(left.exists(_.isNullAt(1)),
      "LEFT JOIN LATERAL bank must PAD empty laterals with NULLs")
    val agg = Registry.all("fuzz_lateral_bank_3").fn(spark, sfDir).collect()
    assert(agg.length == 25,
      "aggregate-lateral bank must keep exactly one row per outer row")
  }

  test("the scalar-subquery banks hit empty correlation groups (NULL cells appear)") {
    for (i <- 1 to 2) {
      val name = s"fuzz_scalarsubq_bank_$i"
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.length == 25, s"$name: expected the 25 nation rows")
      assert(rows.exists(r => (1 until r.length).exists(r.isNullAt)),
        s"$name: no NULL cells — empty-group decorrelation is unexercised")
    }
  }

  test("the grouping-sets banks cover all four shapes and emit subtotal rows") {
    val shapes = (1 to 4).map { i =>
      val name = s"fuzz_groupingsets_bank_$i"
      val sql = Registry.all(name).oracle.get
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name: vacuous grouping bank")
      // f_a/f_b are the first two columns; any flag=1 row is a subtotal
      assert(rows.exists(r => r.getInt(0) == 1 || r.getInt(1) == 1),
        s"$name: no subtotal rows — the roll-up path is unexercised")
      if (sql.contains("ROLLUP(")) "ROLLUP"
      else if (sql.contains("CUBE(")) "CUBE"
      else if (sql.contains("()")) "GS_TOTAL"
      else "GS_PLAIN"
    }
    assert(shapes.toSet == Set("ROLLUP", "CUBE", "GS_TOTAL", "GS_PLAIN"),
      s"grouping banks do not cover all four shapes: $shapes")
  }

  test("the six set-op banks cover all six operators, non-vacuously, with NULL rows") {
    val ops = (1 to 6).map { i =>
      val name = s"fuzz_setop_bank_$i"
      val sql = Registry.all(name).oracle.get
      val rows = Registry.all(name).fn(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name: vacuous set-op bank")
      assert(rows.exists(r => (0 until r.length).exists(r.isNullAt)),
        s"$name: no NULL cells — the not-distinct matching path is unexercised")
      "(?m)^(UNION ALL|UNION|INTERSECT ALL|INTERSECT|EXCEPT ALL|EXCEPT)$".r
        .findFirstIn(sql)
        .getOrElse(fail(s"$name: no set operator found"))
    }
    assert(ops.toSet == Set("UNION", "UNION ALL", "INTERSECT", "EXCEPT",
      "INTERSECT ALL", "EXCEPT ALL"),
      s"set-op banks do not cover all six operators: $ops")
  }

  test("the four join banks cover all four join types and padded rows appear") {
    val types = Seq("fuzz_join_bank_1", "fuzz_join_bank_2", "fuzz_join_bank_3",
      "fuzz_join_bank_4").map { name =>
      val sql = Registry.all(name).oracle.get
      val df = Registry.all(name).fn(spark, sfDir)
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name: vacuous join bank")
      assert(df.columns.take(2).sameElements(Array("k1", "k2")))
      "(?m)^FROM l ((?:LEFT |RIGHT |FULL )?JOIN) r ".r
        .findFirstMatchIn(sql).map(_.group(1))
        .getOrElse(fail(s"$name: no join clause found"))
    }
    assert(types.toSet == Set("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"),
      s"join banks do not cover all four types: $types")
    // at least one bank pads: some k1 or k2 NULL from outer non-match
    val padded = Seq("fuzz_join_bank_2", "fuzz_join_bank_4").exists { name =>
      Registry.all(name).fn(spark, sfDir).collect()
        .exists(r => r.isNullAt(0) || r.isNullAt(1))
    }
    assert(padded, "no outer-join padding visible in the left/full banks")
  }

  test("banks execute in Spark with the declared shape") {
    val widths = Map(
      "fuzz_expr_bank_1" -> 42, "fuzz_expr_bank_2" -> 42,
      "fuzz_expr_bank_3" -> 42, "fuzz_expr_bank_4" -> 42,
      "fuzz_date_bank_1" -> 42, "fuzz_date_bank_2" -> 42,
      "fuzz_window_bank_1" -> 30, "fuzz_window_bank_2" -> 30)
    for ((name, n) <- widths) {
      val df = Registry.all(name).fn(spark, sfDir)
      val rows = df.collect()
      assert(rows.length == 25, s"$name: expected the 25 nation rows")
      assert(df.columns.length == n + 1, s"$name: expected k + $n expression columns")
      assert(df.columns.head == "k")
    }
  }

  test("the agg bank groups to the 5 regions with 40 aggregate columns") {
    val df = Registry.all("fuzz_agg_bank_1").fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 5, "expected one row per region")
    assert(df.columns.length == 41 && df.columns.head == "g")
  }

  test("the guarded % exercises real three-valued logic (some null, not all)") {
    val df = Registry.all("fuzz_expr_bank_1").fn(spark, sfDir)
    val rows = df.collect()
    val cells = for (r <- rows; i <- 1 until df.columns.length) yield r.isNullAt(i)
    assert(cells.contains(true), "no NULL ever produced — the % guard is dead code")
    assert(cells.contains(false), "every cell NULL — the banks degenerated")
  }
}
