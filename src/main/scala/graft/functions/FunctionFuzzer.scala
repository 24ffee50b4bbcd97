package graft.functions

/** Deterministic differential-fuzz generator over the scalar-function
  * surface (VERDICT r8 ask #7). Emits SELECT statements of randomized
  * expression columns over the `nation` table in the DIALECT-COMMON
  * subset both Spark SQL and DuckDB evaluate identically; the statements
  * are registered as declared queries via `Q.sqlSame`, so the driver's
  * DuckDB oracle runs the actual cross-engine differential on every
  * round — a property net the reference itself does not have (its tests
  * are hand-written vectors, SURVEY §5.7; the closest analog is the H2
  * differential runner, which replays fixed queries, not generated ones).
  *
  * Determinism contract: same (seed, nCols) → byte-identical SQL, locked
  * by FuzzSpec against the registry entries. No wall-clock, no global
  * RNG — regeneration is the identity, so CORRECTNESS rows stay stable
  * across rounds.
  *
  * Dialect-subset rules (each shuts off a known cross-engine divergence):
  *  - every integer leaf is CAST(... AS BIGINT): Spark's 32-bit int
  *    arithmetic wraps silently where DuckDB promotes — 64-bit math on
  *    bounded leaves (|lit| ≤ 100, depth ≤ 3 ⇒ |product| ≤ 1e16) never
  *    overflows either engine;
  *  - `%` divisors go through NULLIF(..., 0): both engines use C-style
  *    truncated modulo, but x % 0 errors in DuckDB and NULLs in Spark;
  *  - no floating transcendentals (exp/ln/pow): libm vs java.lang.Math
  *    differ in final ULPs; integer/string/boolean kernels only;
  *  - string leaves are non-null columns/literals: concat(NULL) is NULL
  *    in Spark but skip-null in DuckDB;
  *  - three-valued logic (NULL from the guarded %) flows through CASE /
  *    comparisons / IS NULL identically in both engines and is part of
  *    what the fuzz exercises.
  */
object FunctionFuzzer {

  /** The shared expression grammar: draw order depends only on the call
    * sequence, so each bank's SQL is a pure function of its seed.
    */
  private final class ExprGen(rnd: scala.util.Random) {
    def intLeaf(): String = rnd.nextInt(5) match {
      case 0 => "CAST(n_nationkey AS BIGINT)"
      case 1 => "CAST(n_regionkey AS BIGINT)"
      case 2 => s"CAST(${rnd.nextInt(201) - 100} AS BIGINT)"
      case 3 => "CAST(length(n_name) AS BIGINT)"
      case _ => s"CAST(${rnd.nextInt(20) + 1} AS BIGINT)"
    }

    def strLeaf(): String = rnd.nextInt(3) match {
      case 0 => "n_name"
      case 1 => s"'FUZZ_${rnd.nextInt(100)}'"
      case _ => "CAST(n_nationkey AS STRING)"
    }

    def intExpr(d: Int): String =
      if (d <= 0) intLeaf()
      else rnd.nextInt(9) match {
        case 0 => s"(${intExpr(d - 1)} + ${intExpr(d - 1)})"
        case 1 => s"(${intExpr(d - 1)} - ${intExpr(d - 1)})"
        // multiplication only over leaves: keeps magnitudes ≤ ~1e4 per
        // factor so no chain can approach int64 range
        case 2 => s"(${intLeaf()} * ${intLeaf()})"
        case 3 => s"(${intExpr(d - 1)} % NULLIF(${intExpr(d - 1)}, 0))"
        case 4 => s"abs(${intExpr(d - 1)})"
        case 5 => s"least(${intExpr(d - 1)}, ${intExpr(d - 1)})"
        case 6 => s"greatest(${intExpr(d - 1)}, ${intExpr(d - 1)})"
        case 7 => s"(CASE WHEN ${boolExpr(d - 1)} THEN ${intExpr(d - 1)} ELSE ${intExpr(d - 1)} END)"
        case _ => s"CAST(length(${strExpr(d - 1)}) AS BIGINT)"
      }

    def strExpr(d: Int): String =
      if (d <= 0) strLeaf()
      else rnd.nextInt(9) match {
        case 0 => s"upper(${strExpr(d - 1)})"
        case 1 => s"lower(${strExpr(d - 1)})"
        case 2 => s"reverse(${strExpr(d - 1)})"
        case 3 => s"substr(${strExpr(d - 1)}, ${rnd.nextInt(3) + 1}, ${rnd.nextInt(8) + 1})"
        case 4 => s"concat(${strExpr(d - 1)}, ${strExpr(d - 1)})"
        case 5 => s"replace(${strExpr(d - 1)}, '${"ANT_0123456789".charAt(rnd.nextInt(14))}', '${"xyz".charAt(rnd.nextInt(3))}')"
        case 6 => s"lpad(${strExpr(d - 1)}, ${rnd.nextInt(12) + 1}, '${"abc".charAt(rnd.nextInt(3))}')"
        case 7 => s"rpad(${strExpr(d - 1)}, ${rnd.nextInt(12) + 1}, '${"pqr".charAt(rnd.nextInt(3))}')"
        case _ => s"trim(concat(' ', ${strExpr(d - 1)}, ' '))"
      }

    def boolExpr(d: Int): String =
      if (d <= 0) {
        val op = Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))
        s"(${intLeaf()} $op ${intLeaf()})"
      } else rnd.nextInt(7) match {
        case 0 => s"(${intExpr(d - 1)} ${Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))} ${intExpr(d - 1)})"
        case 1 => s"(${strExpr(d - 1)} ${Seq("=", "<>")(rnd.nextInt(2))} ${strExpr(d - 1)})"
        case 2 => s"(${boolExpr(d - 1)} AND ${boolExpr(d - 1)})"
        case 3 => s"(${boolExpr(d - 1)} OR ${boolExpr(d - 1)})"
        case 4 => s"(NOT ${boolExpr(d - 1)})"
        // plain patterns only: Spark's LIKE has a default `\` escape,
        // DuckDB's has none without an ESCAPE clause
        case 5 => s"(n_name LIKE '${Seq("NATION_1%", "%1%", "%_5", "N%9")(rnd.nextInt(4))}')"
        case _ => s"(${intExpr(d - 1)} IS NULL)"
      }
  }

  /** One fuzz bank: `SELECT n_nationkey AS k, e1, ..., eN FROM nation`. */
  def generate(seed: Long, nCols: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val cols = (1 to nCols).map { i =>
      val e = i % 3 match {
        case 1 => s"CAST(${g.intExpr(3)} AS BIGINT)"
        case 2 => g.strExpr(3)
        case _ => g.boolExpr(2)
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A date-family bank: randomized DATE expressions in the dialect-common
    * subset. Additional subset rules beyond [[generate]]'s:
    *  - dates are BUILT, never parsed: `make_date` over bounded int
    *    arithmetic (day ≤ 28 ⇒ always valid, both engines identical);
    *  - `date_trunc` results are CAST to DATE on both sides (Spark returns
    *    TIMESTAMP, DuckDB returns DATE — the cast pins the common type);
    *  - extractors (year/month/day/quarter/dayofyear) are CAST to BIGINT
    *    (Spark INT vs DuckDB BIGINT would fail the dtype-parity check);
    *  - no day-of-week, no +/- INTERVAL, no datediff: divergent numbering
    *    / result types / argument order across the two engines.
    */
  def generateDates(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)

    def dateLeaf(): String = rnd.nextInt(3) match {
      case 0 => f"DATE '${1992 + rnd.nextInt(9)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d'"
      case 1 => s"make_date(${1992 + rnd.nextInt(9)}, CAST(1 + (n_nationkey % 12) AS INT), ${1 + rnd.nextInt(28)})"
      case _ => s"make_date(CAST(1992 + (n_regionkey % 7) AS INT), ${1 + rnd.nextInt(12)}, CAST(1 + (n_nationkey % 28) AS INT))"
    }

    def dateExpr(d: Int): String =
      if (d <= 0) dateLeaf()
      else rnd.nextInt(6) match {
        case 0 => s"last_day(${dateExpr(d - 1)})"
        case 1 =>
          val unit = Seq("year", "quarter", "month", "week")(rnd.nextInt(4))
          s"CAST(date_trunc('$unit', ${dateExpr(d - 1)}) AS DATE)"
        case 2 => s"greatest(${dateExpr(d - 1)}, ${dateExpr(d - 1)})"
        case 3 => s"least(${dateExpr(d - 1)}, ${dateExpr(d - 1)})"
        case 4 => s"(CASE WHEN ${dateBool(d - 1)} THEN ${dateExpr(d - 1)} ELSE ${dateExpr(d - 1)} END)"
        case _ => dateLeaf()
      }

    def dateBool(d: Int): String = {
      val op = Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))
      s"(${dateExpr(d)} $op ${dateExpr(d)})"
    }

    def dateInt(d: Int): String = {
      val ex = Seq("year", "month", "day", "quarter", "dayofyear")(rnd.nextInt(5))
      s"CAST($ex(${dateExpr(d)}) AS BIGINT)"
    }

    val cols = (1 to nCols).map { i =>
      val e = i % 3 match {
        case 1 => dateInt(2)
        case 2 => dateExpr(2)
        case _ => dateBool(1)
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** An aggregation bank: randomized GROUPED aggregates over [[ExprGen]]
    * integer/boolean expressions — this differentials the partial-agg
    * merge paths (Spark's map-side combine vs DuckDB's single pass), not
    * just scalar kernels. Subset rules:
    *  - SUM is CAST to BIGINT on both sides (DuckDB promotes SUM(BIGINT)
    *    to HUGEINT where Spark stays BIGINT — the cast pins dtype parity;
    *    depth-2 operands keep |value| ≤ ~1e8, 25 rows ⇒ no overflow);
    *  - AVG runs over exact integer sums (integers are exact in double
    *    far beyond these magnitudes, so partial-agg order cannot perturb
    *    the one terminal division), then ROUND(…, 6);
    *  - conditional aggregation goes through CASE (NULLs ignored by both
    *    engines' SUM/COUNT/MIN/MAX identically);
    *  - no string MIN/MAX (collation ordering is out of the common
    *    subset; string EQUALITY is exercised inside the CASE guards).
    */
  def generateAggs(seed: Long, nAggs: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val cols = (1 to nAggs).map { i =>
      val e = i % 5 match {
        case 1 => s"CAST(SUM(CASE WHEN ${g.boolExpr(1)} THEN ${g.intExpr(2)} END) AS BIGINT)"
        case 2 => s"CAST(COUNT(CASE WHEN ${g.boolExpr(1)} THEN 1 END) AS BIGINT)"
        case 3 => s"CAST(MIN(${g.intExpr(2)}) AS BIGINT)"
        case 4 => s"CAST(MAX(${g.intExpr(2)}) AS BIGINT)"
        case _ => s"ROUND(AVG(CAST(${g.intExpr(2)} AS DOUBLE)), 6)"
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_regionkey AS g,
       |${cols.mkString(",\n")}
       |FROM nation
       |GROUP BY n_regionkey
       |ORDER BY g ASC NULLS LAST""".stripMargin
  }

  /** A window-function bank: randomized windowed aggregates / ranking /
    * value functions — this differentials the window operator (frame
    * evaluation, partition state, peer handling), a whole operator class
    * beyond the scalar and partial-agg banks. Subset rules:
    *  - every ORDER BY inside an OVER clause ends in the unique
    *    `n_nationkey`, so rank/lag/first_value are total-order
    *    deterministic in both engines (ties would otherwise make
    *    row_number engine-dependent);
    *  - ROWS frames only: RANGE peer semantics agree too, but ROWS over
    *    a unique ordering pins one row set per frame with no overlap in
    *    interpretation; frame bounds are literal PRECEDING/FOLLOWING;
    *  - aggregate inputs are [[ExprGen]] BIGINT expressions (same
    *    overflow/modulo guards as [[generate]]);
    *  - lag/lead carry explicit offset + NULL default (both engines'
    *    documented default, spelled out so neither dialect guesses);
    *  - ntile/percent_rank/cume_dist are CAST/ROUND-pinned to stable
    *    dtypes (INT, DOUBLE with 6-digit round).
    */
  def generateWindows(seed: Long, nCols: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val rnd = new scala.util.Random(seed ^ 0x5DEECE66DL)

    def over(partitioned: Boolean, framed: Boolean): String = {
      val part = if (partitioned) "PARTITION BY n_regionkey " else ""
      val frame =
        if (!framed) ""
        else rnd.nextInt(3) match {
          case 0 => " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
          case 1 => s" ROWS BETWEEN ${rnd.nextInt(4) + 1} PRECEDING AND CURRENT ROW"
          case _ => s" ROWS BETWEEN ${rnd.nextInt(3) + 1} PRECEDING AND ${rnd.nextInt(3) + 1} FOLLOWING"
        }
      s"OVER (${part}ORDER BY n_nationkey ASC$frame)"
    }

    val cols = (1 to nCols).map { i =>
      val e = i % 6 match {
        case 1 =>
          val fn = Seq("SUM", "MIN", "MAX")(rnd.nextInt(3))
          s"CAST($fn(${g.intExpr(2)}) ${over(rnd.nextBoolean(), framed = true)} AS BIGINT)"
        case 2 =>
          val fn = Seq("row_number()", "rank()", "dense_rank()")(rnd.nextInt(3))
          s"CAST($fn ${over(rnd.nextBoolean(), framed = false)} AS BIGINT)"
        case 3 =>
          val fn = Seq("lag", "lead")(rnd.nextInt(2))
          s"CAST($fn(${g.intExpr(2)}, ${rnd.nextInt(3) + 1}, NULL) ${over(rnd.nextBoolean(), framed = false)} AS BIGINT)"
        case 4 =>
          s"CAST(COUNT(CASE WHEN ${g.boolExpr(1)} THEN 1 END) ${over(rnd.nextBoolean(), framed = true)} AS BIGINT)"
        case 5 =>
          val fn = Seq("first_value", "last_value")(rnd.nextInt(2))
          s"CAST($fn(${g.intExpr(2)}) ${over(rnd.nextBoolean(), framed = true)} AS BIGINT)"
        case _ => rnd.nextInt(3) match {
          case 0 => s"CAST(ntile(${rnd.nextInt(5) + 2}) ${over(rnd.nextBoolean(), framed = false)} AS INT)"
          case 1 => s"ROUND(percent_rank() ${over(rnd.nextBoolean(), framed = false)}, 6)"
          case _ => s"ROUND(cume_dist() ${over(rnd.nextBoolean(), framed = false)}, 6)"
        }
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A LIKE-pattern bank: LIKE / NOT LIKE / ILIKE over drawn patterns —
    * contains/prefix/suffix shapes, `_` single-char wildcards, and
    * literal-wildcard matching through an ESCAPE character (`!`, chosen
    * so neither dialect's string-literal escaping is involved). Patterns
    * apply to n_name and to composed strings that PROVABLY contain `%`
    * (concat with a literal), so the escaped-wildcard rows decide both
    * ways. Identical text runs on both engines.
    */
  def generateLikePatterns(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds
    val frags = Seq("A", "AN", "IA", "ST", "RA", "UN", "ED", "IN", "E", "R")

    def subject(): String = rnd.nextInt(4) match {
      case 0 => "n_name"
      case 1 => "concat(n_name, '%')"
      case 2 => "concat('#', n_name)"
      case _ => "concat(n_name, '_', CAST(n_nationkey AS STRING))"
    }
    def frag(): String = frags(rnd.nextInt(frags.length))
    def pattern(): String = rnd.nextInt(6) match {
      case 0 => s"%${frag()}%"
      case 1 => s"${frag()}%"
      case 2 => s"%${frag()}"
      case 3 => s"${frag()}_%"
      case 4 => s"%${frag()}_${frag()}%"
      case _ => s"_%${frag()}%"
    }

    val cols = (1 to nCols).map { i =>
      val e = i % 4 match {
        case 1 => s"(${subject()} LIKE '${pattern()}')"
        case 2 => s"(${subject()} NOT LIKE '${pattern()}')"
        case 3 => s"(${subject()} ILIKE '${pattern().toLowerCase}')"
        case _ => rnd.nextInt(2) match {
          // literal '%' through ESCAPE: true exactly for the concat('%')
          // subjects, false for bare names — row-decided both ways
          case 0 => s"(${subject()} LIKE '%!%' ESCAPE '!')"
          case _ => s"(${subject()} LIKE '!%%' ESCAPE '!')"
        }
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A dual-dialect IGNORE NULLS window bank: lag/lead/first_value/
    * last_value/nth_value over a NULL-injected value series, in both
    * null-treatment polarities. The two dialects place the modifier
    * differently — Spark after the argument list (`lag(v, 2) IGNORE
    * NULLS OVER …`), DuckDB after the LAST argument inside it
    * (`lag(v, 2 IGNORE NULLS) OVER …`) — so the generator emits paired
    * texts; the VALUE semantics (n-th non-null in frame/offset order) are
    * what the differential then checks. ORDER BY the unique dense
    * n_nationkey keeps every window total-ordered, so results are exact.
    */
  def generateIgnoreNullsWindows(seed: Long, nCols: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    // row-dependent NULL injection: (key·a + b) % m is NULL where it hits r
    def valueLeaf(): String = {
      val a = rnd.nextInt(7) + 1
      val b = rnd.nextInt(10)
      val m = rnd.nextInt(7) + 3
      val r = rnd.nextInt(m)
      s"NULLIF(CAST((n_nationkey * $a + $b) % $m AS BIGINT), $r)"
    }

    def over(framed: Boolean): String = {
      val part = if (rnd.nextBoolean()) "PARTITION BY n_regionkey " else ""
      val frame =
        if (!framed) ""
        else rnd.nextInt(4) match {
          case 0 => " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
          case 1 => s" ROWS BETWEEN ${rnd.nextInt(4) + 1} PRECEDING AND CURRENT ROW"
          case 2 => s" ROWS BETWEEN ${rnd.nextInt(3) + 1} PRECEDING AND ${rnd.nextInt(3) + 1} FOLLOWING"
          case _ => " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
        }
      s"OVER (${part}ORDER BY n_nationkey ASC$frame)"
    }

    val cols = (1 to nCols).map { i =>
      val v = valueLeaf()
      val (sp, dk) = i % 4 match {
        case 1 =>
          val fn = if (rnd.nextBoolean()) "lag" else "lead"
          val n = rnd.nextInt(3) + 1
          val w = over(framed = false)
          (s"$fn($v, $n) IGNORE NULLS $w", s"$fn($v, $n IGNORE NULLS) $w")
        case 2 =>
          val fn = if (rnd.nextBoolean()) "first_value" else "last_value"
          val w = over(framed = true)
          (s"$fn($v) IGNORE NULLS $w", s"$fn($v IGNORE NULLS) $w")
        case 3 =>
          val n = rnd.nextInt(3) + 1
          val w = over(framed = true)
          (s"nth_value($v, $n) IGNORE NULLS $w", s"nth_value($v, $n IGNORE NULLS) $w")
        case _ =>
          // default (RESPECT NULLS) polarity over the same injected
          // series — locks that the modifier CHANGES the answer
          val fn = Seq("first_value", "last_value")(rnd.nextInt(2))
          val w = over(framed = true)
          val t = s"$fn($v) $w"
          (t, t)
      }
      (s"  CAST($sp AS BIGINT) AS e$i", s"  CAST($dk AS BIGINT) AS e$i")
    }
    def assemble(cs: Seq[String]): String =
      s"""SELECT n_nationkey AS k,
         |${cs.mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    (assemble(cols.map(_._1)), assemble(cols.map(_._2)))
  }

  /** A value-RANGE window bank: aggregates over RANGE frames with VALUE
    * offsets (`RANGE BETWEEN n PRECEDING AND m FOLLOWING` on a numeric
    * ORDER BY key) — the frame form [[generateWindows]] deliberately
    * excludes (it is ROWS-only) and the one where Spark is a superset of
    * the reference (Presto 323 rejects bounded RANGE PRECEDING,
    * StatementAnalyzer.java:1519). The ORDER BY key is the unique dense
    * `n_nationkey`, so the value-window row set is exact and identical
    * in both engines; aggregate inputs reuse [[ExprGen]]'s guarded
    * BIGINT grammar.
    */
  def generateRangeWindows(seed: Long, nCols: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val rnd = new scala.util.Random(seed ^ 0x5DEECE66DL)
    def frame(): String = rnd.nextInt(3) match {
      case 0 => s"RANGE BETWEEN ${rnd.nextInt(6) + 1} PRECEDING AND CURRENT ROW"
      case 1 => s"RANGE BETWEEN ${rnd.nextInt(4) + 1} PRECEDING AND ${rnd.nextInt(4) + 1} FOLLOWING"
      case _ => "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    }
    def over(): String = {
      val part = if (rnd.nextBoolean()) "PARTITION BY n_regionkey " else ""
      s"OVER (${part}ORDER BY n_nationkey ASC ${frame()})"
    }
    val cols = (1 to nCols).map { i =>
      val e = i % 4 match {
        case 1 => s"CAST(SUM(${g.intExpr(2)}) ${over()} AS BIGINT)"
        case 2 => s"CAST(MIN(${g.intExpr(2)}) ${over()} AS BIGINT)"
        case 3 => s"CAST(MAX(${g.intExpr(2)}) ${over()} AS BIGINT)"
        case _ => s"CAST(COUNT(CASE WHEN ${g.boolExpr(1)} THEN 1 END) ${over()} AS BIGINT)"
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A join bank: one randomized nation⋈region join — the operator class
    * where engines disagree most subtly. Each bank draws:
    *  - a join type (INNER/LEFT/RIGHT/FULL);
    *  - NULL injection into either side's join key (`NULLIF(key, k)`) —
    *    ANSI null keys never match, so outer padding appears on real rows;
    *  - optionally an extra ON-clause predicate — for outer joins ON-filter
    *    vs WHERE-filter placement changes which rows get padded, exactly
    *    the semantics worth differencing;
    *  - optionally a WHERE clause: a scalar predicate, an IN subquery over
    *    a list that may CONTAIN NULL (ANSI: match → TRUE, else NULL →
    *    filtered), a NOT IN over a non-null list, or a correlated EXISTS
    *    on the nullable key (padding killer).
    * Subset rules: projected expressions run over COALESCE-pinned leaves
    * (outer padding makes every column nullable; Spark's concat is
    * null-in-null-out where DuckDB's skips nulls, and least/greatest null
    * handling is version-dependent — coalesced leaves shut both off) while
    * IS NULL probes read the RAW nullable columns, so padding and
    * null-key semantics still flow into the differential. Row sets are
    * total-order deterministic: each l-row matches ≤1 region row, so
    * (k1 NULLS LAST, k2 NULLS LAST) is a total order. IN-subquery bounds
    * are drawn so the list is never empty and the filter never vacuous.
    */
  def generateJoins(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    // java.util.Random's first draws are correlated across nearby seeds
    // (every small seed's first nextInt(4) lands on the same value);
    // burning two longs decorrelates the join-type draw
    rnd.nextLong(); rnd.nextLong()
    val joinType = Seq("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN")(rnd.nextInt(4))
    val nullL = if (rnd.nextBoolean()) rnd.nextInt(5).toString else "99"
    val nullR = if (rnd.nextBoolean()) rnd.nextInt(5).toString else "99"

    def cmp(): String = Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))

    def intLeaf(): String = rnd.nextInt(6) match {
      case 0 => "CAST(COALESCE(l.lk, -9) AS BIGINT)"
      case 1 => "CAST(COALESCE(l.lrk, -1) AS BIGINT)"
      case 2 => "CAST(COALESCE(r.rk, -2) AS BIGINT)"
      case 3 => "CAST(COALESCE(r.rrk, -3) AS BIGINT)"
      case 4 => s"CAST(${rnd.nextInt(201) - 100} AS BIGINT)"
      case _ => "CAST(length(COALESCE(l.lname, 'L')) AS BIGINT)"
    }

    def strLeaf(): String = rnd.nextInt(3) match {
      case 0 => "COALESCE(l.lname, 'LNULL')"
      case 1 => "COALESCE(r.rname, 'RNULL')"
      case _ => s"'J_${rnd.nextInt(50)}'"
    }

    def intExpr(d: Int): String =
      if (d <= 0) intLeaf()
      else rnd.nextInt(7) match {
        case 0 => s"(${intExpr(d - 1)} + ${intExpr(d - 1)})"
        case 1 => s"(${intExpr(d - 1)} - ${intExpr(d - 1)})"
        case 2 => s"(${intLeaf()} * ${intLeaf()})"
        case 3 => s"(${intExpr(d - 1)} % NULLIF(${intExpr(d - 1)}, 0))"
        case 4 => s"abs(${intExpr(d - 1)})"
        case 5 => s"(CASE WHEN ${boolExpr(d - 1)} THEN ${intExpr(d - 1)} ELSE ${intExpr(d - 1)} END)"
        case _ => s"CAST(length(${strExpr(d - 1)}) AS BIGINT)"
      }

    def strExpr(d: Int): String =
      if (d <= 0) strLeaf()
      else rnd.nextInt(4) match {
        case 0 => s"upper(${strExpr(d - 1)})"
        case 1 => s"substr(${strExpr(d - 1)}, ${rnd.nextInt(3) + 1}, ${rnd.nextInt(8) + 1})"
        case 2 => s"concat(${strExpr(d - 1)}, ${strExpr(d - 1)})"
        case _ => s"lower(${strExpr(d - 1)})"
      }

    def boolExpr(d: Int): String =
      if (d <= 0) rnd.nextInt(4) match {
        case 0 => s"(${intLeaf()} ${cmp()} ${intLeaf()})"
        case 1 => "(l.lrk IS NULL)"
        case 2 => "(r.rk IS NULL)"
        case _ => "(r.rrk IS NULL)"
      }
      else rnd.nextInt(4) match {
        case 0 => s"(${intExpr(d - 1)} ${cmp()} ${intExpr(d - 1)})"
        case 1 => s"(${boolExpr(d - 1)} AND ${boolExpr(d - 1)})"
        case 2 => s"(${boolExpr(d - 1)} OR ${boolExpr(d - 1)})"
        case _ => s"(NOT ${boolExpr(d - 1)})"
      }

    val onExtra = rnd.nextInt(3) match {
      case 0 => ""
      case _ => s" AND (COALESCE(l.lk, -9) % ${rnd.nextInt(3) + 2} <> 0)"
    }
    val where = rnd.nextInt(5) match {
      case 0 => ""
      case 1 => s"\nWHERE ${boolExpr(1)}"
      case 2 =>
        // bounded (op, lit) pairs keep the subquery list non-empty
        val (op, lit) = Seq(("<=", 4), (">=", 0), ("<>", rnd.nextInt(5)))(rnd.nextInt(3))
        s"\nWHERE (COALESCE(l.lk, 0) % 5) IN (SELECT r_regionkey FROM region WHERE r_regionkey $op $lit)"
      case 3 =>
        s"\nWHERE (COALESCE(l.lk, 0) % 7) NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey <> ${rnd.nextInt(5)})"
      case _ =>
        "\nWHERE EXISTS (SELECT 1 FROM region x WHERE x.r_regionkey = l.lrk)"
    }

    val cols = (1 to nCols).map { i =>
      val e = i % 3 match {
        case 1 => s"CAST(${intExpr(2)} AS BIGINT)"
        case 2 => strExpr(2)
        case _ => boolExpr(2)
      }
      s"  $e AS e$i"
    }
    s"""WITH l AS (SELECT n_nationkey AS lk, n_name AS lname,
       |            NULLIF(n_regionkey, $nullL) AS lrk FROM nation),
       |     r AS (SELECT r_regionkey AS rk, r_name AS rname,
       |            NULLIF(r_regionkey, $nullR) AS rrk FROM region)
       |SELECT l.lk AS k1, r.rk AS k2,
       |${cols.mkString(",\n")}
       |FROM l $joinType r ON l.lrk = r.rrk$onExtra$where
       |ORDER BY k1 ASC NULLS LAST, k2 ASC NULLS LAST""".stripMargin
  }

  /** A set-operation bank: two branches over nation combined by a drawn
    * UNION / UNION ALL / INTERSECT [ALL] / EXCEPT [ALL]. Both branches
    * share ONE generated expression list (so a key present in both
    * branches produces byte-identical rows) and differ only in
    * overlapping key-range filters (`k < hi` vs `k >= lo` with lo < hi),
    * which keeps INTERSECT/EXCEPT non-vacuous by construction. Columns
    * are NULL-injected by key residue — set operations match NULLs as
    * "not distinct" (unlike `=`), which is exactly the semantics this
    * bank differences; the unique key `k` keeps the sorted output a
    * total order (UNION ALL's cross-branch duplicates are full-row
    * identical, so ties don't perturb the hash).
    */
  def generateSetOps(seed: Long, nCols: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val rnd = new scala.util.Random(seed ^ 0x9E3779B97F4A7CL)
    rnd.nextLong(); rnd.nextLong() // decorrelate the op draw (see generateJoins)
    val op = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT",
      "INTERSECT ALL", "EXCEPT ALL")(rnd.nextInt(6))
    val hi = 10 + rnd.nextInt(13) // 10..22
    val lo = 3 + rnd.nextInt(7)   // 3..9 ⇒ overlap lo..hi-1 is never empty
    val cols = (1 to nCols).map { i =>
      val e = i % 3 match {
        case 1 => s"(CASE WHEN n_nationkey % ${rnd.nextInt(5) + 3} = ${rnd.nextInt(3)} " +
          s"THEN NULL ELSE CAST(${g.intExpr(2)} AS BIGINT) END)"
        case 2 => s"(CASE WHEN n_nationkey % ${rnd.nextInt(5) + 3} = ${rnd.nextInt(3)} " +
          s"THEN NULL ELSE ${g.strExpr(2)} END)"
        case _ => g.boolExpr(1)
      }
      s"  $e AS e$i"
    }.mkString(",\n")
    s"""SELECT n_nationkey AS k,
       |$cols
       |FROM nation WHERE n_nationkey < $hi
       |$op
       |SELECT n_nationkey AS k,
       |$cols
       |FROM nation WHERE n_nationkey >= $lo
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A grouping-sets bank: a drawn ROLLUP / CUBE / GROUPING SETS shape
    * over two derived keys, with [[generateAggs]]-style aggregates — the
    * subtotal-row semantics the flat agg banks can't reach (NULL as
    * roll-up marker, per-set aggregate recomputation, `grouping()`
    * provenance). Subset rules on top of [[generateAggs]]'s:
    *  - grouping keys repeat VERBATIM in SELECT, GROUP BY, and ORDER BY
    *    (Spark matches grouping expressions textually; aliases in
    *    GROUP BY are not dialect-common);
    *  - both `grouping()` flags are selected and lead the ORDER BY:
    *    data keys are non-null here, so (f_a, f_b, g_a, g_b) totally
    *    orders the output across grouping sets (a subtotal's NULL key
    *    can never collide with a data row's);
    *  - `grouping()` is CAST to INT (Spark returns TINYINT, DuckDB
    *    BIGINT).
    */
  def generateGroupingSets(seed: Long, nAggs: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val rnd = new scala.util.Random(seed ^ 0x2545F4914F6CDDL)
    rnd.nextLong(); rnd.nextLong() // decorrelate the shape draw (see generateJoins)
    val keyA = "n_regionkey"
    val keyB = s"(n_nationkey % ${2 + rnd.nextInt(5)})"
    val spec = rnd.nextInt(4) match {
      case 0 => s"ROLLUP($keyA, $keyB)"
      case 1 => s"CUBE($keyA, $keyB)"
      case 2 => s"GROUPING SETS (($keyA, $keyB), ($keyA), ($keyB), ())"
      case _ => s"GROUPING SETS (($keyA), ($keyB))"
    }
    val cols = (1 to nAggs).map { i =>
      val e = i % 5 match {
        case 1 => s"CAST(SUM(CASE WHEN ${g.boolExpr(1)} THEN ${g.intExpr(2)} END) AS BIGINT)"
        case 2 => s"CAST(COUNT(CASE WHEN ${g.boolExpr(1)} THEN 1 END) AS BIGINT)"
        case 3 => s"CAST(MIN(${g.intExpr(2)}) AS BIGINT)"
        case 4 => s"CAST(MAX(${g.intExpr(2)}) AS BIGINT)"
        case _ => s"ROUND(AVG(CAST(${g.intExpr(2)} AS DOUBLE)), 6)"
      }
      s"  $e AS e$i"
    }.mkString(",\n")
    s"""SELECT CAST(GROUPING($keyA) AS INT) AS f_a, CAST(GROUPING($keyB) AS INT) AS f_b,
       |  $keyA AS g_a, $keyB AS g_b,
       |$cols
       |FROM nation
       |GROUP BY $spec
       |ORDER BY f_a ASC, f_b ASC, g_a ASC NULLS LAST, g_b ASC NULLS LAST""".stripMargin
  }

  /** A scalar-subquery bank: every output column is a correlated or
    * uncorrelated scalar subquery over `region` — this differentials the
    * DECORRELATION rewrite (Spark plans each as a left outer aggregate
    * join; DuckDB runs its own flattening), not scalar kernels. Shapes:
    *  - correlated aggregate on key equality, including correlation
    *    through an expression (`r_regionkey = (n_nationkey % m)`);
    *  - `m ∈ {5,7}` overshoots region's key range, so some rows
    *    correlate to an EMPTY group — MAX/MIN/SUM must yield NULL there
    *    while COUNT yields 0 (the classic decorrelation bug class:
    *    a naive inner-join rewrite silently drops those rows);
    *  - an uncorrelated scalar (constant-folding/reuse path);
    *  - correlation plus an extra uncorrelated conjunct.
    * Correlated predicates stay EQUALITY-shaped (the dialect- and
    * planner-common subset); aggregates are CAST to BIGINT as in
    * [[generateAggs]].
    */
  def generateScalarSubqueries(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds
    def cmp(): String = Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))
    def corr(): String =
      Seq("n_regionkey", "(n_nationkey % 5)", "(n_nationkey % 7)")(rnd.nextInt(3))
    val cols = (1 to nCols).map { i =>
      val e = i % 4 match {
        case 1 => s"(SELECT CAST(MAX(r_regionkey * ${rnd.nextInt(9) + 2}) AS BIGINT) " +
          s"FROM region WHERE r_regionkey = ${corr()})"
        case 2 => s"(SELECT CAST(COUNT(*) AS BIGINT) FROM region " +
          s"WHERE r_regionkey ${cmp()} ${rnd.nextInt(5)})"
        case 3 => s"(SELECT CAST(SUM(r_regionkey + ${rnd.nextInt(20)}) AS BIGINT) " +
          s"FROM region WHERE r_regionkey = ${corr()} AND r_regionkey ${cmp()} ${rnd.nextInt(5)})"
        case _ => s"(SELECT CAST(MIN(length(r_name)) AS BIGINT) " +
          s"FROM region WHERE r_regionkey = ${corr()})"
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A timestamp bank: randomized TIMESTAMP expressions — the sub-day
    * sibling of [[generateDates]] (hour/minute/second arithmetic,
    * INTERVAL shifts, sub-day and day+ truncation). Subset rules beyond
    * the date bank's:
    *  - timestamps are BUILT (`make_timestamp` over bounded components,
    *    day ≤ 28, identical signature and values in both engines under
    *    the UTC session) or literal, never parsed;
    *  - EVERY date_trunc is CAST to TIMESTAMP: DuckDB returns DATE for
    *    day/month/year truncation of a timestamp but TIMESTAMP for
    *    hour/minute (probed) — the cast pins one type for all units;
    *  - INTERVAL shifts use literal counts of MINUTE/HOUR/DAY (identical
    *    grammar both engines); no month/year intervals (end-of-month
    *    clamping conventions differ);
    *  - extractors (hour/minute/second/day/month/year) CAST to BIGINT.
    */
  def generateTimestamps(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    def tsLeaf(): String = rnd.nextInt(3) match {
      case 0 => f"TIMESTAMP '${1992 + rnd.nextInt(9)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d'"
      case 1 => s"make_timestamp(${1992 + rnd.nextInt(9)}, CAST(1 + (n_nationkey % 12) AS INT), ${1 + rnd.nextInt(28)}, CAST(n_nationkey % 24 AS INT), ${rnd.nextInt(60)}, ${rnd.nextInt(60)})"
      case _ => s"make_timestamp(CAST(1992 + (n_regionkey % 7) AS INT), ${1 + rnd.nextInt(12)}, CAST(1 + (n_nationkey % 28) AS INT), ${rnd.nextInt(24)}, CAST((n_nationkey * 7) % 60 AS INT), ${rnd.nextInt(60)})"
    }

    def tsExpr(d: Int): String =
      if (d <= 0) tsLeaf()
      else rnd.nextInt(6) match {
        case 0 =>
          val unit = Seq("year", "month", "day", "hour", "minute")(rnd.nextInt(5))
          s"CAST(date_trunc('$unit', ${tsExpr(d - 1)}) AS TIMESTAMP)"
        case 1 =>
          val u = Seq("MINUTE", "HOUR", "DAY")(rnd.nextInt(3))
          s"(${tsExpr(d - 1)} + INTERVAL ${rnd.nextInt(48) + 1} $u)"
        case 2 =>
          val u = Seq("MINUTE", "HOUR")(rnd.nextInt(2))
          s"(${tsExpr(d - 1)} - INTERVAL ${rnd.nextInt(90) + 1} $u)"
        case 3 => s"greatest(${tsExpr(d - 1)}, ${tsExpr(d - 1)})"
        case 4 => s"least(${tsExpr(d - 1)}, ${tsExpr(d - 1)})"
        case _ => s"(CASE WHEN ${tsBool(d - 1)} THEN ${tsExpr(d - 1)} ELSE ${tsExpr(d - 1)} END)"
      }

    def tsBool(d: Int): String = {
      val op = Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))
      s"(${tsExpr(d)} $op ${tsExpr(d)})"
    }

    def tsInt(d: Int): String = {
      val ex = Seq("hour", "minute", "second", "day", "month", "year")(rnd.nextInt(6))
      s"CAST($ex(${tsExpr(d)}) AS BIGINT)"
    }

    val cols = (1 to nCols).map { i =>
      val e = i % 3 match {
        case 1 => tsInt(2)
        case 2 => tsExpr(2)
        case _ => tsBool(1)
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A `timestamp with time zone` bank over the packed value type
    * ([[TimestampTz]]) — the fuzz net for the r10 type addition. Unlike
    * the string grammars, the SPARK side is returned as named COLUMNS
    * built from the TimestampTz helpers themselves (the surface under
    * test: pack/unpack bit arithmetic, at_timezone rezoning, wall-clock
    * presentation/extraction), while the DuckDB side independently
    * recomputes each value from the raw instant with ICU timezone
    * arithmetic (`epoch_ms(i) * 4096 + key`; `timezone(zone,
    * timezone('UTC', i))`) — the encoding never round-trips through
    * itself on the oracle side.
    *
    * Shape rules:
    *  - instants derive from the events fixture (2024-01-01..06) shifted
    *    by hours/months — wall-clock shapes (varchar presentation, field
    *    extraction) stay inside 2022-2025 where both engines' tzdata
    *    agree for all 16 dictionary zones (the green compat_tstz_type
    *    precedent);
    *  - PRE-1970 instants (−55..−79 years → 1945..1969) flow only
    *    through INSTANT-domain shapes — pack/unpack roundtrips, rezone
    *    invariance, cross-zone ordering — which exercise the
    *    arithmetic-shift edge (`millis << 12 >> 12` on negative epochs)
    *    without betting on wartime-era zone rules that differ across
    *    tzdata versions;
    *  - zones draw from the full 16-entry dictionary, per-column literal
    *    or per-row (`user_id` rotation), DST observers included;
    *  - every output is BIGINT, STRING, or BOOLEAN — no raw timestamp
    *    column rides the compare (ms-precision strings instead).
    */
  def generateTstz(seed: Long, nCols: Int): (String, Seq[(String, org.apache.spark.sql.Column)]) = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import graft.functions.{TimestampTz => Tz}
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    val duckZoneArr = "[" + Tz.zoneKeys.map { case (_, z) => s"'$z'" }.mkString(", ") + "]"

    // (spark instant, duck instant) — ms-precision UTC
    def instant(allowPre1970: Boolean, forcePre: Boolean = false): (Column, String) =
      (if (forcePre) 3 else rnd.nextInt(if (allowPre1970) 4 else 3)) match {
        case 0 => (col("__ts"), "ts")
        case 1 =>
          val h = rnd.nextInt(601) - 300
          // duck spells signed offsets as n * INTERVAL (its INTERVAL
          // literal grammar rejects a bare negative count)
          (col("__ts") + expr(s"INTERVAL '$h' HOUR"), s"(ts + ($h) * INTERVAL 1 HOUR)")
        case 2 =>
          val m = rnd.nextInt(12); val h = rnd.nextInt(49) - 24
          (col("__ts") + expr(s"INTERVAL '$m' MONTH") + expr(s"INTERVAL '$h' HOUR"),
            s"(ts + ($m) * INTERVAL 1 MONTH + ($h) * INTERVAL 1 HOUR)")
        case _ =>
          val y = rnd.nextInt(25) + 55 // 1945..1969: pre-epoch instants
          (col("__ts") - expr(s"INTERVAL '$y' YEAR"), s"(ts - ($y) * INTERVAL 1 YEAR)")
      }

    // (spark zone string col, duck zone expr, duck dictionary-key expr)
    def zone(): (Column, String, String) =
      if (rnd.nextBoolean()) {
        val (k, z) = Tz.zoneKeys(rnd.nextInt(Tz.zoneKeys.length))
        (lit(z), s"'$z'", s"CAST($k AS BIGINT)")
      } else {
        val off = rnd.nextInt(16)
        (Tz.zoneName(pmod(col("user_id") + lit(off), lit(16))),
          s"$duckZoneArr[CAST((user_id + $off) % 16 AS INT) + 1]",
          s"CAST((user_id + $off) % 16 AS BIGINT)")
      }

    // first 7 columns cycle through every shape (guaranteed coverage per
    // bank), the rest draw randomly
    def column(i: Int): (String, Column, String) =
      (if (i <= 7) i - 1 else rnd.nextInt(7)) match {
      case 0 => // packed value: spark shifts/ORs, duck multiplies/adds
        val (si, di) = instant(true); val (sz, _, dk) = zone()
        (s"e$i", Tz.pack(si, sz), s"(epoch_ms($di) * 4096 + $dk)")
      case 1 => // instant through pack -> rezone -> unpack (shift edge);
        // the forced column (i = 2) pins a pre-1970 instant so every
        // bank exercises the negative-epoch arithmetic-shift path
        val (si, di) = instant(true, forcePre = i == 2)
        val (sz, _, _) = zone(); val (sz2, _, _) = zone()
        (s"e$i", Tz.instantMillis(Tz.atTimezone(Tz.pack(si, sz), sz2)),
          s"epoch_ms($di)")
      case 2 => // zone id after a rezone: the NEW zone, instant discarded
        val (si, _) = instant(true)
        val (sz, _, _) = zone(); val (sz2, dz2, _) = zone()
        (s"e$i", Tz.zoneId(Tz.atTimezone(Tz.pack(si, sz), sz2)), dz2)
      case 3 => // canonical varchar presentation (wall-safe instants)
        val (si, di) = instant(false); val (sz, dz, _) = zone()
        (s"e$i", Tz.toVarchar(Tz.pack(si, sz)),
          s"(strftime(timezone($dz, timezone('UTC', $di)), '%Y-%m-%d %H:%M:%S.%g') || ' ' || $dz)")
      case 4 => // field extraction in the value's own zone
        val f = Seq("hour", "minute", "day", "month", "year")(rnd.nextInt(5))
        val (si, di) = instant(false); val (sz, dz, _) = zone()
        (s"e$i", Tz.extract(f, Tz.pack(si, sz)),
          s"CAST($f(timezone($dz, timezone('UTC', $di))) AS BIGINT)")
      case 5 => // instant ordering across MIXED zones (zone must not leak)
        val (s1, d1) = instant(true); val (s2, d2) = instant(true)
        val (z1, _, _) = zone(); val (z2, _, _) = zone()
        val (op, dop) = Seq(("<", "<"), (">=", ">="), ("=", "="))(rnd.nextInt(3))
        val l = Tz.instantMillis(Tz.pack(s1, z1))
        val r = Tz.instantMillis(Tz.pack(s2, z2))
        val c = op match {
          case "<" => l < r
          case ">=" => l >= r
          case _ => l === r
        }
        (s"e$i", c, s"(epoch_ms($d1) $dop epoch_ms($d2))")
      case _ => // rezone there-and-back is the identity on the PACKED value
        val (si, _) = instant(true)
        val (sz, _, _) = zone(); val (sz2, _, _) = zone()
        (s"e$i",
          Tz.atTimezone(Tz.atTimezone(Tz.pack(si, sz), sz2), sz) === Tz.pack(si, sz),
          "TRUE")
    }

    val cols = (1 to nCols).map(column)
    val duck =
      s"""WITH e AS (
         |  SELECT event_id, user_id,
         |    make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000) AS ts
         |  FROM events WHERE event_id < 2000)
         |SELECT event_id,
         |${cols.map { case (n, _, d) => s"  $d AS $n" }.mkString(",\n")}
         |FROM e
         |ORDER BY event_id ASC NULLS LAST""".stripMargin
    (duck, cols.map { case (n, c, _) => (n, c) })
  }

  /** A semi/anti-join bank: WHERE-clause subquery predicates in
    * COMBINATION — the NULL-aware anti-join minefield the join grammar
    * only samples singly. One drawn shape per bank:
    *  - 0: IN ∧ correlated EXISTS (semi ∧ semi);
    *  - 1: IN ∧ correlated NOT EXISTS on a NULLABLE correlation key
    *    (semi ∧ anti; NULL keys make the inner empty → NOT EXISTS TRUE,
    *    the padding-killer polarity flip);
    *  - 2: NOT IN over a STATICALLY-nullable list (`NULLIF(r_regionkey,
    *    9)` — 9 never occurs, so the list is non-null at runtime and the
    *    output non-vacuous, but the planner must still choose a
    *    null-aware anti join) ∧ EXISTS;
    *  - 3: nested: EXISTS whose inner is itself filtered by an IN
    *    subquery (subquery-in-subquery planning).
    * The probe side is nation with a NULLIF-injected region key, so
    * correlated predicates see NULL keys; projected columns COALESCE
    * their leaves (the join-bank rule) while `lrk IS NULL` stays raw.
    */
  def generateSemiAnti(seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate the shape draw
    val shape = rnd.nextInt(4)
    val nullK = rnd.nextInt(5)
    def cmp(): String = Seq("<", "<=", "<>", ">=", ">")(rnd.nextInt(5))
    val c1 = rnd.nextInt(9) + 2
    val d1 = rnd.nextInt(40)

    val where = shape match {
      case 0 =>
        s"""WHERE (l.lk % 5) IN (SELECT r_regionkey FROM region WHERE r_regionkey ${cmp()} ${rnd.nextInt(4)})
           |  AND EXISTS (SELECT 1 FROM region x WHERE x.r_regionkey = l.lrk AND x.r_regionkey ${cmp()} ${rnd.nextInt(5)})"""
      case 1 =>
        s"""WHERE (l.lk % 4) IN (SELECT r_regionkey FROM region WHERE r_regionkey ${cmp()} ${rnd.nextInt(4)})
           |  AND NOT EXISTS (SELECT 1 FROM region x WHERE x.r_regionkey = l.lrk AND x.r_regionkey ${cmp()} ${rnd.nextInt(4)})"""
      case 2 =>
        s"""WHERE (l.lk % 5) NOT IN (SELECT NULLIF(r_regionkey, 9) FROM region WHERE r_regionkey ${cmp()} ${rnd.nextInt(4)})
           |  AND EXISTS (SELECT 1 FROM region x WHERE x.r_regionkey = l.lrk)"""
      case _ =>
        s"""WHERE EXISTS (
           |  SELECT 1 FROM region x
           |  WHERE x.r_regionkey = l.lrk
           |    AND x.r_regionkey IN (SELECT r_regionkey FROM region WHERE r_regionkey ${cmp()} ${rnd.nextInt(5)}))"""
    }
    s"""WITH l AS (SELECT n_nationkey AS lk, n_name AS lname,
       |            NULLIF(n_regionkey, $nullK) AS lrk FROM nation)
       |SELECT l.lk AS k,
       |  CAST(COALESCE(l.lrk, -1) * $c1 + $d1 AS BIGINT) AS e1,
       |  (l.lrk IS NULL) AS e2,
       |  upper(substr(l.lname, 1, ${rnd.nextInt(8) + 3})) AS e3
       |FROM l
       |$where
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** An aggregate-over-outer-join bank: GROUP BY above a null-EXTENDING
    * join, with HAVING above the aggregate — the composition neither the
    * join banks (no aggregation) nor the agg banks (no join) reach. The
    * three stacked minefields:
    *  - null-extended rows under aggregation: COUNT(*) counts them,
    *    COUNT(rname) skips them, SUM(CASE…) over null-extended leaves
    *    must propagate NULL identically before the skip;
    *  - NULL group keys: unmatched preserved-side rows put a NULL in the
    *    GROUP BY column, which is its own group ("not distinct"
    *    grouping semantics, unlike `=`);
    *  - HAVING evaluates aggregates of BOTH polarities (`COUNT(*) <>
    *    COUNT(rname)` keeps exactly the groups with null-extension).
    * The derived right side SHIFTS region keys by 0–2 and filters them,
    * so LEFT/FULL joins null-extend nation rows (keys below the shift)
    * while RIGHT/FULL null-extend shifted region rows with no nation
    * match — both polarities reachable by one knob. Spec-locked: the
    * four banks cover LEFT/RIGHT/FULL, at least one has a NULL group in
    * its output, and each bank's HAVING verifiably drops groups (the
    * spec re-runs the bank with the HAVING line stripped and compares).
    */
  def generateJoinAggs(seed: Long, nAggs: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate the join-type draw
    val jt = Seq("LEFT", "RIGHT", "FULL")(rnd.nextInt(3))
    val shift = rnd.nextInt(3)
    val cmp = Seq("<", "<=", ">=", ">")(rnd.nextInt(4))
    val bound = rnd.nextInt(5)

    // null-extension-aware leaves: raw (nullable) on purpose — the
    // aggregate skip/propagate rules are the subject under test
    def intLeaf(): String = rnd.nextInt(5) match {
      case 0 => "CAST(n_nationkey AS BIGINT)"
      case 1 => "rk"
      case 2 => s"CAST(${rnd.nextInt(41) - 20} AS BIGINT)"
      case 3 => "CAST(length(rname) AS BIGINT)"
      case _ => "CAST(length(n_name) AS BIGINT)"
    }
    def intExpr(d: Int): String =
      if (d <= 0) intLeaf()
      else rnd.nextInt(4) match {
        case 0 => s"(${intExpr(d - 1)} + ${intExpr(d - 1)})"
        case 1 => s"(${intLeaf()} * ${rnd.nextInt(9) + 1})"
        case 2 => s"abs(${intExpr(d - 1)})"
        case _ => s"(CASE WHEN ${boolLeaf()} THEN ${intExpr(d - 1)} ELSE ${intExpr(d - 1)} END)"
      }
    def boolLeaf(): String = rnd.nextInt(4) match {
      case 0 => "(rk IS NULL)"
      case 1 => "(n_nationkey IS NULL)"
      case 2 => s"(COALESCE(rk, -1) ${Seq("<", ">=", "<>")(rnd.nextInt(3))} ${rnd.nextInt(6)})"
      case _ => s"(COALESCE(n_nationkey, 99) % ${rnd.nextInt(3) + 2} = 0)"
    }

    val aggs = (1 to nAggs).map { i =>
      val e = i % 6 match {
        case 1 => "CAST(COUNT(*) AS BIGINT)"
        case 2 => "CAST(COUNT(rname) AS BIGINT)"
        case 3 => s"CAST(SUM(COALESCE(rk, -${rnd.nextInt(9) + 1}) * ${rnd.nextInt(9) + 1}) AS BIGINT)"
        case 4 => s"CAST(SUM(CASE WHEN ${boolLeaf()} THEN ${intExpr(1)} END) AS BIGINT)"
        case 5 => s"CAST(MIN(${intExpr(1)}) AS BIGINT)"
        case _ => s"CAST(MAX(${intExpr(1)}) AS BIGINT)"
      }
      s"  $e AS e$i"
    }
    val having = rnd.nextInt(4) match {
      case 0 => s"HAVING COUNT(*) ${Seq("<", "<=", ">=", ">")(rnd.nextInt(4))} ${rnd.nextInt(5) + 2}"
      case 1 => "HAVING COUNT(*) <> COUNT(rname)"
      case 2 => s"HAVING COUNT(rname) ${Seq("<", ">=")(rnd.nextInt(2))} ${rnd.nextInt(4) + 1}"
      case _ => "HAVING MIN(n_nationkey) IS NOT NULL"
    }
    s"""WITH r AS (SELECT r_regionkey + $shift AS rk, r_name AS rname
       |           FROM region WHERE r_regionkey $cmp $bound)
       |SELECT rk AS gk,
       |${aggs.mkString(",\n")}
       |FROM nation $jt JOIN r ON n_regionkey = rk
       |GROUP BY rk
       |$having
       |ORDER BY gk ASC NULLS LAST""".stripMargin
  }

  /** A DISTINCT-aggregate bank: grouped aggregates where SEVERAL distinct
    * aggregations over different expressions coexist with plain ones —
    * the shape Spark plans through Expand (one row replica per distinct
    * group, the MarkDistinct analog) while DuckDB runs per-aggregate hash
    * tables; a differential over the whole distinct-planning path, not a
    * kernel. Subset rules on top of [[generateAggs]]'s:
    *  - SUM(DISTINCT …) is CAST to BIGINT (DuckDB promotes to HUGEINT);
    *  - distinct inputs are [[ExprGen]] guarded-BIGINT or string
    *    expressions (the % NULLIF guard injects NULLs, which both
    *    engines' DISTINCT aggregation ignores identically);
    *  - no AVG(DISTINCT) (dtype pinning under distinct differs).
    */
  def generateDistinctAggs(seed: Long, nAggs: Int): String = {
    val g = new ExprGen(new scala.util.Random(seed))
    val cols = (1 to nAggs).map { i =>
      val e = i % 5 match {
        case 1 => s"CAST(COUNT(DISTINCT ${g.intExpr(2)}) AS BIGINT)"
        case 2 => s"CAST(SUM(DISTINCT ${g.intExpr(2)}) AS BIGINT)"
        case 3 => s"CAST(COUNT(DISTINCT ${g.strExpr(2)}) AS BIGINT)"
        case 4 => s"CAST(MIN(${g.intExpr(2)}) AS BIGINT)"
        case _ => s"CAST(COUNT(CASE WHEN ${g.boolExpr(1)} THEN 1 END) AS BIGINT)"
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_regionkey AS g,
       |${cols.mkString(",\n")}
       |FROM nation
       |GROUP BY n_regionkey
       |ORDER BY g ASC NULLS LAST""".stripMargin
  }

  /** An array / higher-order-function bank — the first DUAL-DIALECT
    * grammar: arrays and lambdas spell differently in the two engines
    * (`transform`/`filter`/`aggregate`/`array(…)`/`size` vs
    * `list_transform`/`list_filter`/`list_reduce`/`[…]`/`len`), so the
    * generator builds every expression as a (spark, duck) PAIR in
    * lockstep from one draw sequence and returns both texts; the
    * registry wires them through `Q.sql(spark, duck)` instead of
    * `sqlSame`. Dialect-subset rules:
    *  - array elements are NULL-FREE bounded BIGINTs (no % guard):
    *    DuckDB's `list_distinct` drops NULLs where Spark's
    *    `array_distinct` keeps them — null-free elements shut that off;
    *  - `array_distinct` is always wrapped in a sort (`array_sort` /
    *    `list_sort`): DuckDB does not document dedup ORDER, Spark keeps
    *    first occurrence — sorting pins one order in both engines;
    *  - element access is OOB-safe on both sides (`try_element_at` vs
    *    `l[i]`, both NULL out of bounds — indexes are 1-based in both);
    *  - folds seed a BIGINT zero: Spark `aggregate(A, 0, +)` ≡ DuckDB
    *    `list_reduce(list_prepend(0, A), +)` including the empty-array
    *    case (both yield the seed);
    *  - array-typed OUTPUT columns are serialized to strings
    *    (`array_join` of the string-cast elements vs `array_to_string`):
    *    the driver's comparator sorts rows by every column and
    *    array-typed cells are unhashable there;
    *  - lambda bodies use only +, −, ×literal, abs, least/greatest and
    *    literal-divisor % (both engines truncate toward zero) — the
    *    dialect-common scalar core.
    */
  def generateArrays(seed: Long, nCols: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds (see generateJoins)

    // (spark, duck) expression pairs built in lockstep
    type P = (String, String)
    def same(s: String): P = (s, s)

    // null-free bounded int scalar (NO modulo-null guard — array elements
    // must stay null-free, see the subset rules)
    def intLeaf(): P = rnd.nextInt(4) match {
      case 0 => same("CAST(n_nationkey AS BIGINT)")
      case 1 => same("CAST(n_regionkey AS BIGINT)")
      case 2 => same(s"CAST(${rnd.nextInt(41) - 20} AS BIGINT)")
      case _ => same("CAST(length(n_name) AS BIGINT)")
    }
    def intScalar(d: Int): P =
      if (d <= 0) intLeaf()
      else rnd.nextInt(5) match {
        case 0 => val (a1, a2) = intScalar(d - 1); val (b1, b2) = intScalar(d - 1)
          (s"($a1 + $b1)", s"($a2 + $b2)")
        case 1 => val (a1, a2) = intScalar(d - 1); val (b1, b2) = intScalar(d - 1)
          (s"($a1 - $b1)", s"($a2 - $b2)")
        case 2 => val (a1, a2) = intLeaf(); val (b1, b2) = intLeaf()
          (s"($a1 * $b1)", s"($a2 * $b2)")
        case 3 => val (a1, a2) = intScalar(d - 1); (s"abs($a1)", s"abs($a2)")
        case _ => val (a1, a2) = intScalar(d - 1); val (b1, b2) = intScalar(d - 1)
          val fn = if (rnd.nextBoolean()) "least" else "greatest"
          (s"$fn($a1, $b1)", s"$fn($a2, $b2)")
      }

    // lambda bodies over the bound variable x (identical spelling in both
    // dialects — only the HOF names differ)
    def lambdaInt(): String = rnd.nextInt(5) match {
      case 0 => s"(x + ${rnd.nextInt(9) + 1})"
      case 1 => s"(x * ${rnd.nextInt(3) + 2})"
      case 2 => "abs(x - 7)"
      case 3 => s"least(x, ${rnd.nextInt(15)})"
      case _ => s"greatest(x, ${rnd.nextInt(15) - 7})"
    }
    def lambdaBool(): String = rnd.nextInt(4) match {
      case 0 => s"(x % ${rnd.nextInt(3) + 2} = 0)"   // literal divisor: no null guard needed
      case 1 => s"(x > ${rnd.nextInt(11) - 5})"
      case 2 => s"(x <> ${rnd.nextInt(7)})"
      case _ => s"(x <= ${rnd.nextInt(21) - 10})"
    }

    def arrExpr(d: Int): P =
      if (d <= 0) rnd.nextInt(2) match {
        case 0 =>
          val k = rnd.nextInt(3) + 2
          val elems = Seq.fill(k)(intScalar(1))
          (s"array(${elems.map(_._1).mkString(", ")})",
            s"[${elems.map(_._2).mkString(", ")}]")
        case _ =>
          val hi = s"CAST(n_nationkey % ${rnd.nextInt(3) + 3} + 2 AS BIGINT)"
          (s"sequence(CAST(1 AS BIGINT), $hi)", s"generate_series(CAST(1 AS BIGINT), $hi)")
      }
      else rnd.nextInt(6) match {
        case 0 => val (a1, a2) = arrExpr(d - 1); val f = lambdaInt()
          (s"transform($a1, x -> $f)", s"list_transform($a2, x -> $f)")
        case 1 => val (a1, a2) = arrExpr(d - 1); val f = lambdaBool()
          (s"filter($a1, x -> $f)", s"list_filter($a2, x -> $f)")
        case 2 => val (a1, a2) = arrExpr(d - 1)
          (s"reverse($a1)", s"list_reverse($a2)")
        case 3 => val (a1, a2) = arrExpr(d - 1)
          (s"array_sort(array_distinct($a1))", s"list_sort(list_distinct($a2))")
        case 4 => val (a1, a2) = arrExpr(d - 1); val (b1, b2) = arrExpr(d - 1)
          (s"concat($a1, $b1)", s"list_concat($a2, $b2)")
        case _ => val (a1, a2) = arrExpr(d - 1)
          (s"array_sort($a1)", s"list_sort($a2)")
      }

    val cols = (1 to nCols).map { i =>
      val (sp, dk) = i % 5 match {
        case 1 => val (a1, a2) = arrExpr(2)
          (s"CAST(size($a1) AS BIGINT)", s"CAST(len($a2) AS BIGINT)")
        case 2 => val (a1, a2) = arrExpr(2)
          (s"aggregate($a1, CAST(0 AS BIGINT), (acc, x) -> acc + x)",
            s"list_reduce(list_prepend(CAST(0 AS BIGINT), $a2), (acc, x) -> acc + x)")
        case 3 => val (a1, a2) = arrExpr(2); val ix = rnd.nextInt(3) + 1
          (s"try_element_at($a1, $ix)", s"$a2[$ix]")
        case 4 => val (a1, a2) = arrExpr(2); val (e1, e2) = intLeaf()
          (s"array_contains($a1, $e1)", s"list_contains($a2, $e2)")
        case _ => val (a1, a2) = arrExpr(2)
          // empty-array serialization diverges: Spark's array_join yields
          // '' where DuckDB's array_to_string (string_agg semantics)
          // yields NULL — COALESCE pins the common ''. (Arrays themselves
          // are never NULL here, so the COALESCE only fires on empty.)
          (s"array_join(transform($a1, x -> CAST(x AS STRING)), ',')",
            s"COALESCE(array_to_string($a2, ','), '')")
      }
      (s"  $sp AS e$i", s"  $dk AS e$i")
    }
    val spark =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._1).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    val duck =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._2).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    (spark, duck)
  }

  /** A DUAL-DIALECT struct bank: randomized STRUCT construction, nested
    * field access, and whole-struct equality — the row-type surface
    * (Presto ROW / row-field dereference, `RowType.java`) the other
    * grammars never touch. Construction spells differently per engine
    * (`named_struct('a', x)` vs `{'a': x}` literals), so like the array
    * grammar this emits (Spark, DuckDB) texts in lockstep. Subset rules:
    *  - OUTPUT columns are always scalars — a field access or an
    *    equality — never a bare struct (the driver's comparator sorts
    *    rows by every column; a struct cell is unsortable on the pandas
    *    side, the same rule that serializes array outputs);
    *  - field values are null-free bounded ints / strings (struct
    *    equality over NULL fields is three-valued and the engines'
    *    NULL-vs-NULL field comparison conventions differ);
    *  - access chains are parenthesized `(struct).f` in both dialects;
    *  - equality compares structs with IDENTICAL field names and types
    *    (anything else is an analysis error in Spark and a type mismatch
    *    in DuckDB — not a differential worth fuzzing).
    */
  def generateStructs(seed: Long, nCols: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds (see generateJoins)

    type P = (String, String)
    def same(s: String): P = (s, s)

    def intLeaf(): P = rnd.nextInt(4) match {
      case 0 => same("CAST(n_nationkey AS BIGINT)")
      case 1 => same("CAST(n_regionkey AS BIGINT)")
      case 2 => same(s"CAST(${rnd.nextInt(41) - 20} AS BIGINT)")
      case _ => same("CAST(length(n_name) AS BIGINT)")
    }
    def intScalar(d: Int): P =
      if (d <= 0) intLeaf()
      else rnd.nextInt(4) match {
        case 0 => val (a1, a2) = intScalar(d - 1); val (b1, b2) = intScalar(d - 1)
          (s"($a1 + $b1)", s"($a2 + $b2)")
        case 1 => val (a1, a2) = intLeaf(); val (b1, b2) = intLeaf()
          (s"($a1 * $b1)", s"($a2 * $b2)")
        case 2 => val (a1, a2) = intScalar(d - 1); (s"abs($a1)", s"abs($a2)")
        case _ => val (a1, a2) = intScalar(d - 1); val (b1, b2) = intScalar(d - 1)
          val fn = if (rnd.nextBoolean()) "least" else "greatest"
          (s"$fn($a1, $b1)", s"$fn($a2, $b2)")
      }
    def strLeaf(): P = rnd.nextInt(3) match {
      case 0 => same("n_name")
      case 1 => same(s"'S_${rnd.nextInt(50)}'")
      case _ => same("CAST(n_nationkey AS STRING)")
    }

    // a 3-field struct (int a, string b, nested n.x) and its two spellings
    def struct3(): P = {
      val (as, ad) = intScalar(1); val (bs, bd) = strLeaf(); val (xs, xd) = intScalar(1)
      (s"named_struct('a', $as, 'b', $bs, 'n', named_struct('x', $xs))",
        s"{'a': $ad, 'b': $bd, 'n': {'x': $xd}}")
    }

    val cols = (1 to nCols).map { i =>
      val (sp, dk) = i % 4 match {
        case 1 => // int field access
          val (s3, d3) = struct3()
          (s"CAST(($s3).a AS BIGINT)", s"CAST(($d3).a AS BIGINT)")
        case 2 => // string field access through a string function
          val (s3, d3) = struct3()
          val n = rnd.nextInt(6) + 2
          (s"upper(substr(($s3).b, 1, $n))", s"upper(substr(($d3).b, 1, $n))")
        case 3 => // NESTED field access
          val (s3, d3) = struct3()
          (s"CAST(($s3).n.x AS BIGINT)", s"CAST(($d3).n.x AS BIGINT)")
        case _ => // whole-struct equality, identical shape both operands
          val (l1s, l1d) = intScalar(1); val (l2s, l2d) = intScalar(1)
          val (r1s, r1d) = intScalar(1); val (r2s, r2d) = intScalar(1)
          (s"(named_struct('p', $l1s, 'q', $l2s) = named_struct('p', $r1s, 'q', $r2s))",
            s"({'p': $l1d, 'q': $l2d} = {'p': $r1d, 'q': $r2d})")
      }
      (s"  $sp AS e$i", s"  $dk AS e$i")
    }
    val spark =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._1).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    val duck =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._2).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    (spark, duck)
  }

  /** A DUAL-DIALECT map bank: randomized MAP construction, hit-AND-miss
    * key extraction, concat, cardinality, and key/value serialization —
    * the map-type surface (`MapType`, Presto `map(K,V)` functions). The
    * spellings differ structurally: Spark `map('k', v)` + `element_at`
    * (scalar-or-NULL) vs DuckDB `MAP {'k': v}` + `m[k]` (LIST, so the
    * scalar is `(m[k])[1]`, `[]` indexing to NULL on a miss). Subset
    * rules:
    *  - literal keys only, DISTINCT within a map and DISJOINT across
    *    map_concat operands (duplicate-key policy is an ERROR in Spark's
    *    default `mapKeyDedupPolicy` and last-wins in DuckDB — not a
    *    differential, just a config trap);
    *  - lookup keys mix guaranteed hits (a literal present key) and
    *    data-driven hit-or-miss (`CAST(n_nationkey % 4 AS STRING)` vs
    *    numeric-string keys) — the miss→NULL path is half the point;
    *  - map_keys/map_values arrays are serialized with the array-bank
    *    rule (construction order is preserved by BOTH engines for
    *    literal maps, probed, so the joined string is deterministic);
    *  - values are null-free bounded ints (see the array-bank rule).
    */
  def generateMaps(seed: Long, nCols: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds (see generateJoins)

    type P = (String, String)
    def same(s: String): P = (s, s)

    def intLeaf(): P = rnd.nextInt(4) match {
      case 0 => same("CAST(n_nationkey AS BIGINT)")
      case 1 => same("CAST(n_regionkey AS BIGINT)")
      case 2 => same(s"CAST(${rnd.nextInt(41) - 20} AS BIGINT)")
      case _ => same("CAST(length(n_name) AS BIGINT)")
    }
    def intScalar(d: Int): P =
      if (d <= 0) intLeaf()
      else rnd.nextInt(3) match {
        case 0 => val (a1, a2) = intScalar(d - 1); val (b1, b2) = intScalar(d - 1)
          (s"($a1 + $b1)", s"($a2 + $b2)")
        case 1 => val (a1, a2) = intScalar(d - 1); (s"abs($a1)", s"abs($a2)")
        case _ => val (a1, a2) = intLeaf(); val (b1, b2) = intLeaf()
          (s"($a1 * $b1)", s"($a2 * $b2)")
      }

    // numeric-string key pools: pool A for the left/only map, pool B for
    // the right map_concat operand — disjoint by construction
    def mapFromPool(pool: Seq[String]): (String, String, Seq[String]) = {
      val n = rnd.nextInt(2) + 2
      val keys = rnd.shuffle(pool).take(n)
      val vals = Seq.fill(n)(intScalar(1))
      (s"map(${keys.zip(vals).map { case (k, v) => s"'$k', ${v._1}" }.mkString(", ")})",
        s"MAP {${keys.zip(vals).map { case (k, v) => s"'$k': ${v._2}" }.mkString(", ")}}",
        keys)
    }
    val poolA = Seq("0", "1", "2", "3")
    val poolB = Seq("7", "8", "9")

    // a map expression: a pool-A literal, or a concat of disjoint maps
    def mapExpr(): (String, String, Seq[String]) =
      if (rnd.nextBoolean()) mapFromPool(poolA)
      else {
        val (l1, l2, lk) = mapFromPool(poolA); val (r1, r2, rk) = mapFromPool(poolB)
        (s"map_concat($l1, $r1)", s"map_concat($l2, $r2)", lk ++ rk)
      }

    def lookupKey(present: Seq[String]): P =
      rnd.nextInt(3) match {
        case 0 => same(s"'${present(rnd.nextInt(present.length))}'") // guaranteed hit
        case 1 => same("'z'")                                        // guaranteed miss
        case _ => same(s"CAST(n_nationkey % ${rnd.nextInt(5) + 2} AS STRING)") // data-driven
      }

    val cols = (1 to nCols).map { i =>
      val (sp, dk) = i % 4 match {
        case 1 => // scalar extraction, hit or miss → BIGINT or NULL
          // try_element_at: ANSI-mode element_at ERRORS on a missing map
          // key; the try_ form is the NULL-on-miss the DuckDB side has
          val (m1, m2, keys) = mapExpr(); val (k1, k2) = lookupKey(keys)
          (s"try_element_at($m1, $k1)", s"($m2[$k2])[1]")
        case 2 => // cardinality
          val (m1, m2, _) = mapExpr()
          (s"CAST(cardinality($m1) AS BIGINT)", s"CAST(cardinality($m2) AS BIGINT)")
        case 3 => // key-set membership → BOOLEAN
          val (m1, m2, keys) = mapExpr(); val (k1, k2) = lookupKey(keys)
          (s"array_contains(map_keys($m1), $k1)", s"list_contains(map_keys($m2), $k2)")
        case _ => // serialized keys or values → STRING
          val (m1, m2, _) = mapExpr()
          val fn = if (rnd.nextBoolean()) "map_keys" else "map_values"
          (s"array_join(transform($fn($m1), x -> CAST(x AS STRING)), ',')",
            s"array_to_string($fn($m2), ',')")
      }
      (s"  $sp AS e$i", s"  $dk AS e$i")
    }
    val spark =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._1).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    val duck =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._2).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    (spark, duck)
  }

  /** An ORDER BY / LIMIT / OFFSET bank: randomized multi-key sorts with
    * MIXED directions and EXPLICIT NULLS FIRST/LAST on NULL-injected
    * keys, then OFFSET+LIMIT. The driver's comparator re-sorts rows
    * canonically, so plain ORDER BY output is not a differential — what
    * IS differenced is the SELECTED ROW SET: which rows survive
    * OFFSET/LIMIT under the declared total order. Engine defaults
    * disagree here (Spark sorts NULLS FIRST for ASC, DuckDB NULLS LAST)
    * — every key therefore spells its null placement explicitly, and the
    * unique `k` closes the order so the surviving set is deterministic.
    * Sort keys are integers (no collation surface) with NULLIF-injected
    * NULLs and small moduli forcing duplicate key prefixes — ties must
    * fall through to later keys to matter.
    */
  def generateOrderings(seed: Long, nKeys: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds
    val keys = (1 to nKeys).map { j =>
      val e = rnd.nextInt(3) match {
        case 0 => s"NULLIF(n_regionkey, ${rnd.nextInt(5)})"
        case 1 => s"CAST(n_nationkey * ${rnd.nextInt(7) + 2} % ${rnd.nextInt(4) + 3} AS BIGINT)"
        case _ => s"NULLIF(CAST(n_nationkey % ${rnd.nextInt(5) + 2} AS BIGINT), ${rnd.nextInt(3)})"
      }
      (s"$e AS sk$j",
        s"sk$j ${if (rnd.nextBoolean()) "ASC" else "DESC"} NULLS ${if (rnd.nextBoolean()) "FIRST" else "LAST"}")
    }
    val limit = rnd.nextInt(11) + 5
    val offset = rnd.nextInt(9)
    s"""WITH s AS (SELECT n_nationkey AS k,
       |${keys.map("  " + _._1).mkString(",\n")}
       |FROM nation)
       |SELECT k, ${(1 to nKeys).map("sk" + _).mkString(", ")}
       |FROM s
       |ORDER BY ${keys.map(_._2).mkString(", ")}, k ASC NULLS LAST
       |LIMIT $limit OFFSET $offset""".stripMargin
  }

  /** A CTE-reuse bank: ONE aggregated WITH-clause body referenced twice
    * in a self-join with misaligned keys — the shape that catches an
    * engine evaluating a CTE twice inconsistently, or a reuse/inlining
    * rewrite (Spark decides per-plan whether to inline or materialize a
    * CTE) changing semantics. The two references join on
    * shifted-and-wrapped group keys, so neither reference is redundant
    * and every group row is consumed by both sides under different keys;
    * aggregates of aggregates (the outer projection combines a.c with
    * b.s) would expose any drift between the two evaluations.
    */
  def generateCteReuse(seed: Long, nAggs: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds
    val g = new ExprGen(new scala.util.Random(seed * 31 + 7))
    val aggs = (1 to nAggs).map { i =>
      val e = i % 4 match {
        case 1 => s"CAST(SUM(${g.intExpr(1)}) AS BIGINT)"
        case 2 => "CAST(COUNT(*) AS BIGINT)"
        case 3 => s"CAST(MIN(${g.intExpr(1)}) AS BIGINT)"
        case _ => s"CAST(MAX(${g.intExpr(1)}) AS BIGINT)"
      }
      s"  $e AS a$i"
    }
    val shift = rnd.nextInt(4) + 1
    val outer = (1 to nAggs).flatMap { i =>
      Seq(s"  l.a$i AS l$i", s"  r.a$i AS r$i",
        s"  CAST(l.a$i + r.a$i AS BIGINT) AS t$i")
    }
    s"""WITH base AS (
       |SELECT n_regionkey AS gk,
       |${aggs.mkString(",\n")}
       |FROM nation
       |GROUP BY n_regionkey)
       |SELECT l.gk AS k,
       |${outer.mkString(",\n")}
       |FROM base l JOIN base r ON r.gk = (l.gk + $shift) % 5
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A DUAL-DIALECT unnest bank: data-driven arrays (some EMPTY by
    * construction) unnested WITH position — the generator-operator
    * differential. The spellings diverge structurally: Spark
    * `LATERAL VIEW posexplode` (0-based pos, projected as `pos + 1`) vs
    * DuckDB `generate_subscripts(arr, 1)` + `unnest(arr)` zipped in the
    * SELECT list (1-based; DuckDB's WITH ORDINALITY is unimplemented,
    * probed). What's differenced:
    *  - CARDINALITY: each output row set is the concatenation of
    *    per-row expansions, and rows with empty arrays VANISH from both
    *    the flat and the aggregate-back shapes (the spec asserts a
    *    proper subset of nation keys survives);
    *  - ORDINALITY: position arithmetic enters the projected values, so
    *    an off-by-one or order drift between the engines breaks the
    *    hash;
    *  - slices: Spark `slice(arr, 1, L)` (length) and DuckDB
    *    `list_slice(arr, 1, L)` (end index) agree ONLY at start = 1 —
    *    the start is pinned there by the grammar.
    */
  def generateUnnest(seed: Long): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds
    val shape = rnd.nextInt(2)

    // the array: a 1..n sequence truncated by a data-driven length that
    // hits ZERO for some nation keys, under optional transform/filter
    val n = rnd.nextInt(3) + 3
    val m = rnd.nextInt(3) + 3
    val baseS = s"slice(sequence(1, $n), 1, CAST(n_nationkey % $m AS INT))"
    val baseD = s"list_slice(generate_series(1, $n), 1, n_nationkey % $m)"
    val c1 = rnd.nextInt(7) + 2
    val (arrS, arrD) = rnd.nextInt(3) match {
      case 0 => (baseS, baseD)
      case 1 => (s"transform($baseS, x -> x * $c1 + n_regionkey)",
        s"list_transform($baseD, x -> x * $c1 + n_regionkey)")
      case _ =>
        val r = rnd.nextInt(2) + 2
        (s"filter(transform($baseS, x -> x * $c1), x -> x % $r = 0)",
          s"list_filter(list_transform($baseD, x -> x * $c1), x -> x % $r = 0)")
    }

    if (shape == 0) {
      val spark =
        s"""WITH t AS (SELECT n_nationkey AS k, $arrS AS arr FROM nation)
           |SELECT k, CAST(pos + 1 AS BIGINT) AS p, CAST(x AS BIGINT) AS x
           |FROM t LATERAL VIEW posexplode(t.arr) u AS pos, x
           |ORDER BY k ASC NULLS LAST, p ASC NULLS LAST""".stripMargin
      val duck =
        s"""WITH t AS (SELECT n_nationkey AS k, $arrD AS arr FROM nation)
           |SELECT k, CAST(generate_subscripts(arr, 1) AS BIGINT) AS p,
           |  CAST(unnest(arr) AS BIGINT) AS x
           |FROM t
           |ORDER BY k ASC NULLS LAST, p ASC NULLS LAST""".stripMargin
      (spark, duck)
    } else {
      val spark =
        s"""WITH t AS (SELECT n_nationkey AS k, $arrS AS arr FROM nation)
           |SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(x * (pos + 1)) AS BIGINT) AS s
           |FROM t LATERAL VIEW posexplode(t.arr) u AS pos, x
           |GROUP BY k
           |ORDER BY k ASC NULLS LAST""".stripMargin
      val duck =
        s"""WITH t AS (SELECT n_nationkey AS k, $arrD AS arr FROM nation),
           |un AS (SELECT k, generate_subscripts(arr, 1) AS p, unnest(arr) AS x FROM t)
           |SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(x * p) AS BIGINT) AS s
           |FROM un
           |GROUP BY k
           |ORDER BY k ASC NULLS LAST""".stripMargin
      (spark, duck)
    }
  }

  /** A three-valued-logic predicate bank: BETWEEN over NULL-injected
    * bounds, IN-lists CONTAINING NULL (`x IN (a, NULL)` is TRUE or
    * NULL, never FALSE; `x NOT IN (a, NULL)` is FALSE or NULL, never
    * TRUE — the rewrite direction engines get wrong), IS [NOT] DISTINCT
    * FROM (the null-safe comparison that IS two-valued), and
    * NULLIF/COALESCE chains feeding all of the above. The scalar
    * grammar's guarded `%` produces incidental NULLs; this bank makes
    * NULL the SUBJECT: every predicate is projected both raw (BOOLEAN
    * column with NULLs intact) and decided (`COALESCE(p, false)`), so
    * the oracle hash distinguishes UNKNOWN from FALSE on every row.
    * Identical spelling in both engines — the semantics are the
    * differential.
    */
  def generatePredicates(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    // int leaves, half of them NULL-injected
    def leaf(): String = rnd.nextInt(6) match {
      case 0 => "CAST(n_nationkey AS BIGINT)"
      case 1 => "CAST(n_regionkey AS BIGINT)"
      case 2 => s"NULLIF(CAST(n_regionkey AS BIGINT), ${rnd.nextInt(5)})"
      case 3 => s"NULLIF(CAST(n_nationkey % ${rnd.nextInt(5) + 2} AS BIGINT), ${rnd.nextInt(3)})"
      case 4 => s"CAST(${rnd.nextInt(21) - 10} AS BIGINT)"
      case _ => s"COALESCE(NULLIF(CAST(n_nationkey % 3 AS BIGINT), ${rnd.nextInt(3)}), CAST(${rnd.nextInt(7)} AS BIGINT))"
    }

    def pred(): String = rnd.nextInt(6) match {
      case 0 => // BETWEEN with possibly-NULL operand or bounds
        val lo = rnd.nextInt(8); val hi = lo + rnd.nextInt(10)
        rnd.nextInt(3) match {
          case 0 => s"(${leaf()} BETWEEN $lo AND $hi)"
          case 1 => s"(${leaf()} BETWEEN ${leaf()} AND $hi)"
          case _ => s"(${leaf()} NOT BETWEEN $lo AND ${leaf()})"
        }
      case 1 => // IN-list containing NULL
        val vals = Seq.fill(rnd.nextInt(3) + 1)(rnd.nextInt(10).toString) :+ "NULL"
        s"(${leaf()} IN (${rnd.shuffle(vals).mkString(", ")}))"
      case 2 => // NOT IN list containing NULL: never TRUE, only FALSE/NULL
        val vals = Seq.fill(rnd.nextInt(2) + 1)(rnd.nextInt(10).toString) :+ "NULL"
        s"(${leaf()} NOT IN (${rnd.shuffle(vals).mkString(", ")}))"
      case 3 => // plain IN-list, no NULL (the two-valued control)
        val vals = Seq.fill(rnd.nextInt(4) + 2)(rnd.nextInt(12).toString)
        s"(${leaf()} IN (${vals.mkString(", ")}))"
      case 4 =>
        val neg = if (rnd.nextBoolean()) " NOT" else ""
        s"(${leaf()} IS$neg DISTINCT FROM ${leaf()})"
      case _ =>
        val op = Seq("AND", "OR")(rnd.nextInt(2))
        s"(${pred0()} $op ${pred0()})"
    }
    // non-recursive alternatives for the connective case
    def pred0(): String = rnd.nextInt(3) match {
      case 0 => s"(${leaf()} ${Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))} ${leaf()})"
      case 1 => s"(${leaf()} IN (${rnd.nextInt(5)}, NULL))"
      case _ => s"(${leaf()} IS NULL)"
    }

    val cols = (1 to nCols).map { i =>
      val p = pred()
      val e = i % 3 match {
        case 1 => p                          // raw: TRUE / FALSE / NULL
        case 2 => s"COALESCE($p, false)"     // decided: UNKNOWN -> FALSE
        case _ => s"(CASE WHEN $p THEN ${rnd.nextInt(50)} WHEN NOT $p THEN ${rnd.nextInt(50) + 50} ELSE -1 END)" // three-way dispatch
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A DECIMAL-arithmetic bank: exact money math over lineitem's price
    * columns under randomized (precision, scale) casts — the TPC-H
    * revenue arithmetic the engines must agree on. Every leaf is pinned
    * to a drawn DECIMAL(p,s); +, -, and leaf-only × keep intermediate
    * precision inside both engines' 38-digit budget. The DIFFERENTIAL is
    * the decimal arithmetic (carry, scale alignment, precision
    * promotion); the OUTPUT is canonicalized to DOUBLE, because
    * DECIMAL(38,10) is the one output type the driver's type-sensitive
    * value hash presents asymmetrically (pyarrow decimal128 →
    * decimal.Decimal vs DuckDB → float64 — the round-9 red). The DOUBLE
    * is bit-identical on both engines BY CONSTRUCTION: the grammar
    * bounds every expression so its exact value has unscaled magnitude
    * < 2^53 and scale ≤ 8, and then decimal→double on both engines is
    * the same IEEE computation — (double)unscaled (exact, < 2^53)
    * divided by 10^scale (exact for scale ≤ 22), one correctly-rounded
    * division (OpenJDK BigDecimal.doubleValue fast path; DuckDB
    * CastDecimalToFloatingPoint). Magnitude bound: l_extendedprice
    * (≤ ~1.1e5, the one "big" leaf) never multiplies another big leaf;
    * products are big×small or small×small (small ≤ 1e3, scale ≤ 3, so
    * every product and hence every aligned sum has scale ≤ 6); a
    * depth-2 sum of four big×small products is ≤ 4·1.1e8 at scale ≤ 6 →
    * unscaled ≤ 4.4e14 < 2^53 with ~20× margin. No division here: Spark keeps decimal
    * (allowPrecisionLoss max(6,…) scale) while DuckDB's `/` on decimals
    * returns DOUBLE outright — the exactness-engineered division bank is
    * generateDecimalDivMod below.
    */
  def generateDecimals(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    // "small" leaves: |value| ≤ ~1e3, scale ≤ 3 (so any product scale ≤ 6,
    // keeping every sum's unscaled value ≤ ~4e8·10^6 < 2^53)
    def smallLeaf(): String = rnd.nextInt(4) match {
      case 0 => s"CAST(l_discount AS DECIMAL(${rnd.nextInt(4) + 8},${rnd.nextInt(2) + 2}))"
      case 1 => s"CAST(l_tax AS DECIMAL(10,${rnd.nextInt(2) + 2}))"
      case 2 => s"CAST(l_quantity AS DECIMAL(${rnd.nextInt(6) + 10},${rnd.nextInt(2) + 1}))"
      case _ => s"CAST('${rnd.nextInt(900) + 100}.${rnd.nextInt(90) + 10}' AS DECIMAL(12,2))"
    }
    // the one "big" leaf: |value| ≤ ~1.1e5, scale 2
    def bigLeaf(): String = s"CAST(l_extendedprice AS DECIMAL(${rnd.nextInt(5) + 12},2))"
    def leaf(): String = if (rnd.nextInt(5) == 0) bigLeaf() else smallLeaf()
    def expr(d: Int): String =
      if (d <= 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => s"(${expr(d - 1)} + ${expr(d - 1)})"
        case 1 => s"(${expr(d - 1)} - ${expr(d - 1)})"
        case 2 => s"(${leaf()} * ${smallLeaf()})" // never big×big: keeps unscaled < 2^53
        case _ => s"(${bigLeaf()} * (CAST(1 AS DECIMAL(3,0)) - ${smallLeaf()}))" // the q1 revenue shape
      }

    val cols = (1 to nCols).map(i => s"  CAST(${expr(2)} AS DOUBLE) AS e$i")
    s"""SELECT l_orderkey AS k1, l_linenumber AS k2,
       |${cols.mkString(",\n")}
       |FROM lineitem WHERE l_orderkey <= 64
       |ORDER BY k1 ASC NULLS LAST, k2 ASC NULLS LAST""".stripMargin
  }

  /** Decimal DIVISION and MODULUS banks — the scale-rule risk SURVEY
    * §7.4.3 names (reference: presto-main DecimalOperators.java
    * divideShortShortShort/divideLongLongLong rescale-then-divide, and
    * the %% operators' truncated-division sign rule). The engines'
    * division surfaces differ structurally — Spark produces a DECIMAL
    * with scale max(6, s1+p2+1) (precision-loss clamped) while DuckDB's
    * `/` on decimals returns DOUBLE outright — so the bank is
    * exactness-engineered to make both paths land on the same double:
    *
    *  - every divisor is a 5-smooth literal ≥ 1 from {2, 4, 5, 8, 10,
    *    16, 1.25, 2.5, 6.25} (2^i·5^j / 10^k), so the true quotient of
    *    a scale-2 numerator terminates at scale ≤ 6 (… /16 adds 4
    *    digits, the max);
    *  - Spark's result scale max(6, 2+4+1)=7 ≥ 6 keeps the quotient
    *    EXACT;
    *  - DuckDB's double division is only ~1-ulp accurate (the scale-2
    *    NUMERATOR is not double-exact — 1287.1/10 probed 1 ulp off
    *    Spark), so each quotient is RE-SNAPPED to the scale-6 decimal
    *    grid with CAST(q AS DECIMAL(20,6)) before the double cast: on
    *    Spark that drops an exact trailing zero (scale 7→6, true scale
    *    ≤ 6); on DuckDB it rounds the ~1e-11-accurate double to the
    *    grid point it came from (half-grid distance 5e-7 ≫ the error).
    *    Both then convert the same exact DECIMAL(20,6) value via the
    *    same (double)unscaled / 10^6 computation (unscaled ≤ 8.4e10 <
    *    2^53) — bit-identical.
    *
    * Modulus stays DECIMAL on both engines, is always exact (result
    * scale max(s1,s2), no infinite expansion), and both follow the
    * truncated-division sign rule (result takes the dividend's sign —
    * probed: -7.19 % 2.5 = -2.19 on both). Divisors are non-zero
    * literals; dividends are sign-mixed via (leaf - literal).
    *
    * Deliberately EXCLUDED, as documented dialect divergences (same
    * status as the libm transcendentals): non-5-smooth division (DuckDB
    * keeps ~15 significant digits of double where Spark rounds at its
    * decimal result scale) and scale-REDUCING decimal casts (Spark
    * rounds HALF_UP, DuckDB truncates — probed: 2.679→(10,2) gives 2.68
    * vs 2.67). generateDecimalSaturate covers the cast family's
    * non-divergent axis (precision overflow) instead.
    */
  def generateDecimalDivMod(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    val divisors = Seq("2", "4", "5", "8", "10", "16", "1.25", "2.5", "6.25")
    // scale-2 numerators, sign-mixed; |value| ≤ ~1.1e5
    def numerator(): String = rnd.nextInt(4) match {
      case 0 => s"CAST(l_extendedprice AS DECIMAL(${rnd.nextInt(5) + 12},2))"
      case 1 => s"CAST(l_quantity AS DECIMAL(10,2))"
      case 2 => s"CAST('${rnd.nextInt(900) + 100}.${rnd.nextInt(90) + 10}' AS DECIMAL(12,2))"
      case _ => s"(CAST(l_extendedprice AS DECIMAL(14,2)) - CAST(${rnd.nextInt(90000) + 5000} AS DECIMAL(12,0)))"
    }
    def col(): String = rnd.nextInt(3) match {
      case 0 => // exact 5-smooth division, re-snapped to the scale-6 grid
        s"CAST((${numerator()} / CAST(${divisors(rnd.nextInt(divisors.length))} AS DECIMAL(4,2))) AS DECIMAL(20,6))"
      case 1 => // modulus by a non-zero literal (arbitrary digits: mod is always exact)
        s"(${numerator()} % CAST(${rnd.nextInt(80) + 3}.${rnd.nextInt(9)} AS DECIMAL(6,2)))"
      case _ => // quotient re-entering exact +/- decimal arithmetic is NOT portable
                // (DuckDB's quotient is already double), so mix mod with + instead
        s"((${numerator()} % CAST(${rnd.nextInt(40) + 7} AS DECIMAL(4,0))) + ${numerator()})"
    }

    val cols = (1 to nCols).map(i => s"  CAST(${col()} AS DOUBLE) AS e$i")
    s"""SELECT l_orderkey AS k1, l_linenumber AS k2,
       |${cols.mkString(",\n")}
       |FROM lineitem WHERE l_orderkey <= 64
       |ORDER BY k1 ASC NULLS LAST, k2 ASC NULLS LAST""".stripMargin
  }

  /** Decimal saturated/overflow-cast bank (reference:
    * DecimalSaturatedFloorCasts.java; this engine's divergence is
    * documented — Presto saturates to the type bound, Spark/DuckDB
    * TRY_CAST return NULL — so the DIFFERENTIAL here is Spark vs DuckDB
    * agreeing on WHERE the overflow boundary sits and what survives it).
    * Each column TRY_CASTs a scale-2 money expression to a drawn
    * DECIMAL(p,s) with s ≥ 2 (scale never REDUCES — scale-reducing
    * casts round HALF_UP in Spark but truncate in DuckDB, a documented
    * exclusion) and p-s ∈ {3..6} integer digits, so rows overflow →
    * NULL or pass through EXACTLY, row-dependently (l_extendedprice
    * spans ~900 .. ~110000: a (5,2) target nulls most rows, a (9,3)
    * target none). Output canonicalized to DOUBLE under the same
    * < 2^53 exactness bound as the sibling banks.
    */
  def generateDecimalSaturate(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    def src(): String = rnd.nextInt(3) match {
      case 0 => s"CAST(l_extendedprice AS DECIMAL(${rnd.nextInt(5) + 12},2))"
      case 1 => s"(CAST(l_extendedprice AS DECIMAL(14,2)) - CAST(${rnd.nextInt(60000) + 20000} AS DECIMAL(12,0)))"
      case _ => s"(CAST(l_extendedprice AS DECIMAL(14,2)) + CAST(l_quantity AS DECIMAL(10,2)))"
    }
    def col(): String = {
      val s = rnd.nextInt(3) + 2              // target scale 2..4, never below src scale 2
      val p = s + rnd.nextInt(4) + 3          // 3..6 integer digits -> row-dependent overflow
      s"TRY_CAST(${src()} AS DECIMAL($p,$s))"
    }

    val cols = (1 to nCols).map(i => s"  CAST(${col()} AS DOUBLE) AS e$i")
    s"""SELECT l_orderkey AS k1, l_linenumber AS k2,
       |${cols.mkString(",\n")}
       |FROM lineitem WHERE l_orderkey <= 64
       |ORDER BY k1 ASC NULLS LAST, k2 ASC NULLS LAST""".stripMargin
  }

  /** A string-function bank beyond the scalar grammar's basics:
    * position(x IN y), left/right, repeat, translate, split_part
    * (out-of-range index returns '' in BOTH engines — part of the
    * differential), and prefix/suffix tests, composed over nested string
    * expressions. Nearly the whole surface spells identically; the two
    * exceptions are emitted dual-dialect (Spark `startswith`/`endswith`
    * vs DuckDB `starts_with`/`ends_with`), so the generator returns
    * (spark, duck) texts like the array/struct/map grammars. Subset
    * rules: counts are positive literals (negative `left` lengths mean
    * "drop from the end" in DuckDB but empty in Spark), `contains` is
    * avoided (the registry rebinds it to Presto's array contains), and
    * string leaves are non-null ASCII.
    */
  def generateStrings(seed: Long, nCols: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    type P = (String, String)
    def same(s: String): P = (s, s)

    def strLeaf(): P = rnd.nextInt(3) match {
      case 0 => same("n_name")
      case 1 => same(s"'STR_${rnd.nextInt(90) + 10}'")
      case _ => same("CAST(n_nationkey AS STRING)")
    }
    def strExpr(d: Int): P =
      if (d <= 0) strLeaf()
      else rnd.nextInt(7) match {
        case 0 => val (a1, a2) = strExpr(d - 1)
          val n = rnd.nextInt(6) + 1
          (s"left($a1, $n)", s"left($a2, $n)")
        case 1 => val (a1, a2) = strExpr(d - 1)
          val n = rnd.nextInt(6) + 1
          (s"right($a1, $n)", s"right($a2, $n)")
        case 2 => val (a1, a2) = strExpr(d - 1); val n = rnd.nextInt(3) + 1
          (s"repeat($a1, $n)", s"repeat($a2, $n)")
        case 3 => val (a1, a2) = strExpr(d - 1)
          val from = s"${"ANT".substring(0, rnd.nextInt(2) + 1)}0"
          val to = "xy0".substring(0, rnd.nextInt(2) + 2)
          (s"translate($a1, '$from', '$to')", s"translate($a2, '$from', '$to')")
        case 4 => val (a1, a2) = strExpr(d - 1)
          val delim = "_AN0".charAt(rnd.nextInt(4))
          val idx = rnd.nextInt(4) + 1 // deliberately often out of range
          (s"split_part($a1, '$delim', $idx)", s"split_part($a2, '$delim', $idx)")
        case 5 => val (a1, a2) = strExpr(d - 1); val (b1, b2) = strLeaf()
          (s"concat($a1, $b1)", s"concat($a2, $b2)")
        case _ => val (a1, a2) = strExpr(d - 1)
          (s"lower($a1)", s"lower($a2)")
      }

    val cols = (1 to nCols).map { i =>
      val (sp, dk) = i % 3 match {
        case 1 => // position → BIGINT (1-based, 0 on miss, both engines)
          val (h1, h2) = strExpr(2)
          val needle = s"'${"NAT_01".charAt(rnd.nextInt(6))}'"
          (s"CAST(position($needle IN $h1) AS BIGINT)",
            s"CAST(position($needle IN $h2) AS BIGINT)")
        case 2 => // prefix/suffix test — the dual-spelled pair
          val (a1, a2) = strExpr(1); val p = s"'${"NS".charAt(rnd.nextInt(2))}'"
          if (rnd.nextBoolean()) (s"startswith($a1, $p)", s"starts_with($a2, $p)")
          else (s"endswith($a1, $p)", s"ends_with($a2, $p)")
        case _ => // plain nested string expression
          strExpr(2)
      }
      (s"  $sp AS e$i", s"  $dk AS e$i")
    }
    val spark =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._1).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    val duck =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._2).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    (spark, duck)
  }

  /** A JSON-path bank: documents ASSEMBLED row-by-row (concat over
    * data-driven scalars — JSON-safe because n_name is [A-Z_0-9]) and
    * walked with randomized paths: drawn key names, array indexes that
    * run past the end (NULL in both engines), nested object hops, a
    * guaranteed-missing key, and array length. This differentials the
    * repo's native Presto-JSONPath walker (functions/PrestoJson.scala —
    * `json_extract_scalar`/`json_size`) against DuckDB's JSON extension
    * (`json_extract_string`/`json_array_length`); both use 0-based array
    * indexes and NULL off-path, which is exactly the contract under
    * test. Emitted dual-dialect: only the function NAMES differ, the
    * document SQL and the path strings are shared text.
    */
  def generateJson(seed: Long, nCols: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    def numSql(): String = rnd.nextInt(3) match {
      case 0 => "CAST(n_nationkey AS STRING)"
      case 1 => "CAST(n_regionkey AS STRING)"
      case _ => s"'${rnd.nextInt(90) + 10}'"
    }
    def strSql(): String = if (rnd.nextBoolean()) "n_name" else s"'J_${rnd.nextInt(50)}'"

    val cols = (1 to nCols).map { i =>
      // one drawn document per column: {"<k1>": n, "arr": [..], "s": "..",
      // "o": {"<k2>": n}}
      val k1 = s"k${rnd.nextInt(5)}"
      val k2 = s"n${rnd.nextInt(4)}"
      val arrLen = rnd.nextInt(3) + 2
      val arrElems = (1 to arrLen).map(_ => numSql())
        .mkString("', ", ", ',', ", ", '")
      val doc = s"""concat('{"$k1":', ${numSql()}, ',"arr":[$arrElems],"s":"', ${strSql()}, '","o":{"$k2":', ${numSql()}, '}}')"""
      val (sp, dk) = i % 6 match {
        case 1 => // top-level number
          (s"CAST(json_extract_scalar($doc, '$$.$k1') AS BIGINT)",
            s"CAST(json_extract_string($doc, '$$.$k1') AS BIGINT)")
        case 2 => // string field through a string function
          (s"upper(json_extract_scalar($doc, '$$.s'))",
            s"upper(json_extract_string($doc, '$$.s'))")
        case 3 => // array index, 0-based, often past the end -> NULL
          val ix = rnd.nextInt(arrLen + 2)
          (s"CAST(json_extract_scalar($doc, '$$.arr[$ix]') AS BIGINT)",
            s"CAST(json_extract_string($doc, '$$.arr[$ix]') AS BIGINT)")
        case 4 => // nested object hop
          (s"CAST(json_extract_scalar($doc, '$$.o.$k2') AS BIGINT)",
            s"CAST(json_extract_string($doc, '$$.o.$k2') AS BIGINT)")
        case 5 => // guaranteed-missing key -> NULL in both
          (s"(json_extract_scalar($doc, '$$.zz') IS NULL)",
            s"(json_extract_string($doc, '$$.zz') IS NULL)")
        case _ => // array length: Presto json_size vs json_array_length
          (s"CAST(json_size($doc, '$$.arr') AS BIGINT)",
            s"CAST(json_array_length($doc, '$$.arr') AS BIGINT)")
      }
      (s"  $sp AS e$i", s"  $dk AS e$i")
    }
    val spark =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._1).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    val duck =
      s"""SELECT n_nationkey AS k,
         |${cols.map(_._2).mkString(",\n")}
         |FROM nation
         |ORDER BY k ASC NULLS LAST""".stripMargin
    (spark, duck)
  }

  /** A TRY_CAST failure-semantics bank: per-row mixes of convertible and
    * garbage values through TRY_CAST (spelled identically in both
    * engines), so every column is a success/NULL interleave decided by
    * the DATA, not the text: digit strings with junk injected by key
    * residue, whitespace-padded ints (both trim), BIGINT overflow
    * (NULL both), narrow-type downcasts driven past TINYINT/SMALLINT
    * range, month-out-of-range dates (strict ISO both), TRUE/FALSE/'1'/
    * '0'/garbage booleans, and 'NaN'/'1e3'/junk doubles. Excluded as
    * documented dialect divergences: decimal STRINGS to integer types
    * (Spark truncates '12.5'→12, DuckDB rounds →13) and hex strings
    * ('0x1A' is 26 in DuckDB, NULL in Spark).
    */
  def generateTryCasts(seed: Long, nCols: Int): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate draws across nearby seeds

    // a string that is a valid integer on SOME rows, junk on others
    def mixedIntStr(): String = rnd.nextInt(3) match {
      case 0 => s"(CASE WHEN n_nationkey % ${rnd.nextInt(3) + 2} = 0 THEN '${"xq#"(rnd.nextInt(3))}' ELSE CAST(n_nationkey * ${rnd.nextInt(9) + 1} AS STRING) END)"
      case 1 => s"concat('  ', CAST(n_nationkey + ${rnd.nextInt(50)} AS STRING), '  ')"
      case _ => s"(CASE WHEN n_regionkey = ${rnd.nextInt(5)} THEN '' ELSE CAST(n_regionkey AS STRING) END)"
    }

    val cols = (1 to nCols).map { i =>
      val e = i % 6 match {
        case 1 => s"TRY_CAST(${mixedIntStr()} AS BIGINT)"
        case 2 => // overflow: huge digit strings on some rows
          s"TRY_CAST((CASE WHEN n_nationkey % ${rnd.nextInt(3) + 2} = 0 THEN '99999999999999999999' ELSE CAST(n_nationkey AS STRING) END) AS BIGINT)"
        case 3 => // narrow downcast driven past the type's range
          val t = if (rnd.nextBoolean()) ("TINYINT", rnd.nextInt(15) + 8)
            else ("SMALLINT", rnd.nextInt(2000) + 1400) // 24·1400 > 32767: top keys overflow
          s"TRY_CAST(CAST(n_nationkey * ${t._2} AS INT) AS ${t._1})"
        case 4 => // strict-ISO dates; months run past 12 by key residue
          s"TRY_CAST(concat('199${rnd.nextInt(8)}-', lpad(CAST(1 + n_nationkey % ${rnd.nextInt(6) + 10} AS STRING), 2, '0'), '-${rnd.nextInt(18) + 10}') AS DATE)"
        case 5 => // boolean spellings + garbage (CASE: array() is Spark-only)
          s"TRY_CAST((CASE CAST(n_nationkey % 5 AS INT) WHEN 0 THEN 'TRUE' WHEN 1 THEN 'FALSE' WHEN 2 THEN '1' WHEN 3 THEN '0' ELSE 'tru${rnd.nextInt(10)}' END) AS BOOLEAN)"
        case _ => // doubles: scientific, NaN, junk
          s"TRY_CAST((CASE CAST(n_nationkey % 4 AS INT) WHEN 0 THEN '${rnd.nextInt(9) + 1}e${rnd.nextInt(4)}' WHEN 1 THEN 'NaN' WHEN 2 THEN 'x${rnd.nextInt(10)}' ELSE '${rnd.nextInt(100)}.25' END) AS DOUBLE)"
      }
      s"  $e AS e$i"
    }
    s"""SELECT n_nationkey AS k,
       |${cols.mkString(",\n")}
       |FROM nation
       |ORDER BY k ASC NULLS LAST""".stripMargin
  }

  /** A LATERAL bank: a per-outer-row subquery in the FROM clause — the
    * multi-row correlated form the scalar-subquery grammar can't reach
    * (top-n-per-row is the shape Presto plans as a correlated
    * LateralJoin). Three drawn shapes:
    *  - comma-LATERAL top-n: inner ORDER BY + LIMIT under a correlated
    *    inequality — outer rows whose lateral comes back empty DISAPPEAR
    *    (cross semantics);
    *  - LEFT JOIN LATERAL … ON true: same inner, but empty laterals PAD
    *    with NULLs — the cross-vs-left distinction is the semantics
    *    differenced;
    *  - aggregate lateral: a single-row (COUNT/MAX) inner — the
    *    EnforceSingleRow-ish degenerate case.
    * The inner orders by the unique region key before LIMIT, so the
    * selected row set is deterministic; (k, lk) totally orders the
    * output (≤ limit distinct region keys per outer row, one NULL-padded
    * row per empty lateral).
    */
  def generateLaterals(seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    rnd.nextLong(); rnd.nextLong() // decorrelate the shape draw (see generateJoins)
    val shape = rnd.nextInt(3)
    val corrCmp = Seq("<", "<=", "=", ">=", ">")(rnd.nextInt(5))
    val extra = if (rnd.nextBoolean()) s" AND r_regionkey ${Seq("<=", "<>", ">=")(rnd.nextInt(3))} ${rnd.nextInt(5)}" else ""
    val c = rnd.nextInt(9) + 2
    val d = rnd.nextInt(50)
    val inner =
      if (shape == 2)
        s"""(
           |  SELECT CAST(COUNT(*) AS BIGINT) AS rv,
           |    CAST(COALESCE(MAX(r_regionkey), -1) AS BIGINT) AS rk
           |  FROM region
           |  WHERE r_regionkey $corrCmp n.n_regionkey$extra) t"""
      else
        s"""(
           |  SELECT r_regionkey AS rk, (r_regionkey * $c + $d) AS rv
           |  FROM region
           |  WHERE r_regionkey $corrCmp n.n_regionkey$extra
           |  ORDER BY r_regionkey ${if (rnd.nextBoolean()) "ASC" else "DESC"}
           |  LIMIT ${rnd.nextInt(3) + 1}) t"""
    val joinForm = shape match {
      case 1 => s"LEFT JOIN LATERAL $inner ON true"
      case _ => s", LATERAL $inner"
    }
    s"""SELECT n.n_nationkey AS k, CAST(t.rk AS BIGINT) AS lk,
       |  CAST(t.rv AS BIGINT) AS lv,
       |  CAST(n.n_regionkey AS BIGINT) + COALESCE(CAST(t.rk AS BIGINT), -1) AS mix
       |FROM nation n $joinForm
       |ORDER BY k ASC NULLS LAST, lk ASC NULLS LAST""".stripMargin
  }
}
