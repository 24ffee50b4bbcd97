package graft.functions

/** Datetime pattern-dialect translators (SURVEY.md §7.4.2 — the reference's
  * biggest silent-wrong-answer risk). The reference exposes three pattern
  * languages (presto-main/.../scalar/DateTimeFunctions.java:1394):
  * MySQL `%`-tokens for date_format/date_parse (DateTimeFunctions.java
  * `@ScalarFunction("date_format")`, formatter built by
  * DateTimeFunctions.createDateTimeFormatter), and Joda patterns for
  * format_datetime/parse_datetime. Spark speaks java.time
  * (DateTimeFormatter); these tables map the common tokens.
  *
  * Translation happens once at query-analysis time (the pattern argument is
  * required to be a literal), so the executed plan uses Spark's native,
  * codegen'd timestamp formatting — no per-row translation cost.
  */
object Patterns {

  /** MySQL `%x` tokens → java.time pattern (DateTimeFunctions.java
    * DATE_FORMATTER_PATTERNS). Unsupported tokens throw at analysis time
    * rather than silently misformatting.
    */
  def mysqlToJava(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    def lit(s: String): Unit =
      out.append(s.flatMap(c => if (c.isLetter) s"'$c'" else if (c == '\'') "''" else c.toString))
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => out.append("yyyy")
          case 'y' => out.append("yy")
          case 'm' => out.append("MM")
          case 'c' => out.append("M")
          case 'd' => out.append("dd")
          case 'e' => out.append("d")
          case 'H' => out.append("HH")
          case 'k' => out.append("H")
          case 'h' | 'I' => out.append("hh")
          case 'l' => out.append("h")
          case 'i' => out.append("mm")
          case 's' | 'S' => out.append("ss")
          case 'f' => out.append("SSSSSS")
          case 'p' => out.append("a")
          case 'M' => out.append("MMMM")
          case 'b' => out.append("MMM")
          case 'a' => out.append("EEE")
          case 'W' => out.append("EEEE")
          case 'j' => out.append("DDD")
          case 'T' => out.append("HH:mm:ss")
          case 'r' => out.append("hh:mm:ss a")
          case 'v' => out.append("ww")
          case '%' => out.append("'%'")
          case other => throw new IllegalArgumentException(
            s"graft date_format/date_parse: unsupported MySQL pattern token %$other in '$fmt'")
        }
        i += 2
      } else { lit(c.toString); i += 1 }
    }
    out.toString
  }

  /** Joda tokens → java.time. The alphabets mostly coincide (y M d H m s S
    * E a h K k); the meaningful deltas are year-of-era `Y` (java.time: `y`;
    * java `Y` is week-based-year — silent corruption if passed through) and
    * zone tokens `ZZ`/`Z`.
    */
  def jodaToJava(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '\'') { inQuote = !inQuote; out.append(c); i += 1 }
      else if (inQuote) { out.append(c); i += 1 }
      else if (c == 'Y') { // run of Y → same-length run of y
        var j = i; while (j < fmt.length && fmt.charAt(j) == 'Y') j += 1
        out.append("y" * (j - i)); i = j
      } else if (c == 'Z') {
        var j = i; while (j < fmt.length && fmt.charAt(j) == 'Z') j += 1
        out.append(if (j - i >= 2) "XXX" else "xx"); i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
