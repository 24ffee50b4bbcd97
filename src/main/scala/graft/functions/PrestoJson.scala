package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Presto's JSON path dialect, exactly — the edge semantics where Spark's
  * `get_json_object` diverges (reference JsonExtract.java + the behavior
  * vectors of TestJsonExtract.java):
  *
  *  - `json_extract_scalar` returns NULL for complex values (objects /
  *    arrays); get_json_object returns their JSON text.
  *  - a numeric path token matches BOTH array indices and object fields
  *    (`$.1` indexes `[0,1,2]` AND looks up field "1"); get_json_object
  *    treats `$.1` as a field only.
  *  - bracket tokens may be unquoted (`$[fuu]`) or double-quoted with
  *    escapes (`$["foo.bar"]` addresses a field whose NAME contains a
  *    dot); get_json_object cannot address such fields.
  *  - scalar extraction DECODES escapes ("abc" → the control char);
  *    json extraction re-serializes compactly, preserving escapes.
  *  - lenient-LOOKING input: TestJsonExtract's trailing-comma vectors
  *    (`{"a": 1, }` with path `$.a`) pass because streaming extraction
  *    stops at the matched value before reaching the malformed tail — the
  *    reference's JSON_FACTORY is NOT lenient (JsonExtract.java:120 only
  *    disables CANONICALIZE_FIELD_NAMES), so whole-document operations on
  *    such input hit JsonParseException. We reproduce both behaviors with
  *    a strict factory; malformed JSON → NULL, never an error.
  *  - `json_size` counts fields/elements of the container at the path, 0
  *    for scalars, NULL off-path/invalid (JsonFunctions.java json_size) —
  *    replacing the first-character string-sniffing approximation carried
  *    since round 1.
  *
  * Paths are tokenized per JsonPathTokenizer.java: `$` then any sequence
  * of `.field`, `[unquoted]`, `["quoted"]`; no whitespace anywhere; `"` in
  * quoted tokens escapes via backslash. An invalid path is a constructor-
  * time error when the path is foldable (the analyzer surfaces it), else a
  * runtime IllegalArgumentException — matching INVALID_FUNCTION_ARGUMENT.
  */
object PrestoJsonPath {

  private[functions] val factory: JsonFactory = new JsonFactory()

  /** JsonPathTokenizer.java semantics: strict, whitespace-rejecting. */
  def tokenize(path: String): Seq[String] = {
    require(path.nonEmpty && path.charAt(0) == '$', s"Invalid JSON path: '$path'")
    val tokens = Seq.newBuilder[String]
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          i += 1
          val start = i
          while (i < path.length && path.charAt(i) != '.' && path.charAt(i) != '[') {
            val c = path.charAt(i)
            require(!c.isWhitespace, s"Invalid JSON path: '$path'")
            i += 1
          }
          require(i > start, s"Invalid JSON path: '$path'")
          tokens += path.substring(start, i)
        case '[' =>
          i += 1
          require(i < path.length, s"Invalid JSON path: '$path'")
          if (path.charAt(i) == '"') {
            i += 1
            val sb = new StringBuilder
            var closed = false
            while (i < path.length && !closed) {
              path.charAt(i) match {
                case '\\' =>
                  require(i + 1 < path.length, s"Invalid JSON path: '$path'")
                  val e = path.charAt(i + 1)
                  require(e == '"' || e == '\\', s"Invalid JSON path: '$path'")
                  sb.append(e); i += 2
                case '"' => closed = true; i += 1
                case c => sb.append(c); i += 1
              }
            }
            require(closed && i < path.length && path.charAt(i) == ']',
              s"Invalid JSON path: '$path'")
            i += 1
            tokens += sb.toString
          } else {
            val start = i
            while (i < path.length && path.charAt(i) != ']') {
              val c = path.charAt(i)
              require(!c.isWhitespace && c != ':' && c != '"' && c != '\'',
                s"Invalid JSON path: '$path'")
              i += 1
            }
            require(i > start && i < path.length, s"Invalid JSON path: '$path'")
            tokens += path.substring(start, i)
            i += 1
          }
        case _ => throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
      }
    }
    tokens.result()
  }

  /** Advance the parser to the value addressed by tokens(from..); the
    * parser stands ON the first token of that value, or returns false if
    * the path does not exist. Mirrors ObjectFieldJsonExtractor /
    * the array branch of JsonExtract.java.
    */
  private def seek(p: JsonParser, tokens: Seq[String], from: Int): Boolean = {
    var i = from
    while (i < tokens.length) {
      val tok = tokens(i)
      p.currentToken() match {
        case JsonToken.START_OBJECT =>
          var found = false
          var done = false
          while (!done) {
            val t = p.nextToken()
            if (t == JsonToken.END_OBJECT || t == null) done = true
            else {
              val name = p.currentName()
              p.nextToken() // move onto the value
              if (!found && name == tok) { found = true; done = true }
              else p.skipChildren()
            }
          }
          if (!found) return false
        case JsonToken.START_ARRAY =>
          // ASCII digits only, bounded — Character.isDigit accepts Unicode
          // digit classes and an over-Int token would throw in toInt,
          // crashing the query instead of returning the off-path NULL
          if (tok.isEmpty || tok.length > 9 || !tok.forall(c => c >= '0' && c <= '9'))
            return false
          val want = tok.toInt
          var idx = -1
          var done = false
          while (!done) {
            val t = p.nextToken()
            if (t == JsonToken.END_ARRAY || t == null) return false
            idx += 1
            if (idx == want) done = true
            else p.skipChildren()
          }
        case _ => return false // scalar, but path goes deeper
      }
      i += 1
    }
    true
  }

  /** mode: 0 = json (compact re-serialization), 1 = scalar (decoded text,
    * NULL for containers), 2 = size.
    */
  def extract(json: String, tokens: Seq[String], mode: Int): Any =
    try {
      val p = factory.createParser(json)
      try {
        if (p.nextToken() == null) return null
        if (!seek(p, tokens, 0)) return null
        mode match {
          case 1 =>
            p.currentToken() match {
              case JsonToken.VALUE_NULL | JsonToken.START_OBJECT | JsonToken.START_ARRAY => null
              case null => null
              case _ => UTF8String.fromString(p.getText)
            }
          case 2 =>
            p.currentToken() match {
              case JsonToken.START_OBJECT =>
                var n = 0
                var t = p.nextToken()
                while (t != JsonToken.END_OBJECT && t != null) {
                  p.nextToken(); p.skipChildren(); n += 1; t = p.nextToken()
                }
                n
              case JsonToken.START_ARRAY =>
                var n = 0
                var t = p.nextToken()
                while (t != JsonToken.END_ARRAY && t != null) {
                  p.skipChildren(); n += 1; t = p.nextToken()
                }
                n
              case null => null
              case _ => 0
            }
          case _ =>
            if (p.currentToken() == null) null
            else {
              val w = new java.io.StringWriter()
              val g = factory.createGenerator(w)
              g.copyCurrentStructure(p)
              g.close()
              UTF8String.fromString(w.toString)
            }
        }
      } finally p.close()
    } catch {
      case _: java.io.IOException => null // malformed JSON → NULL
      case _: com.fasterxml.jackson.core.JacksonException => null
    }
}

/** json_extract / json_extract_scalar / json_size over the Presto path
  * dialect. Literal paths validate at analysis time and tokenize once; a
  * dynamic path column re-tokenizes only when the value changes
  * (single-entry memo — paths are near-constant per column in practice)
  * and raises at eval if invalid, matching INVALID_FUNCTION_ARGUMENT.
  */
case class PrestoJsonExtract(left: Expression, right: Expression, mode: Int)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = mode match {
    case 1 => "json_extract_scalar"
    case 2 => "json_size"
    case _ => "json_extract"
  }
  override def dataType: DataType = if (mode == 2) IntegerType else StringType
  override def nullable: Boolean = true

  // Single-entry memo held as one immutable pair written atomically: the
  // same expression instance can be evaluated from concurrent actions on a
  // shared cached plan, and two separate vars could be observed mid-update
  // (one thread's path with another's tokens).
  @transient private var cached: (String, Seq[String]) = _

  // a malformed LITERAL path fails analysis (INVALID_FUNCTION_ARGUMENT at
  // planning, as documented), not per-row inside the job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (right.foldable && right.eval(null) != null) {
      try {
        PrestoJsonPath.tokenize(right.eval(null).asInstanceOf[UTF8String].toString)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      } catch {
        case e: IllegalArgumentException =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val p = path.asInstanceOf[UTF8String].toString
    val c = cached
    val tokens =
      if (c != null && c._1 == p) c._2
      else {
        val t = PrestoJsonPath.tokenize(p)
        cached = (p, t)
        t
      }
    PrestoJsonPath.extract(json.asInstanceOf[UTF8String].toString, tokens, mode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrestoJsonExtract =
    copy(left = newLeft, right = newRight)
}

/** json_array_contains(json, value) — true iff the top-level JSON array
  * holds a scalar equal to `value`, matched per type like the reference's
  * overloads (JsonFunctions.java): booleans against boolean tokens,
  * integral/floating values against number tokens, strings against string
  * tokens. Non-array or malformed input → NULL.
  */
case class PrestoJsonArrayContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "json_array_contains"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true

  override protected def nullSafeEval(json: Any, value: Any): Any =
    try {
      val p = PrestoJsonPath.factory.createParser(json.asInstanceOf[UTF8String].toString)
      try {
        if (p.nextToken() != JsonToken.START_ARRAY) return null
        var found = false
        var t = p.nextToken()
        while (!found && t != JsonToken.END_ARRAY && t != null) {
          found = (t, value) match {
            case (JsonToken.VALUE_TRUE, b: Boolean) => b
            case (JsonToken.VALUE_FALSE, b: Boolean) => !b
            case (JsonToken.VALUE_NUMBER_INT, n: Long) => p.getLongValue == n
            case (JsonToken.VALUE_NUMBER_INT, n: Int) => p.getLongValue == n.toLong
            case (JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT, d: Double) =>
              p.getDoubleValue == d
            case (JsonToken.VALUE_STRING, s: UTF8String) => p.getText == s.toString
            case _ => false
          }
          if (!found) { p.skipChildren(); t = p.nextToken() }
        }
        found
      } finally p.close()
    } catch {
      case _: java.io.IOException => null
      case _: com.fasterxml.jackson.core.JacksonException => null
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrestoJsonArrayContains =
    copy(left = newLeft, right = newRight)
}

/** is_json_scalar via a real parse (JsonFunctions.java): true iff the
  * whole input is one scalar JSON value — a string value whose TEXT looks
  * like "[1]" is a scalar, which the old first-character sniff
  * misclassified. Malformed input → NULL.
  */
case class PrestoIsJsonScalar(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def prettyName: String = "is_json_scalar"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true

  override protected def nullSafeEval(json: Any): Any =
    try {
      val p = PrestoJsonPath.factory.createParser(json.asInstanceOf[UTF8String].toString)
      try {
        val t = p.nextToken()
        if (t == null) null
        else if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY) {
          p.skipChildren()
          if (p.nextToken() == null) false else null // trailing garbage → invalid
        } else {
          p.getText // force value decoding so malformed scalars throw
          if (p.nextToken() == null) true else null
        }
      } finally p.close()
    } catch {
      case _: java.io.IOException => null
      case _: com.fasterxml.jackson.core.JacksonException => null
    }

  override protected def withNewChildInternal(newChild: Expression): PrestoIsJsonScalar =
    copy(child = newChild)
}
