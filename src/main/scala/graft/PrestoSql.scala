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

  /** Top-level `... ORDER BY <keys> FETCH FIRST n ROWS WITH TIES` — the
    * greedy first group pins the LAST order-by, so an inner subquery's
    * order-by stays with the base query.
    */
  private val withTiesRe =
    "(?is)^(.*)\\bORDER\\s+BY\\s+(.+?)\\s+FETCH\\s+FIRST\\s+(\\d+)\\s+ROWS?\\s+WITH\\s+TIES\\s*;?\\s*$".r

  def translate(sql: String): String = {
    if (sql.toLowerCase.contains("with ties"))
      throw new IllegalArgumentException(
        "FETCH FIRST ... WITH TIES has no text-level Spark SQL equivalent; run it " +
          "through PrestoSql.sql(spark, text), which desugars it into a rank() filter " +
          "(the reference's ImplementLimitWithTies.java rewrite)")

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

  /** Run Presto-dialect SQL against a session with the graft registry.
    * `FETCH FIRST n ROWS WITH TIES` at top level is desugared into a
    * rank() window + filter — the reference's own planner rewrite
    * (sql/planner/iterative/rule/ImplementLimitWithTies.java). The rewrite
    * happens on the ANALYZED plan's Sort node, so sort keys that are not
    * in the select list (legal SQL, resolved as hidden sort columns) rank
    * correctly; Spark then optimizes `rank <= n` into WindowGroupLimit, so
    * partitions pre-prune to their local top-n before the final merge.
    */
  def sql(spark: SparkSession, prestoText: String): DataFrame = prestoText match {
    case withTiesRe(base, keys, n) =>
      import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression => CExpr, LessThanOrEqual, Literal, NamedExpression, Rank, RowFrame, SpecifiedWindowFrame, UnboundedPreceding, CurrentRow, WindowExpression, WindowSpecDefinition}
      import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort, Window}
      val analyzed = spark.sql(translate(s"$base\nORDER BY $keys"))
        .queryExecution.analyzed
      def tiesPlan(out: Seq[NamedExpression], sort: Sort): LogicalPlan = {
        val order = sort.order
        val rankAlias = Alias(
          WindowExpression(
            Rank(order.map(_.child: CExpr)),
            WindowSpecDefinition(Nil, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          "__graft_rk")()
        val window = Window(Seq(rankAlias), Nil, order, sort)
        val filtered = Filter(
          LessThanOrEqual(rankAlias.toAttribute, Literal(n.toInt)), window)
        Project(out, Sort(order, global = true, filtered))
      }
      val plan = analyzed match {
        case Project(out, s: Sort) if s.global => tiesPlan(out, s)
        case s: Sort if s.global => tiesPlan(s.output.map(a => a: NamedExpression), s)
        case other => throw new IllegalArgumentException(
          "FETCH FIRST ... WITH TIES requires a top-level ORDER BY; got plan root " +
            other.nodeName)
      }
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
    case _ => spark.sql(translate(prestoText))
  }

  /** Session prepared-statement surface: PREPARE name FROM query /
    * EXECUTE name [USING expr, ...] / DEALLOCATE PREPARE name
    * (reference grammar SqlBase.g4 `PREPARE`/`EXECUTE`/`DEALLOCATE`
    * statements; presto-main execution/PrepareTask.java stores the raw
    * statement text in Session.preparedStatements and EXECUTE re-plans it
    * with parameters bound). Spark keeps no such session state, so this
    * registry supplies it; parameter BINDING is delegated to Spark's
    * native positional-parameter API (`SparkSession.sql(text, args)`), so
    * each `?` becomes a typed literal in the analyzed plan — never string
    * splicing. USING arguments are themselves SQL expressions (Presto
    * constant-folds them at EXECUTE planning time); they are evaluated in
    * one constant-folded `SELECT` with no table scan.
    */
  final class Prepared(spark: SparkSession) {
    private val stmts = scala.collection.concurrent.TrieMap.empty[String, String]

    private val prepareRe =
      "(?is)^\\s*PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+(.+?)\\s*;?\\s*$".r
    private val executeRe =
      "(?is)^\\s*EXECUTE\\s+([A-Za-z_][A-Za-z0-9_]*)(?:\\s+USING\\s+(.+?))?\\s*;?\\s*$".r
    private val deallocRe =
      "(?is)^\\s*DEALLOCATE\\s+PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$".r

    private val showTablesRe = "(?is)^\\s*SHOW\\s+TABLES\\s*;?\\s*$".r
    private val showSchemasRe = "(?is)^\\s*SHOW\\s+SCHEMAS\\s*;?\\s*$".r
    private val showColumnsRe =
      "(?is)^\\s*(?:SHOW\\s+COLUMNS\\s+FROM|DESCRIBE|DESC)\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*;?\\s*$".r
    private val showFunctionsRe = "(?is)^\\s*SHOW\\s+FUNCTIONS\\s*;?\\s*$".r
    // DESCRIBE INPUT/OUTPUT must route before the DESCRIBE-table alias
    private val descInputRe =
      "(?is)^\\s*DESCRIBE\\s+INPUT\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$".r
    private val descOutputRe =
      "(?is)^\\s*DESCRIBE\\s+OUTPUT\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$".r
    private val showCatalogsRe = "(?is)^\\s*SHOW\\s+CATALOGS\\s*;?\\s*$".r
    private val showSessionRe = "(?is)^\\s*SHOW\\s+SESSION\\s*;?\\s*$".r
    private val showStatsRe =
      "(?is)^\\s*SHOW\\s+STATS\\s+FOR\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*;?\\s*$".r
    // the grammar's #showStatsForQuery form: SHOW STATS FOR (SELECT …)
    private val showStatsQueryRe =
      "(?is)^\\s*SHOW\\s+STATS\\s+FOR\\s*\\((.+)\\)\\s*;?\\s*$".r
    private val setSessionRe =
      "(?is)^\\s*SET\\s+SESSION\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*=\\s*(.+?)\\s*;?\\s*$".r
    private val resetSessionRe =
      "(?is)^\\s*RESET\\s+SESSION\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*;?\\s*$".r
    // reference grammar SqlBase.g4:104-106 (START TRANSACTION / COMMIT
    // [WORK] / ROLLBACK [WORK], execution/StartTransactionTask.java) —
    // rejected explicitly so a migrating client gets the divergence
    // message, not a bare parse error (README "Known divergences")
    private val txnRe =
      "(?is)^\\s*(START\\s+TRANSACTION\\b[^;]*|COMMIT(?:\\s+WORK)?|ROLLBACK(?:\\s+WORK)?)\\s*;?\\s*$".r
    // reference grammar SqlBase.g4 `DELETE FROM qualifiedName (WHERE
    // booleanExpression)?` and the UPDATE statement family. Spark's own
    // parser rejects row-level DML on parquet v1 tables, so these route
    // onto the row-level engines against the catalog table's location —
    // copy-on-write (sources/CowDelete.scala) for plain parquet tables,
    // MERGE-ON-READ (sources/MorDelete.scala) for tables that live in MoR
    // mode (a live tombstone sidecar or snapshot manifests) — the same
    // single-statement atomicity the reference's DeleteOperator +
    // TableFinish pair provides. UPDATE's SET/WHERE split happens with
    // the quote/paren-aware scanner, NOT inside the regex: a SET
    // expression containing the literal ' WHERE ' must not mis-split.
    private val deleteRe =
      "(?is)^\\s*DELETE\\s+FROM\\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$".r
    private val updateRe =
      "(?is)^\\s*UPDATE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+SET\\s+(.+?)\\s*;?\\s*$".r
    // ANSI MERGE INTO … USING … ON … WHEN …; Presto 323's grammar has no
    // MERGE at all, so like UPDATE this statement EXCEEDS the reference
    // surface. The USING/ON/WHEN splits all run through the top-level
    // keyword scanner (a subquery's own JOIN … ON binds inside its
    // parens), never the regex.
    private val mergeRe =
      "(?is)^\\s*MERGE\\s+INTO\\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\\s+(?:AS\\s+)?(?!USING\\b)([A-Za-z_][A-Za-z0-9_]*))?\\s+USING\\s+(.+?)\\s*;?\\s*$".r
    // Maintenance statements over the manifest protocol. `ANALYZE t` IS
    // the reference's grammar (SqlBase.g4 #analyze — StatisticsWriter
    // persists stats for the planner): here a merge-on-read table
    // publishes per-file min/max into its manifest (feeding readWhere's
    // driver-side pruning) and a plain catalog table takes Spark's own
    // column statistics. VACUUM and OPTIMIZE [ZORDER BY] exceed the
    // reference (Delta's statements) like UPDATE/MERGE/time travel do.
    // The bare-ANALYZE shape is anchored so Spark's own
    // `ANALYZE TABLE … COMPUTE STATISTICS` text still falls through.
    private val analyzeRe =
      "(?is)^\\s*ANALYZE\\s+(?!TABLE\\b)([A-Za-z_][A-Za-z0-9_.]*)\\s*;?\\s*$".r
    // time-travel management (Delta's statements, exceeding Presto 323
    // like the FOR … AS OF reads): DESCRIBE HISTORY lists the retained
    // versions a reader can pin, RESTORE rolls the live view back to one
    // as a NEW commit (pinned snapshots are never hijacked)
    private val describeHistoryRe =
      "(?is)^\\s*DESCRIBE\\s+HISTORY\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*;?\\s*$".r
    private val restoreRe =
      ("(?is)^\\s*RESTORE\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+TO\\s+VERSION" +
        "\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
    private val restoreTsRe =
      ("(?is)^\\s*RESTORE\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+TO\\s+TIMESTAMP" +
        "\\s+AS\\s+OF\\s+(?:TIMESTAMP\\s+)?'([^']*)'\\s*;?\\s*$").r
    // ALTER TABLE column family (reference grammar SqlBase.g4:52-59 —
    // renameTable / renameColumn / dropColumn / addColumn; Presto 323
    // delegates them to connector metadata). On parquet-location tables
    // the column ops route through the MANIFEST protocol (sources/
    // Evolution.scala): metadata-only commits, no file rewritten — the
    // shape that stays viable at 100 TB. Reads surface through the
    // resolved temp view, the same reads-see-the-snapshot contract as
    // every MoR statement here.
    private val alterAddColRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+ADD\\s+COLUMN\\s+" +
        "([A-Za-z_][A-Za-z0-9_]*)\\s+(.+?)\\s*;?\\s*$").r
    private val alterRenameColRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+RENAME\\s+COLUMN\\s+" +
        "([A-Za-z_][A-Za-z0-9_]*)\\s+TO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$").r
    private val alterDropColRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+DROP\\s+COLUMN\\s+" +
        "([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$").r
    private val alterRenameTableRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+RENAME\\s+TO\\s+" +
        "([A-Za-z_][A-Za-z0-9_.]*)\\s*;?\\s*$").r
    // CHECK constraints (Delta's statements; no constraint surface in
    // Presto 323) — data-quality gates at the manifest-managed write
    // boundary, enforced by MorUpsert.merge before anything stages
    private val alterAddConstraintRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+ADD\\s+CONSTRAINT\\s+" +
        "([A-Za-z_][A-Za-z0-9_]*)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$").r
    private val alterDropConstraintRe =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+DROP\\s+CONSTRAINT\\s+" +
        "([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$").r
    private val vacuumRe =
      "(?is)^\\s*VACUUM\\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?\\s*;?\\s*$".r
    private val optimizeRe =
      "(?is)^\\s*OPTIMIZE\\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*$".r

    /** Route one statement: PREPARE/EXECUTE/DEALLOCATE and the SHOW
      * metadata statements handled here (the reference rewrites SHOW into
      * information_schema queries — sql/rewrite/ShowQueriesRewrite.java;
      * here they read Spark's catalog), any other text falls through to
      * `PrestoSql.sql`.
      */
    def statement(text: String): DataFrame = text match {
      case prepareRe(name, body) =>
        stmts(name) = body
        spark.sql(s"SELECT 'PREPARE' AS result")
      case deallocRe(name) =>
        if (stmts.remove(name).isEmpty) notFound(name)
        spark.sql(s"SELECT 'DEALLOCATE' AS result")
      case executeRe(name, usingList) =>
        execute(name, Option(usingList).map(splitTopLevel).getOrElse(Nil))
      case showTablesRe() =>
        import spark.implicits._
        spark.catalog.listTables().map(_.name).toDF("Table").orderBy("Table")
      case showSchemasRe() =>
        import spark.implicits._
        spark.catalog.listDatabases().map(_.name).toDF("Schema").orderBy("Schema")
      case descInputRe(name) => describeInput(name)
      case descOutputRe(name) => describeOutput(name)
      case showColumnsRe(table) =>
        import spark.implicits._
        spark.table(table).schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString)).toDF("Column", "Type")
      case showFunctionsRe() =>
        import spark.implicits._
        spark.catalog.listFunctions().map(_.name).toDF("Function").orderBy("Function")
      case showCatalogsRe() =>
        import spark.implicits._
        spark.catalog.listCatalogs().map(_.name).toDF("Catalog").orderBy("Catalog")
      case showSessionRe() =>
        // the reference lists session properties name/value (SHOW SESSION,
        // ShowQueriesRewrite); here the session surface is Spark's conf
        import spark.implicits._
        spark.conf.getAll.toSeq.toDF("Name", "Value").orderBy("Name")
      case showStatsQueryRe(query) =>
        showStatsOf(PrestoSql.sql(spark, rewriteTimeTravel(query)))
      case showStatsRe(table) => showStatsOf(spark.table(table))
      case setSessionRe(name, valueExpr) =>
        // constant-fold the value expression (the reference accepts any
        // literal expression here), then set it on Spark's conf — an
        // unmodifiable key surfaces Spark's own error, not a silent no-op
        val v = spark.sql(s"SELECT $valueExpr").head().get(0)
        spark.conf.set(name, String.valueOf(v))
        spark.sql("SELECT 'SET SESSION' AS result")
      case resetSessionRe(name) =>
        spark.conf.unset(name)
        spark.sql("SELECT 'RESET SESSION' AS result")
      case deleteRe(table, whereOpt) =>
        import spark.implicits._
        import org.apache.spark.sql.functions.{expr, lit}
        val pred = Option(whereOpt)
          .map(w => expr(PrestoSql.translate(rewriteTimeTravel(w))))
          .getOrElse(lit(true))
        val loc = parquetLocation(table, "DELETE")
        // the reference's DELETE returns the deleted-row count — derived
        // from the engine's OWN Observation on the rewrite/key pass, never
        // a separate predicate scan (PrestoSqlSpec pins the action count)
        val n =
          if (morMode(loc)) {
            val keyCols = sources.MorDelete.sidecarKeyCols(spark, loc)
              .getOrElse(spark.table(table).columns.toSeq)
            val st = sources.MorDelete.delete(spark, loc, pred, keyCols)
            resolveMorView(table, loc)
            st.rowsMatched
          } else {
            sources.CowDelete.delete(spark, loc, pred).deletedRows
          }
        spark.catalog.refreshTable(table)
        Seq(n).toDF("rows")
      case updateRe(table, rest) =>
        import spark.implicits._
        import org.apache.spark.sql.functions.{expr, lit}
        // split `SET a = e, b = f [WHERE pred]` at the TOP-LEVEL WHERE —
        // quote/paren-aware, so a SET literal containing ' WHERE ' binds
        val whereAt = topLevelKeyword(rest, "WHERE")
        val (setList, whereOpt) =
          if (whereAt < 0) (rest, None)
          else (rest.substring(0, whereAt).trim,
            Some(rest.substring(whereAt + "WHERE".length).trim))
        val pred = whereOpt.map(w =>
          expr(PrestoSql.translate(rewriteTimeTravel(w)))).getOrElse(lit(true))
        val sets = splitTopLevel(setList).map { a =>
          val eq = topLevelEq(a)
          require(eq > 0, s"malformed SET assignment: $a")
          val name = a.substring(0, eq).trim.stripPrefix("\"").stripSuffix("\"")
          name -> expr(PrestoSql.translate(a.substring(eq + 1).trim))
        }
        val loc = parquetLocation(table, "UPDATE")
        val n =
          if (morMode(loc)) {
            // MoR UPDATE = MERGE on the sidecar's self-described key: the
            // matched rows (resolved view ∩ predicate) re-append with the
            // SETs applied at the next sequence; their old copies die
            // under the tombstones. Needs a declared key — a manifest-only
            // table (no live batches) has none, and the merge's ANSI
            // cardinality check refuses duplicate-keyed matches loudly.
            val keyCols = sources.MorDelete.sidecarKeyCols(spark, loc).getOrElse(
              throw new UnsupportedOperationException(
                s"UPDATE on merge-on-read table '$table' needs the sidecar's key " +
                  "columns, and it has no live tombstone batch to declare them — " +
                  "use MorUpsert.merge with explicit keys, or compact() first"))
            val badSets = sets.map(_._1).filter(keyCols.contains)
            require(badSets.isEmpty,
              s"UPDATE on merge-on-read table '$table' cannot assign key " +
                s"column(s) ${badSets.mkString(", ")} — key identity is what " +
                "links the replacement to the tombstone")
            val resolved = sources.MorDelete.read(spark, loc)
            val byName = sets.toMap
            val source = resolved.filter(pred).select(resolved.columns.toSeq.map(c =>
              byName.get(c).map(_.as(c)).getOrElse(org.apache.spark.sql.functions.col(c))): _*)
            val st = sources.MorUpsert.merge(spark, loc, source, keyCols,
              insertUnmatched = false)
            resolveMorView(table, loc)
            st.keysUpdated
          } else {
            // a subquery predicate cannot ride the rewrite's metrics node;
            // only that shape pays a separate (pushdown-filtered) count,
            // taken BEFORE the rewrite changes the rows
            val subq = org.apache.spark.sql.GraftSqlBridge.toExpr(spark, pred)
              .exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])
            val pre = if (subq) spark.table(table).filter(pred).count() else -1L
            val st = sources.CowUpdate.update(spark, loc, pred, sets)
            if (st.updatedRows >= 0) st.updatedRows else pre
          }
        spark.catalog.refreshTable(table)
        Seq(n).toDF("rows")
      case mergeRe(table, aliasOpt, rest) =>
        mergeStatement(table, Option(aliasOpt), rest)
      case describeHistoryRe(table) =>
        sources.MorDelete.history(spark, parquetLocation(table, "DESCRIBE HISTORY"))
      case restoreRe(table, v) =>
        import spark.implicits._
        val loc = parquetLocation(table, "RESTORE")
        val nv = sources.MorDelete.restore(spark, loc, v.toLong)
        resolveMorView(table, loc)
        spark.catalog.refreshTable(table)
        Seq(nv).toDF("version")
      case restoreTsRe(table, ts) =>
        import spark.implicits._
        val loc = parquetLocation(table, "RESTORE")
        val ms = sources.MorDelete.manifests(loc)
        val millis = sessionMillis(ts)
        val eligible = ms.filter(_.file.lastModified() <= millis)
        if (eligible.isEmpty)
          throw new IllegalStateException(
            s"no retained snapshot at or before '$ts' for $table — the instant " +
              "predates the table's history, or Maintenance.vacuum expired it")
        val nv = sources.MorDelete.restore(spark, loc,
          eligible.maxBy(_.ordinal).seq)
        resolveMorView(table, loc)
        spark.catalog.refreshTable(table)
        Seq(nv).toDF("version")
      case alterAddColRe(table, name, typeDDL) =>
        import spark.implicits._
        val loc = parquetLocation(table, "ALTER TABLE ADD COLUMN")
        val v = sources.Evolution.addColumn(spark, loc, name, typeDDL)
        // best-effort catalog sync — ADD COLUMNS is the one column op
        // Spark's v1 parquet catalog accepts; the manifest stays the
        // source of truth and the resolved view below shadows the name
        // either way, so a catalog refusal must not fail the statement
        scala.util.Try(
          spark.sql(s"ALTER TABLE $table ADD COLUMNS (`$name` $typeDDL)"))
        resolveMorView(table, loc)
        spark.catalog.refreshTable(table)
        Seq(v).toDF("version")
      case alterRenameColRe(table, from, to) =>
        import spark.implicits._
        val loc = parquetLocation(table, "ALTER TABLE RENAME COLUMN")
        val v = sources.Evolution.renameColumn(spark, loc, from, to)
        resolveMorView(table, loc)
        spark.catalog.refreshTable(table)
        Seq(v).toDF("version")
      case alterDropColRe(table, name) =>
        import spark.implicits._
        val loc = parquetLocation(table, "ALTER TABLE DROP COLUMN")
        val v = sources.Evolution.dropColumn(spark, loc, name)
        resolveMorView(table, loc)
        spark.catalog.refreshTable(table)
        Seq(v).toDF("version")
      case alterAddConstraintRe(table, name, exprText) =>
        import spark.implicits._
        val loc = parquetLocation(table, "ALTER TABLE ADD CONSTRAINT")
        val v = sources.Evolution.addConstraint(spark, loc, name,
          PrestoSql.translate(exprText))
        Seq(v).toDF("version")
      case alterDropConstraintRe(table, name) =>
        import spark.implicits._
        val loc = parquetLocation(table, "ALTER TABLE DROP CONSTRAINT")
        val v = sources.Evolution.dropConstraint(spark, loc, name)
        Seq(v).toDF("version")
      case alterRenameTableRe(from, to) =>
        import spark.implicits._
        // catalog rename keeps an external table's location, and the
        // sidecar/manifest directories are SIBLINGS of the location —
        // nothing moves on disk; only the shadowing resolved view follows
        // the name
        val wasMor = scala.util.Try(
          morMode(parquetLocation(from, "ALTER TABLE RENAME"))).getOrElse(false)
        // the resolved-view shadow must drop FIRST: Spark's RENAME TO
        // resolves temp views before catalog tables and would rename the
        // view instead of the table
        spark.catalog.dropTempView(from.split('.').last)
        spark.sql(s"ALTER TABLE $from RENAME TO $to")
        if (wasMor) resolveMorView(to, parquetLocation(to, "ALTER TABLE RENAME"))
        Seq(to).toDF("table")
      case analyzeRe(table) =>
        import spark.implicits._
        val loc = parquetLocation(table, "ANALYZE")
        if (morMode(loc)) {
          val n = sources.Maintenance.analyze(spark, loc)
          resolveMorView(table, loc)
          Seq(n).toDF("files_analyzed")
        } else {
          // the reference's StatisticsWriter path: catalog-level column
          // stats for the planner (ddl_analyze_stats gates the Spark form)
          spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
          Seq("ANALYZE").toDF("result")
        }
      case vacuumRe(table, hoursOpt) =>
        import spark.implicits._
        val loc = parquetLocation(table, "VACUUM")
        val retention = Option(hoursOpt).map(_.toLong * 3600L * 1000L)
          .getOrElse(7L * 24 * 3600 * 1000)
        // the stage grace never exceeds the retention: VACUUM … RETAIN 0
        // HOURS is the explicit "reclaim everything" form and must also
        // sweep crashed stages, while the default keeps the 1 h guard for
        // live CoW writers
        val st = sources.Maintenance.vacuum(loc, retention,
          math.min(retention, 3600L * 1000L))
        Seq((st.dirsRemoved, st.filesRemoved, st.bytesReclaimed))
          .toDF("dirs_removed", "files_removed", "bytes_reclaimed")
      case optimizeRe(table, zcolsOpt) =>
        import spark.implicits._
        val loc = parquetLocation(table, "OPTIMIZE")
        Option(zcolsOpt) match {
          case Some(colsText) =>
            val cols = splitTopLevel(colsText)
              .map(_.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
            require(cols.nonEmpty, "OPTIMIZE … ZORDER BY needs at least one column")
            val skewed = sources.Layout.zorderRewrite(spark, loc, cols)
            resolveMorView(table, loc)
            spark.catalog.refreshTable(table)
            Seq(if (skewed) "rank" else "uniform").toDF("quantizer")
          case None =>
            require(morMode(loc),
              s"OPTIMIZE without ZORDER BY folds merge-on-read tombstones and " +
                s"'$table' is plain parquet (nothing to fold) — use " +
                "OPTIMIZE … ZORDER BY (cols) to re-cluster it")
            // a table with pending schema evolution takes the migration
            // rewrite (resolved view re-materialized at the logical
            // schema, log cleared); compact() handles the uniform case
            val rewritten =
              if (sources.MorDelete.liveState(spark, loc).schemaLog.nonEmpty)
                sources.Layout.rewriteFiles(spark, loc)
              else sources.MorDelete.compact(spark, loc).rewritten
            resolveMorView(table, loc)
            spark.catalog.refreshTable(table)
            Seq(rewritten).toDF("files_rewritten")
        }
      case txnRe(stmt) =>
        throw new UnsupportedOperationException(
          s"'${stmt.trim}' is not supported: this engine runs with single-statement " +
            "semantics only (Spark SQL has no multi-statement transactions). Each " +
            "DML statement is individually atomic via staged-file rename; see " +
            "README 'Known divergences'.")
      case other => PrestoSql.sql(spark, rewriteTimeTravel(other))
    }

    private def rewriteTimeTravel(text: String): String =
      rewriteVersionAsOf(rewriteTimestampAsOf(rewriteTableChanges(text)))

    /** Change-feed reads from the SQL surface — Delta's
      * `table_changes('t', from[, to])` table-valued form (Presto 323 has
      * no CDC grammar at all, so like the FOR … AS OF reads the shape
      * exceeds the reference): each occurrence rewrites to a temp view
      * over [[sources.MorDelete.readChanges]] pinned at those bounds,
      * carrying the table's columns plus _change_type / _commit_version /
      * _commit_timestamp. Quote-guarded like every scanner here; composes
      * anywhere a relation can appear (joins, subqueries, PREPARE bodies
      * — the rewrite runs at EXECUTE time). */
    // quotes must BALANCE: two alternatives — the quoted string form
    // (Delta's table_changes signature) or a bare identifier — so a
    // one-sided quote ( table_changes('t, 0) ) fails to parse instead
    // of silently matching
    private val tableChangesRe =
      ("(?i)\\btable_changes\\s*\\(\\s*(?:'([A-Za-z_][A-Za-z0-9_.]*)'|" +
        "([A-Za-z_][A-Za-z0-9_.]*))\\s*,\\s*(\\d+)" +
        "(?:\\s*,\\s*(\\d+))?\\s*\\)").r

    private def rewriteTableChanges(text: String): String = {
      if (!"(?i)table_changes".r.findFirstIn(text).isDefined) return text
      replaceTopLevel(text, tableChangesRe) { m =>
        val table = Option(m.group(1)).getOrElse(m.group(2))
        val from = m.group(3).toLong
        val to = Option(m.group(4)).map(_.toLong).getOrElse(Long.MaxValue)
        val loc = parquetLocation(table, "table_changes")
        val view = pinnedViewName(table,
          s"__ch${from}_${if (to == Long.MaxValue) "now" else to.toString}")
        sources.MorDelete.readChanges(spark, loc, from, to)
          .createOrReplaceTempView(view)
        view
      }
    }

    /** Snapshot (time-travel) reads from the SQL surface: every
      * `<table> FOR VERSION AS OF <seq>` clause — the shape modern SQL
      * engines give their snapshot reads; Presto 323's grammar has none,
      * so like UPDATE/MERGE the statement EXCEEDS the reference — rewrites
      * to a temp view over [[sources.MorDelete.readAt]] pinned at that
      * sequence (the handle [[sources.MorDelete.currentSeq]] returns).
      * Quote-aware like every scanner here: a string literal containing
      * the phrase is never rewritten. A pinned view resolves its manifest
      * at statement time, so it reads consistently even across later DML,
      * until vacuum expires the snapshot (then readAt fails loudly).
      */
    private val versionAsOfRe =
      "(?i)\\b([A-Za-z_][A-Za-z0-9_.]*)\\s+FOR\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\b".r

    /** The wall-clock twin: `<table> FOR TIMESTAMP AS OF [TIMESTAMP]
      * '<ts>'` resolves the newest manifest committed at or before the
      * instant (UTC, matching the session zone) via
      * [[sources.MorDelete.readAtTime]]. The matched region CONTAINS a
      * string literal, so the segment-splitting scanner the VERSION arm
      * uses cannot see it whole — instead full-text matches are guarded
      * by a literal-span check (a match starting inside a quoted string
      * is left untouched). */
    private val timestampAsOfRe =
      ("(?i)\\b([A-Za-z_][A-Za-z0-9_.]*)\\s+FOR\\s+TIMESTAMP\\s+AS\\s+OF\\s+" +
        "(?:TIMESTAMP\\s+)?'([^']*)'").r

    /** Spans of quoted regions — single-quoted literals ('' escapes) AND
      * double-quoted identifiers ("" escapes). Both matter: an apostrophe
      * inside a quoted identifier must not flip string-literal parity
      * (the defect class paramPositions already guards against). */
    private def quotedSpans(text: String): Seq[(Int, Int)] = {
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < text.length) {
        text.charAt(i) match {
          case '\'' =>
            val e = math.min(skipLiteral(text, i), text.length)
            spans += ((i, e)); i = e
          case '"' =>
            var j = i + 1
            var done = false
            while (j < text.length && !done) {
              if (text.charAt(j) == '"') {
                if (j + 1 < text.length && text.charAt(j + 1) == '"') j += 2
                else { j += 1; done = true }
              } else j += 1
            }
            spans += ((i, j)); i = j
          case _ => i += 1
        }
      }
      spans.toSeq
    }

    /** Quote-guarded regex rewrite: matches starting inside any quoted
      * span are left byte-identical. */
    private def replaceTopLevel(text: String, re: scala.util.matching.Regex)(
        f: scala.util.matching.Regex.Match => String): String = {
      val spans = quotedSpans(text)
      def quoted(pos: Int) = spans.exists(s => pos >= s._1 && pos < s._2)
      re.replaceAllIn(text, m =>
        if (quoted(m.start)) java.util.regex.Matcher.quoteReplacement(m.matched)
        else java.util.regex.Matcher.quoteReplacement(f(m)))
    }

    /** Temp-view name for a pinned snapshot: keeps the schema qualifier
      * (dots → underscores) so `a.t` and `b.t` pinned in one statement
      * never collide on one view. */
    private def pinnedViewName(table: String, tag: String): String =
      table.replace('.', '_') + tag

    /** A timestamp text bound at the SESSION zone, exactly how every
      * other timestamp literal in a statement binds (the repo's mains
      * set UTC; a host session on another zone must not read a shifted
      * instant). Shared by the FOR TIMESTAMP AS OF read rewrite and
      * RESTORE … TO TIMESTAMP AS OF. */
    private def sessionMillis(ts: String): Long = {
      val ldt =
        if (ts.contains(" ") || ts.contains("T"))
          java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
        else java.time.LocalDate.parse(ts).atStartOfDay()
      val zone = java.time.ZoneId.of(
        spark.conf.get("spark.sql.session.timeZone"))
      ldt.atZone(zone).toInstant.toEpochMilli
    }

    private def rewriteTimestampAsOf(text: String): String = {
      if (!"(?i)FOR\\s+TIMESTAMP\\s+AS\\s+OF".r.findFirstIn(text).isDefined) return text
      replaceTopLevel(text, timestampAsOfRe) { m =>
        val table = m.group(1)
        val millis = sessionMillis(m.group(2))
        val loc = parquetLocation(table, "FOR TIMESTAMP AS OF")
        val view = pinnedViewName(table, s"__t$millis")
        sources.MorDelete.readAtTime(spark, loc, millis).createOrReplaceTempView(view)
        view
      }
    }

    private def rewriteVersionAsOf(text: String): String = {
      if (!"(?i)FOR\\s+VERSION\\s+AS\\s+OF".r.findFirstIn(text).isDefined) return text
      replaceTopLevel(text, versionAsOfRe) { m =>
        val table = m.group(1)
        val seq = m.group(2).toLong
        val loc = parquetLocation(table, "FOR VERSION AS OF")
        val view = pinnedViewName(table, s"__v$seq")
        sources.MorDelete.readAt(spark, loc, seq).createOrReplaceTempView(view)
        view
      }
    }

    /** Reference `DESCRIBE INPUT name` (sql/rewrite/DescribeInputRewrite
      * .java:114-131): one (Position, Type) row per `?` parameter of the
      * prepared statement, ordered by position; zero rows when the
      * statement has no parameters. Divergence: the reference infers a
      * coerced type per parameter where the analysis determines one and
      * falls back to 'unknown'; this engine does not run type inference
      * over parameter markers, so every position reports 'unknown' (a
      * value the reference's own clients must already handle).
      */
    private def describeInput(name: String): DataFrame = {
      import spark.implicits._
      val body = stmts.getOrElse(name, notFound(name))
      (1 to countParams(body)).map(p => (p.toLong, "unknown"))
        .toDF("Position", "Type")
    }

    /** Reference `DESCRIBE OUTPUT name` (DescribeOutputRewrite.java:116
      * -126 — columns Column Name, Catalog, Schema, Table, Type, Type
      * Size, Aliased). The output schema comes from ANALYZING the
      * prepared body with parameter markers bound to NULL (type-only —
      * nothing executes). Type Size follows the reference's
      * FixedWidthType rule (bytes for fixed-width types, 0 otherwise);
      * Catalog/Schema/Table provenance and the Aliased flag are not
      * tracked through Spark's schema and report NULL (documented
      * divergence).
      */
    private def describeOutput(name: String): DataFrame = {
      import spark.implicits._
      val body = stmts.getOrElse(name, notFound(name))
      val sb = new StringBuilder(body)
      paramPositions(body).reverse.foreach(p => sb.replace(p, p + 1, "NULL"))
      val schema = PrestoSql.sql(spark, sb.toString).schema
      import org.apache.spark.sql.types._
      def prestoName(dt: DataType): String = dt match {
        case StringType => "varchar"
        case IntegerType => "integer"
        case FloatType => "real"
        case BinaryType => "varbinary"
        case other => other.simpleString
      }
      def fixedSize(dt: DataType): Long = dt match {
        case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
        case IntegerType | FloatType | DateType => 4L
        case ShortType => 2L
        case BooleanType | ByteType => 1L
        case d: DecimalType if d.precision <= 18 => 8L
        case _: DecimalType => 16L
        case _ => 0L
      }
      schema.fields.toSeq
        .map(f => (f.name, null.asInstanceOf[String], null.asInstanceOf[String],
          null.asInstanceOf[String], prestoName(f.dataType), fixedSize(f.dataType),
          null.asInstanceOf[java.lang.Boolean]))
        .toDF("Column Name", "Catalog", "Schema", "Table", "Type", "Type Size",
          "Aliased")
    }

    /** Reference `SHOW STATS FOR t` (sql/rewrite/ShowStatsRewrite.java:217
      * — columns column_name, data_size, distinct_values_count,
      * nulls_fraction, row_count, low_value, high_value; one row per
      * visible column with NULL row_count, plus a summary row carrying
      * only row_count). The reference serves STORED statistics; this
      * engine computes them live in ONE aggregation pass over the table —
      * same shape, values as fresh as the data, exact where the reference
      * may be estimated. Unsupported (nested/binary) column types get the
      * reference's empty stats row.
      */
    private def showStatsOf(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val fields = df.schema.fields.toSeq
      def supported(dt: DataType): Boolean = dt match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      }
      val aggs = fields.filter(f => supported(f.dataType)).flatMap { f =>
        val c = col(f.name)
        val ds =
          if (f.dataType == StringType) sum(octet_length(c)).cast("double")
          else lit(null).cast("double")
        Seq(
          ds.as(s"__ds_${f.name}"),
          count_distinct(c).cast("double").as(s"__ndv_${f.name}"),
          count(when(c.isNull, 1)).cast("double").as(s"__nn_${f.name}"),
          min(c).cast("string").as(s"__lo_${f.name}"),
          max(c).cast("string").as(s"__hi_${f.name}"))
      } :+ count(lit(1)).cast("double").as("__rc")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val nullD = lit(null).cast("double")
      val nullS = lit(null).cast("string")
      val rows = fields.map { f =>
        if (supported(f.dataType))
          struct(lit(f.name).as("column_name"),
            col(s"__ds_${f.name}").as("data_size"),
            col(s"__ndv_${f.name}").as("distinct_values_count"),
            when(col("__rc") > 0, col(s"__nn_${f.name}") / col("__rc"))
              .as("nulls_fraction"),
            nullD.as("row_count"),
            col(s"__lo_${f.name}").as("low_value"),
            col(s"__hi_${f.name}").as("high_value"))
        else
          struct(lit(f.name).as("column_name"), nullD.as("data_size"),
            nullD.as("distinct_values_count"), nullD.as("nulls_fraction"),
            nullD.as("row_count"), nullS.as("low_value"), nullS.as("high_value"))
      } :+ struct(nullS.as("column_name"), nullD.as("data_size"),
        nullD.as("distinct_values_count"), nullD.as("nulls_fraction"),
        col("__rc").as("row_count"), nullS.as("low_value"),
        nullS.as("high_value"))
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
    }

    def execute(name: String, argExprs: Seq[String]): DataFrame = {
      // prepared bodies take the same time-travel rewrite as direct
      // statements — EXECUTE must not silently read a different snapshot
      // surface than the identical text run directly. The rewrite runs at
      // EXECUTE time (the snapshot resolves when the query runs, not when
      // it was prepared), and on the literal-substitution path AFTER the
      // parameters bind, so `FOR VERSION AS OF ?` works there too.
      val raw = stmts.getOrElse(name, notFound(name))
      val want = countParams(raw)
      if (want != argExprs.length)
        throw new IllegalArgumentException(
          s"Incorrect number of parameters: expected $want but found ${argExprs.length}")
      if (argExprs.isEmpty) PrestoSql.sql(spark, rewriteTimeTravel(raw))
      else {
        // constant-fold the USING expressions in one no-scan SELECT
        val bound = spark.sql(s"SELECT ${argExprs.mkString(", ")}").head()
        val timeTravels =
          "(?i)FOR\\s+(?:VERSION|TIMESTAMP)\\s+AS\\s+OF".r.findFirstIn(raw).isDefined
        val body = raw
        if (withTiesRe.findFirstIn(body).isDefined || timeTravels) {
          // WITH TIES desugars on the ANALYZED plan (PrestoSql.sql), which
          // the positional-parameter API cannot reach — bind these bodies
          // by exact typed literals at the scanned `?` positions instead,
          // so EXECUTE ... USING and parameterless EXECUTE take the same
          // dialect path
          val sb = new StringBuilder(body)
          paramPositions(body).zip(bound.toSeq).reverse.foreach { case (p, v) =>
            sb.replace(p, p + 1, renderLiteral(v))
          }
          PrestoSql.sql(spark, rewriteTimeTravel(sb.toString))
        } else spark.sql(translate(rewriteTimeTravel(body)), bound.toSeq.toArray)
      }
    }

    /** One constant-folded USING value as exact SQL literal text. */
    private def renderLiteral(v: Any): String = v match {
      case null => "NULL"
      // Spark's default parser (unlike Presto's) interprets backslash
      // escapes in string literals, so backslashes must double BEFORE
      // quote-doubling or a value like "a\n" re-parses as a newline and a
      // trailing backslash eats the closing quote — keeping this path
      // bit-identical to the positional-parameter binding path.
      case s: String => "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
      case b: Boolean => if (b) "true" else "false"
      case b: java.math.BigDecimal =>
        s"CAST('${b.toPlainString}' AS DECIMAL(38,${b.scale.max(0).min(37)}))"
      case b: scala.math.BigDecimal => renderLiteral(b.bigDecimal)
      case d: java.sql.Date => s"DATE '$d'"
      case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
      case d: Double => s"CAST('$d' AS DOUBLE)"
      case f: Float => s"CAST('$f' AS FLOAT)"
      case n: Number => n.toString
      case other => throw new IllegalArgumentException(
        s"EXECUTE USING value of unsupported type ${other.getClass.getName}")
    }

    private def notFound(name: String): Nothing =
      throw new IllegalArgumentException(s"Prepared statement not found: $name")

    /** Positions of `?` markers outside string literals, double-quoted
      * identifiers, `--` line comments, and block comments (the
      * reference's lexer drops comments before parameters are counted —
      * a `?` inside one is text, not a marker).
      */
    private def paramPositions(sql: String): Seq[Int] = {
      val pos = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < sql.length) {
        sql.charAt(i) match {
          case '\'' =>
            i += 1
            while (i < sql.length && sql.charAt(i) != '\'') i += 1
            i += 1
          case '"' =>
            i += 1
            while (i < sql.length && sql.charAt(i) != '"') i += 1
            i += 1
          case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
            while (i < sql.length && sql.charAt(i) != '\n') i += 1
          case '/' if i + 1 < sql.length && sql.charAt(i + 1) == '*' =>
            i += 2
            while (i + 1 < sql.length &&
              !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
            i += 2
          case '?' => pos += i; i += 1
          case _ => i += 1
        }
      }
      pos.toSeq
    }

    private def countParams(sql: String): Int = paramPositions(sql).length

    /** Split `USING a, b, c` on top-level commas (quotes and parens bind). */
    private def splitTopLevel(s: String): Seq[String] = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '\'' =>
            val end = skipLiteral(s, i)
            cur.append(s.substring(i, math.min(end, s.length)))
            i = end - 1
          case '(' => depth += 1; cur.append(c)
          case ')' => depth -= 1; cur.append(c)
          case ',' if depth == 0 => parts += cur.toString.trim; cur.clear()
          case _ => cur.append(c)
        }
        i += 1
      }
      if (cur.toString.trim.nonEmpty) parts += cur.toString.trim
      parts.toSeq
    }

    /** Skip one string literal starting at `i` (which points at the
      * opening quote), honoring SQL '' escapes; returns the index just
      * past the closing quote. */
    private def skipLiteral(s: String, i0: Int): Int = {
      var i = i0 + 1
      while (i < s.length) {
        if (s.charAt(i) == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2 // '' escape
          else return i + 1
        } else i += 1
      }
      i
    }

    /** Index of the top-level `=` of one SET assignment (quotes — with ''
      * escapes — and parens bind, so `c = coalesce(x, '=')` splits at the
      * first `=`). */
    private def topLevelEq(s: String): Int = {
      var depth = 0; var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' => i = skipLiteral(s, i) - 1
          case '(' => depth += 1
          case ')' => depth -= 1
          case '=' if depth == 0 => return i
          case _ =>
        }
        i += 1
      }
      -1
    }

    /** Index of the first TOP-LEVEL, whitespace-delimited occurrence of
      * `word` (case-insensitive) — the same quote/paren-aware walk as
      * [[topLevelEq]], so `SET c = ' WHERE '` never splits inside the
      * literal. Returns −1 when absent. */
    private def topLevelKeyword(s: String, word: String): Int = {
      var depth = 0; var i = 0
      val n = word.length
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' => i = skipLiteral(s, i) - 1
          case '"' =>
            i += 1
            while (i < s.length && s.charAt(i) != '"') i += 1
          case '(' => depth += 1
          case ')' => depth -= 1
          case c if depth == 0 && Character.toUpperCase(c) == word.charAt(0) &&
              i + n <= s.length && s.substring(i, i + n).equalsIgnoreCase(word) &&
              (i == 0 || s.charAt(i - 1).isWhitespace) &&
              (i + n == s.length || s.charAt(i + n).isWhitespace) =>
            return i
          case _ =>
        }
        i += 1
      }
      -1
    }

    /** ANSI `MERGE INTO target [AS t] USING source|(subquery) [AS] s ON
      * t.k = s.k [AND …] WHEN …` routed onto the row-level engines —
      * Presto 323's grammar has no MERGE, so the whole statement exceeds
      * the reference surface (like UPDATE). Supported clause shapes:
      *
      *  - `WHEN MATCHED [AND cond] THEN DELETE`
      *  - `WHEN MATCHED [AND cond] THEN UPDATE SET c = expr, …`
      *  - `WHEN NOT MATCHED THEN INSERT [*]` (the source row inserts;
      *    project the shape you want in the USING subquery — strictly
      *    more expressive than a VALUES list, which is refused)
      *
      * Conditions and SET expressions reference the target's columns
      * through its alias/name (or bare) and the source's through its
      * alias — rewritten onto the engines' `src_` convention with the
      * quote-aware scanner. ON must be a conjunction of qualified
      * equalities; a source key named differently is renamed to the
      * target's. MoR-mode tables take the full clause surface through
      * [[graft.sources.MorUpsert.merge]] (SET via its ANSI `updateSet`
      * projection); plain tables take the classic unconditional
      * upsert shape through [[graft.sources.CowMerge]] — conditional or
      * DELETE clauses there are refused with guidance, because CoW has
      * no sequencing to express them atomically.
      */
    private def mergeStatement(table: String, alias: Option[String],
        rest: String): DataFrame = {
      import spark.implicits._
      import org.apache.spark.sql.functions.{expr, lit}
      val loc = parquetLocation(table, "MERGE")
      val onIdx = topLevelKeyword(rest, "ON")
      require(onIdx >= 0, "MERGE needs an ON clause")
      val (srcRaw, srcAlias) = parseMergeSource(rest.substring(0, onIdx).trim)
      val tail = rest.substring(onIdx + 2)
      val whenIdx = topLevelKeyword(tail, "WHEN")
      require(whenIdx >= 0, "MERGE needs at least one WHEN clause")
      val onText = tail.substring(0, whenIdx).trim
      val bare = table.split('.').last
      val tQuals = Set(alias.getOrElse(bare), bare, table).map(_.toLowerCase)
      val sQuals = Set(srcAlias.toLowerCase)
      require((tQuals & sQuals).isEmpty,
        s"MERGE target and source aliases collide: ${(tQuals & sQuals).mkString(", ")}")

      // ON: a conjunction of qualified equalities → key columns (target
      // names) + source-side renames
      val keyPairs = splitOnTopLevelAnd(onText).map { c =>
        val eq = topLevelEq(c)
        require(eq > 0, s"MERGE ON supports conjunctions of equalities; got: $c")
        def side(s: String): (String, String) = {
          val m = "(?s)^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*$"
            .r.findFirstMatchIn(s)
          require(m.isDefined, s"MERGE ON sides must be alias-qualified columns; got: $s")
          (m.get.group(1).toLowerCase, m.get.group(2))
        }
        val (lq, lc) = side(c.substring(0, eq))
        val (rq, rc) = side(c.substring(eq + 1))
        if (tQuals(lq) && sQuals(rq)) lc -> rc
        else if (sQuals(lq) && tQuals(rq)) rc -> lc
        else throw new IllegalArgumentException(
          s"MERGE ON equality must pair the target with the source: $c")
      }
      val keyCols = keyPairs.map(_._1)
      val source = keyPairs.foldLeft(srcRaw) { case (df, (t, s)) =>
        if (t == s) df
        else {
          require(!df.columns.contains(t),
            s"cannot rename source key '$s' to '$t': the source already has a '$t'")
          df.withColumnRenamed(s, t)
        }
      }

      // clauses
      val delClauseRe = "(?is)^WHEN\\s+MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+DELETE\\s*$".r
      val updClauseRe = "(?is)^WHEN\\s+MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+UPDATE\\s+SET\\s+(.+)$".r
      val insClauseRe = "(?is)^WHEN\\s+NOT\\s+MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+INSERT\\s*(?:\\*)?\\s*$".r
      // source-qualified KEY references resolve to the bare key column:
      // the engines keep key columns unprefixed on the (target, src_)
      // pair — legal because ON equality makes them equal there — and a
      // source key named differently (s.nid) maps through its rename
      val srcKeyMap = keyPairs.map { case (t, s) => s -> t }.toMap ++
        keyPairs.map { case (t, _) => t -> t }.toMap
      def cond(text: String): org.apache.spark.sql.Column =
        expr(PrestoSql.translate(rewriteRefs(text, tQuals, sQuals, srcKeyMap)))
      var delWhen: Option[Option[org.apache.spark.sql.Column]] = None
      var updWhen: Option[Option[org.apache.spark.sql.Column]] = None
      var updSets: Seq[(String, org.apache.spark.sql.Column)] = Nil
      var hasInsert = false
      splitClauses(tail.substring(whenIdx)).foreach {
        case t @ delClauseRe(c) =>
          require(delWhen.isEmpty, s"duplicate DELETE clause: $t")
          delWhen = Some(Option(c).map(cond))
        case t @ updClauseRe(c, sets) =>
          require(updWhen.isEmpty, s"duplicate UPDATE clause: $t")
          updWhen = Some(Option(c).map(cond))
          updSets = splitTopLevel(sets).map { a =>
            val eq = topLevelEq(a)
            require(eq > 0, s"malformed SET assignment: $a")
            val name = {
              val raw = a.substring(0, eq).trim.stripPrefix("\"").stripSuffix("\"")
              // a target-qualified assignment name (t.c = …) is legal ANSI
              val m = "(?s)^([A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*(.+)$".r.findFirstMatchIn(raw)
              m.filter(x => tQuals(x.group(1).toLowerCase)).map(_.group(2).trim).getOrElse(raw)
            }
            name -> cond(a.substring(eq + 1).trim)
          }
        case t @ insClauseRe(c) =>
          require(c == null, s"conditional INSERT clauses are not supported " +
            s"(filter the USING subquery instead): $t")
          hasInsert = true
        case other => throw new IllegalArgumentException(
          s"unsupported MERGE clause: $other")
      }
      require(delWhen.nonEmpty || updWhen.nonEmpty || hasInsert,
        "MERGE needs at least one WHEN clause")

      val n =
        if (morMode(loc)) {
          val st = sources.MorUpsert.merge(spark, loc, source, keyCols,
            deleteWhen = delWhen.map(_.getOrElse(lit(true))),
            // absent UPDATE clause = update NOTHING (MorUpsert's None
            // means the opposite: unconditionally update every match)
            updateWhen = if (updWhen.isEmpty) Some(lit(false)) else updWhen.get,
            insertUnmatched = hasInsert,
            updateSet = if (updSets.nonEmpty) Some(updSets) else None)
          resolveMorView(table, loc)
          st.keysDeleted + st.keysUpdated + st.rowsInserted
        } else {
          require(delWhen.isEmpty && updWhen.forall(_.isEmpty),
            s"MERGE with DELETE or conditional clauses needs a merge-on-read " +
              s"table (sequenced tombstones); '$table' is plain parquet — use " +
              "the unconditional UPDATE SET / INSERT shape, or move the table " +
              "to MoR mode (any MorDelete/MorUpsert mutation does)")
          // row counts for the statement result come from two bounded
          // pre-counts (MERGE is new surface; CowMerge's stats count files)
          val target = spark.table(table)
          val updRows =
            if (updWhen.isDefined)
              target.join(source.select(keyCols.map(org.apache.spark.sql.functions.col): _*),
                keyCols, "left_semi").count()
            else 0L
          val insRows =
            if (hasInsert)
              source.join(target.select(keyCols.map(org.apache.spark.sql.functions.col): _*),
                keyCols, "left_anti").count()
            else 0L
          if (updWhen.isDefined)
            sources.CowMerge.merge(spark, loc, source, keyCols, updSets, hasInsert)
          else sources.CowMerge.insertOnly(spark, loc, source, keyCols)
          updRows + insRows
        }
      spark.catalog.refreshTable(table)
      Seq(n).toDF("rows")
    }

    /** `USING (subquery) [AS] alias` or `USING name [[AS] alias]`. */
    private def parseMergeSource(srcText: String): (DataFrame, String) = {
      if (srcText.startsWith("(")) {
        val close = matchParen(srcText, 0)
        require(close > 0, s"unbalanced parentheses in MERGE USING: $srcText")
        val inner = srcText.substring(1, close)
        val aliasToks = srcText.substring(close + 1).trim
          .split("\\s+").toSeq.filter(_.nonEmpty).filterNot(_.equalsIgnoreCase("AS"))
        require(aliasToks.size == 1 && aliasToks.head.matches("[A-Za-z_][A-Za-z0-9_]*"),
          "MERGE USING (subquery) needs an alias")
        (PrestoSql.sql(spark, rewriteTimeTravel(inner)), aliasToks.head)
      } else {
        val toks = srcText.split("\\s+").toSeq.filter(_.nonEmpty)
          .filterNot(_.equalsIgnoreCase("AS"))
        require(toks.nonEmpty && toks.size <= 2,
          s"cannot parse MERGE USING source: $srcText")
        val alias = if (toks.size == 2) toks(1) else toks.head.split('.').last
        (spark.table(toks.head), alias)
      }
    }

    /** Index of the ')' matching the '(' at `open` (quote-aware). */
    private def matchParen(s: String, open: Int): Int = {
      var depth = 0; var i = open
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' => i = skipLiteral(s, i) - 1
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }

    /** Split on every top-level `AND` (quote/paren-aware). */
    private def splitOnTopLevelAnd(s: String): Seq[String] = {
      var parts = Vector.empty[String]
      var restS = s
      var idx = topLevelKeyword(restS, "AND")
      while (idx >= 0) {
        parts :+= restS.substring(0, idx)
        restS = restS.substring(idx + 3)
        idx = topLevelKeyword(restS, "AND")
      }
      (parts :+ restS).map(_.trim).filter(_.nonEmpty)
    }

    /** Split the `WHEN … [WHEN …]…` tail into one string per clause. */
    private def splitClauses(s: String): Seq[String] = {
      var parts = Vector.empty[String]
      var cur = s
      var next = topLevelKeyword(cur.substring(4), "WHEN") // skip the leading WHEN
      while (next >= 0) {
        parts :+= cur.substring(0, next + 4).trim
        cur = cur.substring(next + 4)
        next = topLevelKeyword(cur.substring(4), "WHEN")
      }
      parts :+ cur.trim
    }

    /** Rewrite alias-qualified column references onto the engines'
      * convention — target quals drop, source quals become the `src_`
      * prefix (except key columns, which stay bare and map through any
      * ON rename) — outside string literals. */
    private def rewriteRefs(text: String, tQuals: Set[String],
        sQuals: Set[String], srcKeyMap: Map[String, String] = Map.empty): String = {
      val qualRe = "([A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*([A-Za-z_][A-Za-z0-9_]*)".r
      val out = new StringBuilder
      var i = 0
      while (i < text.length) {
        if (text.charAt(i) == '\'') {
          val e = math.min(skipLiteral(text, i), text.length)
          out.append(text.substring(i, e)); i = e
        } else {
          val next = text.indexOf('\'', i)
          val seg = if (next < 0) text.substring(i) else text.substring(i, next)
          out.append(qualRe.replaceAllIn(seg, m => {
            val q = m.group(1).toLowerCase
            if (tQuals(q)) m.group(2)
            else if (sQuals(q)) srcKeyMap.getOrElse(m.group(2), "src_" + m.group(2))
            else java.util.regex.Matcher.quoteReplacement(m.matched)
          }))
          i = if (next < 0) text.length else next
        }
      }
      out.toString
    }

    /** A location lives in merge-on-read mode when it carries snapshot
      * manifests or a live tombstone sidecar — then SQL DML must route
      * through the MoR engines (direct CoW would bypass the manifests)
      * and reads through the resolved view. */
    private def morMode(loc: String): Boolean =
      sources.MorDelete.isManaged(loc) ||
        sources.MorDelete.sidecarKeyCols(spark, loc).isDefined

    /** Surface the MoR-resolved view to the SQL session: a temp view
      * under the table's (unqualified) name shadows the catalog table in
      * resolution, so subsequent SELECT statements read tombstone-applied
      * rows — the reference's reads-see-the-snapshot contract without a
      * catalog that understands sidecars. */
    private def resolveMorView(table: String, loc: String): Unit = {
      val bare = table.split('.').last
      sources.MorDelete.read(spark, loc).createOrReplaceTempView(bare)
    }

    /** Resolve a catalog table to the parquet directory the CoW engines
      * rewrite; anything but a parquet-provider table is refused loudly
      * (the reference's connectors opt into row-level DML the same way —
      * `UpdatablePageSource` is per-connector).
      */
    private def parquetLocation(table: String, stmt: String): String = {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val meta = spark.sessionState.catalog.getTableMetadata(id)
      require(meta.provider.exists(_.equalsIgnoreCase("parquet")),
        s"$stmt routes through the copy-on-write parquet engine; table '$table' " +
          s"has provider ${meta.provider.getOrElse("<none>")}")
      // the CoW engines stage and swap through java.nio (local paths); a
      // remote location must go through its table format's own DML
      require(meta.location.getScheme == null || meta.location.getScheme == "file",
        s"$stmt's copy-on-write engine operates on local-filesystem tables; " +
          s"'$table' lives at ${meta.location}")
      java.nio.file.Paths.get(meta.location).toString
    }
  }
}
