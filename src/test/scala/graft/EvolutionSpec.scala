package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{Evolution, Layout, Maintenance, MorDelete, MorUpsert}

/** Metadata-only schema evolution (sources/Evolution.scala): ADD / RENAME
  * / DROP COLUMN over the manifest protocol without touching a data file,
  * epoch-grouped reads across renames, time-travel-correct historical
  * schemas, the retirement rules that keep old physical values from
  * resurfacing, and the physical-migration path that clears the log.
  */
class EvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fresh(): String = {
    val loc = Files.createTempDirectory("graft_evo").toString + "/t"
    val sp = spark; import sp.implicits._
    (1 to 60).map(i => (i.toLong, s"a$i", i * 1.5)).toDF("k", "a", "b")
      .repartition(3).write.parquet(loc)
    loc
  }

  private def files(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("add column touches zero files; old rows read NULL; new files carry values") {
    val loc = fresh()
    val before = files(loc)
    val preSeq = MorDelete.currentSeq(spark, loc)
    Evolution.addColumn(spark, loc, "c", "double")
    assert(files(loc) == before, "ADD COLUMN must be metadata-only")

    val r = MorDelete.read(spark, loc)
    assert(r.columns.toSeq == Seq("k", "a", "b", "c"))
    assert(r.schema("c").dataType == org.apache.spark.sql.types.DoubleType)
    assert(r.filter(col("c").isNotNull).isEmpty)

    // rows appended after the add carry the column physically
    val sp = spark; import sp.implicits._
    val src = Seq((1L, "a1", 1.5, 100.0), (1000L, "new", 0.0, 200.0))
      .toDF("k", "a", "b", "c")
    MorUpsert.upsert(spark, loc, src, Seq("k"))
    val got = MorDelete.read(spark, loc)
    assert(got.count() == 61)
    assert(got.filter(col("c").isNotNull).select("k").collect()
      .map(_.getLong(0)).toSet == Set(1L, 1000L))

    // time travel resolves the PRE-ADD manifest and with it the old schema
    assert(MorDelete.readAt(spark, loc, preSeq).columns.toSeq == Seq("k", "a", "b"))
  }

  test("rename maps old physical names across epochs, transitively") {
    val loc = fresh()
    val preSeq = MorDelete.currentSeq(spark, loc)
    Evolution.renameColumn(spark, loc, "a", "label")
    val r1 = MorDelete.read(spark, loc)
    assert(r1.columns.toSeq == Seq("k", "label", "b"))
    assert(r1.filter(col("label") === "a7").count() == 1)

    // a post-rename append writes the NEW physical name; both epochs union
    val sp = spark; import sp.implicits._
    MorUpsert.upsert(spark, loc,
      Seq((7L, "renamed7", 7.0), (2000L, "fresh", 2.0)).toDF("k", "label", "b"),
      Seq("k"))
    val r2 = MorDelete.read(spark, loc)
    assert(r2.count() == 61)
    assert(r2.filter(col("k") === 7).select("label").head().getString(0) == "renamed7")
    assert(r2.filter(col("k") === 8).select("label").head().getString(0) == "a8")

    // chained rename: base files resolve through BOTH hops
    Evolution.renameColumn(spark, loc, "label", "tag")
    val r3 = MorDelete.read(spark, loc)
    assert(r3.columns.toSeq == Seq("k", "tag", "b"))
    assert(r3.filter(col("k") === 8).select("tag").head().getString(0) == "a8")
    assert(r3.filter(col("k") === 2000).select("tag").head().getString(0) == "fresh")

    // the historical schema is the historical NAME
    assert(MorDelete.readAt(spark, loc, preSeq).columns.toSeq == Seq("k", "a", "b"))
  }

  test("drop projects away; retired names refuse re-use until migration") {
    val loc = fresh()
    Evolution.dropColumn(spark, loc, "a")
    assert(MorDelete.read(spark, loc).columns.toSeq == Seq("k", "b"))

    // re-adding a dropped name would resurface old physical values
    val e1 = intercept[IllegalArgumentException](
      Evolution.addColumn(spark, loc, "a", "string"))
    assert(e1.getMessage.contains("resurface") || e1.getMessage.contains("retired")
      || e1.getMessage.contains("previously"))
    // renaming ONTO a retired name refuses the same way
    val e2 = intercept[IllegalArgumentException](
      Evolution.renameColumn(spark, loc, "b", "a"))
    assert(e2.getMessage.contains("previously"))
    // unknown columns refuse loudly
    intercept[IllegalArgumentException](Evolution.dropColumn(spark, loc, "nope"))
    intercept[IllegalArgumentException](Evolution.renameColumn(spark, loc, "nope", "x"))
    // a duplicate add refuses
    intercept[IllegalArgumentException](Evolution.addColumn(spark, loc, "b", "int"))
  }

  test("live sidecar key columns cannot be renamed or dropped") {
    val loc = fresh()
    MorDelete.delete(spark, loc, col("k") === 5, Seq("k"))
    val e = intercept[IllegalArgumentException](
      Evolution.renameColumn(spark, loc, "k", "id"))
    assert(e.getMessage.contains("compact"))
    intercept[IllegalArgumentException](Evolution.dropColumn(spark, loc, "k"))
    // non-key columns still evolve freely beside live tombstones
    Evolution.renameColumn(spark, loc, "a", "label")
    assert(MorDelete.read(spark, loc).columns.toSeq == Seq("k", "label", "b"))
    assert(MorDelete.read(spark, loc).count() == 59)
    // once the tombstones fold in, the key column is renameable
    Layout.rewriteFiles(spark, loc)
    Evolution.renameColumn(spark, loc, "k", "id")
    assert(MorDelete.read(spark, loc).columns.toSeq == Seq("id", "label", "b"))
  }

  test("compact and analyze suspend under pending evolution; rewriteFiles migrates") {
    val loc = fresh()
    MorDelete.delete(spark, loc, col("k") % 10 === 0, Seq("k"))
    Evolution.addColumn(spark, loc, "c", "bigint")
    val ec = intercept[IllegalArgumentException](MorDelete.compact(spark, loc))
    assert(ec.getMessage.contains("OPTIMIZE"))
    val ea = intercept[IllegalArgumentException](Maintenance.analyze(spark, loc))
    assert(ea.getMessage.contains("OPTIMIZE"))
    // the maintenance policy SKIPS rather than throws
    val ms = Maintenance.maintain(spark, loc, compactAt = 0.0)
    assert(!ms.compacted && !ms.statsRefreshed)

    val want = MorDelete.read(spark, loc).orderBy("k")
      .collect().map(_.toSeq).toSeq
    val n = Layout.rewriteFiles(spark, loc, nFiles = 2)
    assert(n == 2L)
    val st = MorDelete.liveState(spark, loc)
    assert(st.schemaLog.isEmpty && st.schema.map(_._1) == Seq("k", "a", "b", "c"))
    assert(st.batches.isEmpty, "the migration folds tombstones too")
    assert(MorDelete.read(spark, loc).orderBy("k")
      .collect().map(_.toSeq).toSeq == want, "migration must be view-identical")
    // uniform-schema operations re-engage, retired names free up
    assert(Maintenance.analyze(spark, loc) > 0)
    MorDelete.delete(spark, loc, col("k") === 1, Seq("k"))
    MorDelete.compact(spark, loc)
    Evolution.dropColumn(spark, loc, "c")
    Layout.rewriteFiles(spark, loc)
    Evolution.addColumn(spark, loc, "c", "string")
    assert(MorDelete.read(spark, loc).filter(col("c").isNotNull).isEmpty)
  }

  test("partitioned layout: data columns evolve, partition columns refuse, migration keeps the layout") {
    val loc = Files.createTempDirectory("graft_evo_part").toString + "/t"
    val sp = spark; import sp.implicits._
    (1 to 120).map(i => (i.toLong, s"a$i", i * 1.5, (i % 4) + 1))
      .toDF("k", "a", "b", "m")
      .repartition(2).write.partitionBy("m").parquet(loc)
    MorDelete.delete(spark, loc, col("k") % 10 === 0, Seq("k"))
    val preSeq = MorDelete.currentSeq(spark, loc)
    val before = files(loc)

    // ADD on a partitioned table is as metadata-only as on a flat one:
    // the op touches footers (none), the partition column rides along in
    // the logical schema with its path-inferred type
    Evolution.addColumn(spark, loc, "c", "double")
    assert(files(loc) == before, "ADD COLUMN must be metadata-only")
    val r = MorDelete.read(spark, loc)
    assert(r.columns.toSeq == Seq("k", "a", "b", "c", "m"))
    assert(r.schema("m").dataType == org.apache.spark.sql.types.IntegerType)
    assert(r.filter(col("c").isNotNull).isEmpty && r.count() == 108)

    // a mid-evolution upsert writes post-images INTO their col=value
    // directory — never flat — so the layout invariant holds at every
    // commit, not just at rest
    MorUpsert.upsert(spark, loc,
      Seq((1000L, "x", 9.9, 2, 7.7)).toDF("k", "a", "b", "m", "c"), Seq("k"))
    val newFiles = files(loc).keySet -- before.keySet
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("m=2")),
      s"post-images must land in partition dirs:\n${newFiles.mkString("\n")}")

    // RENAME + DROP of data columns beside the partition column
    Evolution.renameColumn(spark, loc, "a", "label")
    Evolution.dropColumn(spark, loc, "b")
    val r2 = MorDelete.read(spark, loc)
    assert(r2.columns.toSeq == Seq("k", "label", "c", "m"))
    assert(r2.filter(col("k") === 7).select("label").head().getString(0) == "a7")

    // the PARTITION column itself stays immutable — loudly
    val er = intercept[IllegalArgumentException](
      Evolution.renameColumn(spark, loc, "m", "month"))
    assert(er.getMessage.contains("partition-directory"))
    val ed = intercept[IllegalArgumentException](
      Evolution.dropColumn(spark, loc, "m"))
    assert(ed.getMessage.contains("partition-directory"))
    intercept[IllegalArgumentException](Evolution.addColumn(spark, loc, "m", "int"))

    // partition-value pruning works MID-evolution (path bounds need no
    // stats and no uniform schema)
    val st = MorDelete.liveState(spark, loc)
    val kept = MorDelete.pruneByStats(spark, st, col("m") === 2)
    assert(kept.nonEmpty && kept.size < st.dataFiles.size &&
      kept.forall(_.contains("m=2")))
    val oracle2 = r2.filter(col("m") === 2).select("k")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(MorDelete.readWhere(spark, loc, col("m") === 2).select("k")
      .collect().map(_.getLong(0)).toSeq.sorted == oracle2)

    // time travel across the evolution boundary is schema-correct
    assert(MorDelete.readAt(spark, loc, preSeq).columns.toSeq ==
      Seq("k", "a", "b", "m"))

    // migration RE-MATERIALIZES into col=value dirs: log cleared, every
    // live file still partition-pathed, view identical
    val want = r2.orderBy("k").collect().map(_.toSeq).toSeq
    Layout.rewriteFiles(spark, loc)
    val stM = MorDelete.liveState(spark, loc)
    assert(stM.schemaLog.isEmpty, "migration must clear the evolution log")
    assert(stM.dataFiles.forall(_.contains("m=")),
      s"migrated files must keep the partition layout:\n${stM.dataFiles.mkString("\n")}")
    assert(MorDelete.read(spark, loc).orderBy("k")
      .collect().map(_.toSeq).toSeq == want, "migration must be view-identical")
    // the migrated footers carry the LOGICAL data schema, partition col in paths only
    assert(spark.read.parquet(stM.dataFiles.head).schema.fieldNames.toSeq
      == Seq("k", "label", "c"))

    // uniform-schema machinery re-engages on the migrated table:
    // analyze publishes, the planner-path partition pruning is back
    Maintenance.analyze(spark, loc)
    val oracle3 = MorDelete.readIgnoringStats(spark, loc)
      .filter(col("m") === 3).select("k").collect().map(_.getLong(0)).toSeq.sorted
    assert(MorDelete.read(spark, loc).filter(col("m") === 3).select("k")
      .collect().map(_.getLong(0)).toSeq.sorted == oracle3)
    // a fresh evolution round still works on the migrated layout
    Evolution.addColumn(spark, loc, "d", "string")
    assert(MorDelete.read(spark, loc).columns.toSeq ==
      Seq("k", "label", "c", "d", "m"))
  }

  test("published stats follow renames and drops; pruning works on the new name") {
    val loc = fresh()
    MorDelete.delete(spark, loc, col("k") === 999, Seq("k")) // enter the protocol
    assert(Maintenance.analyze(spark, loc, Seq("k", "b")) > 0)
    Evolution.renameColumn(spark, loc, "b", "bb")
    val st = MorDelete.liveState(spark, loc)
    assert(st.statCols == Seq("k", "bb"))
    assert(st.stats.values.flatten.map(_.col).toSet == Set("k", "bb"))
    // pruning under the NEW name still eliminates non-overlapping files —
    // and readWhere stays ≡ read().filter across the evolution
    val kept = MorDelete.pruneByStats(spark, st, col("k") <= 5)
    assert(kept.size < st.dataFiles.size)
    assert(MorDelete.readWhere(spark, loc, col("k") <= 5).count() ==
      MorDelete.read(spark, loc).filter(col("k") <= 5).count())
    Evolution.dropColumn(spark, loc, "bb")
    val st2 = MorDelete.liveState(spark, loc)
    assert(st2.statCols == Seq("k"))
    assert(st2.stats.values.flatten.map(_.col).toSet == Set("k"))
  }

  test("zorderRewrite also migrates an evolved table") {
    val loc = fresh()
    Evolution.renameColumn(spark, loc, "b", "value")
    val want = MorDelete.read(spark, loc).orderBy("k").collect().map(_.toSeq).toSeq
    Layout.zorderRewrite(spark, loc, Seq("k", "value"), nFiles = 4)
    val st = MorDelete.liveState(spark, loc)
    assert(st.schemaLog.isEmpty && st.schema.map(_._1) == Seq("k", "a", "value"))
    assert(MorDelete.read(spark, loc).orderBy("k")
      .collect().map(_.toSeq).toSeq == want)
  }

  test("CHECK constraints gate the manifest-managed write boundary") {
    val loc = fresh() // (k, a, b) with b = k * 1.5 ∈ [1.5, 90]
    val sp = spark; import sp.implicits._

    // existing data must already satisfy a new constraint
    val e0 = intercept[IllegalArgumentException](
      Evolution.addConstraint(spark, loc, "big_b", "b > 50"))
    assert(e0.getMessage.contains("existing"))
    // a multi-line CHECK body is legal SQL: interior whitespace
    // normalizes before the validation scan (the manifest is line-based)
    Evolution.addConstraint(spark, loc, "pos_b", "b >\n   0")
    assert(Evolution.tableConstraints(spark, loc) == Seq("pos_b" -> "b > 0"))

    // a violating batch refuses LOUDLY with nothing committed
    val ordBefore = MorDelete.manifests(loc).last.ordinal
    val viewBefore = MorDelete.read(spark, loc).orderBy("k").collect().toSeq
    val e1 = intercept[IllegalArgumentException](MorUpsert.upsert(spark, loc,
      Seq((5L, "bad", -1.0), (61L, "ok", 7.0)).toDF("k", "a", "b"), Seq("k")))
    assert(e1.getMessage.contains("pos_b") && e1.getMessage.contains("1 rows"))
    assert(MorDelete.manifests(loc).last.ordinal == ordBefore,
      "a refused batch must publish no manifest")
    assert(MorDelete.read(spark, loc).orderBy("k").collect().toSeq == viewBefore)

    // SQL CHECK semantics: NULL passes; a clean batch lands
    MorUpsert.upsert(spark, loc,
      Seq((62L, "nullb", Option.empty[Double]), (63L, "ok", Some(9.0)))
        .toDF("k", "a", "b"), Seq("k"))
    assert(MorDelete.read(spark, loc).filter(col("k") >= 62).count() == 2)

    // a referenced column refuses rename/drop until the constraint drops
    assert(intercept[IllegalArgumentException](
      Evolution.renameColumn(spark, loc, "b", "bb")).getMessage.contains("pos_b"))
    assert(intercept[IllegalArgumentException](
      Evolution.dropColumn(spark, loc, "b")).getMessage.contains("pos_b"))
    Evolution.dropConstraint(spark, loc, "pos_b")
    assert(Evolution.tableConstraints(spark, loc).isEmpty)
    MorUpsert.upsert(spark, loc,
      Seq((64L, "neg", -2.0)).toDF("k", "a", "b"), Seq("k"))
    assert(MorDelete.read(spark, loc).filter(col("b") < 0).count() == 1)
    Evolution.renameColumn(spark, loc, "b", "bb")

    // constraint commits classify as ALTER in the history
    val ops = MorDelete.history(spark, loc)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.count(_ == "ALTER") >= 3, s"got $ops")
  }

  test("CHECK normalization is quote-aware: literal spacing is semantics") {
    val loc = fresh()
    // whitespace runs collapse OUTSIDE quotes only — 'a  b' keeps its
    // two spaces (the r15 normalizer rewrote the literal itself)
    Evolution.addConstraint(spark, loc, "not_ab", "a   <>   'a  b'")
    assert(Evolution.tableConstraints(spark, loc) == Seq("not_ab" -> "a <> 'a  b'"))
    // '' escapes keep the scanner in-literal; trailing run still collapses
    Evolution.addConstraint(spark, loc, "esc", "a <> 'it''s   x'  OR   b > 0")
    assert(Evolution.tableConstraints(spark, loc).last ==
      ("esc" -> "a <> 'it''s   x' OR b > 0"))
    // a line delimiter INSIDE a literal cannot survive the line-oriented
    // manifest: refuse loudly instead of silently rewriting the predicate
    val e = intercept[IllegalArgumentException](
      Evolution.addConstraint(spark, loc, "nl", "a <> 'x\ny'"))
    assert(e.getMessage.contains("line delimiter"))
    assert(Evolution.tableConstraints(spark, loc).size == 2,
      "the refused constraint must not commit")
    // backslash escapes must not end the span early: Spark's parser
    // reads \' as an escaped quote, so the scanner must too — the
    // doubled spaces after it are INSIDE the literal and must survive
    Evolution.addConstraint(spark, loc, "bs", "a <> 'don\\'t   panic'  OR  b > 0")
    assert(Evolution.tableConstraints(spark, loc).last ==
      ("bs" -> "a <> 'don\\'t   panic' OR b > 0"))

    // under spark.sql.parser.escapedStringLiterals=true the backslash is
    // an ORDINARY character and \' really terminates the literal — the
    // scanner must follow the session's convention, or it would track a
    // phantom span and collapse whitespace inside a real literal
    val raw = "a <> 'x\\'  AND  b <> 'p  q'"
    // conf OFF (default): \' is an escaped quote, so the span runs
    // 'x\'  AND  b <> ' (its interior spacing preserved) and the tail
    // "p  q" sits OUTSIDE it — that run collapses
    assert(Evolution.normalizeConstraintText(raw, escapedStringLiterals = false)
      == "a <> 'x\\'  AND  b <> 'p q'")
    // conf ON: two literals 'x\' and 'p  q'; the run BETWEEN them
    // collapses, the interior of 'p  q' survives
    assert(Evolution.normalizeConstraintText(raw, escapedStringLiterals = true)
      == "a <> 'x\\' AND b <> 'p  q'")
  }

  test("snapshot reads, delete predicates, and merge all see the evolved schema") {
    val loc = fresh()
    Evolution.addColumn(spark, loc, "c", "double")
    val sp = spark; import sp.implicits._
    MorUpsert.upsert(spark, loc,
      Seq((3L, "x3", 3.0, 30.0)).toDF("k", "a", "b", "c"), Seq("k"))
    // DELETE with a predicate over the ADDED column (old rows: c IS NULL)
    MorDelete.delete(spark, loc, col("c") > 10, Seq("k"))
    val r = MorDelete.read(spark, loc)
    assert(r.count() == 59 && r.filter(col("k") === 3).isEmpty)
    // a merge source must match the LOGICAL columns, not the physical ones
    val e = intercept[IllegalArgumentException](MorUpsert.upsert(spark, loc,
      Seq((4L, "x4", 4.0)).toDF("k", "a", "b"), Seq("k")))
    assert(e.getMessage.contains("must match"))
  }
}
