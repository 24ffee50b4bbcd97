package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read row-level DML — the engine's answer to the measured
  * copy-on-write cliff (SCALE_r13 `cowdml`: a hash-scattered 1% delete
  * touches every file of a clustered table and rewrites 100× the deleted
  * bytes, because file-granular CoW cannot rewrite less than a file).
  *
  * Mechanism (the delete-vector side of every lakehouse format's
  * MoR mode — Iceberg equality deletes, Delta deletion vectors — applied
  * to a plain parquet directory):
  *
  *  1. DELETE writes only the matching rows' KEY COLUMNS to a tombstone
  *     sidecar (`<table>._mor_deletes/batch-<seq>-<uuid>/`, ordinary
  *     parquet). No table file is touched: write cost ∝ deleted keys,
  *     amplification ~0 by construction, regardless of how the deleted
  *     rows scatter.
  *  2. Reads go through [[MorDelete.read]]: the table LEFT ANTI JOIN the
  *     tombstone keys. The sidecar is small (deleted keys only) so AQE
  *     broadcasts the anti side; the scan itself is untouched — pushed
  *     filters and pruned schemas survive because the anti-join sits
  *     ABOVE the scan.
  *  3. [[MorDelete.compact]] folds the tombstones into the files via the
  *     CoW machinery (semi-join touched-file discovery, staged rewrite of
  *     touched files only) and clears the sidecar — amortizing the
  *     read-side join over one rewrite at a chosen time (the compaction
  *     scheduling every MoR format ships). A density threshold restricts
  *     the rewrite to files worth rewriting (see [[compact]]).
  *
  * Sequencing (what lets [[MorUpsert]] exist): each tombstone carries a
  * sequence number, each data file carries one in its NAME
  * (`part-morN-…`; base files and CoW stages parse to 0), and a tombstone
  * deletes only rows from files with a STRICTLY SMALLER sequence — the
  * Iceberg v2 sequence-number rule. An upsert tombstones its keys and
  * appends its replacement rows at the SAME sequence, so the new rows
  * survive their own tombstones while every older copy dies; a later
  * operation gets a higher sequence and supersedes them in turn. Plain
  * deletes take (max sequence) + 1, deleting everything current.
  *
  * Row identity: a plain parquet table has no row ids (same constraint
  * that shapes [[CowDelete]]), so tombstones are EQUALITY deletes on
  * caller-declared key columns — every row matching a tombstoned key
  * combination (at a lower sequence) is deleted, exactly Iceberg's
  * equality-delete contract. Callers with true row-level intent pass a
  * unique key. Delete predicates are evaluated against the MoR-RESOLVED
  * view (tombstones applied), never the raw files: after an upsert
  * changes a key's values, `DELETE WHERE <old value>` must not extract
  * that key from the superseded row and kill the live replacement — the
  * Iceberg/Delta contract that DML sees the current snapshot. The key
  * set is self-describing: the sidecar parquet's non-sequence columns
  * ARE the key columns, so reads and compaction need no separate
  * metadata file, and mixed key sets across batches are rejected loudly
  * at write time.
  *
  * Concurrency contract (the analog of the reference's commit point,
  * `presto-main/.../operator/TableFinishOperator.java`, without a
  * catalog to swap a snapshot pointer in):
  *
  *  - SINGLE WRITER, enforced: every mutation ([[delete]],
  *    [[MorUpsert.merge]], [[compact]]) takes an exclusive lock file
  *    (`<table>._mor_writer.lock`, atomic create). A second concurrent
  *    writer fails loudly instead of interleaving commits.
  *  - ATOMIC COMMIT per DML: a tombstone batch is staged under a
  *    dot-directory (invisible to Spark's file listing) and committed
  *    with ONE atomic directory rename to `batch-<seq>-<uuid>` — a
  *    reader sees all of a batch or none of it. [[MorUpsert.merge]]
  *    moves its replacement part files in BEFORE that rename, so its
  *    commit point is the batch rename too: a crash (or a read) between
  *    the two sees transient duplicates — never lost rows, the same
  *    crash discipline [[CowCore.moveIn]] documents.
  *  - SNAPSHOT READS across DML: [[readAt]] pins a read to sequence N
  *    (data files AND tombstone batches with sequence ≤ N), so a reader
  *    that captured [[currentSeq]] before a delete/merge sees the
  *    pre-DML rows no matter how many commits land meanwhile.
  *  - [[compact]] is the one non-reader-atomic operation (it physically
  *    replaces files, like Iceberg's rewrite-data-files without a
  *    snapshot pointer): readers overlapping a compaction can see
  *    transient DUPLICATES of surviving rows while staged parts move in,
  *    and compaction invalidates `readAt` snapshots older than its run.
  *    They can never see deleted rows resurface or replacements vanish:
  *    compacted parts carry the pre-compaction max sequence in their
  *    name, so the still-present tombstones are no-ops against them
  *    (spec-locked in MorDeleteSpec "read-during-compact").
  */
object MorDelete {

  private[sources] val SeqCol = "__mor_seq"

  /** @param keysWritten tombstone rows appended (distinct matching keys)
    * @param sidecarFiles sidecar parquet part files after the append
    */
  final case class MorStats(keysWritten: Long, sidecarFiles: Long)

  def sidecarDir(path: String): String = {
    val p = Paths.get(path).toAbsolutePath
    p.resolveSibling(p.getFileName.toString + "._mor_deletes").toString
  }

  /** Committed tombstone batches, (sequence, directory), sequence-ordered.
    * Only `batch-<seq>-…` directories count: a stage directory (dot-named,
    * not yet renamed) is invisible by construction, so a crashed writer
    * leaves garbage, never a half-visible batch.
    */
  private[sources] def batches(path: String): Seq[(Long, java.io.File)] = {
    val dir = new java.io.File(sidecarDir(path))
    if (!dir.isDirectory) Nil
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
      .map { f =>
        val seq = f.getName.stripPrefix("batch-").takeWhile(_.isDigit)
        require(seq.nonEmpty, s"malformed tombstone batch directory: ${f.getName}")
        seq.toLong -> f
      }
      .sortBy(_._1)
  }

  private def sidecarOf(spark: SparkSession, bs: Seq[(Long, java.io.File)]): DataFrame =
    spark.read.parquet(bs.map(_._2.toString): _*)

  private[sources] def sidecarKeyCols(spark: SparkSession, path: String): Option[Seq[String]] = {
    val bs = batches(path)
    if (bs.isEmpty) None
    else Some(sidecarOf(spark, bs).columns.toSeq.filterNot(_ == SeqCol))
  }

  /** Sequence of the file a row came from: parsed off `_metadata.file_path`
    * (0 for base/CoW-written files, N for `part-morN-…` appends).
    * Deliberately NOT a regex: this runs once per ROW of the base table
    * on every MoR read, and a backtracking regex over the full path
    * measured ~15× the raw-scan cost at 6M rows. An `instr` guard (fast
    * substring scan, 0 for every base/CoW file) gates a two-step
    * `substring_index` parse that only the few `part-morN-` files pay.
    * (`instr`, not `Column.contains`: the engine's Presto-compat layer
    * re-registers the `contains` SQL function with array semantics, and
    * Column.contains resolves through the function registry.) */
  private[sources] def fileSeq: Column = {
    val fp = col("_metadata.file_path")
    val parsed = substring_index(substring_index(fp, "/part-mor", -1), "-", 1)
    when(instr(fp, "/part-mor") > 0, parsed.cast("long")).otherwise(lit(0L))
  }

  /** Max sequence present anywhere (data file names + sidecar batch
    * names), 0 if none — a driver-side file listing, bounded by file
    * count like CowCore. Never reads tombstone DATA: the sequence rides
    * in the batch directory name, so an empty or half-garbage sidecar
    * file can't poison it. */
  private[sources] def maxSeq(spark: SparkSession, path: String): Long = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val dataMax = walk(new java.io.File(path))
      .flatMap { f =>
        val m = "part-mor(\\d+)-".r.findFirstMatchIn(f.getName)
        m.map(_.group(1).toLong)
      }.foldLeft(0L)(math.max)
    val sideMax = batches(path).map(_._1).foldLeft(0L)(math.max)
    math.max(dataMax, sideMax)
  }

  /** The sequence of the latest committed DML — the handle a reader pins
    * with [[readAt]] for a snapshot-stable view across later commits. */
  def currentSeq(spark: SparkSession, path: String): Long = maxSeq(spark, path)

  /** Exclusive single-writer lock: atomic lock-file create, released on
    * exit. Concurrent mutations fail loudly — MoR DML interleaving two
    * writers' sequence numbers would corrupt the supersession order.
    */
  private[sources] def withWriterLock[T](path: String)(body: => T): T = {
    val lock = Paths.get(sidecarDir(path) + ".lock")
    try Files.createFile(lock)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"merge-on-read DML on $path is SINGLE-WRITER and another writer holds " +
            s"$lock — wait for it, or remove the lock file if that writer crashed")
    }
    try body finally { Files.deleteIfExists(lock); () }
  }

  /** Commit one tombstone batch: distinct keys + sequence staged under a
    * dot-directory (invisible to readers), then ONE atomic directory
    * rename to `batch-<seq>-<uuid>` — the commit point. An empty key set
    * commits nothing (no empty batch to trip later sequence scans, no
    * key-set lock-in from a no-op DELETE). Returns keys written.
    */
  private[graft] def appendTombstones(spark: SparkSession, path: String,
      keys: DataFrame, keyCols: Seq[String], seq: Long): Long = {
    require(keyCols.nonEmpty, "merge-on-read DML needs at least one key column")
    require(!keyCols.contains(SeqCol), s"$SeqCol is reserved")
    sidecarKeyCols(spark, path).foreach { existing =>
      require(existing == keyCols,
        s"tombstone sidecar already keyed by (${existing.mkString(", ")}); " +
          s"got (${keyCols.mkString(", ")}) — compact() before changing the key set")
    }
    // pin the rows before writing: a lazy source whose lineage reads this
    // table (the usual case — delete predicates run on the resolved view)
    // must not re-evaluate after the sidecar gains the new batch
    val rows = keys.select(keyCols.map(col): _*).distinct()
      .withColumn(SeqCol, lit(seq))
      .localCheckpoint(true)
    try {
      val n = rows.count()
      if (n == 0L) return 0L
      val side = Paths.get(sidecarDir(path))
      Files.createDirectories(side)
      val stage = side.resolve(s".stage-${UUID.randomUUID().toString.take(8)}")
      rows.write.mode("overwrite").parquet(stage.toString)
      Files.move(stage, side.resolve(s"batch-$seq-${UUID.randomUUID().toString.take(8)}"),
        StandardCopyOption.ATOMIC_MOVE)
      n
    } finally { rows.unpersist(); () }
  }

  /** Tombstone all rows matching `predicate` in the CURRENT resolved view
    * of the parquet table at `path`, identified by `keyCols`. Touches no
    * table file; the batch-directory rename is the atomic commit point.
    */
  def delete(spark: SparkSession, path: String, predicate: Column,
      keyCols: Seq[String]): MorStats = withWriterLock(path) {
    // the predicate sees the MoR-RESOLVED view: rows already superseded by
    // earlier tombstones/upserts must not donate their keys (a predicate
    // matching only a key's DEAD values would otherwise delete its live
    // replacement row)
    val keys = read(spark, path).filter(predicate)
    val n = appendTombstones(spark, path, keys, keyCols,
      seq = maxSeq(spark, path) + 1)
    MorStats(n, batches(path)
      .flatMap(_._2.listFiles().toSeq)
      .count(_.getName.endsWith(".parquet")).toLong)
  }

  /** The table with tombstones applied: LEFT ANTI JOIN against the
    * sidecar keys, restricted to rows from files with a sequence below
    * the tombstone's (so upsert replacements survive their own
    * tombstones). The sidecar is small, so the anti side broadcasts; the
    * scan itself keeps its pushdown/pruning — the join sits above it.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    readAt(spark, path, Long.MaxValue)

  /** Snapshot read pinned at sequence `seq`: only data files and
    * tombstone batches with sequence ≤ `seq` participate, so the view is
    * exactly the table as of that commit — stable while later deletes
    * and merges land. Capture the handle with [[currentSeq]] BEFORE the
    * concurrent DML. [[compact]] physically rewrites files and therefore
    * invalidates snapshots older than its run (the same contract as
    * Iceberg snapshot expiry).
    */
  def readAt(spark: SparkSession, path: String, seq: Long): DataFrame = {
    val raw = spark.read.option("basePath", path).parquet(path)
    val pinned =
      if (seq == Long.MaxValue) raw
      else raw.withColumn("__mor_fseq", fileSeq)
        .filter(col("__mor_fseq") <= seq).drop("__mor_fseq")
    val bs = batches(path).filter(_._1 <= seq)
    if (bs.isEmpty) pinned
    else {
      val side = sidecarOf(spark, bs)
      val keyCols = side.columns.toSeq.filterNot(_ == SeqCol)
      val tomb = side.groupBy(keyCols.map(col): _*)
        .agg(max(col(SeqCol)).as(SeqCol))
      val tagged = pinned.withColumn("__mor_fseq", fileSeq)
      tagged.join(tomb,
          keyCols.map(k => tagged(k) === tomb(k)).reduce(_ && _) &&
            col("__mor_fseq") < tomb(SeqCol),
          "left_anti")
        .drop("__mor_fseq")
    }
  }

  /** Fold the tombstones into the table files (CoW rewrite of only the
    * files containing tombstoned keys at an older sequence). Returns the
    * CoW stats; no-op when the sidecar is empty.
    *
    * `minDoomedFraction` bounds write amplification under a long
    * tombstone tail: only files whose doomed-row fraction ≥ the
    * threshold rewrite (per-file doomed/total counts ride one
    * metadata-projection aggregate each); the rest stay on the read-side
    * anti-join, and the WHOLE sidecar is conservatively retained — a
    * tombstone may still matter to an unrewritten file, and dropping
    * only the dead ones would cost the same semi-join the next full
    * compact() does anyway. Rewritten parts carry the current max
    * sequence in their name either way, so the retained (or
    * not-yet-cleared) tombstones are no-ops against them — what makes a
    * read overlapping the rewrite, and the partial compact itself,
    * correct. The default 0.0 is the full compaction: every file with
    * any doomed row rewrites and the sidecar clears.
    */
  def compact(spark: SparkSession, path: String,
      minDoomedFraction: Double = 0.0): CowDelete.DeleteStats = withWriterLock(path) {
    val bs = batches(path)
    if (bs.isEmpty) return CowDelete.DeleteStats(Nil, 0L, 0L)
    val keyCols = sidecarOf(spark, bs).columns.toSeq.filterNot(_ == SeqCol)
    // pin the keys first: the rewrite's lazy lineage must not re-read
    // the sidecar after it is cleared, and a checkpointed frame fails
    // loudly instead of silently recomputing from deleted files
    val tomb = sidecarOf(spark, bs)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(SeqCol)).as(SeqCol))
      .localCheckpoint(true)
    // rewritten survivors carry the CURRENT max sequence, so tombstones
    // still visible mid-compact (or retained by a partial compact) never
    // re-delete them — upsert replacements folded into a rewrite would
    // otherwise drop back to sequence 0 under their own tombstones
    val seqNow = maxSeq(spark, path)
    try {
      def tombJoin(df: DataFrame, joinType: String): DataFrame = {
        val tagged = df.withColumn("__mor_fseq", fileSeq)
        tagged.join(tomb,
          keyCols.map(k => tagged(k) === tomb(k)).reduce(_ && _) &&
            col("__mor_fseq") < tomb(SeqCol),
          joinType).drop("__mor_fseq")
      }
      def doomed(df: DataFrame): DataFrame = tombJoin(df, "left_semi")
      def survivors(df: DataFrame): DataFrame = tombJoin(df, "left_anti")

      val fileFilter: Seq[String] => Seq[String] =
        if (minDoomedFraction <= 0.0) identity
        else { touchedAll =>
          // per-file doomed fraction: two counts projected to the
          // file-path metadata column, joined driver-side over the
          // touched set (bounded by file count, like every CowCore list)
          val table = spark.read.option("basePath", path).parquet(path)
          val withFp = table.withColumn("__cow_fp", col("_metadata.file_path"))
          val doomedPer = doomed(withFp).groupBy(col("__cow_fp"))
            .agg(count(lit(1)).as("doomed")).collect()
            .map(r => CowCore.localPath(r.getString(0)) -> r.getLong(1)).toMap
          val totalPer = withFp.groupBy(col("__cow_fp"))
            .agg(count(lit(1)).as("total")).collect()
            .map(r => CowCore.localPath(r.getString(0)) -> r.getLong(1)).toMap
          touchedAll.filter { f =>
            val d = doomedPer.getOrElse(f, 0L).toDouble
            val t = totalPer.getOrElse(f, 1L).toDouble
            d / t >= minDoomedFraction
          }
        }

      val s = CowCore.rewrite(spark, path, doomed)(
        survivors, prefix = s"part-mor$seqNow-", fileFilter = fileFilter)
      if (minDoomedFraction <= 0.0) {
        val dir = new java.io.File(sidecarDir(path))
        def rec(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rec)
          f.delete(); ()
        }
        rec(dir)
      }
      CowDelete.DeleteStats(s.touched, s.total, s.rewritten)
    } finally { tomb.unpersist(); () }
  }
}

/** Table maintenance beside the DML engines — the VACUUM every lakehouse
  * format ships. The commit discipline here never deletes eagerly on the
  * failure path (CowCore stages then atomically moves; MorDelete renames
  * whole batch directories), so a crashed writer leaves GARBAGE, never a
  * half-visible commit: un-drained `<table>.cow_stage_*` directories and
  * un-renamed `<sidecar>/.stage-*` tombstone stages. Both are invisible
  * to readers by construction (spec-locked), so reclaiming them is pure
  * disk hygiene — but it must not race a LIVE writer's stage, so vacuum
  * takes the same single-writer lock as every mutation.
  */
object Maintenance {

  /** @param dirsRemoved    crashed stage directories deleted
    * @param bytesReclaimed bytes those directories held
    */
  final case class VacuumStats(dirsRemoved: Long, bytesReclaimed: Long)

  def vacuum(path: String): VacuumStats = MorDelete.withWriterLock(path) {
    val table = java.nio.file.Paths.get(path).toAbsolutePath
    val parent = Option(table.getParent).map(_.toFile)
    val cowStages = parent.map(_.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory &&
        f.getName.startsWith(table.getFileName.toString + ".cow_stage_"))
    val sidecarStages = {
      val d = new java.io.File(MorDelete.sidecarDir(path))
      if (!d.isDirectory) Nil
      else d.listFiles().toSeq.filter(f => f.isDirectory && f.getName.startsWith(".stage-"))
    }
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(sizeOf).sum
      else f.length()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val doomed = cowStages ++ sidecarStages
    val bytes = doomed.map(sizeOf).sum
    doomed.foreach(rm)
    VacuumStats(doomed.size.toLong, bytes)
  }
}

/** Merge-on-read MERGE: tombstone the target keys the source supersedes
  * and append replacement/insert rows as NEW part files at the same
  * sequence — zero existing files touched, the scattered-key answer to
  * [[CowMerge]] exactly as [[MorDelete]] is to [[CowDelete]]. Reads
  * resolve winners through the sequence rule: the appended rows carry the
  * tombstones' sequence in their file name, so they survive them while
  * every older copy of the key dies; a later operation gets a higher
  * sequence and supersedes them in turn.
  *
  * Clause surface ([[merge]]) — the ANSI MERGE shape over equality keys:
  *  - WHEN MATCHED [AND cond] THEN DELETE (`deleteWhen`): matched keys
  *    whose (target row, source row) pair passes the condition tombstone
  *    WITHOUT a re-append.
  *  - WHEN MATCHED [AND cond] THEN UPDATE (`updateWhen`): remaining
  *    matched keys passing the condition tombstone AND append the source
  *    row as the replacement. `None` = unconditional (every matched key
  *    not claimed by the delete clause).
  *  - WHEN NOT MATCHED THEN INSERT (`insertUnmatched`): source rows whose
  *    key has no LIVE target row append as new files, no tombstone.
  * Conditions see the MoR-resolved target row's columns by name and the
  * source row's through a `src_` prefix ([[CowMerge]]'s convention).
  * Clause priority is delete-first (ANSI evaluates clauses in order): a
  * key whose duplicate target rows pass both conditions deletes.
  *
  * Equality contract: a source row supersedes ALL existing rows sharing
  * its key (the table may hold duplicates — same stance as
  * [[MorDelete.delete]]); "matched" is judged against the RESOLVED view,
  * so a key whose rows are all tombstoned counts as unmatched. The ANSI
  * cardinality rule applies to the SOURCE: it must be unique on the key
  * columns ([[CowMerge]]'s check).
  *
  * Commit discipline: replacement/insert part files move in FIRST, the
  * tombstone batch rename is the commit point. A crash (or a reader)
  * between the two sees transient duplicates — never lost rows; with the
  * old order (tombstones first) a crash after the tombstone commit lost
  * every matched row permanently.
  */
object MorUpsert {

  final case class UpsertStats(keysTombstoned: Long, filesAppended: Long)

  /** @param keysDeleted  matched keys tombstoned by the delete clause
    * @param keysUpdated  matched keys tombstoned + replaced by the update clause
    * @param rowsInserted unmatched source rows appended
    */
  final case class MergeStats(
      keysDeleted: Long, keysUpdated: Long, rowsInserted: Long, filesAppended: Long)

  /** The unconditional upsert (replace every matched key, insert the
    * rest) — `merge` with no clause conditions. */
  def upsert(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String]): UpsertStats = {
    val m = merge(spark, path, source, keyCols)
    UpsertStats(m.keysUpdated, m.filesAppended)
  }

  def merge(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      deleteWhen: Option[Column] = None,
      updateWhen: Option[Column] = None,
      insertUnmatched: Boolean = true): MergeStats = MorDelete.withWriterLock(path) {
    val table = spark.read.option("basePath", path).parquet(path)
    require(source.columns.toSet == table.columns.toSet,
      s"source columns (${source.columns.sorted.mkString(", ")}) must match " +
        s"the table's (${table.columns.sorted.mkString(", ")})")
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val src = source.select(table.columns.toSeq.map(col): _*).localCheckpoint(true)
    val keyCs = keyCols.map(col)
    var pinned: List[DataFrame] = Nil
    def pin(df: DataFrame): DataFrame = {
      val p = df.localCheckpoint(true); pinned ::= p; p
    }
    try {
      require(src.groupBy(keyCs: _*).count()
        .where(col("count") > 1).isEmpty,
        "MERGE source must be unique on the key columns (ANSI cardinality rule)")
      // matched = against the RESOLVED view (live rows only; see scaladoc),
      // with source columns ridden in under src_ for the clause conditions
      val resolved = MorDelete.read(spark, path)
      val srcPref = src.select(keyCs ++ src.columns.toSeq.filterNot(keyCols.contains)
        .map(c => col(c).as(s"src_$c")): _*)
      val pairs = resolved.join(srcPref, keyCols)
      val allMatched = pairs.select(keyCs: _*).distinct()
      val delKeys = pin(deleteWhen
        .map(c => pairs.filter(c).select(keyCs: _*).distinct())
        .getOrElse(allMatched.limit(0)))
      val updKeys = pin(updateWhen
        .map(c => pairs.filter(c).select(keyCs: _*).distinct())
        .getOrElse(allMatched)
        .join(delKeys, keyCols, "left_anti"))
      val inserts = pin(
        if (insertUnmatched) src.join(resolved.select(keyCs: _*), keyCols, "left_anti")
        else src.limit(0))
      val (nDel, nUpd, nIns) = (delKeys.count(), updKeys.count(), inserts.count())

      val seq = MorDelete.maxSeq(spark, path) + 1
      // append replacements + inserts as sequence-named part files FIRST
      // (staged write + atomic per-file move, CowCore's discipline), THEN
      // commit the tombstone batch — see the commit-discipline scaladoc
      val appended = src.join(updKeys, keyCols, "left_semi").unionByName(inserts)
      val moved =
        if (nUpd + nIns == 0) 0L
        else {
          val base = Paths.get(path).toAbsolutePath
          val sample = table.select(col("_metadata.file_path"))
            .limit(1).collect().headOption.map(r => CowCore.localPath(r.getString(0)))
          val partitionCols =
            sample.map(CowCore.partitionColsOf(spark, table, _)).getOrElse(Nil)
          val stage = CowCore.stage(spark, base, partitionCols, appended)
          CowCore.moveIn(stage, base, prefix = s"part-mor$seq-")
        }
      MorDelete.appendTombstones(spark, path,
        delKeys.unionByName(updKeys), keyCols, seq)
      MergeStats(nDel, nUpd, nIns, moved)
    } finally {
      src.unpersist()
      pinned.foreach(_.unpersist())
      ()
    }
  }
}
