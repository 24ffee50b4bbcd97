package graft.sources

import java.nio.file.Paths

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
  *     sidecar (`<table>._mor_deletes/`, ordinary parquet). No table file
  *     is touched: write cost ∝ deleted keys, amplification ~0 by
  *     construction, regardless of how the deleted rows scatter.
  *  2. Reads go through [[MorDelete.read]]: the table LEFT ANTI JOIN the
  *     tombstone keys. The sidecar is small (deleted keys only) so AQE
  *     broadcasts the anti side; the scan itself is untouched — pushed
  *     filters and pruned schemas survive because the anti-join sits
  *     ABOVE the scan.
  *  3. [[MorDelete.compact]] folds the tombstones into the files via the
  *     CoW machinery (semi-join touched-file discovery, staged rewrite of
  *     touched files only) and clears the sidecar — amortizing the
  *     read-side join over one rewrite at a chosen time (the compaction
  *     scheduling every MoR format ships).
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
  * unique key. The key set is self-describing: the sidecar parquet's
  * non-sequence columns ARE the key columns, so reads and compaction need
  * no separate metadata file, and mixed key sets across batches are
  * rejected loudly at write time.
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

  private[sources] def sidecarKeyCols(spark: SparkSession, path: String): Option[Seq[String]] = {
    val dir = new java.io.File(sidecarDir(path))
    val hasParts = dir.isDirectory &&
      dir.listFiles().exists(_.getName.endsWith(".parquet"))
    if (hasParts)
      Some(spark.read.parquet(sidecarDir(path)).columns.toSeq.filterNot(_ == SeqCol))
    else None
  }

  /** Sequence of the file a row came from: parsed off `_metadata.file_path`
    * (0 for base/CoW-written files, N for `part-morN-…` upsert appends).
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

  /** Max sequence present anywhere (data file names + sidecar), 0 if none —
    * a driver-side file listing, bounded by file count like CowCore. */
  private[sources] def maxSeq(spark: SparkSession, path: String): Long = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val dataMax = walk(new java.io.File(path))
      .flatMap { f =>
        val m = "part-mor(\\d+)-".r.findFirstMatchIn(f.getName)
        m.map(_.group(1).toLong)
      }.foldLeft(0L)(math.max)
    val sideMax = sidecarKeyCols(spark, path) match {
      case None => 0L
      case Some(_) =>
        spark.read.parquet(sidecarDir(path))
          .agg(max(col(SeqCol))).collect()(0).getLong(0)
    }
    math.max(dataMax, sideMax)
  }

  private[sources] def appendTombstones(spark: SparkSession, path: String,
      keys: DataFrame, keyCols: Seq[String], seq: Long): Long = {
    require(keyCols.nonEmpty, "merge-on-read DML needs at least one key column")
    require(!keyCols.contains(SeqCol), s"$SeqCol is reserved")
    sidecarKeyCols(spark, path).foreach { existing =>
      require(existing == keyCols,
        s"tombstone sidecar already keyed by (${existing.mkString(", ")}); " +
          s"got (${keyCols.mkString(", ")}) — compact() before changing the key set")
    }
    val rows = keys.select(keyCols.map(col): _*).distinct()
      .withColumn(SeqCol, lit(seq))
    rows.write.mode("append").parquet(sidecarDir(path))
    rows.count() // table files untouched, so the lazy recount is stable
  }

  /** Tombstone all rows of the parquet table at `path` matching
    * `predicate`, identified by `keyCols`. Touches no table file.
    */
  def delete(spark: SparkSession, path: String, predicate: Column,
      keyCols: Seq[String]): MorStats = {
    val keys = spark.read.option("basePath", path).parquet(path)
      .filter(predicate)
    val n = appendTombstones(spark, path, keys, keyCols,
      seq = maxSeq(spark, path) + 1)
    MorStats(n,
      new java.io.File(sidecarDir(path)).listFiles()
        .count(_.getName.endsWith(".parquet")).toLong)
  }

  /** The table with tombstones applied: LEFT ANTI JOIN against the
    * sidecar keys, restricted to rows from files with a sequence below
    * the tombstone's (so upsert replacements survive their own
    * tombstones). The sidecar is small, so the anti side broadcasts; the
    * scan itself keeps its pushdown/pruning — the join sits above it.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val table = spark.read.option("basePath", path).parquet(path)
    sidecarKeyCols(spark, path) match {
      case None => table
      case Some(keyCols) =>
        val tomb = spark.read.parquet(sidecarDir(path))
          .groupBy(keyCols.map(col): _*)
          .agg(max(col(SeqCol)).as(SeqCol))
        val tagged = table.withColumn("__mor_fseq", fileSeq)
        tagged.join(tomb,
            keyCols.map(k => tagged(k) === tomb(k)).reduce(_ && _) &&
              col("__mor_fseq") < tomb(SeqCol),
            "left_anti")
          .drop("__mor_fseq")
    }
  }

  /** Fold the tombstones into the table files (CoW rewrite of only the
    * files containing tombstoned keys at an older sequence) and clear the
    * sidecar. Returns the CoW stats; no-op when the sidecar is empty.
    */
  def compact(spark: SparkSession, path: String): CowDelete.DeleteStats =
    sidecarKeyCols(spark, path) match {
      case None => CowDelete.DeleteStats(Nil, 0L, 0L)
      case Some(keyCols) =>
        // pin the keys first: the rewrite's lazy lineage must not re-read
        // the sidecar after it is cleared, and a checkpointed frame fails
        // loudly instead of silently recomputing from deleted files
        val tomb = spark.read.parquet(sidecarDir(path))
          .groupBy(keyCols.map(col): _*)
          .agg(max(col(SeqCol)).as(SeqCol))
          .localCheckpoint(true)
        try {
          def doomed(df: DataFrame): DataFrame = {
            val tagged = df.withColumn("__mor_fseq", fileSeq)
            tagged.join(tomb,
              keyCols.map(k => tagged(k) === tomb(k)).reduce(_ && _) &&
                col("__mor_fseq") < tomb(SeqCol),
              "left_semi").drop("__mor_fseq")
          }
          def survivors(df: DataFrame): DataFrame = {
            val tagged = df.withColumn("__mor_fseq", fileSeq)
            tagged.join(tomb,
              keyCols.map(k => tagged(k) === tomb(k)).reduce(_ && _) &&
                col("__mor_fseq") < tomb(SeqCol),
              "left_anti").drop("__mor_fseq")
          }
          val s = CowCore.rewrite(spark, path, doomed)(survivors)
          val dir = new java.io.File(sidecarDir(path))
          def rec(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rec)
            f.delete(); ()
          }
          rec(dir)
          CowDelete.DeleteStats(s.touched, s.total, s.rewritten)
        } finally tomb.unpersist()
    }
}

/** Merge-on-read MERGE (upsert): tombstone the target keys the source
  * replaces and append the source rows as NEW part files at the same
  * sequence — zero existing files touched, the scattered-key answer to
  * [[CowMerge]] exactly as [[MorDelete]] is to [[CowDelete]]. Reads
  * resolve winners through the sequence rule: the appended rows carry the
  * tombstones' sequence in their file name, so they survive them while
  * every older copy of the key dies; a later upsert gets a higher
  * sequence and supersedes them in turn.
  *
  * Equality contract: a source row replaces ALL existing rows sharing its
  * key (the table may hold duplicates — same stance as
  * [[MorDelete.delete]]). The ANSI cardinality rule applies to the
  * SOURCE: it must be unique on the key columns ([[CowMerge]]'s check).
  */
object MorUpsert {

  final case class UpsertStats(keysTombstoned: Long, filesAppended: Long)

  def upsert(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String]): UpsertStats = {
    val table = spark.read.option("basePath", path).parquet(path)
    require(source.columns.toSet == table.columns.toSet,
      s"source columns (${source.columns.sorted.mkString(", ")}) must match " +
        s"the table's (${table.columns.sorted.mkString(", ")})")
    val src = source.select(table.columns.toSeq.map(col): _*).localCheckpoint(true)
    try {
      require(src.groupBy(keyCols.map(col): _*).count()
        .where(col("count") > 1).isEmpty,
        "MERGE source must be unique on the key columns (ANSI cardinality rule)")
      val seq = MorDelete.maxSeq(spark, path) + 1
      // tombstone only keys that exist in the target (an unmatched key's
      // tombstone would be a harmless no-op, but it bloats the sidecar)
      val matched = table.select(keyCols.map(col): _*)
        .join(src.select(keyCols.map(col): _*), keyCols, "left_semi")
      val nTomb = MorDelete.appendTombstones(spark, path, matched, keyCols, seq)
      // append the source as new part files carrying the sequence; the
      // staged-write + atomic-move discipline is CowCore's
      val base = Paths.get(path).toAbsolutePath
      val sample = table.select(col("_metadata.file_path"))
        .limit(1).collect().headOption.map(r => CowCore.localPath(r.getString(0)))
      val partitionCols =
        sample.map(CowCore.partitionColsOf(spark, table, _)).getOrElse(Nil)
      val stage = CowCore.stage(spark, base, partitionCols, src)
      val moved = CowCore.moveIn(stage, base, prefix = s"part-mor$seq-")
      UpsertStats(nTomb, moved)
    } finally src.unpersist()
  }
}
