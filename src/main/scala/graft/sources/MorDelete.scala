package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Merge-on-read row-level DELETE — the engine's answer to the measured
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
  *  2. Reads go through [[read]]: the table LEFT ANTI JOIN the tombstone
  *     keys. The sidecar is small (deleted keys only) so AQE broadcasts
  *     the anti side; the scan itself is untouched — pushed filters and
  *     pruned schemas survive because the anti-join sits ABOVE the scan.
  *  3. [[compact]] folds the tombstones into the files via the existing
  *     CoW machinery ([[CowDelete.deleteWhereIn]] — semi-join discovery,
  *     staged rewrite of touched files only) and clears the sidecar —
  *     amortizing the read-side join over one rewrite at a chosen time
  *     (the compaction scheduling every MoR format ships).
  *
  * Row identity: a plain parquet table has no row ids (same constraint
  * that shapes [[CowDelete]]), so tombstones are EQUALITY deletes on
  * caller-declared key columns — every current and future row matching a
  * tombstoned key combination is deleted, which is exactly Iceberg's
  * equality-delete contract. Callers with true row-level intent pass a
  * unique key. The key set is self-describing: the sidecar parquet's
  * columns ARE the key columns, so [[read]] and [[compact]] need no
  * separate metadata file, and mixed key sets across delete batches are
  * rejected loudly at write time.
  */
object MorDelete {

  /** @param keysWritten tombstone rows appended (distinct matching keys)
    * @param sidecarFiles sidecar parquet part files after the append
    */
  final case class MorStats(keysWritten: Long, sidecarFiles: Long)

  def sidecarDir(path: String): String = {
    val p = Paths.get(path).toAbsolutePath
    p.resolveSibling(p.getFileName.toString + "._mor_deletes").toString
  }

  private def sidecarKeyCols(spark: SparkSession, path: String): Option[Seq[String]] = {
    val dir = new java.io.File(sidecarDir(path))
    val hasParts = dir.isDirectory &&
      dir.listFiles().exists(_.getName.endsWith(".parquet"))
    if (hasParts) Some(spark.read.parquet(sidecarDir(path)).columns.toSeq) else None
  }

  /** Tombstone all rows of the parquet table at `path` matching
    * `predicate`, identified by `keyCols`. Touches no table file.
    */
  def delete(spark: SparkSession, path: String, predicate: Column,
      keyCols: Seq[String]): MorStats = {
    require(keyCols.nonEmpty, "merge-on-read deletes need at least one key column")
    sidecarKeyCols(spark, path).foreach { existing =>
      require(existing == keyCols,
        s"tombstone sidecar already keyed by (${existing.mkString(", ")}); " +
          s"got (${keyCols.mkString(", ")}) — compact() before changing the key set")
    }
    val keys = spark.read.option("basePath", path).parquet(path)
      .filter(predicate)
      .select(keyCols.map(col): _*)
      .distinct()
    keys.write.mode("append").parquet(sidecarDir(path))
    // the table is untouched (that is the point), so re-counting the lazy
    // keys frame after the append still sees the same rows
    MorStats(keys.count(),
      new java.io.File(sidecarDir(path)).listFiles()
        .count(_.getName.endsWith(".parquet")).toLong)
  }

  /** The table with tombstones applied: LEFT ANTI JOIN against the
    * sidecar keys (broadcast by AQE — the sidecar holds deleted keys
    * only). Plans the same parquet scan as a raw read (pushdown/pruning
    * intact); the join sits above it.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val table = spark.read.option("basePath", path).parquet(path)
    sidecarKeyCols(spark, path) match {
      case None => table
      case Some(keyCols) =>
        table.join(spark.read.parquet(sidecarDir(path)).distinct(),
          keyCols, "left_anti")
    }
  }

  /** Fold the tombstones into the table files (CoW rewrite of only the
    * files containing tombstoned keys — [[CowDelete.deleteWhereIn]]'s
    * semi-join discovery) and clear the sidecar. Returns the CoW stats;
    * no-op when the sidecar is empty.
    */
  def compact(spark: SparkSession, path: String): CowDelete.DeleteStats =
    sidecarKeyCols(spark, path) match {
      case None => CowDelete.DeleteStats(Nil, 0L, 0L)
      case Some(keyCols) =>
        // pin the keys first: the rewrite's lazy lineage must not re-read
        // the sidecar after it is cleared, and a checkpointed frame fails
        // loudly instead of silently recomputing from deleted files
        val keys = spark.read.parquet(sidecarDir(path)).distinct().localCheckpoint(true)
        try {
          val stats = CowDelete.deleteWhereIn(spark, path, keys, keyCols)
          val dir = new java.io.File(sidecarDir(path))
          def rec(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rec)
            f.delete(); ()
          }
          rec(dir)
          stats
        } finally keys.unpersist()
    }
}
