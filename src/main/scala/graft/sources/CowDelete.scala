package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, not, when}

/** Copy-on-write row-level DELETE over a parquet directory table.
  *
  * The reference's DELETE is split between an execution operator that
  * collects the row ids to remove (`presto-main/.../operator/
  * DeleteOperator.java:39-60` — emits a rowId channel to the connector's
  * `UpdatablePageSource`) and an optimizer rule that pushes whole-predicate
  * deletes down to connectors that can handle them as metadata operations
  * (`presto-main/.../iterative/rule/PushDeleteIntoConnector.java`). A plain
  * parquet directory has no row ids and no metadata delete, so the
  * mechanism every lakehouse format (Hive ACID, Iceberg, Delta) uses for
  * this layout is copy-on-write at FILE granularity:
  *
  *  1. Scan only the `_metadata.file_path` column with the predicate —
  *     Catalyst pushes the predicate into the parquet scan, so files whose
  *     row-group stats exclude the predicate are never even decoded — to
  *     find the files that contain at least one matching row.
  *  2. Rewrite ONLY those files, keeping rows that do NOT match.
  *  3. Swap: move the rewritten parts in, remove the originals. Every
  *     file outside the touched set is untouched — same path, same bytes,
  *     same mtime — which is what bounds the write cost by the deleted
  *     data's locality instead of the table size.
  *
  * The file list crosses to the driver (`collect`), which is the one
  * deliberate driver-side step: it is file-path METADATA, bounded by the
  * number of touched files (the same cardinality Spark's own FileIndex
  * and every table format's commit protocol hold on the driver/coordinator),
  * never row data.
  *
  * Partitioned layouts are handled via `basePath`, so partition-directory
  * columns survive the touched-file re-read, and rewritten parts land back
  * in their own partition directories.
  */
object CowDelete {

  /** @param touched   files that contained matching rows and were rewritten
    * @param total     files in the table before the delete
    * @param rewritten replacement files written (0 when a touched file
    *                  retained no rows at all)
    */
  final case class DeleteStats(touched: Seq[String], total: Long, rewritten: Long)

  /** Delete all rows matching `predicate` from the parquet table at
    * `path`, rewriting only the files that contain matching rows.
    */
  def delete(spark: SparkSession, path: String, predicate: Column): DeleteStats = {
    val s = CowCore.rewrite(spark, path, predicate)(_.where(not(predicate)))
    DeleteStats(s.touched, s.total, s.rewritten)
  }
}

/** Copy-on-write row-level UPDATE — same touched-file discovery and swap
  * as [[CowDelete]] (the reference splits the analogous machinery between
  * `DeleteOperator.java`'s rowId collection and the connector's
  * `UpdatablePageSource`), but the rewrite keeps EVERY row of a touched
  * file, applying the SET expressions only where the predicate holds:
  * one `when(predicate, set).otherwise(col)` projection per assigned
  * column, a single codegen'd pass, no join and no union. A SET that
  * targets a partition column moves its rows to the right partition
  * directory automatically, because the rewrite re-materializes partition
  * columns through `partitionBy` like every staged write here.
  */
object CowUpdate {

  final case class UpdateStats(touched: Seq[String], total: Long, rewritten: Long)

  /** Apply `sets` (column name → new-value expression, evaluated against
    * the pre-update row, as in ANSI UPDATE) to all rows matching
    * `predicate` in the parquet table at `path`.
    */
  def update(spark: SparkSession, path: String, predicate: Column,
      sets: Seq[(String, Column)]): UpdateStats = {
    val byName = sets.toMap
    val s = CowCore.rewrite(spark, path, predicate) { touchedDf =>
      touchedDf.select(touchedDf.columns.toSeq.map { c =>
        byName.get(c)
          .map(e => when(predicate, e).otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }: _*)
    }
    UpdateStats(s.touched, s.total, s.rewritten)
  }
}

/** The shared copy-on-write core: touched-file discovery (metadata-only
  * scan under the predicate), staged rewrite of only those files, and the
  * stage-then-swap commit. See [[CowDelete]]'s scaladoc for the full
  * mechanism and its scale rationale.
  */
private[sources] object CowCore {

  final case class Stats(touched: Seq[String], total: Long, rewritten: Long)

  private def localPath(uri: String): String =
    Paths.get(java.net.URI.create(
      if (uri.contains(":/")) uri else "file://" + uri)).toString

  def rewrite(spark: SparkSession, path: String, predicate: Column)(
      transformTouched: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Stats = {
    val table = spark.read.option("basePath", path).parquet(path)

    // Touched-file discovery: a metadata-only projection under the
    // predicate. distinct() keeps the exchange on the (tiny) file-path
    // column; the collect is bounded by the touched-file count.
    val touched = table
      .where(predicate)
      .select(col("_metadata.file_path"))
      .distinct()
      .collect()
      .map(r => localPath(r.getString(0)))
      .sorted
      .toSeq
    val total = table.select(col("_metadata.file_path")).distinct().count()
    if (touched.isEmpty) return Stats(Nil, total, 0L)

    // Rewrite pass: re-read ONLY the touched files (basePath recovers
    // partition-directory columns) and apply the caller's transform.
    // Partition columns are re-materialized into directories on write so
    // staged parts mirror the table's own layout.
    val base = Paths.get(path).toAbsolutePath
    val partitionCols = table.schema.fieldNames.filter { f =>
      !spark.read.parquet(touched.head).schema.fieldNames.contains(f)
    }.toSeq
    val stage = base.resolveSibling(base.getFileName.toString +
      s".cow_stage_${UUID.randomUUID().toString.take(8)}")
    val rewritten = transformTouched(
      spark.read.option("basePath", path).parquet(touched: _*))
    val writer = rewritten.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(stage.toString)

    // Swap (the TableFinish/commit analog): stage is fully written and
    // closed before any original is removed, so a crash before this point
    // leaves the table intact and only orphans the stage directory.
    val staged = walk(stage.toFile).filter(_.getName.endsWith(".parquet"))
    var moved = 0L
    staged.foreach { f =>
      val rel = stage.relativize(f.toPath.toAbsolutePath)
      val destDir = if (rel.getParent == null) base else base.resolve(rel.getParent)
      Files.createDirectories(destDir)
      Files.move(f.toPath,
        destDir.resolve(s"part-cow-${UUID.randomUUID().toString.take(8)}-${f.getName}"),
        StandardCopyOption.ATOMIC_MOVE)
      moved += 1
    }
    touched.foreach(f => Files.deleteIfExists(Paths.get(f)))
    deleteRecursively(stage.toFile)
    Stats(touched, total, moved)
  }

  private def walk(f: File): Seq[File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }
}
