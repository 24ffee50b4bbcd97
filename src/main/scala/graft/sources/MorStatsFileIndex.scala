package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over a merge-on-read snapshot that prunes files from
  * the manifest's published column stats INSIDE Spark's planning — the
  * Delta `TahoeFileIndex` / Iceberg manifest-evaluator pattern. Spark's
  * `FileSourceStrategy` hands every scan's pushed data filters to
  * `listFiles`; each conjunct runs through the same conservative
  * evaluator as [[MorDelete.readWhere]] ([[MorDelete.statsRulesOf]],
  * which handles the RESOLVED expressions a planner pushes), and only
  * files whose [min, max] bounds can satisfy every understood conjunct
  * are listed. The payoff over `readWhere`: ANY predicate reaching the
  * scan prunes — a `WHERE` on the resolved temp view, a join filter, a
  * pushed IN-list — with zero caller opt-in, and `explain` shows the
  * reduced file count on the scan node itself.
  *
  * Snapshot semantics: the file list and stats are FROZEN at index
  * construction (the manifest resolve), exactly like the DataFrame the
  * plain read path builds — later commits never leak in; `refresh` is
  * deliberately a no-op for the same reason. Flat (unpartitioned)
  * layouts only — the caller falls back to the plain path otherwise, so
  * `partitionSchema` is always empty here.
  */
private[sources] final class MorStatsFileIndex(
    root: Path,
    files: Seq[(FileStatus, Seq[MorDelete.FileColStat])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = new StructType()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // dataFilters arrive as individual conjuncts; each compiles to a
    // may-match tree (AND/OR inside it handled structurally) and an
    // uncompilable one simply prunes nothing
    val preds = dataFilters.flatMap(MorDelete.statsPredOf)
    val kept =
      if (preds.isEmpty) files.map(_._1)
      else files.collect {
        case (fs, stats) if preds.forall(_(stats)) => fs
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] = files.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._1.getLen).sum
}
