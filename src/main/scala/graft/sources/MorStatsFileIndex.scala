package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over a merge-on-read snapshot that prunes files from
  * the manifest's published column stats INSIDE Spark's planning — the
  * Delta `TahoeFileIndex` / Iceberg manifest-evaluator pattern. Spark's
  * `FileSourceStrategy` hands every scan's pushed data filters to
  * `listFiles`; each conjunct runs through the same conservative
  * evaluator as [[MorDelete.readWhere]] ([[MorDelete.statsPredOf]],
  * which handles the RESOLVED expressions a planner pushes), and only
  * files whose [min, max] bounds can satisfy every understood conjunct
  * are listed. The payoff over `readWhere`: ANY predicate reaching the
  * scan prunes — a `WHERE` on the resolved temp view, a join filter, a
  * pushed IN-list — with zero caller opt-in, and `explain` shows the
  * reduced file count on the scan node itself.
  *
  * PARTITIONED (Hive-layout) tables ride the same index since r16: the
  * manifest's file paths carry their `col=value` directory segments, so
  * the snapshot resolve parses them into `partitionSchema` + per-file
  * partition values, and Spark's own planner hands `partitionFilters`
  * here — evaluated against each directory group's values exactly like
  * `PartitioningAwareFileIndex.prunePartitions` does for a disk listing
  * (the public Spark pattern this mirrors; the Iceberg analog is
  * partition values in manifest entries). Partition pruning and stats
  * pruning COMPOSE: the partition predicate drops whole directories,
  * the per-file bounds drop files inside the survivors.
  *
  * Snapshot semantics: the file list, stats, and partition values are
  * FROZEN at index construction (the manifest resolve), exactly like the
  * DataFrame the plain read path builds — later commits never leak in;
  * `refresh` is deliberately a no-op for the same reason.
  */
private[sources] final class MorStatsFileIndex(
    root: Path,
    partSchema: StructType,
    files: Seq[(FileStatus, Seq[Any], Seq[MorDelete.FileColStat])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = partSchema

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // dataFilters arrive as individual conjuncts; each compiles to a
    // may-match tree (AND/OR inside it handled structurally) and an
    // uncompilable one simply prunes nothing
    val preds = dataFilters.flatMap(MorDelete.statsPredOf)
    val statKept =
      if (preds.isEmpty) files
      else files.filter { case (_, _, stats) => preds.forall(_(stats)) }
    if (partSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, statKept.map(_._1).toArray))
    else {
      val dirs = statKept.groupBy(_._2).toSeq.map { case (values, fs) =>
        PartitionDirectory(InternalRow.fromSeq(values), fs.map(_._1).toArray)
      }
      if (partitionFilters.isEmpty) dirs
      else {
        // bind the planner's partition predicate to this index's column
        // order and evaluate per directory group — the standard
        // FileIndex partition-pruning contract
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val idx = partSchema.fieldNames
                .indexWhere(_.equalsIgnoreCase(a.name))
              require(idx >= 0, s"unknown partition column in filter: ${a.name}")
              BoundReference(idx, partSchema(idx).dataType, nullable = true)
          })
        dirs.filter(d => bound.eval(d.values))
      }
    }
  }

  override def inputFiles: Array[String] = files.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._1.getLen).sum
}
