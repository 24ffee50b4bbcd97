package org.apache.spark.sql.execution.datasources

import java.time.ZoneId

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.DataType

/** Package bridge into Spark's Hive-layout partition inference
  * (`PartitioningUtils` is `private[datasources]`). The MoR snapshot
  * layer needs BOTH read paths — the stats-indexed `FileIndex` and the
  * plain `basePath` fallback — to declare the SAME partition column
  * types, and the only way to guarantee that is to run the exact
  * inference chain Spark itself runs (int → long → decimal → double →
  * date → timestamp → string, formatter construction included) rather
  * than a re-implementation that drifts at the edges ("2020-1-9" is a
  * Spark date but not a `LocalDate.parse` date; "1e3" is a decimal).
  */
object GraftPartitionBridge {

  /** Spark's own `parsePartitions` over leaf directories: full type
    * inference + cross-directory widening + catalyst value rows, with
    * validation OFF (an uncastable value becomes null, never an error —
    * callers treat it conservatively). */
  def parse(leafDirs: Seq[Path], base: Path, zoneId: ZoneId,
      caseSensitive: Boolean): PartitionSpec =
    PartitioningUtils.parsePartitions(
      leafDirs, true, Set(base), None, caseSensitive, false, zoneId, false)

  /** Inferred (type, catalyst value) for ONE escaped `value` as it
    * appears in a `col=value` path segment — routed through
    * [[parse]] on a synthetic single-directory listing so the result is
    * Spark's verbatim judgment for that value (same formatters, same
    * unescaping, same precedence). A null value means Spark maps the
    * segment to SQL NULL (the `__HIVE_DEFAULT_PARTITION__` sentinel or
    * an uncastable spelling). */
  def inferSegmentValue(escapedValue: String, zoneId: ZoneId): (DataType, Any) = {
    val base = new Path("file:/__graft_infer__")
    val spec = parse(Seq(new Path(base, "g=" + escapedValue)), base, zoneId,
      caseSensitive = false)
    val dt = spec.partitionColumns.fields.head.dataType
    (dt, spec.partitions.head.values.get(0, dt))
  }
}
