package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.MorDelete

/** Structured-Streaming SOURCE over a merge-on-read table's change data
  * feed — the consumption half [[Streams.morSink]] leaves open: the sink
  * closes exactly-once INGEST, this closes exactly-once DOWNSTREAM SYNC.
  * The pattern is Delta's streaming CDF source (`readChangeFeed` over a
  * micro-batch reader) re-expressed on this engine's manifest protocol;
  * the reference has no change-feed surface at all (streams there are
  * bounded Kafka offset ranges, presto-kafka/.../KafkaSplitManager.java).
  *
  * Offset = the table's DML SEQUENCE (the same handle [[MorDelete.readAt]]
  * pins). Each micro-batch emits `readChanges(last, current]` — the
  * per-commit attributed feed — and Structured Streaming's checkpoint
  * persists the last-synced sequence, so a restarted query resumes
  * exactly where it stopped with no rescan and no duplicate emission.
  * Pair the consumer with [[MorDelete.applyChanges]] carrying the batch
  * id as its txn marker ([[Streams.morReplica]]) and the whole
  * source→feed→replica chain is exactly-once end to end.
  *
  * Failure semantics carry over from [[MorDelete.readChanges]]: a range
  * containing a physical reorganization (compaction / sidecar merge /
  * rewrite / restore) refuses loudly and FAILS the query — per-commit
  * attribution is undefined across such a commit. The documented
  * recovery is a re-seed: net-apply [[MorDelete.snapshotDiff]] onto the
  * replica, then restart the stream from the current sequence (fresh
  * `fromSeq`, fresh checkpoint). Schedule maintenance on the SOURCE
  * table between sync cycles, not inside them, to keep ranges clean.
  *
  * Scale: a micro-batch costs one manifest-list walk (content-addressed
  * shards cached per walk — O(changed shards), not O(commits × body))
  * plus ONE scan of the `to` snapshot restricted by the tombstone
  * broadcast; emitted rows ∝ changed rows, never table size. At 100 TB
  * the feed is the difference between shipping a day's delta and
  * re-scanning the table per sync.
  */
final class MorCdfSource(spark: SparkSession, path: String,
    fromSeq0: Option[Long], maxSeqsPerBatch: Option[Long],
    maxRowsPerBatch: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  /** The stream starts AFTER this sequence: caller-pinned (the replica's
    * seed snapshot), or the table's current sequence at stream start. */
  private val initSeq: Long =
    fromSeq0.getOrElse(MorDelete.currentSeq(spark, path))

  /** AvailableNow pins the run's END TARGET once at start; each batch
    * still admits at most `maxSeqsPerBatch` sequences toward it — the
    * FileStreamSource maxFilesPerTrigger structure. */
  private var availableNowTarget: Option[Long] = None

  override val schema: StructType = MorCdfSource.schemaOf(spark, path)

  private def seqOf(o: OffsetV2): Long = o match {
    case m: MorCdfOffset => m.seq
    case other => other.json.trim.toLong
  }

  // SupportsAdmissionControl replaces getOffset: the engine calls
  // latestOffset(start, limit) instead, which is what lets the cap
  // advance PER BATCH under Trigger.AvailableNow (a v1 getOffset would
  // be snapshotted once by the wrapper and the run would stop after the
  // first capped batch)
  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def initialOffset(): OffsetV2 = MorCdfOffset(initSeq)

  override def deserializeOffset(json: String): OffsetV2 =
    MorCdfOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    // the cap is in DML SEQUENCES; maxRows is the carrier the engine
    // round-trips back into latestOffset
    maxSeqsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(math.max(MorDelete.currentSeq(spark, path), initSeq))

  override def reportLatestOffset(): OffsetV2 =
    MorCdfOffset(math.max(MorDelete.currentSeq(spark, path), initSeq))

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    import org.apache.spark.sql.connector.read.streaming.ReadMaxRows
    val lo = Option(start).map(seqOf).getOrElse(initSeq)
    val cur = availableNowTarget
      .getOrElse(math.max(MorDelete.currentSeq(spark, path), initSeq))
    val seqCapped = limit match {
      case r: ReadMaxRows => math.min(cur, lo + r.maxRows)
      case _ => cur
    }
    // ROWS-based admission (`maxRowsPerBatch`): a sequence cap alone
    // lets one fat commit land beside many thin ones in a single batch;
    // the row estimates (manifest stats / parquet footers — metadata
    // only) split the range at COMMIT boundaries so per-batch rows stay
    // bounded. A single commit larger than the cap still admits whole —
    // per-commit attribution cannot split below commit granularity —
    // so the bound is max(cap, largest single commit).
    val capped = maxRowsPerBatch match {
      case Some(cap) if seqCapped > lo =>
        val est = MorDelete.changeRowEstimates(spark, path, lo, seqCapped)
        var acc = 0L
        var hi = lo
        var stop = false
        est.foreach { case (seq, rows) =>
          if (!stop) {
            if (hi == lo || acc + rows <= cap) { acc += rows; hi = seq }
            else stop = true
          }
        }
        hi
      case _ => seqCapped
    }
    MorCdfOffset(math.max(capped, lo))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val lo = start.map(o => seqOf(o: OffsetV2)).getOrElse(initSeq)
    val hi = seqOf(end: OffsetV2)
    // an un-advanced range resolves to the provably-empty feed inside
    // readChanges (no scan); the v1 contract wants isStreaming=true on
    // the returned frame, hence the bridge wrap of the batch plan
    val changes = MorDelete.readChanges(spark, path, lo, math.max(lo, hi))
    org.apache.spark.sql.GraftSqlBridge.streamingDataFrame(changes)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
}

/** The checkpointed offset: just the DML sequence. */
final case class MorCdfOffset(seq: Long) extends OffsetV1 {
  override def json: String = seq.toString
}

object MorCdfSource {
  /** Feed schema = the table's columns plus the CDF triple — fixed at
    * stream start (schema evolution mid-stream requires a restart, the
    * same contract Delta's CDF source imposes). */
  private[streaming] def schemaOf(spark: SparkSession, path: String): StructType = {
    val cur = MorDelete.currentSeq(spark, path)
    MorDelete.readChanges(spark, path, cur, cur).schema
  }
}

/** `spark.readStream.format("graft.streaming.MorCdfSourceProvider")
  * .option("path", table).option("fromSeq", seq).load()` */
final class MorCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "mor-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("mor-cdf source requires .option(\"path\", <table>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("mor-cdf", MorCdfSource.schemaOf(sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new MorCdfSource(sqlContext.sparkSession, pathOf(parameters),
      parameters.get("fromSeq").map(_.trim.toLong),
      parameters.get("maxSeqsPerBatch").map(_.trim.toLong),
      parameters.get("maxRowsPerBatch").map(_.trim.toLong))
}
