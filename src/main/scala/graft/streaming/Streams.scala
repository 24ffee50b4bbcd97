package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events stream.
  *
  * The reference treats streams as bounded tables (Kafka offset-range
  * splits, presto-kafka/.../KafkaSplitManager.java; no watermarks or
  * state anywhere — SURVEY.md §1.1), so this module is the Spark-native
  * capability upgrade: the same windowed shapes as queries/Events.scala,
  * run incrementally with event-time watermarks and custom keyed state.
  *
  * Sources here are file streams over the driver parquet (each file = one
  * micro-batch under Trigger.AvailableNow) — swap `.parquet(dir)` for
  * `.format("kafka")` and the plans are unchanged, which is the point.
  */
object Streams {

  /** The events schema as staged for streaming. `ts`'s physical shape
    * follows the fixture generation — parquet TIMESTAMP(NANOS) read as a
    * raw int64 under the nanosAsLong conf, or plain TIMESTAMP(MICROS) read
    * as TIMESTAMP_NTZ — so [[eventsStream]] peeks one footer (file streams
    * need a declared schema) and normalizes exactly like Tables.t does for
    * batch. An EMPTY source directory (producers not started yet — the
    * normal file-stream bootstrap) has no footer to peek; fall back to
    * the µs-fixture schema so the stream STARTS and picks files up as
    * they arrive rather than failing setup on schema inference. NOTE:
    * bootstrapping on a missing/empty directory COMMITS the stream to the
    * µs (TIMESTAMP_NTZ) shape for its lifetime — if the producer then
    * writes the other documented fixture shape (TIMESTAMP(NANOS) int64,
    * which batch Tables.t also accepts), arriving files mismatch the
    * declared schema and the query fails mid-stream; producers feeding a
    * cold-started stream must write µs timestamps. A NONEXISTENT
    * directory (not just empty) is the same bootstrap condition — file
    * streams watch paths that may not exist yet — so its path-not-found
    * AnalysisException takes the same fallback rather than failing setup.
    */
  def rawSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try spark.read.parquet(dir).schema
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("infer schema") ||
            e.getMessage.contains("does not exist") ||
            e.errorClass.exists(_.contains("PATH_NOT_FOUND")) =>
        StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampNTZType),
          StructField("user_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType),
          StructField("props", StringType)))
    }
  }

  final case class UserCount(user_id: Long, n: Long)
  final case class UserMilestone(user_id: Long, milestone: Long)

  /** File-stream over an events parquet *directory* — one file per
    * micro-batch, so a directory staged with N files exercises N
    * incremental state updates.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = rawSchema(spark, dir)
    // Spark's stream-source resolution rejects a nonexistent path even
    // with a declared schema (DataSource.sourceSchema PATH_NOT_FOUND), so
    // a cold-start watcher creates its watch directory — making the
    // not-yet-created and created-but-empty bootstrap conditions behave
    // identically (both commit to the µs fallback shape, see rawSchema).
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.mkdirs(p)
    val s = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    schema("ts").dataType match {
      case LongType => s.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => s.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling event-time window counts with a watermark: late events
    * beyond the watermark are dropped, state for closed windows is freed —
    * the unbounded-stream-safe version of events_tumbling_window.
    */
  def tumblingCounts(events: DataFrame, gap: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", gap)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,8)")).cast("double").as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows (4h inactivity gap) per user with watermarking. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * counts — the KeyValueGroupedDataset state API the reference has no
    * counterpart for.
    */
  def runningUserCounts(spark: SparkSession, events: DataFrame): Dataset[UserCount] = {
    import spark.implicits._
    events
      .select(col("user_id"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val newCount = state.getOption.getOrElse(0L) + rows.size
          state.update(newCount)
          UserCount(user, newCount)
      }
  }

  /** Streaming exact dedup on arrival (the ingest-pipeline shape: an
    * at-least-once upstream feeding an exactly-once corpus) —
    * `dropDuplicatesWithinWatermark`, NOT plain `dropDuplicates`: with the
    * event-time column absent from the key subset, plain dropDuplicates
    * keeps every id in state forever (StreamingSpec's bounded-state test
    * catches exactly this — state grew one epoch per epoch). The
    * WithinWatermark variant dedups on the bare key and EVICTS each entry
    * once the watermark passes its event time + horizon, so state is
    * bounded by the horizon's id arrival rate no matter how long the
    * stream runs. Duplicates inside the horizon hit state; ones arriving
    * beyond it are dropped as late rows — either way each id is emitted
    * once.
    */
  def dedupedEvents(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark("event_id")

  /** flatMapGroupsWithState: emit one row each time a user's cumulative
    * event count crosses a multiple of `every` — multi-row, append-mode
    * keyed-state output (vs mapGroupsWithState's one-row-per-group). The
    * emitted (user, milestone) SET is deterministic regardless of
    * micro-batch boundaries: each crossing fires exactly once.
    */
  def userMilestones(
      spark: SparkSession, events: DataFrame, every: Long = 10): Dataset[UserMilestone] = {
    import spark.implicits._
    events
      .select(col("user_id"))
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, UserMilestone](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          ((before / every + 1) to (after / every))
            .map(m => UserMilestone(user, m * every)).iterator
      }
  }

  /** Watermarked stream-stream interval join: each view event joins the
    * same user's purchase events that follow within `within`. Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so Spark can age out join state past the horizon — the unbounded-safe
    * funnel-attribution shape (view → purchase) that a bounded-table
    * engine cannot express incrementally.
    */
  def viewToPurchase(events: DataFrame, within: String = "1 hour",
      lateness: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** Run any streaming frame to an in-memory table with AvailableNow
    * (process-everything-then-stop) and wait for completion. Returns the
    * query so callers can inspect progress/metrics.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "update"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** EXACTLY-ONCE streaming ingest into a merge-on-read table — the
    * Delta-sink idempotence pattern over this engine's manifest protocol:
    * each micro-batch upserts through [[graft.sources.MorUpsert.merge]]
    * carrying `(appId, batchId)` as its transaction marker, committed
    * atomically WITH the batch's manifest. Structured Streaming replays
    * the in-flight batch after a restart (foreachBatch is at-least-once
    * by contract); the replay's marker proves the version already
    * applied and the merge returns without reading or writing — so the
    * table sees every micro-batch exactly once no matter how often the
    * query restarts. Upsert semantics on `keyCols` additionally make the
    * sink idempotent per KEY, so an at-least-once UPSTREAM (a source that
    * re-delivers rows across batches) still converges.
    *
    * Runs with AvailableNow (process-everything-then-stop); a production
    * deployment swaps the trigger for a processing-time one and keeps
    * everything else. Scale shape: per batch, one merge = one tombstone
    * batch + sequence-named appends + one manifest rename — cost ∝ batch
    * size, never table size; schedule [[graft.sources.Maintenance
    * .maintain]] beside it exactly as the morchurn rehearsal drives.
    */
  def morSink(stream: DataFrame, path: String, keyCols: Seq[String],
      checkpointDir: String, appId: String): StreamingQuery = {
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.MorUpsert.merge(batch.sparkSession, path, batch.toDF(),
          keyCols, txn = Some((appId, batchId)))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming CHANGE DATA FEED source over a merge-on-read table — see
    * [[MorCdfSource]]: each micro-batch is `readChanges(last, current]`,
    * the last-synced sequence rides the checkpoint. Start `fromSeq` at
    * the replica's seed snapshot sequence. */
  def morSource(spark: SparkSession, path: String, fromSeq: Long,
      maxSeqsPerBatch: Option[Long] = None,
      maxRowsPerBatch: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format("graft.streaming.MorCdfSourceProvider")
      .option("path", path)
      .option("fromSeq", fromSeq)
    maxSeqsPerBatch.foreach(m => r.option("maxSeqsPerBatch", m))
    maxRowsPerBatch.foreach(m => r.option("maxRowsPerBatch", m))
    r.load()
  }

  /** EXACTLY-ONCE replica maintenance from a [[morSource]] feed: each
    * micro-batch net-applies through [[graft.sources.MorDelete
    * .applyChanges]] carrying `(appId, batchId)` as its txn marker —
    * the same replay-proof discipline as [[morSink]], so a restarted
    * query (which re-delivers the in-flight batch) cannot double-apply.
    * Together with [[morSource]]'s checkpointed sequence this closes the
    * source→feed→replica chain end to end: every source commit lands on
    * the replica exactly once across any number of restarts. */
  def morReplica(feed: DataFrame, replicaPath: String, keyCols: Seq[String],
      checkpointDir: String, appId: String): StreamingQuery = {
    val q = feed.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.MorUpsert.applyChanges(batch.sparkSession, replicaPath,
          batch.toDF(), keyCols, txn = Some((appId, batchId)))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** CDF-DRIVEN INCREMENTAL DEDUP — exactly-once maintenance of a
    * DEDUPED survivor table from a merge-on-read corpus's change feed:
    * the composition of [[morSource]] (checkpointed sequence offsets)
    * with [[graft.llm.Dedup.incrementalKeep]] (greedy first-arrival
    * MinHash dedup against the persisted signature store). Each
    * micro-batch:
    *
    *  1. nets the feed to final events per key (same newest-wins rule as
    *     [[graft.sources.MorUpsert.applyChanges]]);
    *  2. dedups the batch's INSERTS against (persisted survivors ∪ the
    *     batch itself) — the survivor table carries each doc's MinHash
    *     signature in `__sig`, so nothing in the corpus re-shingles:
    *     per-batch cost is one columnar (id, sig) scan plus work ∝ the
    *     delta, never ∝ corpus text;
    *  3. commits survivors (each with its signature) AND propagated
    *     deletes in ONE `applyChanges` call carrying `(appId, batchId)`
    *     as the txn marker — a restart's replayed batch is provably
    *     applied and commits nothing, so the survivor table sees every
    *     source commit exactly once.
    *
    * Suppression is permanent: deleting a survivor from the SOURCE
    * deletes it from the replica, but docs it previously suppressed do
    * not resurface (their signatures were never admitted) — the standard
    * streaming-dedup semantics; a full rebuild is the recovery path if
    * resurrection is required.
    *
    * The survivor table self-seeds (empty, schema = feed columns +
    * `__sig`) on first use; seeding is idempotent (zero rows), so a
    * crash between seed and first commit replays safely.
    */
  def morDedupMaintain(spark: SparkSession, sourcePath: String,
      dedupPath: String, idCol: String,
      elems: org.apache.spark.sql.Column,
      checkpointDir: String, appId: String,
      fromSeq: Long = 0L, maxSeqsPerBatch: Option[Long] = None,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.9,
      hotBucketCap: Int = 1000): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val feed = morSource(spark, sourcePath, fromSeq, maxSeqsPerBatch)
    val q = feed.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        val meta = Seq("_change_type", "_commit_version", "_commit_timestamp")
        val dataCols = batch.columns.toSeq.filterNot(meta.contains)
        // net the batch: one final event per key (newest commit wins;
        // insert outranks delete within a commit)
        val order =
          (if (batch.columns.contains("_commit_version"))
            Seq(col("_commit_version").desc) else Nil) :+
            when(col("_change_type") === "insert", 0).otherwise(1).asc
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(order: _*)
        val finals = batch.toDF()
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint(true)
        val ins = finals.filter(col("_change_type") === "insert")
          .select(dataCols.map(col): _*)
        val dels = finals.filter(col("_change_type") === "delete")
          .select(col(idCol))
        // self-seed the survivor table: empty frame at the full schema
        // (idempotent — zero rows — so a replayed seed is harmless)
        if (!new java.io.File(dedupPath).exists()) {
          ins.limit(0)
            .withColumn("__sig", graft.llm.TextOps.minhashSignature(elems, k))
            .coalesce(1).write.parquet(dedupPath)
        }
        val corpus = graft.sources.MorDelete.read(sp, dedupPath)
        val kept = graft.llm.Dedup
          .incrementalKeep(ins, corpus, idCol, elems,
            k = k, bands = bands, threshold = threshold,
            hotBucketCap = hotBucketCap)
          .filter(col("keep"))
          .select(col("id").as("__kid"), col("sig").as("__sig"))
        val survivors = ins
          .join(kept, col(idCol) === col("__kid"))
          .drop("__kid")
          .withColumn("_change_type", lit("insert"))
        // delete rows need the survivor schema (only the key matters to
        // the tombstone; the rest rides as NULL)
        val delRows = survivors.drop("_change_type").schema.fields
          .filterNot(_.name == idCol)
          .foldLeft(dels)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
          .select(survivors.columns.filterNot(_ == "_change_type").map(col): _*)
          .withColumn("_change_type", lit("delete"))
        graft.sources.MorUpsert.applyChanges(sp, dedupPath,
          survivors.unionByName(delRows), Seq(idCol),
          txn = Some((appId, batchId)))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Continuous parquet sink with checkpointing — the durable-output path
    * (exactly-once per micro-batch via the checkpoint + file-sink log).
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
}
