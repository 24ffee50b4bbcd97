package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.Streams

/** Streaming equivalence specs: the incremental (watermarked) plans must
  * converge to the same answer as the batch plans over the same files
  * once every micro-batch is processed (Trigger.AvailableNow).
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var eventsDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
    // stage the single events parquet file as a 4-file directory (the file
    // source requires a directory; 4 files → 4 micro-batches)
    eventsDir = java.nio.file.Files.createTempDirectory("graft_events").toString + "/events"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // range-partition by ts so file order ≈ arrival order: with random
    // file order the watermark would (correctly) drop cross-file late
    // events and batch equivalence wouldn't hold
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartitionByRange(4, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(eventsDir)
    // the file source orders batches by (modification time, path); the
    // writer stamps all parts with one mtime, so make arrival order
    // explicit and deterministic: mtime ascending in range (path) order
    val parts = new java.io.File(eventsDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(1000000L + i * 60000L) }
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def batchEvents = Tables.t(spark, "/root/testdata/sf0.001", "events")

  test("eventsStream starts on an EMPTY source directory (declared-schema fallback)") {
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_empty_stream").toString
    // no footer to peek: rawSchema must fall back to the declared events
    // schema instead of failing setup, so the stream can start and pick
    // up files as producers write them
    val stream = Streams.eventsStream(spark, emptyDir)
    assert(stream.isStreaming, "empty-dir stream must construct")
    assert(stream.schema.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(stream.schema("ts").dataType.typeName.startsWith("timestamp"),
      "fallback ts must normalize to a timestamp type")
  }

  test("eventsStream starts on a NONEXISTENT source directory (same bootstrap fallback)") {
    // a watched path that does not exist yet is the other cold-start
    // condition; its path-not-found AnalysisException must take the same
    // declared-schema fallback as the empty directory, not fail setup
    val ghost = java.nio.file.Files.createTempDirectory("graft_ghost").toString + "/not_yet"
    val stream = Streams.eventsStream(spark, ghost)
    assert(stream.isStreaming, "nonexistent-dir stream must construct")
    assert(stream.schema.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("streaming tumbling counts equal batch after availableNow") {
    val stream = Streams.eventsStream(spark, eventsDir)
    Streams.runToMemory(Streams.tumblingCounts(stream), "tumbling_out", "append")
    // append mode emits only watermark-closed windows; the final window may
    // be held back, so compare on the common (closed) prefix
    val got = spark.table("tumbling_out")
      .select(col("wstart").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toString).toSet
    val want = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toString).toSet
    assert(got.subsetOf(want), "streaming emitted a window batch disagrees with")
    assert(got.size >= (want.size * 7) / 10, s"too few closed windows: ${got.size} vs ${want.size}")
  }

  test("stream-stream interval join converges to the batch join") {
    val stream = Streams.eventsStream(spark, eventsDir)
    Streams.runToMemory(Streams.viewToPurchase(stream), "funnel_out", "append")
    val got = spark.table("funnel_out")
      .select(col("user_id"), col("view_id"), col("purchase_id"))
      .collect().map(_.toString).toSet
    val b = batchEvents
    val views = b.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    val purchases = b.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val want = views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 hour"))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
      .collect().map(_.toString).toSet
    assert(got.subsetOf(want), "streaming join emitted a pair batch disagrees with")
    assert(want.nonEmpty, "test data should contain view->purchase funnels")
    assert(got.size >= (want.size * 7) / 10,
      s"too few join results survived watermarking: ${got.size} vs ${want.size}")
  }

  test("streaming session windows match batch sessionization") {
    val stream = Streams.eventsStream(spark, eventsDir)
    Streams.runToMemory(Streams.sessionCounts(stream), "sessions_out", "append")
    val got = spark.table("sessions_out")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
      .collect().map(_.toString).toSet
    val want = batchEvents
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").cast("string"), col("n_events"))
      .collect().map(_.toString).toSet
    assert(got.subsetOf(want))
    assert(got.size >= (want.size * 7) / 10, s"too few closed sessions: ${got.size} vs ${want.size}")
  }

  test("mapGroupsWithState running counts reach batch totals") {
    val stream = Streams.eventsStream(spark, eventsDir)
    Streams.runToMemory(
      Streams.runningUserCounts(spark, stream).toDF(), "running_out", "update")
    // last update per user = total count
    val got = spark.table("running_out")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = batchEvents.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("streaming dedup collapses a doubled input to the batch distinct set") {
    // stage the events TWICE (second copy arrives later) — an
    // at-least-once upstream; dedup must emit each event_id exactly once
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup").toString + "/events"
    new java.io.File(dupDir).mkdirs()
    val parts = new java.io.File(eventsDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      val c1 = new java.io.File(dupDir, s"a$i.parquet")
      val c2 = new java.io.File(dupDir, s"b$i.parquet")
      java.nio.file.Files.copy(f.toPath, c1.toPath)
      java.nio.file.Files.copy(f.toPath, c2.toPath)
      c1.setLastModified(1000000L + i * 60000L)
      c2.setLastModified(2000000L + i * 60000L) // replays arrive after the originals
    }
    val stream = Streams.eventsStream(spark, dupDir)
    Streams.runToMemory(
      Streams.dedupedEvents(stream).select(col("event_id")), "dedup_out", "append")
    val got = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    val want = batchEvents.select(col("event_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(got.length == got.distinct.length, "dedup emitted a duplicate id")
    assert(got.toSeq == want.toSeq)
  }

  test("flatMapGroupsWithState milestones are batch-boundary independent") {
    val stream = Streams.eventsStream(spark, eventsDir)
    Streams.runToMemory(
      Streams.userMilestones(spark, stream, every = 10).toDF(), "milestones_out", "append")
    val got = spark.table("milestones_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = batchEvents.groupBy(col("user_id")).count()
      .collect().flatMap { r =>
        (1L to r.getLong(1) / 10).map(m => (r.getLong(0), m * 10))
      }.toSet
    assert(got == want)
  }

  test("streaming parquet sink is exactly-once under availableNow") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val stream = Streams.eventsStream(spark, eventsDir)
    Streams.runToParquet(
      stream.select(col("event_id"), col("user_id")),
      s"$tmp/out", s"$tmp/ckpt").awaitTermination()
    val written = spark.read.parquet(s"$tmp/out").count()
    assert(written == batchEvents.count())
  }

  test("morSink ingests micro-batches exactly once, across restarts and replays") {
    val sp = spark; import sp.implicits._
    import graft.sources.{MorDelete, MorUpsert}
    val tmp = java.nio.file.Files.createTempDirectory("graft_morsink").toString
    val loc = s"$tmp/t"
    (1 to 50).map(i => (i.toLong, s"v$i", i * 1.0)).toDF("k", "s", "x")
      .repartition(2).write.parquet(loc)

    // three single-row update files → three micro-batches (disjoint key
    // slices, so batch coalescing cannot change the converged state)
    val srcDir = new java.io.File(tmp, "updates"); srcDir.mkdirs()
    val updates = Seq((1L, "u1", 100.0), (2L, "u2", 200.0), (60L, "n60", 60.0))
    def stageFile(row: (Long, String, Double), i: Int): Unit = {
      val stageTmp = new java.io.File(tmp, s"stage$i")
      Seq(row).toDF("k", "s", "x").coalesce(1)
        .write.mode("overwrite").parquet(stageTmp.toString)
      val part = stageTmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, f"f$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L + i * 60000L); ()
    }
    updates.zipWithIndex.take(3).foreach { case (r, i) => stageFile(r, i) }
    val schema = spark.read.parquet(srcDir.toString).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val ckpt = s"$tmp/ckpt"

    Streams.morSink(stream, loc, Seq("k"), ckpt, appId = "spec-sink")
    val got = MorDelete.read(spark, loc)
    assert(got.count() == 51)
    assert(got.filter(col("k") === 1).select("s").head().getString(0) == "u1")
    assert(got.filter(col("k") === 60).select("x").head().getDouble(0) == 60.0)
    val view = got.orderBy("k", "s").collect().toSeq

    // restart with the SAME checkpoint and no new files: nothing replays
    Streams.morSink(stream, loc, Seq("k"), ckpt, appId = "spec-sink")
    assert(MorDelete.read(spark, loc).orderBy("k", "s").collect().toSeq == view)

    // a FORCED replay of the last batch (checkpoint lost, marker intact)
    // is provably applied and commits nothing — the exactly-once half the
    // checkpoint alone cannot give
    val r = MorUpsert.merge(spark, loc, Seq(updates.last).toDF("k", "s", "x"),
      Seq("k"), txn = Some(("spec-sink", 2L)))
    assert(r.replaySkipped)
    assert(MorDelete.read(spark, loc).orderBy("k", "s").collect().toSeq == view)

    // a genuinely new file continues the stream where it left off
    stageFile((3L, "u3", 300.0), 3)
    Streams.morSink(stream, loc, Seq("k"), ckpt, appId = "spec-sink")
    val after = MorDelete.read(spark, loc)
    assert(after.count() == 51)
    assert(after.filter(col("k") === 3).select("s").head().getString(0) == "u3")
    assert(MorDelete.liveState(spark, loc).txns("spec-sink") == 3L)
  }

  test("morSource → morReplica: exactly-once CDF sync across restarts, refusal on reorg") {
    val sp = spark; import sp.implicits._
    import graft.sources.{MorDelete, MorUpsert}
    val tmp = java.nio.file.Files.createTempDirectory("graft_morsource").toString
    val src = s"$tmp/src"; val rep = s"$tmp/rep"; val ckpt = s"$tmp/ckpt"
    (1 to 60).map(i => (i.toLong, i * 1.0)).toDF("k", "x")
      .repartition(2).write.parquet(src)
    // seed: enter manifest mode, pin s0, copy the s0 snapshot as the replica
    MorDelete.delete(spark, src, col("k") === -1, Seq("k"))
    val s0 = MorDelete.currentSeq(spark, src)
    MorDelete.readAt(spark, src, s0).write.parquet(rep)
    MorDelete.delete(spark, rep, col("k") === -1, Seq("k"))

    val feed = Streams.morSource(spark, src, fromSeq = s0)
    assert(feed.isStreaming)
    assert(Seq("_change_type", "_commit_version", "_commit_timestamp")
      .forall(feed.columns.contains))
    def sync(): Unit = { Streams.morReplica(
      Streams.morSource(spark, src, fromSeq = s0), rep, Seq("k"), ckpt, "spec-cdf"); () }
    def same(tag: String): Unit = assert(
      MorDelete.read(spark, rep).select("k", "x").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).sorted.toSeq ==
      MorDelete.read(spark, src).select("k", "x").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).sorted.toSeq, s"replica != source after $tag")

    // one batch carrying TWO commits (a delete and an upsert): net-applies
    MorDelete.delete(spark, src, col("k") % 10 === 3, Seq("k"))
    MorUpsert.upsert(spark, src,
      Seq((1L, 100.0), (100L, 1.0)).toDF("k", "x"), Seq("k"))
    sync(); same("first drain")

    // restart with nothing new: the checkpointed sequence suppresses the
    // batch entirely — the replica commits NOTHING
    val ords = MorDelete.manifests(rep).size
    sync(); same("empty drain")
    assert(MorDelete.manifests(rep).size == ords,
      "an un-advanced source must not commit on the replica")

    // the checkpoint resumes mid-history: only the new commit ships
    MorUpsert.upsert(spark, src, Seq((2L, 222.0)).toDF("k", "x"), Seq("k"))
    sync(); same("incremental drain")

    // a forced replay of the last applied batch (checkpoint lost, marker
    // intact) is provably applied and commits nothing
    val lastBatch = MorDelete.liveState(spark, rep).txns("spec-cdf")
    val view = MorDelete.read(spark, rep).select("k", "x").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val cur = MorDelete.currentSeq(spark, src)
    val replay = MorUpsert.applyChanges(spark, rep,
      MorDelete.readChanges(spark, src, s0, cur), Seq("k"),
      txn = Some(("spec-cdf", lastBatch)))
    assert(replay.replaySkipped, "the txn marker must prove the batch applied")
    same("forced replay")

    // a physical reorganization inside an unsynced range FAILS the query
    // loudly (per-commit attribution undefined) …
    val sClean = MorDelete.currentSeq(spark, src)
    MorDelete.delete(spark, src, col("k") === 4, Seq("k"))
    MorDelete.compact(spark, src)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](sync())
    assert(e.getMessage.contains("reorganized") || e.getMessage.contains("snapshotDiff"),
      s"unexpected failure: ${e.getMessage}")
    // … and the documented recovery re-seeds: net-apply snapshotDiff from
    // the last clean sequence, then restart from NOW with a fresh checkpoint
    MorUpsert.applyChanges(spark, rep,
      MorDelete.snapshotDiff(spark, src, sClean), Seq("k"))
    same("snapshotDiff re-seed")
    val s1 = MorDelete.currentSeq(spark, src)
    MorUpsert.upsert(spark, src, Seq((5L, 555.0)).toDF("k", "x"), Seq("k"))
    Streams.morReplica(Streams.morSource(spark, src, fromSeq = s1), rep,
      Seq("k"), s"$tmp/ckpt2", "spec-cdf2")
    same("post-recovery drain")

    // admission control: maxSeqsPerBatch=1 over a 3-commit backlog must
    // drain as MULTIPLE bounded batches under one AvailableNow run (the
    // maxFilesPerTrigger discipline in sequence units), converging to
    // the same replica
    val s2 = MorDelete.currentSeq(spark, src)
    MorUpsert.upsert(spark, src, Seq((6L, 666.0)).toDF("k", "x"), Seq("k"))
    MorUpsert.upsert(spark, src, Seq((7L, 777.0)).toDF("k", "x"), Seq("k"))
    MorDelete.delete(spark, src, col("k") === 8, Seq("k"))
    Streams.morReplica(
      Streams.morSource(spark, src, fromSeq = s2, maxSeqsPerBatch = Some(1L)),
      rep, Seq("k"), s"$tmp/ckpt3", "spec-cdf3")
    same("bounded-batch drain")
    assert(MorDelete.liveState(spark, rep).txns("spec-cdf3") >= 2L,
      "a 3-commit backlog at cap 1 must take multiple micro-batches")
  }

  test("dedup state is watermark-bounded: numRowsTotal plateaus across epochs") {
    // Four epochs of 1000 fresh ids, each shifted 40 days (past the
    // 30-day span of the base data + the 2h horizon), run through ONE
    // checkpointed dedup stream via four availableNow restarts. If
    // dropDuplicates state were unbounded, the state store would hold
    // epoch*1000 rows by the last run; the watermark purge must keep the
    // peak per-run state at ~one epoch regardless of how many epochs have
    // passed — THE property that lets dedup-on-arrival run forever.
    val tmp = java.nio.file.Files.createTempDirectory("graft_bounded").toString
    val srcDir = new java.io.File(tmp, "events"); srcDir.mkdirs()
    // raw physical shape (long nanos or µs timestamp) — shift via the
    // normalized timestamp so the arithmetic is shape-independent, then
    // stage; eventsStream re-normalizes whatever the writer produced
    val raw = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val epochRows = raw.count()

    var peaks = Vector.empty[Long]
    for (epoch <- 0 until 4) {
      val stageTmp = new java.io.File(tmp, s"stage$epoch")
      raw.withColumn("ts", col("ts") + expr(s"INTERVAL ${epoch * 40} DAYS"))
        .withColumn("event_id", col("event_id") + lit(epoch * 1000000L))
        .coalesce(1).write.mode("overwrite").parquet(stageTmp.toString)
      val part = stageTmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, f"e$epoch%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L + epoch * 60000L); ()

      val q = Streams.runToParquet(
        Streams.dedupedEvents(Streams.eventsStream(spark, srcDir.toString))
          .select(col("event_id")),
        s"$tmp/out", s"$tmp/ckpt")
      q.awaitTermination()
      val statePerBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsTotal)
      assert(statePerBatch.nonEmpty, s"epoch $epoch reported no state operator progress")
      peaks = peaks :+ statePerBatch.max
    }

    // every id passed through exactly once …
    val emitted = spark.read.parquet(s"$tmp/out").collect().map(_.getLong(0))
    assert(emitted.length == 4 * epochRows && emitted.distinct.length == emitted.length)
    // … yet no run's peak state ever approached the cumulative id count:
    // bounded at ~one epoch (+ the sub-horizon tail), with no upward trend
    assert(peaks.forall(_ <= epochRows + 100),
      s"state must stay ~one epoch, got peaks $peaks")
    assert(peaks.last <= peaks.head + 100,
      s"state must plateau, not trend upward: $peaks")
  }

  test("morSource rows-based admission: one fat + many thin commits, bounded batches") {
    val sp = spark; import sp.implicits._
    import graft.sources.{MorDelete, MorUpsert}
    val tmp = java.nio.file.Files.createTempDirectory("graft_rowscap").toString
    val src = s"$tmp/src"
    Seq.empty[(Long, Long)].toDF("k", "v").coalesce(1).write.parquet(src)
    def commit(rows: Seq[(Long, Long)]): Unit = {
      MorUpsert.merge(spark, src, rows.toDF("k", "v"), Seq("k")); ()
    }
    // one FAT commit (300 rows) then six thin ones (2 rows each)
    commit((1L to 300L).map(k => (k, k)))
    (0 until 6).foreach(i =>
      commit(Seq((1000L + 2 * i, 1L), (1001L + 2 * i, 1L))))

    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = Streams.morSource(spark, src, fromSeq = 0L,
        maxRowsPerBatch = Some(5L))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = sizes.toSeq
    assert(got.sum == 312L, s"every change must arrive exactly once: $got")
    // the fat commit admits WHOLE (attribution cannot split a commit) in
    // its own batch; every other batch respects the 5-row cap — with
    // 2-row commits that means thin commits pair up, never pile up
    assert(got.count(_ > 5L) == 1, s"only the fat commit may exceed the cap: $got")
    assert(got.filter(_ <= 5L).forall(s => s > 0 && s <= 5), got.toString)
    assert(got.size >= 4, s"the range must split across batches: $got")
  }

  test("morDedupMaintain: CDF-driven incremental dedup equals batch dedup, exactly once") {
    val sp = spark; import sp.implicits._
    import graft.sources.{MorDelete, MorUpsert}
    import graft.llm.TextOps
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdfdedup").toString
    val (src, rep, ckpt) = (s"$tmp/src", s"$tmp/dedup", s"$tmp/ckpt")

    // 50-word docs: one changed word flips 2 of 49 bigram shingles →
    // jaccard ≈ 0.92 (≥ 0.9, a near-dup); two changed words ≈ 0.85 (not)
    def doc(seed: Int, edits: Map[Int, String] = Map.empty): String =
      (0 until 50).map(i => edits.getOrElse(i, s"w${seed}_$i")).mkString(" ")
    val b1 = Seq(
      1L -> doc(1), 2L -> doc(2),
      3L -> doc(1),                            // exact dup of 1, SAME batch
      4L -> doc(2, Map(25 -> "zz")),           // near dup of 2, same batch
      5L -> doc(5))
    val b2 = Seq(
      6L -> doc(1, Map(10 -> "yy")),           // near dup of 1, CROSS batch
      7L -> doc(7),
      8L -> doc(5, Map(3 -> "aa", 40 -> "bb")), // 2 edits: NOT a dup of 5
      9L -> doc(7))                            // exact dup of 7, cross… same batch
    val b3 = Seq(
      10L -> doc(5),                           // exact dup of 5, cross batch
      11L -> doc(11))

    // the source table starts EMPTY (genesis carries no rows, so every
    // doc flows through the feed) and each slice lands as one commit
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .coalesce(1).write.parquet(src)
    def commit(rows: Seq[(Long, String)]): Unit =
      MorUpsert.merge(spark, src, rows.toDF("doc_id", "text"), Seq("doc_id"))
    commit(b1); commit(b2)

    val elems = TextOps.wordShingles(col("text"), 2)
    def maintain(): Unit = {
      Streams.morDedupMaintain(spark, src, rep, "doc_id", elems,
        ckpt, appId = "spec-dedup", maxSeqsPerBatch = Some(1L))
      ()
    }
    maintain()
    def survivors() = MorDelete.read(spark, rep).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors() == Set(1L, 2L, 5L, 7L, 8L),
      "same-batch and cross-batch duplicates must both be suppressed")
    // survivors carry their signature (the persisted signature store)
    assert(MorDelete.read(spark, rep).filter(col("__sig").isNull).isEmpty)

    // restart with the same checkpoint and nothing new: no version moves
    val v0 = MorDelete.currentSeq(spark, rep)
    maintain()
    assert(MorDelete.currentSeq(spark, rep) == v0,
      "an empty restart must not commit")

    // batch 3 continues from the checkpoint; a replica equals the batch
    // (greedy min-neighbor) dedup of the FULL corpus at every step
    commit(b3)
    maintain()
    assert(survivors() == Set(1L, 2L, 5L, 7L, 8L, 11L))

    // forced replay of the last applied batch (checkpoint lost, marker
    // intact): provably applied, nothing commits
    val lastBatch = MorDelete.liveState(spark, rep).txns("spec-dedup")
    val replay = MorUpsert.applyChanges(spark, rep,
      MorDelete.read(spark, rep).limit(1).withColumn("_change_type", lit("insert")),
      Seq("doc_id"), txn = Some(("spec-dedup", lastBatch)))
    assert(replay.replaySkipped, "the txn marker must prove the batch applied")

    // deletes propagate; previously-suppressed dups do NOT resurface
    MorDelete.deleteKeys(spark, src, Seq(7L).toDF("doc_id"), Seq("doc_id"))
    maintain()
    assert(survivors() == Set(1L, 2L, 5L, 8L, 11L),
      "a source delete must reach the survivor table")
    assert(!survivors().contains(9L),
      "suppression is permanent: 9 (dup of deleted 7) must not resurface")
  }
}
