package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{Maintenance, MorDelete, MorUpsert}

/** Change Data Feed over the manifest protocol (MorDelete.readChanges /
  * snapshotDiff) and the idempotent txn markers (MorUpsert.merge's `txn`)
  * — the incremental-consumption and exactly-once-ingest surfaces.
  * Events are checked as exact row SETS with version attribution, the
  * clean-range refusals are pinned, and txn markers are proven to carry
  * across unrelated commits, restores, and replays.
  */
class ChangesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 100 rows (k, s, x), 4 base files. */
  private def fresh(): String = {
    val loc = Files.createTempDirectory("graft_cdf").toString + "/t"
    val sp = spark; import sp.implicits._
    (1 to 100).map(i => (i.toLong, s"v$i", i * 10.0)).toDF("k", "s", "x")
      .repartition(4).write.parquet(loc)
    loc
  }

  private def events(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double, String, Long)] =
    df.select("k", "s", "x", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), r.getLong(4))).toSet

  test("per-commit inserts and deletes with exact version attribution") {
    val loc = fresh()
    // v1: delete k % 10 == 3 (10 rows)
    MorDelete.delete(spark, loc, col("k") % 10 === 3, Seq("k"))
    val v1 = MorDelete.currentSeq(spark, loc)
    // v2: update k ∈ {1, 2}, insert k ∈ {201, 202}
    val sp = spark; import sp.implicits._
    val src = Seq((1L, "u1", 1010.0), (2L, "u2", 1020.0),
      (201L, "n1", 1.0), (202L, "n2", 2.0)).toDF("k", "s", "x")
    MorUpsert.upsert(spark, loc, src, Seq("k"))
    val v2 = MorDelete.currentSeq(spark, loc)
    assert(v1 < v2)

    val delV1 = (1 to 100).filter(_ % 10 == 3)
      .map(i => (i.toLong, s"v$i", i * 10.0, "delete", v1)).toSet
    val delV2 = Set((1L, "v1", 10.0, "delete", v2), (2L, "v2", 20.0, "delete", v2))
    val insV2 = Set((1L, "u1", 1010.0, "insert", v2), (2L, "u2", 1020.0, "insert", v2),
      (201L, "n1", 1.0, "insert", v2), (202L, "n2", 2.0, "insert", v2))

    val all = MorDelete.readChanges(spark, loc, 0)
    assert(events(all) == delV1 ++ delV2 ++ insV2)
    // every event carries its commit's wall-clock instant
    assert(all.filter(col("_commit_timestamp").isNull).count() == 0)

    // range slicing: (v1, v2] sees only the merge; (0, v1] only the delete
    assert(events(MorDelete.readChanges(spark, loc, v1)) == delV2 ++ insV2)
    assert(events(MorDelete.readChanges(spark, loc, 0, v1)) == delV1)
    // an empty range is empty without scanning
    assert(MorDelete.readChanges(spark, loc, v2, v2).isEmpty)
  }

  test("a row inserted and deleted inside one range emits both halves") {
    val loc = fresh()
    val sp = spark; import sp.implicits._
    MorUpsert.upsert(spark, loc, Seq((300L, "tmp", 3.0)).toDF("k", "s", "x"), Seq("k"))
    val vIns = MorDelete.currentSeq(spark, loc)
    MorDelete.delete(spark, loc, col("k") === 300, Seq("k"))
    val vDel = MorDelete.currentSeq(spark, loc)
    val ch = events(MorDelete.readChanges(spark, loc, 0).filter(col("k") === 300))
    assert(ch == Set((300L, "tmp", 3.0, "insert", vIns), (300L, "tmp", 3.0, "delete", vDel)))
  }

  test("physical reorg inside the range refuses loudly; snapshotDiff covers it") {
    val loc = fresh()
    MorDelete.delete(spark, loc, col("k") % 10 === 3, Seq("k"))
    MorDelete.compact(spark, loc)
    val e = intercept[IllegalArgumentException](
      MorDelete.readChanges(spark, loc, 0).collect())
    assert(e.getMessage.contains("snapshotDiff"))

    val d = MorDelete.snapshotDiff(spark, loc, 0)
    val dels = d.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(dels == (1 to 100).filter(_ % 10 == 3).map(_.toLong).toSet)
    assert(d.filter(col("_change_type") === "insert").isEmpty)

    // a range STARTING at the post-compaction state is clean again
    val vc = MorDelete.currentSeq(spark, loc)
    MorDelete.delete(spark, loc, col("k") === 50, Seq("k"))
    val after = events(MorDelete.readChanges(spark, loc, vc))
    assert(after.map(_._1) == Set(50L) && after.head._4 == "delete")
  }

  test("sidecar merge inside the range also refuses (kill versions collapse)") {
    val loc = fresh()
    MorDelete.delete(spark, loc, col("k") === 1, Seq("k"))
    MorDelete.delete(spark, loc, col("k") === 2, Seq("k"))
    MorDelete.compactSidecar(spark, loc)
    val e = intercept[IllegalArgumentException](
      MorDelete.readChanges(spark, loc, 0).collect())
    assert(e.getMessage.contains("snapshotDiff"))
  }

  test("an expired anchor fails loudly, like readAt") {
    val loc = fresh()
    MorDelete.delete(spark, loc, col("k") === 1, Seq("k"))
    MorDelete.delete(spark, loc, col("k") === 2, Seq("k"))
    Maintenance.vacuum(loc, retentionMs = 0L, stageGraceMs = 0L)
    val e = intercept[IllegalStateException](MorDelete.readChanges(spark, loc, 0))
    assert(e.getMessage.contains("vacuum") || e.getMessage.contains("predates"))
  }

  test("txn markers: a replayed version commits nothing, exactly once") {
    val loc = fresh()
    val sp = spark; import sp.implicits._
    val batch0 = Seq((1L, "b0", 1.0)).toDF("k", "s", "x")
    val s0 = MorUpsert.merge(spark, loc, batch0, Seq("k"), txn = Some(("app", 0L)))
    assert(!s0.replaySkipped && s0.keysUpdated == 1)
    val view = MorDelete.read(spark, loc).orderBy("k").collect().toSeq

    // replay of version 0: skipped, view byte-identical, no new commit
    val ordBefore = MorDelete.manifests(loc).last.ordinal
    val r0 = MorUpsert.merge(spark, loc, batch0, Seq("k"), txn = Some(("app", 0L)))
    assert(r0.replaySkipped && r0.keysUpdated == 0 && r0.filesAppended == 0)
    assert(MorDelete.manifests(loc).last.ordinal == ordBefore)
    assert(MorDelete.read(spark, loc).orderBy("k").collect().toSeq == view)

    // markers carry across UNRELATED commits (the .copy discipline)
    MorDelete.delete(spark, loc, col("k") === 99, Seq("k"))
    val r0b = MorUpsert.merge(spark, loc, batch0, Seq("k"), txn = Some(("app", 0L)))
    assert(r0b.replaySkipped)

    // a NEWER version applies; an app id namespace is independent
    val s1 = MorUpsert.merge(spark, loc,
      Seq((2L, "b1", 2.0)).toDF("k", "s", "x"), Seq("k"), txn = Some(("app", 1L)))
    assert(!s1.replaySkipped)
    val other = MorUpsert.merge(spark, loc,
      Seq((3L, "o0", 3.0)).toDF("k", "s", "x"), Seq("k"), txn = Some(("other", 0L)))
    assert(!other.replaySkipped)
  }

  test("restore rolls back data, never txn markers") {
    val loc = fresh()
    val sp = spark; import sp.implicits._
    MorDelete.delete(spark, loc, col("k") === 7, Seq("k"))
    val preBatch = MorDelete.currentSeq(spark, loc)
    MorUpsert.merge(spark, loc, Seq((1L, "b5", 5.0)).toDF("k", "s", "x"),
      Seq("k"), txn = Some(("app", 5L)))
    MorDelete.restore(spark, loc, preBatch)
    // the batch's data rolled back …
    assert(MorDelete.read(spark, loc).filter(col("s") === "b5").isEmpty)
    // … but its marker survives: the replay still commits nothing
    val r = MorUpsert.merge(spark, loc, Seq((1L, "b5", 5.0)).toDF("k", "s", "x"),
      Seq("k"), txn = Some(("app", 5L)))
    assert(r.replaySkipped)
    assert(MorDelete.read(spark, loc).filter(col("s") === "b5").isEmpty)
  }

  test("applyChanges replicates a table through incremental feed syncs") {
    val src = fresh()
    val sp = spark; import sp.implicits._
    // the replica starts as a byte-copy of the source's initial state
    val replica = Files.createTempDirectory("graft_cdc_replica").toString + "/t"
    spark.read.parquet(src).repartition(2).write.parquet(replica)
    var cursor = MorDelete.currentSeq(spark, src)

    def view(loc: String): Seq[(Long, String, Double)] =
      MorDelete.read(spark, loc).select("k", "s", "x")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted
    def sync(): Unit = {
      val now = MorDelete.currentSeq(spark, src)
      val ordBefore = MorDelete.manifests(replica).lastOption.map(_.ordinal)
      val stats = MorUpsert.applyChanges(spark, replica,
        MorDelete.readChanges(spark, src, cursor, now), Seq("k"),
        txn = Some(("cdc", now)))
      // the whole batch lands as ONE commit — a crash can never leave the
      // replica between a batch's upserts and its deletes
      if (stats.keysUpserted + stats.keysDeleted > 0 || !stats.replaySkipped)
        assert(MorDelete.manifests(replica).last.ordinal ==
          ordBefore.map(_ + 1).getOrElse(MorDelete.manifests(replica).last.ordinal),
          "applyChanges must publish exactly one manifest per batch")
      // and the txn marker makes a replayed batch provably applied
      val replay = MorUpsert.applyChanges(spark, replica,
        MorDelete.readChanges(spark, src, cursor, now), Seq("k"),
        txn = Some(("cdc", now)))
      assert(replay.replaySkipped)
      cursor = now
      assert(view(replica) == view(src), "replica must equal source after a sync")
    }

    // round 1: one delete + one upsert, synced together
    MorDelete.delete(spark, src, col("k") % 10 === 3, Seq("k"))
    MorUpsert.upsert(spark, src,
      Seq((1L, "u1", 11.0), (200L, "n", 2.0)).toDF("k", "s", "x"), Seq("k"))
    sync()
    // round 2: a key updated twice then deleted — history collapses to
    // one terminal delete on the replica
    MorUpsert.upsert(spark, src, Seq((1L, "u2", 12.0)).toDF("k", "s", "x"), Seq("k"))
    MorUpsert.upsert(spark, src, Seq((1L, "u3", 13.0)).toDF("k", "s", "x"), Seq("k"))
    MorDelete.delete(spark, src, col("k") === 1, Seq("k"))
    MorDelete.delete(spark, src, col("k") === 200, Seq("k"))
    sync()
    // round 3: nothing changed — a no-op sync applies cleanly
    sync()
    // a physical reorg on the SOURCE forces the fallback: the net
    // snapshotDiff applies the same way (no version column)
    MorDelete.delete(spark, src, col("k") === 50, Seq("k"))
    MorDelete.compact(spark, src)
    val now = MorDelete.currentSeq(spark, src)
    MorUpsert.applyChanges(spark, replica,
      MorDelete.snapshotDiff(spark, src, cursor, now), Seq("k"))
    cursor = now
    assert(view(replica) == view(src))
  }

  test("a zero-change batch still advances its txn version") {
    val loc = fresh()
    val sp = spark; import sp.implicits._
    // matches nothing, inserts nothing (insertUnmatched = false)
    val st = MorUpsert.merge(spark, loc,
      Seq((999L, "zz", 0.0)).toDF("k", "s", "x"), Seq("k"),
      insertUnmatched = false, txn = Some(("app", 3L)))
    assert(!st.replaySkipped && st.keysUpdated == 0 && st.rowsInserted == 0)
    val r = MorUpsert.merge(spark, loc,
      Seq((999L, "zz", 0.0)).toDF("k", "s", "x"), Seq("k"),
      insertUnmatched = false, txn = Some(("app", 3L)))
    assert(r.replaySkipped)
  }
}
