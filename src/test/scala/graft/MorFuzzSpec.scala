package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{Maintenance, MorDelete, MorUpsert}

/** Property fuzz for the merge-on-read DML source: seeded random
  * sequences of resolved-view deletes, upserts, clause merges, and
  * full/partial compactions over a duplicate-keyed table, each step
  * checked against an in-memory SHADOW MODEL of the equality-delete
  * contract. Hand-written cases (MorDeleteSpec) pin each rule once; the
  * fuzz exercises their INTERACTIONS — a tombstone landing on an earlier
  * upsert's replacement, a clause merge over rows a partial compaction
  * just rewrote at the carried sequence, a snapshot pinned across all of
  * it — where sequencing bugs actually live.
  *
  * Shadow semantics (what the source promises):
  *  - DELETE(pred): keys of LIVE rows matching pred die, taking every
  *    live row that shares the key (equality contract over the resolved
  *    view, never raw files).
  *  - MERGE: matched = live keys ∩ source keys; the delete clause
  *    (evaluated over (target row, source row) pairs) claims keys first;
  *    remaining matched keys replace (all copies die, the source row
  *    appends); unmatched source keys insert.
  *  - compact(p): pure physical reorganization — never visible.
  *  - vacuum(0, 0): reclaims everything but the newest manifest — never
  *    visible to the LIVE view, but expires older snapshots.
  *  - readAt(seq captured earlier): the shadow as of that step, valid
  *    across every later mutation INCLUDING compactions (the manifest
  *    protocol retains replaced files), until a vacuum expired the
  *    pinned manifest — then it must fail LOUDLY, never return partial
  *    rows.
  */
class MorFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def visible(loc: String): Seq[(Long, Long)] =
    MorDelete.read(spark, loc).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def df(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(rows).toDF("k", "v")

  private def madd(a: Map[(Long, Long), Int], b: Map[(Long, Long), Int]) =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0) + b.getOrElse(k, 0))).toMap.filter(_._2 > 0)

  for (seed <- Seq(11, 42, 1234, 271828, 31415)) test(s"random DML sequence matches the shadow model (seed $seed)") {
    fuzzOnce(seed)
  }

  // the same shadow contract with the manifest body forced onto the
  // SHARDED (content-addressed list) form from the genesis commit on:
  // upserts/compactions churn the data-file set every few steps, so
  // shard grouping, reuse, and vacuum's shard liveness all exercise
  // under the full DML interaction surface
  for (seed <- Seq(7, 997)) test(s"random DML sequence matches the shadow model under sharded manifests (seed $seed)") {
    val fm = MorDelete.manifestFlatMax
    val tg = MorDelete.manifestShardTarget
    MorDelete.manifestFlatMax = 2
    MorDelete.manifestShardTarget = 2
    try fuzzOnce(seed)
    finally {
      MorDelete.manifestFlatMax = fm
      MorDelete.manifestShardTarget = tg
    }
  }

  // The DML fuzz's (k, v) columns are LONGs, where a narrowing cast
  // happens to preserve every value — the r15 unsoundness (unwrapping a
  // TRUNCATING cast) is invisible there. This fuzz runs the evaluator
  // over a FRACTIONAL column, where CAST(x AS INT) genuinely changes the
  // matched set, against the stats-free oracle. Mutation-verified: with
  // the canUpCast guard removed, this test fails.
  for (seed <- Seq(90210, 777)) test(s"stats evaluator fuzz over a fractional column (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val loc = Files.createTempDirectory("graft_statsfuzz").toString + "/t"
    val sp = spark; import sp.implicits._
    val rows = (0 until 400).map { i =>
      // every third string runs past the 64-char bound cap, so the
      // truncated-conservative bounds (prefix min, bumped-code-point
      // max) fuzz against the stats-free oracle alongside short values
      val cat = s"cat${rnd.nextInt(8)}"
      val s = if (i % 3 == 0) cat + ("x" * (60 + rnd.nextInt(40))) else cat
      (i.toLong, rnd.nextInt(200) + math.rint(rnd.nextDouble() * 10) / 10.0, s)
    }
    rows.toDF("k", "x", "s").repartitionByRange(4, col("x"))
      .sortWithinPartitions("x", "s").write.parquet(loc)
    assert(Maintenance.analyze(spark, loc) == 4L)

    def probe(step: Int): Unit = {
      val c = rnd.nextInt(200)
      val pred = rnd.nextInt(13) match {
        case 0 => expr(s"CAST(x AS INT) = $c")                       // truncating
        case 1 => expr(s"CAST(x AS INT) >= $c AND CAST(x AS INT) < ${c + 7}")
        case 2 => expr(s"TRY_CAST(x AS TINYINT) = ${c % 128}")       // overflow->NULL
        case 3 => expr(s"x >= $c.25 AND x < ${c + 11}.75")           // cast-free control
        case 4 => expr(s"CAST(x AS BIGINT) IN ($c, ${c + 3}, ${c + 9})")
        case 5 => expr(s"CAST(x AS DECIMAL(12,1)) <= $c.5")          // rescaling: opaque
        case 6 => expr(s"s = 'cat${c % 8}'")                         // string bounds
        case 7 => expr(s"s >= 'cat${c % 8}' AND x < ${c + 40}")
        case 8 => expr(s"s IN ('cat1', 'cat${c % 8}') OR CAST(s AS STRING) = 'zz'")
        case 9 => expr(s"s LIKE 'cat${c % 8}%' AND x >= $c")         // prefix range
        case 10 => expr(s"s LIKE '%t${c % 8}' OR s LIKE 'c_t${c % 8}'") // opaque shapes
        case 11 => // long literals compare against truncated bounds
          expr(s"s >= 'cat${c % 8}${"x" * 70}' AND s < 'cat${(c % 8) + 1}'")
        case 12 => expr(s"s LIKE 'cat${c % 8}xxx%'") // prefix past short values
      }
      def got(d: org.apache.spark.sql.DataFrame) =
        d.select("k").collect().map(_.getLong(0)).toSeq.sorted
      val oracle = got(MorDelete.readIgnoringStats(spark, loc).filter(pred))
      assert(got(MorDelete.readWhere(spark, loc, pred)) == oracle,
        s"seed $seed step $step: readWhere diverged under $pred")
      assert(got(MorDelete.read(spark, loc).filter(pred)) == oracle,
        s"seed $seed step $step: read().filter diverged under $pred")
    }
    for (step <- 0 until 20) probe(step)
    // vary the stats state: a delete leaves stats stale-but-sound, a
    // re-analyze refreshes only the appended/stats-less parts
    MorDelete.delete(spark, loc, col("x") < 40.0, Seq("k"))
    for (step <- 20 until 30) probe(step)
    Maintenance.analyze(spark, loc)
    for (step <- 30 until 40) probe(step)
  }

  private def fuzzOnce(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val loc = Files.createTempDirectory("graft_morfuzz").toString + "/t"
    // duplicate-keyed start: ~300 rows over ~100 keys, 4 files
    val rows0 = (0 until 300).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong))
    df(rows0).repartition(4).write.parquet(loc)
    var shadow: Vector[(Long, Long)] = rows0.toVector

    // one mid-run snapshot: captured at a random step, checked at the end
    // — compactions may intervene freely (the manifest protocol retains
    // the files older snapshots reference until vacuum)
    val snapStep = 2 + rnd.nextInt(4)
    var snapSeq = -1L
    var snapShadow: Vector[(Long, Long)] = Vector.empty

    for (step <- 0 until 12) {
      if (step == snapStep) {
        snapSeq = MorDelete.currentSeq(spark, loc)
        snapShadow = shadow
      }
      val preSeq = MorDelete.currentSeq(spark, loc)
      val preShadow = shadow
      rnd.nextInt(6) match {
        case 0 => // delete by key residue (may match nothing)
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          MorDelete.delete(spark, loc, col("k") % m === r, Seq("k"))
          val doomed = shadow.collect { case (k, _) if k % m == r => k }.toSet
          shadow = shadow.filterNot(x => doomed(x._1))
        case 1 => // delete by VALUE — only the resolved view gives this
          val cut = rnd.nextInt(1000)
          MorDelete.delete(spark, loc, col("v") < cut, Seq("k"))
          val doomed = shadow.collect { case (k, v) if v < cut => k }.toSet
          shadow = shadow.filterNot(x => doomed(x._1))
        case 2 | 3 => // upsert: replace matched keys, insert the rest
          val src = (0 until (3 + rnd.nextInt(6)))
            .map(_ => rnd.nextInt(120).toLong).distinct
            .map(k => (k, rnd.nextInt(1000).toLong))
          MorUpsert.upsert(spark, loc, df(src), Seq("k"))
          src.foreach { case (k, v) =>
            shadow = shadow.filterNot(_._1 == k) :+ ((k, v))
          }
        case 4 => // clause merge: pair-condition delete, rest update, insert
          val src = (0 until (3 + rnd.nextInt(6)))
            .map(_ => rnd.nextInt(120).toLong).distinct
            .map(k => (k, rnd.nextInt(1000).toLong))
          MorUpsert.merge(spark, loc, df(src), Seq("k"),
            deleteWhen = Some((col("v") + col("src_v")) % 3 === 0))
          val srcMap = src.toMap
          val liveKeys = shadow.map(_._1).toSet
          val matched = srcMap.keySet.intersect(liveKeys)
          val delK = matched.filter(k => shadow.exists { case (sk, sv) =>
            sk == k && (sv + srcMap(k)) % 3 == 0 })
          val updK = matched -- delK
          shadow = shadow.filterNot(x => delK(x._1) || updK(x._1))
          updK.foreach(k => shadow :+= ((k, srcMap(k))))
          (srcMap.keySet -- liveKeys).foreach(k => shadow :+= ((k, srcMap(k))))
        case 5 => // physical reorganization — data-file compaction (full
          // or density-targeted), sidecar-batch compaction, a manifest
          // stats publish, or an in-place z-order rewrite — sometimes
          // followed by an aggressive vacuum. None may change the LIVE
          // view; the vacuum expires older snapshots
          rnd.nextInt(5) match {
            case 0 => MorDelete.compact(spark, loc)
            case 1 => MorDelete.compact(spark, loc, minDoomedFraction = 0.5)
            case 2 => MorDelete.compactSidecar(spark, loc); ()
            case 3 =>
              if (MorDelete.liveState(spark, loc).dataFiles.nonEmpty)
                graft.sources.Maintenance.analyze(spark, loc)
            case 4 =>
              if (MorDelete.liveState(spark, loc).dataFiles.nonEmpty)
                graft.sources.Layout.zorderRewrite(spark, loc, Seq("k", "v"))
          }
          if (rnd.nextBoolean()) Maintenance.vacuum(loc, retentionMs = 0, stageGraceMs = 0)
      }
      if (rnd.nextInt(3) == 0) {
        // stats-pruned read equivalence under whatever stats state the
        // sequence left behind (none / fresh / stale-after-DML). The
        // ORACLE side is readIgnoringStats — the same resolve/tombstone
        // logic with the stats map STRIPPED, so it cannot share an
        // evaluator bug with either pruned path (readWhere and
        // read().filter both ride statsPredOf; comparing them to each
        // other let the r15 narrowing-cast unsoundness cancel out). The
        // generator deliberately emits the shapes that bug class lives
        // in: narrowing casts (BIGINT→INT/TINYINT truncate/wrap),
        // widening casts (must still prune, soundly), string casts
        // (lexical — must be opaque), IS NULL under a cast, fractional
        // literals against integer columns, and mixed AND/OR trees.
        val cut = rnd.nextInt(1000)
        val pred = rnd.nextInt(8) match {
          case 0 => col("v") < cut.toLong
          case 1 => col("k") >= (cut % 100).toLong
          case 2 => expr(s"CAST(v AS INT) = ${cut % 64}")          // narrowing: opaque
          case 3 => expr(s"TRY_CAST(v AS TINYINT) = ${cut % 100}") // overflow->NULL: opaque
          case 4 => expr(s"CAST(k AS DOUBLE) <= ${cut % 100}.5")   // widening: prunes
          case 5 => expr(s"CAST(v AS STRING) = '${cut % 100}'")    // lexical: opaque
          case 6 => expr(s"CAST(v AS SMALLINT) IS NULL OR v > $cut")
          case 7 => expr(s"v > $cut.5 AND (k < ${cut % 100} OR CAST(k AS INT) = ${cut % 50})")
        }
        def rows(d: org.apache.spark.sql.DataFrame) = d.select("k", "v")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        val oracle = rows(MorDelete.readIgnoringStats(spark, loc).filter(pred))
        assert(rows(MorDelete.readWhere(spark, loc, pred)) == oracle,
          s"seed $seed step $step: readWhere diverged from the stats-free oracle under $pred")
        assert(rows(MorDelete.read(spark, loc).filter(pred)) == oracle,
          s"seed $seed step $step: read().filter diverged from the stats-free oracle under $pred")
      }
      if (rnd.nextInt(3) == 0) {
        // crash injection: the garbage shapes a writer dying mid-commit
        // leaves — a manifest stage, an unreferenced (content-addressed)
        // shard, a renamed-but-never-published tombstone batch — must be
        // invisible to every subsequent read, never poison later DML,
        // and come out in a vacuum (asserted after the loop)
        val mdir = new java.io.File(MorDelete.manifestDir(loc))
        mdir.mkdirs()
        Files.writeString(new java.io.File(mdir, s".tmp-crash$step").toPath, "D half-written")
        Files.writeString(new java.io.File(mdir, s"shard-crash$step").toPath, "D no-such.parquet")
        new java.io.File(MorDelete.sidecarDir(loc), s"batch-${900 + step}-orphan").mkdirs()
        ()
      }
      assert(visible(loc) == shadow.sorted,
        s"seed $seed step $step diverged from the shadow model")
      if (rnd.nextInt(3) == 0) {
        // change-feed probe: the step's emitted changes must NET-APPLY the
        // pre-step shadow onto the post-step one (multisets — duplicate
        // rows are real here). snapshotDiff must agree on ANY step; the
        // per-commit feed must agree on clean (pure-DML) steps and is
        // allowed exactly two outs — the documented reorg refusal and a
        // vacuum-expired anchor, never a wrong answer
        def multiset(s: Seq[(Long, Long)]): Map[(Long, Long), Int] =
          s.groupBy(identity).view.mapValues(_.size).toMap
        def msub(a: Map[(Long, Long), Int], b: Map[(Long, Long), Int]) =
          a.map { case (k, n) => k -> (n - b.getOrElse(k, 0)) }.filter(_._2 > 0)
        def split(rows: Array[org.apache.spark.sql.Row]) = {
          val (i, d) = rows.partition(_.getString(2) == "insert")
          (multiset(i.toSeq.map(r => (r.getLong(0), r.getLong(1)))),
            multiset(d.toSeq.map(r => (r.getLong(0), r.getLong(1)))))
        }
        val (mPre, mNow) = (multiset(preShadow), multiset(shadow))
        try {
          val (ins, del) = split(MorDelete.snapshotDiff(spark, loc, preSeq)
            .select("k", "v", "_change_type").collect())
          assert(ins == msub(mNow, mPre) && del == msub(mPre, mNow),
            s"seed $seed step $step: snapshotDiff is not the shadow multiset diff")
        } catch {
          case e: IllegalStateException =>
            assert(e.getMessage.contains("vacuum") || e.getMessage.contains("expired"),
              s"seed $seed step $step: unexpected snapshotDiff failure: ${e.getMessage}")
        }
        try {
          val (ins, del) = split(MorDelete.readChanges(spark, loc, preSeq)
            .select("k", "v", "_change_type").collect())
          // net application — within one commit no row is both halves
          assert(msub(madd(msub(mPre, del), ins), mNow).isEmpty &&
            msub(mNow, madd(msub(mPre, del), ins)).isEmpty,
            s"seed $seed step $step: readChanges does not net-apply the shadow delta")
        } catch {
          case e: IllegalArgumentException =>
            assert(e.getMessage.contains("snapshotDiff"),
              s"seed $seed step $step: unexpected readChanges refusal: ${e.getMessage}")
          case e: IllegalStateException =>
            assert(e.getMessage.contains("vacuum") || e.getMessage.contains("expired"),
              s"seed $seed step $step: unexpected readChanges failure: ${e.getMessage}")
        }
      }
    }
    if (snapSeq >= 0) {
      // the snapshot either replays its step's shadow exactly, or — when
      // a vacuum expired every manifest at or below its sequence — fails
      // loudly; a silent partial read is the one forbidden outcome
      try {
        val pinned = MorDelete.readAt(spark, loc, snapSeq).select("k", "v")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(pinned == snapShadow.sorted,
          s"seed $seed: snapshot at step $snapStep must replay the shadow of that step")
      } catch {
        case e: IllegalStateException =>
          assert(e.getMessage.contains("expired") ||
            e.getMessage.contains("no retained snapshot"),
            s"seed $seed: unexpected snapshot failure: ${e.getMessage}")
          assert(MorDelete.currentSeq(spark, loc) > snapSeq,
            s"seed $seed: a snapshot at the current sequence must never expire")
      }
    }
    // terminal sweep: every injected crash artifact reclaims, and the
    // live view is bit-identical across it
    Maintenance.vacuum(loc, retentionMs = 0, stageGraceMs = 0)
    assert(visible(loc) == shadow.sorted,
      s"seed $seed: the live view must survive the terminal vacuum")
    val leftoverCrash =
      Option(new java.io.File(MorDelete.manifestDir(loc)).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.contains("crash")) ++
      Option(new java.io.File(MorDelete.sidecarDir(loc)).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith("-orphan"))
    assert(leftoverCrash.isEmpty,
      s"seed $seed: vacuum left crash garbage: ${leftoverCrash.map(_.getName).mkString(", ")}")
  }

  // Partition-VALUE pruning over every inferrable partition type. The
  // r16 evaluator published a binary STRING bound for any value that
  // wasn't long/ISO-date parsable — but Spark infers DOUBLE for x=1.5
  // and TIMESTAMP for ts=2020-01-09 00%3A00%3A00 and coerces filter
  // literals to that type, so the string compare silently mis-pruned.
  // This fuzz drives each partition dtype with BOTH literal spellings
  // (typed and string) against the stats-free oracle.
  for (seed <- Seq(4242, 555)) test(s"partition-type fuzz: every inferred dtype prunes soundly (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val sp = spark; import sp.implicits._
    // (label, partition values in path spelling, literal spellings to probe)
    val shapes: Seq[(String, Seq[String], Seq[Any])] = Seq(
      ("int", Seq("1", "7", "42"), Seq(7, "7", 41L, "08")),
      ("double", Seq("0.5", "1.5", "2.25"), Seq(1.5, "1.50", "0.6", 2.25)),
      ("bigint", Seq("9007199254740993", "3", "9007199254740995"),
        Seq(9007199254740993L, "9007199254740993", 4L)),
      ("string", Seq("EU", "US", "apac"), Seq("EU", "ap", "Z")),
      ("ts", Seq("2020-01-01 00:00:00", "2020-01-05 00:00:00", "2021-06-09 12:30:00"),
        Seq("2020-1-2", "2020-01-05 00:00:00",
          java.sql.Timestamp.valueOf("2020-06-01 00:00:00"))),
      ("date", Seq("2020-1-1", "2020-1-5", "2021-6-9"),
        Seq("2020-01-02", java.sql.Date.valueOf("2020-01-05"), "2020-1-5")),
      // mixed spellings widen to STRING; a numeric literal probe would
      // ANSI-cast 'abc' and fail in SPARK itself, so only string probes
      ("mixed", Seq("1.5", "abc", "2020-01-01"), Seq("1.5", "abc", "2020-01-01")))
    for ((label, vals, lits) <- rnd.shuffle(shapes).take(5)) {
      val loc = Files.createTempDirectory(s"graft_pfuzz_$label").toString + "/t"
      (1 to 90).map(i => (i.toLong, vals(i % vals.size)))
        .toDF("k", "p").repartition(2).write.partitionBy("p").parquet(loc)
      MorDelete.delete(spark, loc, col("k") % 19 === 0, Seq("k"))
      if (rnd.nextBoolean()) Maintenance.analyze(spark, loc, Seq("k"))
      // dtype parity between the indexed default read and the oracle
      assert(MorDelete.read(spark, loc).schema("p").dataType ==
        MorDelete.readIgnoringStats(spark, loc).schema("p").dataType,
        s"$label: read paths disagree on the partition dtype")
      def ks(df: org.apache.spark.sql.DataFrame) =
        df.select("k").collect().map(_.getLong(0)).toSeq.sorted
      for (l <- lits; op <- Seq("=", ">", "<=")) {
        val c = col("p"); val lc = l match {
          case s: String => lit(s); case o => lit(o)
        }
        val pred = op match {
          case "=" => c === lc; case ">" => c > lc; case _ => c <= lc
        }
        val oracle = ks(MorDelete.readIgnoringStats(spark, loc).filter(pred))
        assert(ks(MorDelete.readWhere(spark, loc, pred)) == oracle,
          s"$label: readWhere diverged under p $op $l")
        assert(ks(MorDelete.read(spark, loc).filter(pred)) == oracle,
          s"$label: read().filter diverged under p $op $l")
      }
      // IS NULL / IS NOT NULL stay count-driven for every shape
      for (pred <- Seq(col("p").isNull, col("p").isNotNull)) {
        val oracle = ks(MorDelete.readIgnoringStats(spark, loc).filter(pred))
        assert(ks(MorDelete.readWhere(spark, loc, pred)) == oracle,
          s"$label: null-presence diverged")
      }
    }
  }
}
