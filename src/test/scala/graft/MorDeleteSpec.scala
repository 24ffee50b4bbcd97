package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.MorDelete

/** Merge-on-read DELETE (sources/MorDelete.scala): correctness of the
  * anti-join read AND the mechanism claims — DELETE touches ZERO table
  * files (the write-amplification answer to SCALE_r13's cowdml cliff),
  * batches accumulate, compact() folds tombstones in via the CoW path
  * and clears the sidecar, and reads agree before and after compaction.
  */
class MorDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the production environment: the Presto-compat layer re-registers
    // SQL functions (e.g. `contains` → array semantics), and engine code
    // resolving through the registry must survive it — a fileSeq draft
    // using Column.contains failed ONLY under this registration
    functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def files(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified())
      .toMap
  }

  private def freshTable(): String = {
    val loc = Files.createTempDirectory("graft_mor").toString + "/t"
    Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .repartition(4).write.mode("overwrite").parquet(loc)
    loc
  }

  private def keys(loc: String): Set[Long] =
    MorDelete.read(spark, loc).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet

  /** One representative row per o_orderkey (max of every other column) —
    * a cardinality-legal MERGE source over a table with duplicate keys. */
  private def oneRowPerKey(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("o_orderkey").agg(
      df.columns.filterNot(_ == "o_orderkey").toSeq
        .map(c => max(col(c)).as(c)).head,
      df.columns.filterNot(_ == "o_orderkey").toSeq
        .map(c => max(col(c)).as(c)).tail: _*)

  test("delete touches zero table files; reads apply tombstones; batches accumulate") {
    val loc = freshTable()
    val before = files(loc)
    val all = keys(loc)

    val s1 = MorDelete.delete(spark, loc, col("o_orderkey") % 10 === 3, Seq("o_orderkey"))
    assert(s1.keysWritten > 0)
    assert(files(loc) == before, "a MoR delete must not touch any table file")
    assert(keys(loc) == all.filterNot(_ % 10 == 3))

    MorDelete.delete(spark, loc, col("o_orderkey") % 10 === 7, Seq("o_orderkey"))
    assert(files(loc) == before, "the second batch must not touch table files either")
    assert(keys(loc) == all.filterNot(k => k % 10 == 3 || k % 10 == 7),
      "tombstone batches accumulate")
  }

  test("equality-delete contract: one tombstoned key removes every row sharing it") {
    val loc = Files.createTempDirectory("graft_mor").toString + "/t"
    Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .write.mode("overwrite").parquet(loc)
    val victim = 7L
    MorDelete.delete(spark, loc, col("l_orderkey") === victim, Seq("l_orderkey"))
    assert(MorDelete.read(spark, loc)
      .filter(col("l_orderkey") === victim).count() == 0,
      "every lineitem of the tombstoned order must disappear")
  }

  test("compact folds tombstones in via CoW, clears the sidecar, and preserves the read") {
    val loc = freshTable()
    MorDelete.delete(spark, loc, col("o_orderkey") % 10 === 3, Seq("o_orderkey"))
    val preCompact = keys(loc)
    val stats = MorDelete.compact(spark, loc)
    assert(stats.touched.nonEmpty, "the scattered tombstones live in some file")
    assert(!new File(MorDelete.sidecarDir(loc)).exists(), "sidecar must be cleared")
    assert(keys(loc) == preCompact, "compaction must not change the visible rows")
    // post-compaction the table is physically clean: a raw read agrees too
    assert(spark.read.parquet(loc).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet == preCompact)
    // and compacting again is a no-op
    val again = MorDelete.compact(spark, loc)
    assert(again.touched.isEmpty && again.rewritten == 0L)
  }

  test("a second batch with a different key set is refused until compaction") {
    val loc = freshTable()
    MorDelete.delete(spark, loc, col("o_orderkey") % 10 === 3, Seq("o_orderkey"))
    val e = intercept[IllegalArgumentException] {
      MorDelete.delete(spark, loc, col("o_custkey") === 1, Seq("o_custkey"))
    }
    assert(e.getMessage.contains("compact() before changing the key set"))
    MorDelete.compact(spark, loc)
    // after compaction the sidecar is empty, so a new key set is fine
    MorDelete.delete(spark, loc, col("o_custkey") % 50 === 1, Seq("o_custkey"))
    assert(MorDelete.read(spark, loc)
      .filter(col("o_custkey") % 50 === 1).count() == 0)
  }

  test("partitioned layout: tombstones, reads, and compaction keep partition columns intact") {
    val loc = Files.createTempDirectory("graft_mor").toString + "/t"
    Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(loc)
    val all = spark.read.option("basePath", loc).parquet(loc)
    val nAll = all.count()
    val nUrgent = all.filter(col("o_orderpriority") === "1-URGENT").count()
    // predicate on the PARTITION column, keys on a data column
    MorDelete.delete(spark, loc, col("o_orderpriority") === "1-URGENT", Seq("o_orderkey"))
    val visible = MorDelete.read(spark, loc)
    assert(visible.filter(col("o_orderpriority") === "1-URGENT").count() == 0)
    // equality semantics: urgent ORDER KEYS are tombstoned, so any
    // same-key rows in other partitions die too — count via the key set
    val urgentKeys = all.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey").distinct()
    val collateral = all.join(urgentKeys, Seq("o_orderkey"), "left_semi").count()
    assert(visible.count() == nAll - collateral)
    assert(collateral >= nUrgent)
    val stats = MorDelete.compact(spark, loc)
    assert(stats.touched.nonEmpty)
    val after = spark.read.option("basePath", loc).parquet(loc)
    assert(after.count() == nAll - collateral)
    assert(after.columns.contains("o_orderpriority"),
      "partition-directory column must survive the compaction rewrite")
  }

  test("read without any tombstones is the raw table") {
    val loc = freshTable()
    assert(MorDelete.read(spark, loc).count() ==
      spark.read.parquet(loc).count())
  }

  test("upsert: replacements survive their own tombstones, old copies die, inserts append") {
    val loc = freshTable()
    val before = files(loc)
    val orders = MorDelete.read(spark, loc)
    val nBefore = orders.count()
    // source: 5 existing keys with a changed priority + 3 brand-new keys
    // (one representative row per key, built generically off the schema —
    // the synthetic orders table carries a subset of the TPC-H columns)
    val updates = oneRowPerKey(spark.read.parquet(loc)
      .filter(col("o_orderkey").isin(1L, 2L, 3L, 4L, 5L)))
      .withColumn("o_orderpriority", lit("9-UPSERTED"))
    val inserts = updates.limit(3)
      .withColumn("o_orderkey", col("o_orderkey") + lit(900000000L))
    val src = updates.unionByName(inserts)
    val dupBefore = spark.read.parquet(loc)
      .filter(col("o_orderkey").isin(1L, 2L, 3L, 4L, 5L)).count()
    val stats = graft.sources.MorUpsert.upsert(spark, loc, src, Seq("o_orderkey"))
    assert(stats.keysTombstoned == 5, "only the matched keys tombstone")
    assert(stats.filesAppended > 0)
    assert(before.forall { case (p, m) => files(loc).get(p).contains(m) },
      "every pre-existing table file survives an upsert untouched")
    val after = MorDelete.read(spark, loc)
    assert(after.count() == nBefore - dupBefore + 5 + 3,
      "all old copies of upserted keys die; one replacement each; three inserts")
    val upserted = after.filter(col("o_orderkey").isin(1L, 2L, 3L, 4L, 5L))
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).toSeq
    assert(upserted == Seq("9-UPSERTED"), "reads must see the replacement rows win")
    assert(after.filter(col("o_orderkey") > 900000000L).count() == 3)
  }

  test("sequencing: a later delete removes an earlier upsert's replacement; compact folds all") {
    val loc = freshTable()
    val one = oneRowPerKey(spark.read.parquet(loc).filter(col("o_orderkey") === 1L))
      .withColumn("o_orderpriority", lit("9-UPSERTED"))
    graft.sources.MorUpsert.upsert(spark, loc, one, Seq("o_orderkey"))
    assert(MorDelete.read(spark, loc).filter(col("o_orderkey") === 1L).count() == 1)
    MorDelete.delete(spark, loc, col("o_orderkey") === 1L, Seq("o_orderkey"))
    assert(MorDelete.read(spark, loc).filter(col("o_orderkey") === 1L).count() == 0,
      "the higher-sequence tombstone must delete the replacement row too")
    val preCompact = keys(loc)
    MorDelete.compact(spark, loc)
    assert(keys(loc) == preCompact, "compaction preserves the sequenced view")
    assert(spark.read.parquet(loc).filter(col("o_orderkey") === 1L).count() == 0,
      "post-compaction the physical table agrees")
  }
}
