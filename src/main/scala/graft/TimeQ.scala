package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Instrumented single-query timer for optimization work (guide §1: find
  * where the time actually goes before changing anything). Runs the named
  * bench queries under the exact Bench session confs, one prewarm + N
  * measured passes through the noop sink, and prints per-pass wall time
  * plus Spark job/stage counts and the per-job breakdown of the LAST pass
  * — at sf0.1 the data is megabytes, so job-count × scheduling overhead
  * is the dominant term and the thing to audit.
  *
  * Usage: runMain graft.TimeQ <passes> <name> [name ...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val passes = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level accounting: (jobId -> (desc, start)), completed jobs list
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, (d, System.nanoTime()))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (d, t0) =>
          done.add((e.jobId, d, (System.nanoTime() - t0) / 1000000))
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages += 1
    })

    names.foreach { n =>
      def pass(): (Double, Int, Int, Seq[(Int, String, Long)]) = {
        done.clear(); stages = 0
        val t0 = System.nanoTime()
        Registry.bench(n).fn(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener bus is async; give it a beat to drain before reading
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        val js = done.asScala.toSeq.sortBy(_._1)
        (dt, js.size, stages, js)
      }
      pass() // prewarm (also builds lazy scratch tables)
      val measured = (1 to passes).map(_ => pass())
      val times = measured.map(_._1)
      println(f"[timeq] $n: passes=${times.map(t => f"$t%.3f").mkString(",")} " +
        f"min=${times.min}%.3f jobs=${measured.last._2} stages=${measured.last._3}")
      measured.last._4.foreach { case (id, d, ms) =>
        println(f"[timeq]   job $id%3d ${ms}%6d ms  ${d.take(90)}")
      }
    }
    spark.stop()
  }
}
